package graft

import org.apache.spark.sql.functions._

class DedupPipelineSpec extends SparkSpec {

  private lazy val verdicts = SparkEntry.queries("g19_dedup_pipeline")(spark, sfDir)

  test("every document receives exactly one verdict") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    assert(verdicts.count() === docs.count())
    assert(verdicts.select("doc_id").distinct().count() === docs.count())
  }

  test("exact duplicates are never kept, and the fingerprint min survives") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), md5(col("text")).as("fp"))
    val dupGroups = docs.groupBy("fp")
      .agg(min("doc_id").as("keeper"), count(lit(1)).as("n"))
      .where(col("n") > 1)
    val joined = docs.join(dupGroups, "fp").join(verdicts, "doc_id")
    // non-minimum members of a duplicate group must be flagged exact_dup
    assert(joined.where(col("doc_id") =!= col("keeper"))
      .where(col("reason") =!= "exact_dup").count() === 0)
    // the keeper must not be flagged exact_dup
    assert(joined.where(col("doc_id") === col("keeper"))
      .where(col("reason") === "exact_dup").count() === 0)
  }

  test("verdicts are deterministic across runs") {
    val r1 = verdicts.collect().toSeq
    val r2 = SparkEntry.queries("g19_dedup_pipeline")(spark, sfDir).collect().toSeq
    assert(r1 === r2)
  }
}
