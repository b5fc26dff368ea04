package graft

import graft.sources.{Formats, Tables}
import org.apache.spark.sql.functions._

class SourcesSpec extends SparkSpec {

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_$name")
    d.toFile.deleteOnExit()
    d.resolve("out").toString
  }

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("csv round-trip preserves rows and types") {
    val src = Tables.nation(spark, sfDir)
    val path = tmp("csv")
    Formats.writeCsv(src, path)
    val back = Formats.readCsv(spark, path, src.schema)
    assert(back.schema === src.schema)
    assert(asSet(back) === asSet(src))
  }

  test("json round-trip preserves rows and types") {
    val src = Tables.customer(spark, sfDir)
    val path = tmp("json")
    Formats.writeJson(src, path)
    val back = Formats.readJson(spark, path, src.schema)
    assert(asSet(back) === asSet(src))
  }

  test("json round-trip preserves ntz timestamps (orders)") {
    val src = Tables.orders(spark, sfDir)
    val path = tmp("json_ts")
    Formats.writeJson(src, path)
    val back = Formats.readJson(spark, path, src.schema)
    assert(back.schema === src.schema)
    assert(asSet(back) === asSet(src))
  }

  test("partitioned parquet write prunes partitions at the scan") {
    val src = Tables.documents(spark, sfDir)
    val path = tmp("part")
    Formats.writePartitioned(src, path, "lang")
    val scan = spark.read.parquet(path).where(col("lang") === "en")
    // content must round-trip for the selected partition
    assert(asSet(scan.select("doc_id", "text")) ===
      asSet(src.where(col("lang") === "en").select("doc_id", "text")))
    // and the physical plan must show partition pruning, not a full scan
    val physical = scan.queryExecution.executedPlan.toString
    assert(physical.contains("PartitionFilters: [isnotnull(lang"),
      s"no partition pruning in plan:\n$physical")
  }
}
