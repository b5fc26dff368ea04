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

  test("orc round-trip preserves rows and types") {
    val src = Tables.supplier(spark, sfDir)
    val path = tmp("orc")
    src.write.orc(path)
    val back = spark.read.orc(path)
    assert(back.schema === src.schema)
    assert(asSet(back) === asSet(src))
  }

  test("malformed json: PERMISSIVE isolates bad records, FAILFAST raises") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_badjson")
    dir.toFile.deleteOnExit()
    java.nio.file.Files.write(dir.resolve("data.json"),
      java.util.Arrays.asList(
        """{"id": 1, "v": "ok"}""",
        """{"id": 2, "v": """, // truncated mid-record
        """{"id": 3, "v": "also ok"}"""))
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("v", StringType), StructField("_corrupt", StringType)))
    // PERMISSIVE (the 100 TB default): bad records land in the corrupt
    // column instead of killing the job hours in
    // (cached: Spark refuses queries touching ONLY the corrupt column
    // on the raw file scan)
    val permissive = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(dir.toString)
      .cache()
    try {
      assert(permissive.where(col("_corrupt").isNull).count() === 2)
      assert(permissive.where(col("_corrupt").isNotNull).count() === 1)
    } finally permissive.unpersist()
    // FAILFAST: the validation-run mode — malformed input must raise
    intercept[org.apache.spark.SparkException] {
      spark.read.schema(StructType(schema.dropRight(1)))
        .option("mode", "FAILFAST").json(dir.toString).collect()
    }
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

  test("events conf invariants self-heal after a session mutation") {
    // ensureEventsConf asserts conf VALUES, not "was set once": a later
    // query that mutates session timeZone (the conf-leak class a20 was
    // fixed for) must be healed by the NEXT events read, or every
    // µs-vintage NTZ→epoch cast silently shifts by the zone offset
    val conf = spark.conf
    conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      Tables.ensureEventsConf(spark)
      assert(conf.get("spark.sql.session.timeZone") === "UTC")
      assert(conf.get("spark.sql.legacy.parquet.nanosAsLong") === "true")
    } finally conf.set("spark.sql.session.timeZone", "UTC")
  }
}
