package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus table loaders.
  *
  * All graded queries read the driver-generated parquet star schema
  * (TESTDATA.md). Schema is always inferred from parquet footers — never
  * hand-declared — so the engine's view of the data matches the DuckDB
  * oracle's (SURVEY.md §1.2).
  *
  * Scale note: at 100 TB these become partitioned-directory reads; all
  * downstream operators are written against the DataFrame, not the path, so
  * swapping in a partitioned/bucketed catalog table changes nothing here.
  */
object Tables {

  /** Read one table. `events.ts` is parquet TIMESTAMP(NANOS) which Spark
    * rejects by default (SURVEY.md §1.3); the legacy flag reads it as
    * epoch-nanosecond bigint. The conf set is idempotent and runtime-safe.
    */
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** `events` with the nanosecond timestamp normalized to microseconds:
    *  - `ts_us`  timestamp_ntz at µs precision — bit-equal to what the
    *    DuckDB oracle reads for the same column (it truncates ns → µs)
    *  - `ts`     raw epoch-ns bigint kept for intermediate comparisons
    *
    * Integer `div` (not `/`) is load-bearing: epoch-ns ≈ 1.7e18 exceeds a
    * double's 53-bit mantissa, so float division would corrupt timestamps.
    */
  def eventsUs(spark: SparkSession, sfDir: String): DataFrame =
    apply(spark, sfDir, "events")
      .withColumn("ts_us", expr("timestamp_micros(ts div 1000)"))

  def region(spark: SparkSession, sfDir: String): DataFrame    = apply(spark, sfDir, "region")
  def nation(spark: SparkSession, sfDir: String): DataFrame    = apply(spark, sfDir, "nation")
  def customer(spark: SparkSession, sfDir: String): DataFrame  = apply(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame  = apply(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame      = apply(spark, sfDir, "part")
  def orders(spark: SparkSession, sfDir: String): DataFrame    = apply(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame  = apply(spark, sfDir, "lineitem")
  def documents(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "embeddings")
}
