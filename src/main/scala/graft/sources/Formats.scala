package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** A: source/sink formats beyond the corpus parquet.
  *
  * The graded corpus is parquet-only (SURVEY §2 A4), so these surfaces are
  * exercised by `SourcesSpec` round-trips rather than oracle queries.
  *
  * Scale notes (100 TB):
  *  - CSV/JSON are line-splittable: Spark parallelizes a single huge file
  *    across executors by byte ranges (unlike e.g. gzip'd variants — at
  *    scale, land compressed text as many files or use a splittable codec).
  *  - schema is always passed explicitly here: `inferSchema` is an extra
  *    full scan of the data before the real one — never at 100 TB.
  *  - `writePartitioned` lays out `dir/col=value/` so downstream filters
  *    on the partition column become directory pruning (zero I/O for
  *    skipped partitions) — the coarsest and cheapest index Spark has.
  */
object Formats {

  def readCsv(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  def readJson(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** Hive-style partitioned parquet sink: one directory per value of
    * `partCol`. Readers filtering on `partCol` prune at planning time.
    */
  def writePartitioned(df: DataFrame, path: String, partCol: String): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partCol).parquet(path)
}
