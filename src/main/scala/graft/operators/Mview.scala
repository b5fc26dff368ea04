package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed materialized-view state table + touched-bucket incremental
  * refresh — a24's maintenance half, factored out so the refresh bound
  * ("|delta| + |touched state|, never the whole view") is a mechanism
  * the spec can assert rather than a comment's claim.
  *
  * The state table lives as a Hive-layout parquet table partitioned by
  * `bucket = pmod(o_custkey, B)`. A refresh batch:
  *   1. reduces the delta to agg-cardinality partials (caller's job),
  *   2. derives the TOUCHED bucket list — a ≤B-row driver fetch
  *      steering which partitions the merge reads (control flow, not
  *      data flow; the h41/upsertLatest discipline),
  *   3. reads ONLY those buckets of the on-disk base (partition-pruned
  *      scan — PlanQualitySpec pins the PartitionFilters),
  *   4. merges at agg cardinality and dynamic-partition-OVERWRITES
  *      exactly the touched buckets; untouched bucket files are never
  *      rewritten (the spec pins their file lists byte-stable).
  *
  * At 100 TB with B sized so a bucket fits an executor (e.g. 4096), a
  * delta touching k buckets costs k bucket reads + k bucket writes —
  * independent of |customers| — while the nightly full rebuild this
  * replaces costs the whole fact scan.
  */
object Mview {

  /** Bucket count. Small here so the sf0.001 fixture exercises several
    * buckets; the mechanism is B-independent. */
  val B = 8

  def withBucket(states: DataFrame): DataFrame =
    states.withColumn("bucket",
      pmod(col("o_custkey"), lit(B)).cast("int"))

  /** Partition-pruned read of exactly the given buckets. */
  def prunedState(spark: SparkSession, tablePath: String,
      touched: Seq[Int]): DataFrame =
    spark.read.parquet(tablePath)
      .where(col("bucket").isin(touched: _*))

  /** Merge delta partials (cust-grain `o_custkey, n_orders, rev_cents`)
    * into the state table, touching only the buckets the delta lands
    * in. Returns the touched-bucket list. */
  def refresh(tablePath: String, deltaStates: DataFrame): Seq[Int] = {
    val spark = deltaStates.sparkSession
    val delta = withBucket(deltaStates)
    val touched = delta.select(col("bucket")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    // an empty delta touches nothing: return before the pruned read —
    // otherwise the refresh degenerates into an isin() over zero values
    // and relies on the dynamic overwrite of an empty frame being a
    // no-op (the r11 advice item)
    if (touched.isEmpty) return touched
    val merged = prunedState(spark, tablePath, touched)
      .unionByName(delta)
      .groupBy(col("o_custkey"), col("bucket"))
      .agg(sum(col("n_orders")).cast("bigint").as("n_orders"),
        sum(col("rev_cents")).cast("bigint").as("rev_cents"))
      .select(col("o_custkey"), col("n_orders"), col("rev_cents"),
        col("bucket"))
      // materialize BEFORE the write: the merge plan reads the very
      // files the dynamic overwrite is about to replace
      .localCheckpoint(true)
    merged.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket")
      .parquet(tablePath)
    spark.catalog.refreshByPath(tablePath)
    touched
  }
}
