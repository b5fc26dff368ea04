package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted joins for skewed keys.
  *
  * AQE's OptimizeSkewedJoin splits oversized *shuffle partitions* at
  * runtime and is the first line of defense (on by default). Salting is
  * the explicit, planning-time form for the pathological case AQE cannot
  * fix: one join KEY so hot that a single key's rows exceed an executor
  * (AQE cannot split one key across tasks in a plain equi-join without
  * changing semantics).
  *
  * Shape: the skewed (large) side gets a deterministic salt in [0, n);
  * the small side is replicated n times, once per salt value; the join key
  * becomes (key, salt). Each hot key now spreads over n tasks at the cost
  * of an n× blow-up OF THE SMALL SIDE ONLY. Correctness is unaffected:
  * every (fact row, dim row) pair that matched on `key` matches on
  * exactly one (key, salt).
  */
object SkewJoin {

  /** Salt count derived from the OBSERVED hot-key histogram (r12's
    * max_key_n statistic, computed the same way): the heaviest key's row
    * count divided by `rowsPerSalt` — the rows one salt bucket (= one
    * task's share of the hot key) should own — clamped to [1, maxSalts].
    * On an unskewed input this correctly returns 1 (salting a uniform
    * join only pays replication cost), and an EMPTY input likewise derives
    * 1 (max over no groups is NULL — coalesced, not crashed). At 100 TB
    * `rowsPerSalt` is sized from executor memory / row width, and
    * maxSalts bounds the small-side replication factor. One partial+final
    * aggregate over the key column — the exact pre-flight pass r12
    * reports.
    */
  def adaptiveSalts(large: DataFrame, key: String, rowsPerSalt: Long,
      maxSalts: Int = 64): Int = {
    require(rowsPerSalt > 0 && maxSalts > 0)
    val hot = large.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .agg(coalesce(max("n"), lit(0L))).head().getLong(0)
    math.max(1L, math.min(maxSalts.toLong,
      (hot + rowsPerSalt - 1) / rowsPerSalt)).toInt
  }

  /** Inner equi-join `large ⋈ small` on `key`, salted `salts` ways.
    * The salt mixes the row content with the row's physical position
    * (partition id + per-partition index): content-only hashing fails on
    * the common skew shape where a hot key's rows are byte-identical
    * duplicates — every copy would get the same salt and the key would
    * still land in one task. The position terms make the salt row-unique
    * at the cost of run-to-run determinism of the ASSIGNMENT (which rows
    * land in which salt bucket); the join RESULT is unaffected — every
    * matching (large, small) pair still matches on exactly one salt.
    */
  def saltedJoin(large: DataFrame, small: DataFrame,
      key: String, salts: Int): DataFrame = {
    require(salts > 0)
    val saltedLarge = large.withColumn("_salt",
      pmod(xxhash64(struct(large.columns.map(col): _*),
        spark_partition_id(), monotonically_increasing_id()),
        lit(salts.toLong)))
    val replicatedSmall = small.withColumn("_salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    saltedLarge.join(replicatedSmall, Seq(key, "_salt")).drop("_salt")
  }
}
