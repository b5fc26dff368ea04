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

  /** Inner equi-join `large ⋈ small` on `key`, salted `salts` ways.
    * The salt is derived by hashing the large side's whole row (xxhash64)
    * — deterministic, uniform, and independent of the join key.
    */
  def saltedJoin(large: DataFrame, small: DataFrame,
      key: String, salts: Int): DataFrame = {
    require(salts > 0)
    val saltedLarge = large.withColumn("_salt",
      pmod(xxhash64(struct(large.columns.map(col): _*)), lit(salts.toLong)))
    val replicatedSmall = small.withColumn("_salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    saltedLarge.join(replicatedSmall, Seq(key, "_salt")).drop("_salt")
  }
}
