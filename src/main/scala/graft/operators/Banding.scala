package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Band predicates as equi-joins.
  *
  * A self-join whose only join condition is a band predicate
  * (`a.id < b.id AND b.id - a.id <= band`) plans as a broadcast
  * nested-loop join: Spark evaluates the predicate on all n² pairs and the
  * band is a post-filter, not a prune — quadratic work that grows with the
  * square of the scale factor (round-1 bench: 2080 s for one such query at
  * sf0.1).
  *
  * The fix is to derive an equi-join key from the band: with
  * `bkt = floor(id / band)`, any qualifying pair has
  * `bkt(b) - bkt(a) ∈ {0, 1}`, so exploding the left side to
  * `[bkt, bkt+1]` and equi-joining on the bucket makes the join
  * hash-partitioned with O(n·band) candidates; the original predicate then
  * runs as a cheap residual filter. Each qualifying pair matches exactly
  * one bucket value, so no dedup is needed. This is the join shape that
  * survives 100 TB: it shuffles on a key instead of nested-looping.
  */
object Banding {

  /** Self-join pairs (idA < idB, idB - idA <= band) via bucket equi-join.
    * `left` must carry column `idA`, `right` column `idB`; both sides keep
    * all their other columns.
    */
  def bandedPairs(left: DataFrame, right: DataFrame,
                  idA: String, idB: String, band: Int): DataFrame = {
    // integral (`div`) not floor(double-division): for int64 ids above
    // 2^53 the double rounds, and floor can shift the two sides into
    // different buckets, silently dropping a qualifying pair. `div` is
    // exact at any id magnitude and matches BandJoinRule's
    // IntegralDivide (trunc-vs-floor is safe: ids are nonnegative, and
    // bucket jumps stay >= band apart either way).
    val bktA = expr(s"$idA div $band")
    val a = left.withColumn("bkt", explode(array(bktA, bktA + 1)))
    val b = right.withColumn("bkt", expr(s"$idB div $band"))
    a.join(b, "bkt")
      .where(col(idA) < col(idB) && col(idB) - col(idA) <= band)
      .drop("bkt")
  }

  /** Self-join pairs with |valA - valB| < width (plus an id tiebreak
    * `idA < idB`), via value-bucket equi-join: bucket = floor(val/width);
    * a qualifying pair's buckets differ by at most 1, so the left side is
    * exploded to [bkt-1, bkt, bkt+1].
    */
  def valueBandedPairs(left: DataFrame, right: DataFrame,
                       idA: String, idB: String,
                       valA: String, valB: String, width: Double): DataFrame = {
    val bktA: Column = floor(col(valA) / width)
    val a = left.withColumn("bkt", explode(array(bktA - 1, bktA, bktA + 1)))
    val b = right.withColumn("bkt", floor(col(valB) / width))
    a.join(b, "bkt")
      .where(col(idA) < col(idB) && abs(col(valA) - col(valB)) < width)
      .drop("bkt")
  }
}
