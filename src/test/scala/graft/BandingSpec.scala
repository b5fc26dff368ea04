package graft

import graft.operators.Banding
import org.apache.spark.sql.functions._

/** Banding must be a pure optimization: bucket equi-join + residual filter
  * returns EXACTLY the pairs the naive theta join returns.
  */
class BandingSpec extends SparkSpec {

  private def ids(n: Int, seed: Long) = {
    import spark.implicits._
    // deterministic scattered ids/values (true RNG, not an arithmetic
    // progression — a progression's pairwise gaps never go below its
    // three-distance minimum, starving small bands of any pairs)
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => (rnd.nextInt(10000).toLong, i.toLong))
      .toDF("id", "payload")
  }

  test("bandedPairs equals the naive theta self-join across band sizes") {
    for ((seed, band) <- Seq((7L, 37), (11L, 9), (13L, 500), (17L, 9999))) {
      val df = ids(500, seed)
      val a = df.select(col("id").as("ida"), col("payload").as("pa"))
      val b = df.select(col("id").as("idb"), col("payload").as("pb"))
      val naive = a.join(b, col("ida") < col("idb") && col("idb") - col("ida") <= band)
        .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val banded = Banding.bandedPairs(a, b, "ida", "idb", band)
        .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(banded === naive, s"seed=$seed band=$band")
      assert(naive.nonEmpty, s"seed=$seed band=$band fixture is degenerate")
    }
  }

  test("valueBandedPairs equals the naive |va-vb|<w theta self-join") {
    import spark.implicits._
    val df = (0 until 400)
      .map(i => (i.toLong, ((i * 2654435761L) % 997).toDouble / 10.0))
      .toDF("id", "v")
    val a = df.select($"id".as("ida"), $"v".as("va"))
    val b = df.select($"id".as("idb"), $"v".as("vb"))
    val naive = a.join(b, $"ida" < $"idb" && abs($"va" - $"vb") < 2.5)
      .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = Banding.valueBandedPairs(a, b, "ida", "idb", "va", "vb", 2.5)
      .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded === naive)
    assert(naive.nonEmpty)
  }

  test("banded plan contains no nested-loop join") {
    val df = ids(100, seed = 3)
    val a = df.select(col("id").as("ida"))
    val b = df.select(col("id").as("idb"))
    val plan = Banding.bandedPairs(a, b, "ida", "idb", 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
