package graft

import graft.plans.BandJoinRule
import org.apache.spark.sql.functions._

/** The optimizer rule must produce exactly the naive theta-join's rows
  * while eliminating the nested-loop plan.
  */
class BandJoinRuleSpec extends SparkSpec {

  private def withRule[A](f: => A): A = {
    val old = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = old :+ BandJoinRule
    try f finally spark.experimental.extraOptimizations = old
  }

  private def pairsDf = {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val df = (0 until 400).map(_ => rnd.nextInt(5000).toLong).toDF("id")
    (df.select($"id".as("ida")), df.select($"id".as("idb")))
  }

  test("rewritten band join returns exactly the naive rows") {
    val (a, b) = pairsDf
    val naive = a.join(b, col("ida") < col("idb") && col("idb") - col("ida") <= 37)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val ruled = withRule {
      a.join(b, col("ida") < col("idb") && col("idb") - col("ida") <= 37)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    }
    assert(ruled === naive)
    assert(naive.nonEmpty)
  }

  test("the rule removes the nested-loop join from the plan") {
    val (a, b) = pairsDf
    val joined = a.join(b, col("ida") < col("idb") && col("idb") - col("ida") <= 37)
    val without = joined.queryExecution.executedPlan.toString
    assert(without.contains("BroadcastNestedLoopJoin"), without)
    withRule {
      val j2 = a.join(b, col("ida") < col("idb") && col("idb") - col("ida") <= 37)
      val plan = j2.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      assert(plan.contains("Generate"), plan) // the bucket explode
    }
  }

  test("non-matching theta joins are left untouched") {
    val (a, b) = pairsDf
    withRule {
      // |a-b| shape is NOT the matcher's pattern — must not be rewritten
      val j = a.join(b, abs(col("ida") - col("idb")) <= 5 && col("ida") < col("idb"))
      assert(j.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
      // and a band of 0 (non-positive) must not match either
      val j0 = a.join(b, col("ida") < col("idb") && col("idb") - col("ida") <= 0)
      assert(j0.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
    }
  }
}
