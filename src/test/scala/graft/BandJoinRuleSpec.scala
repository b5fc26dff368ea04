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

  test("value-band (abs) joins are rewritten and row-identical") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val df = (0 until 300).map(i => (i.toLong, rnd.nextDouble() * 100.0)).toDF("id", "v")
    val a = df.select($"id".as("ida"), $"v".as("va"))
    val b = df.select($"id".as("idb"), $"v".as("vb"))
    val cond = col("ida") < col("idb") && abs(col("va") - col("vb")) < lit(2.5)
    val naive = a.join(b, cond)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq.sorted
    withRule {
      val j = a.join(b, cond)
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      val ruled = j.collect().map(r => (r.getLong(0), r.getLong(2))).toSeq.sorted
      assert(ruled === naive)
      assert(naive.nonEmpty)
    }
  }

  test("non-matching theta joins are left untouched") {
    val (a, b) = pairsDf
    withRule {
      // a band of 0 (non-positive) must not match
      val j0 = a.join(b, col("ida") < col("idb") && col("idb") - col("ida") <= 0)
      assert(j0.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
      // an OR condition must not match
      val jOr = a.join(b, col("ida") < col("idb") || col("idb") - col("ida") <= 5)
      assert(jOr.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
    }
  }
}
