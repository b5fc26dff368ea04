package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: execute band theta-joins as bucket equi-joins.
  *
  * A join whose only condition is a band predicate
  * (`a < b AND b - a <= k`) has no equi-key, so Spark plans a broadcast
  * nested-loop join — O(|L|·|R|) comparisons (the round-1 bench paid
  * 2080 s for one such query at sf0.1). The [[graft.operators.Banding]]
  * helper fixes this when called explicitly; this rule applies the SAME
  * rewrite inside Catalyst, so a user who writes the natural theta join
  * gets the scalable plan automatically:
  *
  * {{{
  *   L ⋈_{a<b ∧ b−a≤k} R
  *     ⇒ Project(origOutput,
  *         (L + explode([a div k, a div k + 1]) as _bkt)
  *           ⋈_{_bkt = b div k ∧ a<b ∧ b−a≤k}
  *         (R + b div k as _bkt))
  * }}}
  *
  * Soundness: any qualifying pair has `(b div k) − (a div k) ∈ {0, 1}`
  * (for positive k; `0 ≤ b−a ≤ k` spans at most one bucket boundary), so
  * exploding the left side to both values loses no pair, and each pair
  * matches exactly one bucket value, so none is duplicated. The original
  * predicate stays as the join's residual filter, so the rewrite can
  * never ADD pairs either. The matcher is deliberately narrow — integral
  * attributes, positive integral literal band, exactly this conjunction
  * — anything else is left untouched.
  *
  * Registered via `GraftExtensions` (injectOptimizerRule) or at runtime
  * with `spark.experimental.extraOptimizations`.
  */
object BandJoinRule extends Rule[LogicalPlan] {

  private def integral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  private object BandLiteral {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Int, IntegerType) if v > 0 => Some(v.toLong)
      case Literal(v: Long, LongType) if v > 0 => Some(v)
      case Cast(BandLiteral(v), t, _, _) if t == LongType || t == IntegerType => Some(v)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(
        And(LessThan(a: AttributeReference, b: AttributeReference),
            LessThanOrEqual(Subtract(b2: AttributeReference, a2: AttributeReference, _),
              BandLiteral(k)))), hint)
        if a.semanticEquals(a2) && b.semanticEquals(b2) &&
          integral(a) && integral(b) &&
          left.outputSet.contains(a) && right.outputSet.contains(b) =>
      val kLit = Literal(k, LongType)
      def bucketOf(x: Expression) =
        IntegralDivide(Cast(x, LongType), kLit)
      // left: explode [bkt, bkt+1]
      val bktL = AttributeReference("_graft_bkt", LongType, nullable = true)()
      val gen = Generate(
        Explode(CreateArray(Seq(
          bucketOf(a), Add(bucketOf(a), Literal(1L, LongType))))),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(bktL), child = left)
      // right: project bkt
      val bktRAlias = Alias(bucketOf(b), "_graft_bkt_r")()
      val projR = Project(right.output :+ bktRAlias, right)
      val newCond = And(EqualTo(bktL, bktRAlias.toAttribute), j.condition.get)
      Project(j.output, Join(gen, projR, Inner, Some(newCond), hint))
  }
}
