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

  private def numeric(e: Expression): Boolean =
    integral(e) || e.dataType == org.apache.spark.sql.types.DoubleType

  private object BandLiteral {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Int, IntegerType) if v > 0 => Some(v.toLong)
      case Literal(v: Long, LongType) if v > 0 => Some(v)
      case Cast(BandLiteral(v), t, _, _) if t == LongType || t == IntegerType => Some(v)
      case _ => None
    }
  }

  private object WidthLiteral {
    def unapply(e: Expression): Option[Double] = e match {
      case Literal(v: Double, org.apache.spark.sql.types.DoubleType) if v > 0 => Some(v)
      case BandLiteral(v) => Some(v.toDouble)
      case Cast(WidthLiteral(v), org.apache.spark.sql.types.DoubleType, _, _) => Some(v)
      case _ => None
    }
  }

  /** Rebuild the join with the left side exploded over `leftBuckets` and
    * the right side projecting its single `rightBucket`; the original
    * condition stays as the residual filter.
    */
  private def bucketed(j: Join, leftBuckets: Seq[Expression],
      rightBucket: Expression): LogicalPlan = {
    val bktL = AttributeReference("_graft_bkt", LongType, nullable = true)()
    val gen = Generate(
      Explode(CreateArray(leftBuckets)),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(bktL), child = j.left)
    val bktRAlias = Alias(rightBucket, "_graft_bkt_r")()
    val projR = Project(j.right.output :+ bktRAlias, j.right)
    val newCond = And(EqualTo(bktL, bktRAlias.toAttribute), j.condition.get)
    Project(j.output, Join(gen, projR, Inner, Some(newCond), j.hint))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    // id band: a < b AND b - a <= k  ⇒  bucket = a div k, explode [bkt, bkt+1]
    case j @ Join(left, right, Inner, Some(
        And(LessThan(a: AttributeReference, b: AttributeReference),
            LessThanOrEqual(Subtract(b2: AttributeReference, a2: AttributeReference, _),
              BandLiteral(k)))), _)
        if a.semanticEquals(a2) && b.semanticEquals(b2) &&
          integral(a) && integral(b) &&
          left.outputSet.contains(a) && right.outputSet.contains(b) =>
      val kLit = Literal(k, LongType)
      def bucketOf(x: Expression) = IntegralDivide(Cast(x, LongType), kLit)
      bucketed(j,
        leftBuckets = Seq(bucketOf(a), Add(bucketOf(a), Literal(1L, LongType))),
        rightBucket = bucketOf(b))

    // value band: tie AND abs(x - y) < w  ⇒  bucket = floor(x/w), explode
    // [bkt-1, bkt, bkt+1] (|x−y| < w spans at most one boundary per side)
    case j @ Join(left, right, Inner, Some(
        And(tie @ LessThan(_: AttributeReference, _: AttributeReference),
            LessThan(Abs(Subtract(x: AttributeReference, y: AttributeReference, _), _),
              WidthLiteral(w)))), _)
        if numeric(x) && numeric(y) &&
          ((left.outputSet.contains(x) && right.outputSet.contains(y)) ||
            (left.outputSet.contains(y) && right.outputSet.contains(x))) =>
      val (lv, rv) =
        if (left.outputSet.contains(x)) (x, y) else (y, x)
      val wLit = Literal(w, org.apache.spark.sql.types.DoubleType)
      def bucketOf(e: Expression) = Cast(Floor(Divide(
        Cast(e, org.apache.spark.sql.types.DoubleType), wLit)), LongType)
      bucketed(j,
        leftBuckets = Seq(
          Subtract(bucketOf(lv), Literal(1L, LongType)),
          bucketOf(lv),
          Add(bucketOf(lv), Literal(1L, LongType))),
        rightBucket = bucketOf(rv))
  }
}
