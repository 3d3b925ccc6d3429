package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Optimizer rule: rewrite a naive point-in-interval inequality join into
  * the bucketed equi-join shape of [[graft.operators.RangeJoin]] —
  * automatically, so `points.join(intervals, $"ts" >= $"s" && $"ts" <= $"e")`
  * written by any user stops planning as BroadcastNestedLoopJoin (|P|·|I|
  * comparisons) and becomes a shuffled hash/sort-merge join on coarse
  * time buckets.
  *
  * Fires on: Inner join whose condition conjuncts contain `p ≥/> s` and
  * `p ≤/< e` where `p` (TimestampType) references only one side and
  * `s`,`e` only the other, and no cross-side equality exists (an
  * equi-join needs no help). The rewrite
  *
  *   Join(P, I, cond)  →  Project(origOutput,
  *     Join(P + bucket(p), Generate(explode(sequence(bucket(s), bucket(e))), I),
  *          bucketₚ = bucketᵢ ∧ cond))
  *
  * keeps the ORIGINAL condition in the new join, so results are identical
  * (bucket equality is a necessary condition for p ∈ [s, e] whenever both
  * buckets derive from the same width); null bounds yield null buckets /
  * empty sequences and drop as before. Re-application is impossible: the
  * rewritten join contains a cross-side equality.
  *
  * Bucket width: `spark.graft.rangeJoin.bucketSeconds` (default 3600).
  * Registered via [[graft.GraftExtensions]] `injectOptimizerRule`.
  */
case class RangeJoinRule() extends Rule[LogicalPlan] with PredicateHelper {

  private val WidthKey   = "spark.graft.rangeJoin.bucketSeconds"
  private val EnabledKey = "spark.graft.rangeJoin.enabled"

  private def bucketOf(e: Expression, width: Long): Expression =
    IntegralDivide(Cast(e, LongType), Literal(width))

  /** (point, bound) from `point >= bound` in any spelling. */
  private def asLowerBound(e: Expression): Option[(Expression, Expression)] = e match {
    case GreaterThanOrEqual(p, s) => Some((p, s))
    case GreaterThan(p, s)        => Some((p, s))
    case LessThanOrEqual(s, p)    => Some((p, s))
    case LessThan(s, p)           => Some((p, s))
    case _                        => None
  }

  /** (point, bound) from `point <= bound` in any spelling. */
  private def asUpperBound(e: Expression): Option[(Expression, Expression)] = e match {
    case LessThanOrEqual(p, x)    => Some((p, x))
    case LessThan(p, x)           => Some((p, x))
    case GreaterThanOrEqual(x, p) => Some((p, x))
    case GreaterThan(x, p)        => Some((p, x))
    case _                        => None
  }

  private def sideOf(e: Expression, l: LogicalPlan, r: LogicalPlan): Option[Boolean] = {
    val refs = e.references
    if (refs.isEmpty) None
    else if (refs.subsetOf(l.outputSet)) Some(true)
    else if (refs.subsetOf(r.outputSet)) Some(false)
    else None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // operational kill-switch for a default-on rewrite
    if (!SQLConf.get.getConfString(EnabledKey, "true").toBoolean) plan
    else rewrite(plan)
  }

  private def rewrite(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val crossEquality = conjuncts.exists {
        case EqualTo(a, b) =>
          (for (sa <- sideOf(a, left, right); sb <- sideOf(b, left, right))
            yield sa != sb).getOrElse(false)
        case _ => false
      }
      val lowers = conjuncts.flatMap(asLowerBound)
      val uppers = conjuncts.flatMap(asUpperBound)
      val matched =
        if (crossEquality) None
        else (for {
          (p1, s) <- lowers
          (p2, e) <- uppers
          if p1.semanticEquals(p2) && p1.dataType == TimestampType
          pSide <- sideOf(p1, left, right)
          sSide <- sideOf(s, left, right)
          eSide <- sideOf(e, left, right)
          if sSide == eSide && sSide != pSide
        } yield (p1, s, e, pSide)).headOption

      matched match {
        case Some((p, s, e, pointsOnLeft)) =>
          val width = SQLConf.get.getConfString(WidthKey, "3600").toLong
          val (points, intervals) = if (pointsOnLeft) (left, right) else (right, left)

          val pAlias = Alias(bucketOf(p, width), "_graft_bucket_p")()
          val pProj  = Project(points.output :+ pAlias, points)

          val iAttr = AttributeReference("_graft_bucket_i", LongType)()
          // Sequence is TimeZoneAware: unresolved until a zone is supplied
          val seq = Sequence(
            bucketOf(s, width), bucketOf(e, width), None,
            Some(SQLConf.get.sessionLocalTimeZone))
          val gen = Generate(
            Explode(seq),
            unrequiredChildIndex = Nil,
            outer = false,
            qualifier = None,
            generatorOutput = Seq(iAttr),
            child = intervals)

          val newCond = And(EqualTo(pAlias.toAttribute, iAttr), cond)
          val (nl, nr) = if (pointsOnLeft) (pProj, gen) else (gen, pProj)
          Project(j.output, Join(nl, nr, Inner, Some(newCond), hint))
        case None => j
      }
  }
}
