package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Rewrites a keyless range join — `points ⋈ intervals ON t BETWEEN lo AND
  * hi` with NO equality predicate — into the binned equi-join recipe that
  * e22 hand-writes (PLANS.md "binned interval join"):
  *
  * {{{
  *   Join(bin_pt = bin_iv AND <original condition>)
  *     :- Project(point side, bin_pt = floor(t / W))
  *     └─ Generate(explode(sequence(floor(lo/W), floor(hi/W))), interval side)
  * }}}
  *
  * Without this, Catalyst's only physical choices for a theta-only inner
  * join are BroadcastNestedLoopJoin or CartesianProduct — the two operators
  * that cannot survive 100 TB (|points| × |intervals| comparisons). With a
  * bin-width W, each interval explodes to (hi−lo)/W + 1 rows, each point
  * computes one bin, and the planner sees a hash-joinable equality; the
  * original condition stays as the residual filter, so results are
  * IDENTICAL to the nested loop (each qualifying pair matches in exactly
  * one bin — the point's own). Every qualifying pair appears once because
  * the equi-key is the POINT's bin: an interval meets a point only in the
  * bin the point lives in, no matter how many bins the interval spans.
  *
  * Semantic guards, all conservative (leave the join untouched unless):
  *  - inner join with a condition, and NO cross-side equality conjunct
  *    (if an equi key exists, SortMergeJoin already scales — e21's shape;
  *    this also makes the rule idempotent under the fixed-point batch);
  *  - a single attribute `t` of one side is both lower- and upper-bounded
  *    (>, >=, <, <=) by expressions evaluable on the other side;
  *  - `t` and both bounds are integral (int/long — e.g. unix_micros;
  *    timestamp users convert first, as e21/e22 do).
  *
  * Bins use floor division built from truncating ops ((t − pmod(t,W)) div
  * W) so negative domains bin correctly. Activated per-session via
  * `spark.graft.binjoin.width` (> 0, in `t`'s units); off by default.
  * Injected by [[graft.GraftExtensions]]; pinned by BinJoinRuleSpec.
  */
object BinnedRangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  val ConfKey = "spark.graft.binjoin.width"

  private def width: Option[Long] =
    try {
      val v = SQLConf.get.getConfString(ConfKey, "0").toLong
      if (v > 0) Some(v) else None
    } catch { case _: NumberFormatException => None }

  private def integral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  private def asLong(e: Expression): Expression =
    if (e.dataType == LongType) e else Cast(e, LongType)

  /** floor(t / w) via truncating primitives: (t − pmod(t, w)) div w
    * (IntegralDivide truncates toward zero, which would mis-bin negative
    * values; subtracting the non-negative pmod first makes the dividend an
    * exact multiple, so truncation IS floor).
    */
  private def floorBin(t: Expression, w: Long): Expression = {
    val wl = Literal(w, LongType)
    val tl = asLong(t)
    IntegralDivide(Subtract(tl, Pmod(tl, wl)), wl)
  }

  /** A cross-side equality conjunct = the join already has an equi key. */
  private def crossEq(left: LogicalPlan, right: LogicalPlan, e: Expression): Boolean = {
    def split(a: Expression, b: Expression): Boolean =
      (canEvaluate(a, left) && canEvaluate(b, right)) ||
        (canEvaluate(a, right) && canEvaluate(b, left))
    e match {
      case EqualTo(a, b)       => split(a, b)
      case EqualNullSafe(a, b) => split(a, b)
      case _                   => false
    }
  }

  private case class Bound(t: Attribute, bound: Expression, isLower: Boolean)

  private def boundsOf(conjuncts: Seq[Expression], point: LogicalPlan,
      interval: LogicalPlan): Seq[Bound] = {
    def ok(a: Attribute, b: Expression): Boolean =
      point.outputSet.contains(a) && integral(a) && integral(b) &&
        canEvaluate(b, interval)
    conjuncts.flatMap {
      case GreaterThanOrEqual(a: Attribute, b) if ok(a, b) => Some(Bound(a, b, isLower = true))
      case GreaterThan(a: Attribute, b) if ok(a, b)        => Some(Bound(a, b, isLower = true))
      case LessThanOrEqual(a: Attribute, b) if ok(a, b)    => Some(Bound(a, b, isLower = false))
      case LessThan(a: Attribute, b) if ok(a, b)           => Some(Bound(a, b, isLower = false))
      case GreaterThanOrEqual(b, a: Attribute) if ok(a, b) => Some(Bound(a, b, isLower = false))
      case GreaterThan(b, a: Attribute) if ok(a, b)        => Some(Bound(a, b, isLower = false))
      case LessThanOrEqual(b, a: Attribute) if ok(a, b)    => Some(Bound(a, b, isLower = true))
      case LessThan(b, a: Attribute) if ok(a, b)           => Some(Bound(a, b, isLower = true))
      case _                                               => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = width match {
    case None => plan
    case Some(w) =>
      plan.transformUp {
        case j @ Join(left, right, Inner, Some(cond), _)
            if !splitConjunctivePredicates(cond).exists(crossEq(left, right, _)) =>
          rewrite(left, right, cond, w).getOrElse(j)
      }
  }

  private def rewrite(left: LogicalPlan, right: LogicalPlan, cond: Expression,
      w: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)

    def attempt(point: LogicalPlan, interval: LogicalPlan,
        pointIsLeft: Boolean): Option[LogicalPlan] = {
      val byT = boundsOf(conjuncts, point, interval).groupBy(_.t)
      byT.collectFirst {
        case (t, bs) if bs.exists(_.isLower) && bs.exists(!_.isLower) =>
          val lo = bs.find(_.isLower).get.bound
          val hi = bs.find(!_.isLower).get.bound
          val binPt = Alias(floorBin(t, w), "graft_bin_pt")()
          val newPoint = Project(point.output :+ binPt, point)
          val binIv = AttributeReference("graft_bin_iv", LongType, nullable = false)()
          val seq = Sequence(floorBin(lo, w), floorBin(hi, w), None,
            Some(SQLConf.get.sessionLocalTimeZone))
          val gen = Generate(Explode(seq), unrequiredChildIndex = Nil,
            outer = false, qualifier = None, generatorOutput = Seq(binIv),
            child = interval)
          val eq = EqualTo(binPt.toAttribute, binIv)
          val (l2, r2) = if (pointIsLeft) (newPoint, gen) else (gen, newPoint)
          Project(left.output ++ right.output,
            Join(l2, r2, Inner, Some(And(eq, cond)), JoinHint.NONE))
      }
    }

    attempt(left, right, pointIsLeft = true)
      .orElse(attempt(right, left, pointIsLeft = false))
  }
}
