package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftPlanBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** As-of join as a first-class engine operator — the whole-operator tier
  * of the custom-Catalyst ladder (SURVEY §2.H): a logical node, a planner
  * strategy, and a physical sorted-merge operator, registered through
  * `SparkSessionExtensions.injectPlannerStrategy`.
  *
  * Semantics (the kdb/pandas `asof` / Flink temporal-join staple Spark
  * lacks natively): for every LEFT row, append the LAST right row with
  * the same key whose time is ≤ the left row's time; nulls when no such
  * row exists. e06 composes the same-table case from a union + window;
  * this operator serves the general two-table case without materializing
  * a merged stream: each side shuffles ONCE on its key (co-partitioned
  * by EnsureRequirements), sorts by (key, time) — both properties the
  * planner can satisfy for free from bucketed/sorted tables — and the
  * physical operator is a single forward merge pass per partition:
  * O(|L| + |R|), no window state, no per-row probe, no right-side
  * buffering beyond ONE row. At 100 TB that is the plan you want for
  * "enrich every event with the latest earlier dimension version":
  * a dimension-versions table joined as-of, never exploded or windowed
  * over the fact stream.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] as [[AsOfJoinExec]]; injected via
  * `injectPlannerStrategy` in [[graft.GraftExtensions]].
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

/** Sorted-merge as-of join: children co-partitioned on their keys and
  * sorted by (key, time) — requirements EnsureRequirements satisfies
  * with at most one Exchange+Sort per side (zero when the source is
  * bucketed+sorted). The merge keeps exactly one candidate row of state.
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Both sides clustered on their key with an EXACT partition count:
    * doExecute zip-aligns partitions positionally, so the two shuffles
    * must stay identically partitioned. Pinning requiredNumPartitions
    * makes the exchanges non-coalescable — AQE's partition coalescing
    * (which may merge the two sides differently) never applies, the
    * alignment zipPartitions depends on is guaranteed by construction.
    */
  override def requiredChildDistribution: Seq[Distribution] = {
    val n = Some(conf.numShufflePartitions)
    ClusteredDistribution(leftKey :: Nil, requiredNumPartitions = n) ::
      ClusteredDistribution(rightKey :: Nil, requiredNumPartitions = n) :: Nil
  }

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val allOut = output
    val (lk, rk, lt, rt) = (leftKey, rightKey, leftTime, rightTime)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // projections/orderings are codegen'd per-partition (not serialized)
      val lKeyP = UnsafeProjection.create(Seq(lk), leftOut)
      val rKeyP = UnsafeProjection.create(Seq(rk), rightOut)
      val lTimeP = UnsafeProjection.create(Seq(lt), leftOut)
      val rTimeP = UnsafeProjection.create(Seq(rt), rightOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lk.dataType))
      val resultP = UnsafeProjection.create(allOut, allOut)
      val nullRight = new GenericInternalRow(rightOut.size)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      // ONE row of merge state: the latest right row consumed, + its key
      var lastMatch: InternalRow = null
      var lastKey: InternalRow = null
      lIter.map { lrow =>
        val lkRow = lKeyP(lrow)
        val lkNull = lkRow.isNullAt(0)
        val ltRow = lTimeP(lrow)
        val ltNull = ltRow.isNullAt(0)
        val lTime = if (ltNull) Long.MinValue else ltRow.getLong(0)
        var advance = rBuf.hasNext
        while (advance) {
          val rkRow = rKeyP(rBuf.head)
          val rtRow = rTimeP(rBuf.head)
          val c = keyOrd.compare(rkRow, lkRow)
          // NULL keys/times sort first; consume them so the merge keeps
          // moving, but never record them as a match (SQL equality and
          // the time bound are both false on NULL — DuckDB ASOF agrees)
          if (c < 0 || (c == 0 && (rtRow.isNullAt(0) ||
              (!ltNull && rtRow.getLong(0) <= lTime)))) {
            val r = rBuf.next()
            if (!rkRow.isNullAt(0) && !rtRow.isNullAt(0)) {
              lastMatch = r.copy()
              lastKey = rKeyP(lastMatch).copy()
            }
            advance = rBuf.hasNext
          } else advance = false
        }
        val m =
          if (!lkNull && !ltNull && lastMatch != null &&
              keyOrd.compare(lastKey, lkRow) == 0) lastMatch
          else nullRight
        resultP(joined(lrow, m)).copy()
      }
    }
  }
}

/** DataFrame-level API: `AsOf.join(facts, versions, "user_id", "ts", "ts")`.
  * Columns are resolved by NAME against each side's analyzed plan, so the
  * operator composes with any upstream DataFrame lineage.
  */
object AsOf {
  def join(left: DataFrame, right: DataFrame, key: String,
           leftTime: String, rightTime: String): DataFrame = {
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in [${plan.output.map(_.name).mkString(", ")}]"))
    val lPlan = left.queryExecution.analyzed
    val rPlan0 = right.queryExecution.analyzed
    // Both sides may share lineage (e.g. two filters of one table), which
    // means shared attribute exprIds — the analyzer's DeduplicateRelations
    // fixes that for built-in Join nodes only. Re-alias the right side
    // with fresh exprIds so the custom node's sides are always disjoint.
    val rPlan = org.apache.spark.sql.catalyst.plans.logical.Project(
      rPlan0.output.map(a =>
        org.apache.spark.sql.catalyst.expressions.Alias(a, a.name)()), rPlan0)
    GraftPlanBridge.ofRows(left.sparkSession,
      AsOfJoinPlan(lPlan, rPlan,
        attr(lPlan, key), attr(rPlan, key),
        attr(lPlan, leftTime), attr(rPlan, rightTime)))
  }
}
