package graft

import org.apache.spark.sql.execution.SparkPlan
import org.scalatest.funsuite.AnyFunSuite

/** Plan lint over every executed query plan (VERDICT r9 #6): a Window
  * with an EMPTY partitionSpec funnels its whole input through one task
  * — fine over an aggregate/limit-bounded frame (a 25-row calibration
  * curve), catastrophic over a corpus. Today every such window in the
  * 221 queries is intentional; this spec makes that an enforced
  * invariant instead of a hand-audited one, so the next operator cannot
  * silently sort a corpus on one task.
  *
  * Rule: for every WindowExec/WindowGroupLimitExec whose partitionSpec
  * is empty, every path from its child down to a source scan must pass
  * through a row-bounding node (aggregate, limit, TakeOrdered) — the
  * frame under the window is then aggregate-sized by construction.
  * Queries with a justified unbounded case go on the explicit whitelist
  * with the justification next to them.
  */
class PlanLintSpec extends AnyFunSuite with SparkTestBase {

  /** Queries allowed an unpartitioned window DIRECTLY over scan-shaped
    * input, each with why it is safe. (Currently none — the audit that
    * motivated this spec found every case already aggregate-bounded;
    * additions must carry a scale justification.)
    */
  private val whitelist: Map[String, String] = Map.empty

  // ── plan walking (AQE: executed plans only finalize after an action;
  // QueryStageExec are leaf wrappers — walk .plan manually) ──

  private def children(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      Seq(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
    case c: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
      Seq(c.relation.cachedPlan)
    case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
      Seq(r.child)
    case other => other.children
  }

  private def allNodes(p: SparkPlan): Seq[SparkPlan] =
    p +: (children(p) ++ p.subqueries).flatMap(allNodes)

  private def bounding(p: SparkPlan): Boolean = p match {
    case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => true
    case _: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => true
    case _: org.apache.spark.sql.execution.LocalLimitExec => true
    case _: org.apache.spark.sql.execution.GlobalLimitExec => true
    case _: org.apache.spark.sql.execution.CollectLimitExec => true
    // a window-group-limit bounds rows per partition like a limit does
    case _: org.apache.spark.sql.execution.window.WindowGroupLimitExec => true
    case _ => false
  }

  private def isScan(p: SparkPlan): Boolean =
    children(p).isEmpty && p.subqueries.isEmpty

  /** True iff some path from `p` reaches a scan without passing a
    * bounding node — the "could be corpus-sized" case.
    */
  private def unbounded(p: SparkPlan): Boolean =
    if (bounding(p)) false
    else if (isScan(p)) true
    else (children(p) ++ p.subqueries).exists(unbounded)

  private def emptyPartitionWindows(p: SparkPlan): Seq[SparkPlan] =
    allNodes(p).filter {
      case w: org.apache.spark.sql.execution.window.WindowExec =>
        w.partitionSpec.isEmpty
      case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec =>
        w.partitionSpec.isEmpty
      case _ => false
    }

  test("every unpartitioned window sits over an aggregate/limit-bounded frame") {
    val offenders = SparkEntry.allQueries.flatMap { q =>
      val df = q.run(spark, sf)
      // execute THIS QueryExecution: count() would build a separate
      // pruned one, and AQE only finalizes stages after an action
      df.queryExecution.toRdd.count()
      val plan = df.queryExecution.executedPlan
      val bad = emptyPartitionWindows(plan).filter(w => unbounded(w.children.head))
      if (bad.nonEmpty && !whitelist.contains(q.name))
        Some(q.name -> bad.head.verboseString(2))
      else None
    }
    assert(offenders.isEmpty,
      "unpartitioned windows over potentially corpus-sized input " +
        "(bound them or whitelist with a scale justification):\n" +
        offenders.map { case (n, w) => s"  $n: $w" }.mkString("\n"))
    // the whitelist stays honest: entries must still name real queries
    val known = SparkEntry.allQueries.map(_.name).toSet
    val stale = whitelist.keys.filterNot(known)
    assert(stale.isEmpty, s"whitelist names unknown queries: $stale")
  }
}
