package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[graft.plans.BinnedRangeJoinRule]]: with a bin width set, a
  * keyless BETWEEN join must plan WITHOUT a nested loop / cartesian and
  * return exactly the rows the naive plan returns.
  */
class BinJoinRuleSpec extends AnyFunSuite with SparkTestBase {

  import graft.plans.BinnedRangeJoinRule.ConfKey

  private def points = spark.range(0, 5000).toDF("t")

  private def intervals = {
    import spark.implicits._
    Seq((0L, 149L), (500L, 720L), (701L, 4998L), (4999L, 4999L))
      .toDF("lo", "hi")
  }

  private def betweenJoin =
    points.join(intervals, col("t") >= col("lo") && col("t") <= col("hi"))

  test("keyless BETWEEN join rewrites to a binned equi-join (no nested loop)") {
    spark.conf.set(ConfKey, "100")
    try {
      val plan = betweenJoin.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"range join still plans as a nested loop:\n$plan")
      assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
        s"no equality join in rewritten plan:\n$plan")
    } finally spark.conf.unset(ConfKey)
  }

  test("rewritten join returns exactly the nested-loop rows (incl. overlaps)") {
    def rows() = betweenJoin.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val naive = rows() // rule off: BroadcastNestedLoopJoin ground truth
    spark.conf.set(ConfKey, "100")
    val binned = try rows() finally spark.conf.unset(ConfKey)
    assert(binned.size == 150 + 221 + 4298 + 1)
    assert(binned == naive, "binned rewrite changed the join result")
  }

  test("joins that already have an equi key are left alone") {
    import spark.implicits._
    spark.conf.set(ConfKey, "100")
    try {
      val ev = Seq((1L, 10L), (1L, 20L), (2L, 30L)).toDF("k", "t")
      val iv = Seq((1L, 5L, 15L), (2L, 25L, 35L)).toDF("k2", "lo", "hi")
      val j = ev.join(iv, col("k") === col("k2") && col("t") >= col("lo") && col("t") <= col("hi"))
      val plan = j.queryExecution.optimizedPlan.toString
      assert(!plan.contains("graft_bin"), s"equi-keyed range join was rewritten:\n$plan")
      assert(j.count() == 2)
    } finally spark.conf.unset(ConfKey)
  }

  test("rule is off by default (no conf, no rewrite)") {
    val plan = betweenJoin.queryExecution.optimizedPlan.toString
    assert(!plan.contains("graft_bin"), s"rule fired without conf:\n$plan")
  }

  test("negative domains bin correctly (floor, not truncate)") {
    import spark.implicits._
    spark.conf.set(ConfKey, "100")
    try {
      val pts = spark.range(-500, 500).toDF("t")
      val iv = Seq((-450L, -301L), (-50L, 49L)).toDF("lo", "hi")
      val j = pts.join(iv, col("t") >= col("lo") && col("t") <= col("hi"))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop:\n$plan")
      assert(j.count() == 150 + 100)
    } finally spark.conf.unset(ConfKey)
  }
}
