package graft

import graft.plans.AsOf
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom as-of join operator: parity with a plain-Scala reference,
  * correct null semantics, inclusive time bound, and the plan shape the
  * operator exists for — AsOfJoinExec fed by exactly one Exchange per
  * side (key co-partitioning), no window, no union.
  */
class AsOfJoinSpec extends AnyFunSuite with SparkTestBase {

  private def micros(t: java.sql.Timestamp): Long =
    t.getTime * 1000 + t.getNanos / 1000 % 1000

  test("as-of join matches the per-user last-earlier reference, nulls when none") {
    import spark.implicits._
    val events = Tables.events(spark, sf)
    val errors = events.filter($"event_type" === "error")
      .select($"user_id", $"event_id", $"ts")
    val purchases = events.filter($"event_type" === "purchase")
      .select($"user_id", $"ts".as("pts"), $"value".as("p_value"))
    // compare on the matched TIMESTAMP: deterministic even when a user
    // has two purchases at the same instant (the merge's pick among
    // exact ties is sort-order-dependent; their pts is identical)
    val joined = AsOf.join(errors, purchases, "user_id", "ts", "pts")
      .select($"event_id", $"pts")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else micros(r.getTimestamp(1))))
      .toMap
    val pRef = purchases.collect()
      .map(r => (r.getLong(0), micros(r.getTimestamp(1))))
      .groupBy(_._1).map { case (u, rs) => u -> rs.map(_._2).sorted.toSeq }
    val eRef = errors.collect().map { r =>
      val ts = micros(r.getTimestamp(2))
      val cand = pRef.getOrElse(r.getLong(0), Seq.empty[Long]).filter(_ <= ts)
      (r.getLong(1), cand.lastOption.getOrElse(-1L))
    }.toMap
    assert(joined.size == eRef.size, s"row count ${joined.size} != ${eRef.size}")
    assert(joined == eRef, {
      val diff = eRef.collect { case (k, v) if joined.get(k) != Some(v) =>
        s"$k: got ${joined.get(k)}, want $v" }.take(5)
      s"as-of join diverges from reference: ${diff.mkString("; ")}"
    })
    assert(joined.values.exists(_ == -1L), "no null-match case at test SF — vacuous")
    assert(joined.values.exists(_ != -1L), "no matched case at test SF — vacuous")
  }

  test("NULL keys and NULL times never match (SQL equality / DuckDB ASOF semantics)") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq(
      (Some(1L), Some(ts("2024-01-01 10:00:00")), "l-match"),
      (Some(1L), None, "l-null-time"),
      (None, Some(ts("2024-01-01 10:00:00")), "l-null-key"),
      (Some(2L), Some(ts("2024-01-01 10:00:00")), "l-no-purchase"))
      .toDF("user_id", "ts", "tag")
    val right = Seq(
      (Some(1L), Some(ts("2024-01-01 09:00:00")), "r-valid"),
      (Some(1L), None, "r-null-time"),
      (None, Some(ts("2024-01-01 09:00:00")), "r-null-key"))
      .toDF("user_id", "pts", "rtag")
    val got = graft.plans.AsOf.join(left, right, "user_id", "ts", "pts")
      .toDF("user_id", "ts", "tag", "r_user_id", "pts", "rtag")
      .select($"tag", $"rtag").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got("l-match") == Some("r-valid"), s"valid row should match r-valid: $got")
    assert(got("l-null-time").isEmpty, s"NULL left time must not match: $got")
    assert(got("l-null-key").isEmpty, s"NULL left key must not match r-null-key: $got")
    assert(got("l-no-purchase").isEmpty, s"keyless user must not match: $got")
  }

  test("as-of join plans as AsOfJoinExec with one Exchange per side") {
    import spark.implicits._
    val events = Tables.events(spark, sf)
    val errors = events.filter($"event_type" === "error")
      .select($"user_id", $"event_id", $"ts")
    val purchases = events.filter($"event_type" === "purchase")
      .select($"user_id", $"ts".as("pts"), $"value".as("p_value"))
    val df = AsOf.join(errors, purchases, "user_id", "ts", "pts")
    df.collect() // force execution so AQE finalizes the plan
    // AQE's toString prints the final AND initial plans — count the final
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("AsOfJoin"), s"custom operator not planned:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("Window") &&
      !plan.contains("Union"), s"as-of fell back to a composed plan:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 2, s"expected exactly 2 key exchanges, got $exchanges:\n$plan")
  }
}
