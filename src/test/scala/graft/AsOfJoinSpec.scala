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

  // ── direction × tolerance semantics, against a plain-Scala reference ──

  /** Reference as-of over (key, time, id) tuples: returns the matched
    * right id per left id, by direction/tolerance; -1 when unmatched.
    * Nearest ties (equal distance) resolve backward, like the operator.
    */
  private def refAsOf(left: Seq[(Long, Long, Long)], right: Seq[(Long, Long, Long)],
                      direction: String, tol: Long): Map[Long, Long] = {
    val byKey = right.groupBy(_._1).map { case (k, rs) =>
      k -> rs.map(r => (r._2, r._3)).sortBy(r => (r._1, r._2))
    }
    left.map { case (k, t, id) =>
      val cand = byKey.getOrElse(k, Seq.empty)
      val back = cand.filter(c => c._1 <= t && t - c._1 <= tol).lastOption
      val fwd = cand.find(c => c._1 >= t && c._1 - t <= tol)
      val m = direction match {
        case "backward" => back
        case "forward"  => fwd
        case "nearest"  => (back, fwd) match {
          case (Some(b), Some(f)) => if (t - b._1 <= f._1 - t) Some(b) else Some(f)
          case (b, f) => b.orElse(f)
        }
      }
      id -> m.map(_._2).getOrElse(-1L)
    }.toMap
  }

  private def runAsOf(left: Seq[(Long, Long, Long)], right: Seq[(Long, Long, Long)],
                      direction: String, tol: Option[Long]): Map[Long, Long] = {
    import spark.implicits._
    val l = left.toDF("k", "t", "lid")
    val r = right.toDF("k", "t", "rid")
    AsOf.join(l, r, "k", "t", "t", direction, tol)
      .toDF("k", "t", "lid", "rk", "rt", "rid")
      .select($"lid", coalesce($"rid", lit(-1L)))
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
  }

  test("forward / nearest / tolerance match the reference on a generated corpus") {
    // deterministic pseudo-random corpus with planted edge shapes:
    // exact-tie times, lone keys on each side, clustered times
    val rnd = new scala.util.Random(7)
    // left keys are a SUPERSET of right keys, so every direction has
    // unmatched rows even with unlimited tolerance (non-vacuous null path)
    val left = (1L to 800L).map(i => (rnd.nextInt(24).toLong, rnd.nextInt(1000).toLong, i))
    val right = (1L to 600L).map(i =>
      (rnd.nextInt(18).toLong, rnd.nextInt(1000).toLong, 10000L + i))
    for (dir <- Seq("backward", "forward", "nearest"); tol <- Seq(Long.MaxValue, 37L)) {
      val got = runAsOf(left, right, dir, if (tol == Long.MaxValue) None else Some(tol))
      val want = refAsOf(left, right, dir, tol)
      assert(got == want, {
        val diff = want.collect { case (k, v) if got.get(k) != Some(v) =>
          s"$k: got ${got.get(k)}, want $v" }.take(5)
        s"dir=$dir tol=$tol diverges: ${diff.mkString("; ")}"
      })
      assert(want.values.exists(_ == -1L) && want.values.exists(_ != -1L),
        s"dir=$dir tol=$tol has no unmatched or no matched case — vacuous")
    }
  }

  test("nearest resolves exact-distance ties backward (deterministic)") {
    // left at t=100; right at 90 and 110 — both distance 10 → backward (90)
    val got = runAsOf(
      left = Seq((1L, 100L, 1L)),
      right = Seq((1L, 90L, 90L), (1L, 110L, 110L)),
      direction = "nearest", tol = None)
    assert(got(1L) == 90L, s"tie must resolve backward: $got")
  }

  test("a 50%-skew hot key stays correct (pinned-partition merge, no AQE split)") {
    // One key owns half of both sides: lands in ONE partition by design
    // (the exec's requiredNumPartitions pin trades AQE skew-splitting for
    // zip alignment — the Scaladoc's documented tradeoff). Correctness
    // must be unaffected; runtime mitigation is upstream (see AsOfJoinExec).
    val rnd = new scala.util.Random(11)
    def key(i: Long): Long = if (i % 2 == 0) 42L else 1 + rnd.nextInt(100).toLong
    val left = (1L to 2000L).map(i => (key(i), rnd.nextInt(5000).toLong, i))
    val right = (1L to 2000L).map(i => (key(i), rnd.nextInt(5000).toLong, 10000L + i))
    for (dir <- Seq("backward", "forward", "nearest")) {
      val got = runAsOf(left, right, dir, Some(100L))
      val want = refAsOf(left, right, dir, 100L)
      assert(got == want, s"dir=$dir diverges under skew")
    }
  }

  test("type mismatches and bad params are rejected, not silently wrong") {
    import spark.implicits._
    val l = Seq((1L, 10L, 1L)).toDF("k", "t", "lid")
    val rIntKey = Seq((1, 10L, 2L)).toDF("k", "t", "rid")
    val rIntTime = Seq((1L, 10, 2L)).toDF("k", "t", "rid")
    assertThrows[IllegalArgumentException] {
      AsOf.join(l, rIntKey, "k", "t", "t") // int vs long key
    }
    assertThrows[IllegalArgumentException] {
      AsOf.join(l, rIntTime, "k", "t", "t") // int right time
    }
    assertThrows[IllegalArgumentException] {
      AsOf.join(l.select($"k", $"t".cast("int").as("t"), $"lid"),
        l.toDF("k", "t", "rid"), "k", "t", "t") // int left time
    }
    assertThrows[IllegalArgumentException] {
      AsOf.join(l, l.toDF("k", "t", "rid"), "k", "t", "t", "sideways", None)
    }
    assertThrows[IllegalArgumentException] {
      AsOf.join(l, l.toDF("k", "t", "rid"), "k", "t", "t", "backward", Some(-1L))
    }
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
