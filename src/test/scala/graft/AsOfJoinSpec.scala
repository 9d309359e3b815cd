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

  test("joinSliced: hot key parity with the unsliced operator, and the key actually spreads") {
    import spark.implicits._
    // 50% of both sides on key 42 — the case the fixed-partition pin
    // cannot split. Time-sliced composition must (a) produce the same
    // matches, (b) spread the hot key across partitions. Values compared
    // on the matched TIME (tie-safe, like the reference test above).
    val rnd = new scala.util.Random(23)
    def key(i: Long): Long = if (i % 2 == 0) 42L else 1 + rnd.nextInt(60).toLong
    val left = (1L to 3000L).map(i => (key(i), rnd.nextInt(100000).toLong, i))
      .toDF("k", "t", "lid")
    val right = (1L to 3000L).map(i => (key(i), rnd.nextInt(100000).toLong, 10000L + i))
      .toDF("k", "t", "rid")
    // null rows on both sides: joinSliced must keep the operator's
    // null semantics (left nulls surface unmatched, right nulls drop)
    val lN = Seq((Option.empty[Long], Option(5L), 99990L),
      (Option(42L), Option.empty[Long], 99991L))
      .toDF("k", "t", "lid")
    val rN = Seq((Option.empty[Long], Option(5L), 99992L)).toDF("k", "t", "rid")
    val lAll = left.select($"k".cast("long").as("k"), $"t".cast("long").as("t"), $"lid")
      .unionByName(lN.select($"k", $"t", $"lid"))
    val rAll = right.select($"k".cast("long").as("k"), $"t".cast("long").as("t"), $"rid")
      .unionByName(rN.select($"k", $"t", $"rid"))
    for (dir <- Seq("backward", "forward", "nearest"); tol <- Seq(None, Some(500L))) {
      def matches(df: org.apache.spark.sql.DataFrame, timeCol: String) =
        df.select($"lid", coalesce(col(timeCol), lit(-1L))).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val plain = matches(
        AsOf.join(lAll, rAll, "k", "t", "t", dir, tol)
          .toDF("k", "t", "lid", "rk", "rt", "rid"), "rt")
      val sliced = matches(
        AsOf.joinSliced(lAll, rAll, "k", "t", "t", dir, tol, sliceUs = 10000L), "r_t")
      assert(sliced == plain, {
        val diff = plain.collect { case (k, v) if sliced.get(k) != Some(v) =>
          s"$k: sliced ${sliced.get(k)}, plain $v" }.take(5)
        s"dir=$dir tol=$tol joinSliced diverges: ${diff.mkString("; ")}"
      })
      assert(plain(99990L) == -1L && plain(99991L) == -1L,
        "null left rows must surface unmatched — null path vacuous")
    }
    // distribution: the hot key's output rows span multiple partitions
    // under joinSliced (slices re-key the shuffle), one partition without
    def hotParts(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("p", org.apache.spark.sql.functions.spark_partition_id())
      .filter($"k" === 42L).select($"p").distinct().count()
    val plainParts = hotParts(AsOf.join(lAll, rAll, "k", "t", "t")
      .toDF("k", "t", "lid", "rk", "rt", "rid"))
    val slicedParts = hotParts(
      AsOf.joinSliced(lAll, rAll, "k", "t", "t", "backward", None, sliceUs = 10000L))
    assert(plainParts == 1L, s"unsliced hot key should sit in 1 partition, got $plainParts")
    assert(slicedParts > 1L, s"joinSliced did not spread the hot key ($slicedParts partition)")
  }

  test("joinAuto: the plain spelling auto-routes a 50%-skew key through joinSliced") {
    import spark.implicits._
    // the skew threshold is skewFactor x the mean per-partition share, so
    // it is only meaningful at a production-shaped partition count — the
    // suite's 4-partition session would call a 50% key merely 2x the mean
    withSQLConf("spark.sql.shuffle.partitions" -> "32") {
    val rnd = new scala.util.Random(29)
    def skewKey(i: Long): Long = if (i % 2 == 0) 42L else 1 + rnd.nextInt(60).toLong
    val left = (1L to 3000L).map(i => (skewKey(i), rnd.nextInt(100000).toLong, i))
      .toDF("k", "t", "lid")
    val right = (1L to 3000L).map(i => (skewKey(i), rnd.nextInt(100000).toLong, 10000L + i))
      .toDF("k", "t", "rid")
    def matches(df: org.apache.spark.sql.DataFrame) =
      df.select($"lid", coalesce($"r_t", lit(-1L))).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hotParts(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("p", org.apache.spark.sql.functions.spark_partition_id())
      .filter($"k" === 42L).select($"p").distinct().count()
    for (dir <- Seq("backward", "forward", "nearest")) {
      val auto = AsOf.joinAuto(left, right, "k", "t", "t", dir, Some(500L))
      val plain = AsOf.join(left, right, "k", "t", "t", dir, Some(500L))
        .toDF("k", "t", "lid", "r_k", "r_t", "r_rid")
      assert(matches(auto) == matches(plain), s"dir=$dir joinAuto diverges from join")
      assert(matches(plain).values.exists(_ == -1L), s"dir=$dir no unmatched — vacuous")
    }
    // the skew probe actually routed sliced: hot key spans >1 partition
    // from the PLAIN spelling, no sliceUs anywhere in the call
    val spread = hotParts(AsOf.joinAuto(left, right, "k", "t", "t"))
    assert(spread > 1L, s"joinAuto did not spread the hot key ($spread partition)")

    // a uniform corpus routes through the plain merge (no slicing cost):
    // one hash partition per key, and parity again
    val uleft = (1L to 2000L).map(i =>
      (1 + rnd.nextInt(60).toLong, rnd.nextInt(100000).toLong, i)).toDF("k", "t", "lid")
    val uright = (1L to 2000L).map(i =>
      (1 + rnd.nextInt(60).toLong, rnd.nextInt(100000).toLong, 10000L + i)).toDF("k", "t", "rid")
    val uAuto = AsOf.joinAuto(uleft, uright, "k", "t", "t")
    val uPlain = AsOf.join(uleft, uright, "k", "t", "t")
      .toDF("k", "t", "lid", "r_k", "r_t", "r_rid")
    assert(matches(uAuto) == matches(uPlain), "uniform joinAuto diverges from join")
    assert(hotParts(uAuto) == 1L,
      "uniform corpus should route through the plain single-partition-per-key merge")
    }
  }

  test("joinMulti: composite (k1,k2) key equals the packed-single-key join; null fields never match") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    // left k1 range is a superset of right's, so every direction has
    // unmatched rows even with nearest + generous tolerance
    val left = (1L to 1500L).map(i =>
      (rnd.nextInt(10).toLong, rnd.nextInt(6).toLong, rnd.nextInt(5000).toLong, i))
      .toDF("k1", "k2", "t", "lid")
    val right = (1L to 1200L).map(i =>
      (rnd.nextInt(7).toLong, rnd.nextInt(6).toLong, rnd.nextInt(5000).toLong, 10000L + i))
      .toDF("k1", "k2", "t", "rid")
    for (dir <- Seq("backward", "forward", "nearest")) {
      val multi = AsOf.joinMulti(left, right, Seq("k1", "k2"), "t", "t", dir, Some(800L))
        .select($"lid", coalesce($"r_rid", lit(-1L))).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // oracle: the same join with the composite packed into ONE key
      val packed = AsOf.join(
          left.withColumn("kk", $"k1" * 1000 + $"k2"),
          right.withColumn("kk", $"k1" * 1000 + $"k2"),
          "kk", "t", "t", dir, Some(800L))
        .toDF("k1", "k2", "t", "lid", "kk",
          "r_k1", "r_k2", "r_t", "r_rid", "r_kk")
        .select($"lid", coalesce($"r_rid", lit(-1L))).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(multi == packed, s"dir=$dir: composite key diverges from packed key")
      assert(multi.values.exists(_ == -1L) && multi.values.exists(_ != -1L),
        s"dir=$dir vacuous (no matched or no unmatched rows)")
    }
    // a NULL in any key field must never match (SQL multi-key equality)
    val lN = Seq((Option(1L), Option.empty[Long], Option(10L), 1L),
      (Option(1L), Option(2L), Option(10L), 2L)).toDF("k1", "k2", "t", "lid")
    val rN = Seq((Option(1L), Option.empty[Long], Option(5L), 91L),
      (Option(1L), Option(2L), Option(5L), 92L)).toDF("k1", "k2", "t", "rid")
    val got = AsOf.joinMulti(lN, rN, Seq("k1", "k2"), "t", "t")
      .select($"lid", $"r_rid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got == Map(1L -> -1L, 2L -> 92L),
      s"null key-field semantics wrong: $got (null field matched or valid pair missed)")
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

  test("joinKeyFiltered: bit-identical to the plain join, bloom filter in the plan") {
    import spark.implicits._
    val events = Tables.events(spark, sf)
    val errors = events.filter($"event_type" === "error")
      .select($"user_id", $"event_id", $"ts")
    val purchases = events.filter($"event_type" === "purchase")
      .select($"user_id", $"ts".as("pts"), $"value".as("p_value"))
    val cols = Seq("user_id", "event_id", "ts", "r_user_id", "pts", "p_value")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.toDF(cols: _*).orderBy($"event_id").collect().toSeq
    val plain = AsOf.join(errors, purchases, "user_id", "ts", "pts")
    val filtered = AsOf.joinKeyFiltered(errors, purchases, "user_id", "ts", "pts")
    assert(rows(filtered) == rows(plain),
      "runtime bloom prefilter changed the join result — it may only drop non-matching rows")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain") && plan.contains("bloom_filter_agg"),
      s"runtime bloom filter not in the physical plan:\n$plan")
  }

  test("joinKeyFiltered actually prunes: a dimension with mostly-foreign keys shrinks pre-merge") {
    import spark.implicits._
    // left touches 4 keys; the dimension history carries 4k keys × 3
    // versions. The bloom (no false negatives, ~default FPP) must keep
    // every matching-key row and drop nearly all foreign ones.
    val left = (1L to 4L).map(k => (k, 1000L + k)).toDF("k", "t")
    val right = (for (k <- 1L to 4000L; v <- 0 to 2) yield (k, v * 100L, s"$k-$v"))
      .toDF("k", "t", "tag")
    val joined = AsOf.joinKeyFiltered(left, right, "k", "t", "t")
      .toDF("k", "t", "rk", "rt", "tag")
    // correctness: every left key matches its own latest-earlier version
    val got = joined.select($"k", $"tag").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == (1L to 4L).map(k => k -> s"$k-2").toMap, s"wrong matches: $got")
    // pruning: EXECUTE the injected right-side bloom filter standalone
    // and count survivors — a degenerate always-true bloom (wrong side,
    // empty filter) would pass the parity assertions above but fail here
    val bloomed = AsOf.joinKeyFiltered(left, right, "k", "t", "t")
      .queryExecution.optimizedPlan.collectFirst {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter
            if f.condition.toString.contains("might_contain") => f
      }
    assert(bloomed.nonEmpty, "right-side bloom Filter missing from the optimized plan")
    val survivors = org.apache.spark.sql.GraftPlanBridge
      .ofRows(spark, bloomed.get).count()
    // 12 matching-key rows must survive; the other 11,988 foreign-key
    // rows may only leak through as bloom false positives (default FPP
    // 3% ⇒ ~360 expected; 1200 = 10% is far beyond any plausible run)
    assert(survivors >= 12, s"bloom dropped matching-key rows: $survivors")
    assert(survivors <= 1200,
      s"bloom prefilter barely prunes: $survivors of 12000 dimension rows survived")
  }

  test("bucketed+sorted layout: the as-of join is a pure merge — zero Exchange, zero Sort") {
    import spark.implicits._
    // the at-scale serving shape: both sides live bucketed on the key and
    // sorted by (key, time) with bucket count == shuffle partitions, so
    // the exec's ClusteredDistribution(n) and (key, time) ordering are
    // satisfied straight off the scans — the whole join is the O(|L|+|R|)
    // zipPartitions merge with no exchange and no re-sort in front
    val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val base = java.nio.file.Files.createTempDirectory("graft_asof_buckets").toString
    val facts = (1L to 400L).map(i => (i % 37, 1000L + i)).toDF("k", "t")
    val dims = (for (k <- 0L to 36L; v <- 0 to 5) yield (k, v * 300L, s"$k-$v"))
      .toDF("k", "t", "tag")
    try {
      // Spark stopped reporting bucketed sort order by default in 3.0
      // (SPARK-28595: multi-file buckets can't honor it); with the
      // one-file-per-bucket write below the legacy conf restores it —
      // the switch a bucketed-serving deployment flips alongside the
      // layout write
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      Seq(("graft_af_facts", facts), ("graft_af_dims", dims)).foreach { case (t, df) =>
        spark.sql(s"DROP TABLE IF EXISTS $t")
        // repartition by the SAME hash the bucketing uses → each task
        // holds whole buckets → one file per bucket → the scan reports
        // the sortBy ordering (multi-file buckets forfeit it)
        df.repartition(n, col("k"))
          .write.format("parquet").option("path", s"$base/$t")
          .bucketBy(n, "k").sortBy("k", "t")
          .mode("overwrite").saveAsTable(t)
      }
      val j = AsOf.join(spark.table("graft_af_facts"), spark.table("graft_af_dims"),
        "k", "t", "t")
      val got = j.toDF("k", "t", "rk", "rt", "tag").orderBy($"k", $"t")
        .collect().toSeq
      val want = AsOf.join(facts, dims, "k", "t", "t")
        .toDF("k", "t", "rk", "rt", "tag").orderBy($"k", $"t").collect().toSeq
      assert(got == want, "bucketed-layout as-of diverges from the in-memory join")
      val plan = j.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      assert(plan.contains("AsOfJoin"), s"custom operator not planned:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed as-of still shuffles:\n$plan")
      assert(!plan.contains("Sort "), s"bucketed as-of still sorts:\n$plan")
    } finally {
      spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
      Seq("graft_af_facts", "graft_af_dims").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS $t"))
      graft.FsUtil.deleteRecursively(java.nio.file.Paths.get(base))
    }
  }
  test("whole-stage codegen: merge compiles into a codegen stage, bit-equal to the interpreted path") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val left = (1L to 500L).map(i => (rnd.nextInt(20).toLong, rnd.nextInt(900).toLong, i))
    val right = (1L to 400L).map(i => (rnd.nextInt(16).toLong, rnd.nextInt(900).toLong, 20000L + i))
    val l = left.toDF("k", "t", "lid")
    val r = right.toDF("k", "t", "rid")
    def finalPlan(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
    // query stages are leaf wrappers — a plain collect stops at them
    def allNodes(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val through = p match {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      p +: through.flatMap(allNodes)
    }
    for (dir <- Seq("backward", "forward", "nearest"); tol <- Seq(None, Some(41L))) {
      val df = AsOf.join(l, r, "k", "t", "t", dir, tol)
      val gen = df.collect().map(_.toString).sorted.toSeq
      // the operator must plan INSIDE a WholeStageCodegen span — the
      // downstream stage fuses with the merge instead of crossing an
      // iterator boundary (VERDICT r7 #6). AQE finalizes codegen stages
      // at execution, so the plan is inspected AFTER the collect.
      val wsc = allNodes(finalPlan(df)).collect {
        case w: org.apache.spark.sql.execution.WholeStageCodegenExec
          if allNodes(w).exists(_.isInstanceOf[graft.plans.AsOfJoinExec]) => w
      }
      assert(wsc.nonEmpty, s"dir=$dir: AsOfJoinExec not inside WholeStageCodegen:\n" +
        finalPlan(df).toString)
      val interp = withSQLConf("spark.sql.codegen.wholeStage" -> "false") {
        AsOf.join(l, r, "k", "t", "t", dir, tol).collect().map(_.toString).sorted.toSeq
      }
      assert(gen == interp, s"dir=$dir tol=$tol: codegen diverges from interpreted")
    }
    // a downstream aggregate fuses into the SAME stage as the merge
    val agg = AsOf.join(l, r, "k", "t", "t")
      .toDF("k", "t", "lid", "rk", "rt", "rid")
      .groupBy($"k").agg(org.apache.spark.sql.functions.count($"rid"))
    agg.collect()
    val fused = allNodes(finalPlan(agg)).collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec
        if allNodes(w).exists(_.isInstanceOf[graft.plans.AsOfJoinExec]) &&
          allNodes(w).exists(_.isInstanceOf[org.apache.spark.sql.execution.aggregate.HashAggregateExec]) => w
    }
    assert(fused.nonEmpty,
      "partial aggregate did not fuse into the as-of merge's codegen stage:\n" +
        finalPlan(agg).toString)
  }

  private def withSQLConf[T](pairs: (String, String)*)(body: => T): T = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
  /** The ASOF SQL hint (plans/AsOfHintRule): pure spark.sql text lands on
    * the same physical operator with DuckDB's inner/left semantics; the
    * value gate is e38's oracle, this pins the surface mechanics.
    */
  test("ASOF hint: SQL text rewrites to AsOfJoinExec with inner/left semantics and params") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val left = (1L to 400L).map(i => (rnd.nextInt(18).toLong, rnd.nextInt(800).toLong, i))
    val right = (1L to 300L).map(i => (rnd.nextInt(14).toLong, rnd.nextInt(800).toLong, 30000L + i))
    left.toDF("k", "t", "lid").createOrReplaceTempView("asof_hint_l")
    right.toDF("rk", "rt", "rid").createOrReplaceTempView("asof_hint_r")
    def viaHint(sql: String): Map[Long, Long] =
      spark.sql(sql).collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    def viaApi(direction: String, tol: Option[Long], inner: Boolean): Map[Long, Long] = {
      val df0 = AsOf.join(
        left.toDF("k", "t", "lid"),
        right.toDF("rk", "rt", "rid").withColumnRenamed("rk", "k"),
        "k", "t", "rt", direction, tol)
        .toDF("k", "t", "lid", "rk2", "rt2", "rid")
      val df = if (inner) df0.filter($"rt2".isNotNull) else df0
      df.select($"lid", coalesce($"rid", lit(-1L)))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    // inner (bare JOIN): unmatched left rows drop — DuckDB's bare ASOF
    val inner = viaHint("""
      SELECT /*+ ASOF('t', 'rt') */ l.lid, r.rid
      FROM asof_hint_l l JOIN asof_hint_r r ON l.k = r.rk""")
    assert(inner == viaApi("backward", None, inner = true),
      "inner hint diverges from AsOf.join + not-null filter")
    assert(inner.size < left.size, "inner form dropped nothing — vacuous")
    // LEFT JOIN: unmatched rows survive with nulls
    val leftForm = viaHint("""
      SELECT /*+ ASOF('t', 'rt') */ l.lid, r.rid
      FROM asof_hint_l l LEFT JOIN asof_hint_r r ON l.k = r.rk""")
    assert(leftForm == viaApi("backward", None, inner = false),
      "left hint diverges from AsOf.join")
    assert(leftForm.size == left.size)
    // direction + tolerance params flow through
    val nearTol = viaHint("""
      SELECT /*+ ASOF('t', 'rt', 'nearest', 37) */ l.lid, r.rid
      FROM asof_hint_l l LEFT JOIN asof_hint_r r ON l.k = r.rk""")
    assert(nearTol == viaApi("nearest", Some(37L), inner = false),
      "nearest+tolerance hint diverges from AsOf.join")
    // the rewrite actually lands the custom operator
    val planned = spark.sql("""
      SELECT /*+ ASOF('t', 'rt') */ l.lid, r.rid
      FROM asof_hint_l l JOIN asof_hint_r r ON l.k = r.rk""")
      .queryExecution.optimizedPlan
    assert(planned.collect { case _: graft.plans.AsOfJoinPlan => true }.nonEmpty,
      s"hint did not rewrite to AsOfJoinPlan:\n$planned")
    // malformed usage fails loudly, never silently keeps the plain join
    def expectFail(sql: String, frag: String): Unit = {
      val e = intercept[Exception](spark.sql(sql).collect())
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains(frag)),
        s"expected failure mentioning '$frag', got: ${msgs(e).mkString(" | ")}")
    }
    // composite keys: the hint packs a struct key with joinMulti's null
    // semantics — parity with the DataFrame API on a two-key corpus that
    // plants null key fields on both sides
    val mrnd = new scala.util.Random(71)
    def mkey(): (java.lang.Long, java.lang.Long) = (
      if (mrnd.nextInt(10) == 0) null else java.lang.Long.valueOf(mrnd.nextInt(6).toLong),
      if (mrnd.nextInt(10) == 0) null else java.lang.Long.valueOf(mrnd.nextInt(4).toLong))
    val ml = (1L to 300L).map { i => val (a, b) = mkey(); (a, b, mrnd.nextInt(800).toLong, i) }
    val mr = (1L to 200L).map { i => val (a, b) = mkey(); (a, b, mrnd.nextInt(800).toLong, 40000L + i) }
    ml.toDF("k1", "k2", "t", "lid").createOrReplaceTempView("asof_hint_ml")
    mr.toDF("k1", "k2", "rt", "rid").createOrReplaceTempView("asof_hint_mr")
    val multiHint = viaHint("""
      SELECT /*+ ASOF('t', 'rt') */ l.lid, r.rid
      FROM asof_hint_ml l LEFT JOIN asof_hint_mr r
        ON l.k1 = r.k1 AND l.k2 = r.k2""")
    val multiApi = AsOf.joinMulti(
      ml.toDF("k1", "k2", "t", "lid"), mr.toDF("k1", "k2", "rt", "rid"),
      Seq("k1", "k2"), "t", "rt")
      .select($"lid", coalesce($"r_rid", lit(-1L)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(multiHint == multiApi,
      "composite-key hint diverges from AsOf.joinMulti")
    assert(multiHint.values.count(_ >= 0) > 0, "no composite matches — vacuous")
    assert(multiHint.size == ml.size, "composite LEFT form lost left rows")
    expectFail("""
      SELECT /*+ ASOF('t', 'rt', 'sideways') */ l.lid, r.rid
      FROM asof_hint_l l JOIN asof_hint_r r ON l.k = r.rk""",
      "backward|forward|nearest")
    expectFail("""
      SELECT /*+ ASOF('nope', 'rt') */ l.lid, r.rid
      FROM asof_hint_l l JOIN asof_hint_r r ON l.k = r.rk""",
      "not in [")
    // negative tolerance would silently match nothing — must fail like
    // the DataFrame API's require(t >= 0)
    expectFail("""
      SELECT /*+ ASOF('t', 'rt', 'backward', -5) */ l.lid, r.rid
      FROM asof_hint_l l JOIN asof_hint_r r ON l.k = r.rk""",
      "tolerance must be >= 0")
  }
}
