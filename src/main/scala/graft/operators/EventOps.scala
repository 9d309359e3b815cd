package graft.operators

import graft.{GQuery, Tables}
import graft.GQuery._
import graft.streaming.EventStreams
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-stream analytics (SURVEY.md §2.F): the batch forms. The same
  * logical plans run under Structured Streaming in
  * [[graft.streaming.EventStreams]] (windowed agg ≡ e01 with watermarking;
  * sessionization ≡ e02 via flatMapGroupsWithState instead of a global
  * window, because an unbounded ORDER BY per user is exactly what a
  * streaming engine replaces with per-key state).
  *
  * Temporal outputs surface as epoch-micros longs or formatted strings —
  * exact integers / text on both engines, no tz ambiguity.
  */
object EventOps {

  private def ev(s: SparkSession, d: String): DataFrame = Tables.load(s, d, "events")

  /** e02's gap-sessionization as a reusable frame: (user_id, session_id,
    * n_events, start_us, end_us) — consumed by e02 (session table) and
    * e10 (interval attribution).
    */
  private def sessionFrame(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    val gapUs = unix_micros($"ts") - lag(unix_micros($"ts"), 1).over(w)
    ev(s, d)
      .withColumn("new_sess", when(gapUs.isNull || gapUs > 1800000000L, 1L).otherwise(0L))
      .withColumn("session_id", sum($"new_sess").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"session_id")
      .agg(count(lit(1)).as("n_events"),
        unix_micros(min($"ts")).as("start_us"),
        unix_micros(max($"ts")).as("end_us"))
  }

  /** DuckDB mirror of [[sessionFrame]]: CTEs ending in
    * sess(user_id, session_id, n_events, start_us, end_us).
    */
  private val sessSql = """
        x AS (
          SELECT user_id, event_id, ts,
                 CASE WHEN lag(ts) OVER w IS NULL
                           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                      THEN 1 ELSE 0 END AS new_sess
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
        y AS (
          SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
          FROM x),
        sess AS (
          SELECT user_id, session_id, COUNT(*) AS n_events,
                 epoch_us(min(ts)) AS start_us, epoch_us(max(ts)) AS end_us
          FROM y GROUP BY user_id, session_id)"""

  val all: Seq[GQuery] = Seq(

    // ── e01: tumbling-window aggregation (hour buckets). ──
    GQuery("e01_tumbling_window",
      (s, d) => {
        import s.implicits._
        ev(s, d)
          .groupBy(date_format(date_trunc("hour", $"ts"), "yyyy-MM-dd HH:00").as("hour"),
            $"event_type")
          .agg(count(lit(1)).as("n"), sumd(d2($"value")).as("value_sum"))
          .orderBy($"hour", $"event_type")
      },
      Some("""
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour, event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS value_sum
        FROM events GROUP BY hour, event_type ORDER BY hour, event_type""")),

    // ── e02: gap-based sessionization (30-min inactivity): lag + ──
    // cumulative-sum session ids, then per-session rollup. One shuffle on
    // user_id; at scale this is the window-function form of what
    // flatMapGroupsWithState does incrementally.
    GQuery("e02_sessionize",
      (s, d) => {
        import s.implicits._
        sessionFrame(s, d)
          .withColumn("duration_us", $"end_us" - $"start_us")
          .orderBy($"user_id", $"session_id")
      },
      Some(s"""
        WITH $sessSql
        SELECT user_id, session_id, n_events, start_us, end_us,
               end_us - start_us AS duration_us
        FROM sess ORDER BY user_id, session_id""")),

    // ── e03: funnel — signup → first later purchase, per user, rolled ──
    // into one conversion row (single exact double division).
    GQuery("e03_funnel",
      (s, d) => {
        import s.implicits._
        val events = ev(s, d)
        val signups = events.filter($"event_type" === "signup")
          .groupBy($"user_id").agg(min($"ts").as("su_ts"))
        val converted = signups.join(events.filter($"event_type" === "purchase"), Seq("user_id"))
          .filter($"ts" > $"su_ts")
          .select($"user_id").distinct()
        val n_su = signups.agg(count(lit(1)).as("n_signup_users"))
        val n_cv = converted.agg(count(lit(1)).as("n_converted"))
        n_su.join(n_cv)
          .select($"n_signup_users", $"n_converted",
            roundz($"n_converted".cast(DoubleType) / $"n_signup_users", 6).as("conversion_rate"))
      },
      Some("""
        WITH su AS (SELECT user_id, min(ts) AS su_ts FROM events
                    WHERE event_type = 'signup' GROUP BY user_id),
        conv AS (SELECT DISTINCT su.user_id
                 FROM su JOIN events e ON e.user_id = su.user_id
                 WHERE e.event_type = 'purchase' AND e.ts > su.su_ts)
        SELECT (SELECT COUNT(*) FROM su) AS n_signup_users,
               (SELECT COUNT(*) FROM conv) AS n_converted,
               (ROUND(CAST((SELECT COUNT(*) FROM conv) AS DOUBLE)
                 / (SELECT COUNT(*) FROM su), 6) + 0.0) AS conversion_rate""")),

    // ── e04: retention cohorts — first-seen day × day-offset distinct ──
    // actives for the first week.
    GQuery("e04_retention",
      (s, d) => {
        import s.implicits._
        val events = ev(s, d)
        val first = events.groupBy($"user_id").agg(min(to_date($"ts")).as("d0"))
        val act = events.select($"user_id", to_date($"ts").as("d")).distinct()
        act.join(first, Seq("user_id"))
          .withColumn("offset_days", datediff($"d", $"d0"))
          .filter($"offset_days" <= 7)
          .groupBy(date_format($"d0", "yyyy-MM-dd").as("cohort_day"), $"offset_days")
          .agg(countDistinct($"user_id").as("n_users"))
          .orderBy($"cohort_day", $"offset_days")
      },
      Some("""
        WITH first AS (SELECT user_id, min(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id),
        act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events)
        SELECT strftime(first.d0, '%Y-%m-%d') AS cohort_day,
               CAST(date_diff('day', first.d0, act.d) AS INT) AS offset_days,
               CAST(COUNT(DISTINCT act.user_id) AS BIGINT) AS n_users
        FROM act JOIN first ON act.user_id = first.user_id
        WHERE date_diff('day', first.d0, act.d) <= 7
        GROUP BY cohort_day, offset_days ORDER BY cohort_day, offset_days""")),

    // ── e06: as-of join — for every error event, the user's most recent ──
    // strictly-earlier purchase. Expressed as a carry-forward window (max
    // over preceding rows) instead of a per-row range probe: one shuffle
    // on user_id, no custom operator needed.
    GQuery("e06_asof_join",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
          .rowsBetween(Window.unboundedPreceding, -1)
        ev(s, d)
          .withColumn("last_purchase_us",
            max(when($"event_type" === "purchase", unix_micros($"ts"))).over(w))
          .filter($"event_type" === "error")
          .select($"event_id", $"user_id", unix_micros($"ts").as("error_us"),
            coalesce($"last_purchase_us", lit(-1L)).as("last_purchase_us"))
          .orderBy($"event_id")
      },
      Some("""
        SELECT event_id, user_id, epoch_us(ts) AS error_us,
               COALESCE(max(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
                 OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) AS last_purchase_us
        FROM events QUALIFY event_type = 'error'
        ORDER BY event_id""")),

    // ── e07: event-rate anomaly detection — hourly counts z-scored ──
    // against the per-type mean/stddev (exact integer moments, so the
    // z-formula is bit-identical cross-engine); |z| ≥ 2 flags anomalous
    // hours. Two partial-agg passes + a broadcast of per-type stats.
    GQuery("e07_rate_anomaly",
      (s, d) => {
        import s.implicits._
        // consumed twice (stats + join) — cache so events scans once
        val hourly = ev(s, d)
          .groupBy($"event_type", date_format(date_trunc("hour", $"ts"), "yyyy-MM-dd HH:00").as("hour"))
          .agg(count(lit(1)).as("n"))
          .cache()
        val stats = hourly.groupBy($"event_type".as("t2"))
          .agg(count(lit(1)).as("n_hours"), sum($"n").as("sx"), sum($"n" * $"n").as("sx2"))
          .select($"t2",
            ($"sx".cast(DoubleType) / $"n_hours").as("mean"),
            sqrt(($"sx2".cast(DoubleType) - $"sx".cast(DoubleType) * $"sx".cast(DoubleType) / $"n_hours")
              / ($"n_hours" - 1)).as("sd"))
        hourly.join(broadcast(stats), $"event_type" === $"t2")
          .withColumn("z", ($"n" - $"mean") / $"sd")
          .filter(abs($"z") >= 2.0)
          .select($"event_type", $"hour", $"n", roundz($"z", 4).as("z"))
          .orderBy($"event_type", $"hour")
      },
      Some("""
        WITH hourly AS (
          SELECT event_type, strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
                 COUNT(*) AS n
          FROM events GROUP BY event_type, hour),
        stats AS (
          SELECT event_type AS t2,
                 CAST(CAST(SUM(n) AS BIGINT) AS DOUBLE) / COUNT(*) AS mean,
                 sqrt((CAST(CAST(SUM(n*n) AS BIGINT) AS DOUBLE)
                       - CAST(CAST(SUM(n) AS BIGINT) AS DOUBLE) * CAST(CAST(SUM(n) AS BIGINT) AS DOUBLE) / COUNT(*))
                      / (COUNT(*) - 1)) AS sd
          FROM hourly GROUP BY event_type)
        SELECT event_type, hour, n, (ROUND((n - mean) / sd, 4) + 0.0) AS z
        FROM hourly JOIN stats ON event_type = t2
        WHERE abs((n - mean) / sd) >= 2.0
        ORDER BY event_type, hour""")),

    // ── e08: sequential-pattern detection (CEP-lite) — per user, find ──
    // every IMMEDIATE error→purchase transition within 10 minutes (the
    // "recovered right after a failure" pattern). One ranking-window pass:
    // lead(type)/lead(ts) over (user, time) — a single shuffle on
    // user_id, no self-join, no state. The same window the sessionizer
    // uses, so at scale the two share one sort. Gap arithmetic in exact
    // epoch micros (no float time math).
    GQuery("e08_sequence_pattern",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"us".asc, $"event_id".asc)
        ev(s, d)
          .select($"event_id", $"user_id", $"event_type", unix_micros($"ts").as("us"))
          .withColumn("next_type", lead($"event_type", 1).over(w))
          .withColumn("next_us", lead($"us", 1).over(w))
          .filter($"event_type" === "error" && $"next_type" === "purchase" &&
            $"next_us" - $"us" <= 600000000L)
          .groupBy($"user_id")
          .agg(count(lit(1)).as("n_matches"),
            min($"next_us" - $"us").as("min_gap_us"),
            max($"next_us" - $"us").as("max_gap_us"))
          .orderBy($"user_id")
      },
      Some("""
        WITH seq AS (
          SELECT event_id, user_id, event_type, epoch_us(ts) AS us,
                 LEAD(event_type, 1) OVER w AS next_type,
                 LEAD(epoch_us(ts), 1) OVER w AS next_us
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC))
        SELECT user_id, COUNT(*) AS n_matches,
               MIN(next_us - us) AS min_gap_us,
               MAX(next_us - us) AS max_gap_us
        FROM seq
        WHERE event_type = 'error' AND next_type = 'purchase'
          AND next_us - us <= 600000000
        GROUP BY user_id ORDER BY user_id""")),

    // ── e09: sliding-window aggregation (2 h windows every 1 h) — the ──
    // overlapping-window family e01's tumbling windows don't cover, via
    // Spark's native window(ts, length, slide): each event expands to
    // exactly 2 epoch-aligned windows before the partial agg, so shuffle
    // rows = 2 × #groups, not 2 × #events. The IDENTICAL plan runs under
    // Structured Streaming with the watermark expiring closed windows
    // (StreamingSpec pins batch ≡ stream on this very function).
    GQuery("e09_sliding_window",
      (s, d) => {
        import s.implicits._
        graft.streaming.EventStreams.slidingCounts(ev(s, d))
          .select(date_format($"window_start", "yyyy-MM-dd HH:mm").as("window_start"),
            $"event_type", $"n")
          .orderBy($"window_start", $"event_type")
      },
      Some("""
        WITH w AS (
          SELECT strftime(date_trunc('hour', ts) - to_hours(CAST(k.k AS BIGINT)), '%Y-%m-%d %H:%M')
                   AS window_start,
                 event_type
          FROM events, (SELECT unnest(range(2)) AS k) k)
        SELECT window_start, event_type, COUNT(*) AS n
        FROM w GROUP BY window_start, event_type
        ORDER BY window_start, event_type""")),

    // ── e10: interval-containment join — attribute purchases to the ──
    // session whose [start, end] window contains them (the standard
    // point-in-interval attribution every event pipeline runs). The
    // scale shape: EQUALITY join on user_id first — fanout is bounded
    // by sessions-per-user, never a nested loop over (event × interval)
    // — then the containment predicate filters inside the join. Revenue
    // sums go through round-to-2dp → DECIMAL(14,2) → exact sum → double
    // (SURVEY §6 money discipline).
    GQuery("e10_session_attribution",
      (s, d) => {
        import s.implicits._
        val purch = ev(s, d).filter($"event_type" === "purchase")
          .select($"user_id", unix_micros($"ts").as("us"), $"value")
        purch.join(sessionFrame(s, d), Seq("user_id"))
          .filter($"us" >= $"start_us" && $"us" <= $"end_us")
          .groupBy($"user_id", $"session_id")
          .agg(count(lit(1)).as("n_purchases"),
            sum(roundz($"value", 2).cast(DecimalType(14, 2))).cast(DoubleType).as("purchase_value"))
          .orderBy($"user_id", $"session_id")
      },
      Some(s"""
        WITH $sessSql,
        p AS (SELECT user_id, epoch_us(ts) AS us, value
              FROM events WHERE event_type = 'purchase')
        SELECT user_id, session_id, COUNT(*) AS n_purchases,
               CAST(SUM(CAST((ROUND(value, 2) + 0.0) AS DECIMAL(14,2))) AS DOUBLE) AS purchase_value
        FROM p JOIN sess USING (user_id)
        WHERE us >= start_us AND us <= end_us
        GROUP BY user_id, session_id ORDER BY user_id, session_id""")),

    // ── e11: time-series densification (gap filling) — emit a row for ──
    // EVERY (event_type, hour) cell over the observed range, zero-filled
    // where no events landed: the step before any rate model or
    // dashboard (e07's z-scores silently skip empty hours without it).
    // The grid is types × sequence(min_hour, max_hour) — generated from
    // a broadcast 1-row bounds aggregate, so grid size is #types ×
    // #hours regardless of event volume — LEFT-joined by equality to
    // the partial-agg'd hourly counts. At 100 TB the dense grid stays
    // tiny while the fact side aggregates map-side before its one
    // shuffle.
    GQuery("e11_gap_fill",
      (s, d) => {
        import s.implicits._
        val hourly = ev(s, d)
          .groupBy($"event_type", date_trunc("hour", $"ts").as("hour"))
          .agg(count(lit(1)).as("n"))
        val bounds = ev(s, d)
          .agg(date_trunc("hour", min($"ts")).as("h0"), date_trunc("hour", max($"ts")).as("h1"))
        val grid = ev(s, d).select($"event_type").distinct()
          .join(broadcast(bounds))
          .select($"event_type", explode(expr("sequence(h0, h1, interval 1 hour)")).as("hour"))
        grid.join(hourly, Seq("event_type", "hour"), "left")
          .select($"event_type", date_format($"hour", "yyyy-MM-dd HH:00").as("hour"),
            coalesce($"n", lit(0L)).as("n"))
          .orderBy($"event_type", $"hour")
      },
      Some("""
        WITH bounds AS (
          SELECT date_trunc('hour', min(ts)) AS h0, date_trunc('hour', max(ts)) AS h1
          FROM events),
        grid AS (
          SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
          FROM (SELECT DISTINCT event_type FROM events), bounds),
        hourly AS (
          SELECT event_type, date_trunc('hour', ts) AS hour, COUNT(*) AS n
          FROM events GROUP BY event_type, hour)
        SELECT g.event_type, strftime(g.hour, '%Y-%m-%d %H:00') AS hour,
               CAST(COALESCE(hourly.n, 0) AS BIGINT) AS n
        FROM grid g LEFT JOIN hourly ON g.event_type = hourly.event_type AND g.hour = hourly.hour
        ORDER BY g.event_type, g.hour""")),

    // ── e12: event-transition (Markov) matrix — P(next event type | ──
    // current) over each user's chronological stream: the user-journey
    // model behind funnel design and anomaly alerts. One lead() window
    // pass per user (e08's no-self-join discipline), then a count rollup
    // and a per-row probability against the window-summed row total.
    // The matrix is |types|² rows — driver-safe at any corpus size; the
    // per-user windows are the only shuffle of the fact stream.
    GQuery("e12_transition_matrix",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
        val steps = ev(s, d)
          .select($"user_id", $"ts", $"event_id", $"event_type")
          .withColumn("next_type", lead($"event_type", 1).over(w))
          .filter($"next_type".isNotNull)
        val counts = steps.groupBy($"event_type".as("cur"), $"next_type".as("nxt"))
          .agg(count(lit(1)).as("n"))
        counts
          .withColumn("p", roundz($"n".cast(DoubleType) /
            sum($"n").over(Window.partitionBy($"cur")), 6))
          .orderBy($"cur", $"nxt")
      },
      Some("""
        WITH steps AS (
          SELECT event_type AS cur,
                 LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
          FROM events),
        counts AS (SELECT cur, nxt, COUNT(*) AS n FROM steps WHERE nxt IS NOT NULL GROUP BY cur, nxt)
        SELECT cur, nxt, n,
               (ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY cur), 6) + 0.0) AS p
        FROM counts ORDER BY cur, nxt""")),

    // ── e13: rolling active users — DAU and trailing-7-day actives ──
    // (WAU) per day. Exact rolling DISTINCT cannot ride a window frame,
    // so each distinct (user, day) CONTRIBUTES itself to the 7 days it
    // keeps the user "active" (bounded ×7 Generate over the deduped
    // user-day frame — corpus-volume-independent), then one
    // count-distinct per day. The 100 TB story: the raw stream collapses
    // to user-days map-side first; everything after is proportional to
    // users × days, not events.
    GQuery("e13_rolling_active",
      (s, d) => {
        import s.implicits._
        val du = ev(s, d).select($"user_id", to_date($"ts").as("day")).distinct()
        val bounds = ev(s, d).agg(max(to_date($"ts")).as("dmax"))
        val dau = du.groupBy($"day").agg(count(lit(1)).as("dau"))
        val wau = du
          .select($"user_id", explode(expr("sequence(day, date_add(day, 6))")).as("day"))
          .join(broadcast(bounds))
          .filter($"day" <= $"dmax")
          .groupBy($"day").agg(countDistinct($"user_id").as("wau"))
        wau.join(dau, Seq("day"), "left")
          .select(date_format($"day", "yyyy-MM-dd").as("day"),
            coalesce($"dau", lit(0L)).as("dau"), $"wau")
          .orderBy($"day")
      },
      Some("""
        WITH du AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        bounds AS (SELECT max(CAST(ts AS DATE)) AS dmax FROM events),
        dau AS (SELECT day, COUNT(*) AS dau FROM du GROUP BY day),
        contrib AS (
          SELECT user_id, unnest(generate_series(day, day + 6, INTERVAL 1 DAY))::DATE AS day
          FROM du),
        wau AS (SELECT c.day, COUNT(DISTINCT c.user_id) AS wau
                FROM contrib c, bounds WHERE c.day <= bounds.dmax GROUP BY c.day)
        SELECT strftime(w.day, '%Y-%m-%d') AS day,
               CAST(COALESCE(dau.dau, 0) AS BIGINT) AS dau,
               CAST(w.wau AS BIGINT) AS wau
        FROM wau w LEFT JOIN dau ON w.day = dau.day
        ORDER BY day""")),

    // ── e14: frequent journey trigrams — the top-10 3-step event-type ──
    // sequences across all user journeys (the sequence-mining pass that
    // seeds funnel definitions). Two lead() taps on ONE per-user window
    // (e08/e12's no-self-join discipline: a 3-way self-join would
    // shuffle the stream three times), then a count rollup whose key
    // space is |types|³ — tiny — so the top-k is a TakeOrdered merge,
    // never a global sort.
    GQuery("e14_journey_trigrams",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
        ev(s, d)
          .select($"user_id", $"ts", $"event_id", $"event_type")
          .withColumn("e2", lead($"event_type", 1).over(w))
          .withColumn("e3", lead($"event_type", 2).over(w))
          .filter($"e3".isNotNull)
          .groupBy($"event_type".as("e1"), $"e2", $"e3")
          .agg(count(lit(1)).as("n"))
          .orderBy($"n".desc, $"e1", $"e2", $"e3")
          .limit(10)
      },
      Some("""
        WITH steps AS (
          SELECT event_type AS e1,
                 LEAD(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e2,
                 LEAD(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e3
          FROM events)
        SELECT e1, e2, e3, COUNT(*) AS n
        FROM steps WHERE e3 IS NOT NULL
        GROUP BY e1, e2, e3
        ORDER BY n DESC, e1, e2, e3 LIMIT 10""")),

    // ── e15: cohort funnel — per signup-week cohort, how many users ──
    // viewed and purchased within 7 days of signup (e03's single global
    // rate, resolved by cohort and step with a bounded attribution
    // window). The user's step flags collapse in ONE grouped pass over
    // the signup⋈activity join (max-of-indicators — no per-step joins),
    // then a tiny per-cohort rollup. The join is equality on user_id —
    // at 100 TB both sides hash-partition on the user key once; the
    // 7-day bound is exact epoch-micros arithmetic inside the join
    // projection, never a range-join condition.
    GQuery("e15_cohort_funnel",
      (s, d) => {
        import s.implicits._
        val events = ev(s, d)
        val su = events.filter($"event_type" === "signup")
          .groupBy($"user_id").agg(min($"ts").as("su_ts"))
        val acts = events.filter($"event_type".isin("view", "purchase"))
          .select($"user_id", $"event_type", $"ts")
        val winUs = 7L * 86400L * 1000000L
        val stepped = su.join(acts, Seq("user_id"), "left")
          .withColumn("in_win",
            $"ts".isNotNull && $"ts" > $"su_ts" &&
              unix_micros($"ts") - unix_micros($"su_ts") <= winUs)
          .groupBy($"user_id", $"su_ts")
          .agg(max(when($"in_win" && $"event_type" === "view", 1L).otherwise(0L)).as("viewed"),
            max(when($"in_win" && $"event_type" === "purchase", 1L).otherwise(0L)).as("purchased"))
        stepped
          .groupBy(date_format(date_trunc("week", $"su_ts"), "yyyy-MM-dd").as("cohort_week"))
          .agg(count(lit(1)).as("n_signups"),
            sum($"viewed").as("n_viewed"),
            sum($"purchased").as("n_purchased"))
          .withColumn("view_rate", roundz($"n_viewed".cast(DoubleType) / $"n_signups", 6))
          .withColumn("purchase_rate", roundz($"n_purchased".cast(DoubleType) / $"n_signups", 6))
          .orderBy($"cohort_week")
      },
      Some("""
        WITH su AS (SELECT user_id, min(ts) AS su_ts FROM events
                    WHERE event_type = 'signup' GROUP BY user_id),
        acts AS (SELECT user_id, event_type, ts FROM events
                 WHERE event_type IN ('view', 'purchase')),
        stepped AS (
          SELECT su.user_id, su.su_ts,
                 MAX(CASE WHEN a.ts IS NOT NULL AND a.ts > su.su_ts
                            AND epoch_us(a.ts) - epoch_us(su.su_ts) <= 604800000000
                            AND a.event_type = 'view' THEN 1 ELSE 0 END) AS viewed,
                 MAX(CASE WHEN a.ts IS NOT NULL AND a.ts > su.su_ts
                            AND epoch_us(a.ts) - epoch_us(su.su_ts) <= 604800000000
                            AND a.event_type = 'purchase' THEN 1 ELSE 0 END) AS purchased
          FROM su LEFT JOIN acts a ON su.user_id = a.user_id
          GROUP BY su.user_id, su.su_ts)
        SELECT strftime(date_trunc('week', su_ts), '%Y-%m-%d') AS cohort_week,
               COUNT(*) AS n_signups,
               CAST(SUM(viewed) AS BIGINT) AS n_viewed,
               CAST(SUM(purchased) AS BIGINT) AS n_purchased,
               (ROUND(CAST(SUM(viewed) AS DOUBLE) / COUNT(*), 6) + 0.0) AS view_rate,
               (ROUND(CAST(SUM(purchased) AS DOUBLE) / COUNT(*), 6) + 0.0) AS purchase_rate
        FROM stepped GROUP BY cohort_week ORDER BY cohort_week""")),

    // ── e16: robust rate anomalies — median/MAD outlier detection over ──
    // the hourly rollup (e07's z-score breaks when the anomaly itself
    // inflates the mean/stddev; median/MAD don't). Everything after the
    // map-side hourly rollup is EXACT: interpolated percentiles of
    // integer counts are halves/quarters (binary-exact doubles), |n−med|
    // and 3·MAD are exact arithmetic on them, so the anomaly flag cannot
    // flip across engines. Two grouped percentile passes + one join-back,
    // all on the tiny (type, hour) frame — event volume touches only the
    // first rollup.
    GQuery("e16_mad_anomaly",
      (s, d) => {
        import s.implicits._
        val hourly = ev(s, d)
          .groupBy($"event_type", date_trunc("hour", $"ts").as("hour"))
          .agg(count(lit(1)).as("n"))
        val med = hourly.groupBy($"event_type")
          .agg(expr("percentile(n, 0.5)").as("med"))
        val mad = hourly.join(med, "event_type")
          .groupBy($"event_type")
          .agg(max($"med").as("med"),
            expr("percentile(abs(n - med), 0.5)").as("mad"))
        hourly.join(broadcast(mad), "event_type")
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n_hours"),
            max($"med").as("med"),
            max($"mad").as("mad"),
            sum(when(abs($"n" - $"med") > $"mad" * 3, 1L).otherwise(0L)).as("n_anomalous"),
            max(abs($"n" - $"med")).as("max_abs_dev"))
          .orderBy($"event_type")
      },
      Some("""
        WITH hourly AS (
          SELECT event_type, date_trunc('hour', ts) AS hour, COUNT(*) AS n
          FROM events GROUP BY event_type, hour),
        med AS (SELECT event_type, quantile_cont(n, 0.5) AS med
                FROM hourly GROUP BY event_type),
        mad AS (SELECT event_type, MAX(med) AS med,
                       quantile_cont(abs(n - med), 0.5) AS mad
                FROM hourly JOIN med USING (event_type) GROUP BY event_type)
        SELECT event_type, COUNT(*) AS n_hours, MAX(med) AS med, MAX(mad) AS mad,
               CAST(SUM(CASE WHEN abs(n - med) > mad * 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalous,
               MAX(abs(n - med)) AS max_abs_dev
        FROM hourly JOIN mad USING (event_type)
        GROUP BY event_type ORDER BY event_type""")),

    // ── e17: time-to-convert — signup→first-purchase latency ──
    // distribution per signup-week cohort (e15 counts who converts;
    // this measures HOW FAST). Latency is exact integer arithmetic end
    // to end: epoch-micros difference DIV'd to whole hours before the
    // percentile, whose interpolation over integers is binary-exact.
    // Per-user first-purchase collapses in the same grouped pass as the
    // join (min over the matched purchases) — one user-keyed shuffle,
    // then a tiny per-cohort rollup.
    GQuery("e17_time_to_convert",
      (s, d) => {
        import s.implicits._
        val events = ev(s, d)
        val su = events.filter($"event_type" === "signup")
          .groupBy($"user_id").agg(min($"ts").as("su_ts"))
        val conv = su.join(events.filter($"event_type" === "purchase"), Seq("user_id"))
          .filter($"ts" > $"su_ts")
          .groupBy($"user_id", $"su_ts")
          .agg(min($"ts").as("p_ts"))
          .withColumn("lat_hr",
            expr("(unix_micros(p_ts) - unix_micros(su_ts)) DIV 3600000000"))
        conv
          .groupBy(date_format(date_trunc("week", $"su_ts"), "yyyy-MM-dd").as("cohort_week"))
          .agg(count(lit(1)).as("n_converted"),
            roundz(expr("percentile(lat_hr, 0.5)"), 4).as("p50_hours"),
            roundz(expr("percentile(lat_hr, 0.9)"), 4).as("p90_hours"),
            max($"lat_hr").as("max_hours"))
          .orderBy($"cohort_week")
      },
      Some("""
        WITH su AS (SELECT user_id, min(ts) AS su_ts FROM events
                    WHERE event_type = 'signup' GROUP BY user_id),
        conv AS (
          SELECT su.user_id, su.su_ts, min(e.ts) AS p_ts
          FROM su JOIN events e ON su.user_id = e.user_id
          WHERE e.event_type = 'purchase' AND e.ts > su.su_ts
          GROUP BY su.user_id, su.su_ts),
        lat AS (
          SELECT strftime(date_trunc('week', su_ts), '%Y-%m-%d') AS cohort_week,
                 (epoch_us(p_ts) - epoch_us(su_ts)) // 3600000000 AS lat_hr
          FROM conv)
        SELECT cohort_week, COUNT(*) AS n_converted,
               (ROUND(quantile_cont(lat_hr, 0.5), 4) + 0.0) AS p50_hours,
               (ROUND(quantile_cont(lat_hr, 0.9), 4) + 0.0) AS p90_hours,
               CAST(MAX(lat_hr) AS BIGINT) AS max_hours
        FROM lat GROUP BY cohort_week ORDER BY cohort_week""")),

    // ── e18: diurnal peak profile — per event type, the hour-of-day ──
    // histogram's peak (capacity planning / alert-threshold seasonality).
    // Peak selection is q35's exact-argmax discipline: a BIGINT ordering
    // key (n·100 + 99−hour) makes max_by deterministic under count ties
    // — engine-native argmax tie-breaks differ, a raw max_by(hr, n)
    // would diverge. One 24×|types| partial-agg'd rollup; no window.
    GQuery("e18_peak_profile",
      (s, d) => {
        import s.implicits._
        val hr = ev(s, d)
          .select($"event_type", hour($"ts").cast(LongType).as("hr"))
          .groupBy($"event_type", $"hr")
          .agg(count(lit(1)).as("n"))
        hr.groupBy($"event_type")
          .agg(sum($"n").as("total"),
            max_by($"hr", $"n" * 100L + (lit(99L) - $"hr")).as("peak_hour"),
            max($"n").as("peak_n"))
          .withColumn("peak_share", roundz($"peak_n".cast(DoubleType) / $"total", 6))
          .orderBy($"event_type")
      },
      Some("""
        WITH hr AS (
          SELECT event_type, CAST(hour(ts) AS BIGINT) AS hr, COUNT(*) AS n
          FROM events GROUP BY event_type, hr)
        SELECT event_type, CAST(SUM(n) AS BIGINT) AS total,
               arg_max(hr, n * 100 + (99 - hr)) AS peak_hour,
               MAX(n) AS peak_n,
               (ROUND(CAST(MAX(n) AS DOUBLE) / SUM(n), 6) + 0.0) AS peak_share
        FROM hr GROUP BY event_type ORDER BY event_type""")),

    // ── e19: churn buckets — users by activity recency (active ≤1d, ──
    // 1–7d, 7–14d, >14d) relative to the stream's horizon: the lifecycle
    // report behind every re-engagement campaign. Per-user last-activity
    // collapses map-side (one max per user), the horizon rides in as a
    // broadcast 1-row aggregate (q23's pattern), and the bucket bound is
    // exact integer epoch-micros DIV days — work ∝ users, not events.
    GQuery("e19_churn_buckets",
      (s, d) => {
        import s.implicits._
        val lastSeen = ev(s, d).groupBy($"user_id")
          .agg(max(unix_micros($"ts")).as("last_us"))
        val horizon = ev(s, d).agg(max(unix_micros($"ts")).as("h_us"))
        lastSeen.join(broadcast(horizon))
          .withColumn("days_silent", expr("(h_us - last_us) DIV 86400000000"))
          .withColumn("bucket",
            when($"days_silent" < 1, "active")
              .when($"days_silent" < 7, "lapsing")
              .when($"days_silent" < 14, "dormant")
              .otherwise("churned"))
          .groupBy($"bucket")
          .agg(count(lit(1)).as("n_users"),
            min($"days_silent").as("min_days"),
            max($"days_silent").as("max_days"))
          .orderBy($"bucket")
      },
      Some("""
        WITH ls AS (SELECT user_id, MAX(epoch_us(ts)) AS last_us
                    FROM events GROUP BY user_id),
        h AS (SELECT MAX(epoch_us(ts)) AS h_us FROM events),
        b AS (
          SELECT (h_us - last_us) // 86400000000 AS days_silent,
                 CASE WHEN (h_us - last_us) // 86400000000 < 1 THEN 'active'
                      WHEN (h_us - last_us) // 86400000000 < 7 THEN 'lapsing'
                      WHEN (h_us - last_us) // 86400000000 < 14 THEN 'dormant'
                      ELSE 'churned' END AS bucket
          FROM ls, h)
        SELECT bucket, COUNT(*) AS n_users,
               MIN(days_silent) AS min_days, MAX(days_silent) AS max_days
        FROM b GROUP BY bucket ORDER BY bucket""")),

    // ── e20: NATIVE session windows — Spark's built-in session_window() ──
    // aggregation (e02 builds the same sessions from lag+cumsum windows;
    // this is the engine-native operator, and the SAME groupBy runs under
    // Structured Streaming with watermark-merged session state — the form
    // you deploy). Semantics pin: Spark's session end = last event + gap,
    // so the oracle mirrors e02's gap-chain with end_us = max(ts) + 30 min.
    // One user-keyed shuffle; sessions per user merge in the aggregate.
    GQuery("e20_native_session_window",
      (s, d) => {
        import s.implicits._
        ev(s, d)
          .groupBy($"user_id", session_window($"ts", "30 minutes").as("sw"))
          .agg(count(lit(1)).as("n_events"))
          .select($"user_id",
            unix_micros($"sw.start").as("start_us"),
            unix_micros($"sw.end").as("end_us"),
            $"n_events")
          .orderBy($"user_id", $"start_us")
      },
      Some("""
        WITH t AS (
          SELECT user_id, ts,
                 CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                        OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        s AS (
          SELECT user_id, ts,
                 SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
          FROM t)
        SELECT user_id,
               epoch_us(MIN(ts)) AS start_us,
               epoch_us(MAX(ts)) + 1800000000 AS end_us,
               COUNT(*) AS n_events
        FROM s GROUP BY user_id, sess_id
        ORDER BY user_id, start_us""")),

    // ── e21: interval (range) join — each purchase event matched to the ──
    // session interval containing it. THE scale shape for range joins:
    // Spark has no range-join optimizer, so a bare ts-BETWEEN theta-join
    // degenerates to a broadcast nested loop; carrying the EQUALITY key
    // (user_id — intervals and probes are both per-user) makes it a plain
    // hash/sort-merge join with the range as a cheap residual filter, and
    // both sides co-partition. (Keyless global intervals bin the timeline
    // instead: explode intervals to covered bins, equi-join on bin —
    // e07/e11's bucketing discipline.) Sessions partition a user's
    // timeline, so every purchase lands in exactly ONE interval — row
    // count preserved, no dedup stage.
    GQuery("e21_interval_join",
      (s, d) => {
        import s.implicits._
        val purchases = ev(s, d).filter($"event_type" === "purchase")
          .select($"event_id", $"user_id", unix_micros($"ts").as("p_us"))
        purchases.join(sessionFrame(s, d), Seq("user_id"))
          .filter($"p_us" >= $"start_us" && $"p_us" <= $"end_us")
          .select($"event_id", $"user_id", $"p_us", $"session_id",
            $"n_events".as("session_events"),
            ($"end_us" - $"start_us").as("session_len_us"))
          .orderBy($"event_id")
      },
      Some(s"""
        WITH $sessSql,
        purchases AS (
          SELECT event_id, user_id, epoch_us(ts) AS p_us
          FROM events WHERE event_type = 'purchase')
        SELECT p.event_id, p.user_id, p.p_us, s.session_id,
               s.n_events AS session_events,
               s.end_us - s.start_us AS session_len_us
        FROM purchases p JOIN sess s ON p.user_id = s.user_id
        WHERE p.p_us >= s.start_us AND p.p_us <= s.end_us
        ORDER BY p.event_id""")),

    // ── e22: binned interval join — the KEYLESS range-join counterpart ──
    // to e21: global maintenance/report windows (no shared equality
    // column with events) would force a nested-loop theta-join; instead
    // the timeline is binned (1-hour buckets), each interval explodes to
    // the bins it covers (bounded: window length / bin size rows), events
    // map to their bin, and the join is plain hash-partitioned equality
    // on bin with the exact BETWEEN as a residual filter. Window
    // geometry derives from the corpus span with integer arithmetic, so
    // both engines cut identical disjoint windows at any SF.
    GQuery("e22_binned_interval_join",
      (s, d) => {
        import s.implicits._
        val hourUs = 3600000000L
        val mm = ev(s, d).agg(min(unix_micros($"ts")).as("t0"),
          max(unix_micros($"ts")).as("t1"))
        val windows = s.range(10).toDF("w_id").join(broadcast(mm))
          .select($"w_id",
            expr("t0 + w_id * ((t1 - t0) DIV 10)").as("w_start"),
            expr("t0 + w_id * ((t1 - t0) DIV 10) + (t1 - t0) DIV 40").as("w_end"))
        val wbins = windows.select($"w_id", $"w_start", $"w_end",
          explode(expr(s"sequence(w_start DIV $hourUs, (w_end - 1) DIV $hourUs)")).as("bin"))
        val ebins = ev(s, d).select($"event_id", unix_micros($"ts").as("t_us"),
          expr(s"unix_micros(ts) DIV $hourUs").as("bin"), $"value")
        ebins.join(wbins, "bin")
          .filter($"t_us" >= $"w_start" && $"t_us" < $"w_end")
          .groupBy($"w_id", $"w_start", $"w_end")
          .agg(count(lit(1)).as("n_events"), sumd(d2($"value")).as("value_sum"))
          .orderBy($"w_id")
      },
      Some("""
        WITH mm AS (SELECT min(epoch_us(ts)) AS t0, max(epoch_us(ts)) AS t1 FROM events),
        w AS (SELECT k.k AS w_id,
                     t0 + k.k * ((t1 - t0) // 10) AS w_start,
                     t0 + k.k * ((t1 - t0) // 10) + (t1 - t0) // 40 AS w_end
              FROM mm, (SELECT unnest(range(10)) AS k) k),
        wb AS (SELECT w_id, w_start, w_end,
                      unnest(range(w_start // 3600000000, (w_end - 1) // 3600000000 + 1)) AS bin
               FROM w),
        eb AS (SELECT event_id, epoch_us(ts) AS t_us,
                      epoch_us(ts) // 3600000000 AS bin, value
               FROM events)
        SELECT w_id, w_start, w_end, COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS value_sum
        FROM eb JOIN wb USING (bin)
        WHERE t_us >= w_start AND t_us < w_end
        GROUP BY w_id, w_start, w_end ORDER BY w_id""")),

    // ── e23: watermark lateness audit — how much data would a streaming ──
    // deployment drop at a given watermark delay? The batch emulation of
    // Structured Streaming's `withWatermark`: arrival order is proxied by
    // event_id grouped into micro-batches of 1000, PLUS deterministic
    // straggler jitter (5% of events arrive 2 batches late, 1% arrive 5
    // batches late — the corpus's event times are monotone in event_id,
    // so without modeled stragglers no watermark ever catches anything
    // and the audit is vacuous). The watermark in force when batch b
    // arrives is max(event time over batches < b) − D (10 min here); an
    // event is late iff its event time is behind that watermark. Per
    // event-time hour: volume, late count/ratio, worst lateness — the
    // report that says whether D is safe BEFORE flipping the pipeline to
    // streaming. Scale: the only wide stage is the per-batch max
    // (|events|/1000 rows); the running-max window runs on that
    // micro-batch METADATA frame (single-partition is fine for per-batch
    // rows — 100 TB/day is ~10⁵ batch rows), which then broadcast-joins
    // back to the stream; the hour rollup is the e01 two-phase agg.
    // StreamingSpec replays THIS arrival schedule through a real
    // withWatermark query and reconciles the engine's dropped-row metric
    // with this audit's prediction.
    GQuery("e23_late_event_audit",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val delayUs = 600000000L // 10-minute watermark delay
        val eb = ev(s, d).select($"event_id", $"ts",
          unix_micros($"ts").as("t_us"),
          (expr("event_id DIV 1000") + expr(
            """CASE WHEN CAST(conv(substring(md5(concat('arr:', event_id)), 1, 15), 16, 10) AS BIGINT) % 20 = 0 THEN 2
                    WHEN CAST(conv(substring(md5(concat('arr:', event_id)), 1, 15), 16, 10) AS BIGINT) % 100 = 7 THEN 5
                    ELSE 0 END""")).as("batch"))
        val wm = eb.groupBy($"batch").agg(max($"t_us").as("batch_max"))
          .withColumn("wm_us",
            max($"batch_max").over(
              Window.orderBy($"batch").rowsBetween(Window.unboundedPreceding, -1))
              - delayUs)
        eb.join(broadcast(wm.select($"batch", $"wm_us")), "batch")
          .withColumn("late", $"wm_us".isNotNull && $"t_us" < $"wm_us")
          .groupBy(date_format(date_trunc("hour", $"ts"), "yyyy-MM-dd HH:00").as("hour"))
          .agg(count(lit(1)).as("n_events"),
            sum(when($"late", 1L).otherwise(0L)).as("n_late"),
            max(when($"late", expr("(wm_us - t_us) DIV 1000000")).otherwise(lit(null)))
              .as("worst_lateness_sec"))
          .withColumn("late_ratio", roundz($"n_late" / $"n_events", 6))
          .select($"hour", $"n_events", $"n_late", $"late_ratio", $"worst_lateness_sec")
          .orderBy($"hour")
      },
      Some("""
        WITH eb AS (SELECT event_id, ts, epoch_us(ts) AS t_us,
                           event_id // 1000
                           + (CASE WHEN CAST('0x' || substr(md5('arr:' || event_id), 1, 15) AS BIGINT) % 20 = 0 THEN 2
                                   WHEN CAST('0x' || substr(md5('arr:' || event_id), 1, 15) AS BIGINT) % 100 = 7 THEN 5
                                   ELSE 0 END) AS batch
                    FROM events),
        wm AS (SELECT batch,
                      MAX(MAX(t_us)) OVER (ORDER BY batch
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                        - 600000000 AS wm_us
               FROM eb GROUP BY batch),
        flagged AS (
          SELECT eb.ts, eb.t_us, wm.wm_us,
                 wm.wm_us IS NOT NULL AND eb.t_us < wm.wm_us AS late
          FROM eb JOIN wm USING (batch))
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
               COUNT(*) AS n_events,
               CAST(SUM(CASE WHEN late THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
               (ROUND(CAST(SUM(CASE WHEN late THEN 1 ELSE 0 END) AS BIGINT)
                 / CAST(COUNT(*) AS DOUBLE), 6) + 0.0) AS late_ratio,
               MAX(CASE WHEN late THEN (wm_us - t_us) // 1000000 ELSE NULL END) AS worst_lateness_sec
        FROM flagged GROUP BY hour ORDER BY hour""")),

    // ── e24: the e22 interval join written the way a USER writes it — a ──
    // plain keyless BETWEEN theta-join — planned scale-safe by the
    // BinnedRangeJoinRule optimizer rewrite instead of by hand. The query
    // enables the rule (1-hour bins), declares `events ⋈ windows ON t
    // BETWEEN w_start AND w_end`, and forces plan materialization while
    // the conf is set (the rewritten logical plan is cached on the
    // returned frame; the session conf is restored so no other query
    // planer sees it). Same output as a hand-binned e22-style join; the
    // oracle is the naive BETWEEN in DuckDB. BinJoinRuleSpec pins the
    // no-nested-loop plan shape; this entry pins the rewrite's VALUES
    // under the driver's bit-level gate and benches it at sf0.1.
    GQuery("e24_auto_range_join",
      (s, d) => {
        import s.implicits._
        val mm = ev(s, d).agg(min(unix_micros($"ts")).as("t0"),
          max(unix_micros($"ts")).as("t1"))
        val windows = s.range(12).toDF("w_id").join(broadcast(mm))
          .select($"w_id",
            expr("t0 + w_id * ((t1 - t0) DIV 12)").as("w_start"),
            expr("t0 + w_id * ((t1 - t0) DIV 12) + (t1 - t0) DIV 30").as("w_end"))
        val points = ev(s, d).select(unix_micros($"ts").as("t_us"), $"value")
        val joined = points.join(windows,
            $"t_us" >= $"w_start" && $"t_us" < $"w_end")
          .groupBy($"w_id", $"w_start", $"w_end")
          .agg(count(lit(1)).as("n_events"), sumd(d2($"value")).as("value_sum"))
          .orderBy($"w_id")
        val prev = s.conf.getOption(graft.plans.BinnedRangeJoinRule.ConfKey)
        s.conf.set(graft.plans.BinnedRangeJoinRule.ConfKey, "3600000000")
        try joined.queryExecution.executedPlan // plan now, under the conf
        finally prev match {
          case Some(v) => s.conf.set(graft.plans.BinnedRangeJoinRule.ConfKey, v)
          case None    => s.conf.unset(graft.plans.BinnedRangeJoinRule.ConfKey)
        }
        joined
      },
      Some("""
        WITH mm AS (SELECT min(epoch_us(ts)) AS t0, max(epoch_us(ts)) AS t1 FROM events),
        w AS (SELECT k.k AS w_id,
                     t0 + k.k * ((t1 - t0) // 12) AS w_start,
                     t0 + k.k * ((t1 - t0) // 12) + (t1 - t0) // 30 AS w_end
              FROM mm, (SELECT unnest(range(12)) AS k) k),
        pts AS (SELECT epoch_us(ts) AS t_us, value FROM events)
        SELECT w_id, w_start, w_end, COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS value_sum
        FROM pts JOIN w ON t_us >= w_start AND t_us < w_end
        GROUP BY w_id, w_start, w_end ORDER BY w_id""")),

    // ── e25: watermark delay sweep — e23 answers "how much drops at ──
    // D=10 min"; this answers the question ops actually asks: "what is
    // the SMALLEST delay with an acceptable drop rate?" Same arrival
    // model (1000-event micro-batches + deterministic straggler jitter),
    // one undelayed running-max frame, then each event fans out to the 5
    // candidate delays (bounded ×5 row growth, collapsed map-side by the
    // partial agg to 5 rows before any shuffle). `chosen` marks the
    // minimal acceptable delay via a window over the 5-ROW aggregate —
    // never over events. The state cost of a bigger delay is the streaming
    // operator's state window, so minimal-acceptable is the number a
    // deployment wants, not just any safe one.
    GQuery("e25_watermark_sweep",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val eb = ev(s, d).select($"event_id",
          unix_micros($"ts").as("t_us"),
          (expr("event_id DIV 1000") + expr(
            """CASE WHEN CAST(conv(substring(md5(concat('arr:', event_id)), 1, 15), 16, 10) AS BIGINT) % 20 = 0 THEN 2
                    WHEN CAST(conv(substring(md5(concat('arr:', event_id)), 1, 15), 16, 10) AS BIGINT) % 100 = 7 THEN 5
                    ELSE 0 END""")).as("batch"))
        val wm = eb.groupBy($"batch").agg(max($"t_us").as("batch_max"))
          .withColumn("wm_base_us",
            max($"batch_max").over(
              Window.orderBy($"batch").rowsBetween(Window.unboundedPreceding, -1)))
        val agg = eb.join(broadcast(wm.select($"batch", $"wm_base_us")), "batch")
          .select($"t_us", $"wm_base_us",
            explode(typedLit(Seq(60L, 120L, 300L, 600L, 1800L))).as("delay_sec"))
          .withColumn("late",
            $"wm_base_us".isNotNull && $"t_us" < $"wm_base_us" - $"delay_sec" * 1000000L)
          .groupBy($"delay_sec")
          .agg(count(lit(1)).as("n_events"),
            sum(when($"late", 1L).otherwise(0L)).as("n_late"))
          .withColumn("late_ratio", roundz($"n_late" / $"n_events", 6))
          .withColumn("acceptable", $"late_ratio" <= 0.001)
        agg
          .withColumn("chosen",
            $"acceptable" && $"delay_sec" ===
              min(when($"acceptable", $"delay_sec"))
                .over(Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
          .select($"delay_sec", $"n_events", $"n_late", $"late_ratio",
            $"acceptable", $"chosen")
          .orderBy($"delay_sec")
      },
      Some("""
        WITH eb AS (SELECT event_id, epoch_us(ts) AS t_us,
                           event_id // 1000
                           + (CASE WHEN CAST('0x' || substr(md5('arr:' || event_id), 1, 15) AS BIGINT) % 20 = 0 THEN 2
                                   WHEN CAST('0x' || substr(md5('arr:' || event_id), 1, 15) AS BIGINT) % 100 = 7 THEN 5
                                   ELSE 0 END) AS batch
                    FROM events),
        wm AS (SELECT batch,
                      MAX(MAX(t_us)) OVER (ORDER BY batch
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm_base_us
               FROM eb GROUP BY batch),
        dl AS (SELECT CAST(delay_sec AS BIGINT) AS delay_sec
               FROM (VALUES (60), (120), (300), (600), (1800)) v(delay_sec)),
        agg AS (
          SELECT delay_sec, COUNT(*) AS n_events,
                 CAST(SUM(CASE WHEN wm_base_us IS NOT NULL
                                AND t_us < wm_base_us - delay_sec * 1000000
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_late
          FROM eb JOIN wm USING (batch) CROSS JOIN dl
          GROUP BY delay_sec),
        fin AS (
          SELECT delay_sec, n_events, n_late,
                 (ROUND(CAST(n_late AS DOUBLE) / n_events, 6) + 0.0) AS late_ratio,
                 (ROUND(CAST(n_late AS DOUBLE) / n_events, 6) + 0.0) <= 0.001 AS acceptable
          FROM agg)
        SELECT delay_sec, n_events, n_late, late_ratio, acceptable,
               acceptable AND delay_sec = MIN(CASE WHEN acceptable THEN delay_sec END) OVER ()
                 AS chosen
        FROM fin ORDER BY delay_sec""")),

    // ── e26: dwell time — per event, time until the user's NEXT event, ──
    // counted as engagement only within the e02 session discipline (gaps
    // over 30 min are absence, not dwell — the same 1800s cutoff, so the
    // two operators tell one consistent story). One lead() window per
    // user (single shuffle on user_id), then a per-event-type rollup:
    // which surfaces hold attention, which are exits. Mean dwell divides
    // an exact BIGINT micros sum — floats appear only in the final
    // division.
    GQuery("e26_dwell_time",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
        ev(s, d)
          .withColumn("gap_us", unix_micros(lead($"ts", 1).over(w)) - unix_micros($"ts"))
          .filter($"gap_us".isNotNull && $"gap_us" <= 1800000000L)
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n_dwells"),
            sum($"gap_us").as("total_dwell_us"),
            max($"gap_us").as("max_dwell_us"))
          .select($"event_type", $"n_dwells", $"total_dwell_us", $"max_dwell_us",
            roundz($"total_dwell_us".cast(DoubleType) / $"n_dwells" / 1000000.0, 6)
              .as("mean_dwell_sec"))
          .orderBy($"event_type")
      },
      Some("""
        WITH x AS (
          SELECT event_type,
                 epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC))
                   - epoch_us(ts) AS gap_us
          FROM events),
        dw AS (SELECT event_type, gap_us FROM x
               WHERE gap_us IS NOT NULL AND gap_us <= 1800000000)
        SELECT event_type, COUNT(*) AS n_dwells,
               CAST(SUM(gap_us) AS BIGINT) AS total_dwell_us,
               CAST(MAX(gap_us) AS BIGINT) AS max_dwell_us,
               (ROUND(CAST(SUM(gap_us) AS DOUBLE) / COUNT(*) / 1000000.0, 6) + 0.0) AS mean_dwell_sec
        FROM dw GROUP BY event_type ORDER BY event_type""")),

    // ── e27: bot regularity — users whose inter-event gaps are TOO ──
    // regular (coefficient of variation under 0.9 — organic arrivals are
    // Poisson-ish with CV ≈ 1) are schedulers, not people: the
    // traffic-quality filter run before event streams feed any training
    // mix. The flag needs a variance, and variance is where cross-engine
    // float drift lives — so the test is algebra, not floats:
    // std < 0.9·mean  ⇔  100·(n·Σx² − (Σx)²) < 81·(Σx)², evaluated
    // in DECIMAL(38,0) (Σx² ≤ ~3e22 at any plausible per-user volume;
    // both engines compute the identical integers). One lag() window per
    // user + a per-user rollup; doubles appear only in the reported
    // rounded mean.
    GQuery("e27_bot_regularity",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
        val dec = DecimalType(38, 0)
        ev(s, d)
          .withColumn("gap_us", unix_micros($"ts") - lag(unix_micros($"ts"), 1).over(w))
          .filter($"gap_us".isNotNull)
          .groupBy($"user_id")
          .agg(count(lit(1)).as("n_gaps"),
            sum($"gap_us".cast(dec)).as("sx"),
            sum(($"gap_us".cast(dec) * $"gap_us".cast(dec))).as("sxx"))
          .filter($"n_gaps" >= 5)
          // 6-dp seconds = integer MICROseconds: round-half-up of the
          // exact rational sx/n is the pure-integer (2·sx+n) DIV (2·n) —
          // the double ROUND seam this replaces flipped the 6th decimal
          // between engines once means crossed a .5 µs boundary at the
          // sf1 sweep (Spark rounds the exact binary via BigDecimal,
          // DuckDB multiplies by 1e6 in floating point first). The
          // integer fits a double exactly, so the final /1e6 is one
          // correctly-rounded op — identical bits by construction.
          .select($"user_id", $"n_gaps",
            (expr("CAST((sx * 2 + n_gaps) DIV (n_gaps * 2) AS DOUBLE)")
              / 1000000.0).as("mean_gap_sec"),
            (lit(100).cast(dec) * ($"n_gaps".cast(dec) * $"sxx" - $"sx" * $"sx")
              < lit(81).cast(dec) * $"sx" * $"sx").as("is_bot"))
          .orderBy($"user_id")
      },
      Some("""
        WITH g AS (
          SELECT user_id,
                 epoch_us(ts) - lag(epoch_us(ts))
                   OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS gap_us
          FROM events),
        a AS (SELECT user_id, COUNT(*) AS n_gaps,
                     SUM(CAST(gap_us AS DECIMAL(38,0))) AS sx,
                     SUM(CAST(gap_us AS DECIMAL(38,0)) * CAST(gap_us AS DECIMAL(38,0))) AS sxx
              FROM g WHERE gap_us IS NOT NULL GROUP BY user_id)
        SELECT user_id, n_gaps,
               CAST((CAST(sx AS HUGEINT) * 2 + n_gaps) // (CAST(n_gaps AS HUGEINT) * 2) AS DOUBLE) / 1000000.0 AS mean_gap_sec,
               100 * (CAST(n_gaps AS DECIMAL(38,0)) * sxx - sx * sx) < 81 * (sx * sx) AS is_bot
        FROM a WHERE n_gaps >= 5 ORDER BY user_id""")),

    // ── e28: lag-1 autocorrelation of the hourly rate series per event ──
    // type — the one-number seasonality/burstiness probe (r≈0: Poisson-
    // like arrivals; r→1: smooth daily cycles; r<0: alternating bursts —
    // the complement of e27's per-user regularity, at the traffic level).
    // One hourly groupBy (two-phase agg over the corpus), then a lag
    // window and the Pearson sums over the per-type HOURS frame — rows =
    // #types × #hours in range, never event-count-sized; partitioned by
    // type, so no global window. All five Pearson sums are over exact
    // BIGINT counts; the closed-form r is one fixed double expression
    // over those exact sums (identical bits both engines, SURVEY §6).
    GQuery("e28_rate_autocorr",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val hourly = ev(s, d)
          .groupBy($"event_type", unix_micros(date_trunc("hour", $"ts")).as("hour_us"))
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy($"event_type").orderBy($"hour_us")
        // only TRUE adjacent-hour pairs enter the Pearson sums: a missing
        // (zero-count) hour must not make non-consecutive hours count as a
        // lag-1 pair — that biases r for sparse types
        val pairs = hourly
          .withColumn("prev", lag($"n", 1).over(w))
          .withColumn("prev_us", lag($"hour_us", 1).over(w))
          .filter($"prev".isNotNull && $"hour_us" - $"prev_us" === 3600000000L)
        pairs.groupBy($"event_type")
          .agg(count(lit(1)).as("n_pairs"),
            sum($"n").as("sy"), sum($"prev").as("sx"),
            sum($"n" * $"prev").as("sxy"),
            sum($"n" * $"n").as("sy2"), sum($"prev" * $"prev").as("sx2"))
          .select($"event_type", $"n_pairs",
            roundz(($"n_pairs" * $"sxy" - $"sx" * $"sy").cast(DoubleType) /
              (sqrt(($"n_pairs" * $"sx2" - $"sx" * $"sx").cast(DoubleType)) *
               sqrt(($"n_pairs" * $"sy2" - $"sy" * $"sy").cast(DoubleType))), 4)
              .as("autocorr_lag1"))
          .orderBy($"event_type")
      },
      Some("""
        WITH hourly AS (
          SELECT event_type, epoch_us(date_trunc('hour', ts)) AS hour_us,
                 COUNT(*) AS n
          FROM events GROUP BY event_type, hour_us),
        pairs AS (
          SELECT event_type, n, hour_us,
                 LAG(n, 1) OVER w AS prev,
                 LAG(hour_us, 1) OVER w AS prev_us
          FROM hourly
          WINDOW w AS (PARTITION BY event_type ORDER BY hour_us)),
        sums AS (
          SELECT event_type, COUNT(*) AS n_pairs,
                 CAST(SUM(n) AS BIGINT) AS sy, CAST(SUM(prev) AS BIGINT) AS sx,
                 CAST(SUM(n * prev) AS BIGINT) AS sxy,
                 CAST(SUM(n * n) AS BIGINT) AS sy2, CAST(SUM(prev * prev) AS BIGINT) AS sx2
          FROM pairs WHERE prev IS NOT NULL AND hour_us - prev_us = 3600000000
          GROUP BY event_type)
        SELECT event_type, n_pairs,
               (ROUND(CAST(n_pairs * sxy - sx * sy AS DOUBLE) /
                      (sqrt(CAST(n_pairs * sx2 - sx * sx AS DOUBLE)) *
                       sqrt(CAST(n_pairs * sy2 - sy * sy AS DOUBLE))), 4) + 0.0) AS autocorr_lag1
        FROM sums ORDER BY event_type""")),

    // ── e29: weekly retention-rate triangle — e04's count triangle ──
    // lifted to the report analysts actually read: per signup cohort
    // (first-seen week), the FRACTION of the cohort still active at
    // each week offset. The only new machinery over e04 is the
    // normalization: cohort size = the triangle's own offset-0 cell,
    // broadcast down the cohort via a window over the TINY
    // (cohorts × offsets) aggregate — events are touched exactly twice
    // (first-seen agg + distinct user-weeks), both user_id-keyed
    // shuffles, and the rate divides exact BIGINTs once.
    GQuery("e29_retention_rate",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val weeks = ev(s, d)
          .select($"user_id", to_date(date_trunc("week", $"ts")).as("w")).distinct()
        val first = weeks.groupBy($"user_id").agg(min($"w").as("w0"))
        val tri = weeks.join(first, Seq("user_id"))
          .select(date_format($"w0", "yyyy-MM-dd").as("cohort_week"),
            (datediff($"w", $"w0") / 7).cast(IntegerType).as("offset_weeks"),
            $"user_id")
          .groupBy($"cohort_week", $"offset_weeks")
          .agg(countDistinct($"user_id").as("n_active"))
        val wC = Window.partitionBy($"cohort_week")
        tri
          .withColumn("cohort_size",
            max(when($"offset_weeks" === 0, $"n_active")).over(wC))
          .select($"cohort_week", $"offset_weeks", $"n_active", $"cohort_size",
            roundz($"n_active".cast(DoubleType) / $"cohort_size", 6).as("retention"))
          .orderBy($"cohort_week", $"offset_weeks")
      },
      Some("""
        WITH weeks AS (SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS w
                       FROM events),
        first AS (SELECT user_id, MIN(w) AS w0 FROM weeks GROUP BY user_id),
        tri AS (SELECT strftime(first.w0, '%Y-%m-%d') AS cohort_week,
                       CAST(date_diff('day', first.w0, weeks.w) // 7 AS INT) AS offset_weeks,
                       CAST(COUNT(DISTINCT weeks.user_id) AS BIGINT) AS n_active
                FROM weeks JOIN first ON weeks.user_id = first.user_id
                GROUP BY cohort_week, offset_weeks),
        sized AS (SELECT *, CAST(MAX(CASE WHEN offset_weeks = 0 THEN n_active END)
                              OVER (PARTITION BY cohort_week) AS BIGINT) AS cohort_size
                  FROM tri)
        SELECT cohort_week, offset_weeks, n_active, cohort_size,
               (ROUND(CAST(n_active AS DOUBLE) / cohort_size, 6) + 0.0) AS retention
        FROM sized ORDER BY cohort_week, offset_weeks""")),

    // ── e30: seasonal forecast backtest — holds out the LAST day, ──
    // forecasts its hourly per-type counts two ways (diurnal profile =
    // per-(type, hour-of-day) mean over all earlier days; persistence =
    // the previous day's same hour), and reports each forecast's MAE:
    // the one-table answer to "is the diurnal cycle signal or noise?"
    // (e18 found the peaks; this scores whether they predict). Scored
    // hours = hours where BOTH forecasts exist (inner joins — no
    // imputation policy smuggled in). Everything after the hourly
    // rollup lives on ≤ |types|×24 rows; the mean divides exact BIGINT
    // sums, each |error| is rounded then DECIMAL-summed, one division
    // per MAE — and the winner flag compares the two ROUNDED MAEs so it
    // cannot flip on a ulp cross-engine.
    GQuery("e30_seasonal_backtest",
      (s, d) => {
        import s.implicits._
        val hourly = ev(s, d)
          .groupBy($"event_type", to_date($"ts").as("day"), hour($"ts").as("h"))
          .agg(count(lit(1)).as("n"))
        val lastDay = hourly.agg(max($"day").as("last_day"))
        val withLast = hourly.join(broadcast(lastDay))
        val test = withLast.filter($"day" === $"last_day")
          .select($"event_type", $"h", $"n".as("actual"))
        val profile = withLast.filter($"day" < $"last_day")
          .groupBy($"event_type", $"h")
          .agg(roundz(sum($"n").cast(DoubleType) / count(lit(1)), 6).as("fc_seasonal"))
        val persist = withLast.filter($"day" === date_sub($"last_day", 1))
          .select($"event_type", $"h", $"n".cast(DoubleType).as("fc_persist"))
        test.join(profile, Seq("event_type", "h"))
          .join(persist, Seq("event_type", "h"))
          .select($"event_type",
            roundz(abs($"fc_seasonal" - $"actual"), 6)
              .cast(DecimalType(14, 6)).as("e_seasonal"),
            roundz(abs($"fc_persist" - $"actual"), 6)
              .cast(DecimalType(14, 6)).as("e_persist"))
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n_scored"),
            roundz(sumd($"e_seasonal") / count(lit(1)), 6).as("mae_seasonal"),
            roundz(sumd($"e_persist") / count(lit(1)), 6).as("mae_persist"))
          .withColumn("seasonal_wins", $"mae_seasonal" < $"mae_persist")
          .orderBy($"event_type")
      },
      Some("""
        WITH hourly AS (
          SELECT event_type, CAST(ts AS DATE) AS day, CAST(hour(ts) AS INT) AS h,
                 COUNT(*) AS n
          FROM events GROUP BY event_type, day, h),
        last AS (SELECT MAX(day) AS last_day FROM hourly),
        test AS (SELECT event_type, h, n AS actual FROM hourly, last
                 WHERE day = last_day),
        profile AS (SELECT event_type, h,
                           (ROUND(CAST(SUM(n) AS DOUBLE) / COUNT(*), 6) + 0.0) AS fc_seasonal
                    FROM hourly, last WHERE day < last_day
                    GROUP BY event_type, h),
        persist AS (SELECT event_type, h, CAST(n AS DOUBLE) AS fc_persist
                    FROM hourly, last WHERE day = last_day - 1),
        scored AS (
          SELECT t.event_type,
                 CAST((ROUND(abs(fc_seasonal - actual), 6) + 0.0) AS DECIMAL(14,6)) AS e_seasonal,
                 CAST((ROUND(abs(fc_persist - actual), 6) + 0.0) AS DECIMAL(14,6)) AS e_persist
          FROM test t JOIN profile p ON t.event_type = p.event_type AND t.h = p.h
                      JOIN persist q ON t.event_type = q.event_type AND t.h = q.h),
        agg AS (
          SELECT event_type, COUNT(*) AS n_scored,
                 (ROUND(CAST(SUM(e_seasonal) AS DOUBLE) / COUNT(*), 6) + 0.0) AS mae_seasonal,
                 (ROUND(CAST(SUM(e_persist) AS DOUBLE) / COUNT(*), 6) + 0.0) AS mae_persist
          FROM scored GROUP BY event_type)
        SELECT event_type, n_scored, mae_seasonal, mae_persist,
               (mae_seasonal < mae_persist) AS seasonal_wins
        FROM agg ORDER BY event_type""")),

    // ── e31: the custom AsOfJoinExec operator (graft.plans.AsOfJoin — ──
    // logical node + planner strategy + physical sorted-merge, the
    // whole-operator Catalyst tier) driven through the driver gate:
    // every error event picks up the user's latest earlier-or-equal
    // purchase, verified against DuckDB's NATIVE ASOF LEFT JOIN. Unlike
    // e06's same-table union+window composition, this is the general
    // two-table form: each side shuffles once on user_id, sorts by
    // (key, time), and the physical merge holds ONE row of state — no
    // window, no union, no per-row probe. Timestamps surface as exact
    // epoch micros; p_value is raw (no (user, ts) purchase ties at any
    // test SF — AsOfJoinSpec pins the semantics, this pins the values).
    GQuery("e31_asof_exec",
      (s, d) => {
        import s.implicits._
        val events = ev(s, d)
        val errors = events.filter($"event_type" === "error")
          .select($"user_id", $"event_id", $"ts")
        val purchases = events.filter($"event_type" === "purchase")
          .select($"user_id", $"ts".as("pts"), $"value".as("p_value"))
        graft.plans.AsOf.join(errors, purchases, "user_id", "ts", "pts")
          // output = left ++ right columns; right's join key repeats → rename
          .toDF("user_id", "event_id", "ts", "r_user_id", "pts", "p_value")
          .select($"event_id", $"user_id",
            unix_micros($"ts").as("ts_us"),
            unix_micros($"pts").as("p_ts_us"),
            $"p_value")
          .orderBy($"event_id")
      },
      Some("""
        WITH errors AS (
          SELECT user_id, event_id, ts FROM events WHERE event_type = 'error'),
        purchases AS (
          SELECT user_id, ts AS pts, value AS p_value
          FROM events WHERE event_type = 'purchase')
        SELECT e.event_id, e.user_id,
               epoch_us(e.ts) AS ts_us,
               epoch_us(p.pts) AS p_ts_us,
               p.p_value
        FROM errors e ASOF LEFT JOIN purchases p
          ON e.user_id = p.user_id AND e.ts >= p.pts
        ORDER BY e.event_id""")),

    // ── e32: as-of with TOLERANCE (pandas merge_asof surface) — the ──
    // backward match only counts within 1 hour: "the purchase context of
    // an error, if recent enough to be context". Same merge pass as e31;
    // tolerance is a per-row comparison against the one-row merge state,
    // so the plan (and its 100 TB story) is identical. Oracle = DuckDB's
    // native ASOF pick, null-ed past the tolerance horizon — exactly the
    // backward+tolerance semantics (the latest-≤ row either is within
    // tolerance or no row is).
    GQuery("e32_asof_tolerance",
      (s, d) => {
        import s.implicits._
        val events = ev(s, d)
        val errors = events.filter($"event_type" === "error")
          .select($"user_id", $"event_id", $"ts")
        val purchases = events.filter($"event_type" === "purchase")
          .select($"user_id", $"ts".as("pts"), $"value".as("p_value"))
        graft.plans.AsOf.join(errors, purchases, "user_id", "ts", "pts",
            "backward", Some(3600000000L))
          .toDF("user_id", "event_id", "ts", "r_user_id", "pts", "p_value")
          .select($"event_id", $"user_id",
            unix_micros($"ts").as("ts_us"),
            unix_micros($"pts").as("p_ts_us"),
            $"p_value")
          .orderBy($"event_id")
      },
      Some("""
        WITH errors AS (
          SELECT user_id, event_id, ts FROM events WHERE event_type = 'error'),
        purchases AS (
          SELECT user_id, ts AS pts, value AS p_value
          FROM events WHERE event_type = 'purchase')
        SELECT e.event_id, e.user_id,
               epoch_us(e.ts) AS ts_us,
               CASE WHEN epoch_us(e.ts) - epoch_us(p.pts) <= 3600000000
                    THEN epoch_us(p.pts) END AS p_ts_us,
               CASE WHEN epoch_us(e.ts) - epoch_us(p.pts) <= 3600000000
                    THEN p.p_value END AS p_value
        FROM errors e ASOF LEFT JOIN purchases p
          ON e.user_id = p.user_id AND e.ts >= p.pts
        ORDER BY e.event_id""")),

    // ── e33: FORWARD as-of — for every error, the user's FIRST purchase ──
    // at-or-after it ("did the error block conversion?"). The merge
    // consumes only strictly-earlier right rows and matches on the
    // un-consumed head: still one pass, ZERO rows of buffered state.
    // DuckDB's ASOF with a <= inequality is the native forward oracle.
    GQuery("e33_asof_forward",
      (s, d) => {
        import s.implicits._
        val events = ev(s, d)
        val errors = events.filter($"event_type" === "error")
          .select($"user_id", $"event_id", $"ts")
        val purchases = events.filter($"event_type" === "purchase")
          .select($"user_id", $"ts".as("pts"), $"value".as("p_value"))
        graft.plans.AsOf.join(errors, purchases, "user_id", "ts", "pts",
            "forward", None)
          .toDF("user_id", "event_id", "ts", "r_user_id", "pts", "p_value")
          .select($"event_id", $"user_id",
            unix_micros($"ts").as("ts_us"),
            unix_micros($"pts").as("p_ts_us"),
            $"p_value")
          .orderBy($"event_id")
      },
      Some("""
        WITH errors AS (
          SELECT user_id, event_id, ts FROM events WHERE event_type = 'error'),
        purchases AS (
          SELECT user_id, ts AS pts, value AS p_value
          FROM events WHERE event_type = 'purchase')
        SELECT e.event_id, e.user_id,
               epoch_us(e.ts) AS ts_us,
               epoch_us(p.pts) AS p_ts_us,
               p.p_value
        FROM errors e ASOF LEFT JOIN purchases p
          ON e.user_id = p.user_id AND e.ts <= p.pts
        ORDER BY e.event_id""")),

    // ── e34: NEAREST as-of — the closest purchase on either side of ──
    // each error, exact-distance ties resolving backward (deterministic).
    // The merge keeps the backward candidate (one row) and peeks the
    // forward head — still one pass, one row of state. Oracle composes
    // DuckDB's two native ASOF directions and picks the closer, the same
    // tie rule: no single-construct nearest exists in SQL, which is what
    // the operator is for.
    GQuery("e34_asof_nearest",
      (s, d) => {
        import s.implicits._
        val events = ev(s, d)
        val errors = events.filter($"event_type" === "error")
          .select($"user_id", $"event_id", $"ts")
        val purchases = events.filter($"event_type" === "purchase")
          .select($"user_id", $"ts".as("pts"), $"value".as("p_value"))
        graft.plans.AsOf.join(errors, purchases, "user_id", "ts", "pts",
            "nearest", None)
          .toDF("user_id", "event_id", "ts", "r_user_id", "pts", "p_value")
          .select($"event_id", $"user_id",
            unix_micros($"ts").as("ts_us"),
            unix_micros($"pts").as("p_ts_us"),
            $"p_value")
          .orderBy($"event_id")
      },
      Some("""
        WITH errors AS (
          SELECT user_id, event_id, ts FROM events WHERE event_type = 'error'),
        purchases AS (
          SELECT user_id, ts AS pts, value AS p_value
          FROM events WHERE event_type = 'purchase')
        SELECT e.event_id, e.user_id,
               epoch_us(e.ts) AS ts_us,
               CASE WHEN b.pts IS NOT NULL AND (f.pts IS NULL
                         OR epoch_us(e.ts) - epoch_us(b.pts)
                            <= epoch_us(f.pts) - epoch_us(e.ts))
                    THEN epoch_us(b.pts) ELSE epoch_us(f.pts) END AS p_ts_us,
               CASE WHEN b.pts IS NOT NULL AND (f.pts IS NULL
                         OR epoch_us(e.ts) - epoch_us(b.pts)
                            <= epoch_us(f.pts) - epoch_us(e.ts))
                    THEN b.p_value ELSE f.p_value END AS p_value
        FROM errors e
        ASOF LEFT JOIN purchases b
          ON e.user_id = b.user_id AND e.ts >= b.pts
        ASOF LEFT JOIN purchases f
          ON e.user_id = f.user_id AND e.ts <= f.pts
        ORDER BY e.event_id""")),

    // ── e35: the HOT-KEY-SAFE as-of composition (AsOf.joinSliced) under ──
    // the oracle gate: same semantics as e31, but the join key becomes
    // (user_id, 6-hour slice) with per-slice boundary seeds, so a user
    // hot enough to blow one task's budget spreads across ⌈span/6 h⌉
    // partitions. Equivalence with the plain operator is exact, which is
    // precisely what gating on e31's DuckDB ASOF oracle proves — the
    // whole seed machinery (boundary windows, cross-slice propagation,
    // null routing) is value-checked cross-engine, not just spec'd.
    GQuery("e35_asof_sliced",
      (s, d) => {
        import s.implicits._
        val events = ev(s, d)
        val errors = events.filter($"event_type" === "error")
          .select($"user_id", $"event_id", $"ts")
        val purchases = events.filter($"event_type" === "purchase")
          .select($"user_id", $"ts".as("pts"), $"value".as("p_value"))
        graft.plans.AsOf.joinSliced(errors, purchases, "user_id", "ts", "pts",
            "backward", None, sliceUs = 6L * 3600000000L)
          .select($"event_id", $"user_id",
            unix_micros($"ts").as("ts_us"),
            unix_micros($"r_pts").as("p_ts_us"),
            $"r_p_value".as("p_value"))
          .orderBy($"event_id")
      },
      Some("""
        WITH errors AS (
          SELECT user_id, event_id, ts FROM events WHERE event_type = 'error'),
        purchases AS (
          SELECT user_id, ts AS pts, value AS p_value
          FROM events WHERE event_type = 'purchase')
        SELECT e.event_id, e.user_id,
               epoch_us(e.ts) AS ts_us,
               epoch_us(p.pts) AS p_ts_us,
               p.p_value
        FROM errors e ASOF LEFT JOIN purchases p
          ON e.user_id = p.user_id AND e.ts >= p.pts
        ORDER BY e.event_id""")),

    // ── e36: RUNTIME-FILTERED as-of (AsOf.joinKeyFiltered) under the ──
    // oracle gate: e31's semantics with the purchase (dimension) side
    // pre-filtered by a runtime Bloom over the error users' keys — the
    // plan shape Spark's InjectRuntimeFilter builds for equi-joins but
    // can never give a custom operator. might_contain has no false
    // negatives, so the DuckDB ASOF oracle must still match bit-exactly;
    // that cross-engine equality is the proof the prefilter only drops
    // rows the merge could never emit. At 100 TB the filtered side is
    // the full dimension HISTORY (every version of every key); dropping
    // non-fact keys before its exchange shrinks the shuffle+sort by the
    // key-selectivity factor (errors touch a fraction of all users).
    GQuery("e36_asof_keyfiltered",
      (s, d) => {
        import s.implicits._
        val events = ev(s, d)
        val errors = events.filter($"event_type" === "error")
          .select($"user_id", $"event_id", $"ts")
        val purchases = events.filter($"event_type" === "purchase")
          .select($"user_id", $"ts".as("pts"), $"value".as("p_value"))
        graft.plans.AsOf.joinKeyFiltered(errors, purchases, "user_id", "ts", "pts")
          .toDF("user_id", "event_id", "ts", "r_user_id", "pts", "p_value")
          .select($"event_id", $"user_id",
            unix_micros($"ts").as("ts_us"),
            unix_micros($"pts").as("p_ts_us"),
            $"p_value")
          .orderBy($"event_id")
      },
      Some("""
        WITH errors AS (
          SELECT user_id, event_id, ts FROM events WHERE event_type = 'error'),
        purchases AS (
          SELECT user_id, ts AS pts, value AS p_value
          FROM events WHERE event_type = 'purchase')
        SELECT e.event_id, e.user_id,
               epoch_us(e.ts) AS ts_us,
               epoch_us(p.pts) AS p_ts_us,
               p.p_value
        FROM errors e ASOF LEFT JOIN purchases p
          ON e.user_id = p.user_id AND e.ts >= p.pts
        ORDER BY e.event_id""")),

    // ── e37: COMPOSITE-KEY as-of (AsOf.joinMulti) under the oracle gate — ──
    // for every order, the same customer's PREVIOUS order of the SAME
    // priority (the (tenant, user)-shaped key the production operator
    // exists for). Self-as-of needs STRICT "earlier": the inclusive
    // backward merge runs on left time − 1 µs, turning ≤ into <, so an
    // order never matches itself and same-day pairs drop identically on
    // both engines. Output is the matched TIME (deterministic under
    // exact-tie right rows — equal rts by definition). DuckDB's ASOF
    // with two equality conditions is the native oracle, so the whole
    // joinMulti machinery — struct packing, per-field null routing —
    // is value-checked cross-engine, not just spec'd.
    GQuery("e37_asof_multikey",
      (s, d) => {
        import s.implicits._
        val orders = graft.Tables.load(s, d, "orders")
        val l = orders.select($"o_orderkey", $"o_custkey", $"o_orderpriority",
          (unix_micros($"o_orderdate") - 1).as("tsm"))
        val r = orders.select($"o_custkey", $"o_orderpriority",
          unix_micros($"o_orderdate").as("rts"))
        graft.plans.AsOf.joinMulti(l, r,
            Seq("o_custkey", "o_orderpriority"), "tsm", "rts")
          .select($"o_orderkey", $"o_custkey", $"o_orderpriority",
            $"r_rts".as("prev_us"))
          .orderBy($"o_orderkey")
      },
      Some("""
        WITH l AS (SELECT o_orderkey, o_custkey, o_orderpriority,
                          epoch_us(o_orderdate) - 1 AS tsm FROM orders),
        r AS (SELECT o_custkey AS ck, o_orderpriority AS pr,
                     epoch_us(o_orderdate) AS rts FROM orders)
        SELECT l.o_orderkey, l.o_custkey, l.o_orderpriority, r.rts AS prev_us
        FROM l ASOF LEFT JOIN r
          ON l.o_custkey = r.ck AND l.o_orderpriority = r.pr AND l.tsm >= r.rts
        ORDER BY l.o_orderkey""")),

    // ── e38: the ASOF SQL HINT — the operator from pure spark.sql text ──
    // (plans/AsOfHintRule, injected via injectResolutionRule): a plain
    // equi-JOIN plus /*+ ASOF(lt, rt) */ rewrites into AsOfJoinPlan
    // during analysis — the closest Spark extensions come to DuckDB's
    // native ASOF JOIN syntax. This is the INNER form (bare JOIN):
    // unmatched errors drop, like DuckDB's bare ASOF JOIN — so the
    // oracle is the native inner ASOF and the rule's IsNotNull rewrite
    // is value-gated cross-engine, not just spec'd. Plan shape is e31's
    // exactly (the rewrite lands the same physical operator).
    GQuery("e38_asof_sql_hint",
      (s, d) => {
        import s.implicits._
        val events = ev(s, d)
        events.filter($"event_type" === "error")
          .select($"user_id", $"event_id", $"ts")
          .createOrReplaceTempView("g_asof_err")
        events.filter($"event_type" === "purchase")
          .select($"user_id", $"ts".as("pts"), $"value".as("p_value"))
          .createOrReplaceTempView("g_asof_pur")
        s.sql("""
          SELECT /*+ ASOF('ts', 'pts') */
                 e.event_id, e.user_id,
                 unix_micros(e.ts) AS ts_us,
                 unix_micros(p.pts) AS p_ts_us,
                 p.p_value
          FROM g_asof_err e JOIN g_asof_pur p ON e.user_id = p.user_id
          ORDER BY e.event_id""")
      },
      Some("""
        WITH errors AS (
          SELECT user_id, event_id, ts FROM events WHERE event_type = 'error'),
        purchases AS (
          SELECT user_id, ts AS pts, value AS p_value
          FROM events WHERE event_type = 'purchase')
        SELECT e.event_id, e.user_id,
               epoch_us(e.ts) AS ts_us,
               epoch_us(p.pts) AS p_ts_us,
               p.p_value
        FROM errors e ASOF JOIN purchases p
          ON e.user_id = p.user_id AND e.ts >= p.pts
        ORDER BY e.event_id""")),

    // ── e39: the ASOF hint's FULL parameter surface under the oracle ──
    // gate — LEFT form + tolerance + direction, all from pure spark.sql
    // text. Two hinted subqueries in ONE statement (each hint rewrites
    // its own subtree's join): backward with a 1-day inclusive tolerance,
    // and forward unbounded, recombined on event_id. DuckDB's native
    // ASOF LEFT (>= / <=) is the oracle; its missing tolerance knob is
    // expressed as post-nullification — exactly the inclusive |Δt| ≤ tol
    // contract AsOfJoinExec implements — so the LEFT rewrite path, the
    // tolerance plumbing, and the forward merge are all value-checked
    // cross-engine (e38 covers only the inner backward form).
    GQuery("e39_asof_hint_left",
      (s, d) => {
        import s.implicits._
        val events = ev(s, d)
        events.filter($"event_type" === "error")
          .select($"user_id", $"event_id", $"ts")
          .createOrReplaceTempView("g_asof_err")
        events.filter($"event_type" === "purchase")
          .select($"user_id", $"ts".as("pts"), $"value".as("p_value"))
          .createOrReplaceTempView("g_asof_pur")
        s.sql("""
          SELECT b.event_id, b.user_id, b.ts_us, b.b_ts_us, b.b_value, f.f_ts_us
          FROM (
            SELECT /*+ ASOF('ts', 'pts', 'backward', 86400000000) */
                   e.event_id, e.user_id, unix_micros(e.ts) AS ts_us,
                   unix_micros(p.pts) AS b_ts_us, p.p_value AS b_value
            FROM g_asof_err e LEFT JOIN g_asof_pur p ON e.user_id = p.user_id) b
          JOIN (
            SELECT /*+ ASOF('ts', 'pts', 'forward') */
                   e.event_id, unix_micros(p.pts) AS f_ts_us
            FROM g_asof_err e LEFT JOIN g_asof_pur p ON e.user_id = p.user_id) f
          ON b.event_id = f.event_id
          ORDER BY b.event_id""")
      },
      Some("""
        WITH errors AS (
          SELECT user_id, event_id, ts FROM events WHERE event_type = 'error'),
        purchases AS (
          SELECT user_id, ts AS pts, value AS p_value
          FROM events WHERE event_type = 'purchase'),
        b AS (
          SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
                 CASE WHEN epoch_us(e.ts) - epoch_us(p.pts) <= 86400000000
                      THEN epoch_us(p.pts) END AS b_ts_us,
                 CASE WHEN epoch_us(e.ts) - epoch_us(p.pts) <= 86400000000
                      THEN p.p_value END AS b_value
          FROM errors e ASOF LEFT JOIN purchases p
            ON e.user_id = p.user_id AND e.ts >= p.pts),
        f AS (
          SELECT e.event_id, epoch_us(p.pts) AS f_ts_us
          FROM errors e ASOF LEFT JOIN purchases p
            ON e.user_id = p.user_id AND e.ts <= p.pts)
        SELECT b.event_id, b.user_id, b.ts_us, b.b_ts_us, b.b_value, f.f_ts_us
        FROM b JOIN f ON b.event_id = f.event_id
        ORDER BY b.event_id""")),

    // ── e40: SKEW-AUTO-ROUTED as-of (AsOf.joinAuto) under the oracle ──
    // gate: the plain spelling probes its own key distribution (one
    // column-pruned map-side-combined aggregate → four numbers) and
    // re-plans through joinSliced past the skew threshold — the user
    // never has to know their key is hot. Whichever path the probe
    // picks, the result must equal DuckDB's native ASOF LEFT bit-for-bit
    // (joinSliced's seed machinery and the plain merge are both e31/e35-
    // gated already; this gates the ROUTING layer: probe, threshold,
    // schema-stable rename). AsOfJoinSpec pins the skewed path spreading
    // a planted hot key.
    GQuery("e40_asof_auto",
      (s, d) => {
        import s.implicits._
        val events = ev(s, d)
        val errors = events.filter($"event_type" === "error")
          .select($"user_id", $"event_id", $"ts")
        val purchases = events.filter($"event_type" === "purchase")
          .select($"user_id", $"ts".as("pts"), $"value".as("p_value"))
        graft.plans.AsOf.joinAuto(errors, purchases, "user_id", "ts", "pts")
          .select($"event_id", $"user_id",
            unix_micros($"ts").as("ts_us"),
            unix_micros($"r_pts").as("p_ts_us"),
            $"r_p_value".as("p_value"))
          .orderBy($"event_id")
      },
      Some("""
        WITH errors AS (
          SELECT user_id, event_id, ts FROM events WHERE event_type = 'error'),
        purchases AS (
          SELECT user_id, ts AS pts, value AS p_value
          FROM events WHERE event_type = 'purchase')
        SELECT e.event_id, e.user_id,
               epoch_us(e.ts) AS ts_us,
               epoch_us(p.pts) AS p_ts_us,
               p.p_value
        FROM errors e ASOF LEFT JOIN purchases p
          ON e.user_id = p.user_id AND e.ts >= p.pts
        ORDER BY e.event_id""")),

    // ── e41: the e05 stateful-sessionization machinery under the ──
    // ORACLE gate: EventStreams.sessionize is the flatMapGroupsWithState
    // state machine the streaming form checkpoints per micro-batch;
    // Spark executes the same typed operator in batch (one shuffle on
    // user_id, the state machine folds each user's sorted history once),
    // so the driver's DuckDB gap-chain mirror pins the STATE-MACHINE
    // semantics — not just the window-function twin e02 — closing §2.F's
    // one spec-only row. StreamingSpec separately pins streaming ≡ this.
    GQuery("e41_stateful_sessions",
      (s, d) => {
        import s.implicits._
        EventStreams.sessionize(
            ev(s, d).select($"event_id", $"ts", $"user_id", $"event_type",
              $"value").as[EventStreams.Event])
          .toDF()
          .orderBy($"user_id", $"session_id")
      },
      Some(s"""
        WITH $sessSql
        SELECT user_id, session_id, n_events, start_us, end_us
        FROM sess ORDER BY user_id, session_id"""))
  )
}
