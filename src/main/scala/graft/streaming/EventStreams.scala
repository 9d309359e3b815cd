package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming jobs (SURVEY.md §2.F e05).
  *
  * The batch operators in [[graft.operators.EventOps]] have streaming twins
  * here: the tumbling-window aggregation gains a watermark (bounding state
  * at any scale — late events beyond 1 hour are dropped instead of kept
  * forever), and sessionization becomes per-key incremental state via
  * flatMapGroupsWithState instead of a global sort-window, which is the
  * form that survives an unbounded stream.
  */
// Serializable: the flatMapGroupsWithState closures call the shared
// `advance` state machine, which lifts to a module-capturing lambda.
object EventStreams extends Serializable {

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double)
  case class SessionSummary(user_id: Long, session_id: Long, n_events: Long,
                            start_us: Long, end_us: Long)
  // State class must be PUBLIC (see StreamingDedup.BucketState note).
  case class SessState(sessionId: Long, nEvents: Long, startUs: Long, lastUs: Long)

  private val GapUs = 30L * 60 * 1000000
  private val GapMs = 30L * 60 * 1000

  private def micros(t: java.sql.Timestamp): Long =
    (t.getTime / 1000) * 1000000 + t.getNanos / 1000

  /** Watermarked tumbling-window counts over a (possibly streaming) event
    * frame: identical logical plan batch vs stream.
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("value_sum"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"), col("value_sum"))

  /** Watermarked windowed per-type VALUE-quantile summaries — the
    * streaming production form of q54's one-pass sketch (p50/p99 of a
    * metric per hour, THE streaming-observability staple): each
    * (window, event_type) group folds its values into a mergeable
    * `quantile_sketch` whose buffer the streaming aggregation
    * checkpoints between micro-batches — O(k·log n) bytes per open
    * window, never the window's values. Windows emit on close (append
    * mode + watermark). Consumers bracket-and-refine exactly like q54,
    * or read approximate quantiles off the summary with the
    * self-tracked ±err rank guarantee — which is what the parity spec
    * checks against batch-exact ranks, the contract that holds under
    * ANY micro-batch arrival/merge order (sketch CONTENTS don't).
    */
  def windowedQuantiles(events: DataFrame, k: Int = 256): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(graft.functions.QuantileSketchAgg.quantileSketch(col("value"), k).as("sk"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("sk.n").as("n"), col("sk.err").as("err"), col("sk.items").as("items"))

  /** Watermarked SLIDING-window counts (2 h length, 1 h slide): every
    * event lands in exactly 2 overlapping epoch-aligned windows. One
    * plan serves batch (watermark is a no-op) and stream (state expires
    * a window once the watermark passes its end) — e09's batch oracle
    * and the streaming parity spec both consume this function, so the
    * two forms cannot drift.
    */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))

  /** Advance the session state machine over one key's sorted events,
    * appending every CLOSED session (gap exceeded) and returning the still-
    * open state — shared by the batch and streaming forms so they cannot
    * drift.
    */
  private def advance(userId: Long, st0: SessState, evs: Seq[Event],
                      out: scala.collection.mutable.ArrayBuffer[SessionSummary]): SessState = {
    var st = st0
    evs.foreach { e =>
      val us = micros(e.ts)
      if (st == null) st = SessState(1L, 1L, us, us)
      else if (us - st.lastUs > GapUs) {
        out += SessionSummary(userId, st.sessionId, st.nEvents, st.startUs, st.lastUs)
        st = SessState(st.sessionId + 1, 1L, us, us)
      } else st = st.copy(nEvents = st.nEvents + 1, lastUs = us)
    }
    st
  }

  /** Gap-based sessionization (30 min) as incremental per-user state, BATCH
    * form: the state machine runs once per user over the complete history,
    * so end-of-data is end-of-stream and the final open session flushes.
    * For an unbounded stream use [[sessionizeStream]] — flushing at the end
    * of every invocation would split sessions at micro-batch boundaries.
    */
  def sessionize(events: Dataset[Event]): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._

    def fn(userId: Long, evs: Iterator[Event], state: GroupState[SessState]): Iterator[SessionSummary] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[SessionSummary]
      val st = advance(userId, null, evs.toSeq.sortBy(e => (micros(e.ts), e.event_id)), out)
      if (st != null) out += SessionSummary(userId, st.sessionId, st.nEvents, st.startUs, st.lastUs)
      out.iterator
    }

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }

  /** Gap-based sessionization, STREAMING form: open sessions persist in
    * per-user state across micro-batches and close only when (a) a later
    * event exceeds the 30-min gap, or (b) the event-time watermark passes
    * the session's gap deadline (EventTimeTimeout) — no event can extend
    * the session anymore, so it is final. State is therefore bounded by
    * the number of users active within one watermark horizon, not by
    * stream length. Input must carry `withWatermark("ts", ...)`.
    *
    * Within-batch ordering: events sort by event time per user; cross-batch
    * ordering is the source's responsibility (same contract as any
    * event-time stateful operator — late events beyond the watermark are
    * dropped by the watermark itself).
    */
  def sessionizeStream(events: Dataset[Event]): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._

    def fn(userId: Long, evs: Iterator[Event], state: GroupState[SessState]): Iterator[SessionSummary] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[SessionSummary]
      if (state.hasTimedOut) {
        // Watermark passed lastUs + gap: the open session can never gain
        // another event — emit it and clear.
        val st = state.get
        out += SessionSummary(userId, st.sessionId, st.nEvents, st.startUs, st.lastUs)
        state.remove()
      } else {
        val st = advance(userId, state.getOption.orNull,
          evs.toSeq.sortBy(e => (micros(e.ts), e.event_id)), out)
        if (st != null) {
          state.update(st)
          // Event-time deadline: fires once the watermark passes the gap
          // horizon of the last event seen for this user.
          state.setTimeoutTimestamp(st.lastUs / 1000 + GapMs)
        }
      }
      out.iterator
    }

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Watermarked stream-stream INNER join: each purchase matched to the
    * same user's signups in the preceding hour. Both inputs carry
    * watermarks and the join condition bounds the event-time distance
    * between the sides, which is what lets Spark expire buffered join
    * state — without the time bound the buffers grow with stream length.
    * The same plan runs in batch (watermarks are no-ops there), so the
    * spec pins streaming ≡ batch across multi-batch arrival.
    */
  def purchasesWithinHourOfSignup(signups: DataFrame, purchases: DataFrame): DataFrame = {
    val su = signups
      .select(col("user_id").as("su_user"), col("ts").as("su_ts"))
      .withWatermark("su_ts", "1 hour")
    val pu = purchases
      .select(col("user_id").as("pu_user"), col("event_id"), col("ts").as("pu_ts"),
        col("value"))
      .withWatermark("pu_ts", "1 hour")
    pu.join(su, expr(
        "pu_user = su_user AND pu_ts >= su_ts AND pu_ts <= su_ts + INTERVAL 1 HOUR"))
      .select(col("pu_user").as("user_id"), col("event_id"),
        col("su_ts"), col("pu_ts"), col("value"))
  }

  /** Stream-static enrichment: each event joins a STATIC dimension (here a
    * per-type weight table) — the most common streaming join in practice
    * (events × reference data). The static side broadcasts into every
    * micro-batch; no join state accumulates, no watermark is required on
    * the dim, and the dim can be swapped between batches (a registry sync)
    * without touching the stream. Output: watermarked windowed weighted
    * counts, same plan batch or streaming.
    */
  def weightedWindowCounts(events: DataFrame, weights: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .join(broadcast(weights), Seq("event_type"))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("weight")).as("weighted_n"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("weighted_n"))
}
