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
object EventStreams {

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double)
  case class SessionSummary(user_id: Long, session_id: Long, n_events: Long,
                            start_us: Long, end_us: Long)
  private case class SessState(sessionId: Long, nEvents: Long, startUs: Long, lastUs: Long)

  /** Watermarked tumbling-window counts over a (possibly streaming) event
    * frame: identical logical plan batch vs stream.
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("value_sum"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"), col("value_sum"))

  /** Gap-based sessionization (30 min) as incremental per-user state.
    * Works identically on batch Datasets (state machine runs per group) and
    * streams (with timeouts). Events must arrive in event-time order per
    * user for batch parity, so the caller sorts within partitions.
    */
  def sessionize(events: Dataset[Event]): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    val gapUs = 30L * 60 * 1000000

    def fn(userId: Long, evs: Iterator[Event], state: GroupState[SessState]): Iterator[SessionSummary] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[SessionSummary]
      var st = state.getOption.orNull
      def micros(t: java.sql.Timestamp): Long =
        (t.getTime / 1000) * 1000000 + t.getNanos / 1000
      evs.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
        val us = micros(e.ts)
        if (st == null) st = SessState(1L, 1L, us, us)
        else if (us - st.lastUs > gapUs) {
          out += SessionSummary(userId, st.sessionId, st.nEvents, st.startUs, st.lastUs)
          st = SessState(st.sessionId + 1, 1L, us, us)
        } else st = st.copy(nEvents = st.nEvents + 1, lastUs = us)
      }
      if (st != null) {
        out += SessionSummary(userId, st.sessionId, st.nEvents, st.startUs, st.lastUs)
        state.remove()
      }
      out.iterator
    }

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }
}
