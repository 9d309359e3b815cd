package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of enrichment — the streaming twin of the batch
  * [[graft.plans.AsOf]] operator (e31/e32): every event picks up the
  * LATEST dimension version with the same key and version-time ≤ the
  * event's time, across micro-batches, with out-of-order arrival on both
  * sides (the Flink "temporal join" staple).
  *
  * Shape: events and dim versions UNION into one keyed stream under a
  * single event-time watermark, and `flatMapGroupsWithState` holds per
  * key exactly:
  *
  *  - the latest version at-or-below the watermark (ONE row — any older
  *    version can never win an as-of race again, any event that could
  *    have matched it is either emitted or would be late-dropped), plus
  *    the not-yet-final versions above the watermark;
  *  - the events still above the watermark (not yet final: an earlier
  *    version could still arrive for them within the watermark horizon).
  *
  * An event is EMITTED once the watermark passes its timestamp: at that
  * point no version with vts ≤ event.ts can still arrive (it would be
  * late-dropped by the same watermark), so the match is final — the
  * emitted row equals what batch AsOf.join computes on the complete
  * inputs, which is what StreamingSpec pins across multi-batch arrival
  * with late (in-watermark) data on both sides. State is bounded by the
  * per-key traffic inside ONE watermark horizon + one version row —
  * never by stream length; an EventTimeTimeout flushes pending events
  * when a key goes quiet.
  */
object StreamingAsOf extends Serializable {

  /** Unioned input: `isDim` rows carry (ts = version time, payload);
    * event rows carry (ts = event time, event_id).
    */
  case class AsOfRow(key: Long, ts: java.sql.Timestamp, isDim: Boolean,
                     event_id: Long, payload: Double)

  /** Per-key state: versions ascending by (vts, payload); pending events
    * unordered (sorted at emit). Both watermark-bounded (see above).
    */
  case class AsOfState(versions: List[(Long, Double)], pending: List[(Long, Long)])

  case class EnrichedEvent(user_id: Long, event_id: Long, ts_us: Long,
                           v_ts_us: Option[Long], v_payload: Option[Double])

  private def micros(t: java.sql.Timestamp): Long =
    (t.getTime / 1000) * 1000000 + t.getNanos / 1000

  /** Build the unioned keyed stream from an event frame (user_id,
    * event_id, ts) and a version frame (user_id, vts, payload).
    */
  def unionInputs(events: DataFrame, versions: DataFrame): DataFrame =
    events.select(col("user_id").as("key"), col("ts"), lit(false).as("isDim"),
        col("event_id"), lit(0.0).as("payload"))
      .unionByName(versions.select(col("user_id").as("key"),
        col("vts").as("ts"), lit(true).as("isDim"),
        lit(-1L).as("event_id"), col("payload")))

  /** The stateful core. Input must already carry `withWatermark("ts", …)`;
    * [[enrich]] applies the default 1 h horizon.
    */
  def enrichPrepared(input: Dataset[AsOfRow]): Dataset[EnrichedEvent] = {
    import input.sparkSession.implicits._

    def fn(key: Long, rows: Iterator[AsOfRow],
           state: GroupState[AsOfState]): Iterator[EnrichedEvent] = {
      // getCurrentWatermarkMs is 0 on the first batch; that simply holds
      // everything (nothing is final yet), which is correct.
      val wmUs = state.getCurrentWatermarkMs() * 1000
      val st = state.getOption.getOrElse(AsOfState(Nil, Nil))
      val rs = rows.toSeq // empty on a pure timeout invocation
      val versions = (st.versions ++ rs.filter(_.isDim)
        .map(r => (micros(r.ts), r.payload))).sorted
      val pending = st.pending ++ rs.filter(!_.isDim)
        .map(r => (micros(r.ts), r.event_id))
      val (ripe, hold) = pending.partition(_._1 <= wmUs)
      val out = ripe.sorted.map { case (tsUs, eid) =>
        val m = versions.takeWhile(_._1 <= tsUs).lastOption
        EnrichedEvent(key, eid, tsUs, m.map(_._1), m.map(_._2))
      }
      // ONE version row survives below the watermark: the latest — it is
      // still the reigning match for future events until a newer version
      // passes it. Everything older is unreachable forever.
      val keep = versions.filter(_._1 <= wmUs).lastOption.toList ++
        versions.filter(_._1 > wmUs)
      if (keep.isEmpty && hold.isEmpty) state.remove()
      else {
        state.update(AsOfState(keep, hold))
        if (hold.nonEmpty) {
          // flush deadline for the quiet-key case: fire once the watermark
          // passes the oldest pending event (+1 ms: must exceed the wm)
          state.setTimeoutTimestamp(hold.map(_._1).min / 1000 + 1)
        }
      }
      out.iterator
    }

    input
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** STREAM-STATIC as-of enrichment — the common production shape: the
    * versioned dimension is a TABLE (static within a run, swappable
    * between micro-batches, like [[EventStreams.weightedWindowCounts]]'s
    * broadcast dim). No cross-batch state is needed at all: an event's
    * match depends only on the event and the dim, so each micro-batch
    * runs the SAME custom AsOfJoinExec the batch operator plans
    * (foreachBatch hands a plain batch frame) and lands idempotently via
    * [[ParquetSink.writeBatch]]. One code path with e31's operator —
    * stream ≡ batch by construction, replay-safe, arrival-order-free
    * (unlike the stream-stream [[enrich]], which must watermark-gate
    * finality because versions can still arrive).
    */
  def enrichStaticWriter(stream: DataFrame, versions: DataFrame,
                         key: String, leftTime: String, rightTime: String,
                         outPath: String, direction: String = "backward",
                         tolerance: Option[Long] = None)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val outCols = (stream.columns ++ versions.columns.map("r_" + _)).toIndexedSeq
    stream.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      if (!batch.isEmpty)
        ParquetSink.writeBatch(
          graft.plans.AsOf.join(batch, versions, key, leftTime, rightTime,
              direction, tolerance)
            .toDF(outCols: _*),
          id, outPath)
    }
  }

  /** Streaming as-of enrichment with a 1 h watermark horizon: rows later
    * than that are dropped (the same finality contract every event-time
    * operator has). The identical call works in batch for the parity pin
    * (watermarks are no-ops there — but batch emission then needs the
    * end-of-data flush, so the spec compares against [[graft.plans.AsOf]]
    * directly instead).
    */
  def enrich(events: DataFrame, versions: DataFrame): Dataset[EnrichedEvent] = {
    import events.sparkSession.implicits._
    enrichPrepared(unionInputs(events, versions)
      .withWatermark("ts", "1 hour").as[AsOfRow])
  }
}
