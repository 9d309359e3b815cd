package graft.streaming

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental near-duplicate detection (SURVEY §2.D, streaming form).
  *
  * The batch pipeline (operators.Dedup d02) recomputes band buckets per
  * run; on an unbounded corpus the scalable form keeps per-bucket state:
  * each arriving document's minhash signature is compared against the
  * signatures already seen in its band buckets, emitting pairs
  * incrementally. State is sharded by band key — the same bound as batch
  * LSH candidate buckets — and bounded in TIME by an event-time TTL:
  * bucket signatures older than the dedup horizon expire when the
  * watermark passes, so total state is O(docs within one horizon), not
  * O(stream length). Replayed doc_ids (an at-least-once source) are
  * skipped — no duplicate state entries, no re-emitted pairs.
  *
  * Signatures are computed per-row (array expressions over the codegen'd
  * shingles) rather than via explode+groupBy, because chaining a streaming
  * aggregation into flatMapGroupsWithState is not allowed in append mode —
  * a per-row expression keeps the whole pipeline single-stateful.
  */
object StreamingDedup {

  val NumPerms: Int = MinHashParams.NumPerms
  val NumBands: Int = MinHashParams.NumBands
  val RowsPerBand: Int = MinHashParams.RowsPerBand

  case class BandedDoc(doc_id: Long, ts: java.sql.Timestamp, band: Int,
                       bkey: String, sig: Seq[Long])
  case class DupPair(i: Long, j: Long, est_jaccard: Double)
  // State class must be PUBLIC: `private case class` emits package-private
  // JVM access flags, and the state encoder's Janino-generated code (in a
  // synthetic package) then can't resolve its accessors. Kept flat
  // (parallel Seqs, sigs strided by NumPerms) for a compact state row.
  case class BucketState(ids: Seq[Long], flatSigs: Seq[Long])

  /** doc_id+text(+ts) frame → one row per (doc, band) with the full
    * signature. When the input has no event-time column a constant epoch
    * stands in (batch parity tests); real streams pass their ingest time
    * so the TTL in [[incrementalPairs]] can expire state.
    *
    * The hashed-shingle array is projected ONCE before the 16 permutation
    * mins reference it — lambda subtrees are excluded from Spark's
    * common-subexpression elimination, so inlining `hs` into each term
    * would re-run tokenize+shingle+md5 16× per row. Docs with fewer than
    * 3 tokens have no shingles and are dropped (array_min of an empty
    * array is null, which would kill the query at Dataset deserialization;
    * the batch pipeline drops them implicitly via explode).
    */
  def bandedSignatures(docs: DataFrame): Dataset[BandedDoc] = {
    import docs.sparkSession.implicits._
    val ts: Column =
      if (docs.columns.contains("ts")) col("ts")
      else lit(new java.sql.Timestamp(0L))
    val sig = array((0 until NumPerms).map(p =>
      array_min(transform(col("hs"), h => permHash(h, p)))): _*)
    val bands = array((0 until NumBands).map { b =>
      struct(lit(b).as("band"),
        concat_ws("_", (0 until RowsPerBand).map(r => element_at(col("sig"), b * RowsPerBand + r + 1)): _*).as("bkey"))
    }: _*)
    docs.select(col("doc_id"), ts.as("ts"),
        transform(shingles(tokens(col("text")), 3), x => hash64(x)).as("hs"))
      .where(size(col("hs")) > 0)
      .select(col("doc_id"), col("ts"), sig.as("sig"))
      .select(col("doc_id"), col("ts"), col("sig"), explode(bands).as("bb"))
      .select(col("doc_id"), col("ts"), col("bb.band").as("band"), col("bb.bkey").as("bkey"), col("sig"))
      .as[BandedDoc]
  }

  /** Default state horizon: bounded state is the DEFAULT. An unbounded
    * stream with unbounded dedup state eventually OOMs every executor;
    * the replay-everything case must opt out explicitly (`ttl = None`).
    */
  val DefaultTtl: java.time.Duration = java.time.Duration.ofHours(24)

  /** Stateful pair emission: compare each arriving doc against its
    * bucket's remembered signatures. Pairs estimated ≥ minEst are emitted
    * once per bucket (downstream dedups across bands).
    *
    * `ttl`: event-time state horizon, DEFAULT [[DefaultTtl]]. When the
    * input carries a watermark, a bucket whose newest signature is `ttl`
    * older than the watermark is dropped wholesale — dup pairs are only
    * detected within the horizon, which is the explicit contract that
    * keeps state bounded on an unbounded stream. `ttl = None` is the
    * explicit opt-out for bounded replays that must pair across all time.
    * An input WITHOUT a watermark has no event-time clock for the horizon
    * (Spark rejects EventTimeTimeout there), so the TTL degrades to
    * NoTimeout — acceptable only because a watermark-less input is itself
    * a bounded-replay choice.
    */
  def incrementalPairs(banded: Dataset[BandedDoc], minEst: Double = 0.5,
                       ttl: Option[java.time.Duration] = Some(DefaultTtl)): Dataset[DupPair] = {
    import banded.sparkSession.implicits._
    val hasWatermark = banded.queryExecution.analyzed.collectFirst {
      case _: org.apache.spark.sql.catalyst.plans.logical.EventTimeWatermark => ()
    }.isDefined
    val ttlMs = if (hasWatermark) ttl.map(_.toMillis) else None

    def fn(key: (Int, String), rows: Iterator[BandedDoc],
           state: GroupState[BucketState]): Iterator[DupPair] = {
      if (state.hasTimedOut) {
        // Horizon passed with no new arrivals: every remembered signature
        // is too old to pair with anything in-watermark — drop the bucket.
        state.remove()
        return Iterator.empty
      }
      val st = state.getOption.getOrElse(BucketState(Seq.empty, Seq.empty))
      var ids = st.ids.toVector
      var sigs = st.flatSigs.toVector
      val out = scala.collection.mutable.ArrayBuffer.empty[DupPair]
      var maxTsMs = Long.MinValue
      rows.toSeq.sortBy(_.doc_id).foreach { d =>
        if (d.ts != null) maxTsMs = math.max(maxTsMs, d.ts.getTime)
        // At-least-once sources replay doc_ids: a doc already in the
        // bucket re-emits nothing and must not duplicate state.
        if (!ids.contains(d.doc_id)) {
          var k = 0
          while (k < ids.length) {
            var matches = 0
            var p = 0
            while (p < NumPerms) {
              if (sigs(k * NumPerms + p) == d.sig(p)) matches += 1
              p += 1
            }
            val est = matches.toDouble / NumPerms
            if (est >= minEst)
              out += DupPair(math.min(ids(k), d.doc_id), math.max(ids(k), d.doc_id), est)
            k += 1
          }
          ids = ids :+ d.doc_id
          sigs = sigs ++ d.sig
        }
      }
      state.update(BucketState(ids, sigs))
      ttlMs.foreach { t =>
        // Expire `ttl` after the newest activity, clamped above the
        // current watermark (setTimeoutTimestamp rejects the past).
        val base = math.max(maxTsMs, state.getCurrentWatermarkMs())
        state.setTimeoutTimestamp(base + t)
      }
      out.iterator
    }

    val timeout =
      if (ttlMs.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    banded
      .groupByKey(d => (d.band, d.bkey))
      .flatMapGroupsWithState(OutputMode.Append, timeout)(fn)
  }
}
