package graft.streaming

import graft.Tables
import graft.functions.TextFunctions._
import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming benchmark decontamination — d21's Bloom probe running
  * continuously over an arriving document stream (SURVEY §2.H).
  *
  * The eval-side Bloom bitset is STATIC state: a bounded distinct-
  * position frame (≤ [[Dedup.BloomBits]] rows — 8 KB as real bits)
  * computed once from the eval corpus and broadcast into every
  * micro-batch. The per-document probe is stateless across batches —
  * each doc's verdict depends only on its own grams and the bitset — so
  * the stream form is foreachBatch over the SAME
  * [[Dedup.bloomProbeFrame]] the batch operator uses: one code path,
  * stream ≡ batch by construction (StreamingSpec pins it), replay-
  * idempotent through [[ParquetSink.writeBatch]]'s per-batch partition
  * overwrite.
  *
  * At 100 TB: the bitset never grows with the eval corpus (that is the
  * point of d21 over d10), micro-batch work is proportional to arriving
  * documents only, and the flagged stream lands partitioned by batch —
  * a nightly compaction can fold it into the corpus layout.
  */
object StreamingDecontaminate {

  /** The static bitset: Bloom positions of the corpus' eval split
    * (d21's split rule — hash-bucket ≥ 90). Tiny; cache per session.
    */
  def evalPositions(s: SparkSession, corpusDir: String): DataFrame = {
    import s.implicits._
    val evalDocs = Tables.load(s, corpusDir, "documents")
      .select($"doc_id", $"text",
        (hash64(concat(lit("split:"), $"doc_id")) % 100).as("bucket"))
      .filter($"bucket" >= 90)
    Dedup.bloomPositionFrame(
      Dedup.gram13Frame(evalDocs).select($"h").distinct())
  }

  /** Per-batch probe: exactly the batch operator's flag frame. The gram
    * frame feeds two consumers inside bloomProbeFrame — checkpoint so
    * each micro-batch tokenizes/hashes once.
    */
  def probeBatch(batch: DataFrame, positions: DataFrame): DataFrame =
    Dedup.bloomProbeFrame(Dedup.gram13Frame(batch).localCheckpoint(), positions)

  /** Attach the probe to a document stream (doc_id, text, ...): every
    * micro-batch is flagged against the static bitset and written
    * idempotently. Caller starts the returned writer.
    */
  def probeWriter(stream: DataFrame, positions: DataFrame,
                  outPath: String): DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      ParquetSink.writeBatch(probeBatch(batch, positions), id, outPath)
    }
}
