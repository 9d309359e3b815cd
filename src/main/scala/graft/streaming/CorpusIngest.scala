package graft.streaming

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types._

/** Streaming corpus ingest — p08's quality→dedup front half as a
  * continuously running pipeline (SURVEY §2.H): documents arrive in
  * micro-batches, pass the quality gate, are deduplicated on their exact
  * content hash against everything already admitted within the dedup
  * horizon, and land in the exactly-once [[ParquetSink]].
  *
  * The gate is MAP-ONLY (per-row expressions, no aggregation), so the
  * identical column set runs over a batch frame or a stream — the spec
  * pins streaming output ≡ the batch gate + first-arrival dedup. Dedup
  * is `dropDuplicates` on the content hash with a watermark: bounded
  * state (the same contract as [[StreamingDedup.DefaultTtl]]), dup
  * horizon = watermark delay. At 100 TB the admitted-hash state shards
  * by the uniform 128-bit hash — no skew, no driver state.
  */
object CorpusIngest {

  /** Per-document admission columns: token count, t03-style quality
    * score, exact content hash, split bucket. Pure column expressions —
    * valid on batch and streaming frames alike.
    */
  def gate(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val toks = tokens($"text")
    val nTok = size(toks).cast(DoubleType)
    docs
      .withColumn("n_tokens", size(toks).cast(LongType))
      .withColumn("quality",
        round(least($"n_chars".cast(DoubleType) / 500.0, lit(1.0)) * 0.4 +
          (lit(1.0) - size(filter(toks, t => t.isInCollection(Set("the", "a"))))
            .cast(DoubleType) / nTok) * 0.3 +
          (size(array_distinct(toks)).cast(DoubleType) / nTok) * 0.3, 6) + lit(0.0))
      .withColumn("ch", md5($"text"))
      .withColumn("bucket", hash64(concat(lit("split:"), $"doc_id")) % 100)
      .filter($"n_tokens" >= 30 && $"quality" >= 0.5)
  }

  /** Wire a document stream (doc_id, text, n_chars, ts) through the gate,
    * watermarked first-arrival dedup on the content hash, and the
    * idempotent parquet sink. Caller starts the returned writer.
    */
  def ingest(stream: DataFrame, outPath: String,
             horizon: String = "24 hours"): DataStreamWriter[org.apache.spark.sql.Row] = {
    val admitted = dedup(gate(stream), horizon)
      .select("doc_id", "ts", "n_tokens", "quality", "ch", "bucket")
    ParquetSink.sink(admitted, outPath)
  }

  private def dedup(gated: DataFrame, horizon: String): DataFrame =
    gated
      .withWatermark("ts", horizon)
      // dropDuplicatesWithinWatermark, NOT dropDuplicates("ch"): a keyed
      // dedup that omits the event-time column never expires its state —
      // the within-watermark variant is the bounded form.
      .dropDuplicatesWithinWatermark("ch")

  /** Routing key for the per-destination corpus layout: head languages
    * keep their own lane, the tail pools into 'other'; each lane splits
    * into a hi/lo quality tier at the 0.75 cut. Pure column expressions —
    * valid on batch and streaming frames, so the router spec can compare
    * the two directly.
    */
  def route(admitted: DataFrame): DataFrame = {
    import admitted.sparkSession.implicits._
    admitted.withColumn("route",
      concat(
        when($"lang".isin("en", "de", "zh"), $"lang").otherwise(lit("other")),
        lit("_"),
        when($"quality" >= 0.75, "hi").otherwise("lo")))
  }

  /** The routed ingest: gate → bounded dedup → route → parquet sink
    * partitioned by (route, batch_id). Downstream per-language/per-tier
    * training pipelines read their slice with partition pruning — no
    * post-hoc filtering scan over the whole admitted corpus — and replay
    * idempotency is per (route, batch) leaf. Input must carry `lang`.
    */
  def ingestRouted(stream: DataFrame, outPath: String,
                   horizon: String = "24 hours"): DataStreamWriter[org.apache.spark.sql.Row] = {
    val admitted = route(dedup(gate(stream), horizon))
      .select("doc_id", "ts", "n_tokens", "quality", "ch", "bucket", "route")
    ParquetSink.sink(admitted, outPath, routeCols = Seq("route"))
  }
}
