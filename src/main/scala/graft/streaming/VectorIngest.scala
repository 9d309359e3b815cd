package graft.streaming

import graft.operators.VectorIndexStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming vector ingest — newly embedded vectors routed into the
  * materialized IVF index as they arrive (SURVEY §2.H).
  *
  * Assignment against FROZEN centroids is stateless per vector (a pure
  * function of the vector and the k×d centroid table), so the stream
  * form is foreachBatch over the SAME
  * [[VectorIndexStore.appendAssignments]] the batch append uses: each
  * micro-batch lands in exactly the cell directories its vectors route
  * to, and the next [[VectorIndexStore.probe]] sees them — a
  * continuously warm ANN index between offline centroid retrains.
  *
  * Durability note: appendAssignments is a plain parquet append, so a
  * replayed micro-batch would double its vectors — callers that need
  * exactly-once route the stream through a dedup (vec_id is a natural
  * key; [[CorpusIngest]]'s watermarked dropDuplicates pattern) or
  * compact on vec_id at read time. The spec exercises the
  * single-delivery path.
  */
object VectorIngest {

  /** Attach the index-append sink to an embedding stream
    * (vec_id, embedding[, ...]). Caller starts the returned writer.
    */
  def ingestWriter(stream: DataFrame,
                   corpusDir: String): DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      val s = batch.sparkSession
      if (!batch.isEmpty)
        VectorIndexStore.appendAssignments(s, corpusDir,
          batch.select("vec_id", "embedding"))
    }
}
