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
  * Durability: REPLAY-IDEMPOTENT by construction — the micro-batch id
  * flows into [[VectorIndexStore.appendAssignments]], which lands each
  * batch in its own (cell, batch_id) leaves under dynamic partition
  * overwrite (ParquetSink.writeBatch's recipe), so a recovered/replayed
  * batch replaces its previous attempt instead of double-inserting.
  * Spec-pinned: a re-delivered batch leaves the index byte-identical.
  */
object VectorIngest {

  /** Attach the index-append sink to an embedding stream
    * (vec_id, embedding[, ...]). Caller starts the returned writer.
    */
  def ingestWriter(stream: DataFrame,
                   corpusDir: String): DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val s = batch.sparkSession
      if (!batch.isEmpty)
        VectorIndexStore.appendAssignments(s, corpusDir,
          batch.select("vec_id", "embedding"), batchId)
    }
}
