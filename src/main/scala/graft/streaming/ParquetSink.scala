package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Exactly-once parquet sink for Structured Streaming via foreachBatch.
  *
  * foreachBatch's contract is at-least-once: after a crash between "batch
  * written" and "offsets committed", the SAME batch id is replayed. A
  * plain append sink duplicates that batch's rows. This sink makes the
  * replay idempotent by giving every micro-batch its own `batch_id=N`
  * partition and overwriting ONLY that partition (dynamic partition
  * overwrite): re-running a batch replaces its previous attempt
  * byte-for-byte instead of appending beside it.
  *
  * Scale notes: the target table stays one parquet dataset partitioned by
  * batch_id — readers see `path` as a single table, partition pruning
  * works, and no global state (no compare-and-swap, no manifest) is
  * needed because the batch id IS the idempotency key. Writer parallelism
  * is the upstream partitioning; nothing funnels through the driver.
  */
object ParquetSink {

  /** Write one micro-batch idempotently (safe to call again with the same
    * batchId after a retry — the partition is replaced, never doubled).
    *
    * `routeCols`: optional partition columns layered ABOVE batch_id
    * (e.g. a lang/quality route) — readers prune on them, and replay
    * idempotency is untouched because batch_id stays in the partitioning
    * (a replayed batch rewrites exactly its own (route, batch_id)
    * leaves).
    */
  def writeBatch(df: DataFrame, batchId: Long, path: String,
                 routeCols: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    // Dynamic mode scopes mode("overwrite") to the partitions present in
    // THIS write (just batch_id=batchId), not the whole table.
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    df.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite").partitionBy(routeCols :+ "batch_id": _*).parquet(path)
  }

  /** Attach the idempotent sink to a stream (caller starts/stops). */
  def sink(stream: DataFrame, path: String,
           routeCols: Seq[String] = Nil): DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch(
      (df: DataFrame, id: Long) => writeBatch(df, id, path, routeCols))
}
