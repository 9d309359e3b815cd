package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming top-k snapshot sink: maintain a k-row parquet table of the
  * most frequent values of a key column seen so far (live "trending
  * terms" / hottest-document dashboards over an ingest stream).
  *
  * The aggregation runs in COMPLETE mode — state is the (key → count)
  * map, bounded by key cardinality, and every micro-batch emits the full
  * aggregate — so the foreachBatch snapshot is a pure function of stream
  * history: a replayed batch rewrites byte-identical rows (idempotent
  * without partition bookkeeping, unlike the append-mode
  * [[ParquetSink]]). The snapshot overwrite is k rows, never the
  * aggregate itself.
  *
  * Scale contract: complete-mode state is O(|distinct keys|) — fine for
  * word/domain/label keys (≤10^8); an unbounded key domain needs a
  * count-min-sketch variant instead, same sink shape.
  */
object TopKSink {

  def sink(stream: DataFrame, keyCol: String, k: Int,
           path: String): DataStreamWriter[org.apache.spark.sql.Row] =
    stream.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
      .writeStream.outputMode("complete")
      .foreachBatch { (df: DataFrame, _: Long) =>
        df.orderBy(col("n").desc, col(keyCol).asc).limit(k)
          .coalesce(1).write.mode("overwrite").parquet(path)
      }
}
