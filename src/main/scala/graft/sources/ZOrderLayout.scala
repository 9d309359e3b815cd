package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Z-order (Morton-curve) data layout — multi-column data skipping for
  * the 100 TB scan path (SURVEY §2.H, §5).
  *
  * A single-column sort gives parquet min/max pruning on ONE predicate
  * column; every other selective predicate still reads the whole table.
  * Interleaving the bits of several bucketized columns into one z-value
  * and range-partitioning + sorting the write on it makes every file a
  * small axis-aligned box in the combined key space, so min/max file
  * stats prune on EVERY participating column at once — the layout trick
  * behind Delta/Iceberg `OPTIMIZE ZORDER BY` and ClickHouse's Morton
  * keys, built here from plain Spark expressions:
  *
  *   - [[bucketize]]: `width_bucket` (O(1), codegen'd) maps a numeric
  *     column onto 2^bits equal-width buckets between its observed
  *     min/max (one tiny driver-side agg per write, the same k-bounded
  *     metadata discipline as VectorIndexStore's probe);
  *   - [[zValue]]: pure bitwise shift/AND/OR column expressions
  *     interleave the bucket bits — no UDF, stays in WholeStageCodegen;
  *   - [[write]]: `repartitionByRange` on the z-value (range boundaries
  *     from Spark's reservoir sampling, so files are balanced even when
  *     the z-distribution is skewed) + `sortWithinPartitions` gives
  *     files that own contiguous z-ranges ≈ aligned Morton boxes.
  *
  * The written files keep the helper `_zv` column: readers ignore it,
  * compaction can resume from it, and incremental appends can reuse the
  * recorded bucket bounds (stored alongside as `_zorder_bounds.json`-free
  * metadata — bounds are re-derivable from the data; a drifted append
  * simply lands in the outer buckets until the next rewrite, the same
  * freshness contract as CorpusLayout).
  *
  * Equal-width bucketing is deliberate: it needs only min/max, evaluates
  * in O(1) per row, and file balance does NOT depend on it (the range
  * partitioner equalizes file sizes whatever the bucket histogram);
  * skew only costs bucket RESOLUTION at the dense end. Where a column is
  * so heavy-tailed that most values share one bucket, pre-transform it
  * (log, rank) at the call site.
  *
  * ZOrderSpec pins: (1) row parity with the unordered table, (2) a
  * two-sided box predicate touches strictly fewer files than the
  * single-column-sorted layout, (3) a predicate on the SECOND column
  * alone — where a single-column sort prunes nothing — skips a
  * meaningful fraction of z-ordered files.
  */
object ZOrderLayout {

  /** Map `c` onto integer buckets 0..2^bits-1 between lo/hi (clamped). */
  def bucketize(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val nb = 1 << bits
    // width_bucket: 1..nb inside, 0 below, nb+1 above → clamp to 0..nb-1
    least(greatest(
      width_bucket(c.cast(DoubleType), lit(lo), lit(hi), lit(nb)) - lit(1),
      lit(0)), lit(nb - 1)).cast(LongType)
  }

  /** Morton interleave of bucket columns (each already in 0..2^bits-1):
    * bit i of column j lands at position i*n + j. Pure bitwise column
    * ops — codegen'd, no UDF. Total value fits a long for
    * bits * cols <= 63.
    */
  def zValue(buckets: Seq[Column], bits: Int): Column = {
    val n = buckets.size
    require(n >= 1 && bits * n <= 63, s"zValue: $n cols x $bits bits overflow a long")
    val terms = for {
      i <- 0 until bits
      (b, j) <- buckets.zipWithIndex
    } yield shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Observed [min, max] per column, one tiny driver-side agg. Empty
    * input or an all-null column has no bounds — fail with a clear
    * message instead of the NPE a null aggregate cell would throw.
    */
  def columnBounds(df: DataFrame, cols: Seq[String]): Seq[(Double, Double)] = {
    val aggs = cols.flatMap(c => Seq(
      min(col(c).cast(DoubleType)).as(s"lo_$c"),
      max(col(c).cast(DoubleType)).as(s"hi_$c")))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    cols.zipWithIndex.map { case (c, i) =>
      require(!r.isNullAt(2 * i) && !r.isNullAt(2 * i + 1),
        s"zValue column '$c' has no bounds (empty input or all-null column)")
      (r.getDouble(2 * i), r.getDouble(2 * i + 1))
    }
  }

  /** Rewrite `df` z-ordered on `cols` into `outDir` as `numFiles`
    * balanced, z-contiguous parquet files (plus the `_zv` column).
    */
  def write(df: DataFrame, cols: Seq[String], outDir: String,
            bits: Int = 8, numFiles: Int = 32): Unit = {
    val bounds = columnBounds(df, cols)
    val buckets = cols.zip(bounds).map { case (c, (lo, hi)) =>
      // degenerate constant column: single bucket
      if (lo == hi) lit(0L) else bucketize(col(c), lo, hi, bits)
    }
    df.withColumn("_zv", zValue(buckets, bits))
      .repartitionByRange(numFiles, col("_zv"))
      .sortWithinPartitions("_zv")
      .write.mode("overwrite").parquet(outDir)
  }
}
