package graft

import graft.sources.ZOrderLayout
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout laws: row parity, and multi-column file skipping that a
  * single-column sort cannot deliver. File pruning is measured from
  * per-file min/max of the predicate columns — exactly the stats a
  * parquet reader's row-group/file skipping consults — so the assertion
  * is deterministic and reader-independent.
  */
class ZOrderSpec extends AnyFunSuite with SparkTestBase {

  /** (files whose [min,max] box intersects the predicate box, total files). */
  private def touched(df: DataFrame, c1: String, r1: (Double, Double),
                      c2: String, r2: Option[(Double, Double)]): (Long, Long) = {
    val stats = df.groupBy(input_file_name().as("f"))
      .agg(min(col(c1).cast("double")).as("lo1"), max(col(c1).cast("double")).as("hi1"),
        min(col(c2).cast("double")).as("lo2"), max(col(c2).cast("double")).as("hi2"))
    val total = stats.count()
    var cond = col("hi1") >= r1._1 && col("lo1") <= r1._2
    r2.foreach(r => cond = cond && col("hi2") >= r._1 && col("lo2") <= r._2)
    (stats.filter(cond).count(), total)
  }

  test("z-order layout: parity, two-sided box pruning beats single-column sort, second-column pruning") {
    import spark.implicits._
    val li = Tables.load(spark, sf, "lineitem")
      .select($"l_orderkey", $"l_partkey", $"l_extendedprice", $"l_quantity")
    val base = java.nio.file.Files.createTempDirectory("graft_zorder").toString

    ZOrderLayout.write(li, Seq("l_extendedprice", "l_partkey"), s"$base/z",
      bits = 8, numFiles = 64)
    // baseline: the classic single-column sorted layout
    li.repartitionByRange(64, $"l_extendedprice")
      .sortWithinPartitions("l_extendedprice")
      .write.mode("overwrite").parquet(s"$base/lin")

    val z = spark.read.parquet(s"$base/z")
    val lin = spark.read.parquet(s"$base/lin")

    // 1. parity: the layout changes bytes-on-disk order, never content
    assert(z.count() == li.count(), "z-order write dropped rows")
    val want = li.agg(sum($"l_orderkey"), sum($"l_partkey")).head()
    val got = z.agg(sum($"l_orderkey"), sum($"l_partkey")).head()
    assert(got == want, "z-order write changed content")

    // predicate workload: a 3x3 grid of two-sided boxes, 15% wide per
    // dimension, centered at 20/50/80% of each column's range. A single
    // narrow box is a coin flip at file granularity (curve-crossing
    // fragmentation can cost z-order a file or two); the WORKLOAD total
    // is the claim the layout actually makes.
    val Seq((pLo, pHi), (kLo, kHi)) =
      ZOrderLayout.columnBounds(li, Seq("l_extendedprice", "l_partkey"))
    def box(lo: Double, hi: Double, center: Double, frac: Double): (Double, Double) = {
      val c = lo + (hi - lo) * center; val w = (hi - lo) * frac / 2; (c - w, c + w)
    }
    val centers = Seq(0.2, 0.5, 0.8)
    val boxes = for (cp <- centers; ck <- centers)
      yield (box(pLo, pHi, cp, 0.15), box(kLo, kHi, ck, 0.15))

    // 2. two-sided boxes: across the workload, z-order must touch fewer
    // files than the price-sorted layout (which prunes on price but
    // reads every partkey)
    var zSum = 0L; var linSum = 0L; var zTotal = 0L; var linTotal = 0L
    boxes.foreach { case (pb, kb) =>
      val (zb, zt) = touched(z, "l_extendedprice", pb, "l_partkey", Some(kb))
      val (lb, lt) = touched(lin, "l_extendedprice", pb, "l_partkey", Some(kb))
      zSum += zb; linSum += lb; zTotal = zt; linTotal = lt
    }
    assert(zTotal >= 32 && linTotal >= 32, s"layouts produced too few files: $zTotal / $linTotal")
    info(s"two-sided 15% box workload: z-order touches $zSum file-reads, " +
      s"price-sort touches $linSum, of $zTotal files per layout x ${boxes.size} boxes")
    assert(zSum < linSum,
      s"z-order workload pruning not better: z=$zSum lin=$linSum over ${boxes.size} boxes")
    val partBox = box(kLo, kHi, 0.5, 0.15)

    // 3. second-column-only predicate: the price sort prunes NOTHING
    // (every file spans all partkeys); z-order must skip a real fraction
    val (zPart, _) = touched(z, "l_partkey", partBox, "l_extendedprice", None)
    val (linPart, _) = touched(lin, "l_partkey", partBox, "l_extendedprice", None)
    assert(linPart == linTotal, "baseline unexpectedly pruned on the unsorted column")
    info(s"partkey-only 15% slab: z-order touches $zPart/$zTotal files, price-sort $linPart/$linTotal")
    assert(zPart <= zTotal * 7 / 10,
      s"z-order skipped too few files on the second column: $zPart/$zTotal")
  }
}
