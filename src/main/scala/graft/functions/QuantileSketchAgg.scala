package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Mergeable DETERMINISTIC quantile summary (Munro–Paterson multilevel
  * compaction, the deterministic core of the KLL family) with a
  * SELF-TRACKED worst-case rank-error bound.
  *
  * Structure: level `l` holds items of weight 2^l in an unsorted buffer
  * of capacity `k`. A full buffer SORTS and keeps every other element
  * (alternating start parity per level), promoting survivors — now
  * weight 2^(l+1) — upward. Each compaction of a level-l buffer
  * perturbs any rank estimate by at most 2^l, and the sketch ADDS that
  * to `err` as it happens, so the bound reported at eval time is not an
  * analytic formula that could drift from the implementation — it is an
  * exact audit of the information actually discarded. Merging another
  * sketch concatenates level-wise, sums `n` and `err`, and re-compacts:
  * summaries are mergeable in any tree shape, the bound just adds.
  *
  * Guarantee consumed downstream: for every value x, the weighted rank
  * the summary reports differs from x's true rank by at most `err`.
  * The CONTENTS depend on update/merge order (which elements survive a
  * compaction does); the BOUND holds for every order. Consumers that
  * need a deterministic, oracle-checkable answer therefore use the
  * summary only to NARROW — q54 brackets the target rank with
  * (loV, hiV] from the summary, then an exact second pass counts below
  * loV and sorts only the bracketed slice, exactly q51/q53's refine
  * discipline with a sketch instead of a histogram doing the
  * narrowing. State is O(k·log(n/k)) doubles per group — the map-side
  * shuffle carries a summary, never the group's values, which is what
  * percentile_disc's buffer-everything aggregate cannot do at a
  * 10⁹-row group.
  */
final class MPSketch(val k: Int) {
  val levels: mutable.ArrayBuffer[mutable.ArrayBuffer[Double]] =
    mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Double])
  /** alternating compaction parity per level (balances the bias; the
    * tracked bound is safe either way) */
  val parity: mutable.ArrayBuffer[Boolean] = mutable.ArrayBuffer(false)
  var n: Long = 0L
  var err: Long = 0L

  def add(v: Double): Unit = {
    n += 1L
    levels(0) += v
    if (levels(0).length >= k) compact(0)
  }

  private def ensureLevel(l: Int): Unit =
    while (levels.length <= l) {
      levels += mutable.ArrayBuffer.empty[Double]
      parity += false
    }

  /** Sort level l, keep alternate elements, promote them to level l+1.
    * Adds 2^l to the tracked rank-error bound (one compaction's
    * worst-case perturbation; conservative for the alternating scheme).
    */
  private def compact(l: Int): Unit = {
    val buf = levels(l)
    if (buf.length < 2) return
    val arr = buf.toArray
    java.util.Arrays.sort(arr)
    buf.clear()
    // an odd element count can't halve: the largest holds back at its
    // own level, so every item's weight stays an exact power of two
    val even = arr.length & ~1
    if (arr.length % 2 == 1) buf += arr(arr.length - 1)
    val start = if (parity(l)) 1 else 0
    parity(l) = !parity(l)
    ensureLevel(l + 1)
    val hi = levels(l + 1)
    var i = start
    while (i < even) { hi += arr(i); i += 2 }
    err += 1L << l
    if (hi.length >= k) compact(l + 1)
  }

  def merge(other: MPSketch): Unit = {
    n += other.n
    err += other.err
    ensureLevel(other.levels.length - 1)
    var l = 0
    while (l < other.levels.length) {
      levels(l) ++= other.levels(l)
      l += 1
    }
    l = 0
    while (l < levels.length) {
      if (levels(l).length >= k) compact(l)
      l += 1
    }
  }

  /** (value, weight) items sorted by value — the flattened summary. */
  def items: Array[(Double, Long)] = {
    val out = mutable.ArrayBuffer.empty[(Double, Long)]
    var l = 0
    while (l < levels.length) {
      val w = 1L << l
      levels(l).foreach(v => out += ((v, w)))
      l += 1
    }
    out.sortBy(_._1).toArray
  }
}

/** `quantile_sketch(v, k)` — per-group mergeable quantile summary:
  * struct<items array<struct<v double, w bigint>> (value-ascending),
  * n bigint, err bigint>. See [[MPSketch]] for the contract; q54 for
  * the exact-refine consumption pattern.
  */
case class QuantileSketchAgg(
    value: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MPSketch] {

  require(k >= 8 && k <= 65536, s"quantile_sketch: k=$k out of range [8, 65536]")

  override def children: Seq[Expression] = Seq(value)

  override def checkInputDataTypes(): TypeCheckResult =
    value.dataType match {
      case DoubleType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"quantile_sketch expects a double input, got $other")
    }

  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("items", ArrayType(
      StructType(Seq(
        StructField("v", DoubleType, nullable = false),
        StructField("w", LongType, nullable = false))),
      containsNull = false), nullable = false),
    StructField("n", LongType, nullable = false),
    StructField("err", LongType, nullable = false)))

  override def createAggregationBuffer(): MPSketch = new MPSketch(k)

  override def update(buffer: MPSketch, input: InternalRow): MPSketch = {
    val v = value.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: MPSketch, other: MPSketch): MPSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: MPSketch): Any = {
    val arr = new GenericArrayData(buffer.items.map { case (v, w) =>
      InternalRow(v, w)
    }.asInstanceOf[Array[Any]])
    InternalRow(arr, buffer.n, buffer.err)
  }

  override def serialize(buffer: MPSketch): Array[Byte] = {
    val sizes = buffer.levels.map(_.length)
    val bb = ByteBuffer.allocate(8 + 8 + 4 + sizes.map(s => 4 + 1 + s * 8).sum)
    bb.putLong(buffer.n)
    bb.putLong(buffer.err)
    bb.putInt(buffer.levels.length)
    var l = 0
    while (l < buffer.levels.length) {
      val lv = buffer.levels(l)
      bb.putInt(lv.length)
      bb.put(if (buffer.parity(l)) 1.toByte else 0.toByte)
      lv.foreach(bb.putDouble)
      l += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MPSketch = {
    val bb = ByteBuffer.wrap(bytes)
    val s = new MPSketch(k)
    s.n = bb.getLong
    s.err = bb.getLong
    val nLevels = bb.getInt
    s.levels.clear(); s.parity.clear()
    var l = 0
    while (l < nLevels) {
      val sz = bb.getInt
      val par = bb.get() == 1.toByte
      val buf = mutable.ArrayBuffer.empty[Double]
      var i = 0
      while (i < sz) { buf += bb.getDouble; i += 1 }
      s.levels += buf
      s.parity += par
      l += 1
    }
    if (s.levels.isEmpty) { s.levels += mutable.ArrayBuffer.empty[Double]; s.parity += false }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantileSketchAgg =
    copy(value = newChildren(0))
  override def prettyName: String = "quantile_sketch"
}

object QuantileSketchAgg {
  /** Column-API entry: `quantileSketch(v, k)` → struct(items, n, err).
    * Treat items as a NARROWING device, not an answer — bracket the
    * target rank with ±err and refine exactly (q54).
    */
  def quantileSketch(v: Column, k: Int): Column =
    Bridge.column(QuantileSketchAgg(
      Bridge.expression(v), k).toAggregateExpression())
}
