package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable Misra–Gries heavy-hitter sketch with at most `capacity`
  * counters, whatever the stream length or vocabulary size.
  *
  * Guarantees (Misra–Gries 1982; merge form per Agarwal et al.,
  * "Mergeable Summaries", PODS'12): after any interleaving of updates
  * and merges over a stream of n items,
  *   - every item with true frequency f(x) > n/(capacity+1) is present;
  *   - each stored estimate underestimates by at most n/(capacity+1).
  *
  * The CONTENTS may depend on update/merge order (ties near the bound),
  * so consumers must treat the output as a CANDIDATE set — the engine's
  * t29 query recounts candidates exactly, making the final answer
  * deterministic and oracle-checkable while only ever shuffling
  * `capacity` counters per map task instead of the full vocabulary.
  */
final class MGSketch(val capacity: Int) {
  val counts: mutable.HashMap[String, Long] = mutable.HashMap.empty

  /** One occurrence of `w` (streaming update). */
  def add(w: String): Unit = {
    val cur = counts.getOrElse(w, 0L)
    if (cur > 0L || counts.size < capacity) {
      counts.update(w, cur + 1L)
    } else {
      // Full and w absent: decrement every counter (w's occurrence is
      // discarded along with one unit of each survivor — the classic
      // "cancel capacity+1 distinct items" step).
      val dead = mutable.ArrayBuffer.empty[String]
      val it = counts.iterator
      while (it.hasNext) {
        val (k, v) = it.next()
        if (v <= 1L) dead += k
      }
      counts.mapValuesInPlace((_, v) => v - 1L)
      dead.foreach(counts.remove)
    }
  }

  /** Weighted insert (merge path). */
  def addCount(w: String, c: Long): Unit = {
    if (c > 0L) counts.update(w, counts.getOrElse(w, 0L) + c)
  }

  /** Restore the ≤ capacity invariant after a merge: subtract the
    * (capacity+1)-th largest count from every counter and drop the
    * non-positive — the mergeable-summaries offset step.
    */
  def shrink(): Unit = {
    if (counts.size > capacity) {
      val vs = counts.values.toArray
      java.util.Arrays.sort(vs)
      val sub = vs(vs.length - capacity - 1)
      val dead = mutable.ArrayBuffer.empty[String]
      val it = counts.iterator
      while (it.hasNext) {
        val (k, v) = it.next()
        if (v <= sub) dead += k
      }
      counts.mapValuesInPlace((_, v) => v - sub)
      dead.foreach(counts.remove)
    }
  }

  /** Deterministic-given-contents listing: estimate DESC, word ASC. */
  def sortedEntries: Array[(String, Long)] =
    counts.toArray.sortWith { case ((w1, c1), (w2, c2)) =>
      c1 > c2 || (c1 == c2 && w1 < w2)
    }
}

/** `heavy_hitters(word, capacity)` — per-group Misra–Gries candidates as
  * array<struct<word string, est bigint>>, estimate-descending.
  *
  * The 100 TB shape for "which words exceed φ of the corpus": the exact
  * two-phase count (t06's shape) shuffles one row per DISTINCT word per
  * map task — at web scale the vocabulary is billions and the shuffle is
  * the bottleneck. This aggregate's map side folds every token into a
  * fixed `capacity`-slot sketch, the shuffle carries ≤ capacity counters
  * per task, and merge re-shrinks — O(capacity) state end to end. Pair
  * with an exact recount of the ≤ capacity candidates (broadcast
  * semi-filter, t29) for a provably exact final answer whenever
  * φ > 1/(capacity+1).
  */
case class HeavyHittersAgg(
    word: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGSketch] {

  require(capacity >= 1 && capacity <= 1000000,
    s"heavy_hitters: capacity=$capacity out of range")

  override def children: Seq[Expression] = Seq(word)

  override def checkInputDataTypes(): TypeCheckResult =
    word.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"heavy_hitters expects a string input, got $other")
    }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("word", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): MGSketch = new MGSketch(capacity)

  override def update(buffer: MGSketch, input: InternalRow): MGSketch = {
    val w = word.eval(input)
    // UTF8String may alias a reused scan buffer — materialize to String.
    if (w != null) buffer.add(w.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: MGSketch, other: MGSketch): MGSketch = {
    other.counts.foreach { case (w, c) => buffer.addCount(w, c) }
    buffer.shrink()
    buffer
  }

  override def eval(buffer: MGSketch): Any =
    new GenericArrayData(buffer.sortedEntries.map { case (w, c) =>
      InternalRow(UTF8String.fromString(w), c)
    }.asInstanceOf[Array[Any]])

  override def serialize(buffer: MGSketch): Array[Byte] = {
    val entries = buffer.counts.toArray.map { case (w, c) =>
      (w.getBytes(StandardCharsets.UTF_8), c)
    }
    val bb = ByteBuffer.allocate(4 + entries.map(e => 4 + e._1.length + 8).sum)
    bb.putInt(entries.length)
    entries.foreach { case (wb, c) =>
      bb.putInt(wb.length); bb.put(wb); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MGSketch = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new MGSketch(capacity)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val wb = new Array[Byte](len)
      bb.get(wb)
      s.counts.update(new String(wb, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHittersAgg =
    copy(word = newChildren(0))
  override def prettyName: String = "heavy_hitters"
}

object HeavyHittersAgg {
  /** Column-API entry: `heavy_hitters(word, capacity)` →
    * array<struct<word,est>> estimate-descending. Treat as candidates;
    * recount exactly for a deterministic answer (see TextOps t29).
    */
  def heavyHitters(word: Column, capacity: Int): Column =
    Bridge.column(HeavyHittersAgg(
      Bridge.expression(word), capacity).toAggregateExpression())
}
