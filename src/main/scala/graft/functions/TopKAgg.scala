package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Bounded binary min-heap of (score, id) pairs where the HEAD is the
  * current WORST element under the total order "higher score wins, ties
  * broken by smaller id". Fixed k-slot arrays — the aggregation buffer
  * never grows past k, whatever the group size.
  */
final class TopKHeap(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  /** (s1,i1) strictly worse than (s2,i2) in the ranking. */
  @inline private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 < s2 || (s1 == s2 && i1 > i2)

  def offer(s: Double, id: Long): Unit = {
    if (size < k) {
      var i = size; scores(i) = s; ids(i) = id; size += 1
      // sift up: heap invariant = parent worse-or-equal than children
      while (i > 0 && worse(scores(i), ids(i), scores((i - 1) / 2), ids((i - 1) / 2))) {
        swap(i, (i - 1) / 2); i = (i - 1) / 2
      }
    } else if (worse(scores(0), ids(0), s, id)) {
      scores(0) = s; ids(0) = id
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = 2 * i + 2
        var m = i
        if (l < size && worse(scores(l), ids(l), scores(m), ids(m))) m = l
        if (r < size && worse(scores(r), ids(r), scores(m), ids(m))) m = r
        if (m == i) done = true else { swap(i, m); i = m }
      }
    }
  }

  @inline private def swap(a: Int, b: Int): Unit = {
    val ts = scores(a); scores(a) = scores(b); scores(b) = ts
    val ti = ids(a); ids(a) = ids(b); ids(b) = ti
  }

  /** Contents best-first: score DESC, id ASC — a total order, so the
    * result is deterministic however updates and merges interleaved.
    */
  def sortedPairs: Array[(Double, Long)] = {
    val out = Array.tabulate(size)(i => (scores(i), ids(i)))
    out.sortWith { case ((s1, i1), (s2, i2)) => s1 > s2 || (s1 == s2 && i1 < i2) }
  }
}

/** Per-group top-k as a PARTIAL AGGREGATE (SURVEY §2.H): each map task
  * folds its rows into a k-slot heap, the shuffle carries ≤ k pairs per
  * (task, group) instead of every row, and merge folds heaps. The Window
  * form of top-k (q09) shuffles ALL rows of a group to one partition and
  * sorts them; this shuffles at most k·tasks rows per group and never
  * sorts more than k elements — the 100 TB shape for "top-k per key".
  * Heap eviction uses a TOTAL order (score desc, id asc) so the result
  * set is independent of row and merge order. Runs under
  * ObjectHashAggregateExec (spec-pinned: no Window, no per-group Sort).
  */
case class TopKAgg(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] {

  require(k >= 1 && k <= 1000000, s"top_k: k=$k out of range")

  override def children: Seq[Expression] = Seq(score, id)

  // AbstractDataType (and with it ImplicitCastInputTypes) is private[sql]
  // in Spark 4, so callers cast explicitly and we type-check here.
  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"top_k expects (double, bigint) inputs, got $other")
    }
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buffer: TopKHeap, input: InternalRow): TopKHeap = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buffer.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKHeap, other: TopKHeap): TopKHeap = {
    var i = 0
    while (i < other.size) { buffer.offer(other.scores(i), other.ids(i)); i += 1 }
    buffer
  }

  override def eval(buffer: TopKHeap): Any =
    new GenericArrayData(buffer.sortedPairs.map { case (s, i) =>
      InternalRow(s, i)
    }.asInstanceOf[Array[Any]])

  override def serialize(buffer: TopKHeap): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buffer.size * 16)
    bb.putInt(buffer.size)
    var i = 0
    while (i < buffer.size) {
      bb.putDouble(buffer.scores(i)); bb.putLong(buffer.ids(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new TopKHeap(k)
    var i = 0
    while (i < n) { h.offer(bb.getDouble, bb.getLong); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(score = newChildren(0), id = newChildren(1))
  override def prettyName: String = "top_k"
}

object TopKAgg {
  /** Column-API entry: `top_k(score, id, k)` → array<struct<score,id>>
    * best-first. Use `posexplode` on the result for ranked rows.
    */
  def topK(score: Column, id: Column, k: Int): Column =
    Bridge.column(TopKAgg(
      Bridge.expression(score), Bridge.expression(id), k).toAggregateExpression())
}
