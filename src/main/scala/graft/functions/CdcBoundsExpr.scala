package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Codegen'd CONTENT-DEFINED chunking boundaries (the storage-dedup /
  * rsync primitive): a 16-byte Karp–Rabin window rolls over the payload
  * and cuts a chunk wherever the window hash lands on a zero residue
  * mod 2^maskBits — so boundaries are a pure function of LOCAL content.
  * That is the property fixed-size chunking (m02) lacks: insert one
  * byte and every fixed frame after the edit shifts (zero dedup hits),
  * while CDC boundaries re-synchronize within ~window+2^maskBits bytes
  * and every later chunk hashes identically (law-pinned). Average chunk
  * ≈ 2^maskBits bytes; `maxBytes` caps the scanned prefix (m02's
  * bounded-row-growth discipline).
  *
  * Returns array<struct<off int, len int>> (0-based byte offsets,
  * covering the scanned prefix exactly); chunk content hashing stays
  * downstream (`md5(substring(payload, off+1, len))`) so the expression
  * does one O(n) pass and no allocation beyond the boundary list.
  *
  * Hash: h_i = Σ_{j=0..15} byte(i−j)·31^j mod 2^31, maintained
  * rolling (h·31 + in − out·31^16, kept non-negative) — exactly the
  * per-position sum the DuckDB oracle computes naively, so the m13
  * boundaries are bit-identical cross-engine.
  */
case class CdcBoundsExpr(child: Expression, maskBits: Int, maxBytes: Int)
    extends UnaryExpression {

  require(maskBits >= 1 && maskBits <= 20,
    s"cdc_bounds: maskBits=$maskBits out of range [1, 20]")
  require(maxBytes >= CdcBoundsExpr.Window && maxBytes <= (1 << 26),
    s"cdc_bounds: maxBytes=$maxBytes out of range")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("off", IntegerType, nullable = false),
      StructField("len", IntegerType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cdc_bounds expects binary, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val offs = CdcBoundsExpr.bounds(bytes, maskBits, maxBytes)
    new GenericArrayData(offs.map { case (o, l) =>
      InternalRow(o, l)
    }.asInstanceOf[Array[Any]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val pairs = ctx.freshName("pairs")
      val rows = ctx.freshName("rows")
      val i = ctx.freshName("i")
      val cls = CdcBoundsExpr.getClass.getName.stripSuffix("$")
      s"""
        int[] $pairs = $cls.boundsFlat($b, $maskBits, $maxBytes);
        org.apache.spark.sql.catalyst.InternalRow[] $rows =
          new org.apache.spark.sql.catalyst.InternalRow[$pairs.length / 2];
        for (int $i = 0; $i < $rows.length; $i++) {
          $rows[$i] = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            new Object[] { $pairs[2 * $i], $pairs[2 * $i + 1] });
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData((Object[]) $rows);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "cdc_bounds"
}

object CdcBoundsExpr {
  /** Rolling-hash window length in bytes. */
  val Window = 16
  private val Mod = 1L << 31
  /** 31^Window mod 2^31 — the out-byte coefficient. */
  private val PowW: Long = {
    var p = 1L
    var j = 0
    while (j < Window) { p = (p * 31L) % Mod; j += 1 }
    p
  }

  /** O(n) boundary scan shared by eval and codegen. */
  def bounds(bytes: Array[Byte], maskBits: Int, maxBytes: Int): Array[(Int, Int)] = {
    val flat = boundsFlat(bytes, maskBits, maxBytes)
    Array.tabulate(flat.length / 2)(i => (flat(2 * i), flat(2 * i + 1)))
  }

  /** Flat (off, len, off, len, …) form for the generated code. */
  def boundsFlat(bytes: Array[Byte], maskBits: Int, maxBytes: Int): Array[Int] = {
    val n = math.min(bytes.length, maxBytes)
    if (n == 0) return Array.emptyIntArray
    val mask = (1L << maskBits) - 1L
    val out = new java.util.ArrayList[Integer]()
    var h = 0L
    var start = 0
    var i = 0
    while (i < n) {
      h = (h * 31L + (bytes(i) & 0xFF)) % Mod
      if (i >= Window) {
        h = (h - (bytes(i - Window) & 0xFF) * PowW) % Mod
        if (h < 0) h += Mod
      }
      if (i >= Window - 1 && (h & mask) == 0L) {
        out.add(start); out.add(i - start + 1)
        start = i + 1
      }
      i += 1
    }
    if (start < n) { out.add(start); out.add(n - start) }
    val arr = new Array[Int](out.size)
    var j = 0
    while (j < arr.length) { arr(j) = out.get(j); j += 1 }
    arr
  }

  /** Column-API entry: `cdcBounds(payload, maskBits, maxBytes)` →
    * array<struct<off,len>>.
    */
  def cdcBounds(payload: Column, maskBits: Int, maxBytes: Int): Column =
    Bridge.column(CdcBoundsExpr(Bridge.expression(payload), maskBits, maxBytes))
}
