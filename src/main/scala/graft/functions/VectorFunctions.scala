package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.Bridge

/** Vector similarity primitives (SURVEY.md §2.D/E).
  *
  * `CosineSim` is a native Catalyst expression with whole-stage codegen: the
  * inner product loops over the two arrays in one pass of primitive doubles
  * — no boxing, no UDF serialization — so a brute-force scan stays
  * memory-bandwidth-bound. Accumulation is sequential (element 0 → n-1),
  * matching DuckDB's list_sum over a list_transform for oracle parity.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // Expression.foldable defaults to false for custom expressions; opting
  // in lets Catalyst's ConstantFolding collapse literal calls at plan
  // time (a literal-query cosine threshold becomes a constant, not a
  // per-row loop) — EngineSpec pins this.
  override def foldable: Boolean = left.foldable && right.foldable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cosine_sim expects array<double> inputs, got ${left.dataType} / ${right.dataType}")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val denom = ctx.freshName("denom")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $xi = $a.getDouble($i);
          double $yi = $b.getDouble($i);
          $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
        }
        double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
        ${ev.value} = ($denom == 0.0) ? 0.0 : ($dot / $denom);
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Raw inner product ⟨a,b⟩ over array<double> — the MIPS scoring
  * primitive (s14). Same single-pass primitive-double codegen loop and
  * sequential accumulation order as [[CosineSim]], so the DuckDB mirror
  * (list_sum over list_transform) is bit-identical.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def foldable: Boolean = left.foldable && right.foldable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dot_product expects array<double> inputs, got ${left.dataType} / ${right.dataType}")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += x.getDouble(i) * y.getDouble(i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $dot = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $dot += $a.getDouble($i) * $b.getDouble($i);
        }
        ${ev.value} = $dot;
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Packed 1-bit sign quantization: bit b of the result is set iff
  * vector[b] > 0, for the first `nBits` (≤ 62) coordinates — one int64
  * per vector, the coarse-stage signature of the quantized-rerank path
  * (s07). Native codegen loop (a composed 62-branch CASE chain codegens
  * too, but as a branch ladder; this is a tight data-dependent loop).
  * nBits ≤ 62 keeps the value positive so the DuckDB mirror's
  * non-wrapping BIGINT sum of CASE terms is identical.
  */
case class SignBitsExpr(child: Expression, nBits: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  // Opt into ConstantFolding for literal inputs (see CosineSim.foldable).
  override def foldable: Boolean = child.foldable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) if nBits >= 1 && nBits <= 62 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sign_bits expects array<double> and 1 <= nBits <= 62, got ${child.dataType} / $nBits")
    }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = math.min(nBits, x.numElements())
    var bits = 0L
    var i = 0
    while (i < n) {
      if (x.getDouble(i) > 0) bits |= (1L << i)
      i += 1
    }
    bits
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val bits = ctx.freshName("bits")
      s"""
        int $n = java.lang.Math.min($nBits, $a.numElements());
        long $bits = 0L;
        for (int $i = 0; $i < $n; $i++) {
          if ($a.getDouble($i) > 0) $bits |= (1L << $i);
        }
        ${ev.value} = $bits;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorFunctions {

  /** Embedding column (array<float> on disk) as array<double> for exact
    * cross-engine arithmetic (float→double widening is lossless).
    */
  def asDouble(c: Column): Column = c.cast(ArrayType(DoubleType))

  /** Cosine similarity via the codegen'd Catalyst expression. */
  def cosineSim(a: Column, b: Column): Column =
    Bridge.column(CosineSim(
      Bridge.expression(asDouble(a)),
      Bridge.expression(asDouble(b))))

  /** DuckDB SQL mirror of [[CosineSim]] (same formula and sequential
    * accumulation order) over 64-dim DOUBLE[] columns `a`/`b` — shared by
    * every vector-query oracle so the two sides can't drift.
    */
  def cosineSimSql(a: String, b: String): String =
    s"""list_sum(list_transform(range(1, 65), k -> $a[k] * $b[k]))
       / (sqrt(list_sum(list_transform(range(1, 65), k -> $a[k] * $a[k])))
          * sqrt(list_sum(list_transform(range(1, 65), k -> $b[k] * $b[k]))))"""

  /** Per-vector norm for [[cosineSimNormedSql]] — the SAME sequential
    * sum-of-squares [[cosineSimSql]] inlines, hoisted into a CTE.
    */
  def normSql(v: String): String =
    s"sqrt(list_sum(list_transform(range(1, 65), k -> $v[k] * $v[k])))"

  /** Norm-FACTORED spelling of [[cosineSimSql]] for pair-quadratic
    * oracles (d05's 200M pairs, s05/s18's 44M-pair LSH seed at sf1):
    * `na`/`nb` name [[normSql]] columns precomputed once per VECTOR, so
    * the per-pair work is one dot product instead of three transforms —
    * the round-14 sf1 sweep spent 40+ DuckDB-minutes inside one such
    * query before this. Bit-identical to the inline spelling by
    * construction: the norm is the same float sequence evaluated once
    * instead of per pair, and `dot / (na * nb)` is the same expression
    * tree — no reassociation anywhere, so the 4-dp ROUND can never see
    * a different value (§6's parity discipline).
    */
  def cosineSimNormedSql(a: String, b: String, na: String, nb: String): String =
    s"list_sum(list_transform(range(1, 65), k -> $a[k] * $b[k])) / ($na * $nb)"

  /** Inner product via the codegen'd [[DotProduct]] expression. */
  def dotProduct(a: Column, b: Column): Column =
    Bridge.column(DotProduct(
      Bridge.expression(asDouble(a)),
      Bridge.expression(asDouble(b))))

  /** DuckDB SQL mirror of [[DotProduct]] over `dims`-dim list columns
    * (same sequential accumulation order).
    */
  def dotSql(a: String, b: String, dims: Int = 64): String =
    s"list_sum(list_transform(range(1, ${dims + 1}), k -> $a[k] * $b[k]))"

  /** Sign-LSH bucket over the first `nBits` coordinates (axis-aligned
    * hyperplanes — deterministic and portable to the SQL oracle; a real
    * deployment would use seeded random hyperplanes, same plumbing).
    */
  def signBucket(v: Column, nBits: Int = 8): Column =
    (0 until nBits).map { b =>
      when(element_at(v, b + 1) > 0f, 1 << b).otherwise(0)
    }.reduce(_ + _)

  /** DuckDB mirror of [[signBucket]] over a float-list column `v`
    * (1-indexed), shared by every bucketed-vector oracle.
    */
  def signBucketSql(v: String, nBits: Int): String =
    (0 until nBits).map { b =>
      s"CASE WHEN $v[${b + 1}] > 0 THEN ${1 << b} ELSE 0 END"
    }.mkString(" + ")

  /** 64-bit sign signature over the first `nBits` coordinates (nBits ≤ 62
    * so the oracle's non-wrapping BIGINT sum cannot overflow): the 1-bit
    * quantization behind cheap hamming shortlists — 8 bytes per vector
    * instead of 256, compared with one xor+popcount (s07). Codegen'd
    * [[SignBitsExpr]] loop (float→double widening preserves sign).
    */
  def signBits(v: Column, nBits: Int): Column = {
    require(nBits <= 62, s"signBits: nBits=$nBits would overflow the BIGINT mirror")
    Bridge.column(SignBitsExpr(Bridge.expression(asDouble(v)), nBits))
  }

  /** DuckDB mirror of [[signBits]] over a (1-indexed) list column `v`. */
  def signBitsSql(v: String, nBits: Int): String =
    (0 until nBits).map { b =>
      s"CASE WHEN $v[${b + 1}] > 0 THEN CAST(${1L << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
    }.mkString(" + ")
}
