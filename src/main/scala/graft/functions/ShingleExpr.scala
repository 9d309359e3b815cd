package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd k-token shingle generator: array<string> → array<string> of
  * space-joined consecutive k-grams.
  *
  * Exists because Spark's higher-order `transform(sequence(...), lambda)`
  * evaluates the lambda interpreted per element — measured 23µs/shingle at
  * sf0.1 (~6s of the dedup pipelines' budget). This expression emits a
  * tight generated loop over UTF8String slices instead (~20× faster), and
  * is the shingle producer for minhash/simhash/jaccard and t05.
  */
case class ShingleExpr(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  // Opt into ConstantFolding for literal inputs (see CosineSim.foldable).
  override def foldable: Boolean = child.foldable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k >= 1 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"shingles expects array<string> and k >= 1, got ${child.dataType}, k=$k")
  }

  private val sep = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val m = if (n >= k) n - k + 1 else 0
    val out = new Array[AnyRef](m)
    var i = 0
    while (i < m) {
      val parts = new Array[UTF8String](k)
      var j = 0
      while (j < k) { parts(j) = a.getUTF8String(i + j); j += 1 }
      out(i) = UTF8String.concatWs(sep, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val sepRef = ctx.addReferenceObj("sep", sep, classOf[UTF8String].getName)
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val parts = (0 until k).map(j => s"$a.getUTF8String($i + $j)").mkString(", ")
      s"""
        int $n = $a.numElements();
        int $m = ($n >= $k) ? ($n - $k + 1) : 0;
        UTF8String[] $out = new UTF8String[$m];
        for (int $i = 0; $i < $m; $i++) {
          $out[$i] = UTF8String.concatWs($sepRef, $parts);
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleExpr {
  def shinglesFast(toks: Column, k: Int): Column =
    Bridge.column(ShingleExpr(Bridge.expression(toks), k))
}
