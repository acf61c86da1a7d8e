package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd EXACT integer dot product over two array<long> columns —
  * the inner loop of the quantized-cosine pair kernels
  * (`Similarity.allPairsAboveThresholdExact`): per candidate pair, one
  * in-order 64-bit fold with no float anywhere, so the result is a pure
  * integer function of the quantized inputs and replays bit-for-bit in
  * DuckDB integer SQL (the hard oracle signal).
  *
  * Overflow contract: the CALLER bounds the inputs — exactness holds
  * while Σ|a_i·b_i| < 2^63; the quantized-cosine kernels keep elements
  * ≤ scale·maxAbs (default 2^13·2 = 2^14), so dim·2^28 ≈ 2^34 worst
  * case — 29 bits of headroom. Null on length mismatch, mirroring
  * [[DotProduct]].
  */
case class DotProductLong(left: Expression, right: Expression)
  extends BinaryExpression {

  private def ok(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> inputs, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product_long"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0L
    var i = 0
    while (i < n) { dot += x.getLong(i) * y.getLong(i); i += 1 }
    dot
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $dot = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += $a.getLong($i) * $b.getLong($i);
         |  }
         |  ${ev.value} = $dot;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProductLong {
  import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}

  def apply(a: Column, b: Column): Column =
    columnOf(DotProductLong(expressionOf(a), expressionOf(b)))
}
