package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Custom Catalyst expression (SURVEY.md §4.3 path b): Karp-Rabin rolling
  * polynomial fingerprint of
  * a token array — fp = fold(tokens, 0, (acc, t) -> (acc*B + (xxhash64(t)
  * mod M)) mod M), with B=131, M=2^31-1.
  *
  * Bit-for-bit the same value as the HOF formulation in
  * `TextOps.rollingFingerprint` (cross-checked by test), but higher-order
  * functions evaluate their lambdas interpreted, outside whole-stage
  * codegen; this emits one tight loop hashing each UTF8String in place
  * (measured ~4x on the 5k-doc fingerprint query).
  */
case class RollingPolynomialHash(child: Expression)
  extends UnaryExpression {

  private val M = 2147483647L // 2^31 - 1
  private val B = 131L

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_polynomial_hash"

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    var acc = 0L
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val s = arr.getUTF8String(i)
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      val hm = ((h % M) + M) % M // pmod
      acc = (((acc * B + hm) % M) + M) % M
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val acc = ctx.freshName("acc"); val s = ctx.freshName("s")
      val h = ctx.freshName("h"); val hm = ctx.freshName("hm")
      s"""
         |long $acc = 0L;
         |final int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  final org.apache.spark.unsafe.types.UTF8String $s = $a.getUTF8String($i);
         |  final long $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
         |    $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
         |  final long $hm = (($h % ${M}L) + ${M}L) % ${M}L;
         |  $acc = ((($acc * ${B}L + $hm) % ${M}L) + ${M}L) % ${M}L;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingPolynomialHash {
  import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}

  def apply(tokens: Column): Column =
    columnOf(RollingPolynomialHash(expressionOf(tokens)))
}
