package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd in-order dot product over two numeric arrays (float, double,
  * or tinyint elements, independently per side).
  *
  * This is the inner loop of every hyperplane-LSH sketch: `lshBucket`
  * evaluates one dot per plane per row (e.g. 24 bands x 4 planes = 96 per
  * row in the bucketed pair list), and the HOF formulation
  * (`aggregate(zip_with(...))`) allocates an intermediate product array
  * per call and never enters whole-stage codegen (HOF lambdas are always
  * interpreted). Accumulation is the same in-order left fold of
  * (double)a[i]*(double)b[i], so results are bitwise-equal to the HOF
  * twin; null on length mismatch (the HOF nulls via zip_with padding).
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType | ByteType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double|tinyint> inputs, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  private def get(x: ArrayData, t: DataType, i: Int): Double = t match {
    case FloatType => x.getFloat(i).toDouble
    case DoubleType => x.getDouble(i)
    case ByteType => x.getByte(i).toDouble
    case other => throw new IllegalStateException(s"unreachable: $other")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (ta, tb) = (elemType(left).get, elemType(right).get)
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0
    var i = 0
    while (i < n) { dot += get(x, ta, i) * get(y, tb, i); i += 1 }
    dot
  }

  private def getter(arr: String, t: DataType, i: String): String = t match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case DoubleType => s"$arr.getDouble($i)"
    case ByteType => s"(double) $arr.getByte($i)"
    case other => throw new IllegalStateException(s"unreachable: $other")
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
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += ${getter(a, elemType(left).get, i)} * ${getter(b, elemType(right).get, i)};
         |  }
         |  ${ev.value} = $dot;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}

  def apply(a: Column, b: Column): Column =
    columnOf(DotProduct(expressionOf(a), expressionOf(b)))
}
