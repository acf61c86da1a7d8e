package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, FloatType}

/** Custom Catalyst expression (SURVEY.md §4.3 option 2): fused cosine
  * similarity over two array<float> embedding columns.
  *
  * Single pass, three primitive accumulators, whole-stage codegen — vs the
  * HOF formulation (`aggregate(zip_with(...))`) which allocates an
  * intermediate product array and walks each input twice. Accumulation
  * order and widening are IDENTICAL to the HOF form (in-order left fold of
  * (double)a[i]*(double)b[i]), so results are bitwise-equal and the DuckDB
  * oracle mirror is unaffected. Returns null when lengths differ (the HOF
  * form nulls via zip_with padding) and when either vector has zero norm
  * (0/0 would otherwise yield NaN here but an ANSI divide-by-zero error in
  * the Catalyst-`Divide` HOF twin — null is the one value both forms and
  * the SQL oracle can agree on).
  */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  // float is the embedding storage type; tinyint serves the int8-quantized
  // search path (cosine is scale-invariant, so quantized arrays are scored
  // directly); double covers derived vectors (e.g. centroids)
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
  override def prettyName: String = "cosine_similarity"

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
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val u = get(x, ta, i)
      val v = get(y, tb, i)
      dot += u * v; na += u * u; nb += v * v
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      // every emitted local is ctx.freshName'd — a bare name like `u` can
      // collide with an enclosing fused-codegen scope and fail compilation
      // (silent whole-stage fallback to interpreted)
      val u = ctx.freshName("u"); val v = ctx.freshName("v")
      def getter(arr: String, t: DataType): String = t match {
        case FloatType => s"(double) $arr.getFloat($i)"
        case DoubleType => s"$arr.getDouble($i)"
        case ByteType => s"(double) $arr.getByte($i)"
        case other => throw new IllegalStateException(s"unreachable: $other")
      }
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $u = ${getter(a, elemType(left).get)};
         |    final double $v = ${getter(b, elemType(right).get)};
         |    $dot += $u * $v; $na += $u * $u; $nb += $v * $v;
         |  }
         |  if ($na == 0.0 || $nb == 0.0) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}

  def apply(a: Column, b: Column): Column =
    columnOf(CosineSimilarity(expressionOf(a), expressionOf(b)))
}
