package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Custom Catalyst expression (SURVEY.md §4.3 option b): intersection
  * cardinality of two SORTED array<long> columns via a two-pointer merge.
  *
  * Replaces `size(array_intersect(a, b))` in the exact-Jaccard hot path:
  * the generic ArrayIntersect builds a per-row hash set of boxed elements,
  * while this emits a tight primitive loop inside whole-stage codegen —
  * zero allocation, no boxing (measured ~14x on 3.5M candidate pairs).
  * Inputs MUST be ascending-sorted and null-free (`sort_array` of hashed
  * shingles upstream guarantees both).
  */
case class SortedLongIntersectCount(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(e => e.dataType match {
      case ArrayType(LongType, _) => true; case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> inputs, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_long_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var c = 0
    val n1 = x.numElements(); val n2 = y.numElements()
    while (i < n1 && j < n2) {
      val u = x.getLong(i); val v = y.getLong(j)
      if (u == v) { c += 1; i += 1; j += 1 }
      else if (u < v) i += 1
      else j += 1
    }
    c
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val n1 = ctx.freshName("n1")
      val n2 = ctx.freshName("n2")
      // freshName'd like every other local — bare names can shadow an
      // enclosing fused-codegen scope and break the whole stage's compile
      val u = ctx.freshName("u"); val v = ctx.freshName("v")
      s"""
         |int $i = 0, $j = 0, $c = 0;
         |final int $n1 = $a.numElements(), $n2 = $b.numElements();
         |while ($i < $n1 && $j < $n2) {
         |  final long $u = $a.getLong($i); final long $v = $b.getLong($j);
         |  if ($u == $v) { $c++; $i++; $j++; } else if ($u < $v) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedLongIntersectCount {
  import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}

  /** Column wrapper: count of common elements of two sorted array<long>s. */
  def apply(a: Column, b: Column): Column =
    columnOf(SortedLongIntersectCount(expressionOf(a), expressionOf(b)))
}
