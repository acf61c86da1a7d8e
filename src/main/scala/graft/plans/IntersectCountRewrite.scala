package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ArrayDistinct, ArrayIntersect, Expression, Literal, Size, SortArray}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, BooleanType, LongType}
import graft.functions.SortedLongIntersectCount

/** Optimizer rule (SURVEY.md §4.3 path c, injected via
  * `GraftExtensions`): rewrites
  *
  *   `size(array_intersect(sort_array(array_distinct(x)),
  *                         sort_array(array_distinct(y))))`
  *
  * into the fused two-pointer codegen expression
  * [[graft.functions.SortedLongIntersectCount]] — users write the plain
  * declarative form and automatically get the primitive merge loop
  * (measured ~14x over generic `ArrayIntersect`'s boxed per-row hash set
  * on the exact-Jaccard hot path).
  *
  * Soundness preconditions, all PROVEN statically from the matched shape
  * (never assumed): ascending-sorted (`sort_array(..., asc)`),
  * duplicate-free (`array_distinct`), null-free elements
  * (`containsNull = false` on the element type), 64-bit integer elements.
  * `array_intersect` of two such arrays has exactly one output element per
  * common value, which is exactly what the two-pointer merge counts; both
  * forms return int with identical nullability.
  */
object IntersectCountRewrite extends Rule[LogicalPlan] {

  private def sortedDistinctLongs(e: Expression): Boolean = e match {
    case SortArray(inner @ ArrayDistinct(_), Literal(true, BooleanType)) =>
      inner.dataType match {
        case ArrayType(LongType, containsNull) => !containsNull
        case _ => false
      }
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // legacySizeOfNull must be false: legacy `size` returns -1 for a
      // null input where the fused expression (like modern size) is null
      case Size(ArrayIntersect(a, b), false)
        if sortedDistinctLongs(a) && sortedDistinctLongs(b) =>
        SortedLongIntersectCount(a, b)
    }
}
