package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column<->Expression converters so the
  * engine can ship custom Catalyst expressions (e.g.
  * graft.functions.SortedLongIntersectCount) behind ordinary Column
  * wrappers. The classic pattern for Spark extension libraries — no Spark
  * internals are modified, only accessed.
  */
package object graftbridge {
  def columnOf(e: Expression): Column = ExpressionUtils.column(e)
  def expressionOf(c: Column): Expression = ExpressionUtils.expression(c)
}
