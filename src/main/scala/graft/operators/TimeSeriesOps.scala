package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.Det

/** Time-series resampling for OHLCV-shaped data — the operations the
  * reference's partitioned price history exists to feed (`README.md:46`):
  * regularize an irregular event series onto a fixed calendar grid and
  * carry observations forward across gaps.
  *
  * Scale shape: the calendar grid is generated per-key with `sequence`
  * + `explode` (executor-side, no driver loop) and the fill is a window
  * `last(ignoreNulls)` over the key partition — one shuffle on the key,
  * same as any per-symbol window. No collect, no python-style reindexing.
  */
object TimeSeriesOps {

  /** Resample to month grain with zero-fill: every (key, month) in the
    * key's [min, max] month span appears exactly once; months with no
    * rows get agg value 0. */
  def resampleMonthlyZeroFill(df: DataFrame, keyCol: String, tsCol: String,
                              valueCol: String): DataFrame = {
    val monthly = df
      .groupBy(col(keyCol), date_trunc("month", col(tsCol)).cast("date").as("month"))
      .agg(Det.fixedSum(col(valueCol), 2).as("month_value"))
    val spans = monthly.groupBy(col(keyCol))
      .agg(min(col("month")).as("__lo"), max(col("month")).as("__hi"))
    val grid = spans.select(col(keyCol),
      explode(sequence(col("__lo"), col("__hi"), expr("INTERVAL '1' MONTH"))).as("month"))
    grid.join(monthly, Seq(keyCol, "month"), "left_outer")
      .select(col(keyCol), col("month"),
        coalesce(col("month_value"), lit(0.0)).as("month_value"))
  }

  /** Last-observation-carried-forward over a calendar grid: null values
    * (gap rows) take the most recent non-null value at-or-before them
    * within the key. `orderCols` must be a total order within the key. */
  def forwardFill(df: DataFrame, keyCol: String, orderCols: Seq[Column],
                  valueCol: String, filledName: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(filledName, last(col(valueCol), ignoreNulls = true).over(w))
  }

  /** Expand a per-(key, day) frame onto the full daily calendar of each
    * key's [min, max] span (gap days carry null values). Input must be
    * unique per (key, day) — aggregate first. */
  def gridJoinDaily(daily: DataFrame, keyCol: String, dayCol: String): DataFrame = {
    val spans = daily.groupBy(col(keyCol))
      .agg(min(col(dayCol)).as("__lo"), max(col(dayCol)).as("__hi"))
    val grid = spans.select(col(keyCol),
      explode(sequence(col("__lo"), col("__hi"))).as(dayCol))
    grid.join(daily, Seq(keyCol, dayCol), "left_outer")
  }

  /** Daily-grid LOCF: regularize to one row per (key, day) across the
    * key's span, carrying the last value forward across non-trading days —
    * the canonical OHLCV gap-fill. */
  def dailyLocf(df: DataFrame, keyCol: String, tsCol: String,
                valueCol: String): DataFrame = {
    val daily = df.select(col(keyCol), col(tsCol).cast("date").as("day"),
      col(valueCol))
    forwardFill(gridJoinDaily(daily, keyCol, "day"),
      keyCol, Seq(col("day")), valueCol, s"${valueCol}_filled")
  }
}
