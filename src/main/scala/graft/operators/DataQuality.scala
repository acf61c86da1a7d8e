package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Constraint-validation report (the Deequ/expectations pattern): a set of
  * named data-quality metrics — row counts, null counts, domain
  * violations, key-uniqueness violations — computed in ONE aggregation
  * pass over the table and emitted long-form as (check, value) rows.
  *
  * Scale shape: every metric is an aggregate expression inside a single
  * `agg`, so the whole report is one map-side-combined scan — no shuffle
  * of data rows, one tiny result row unpivoted on the driver side of the
  * plan. Adding a metric adds a column to the partial aggregate, not a
  * pass over the table.
  */
object DataQuality {

  /** Common metric builders. All yield BIGINT-valued aggregate columns. */
  def nullCount(c: Column): Column = count(lit(1)) - count(c)
  def violations(pred: Column): Column = count_if(pred)
  def duplicateKeys(c: Column*): Column =
    count(lit(1)) - count_distinct(c.head, c.tail: _*)

  /** Run the named checks in one pass; output (check, value) with value
    * cast to double so heterogeneous metrics share one long-form column. */
  def report(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "at least one check required")
    val aggd = df.agg(
      checks.head._2.cast("double").as(checks.head._1),
      checks.tail.map { case (n, c) => c.cast("double").as(n) }: _*)
    aggd.unpivot(Array.empty[Column], checks.map(c => col(c._1)).toArray,
      "check_name", "value")
  }

  /** The same checks attached IN-FLIGHT via `Dataset.observe`
    * (CollectMetrics): metrics accumulate as a side effect of whatever
    * action the pipeline already runs — no second scan, and the identical
    * call works on a streaming Dataset (metrics per micro-batch via
    * `StreamingQueryProgress.observedMetrics`). Batch consumers read them
    * from a `QueryExecutionListener`; spec-tested against [[report]]. */
  def observed(df: DataFrame, metricsName: String,
               checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "at least one check required")
    df.observe(metricsName,
      checks.head._2.cast("double").as(checks.head._1),
      checks.tail.map { case (n, c) => c.cast("double").as(n) }: _*)
  }
}
