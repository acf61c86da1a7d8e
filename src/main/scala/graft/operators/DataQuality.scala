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
  /** Single-pass column profile: per column, row count, null count and
    * EXACT distinct cardinality — the completeness/cardinality table a
    * pipeline publishes next to every landed dataset. One scan; the
    * multi-distinct aggregate runs through Spark's Expand (k+1 streams for
    * k columns — the standard multi-distinct plan), then one wide row
    * unpivots via `stack` into one row per column. Exact distincts keep
    * the profile oracle-checkable; at 100 TB swap `countDistinct` for
    * `approx_count_distinct` (the Q-AGG4 HLL path) column-by-column —
    * same shape, no Expand. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    val aggs = cols.flatMap { c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
      countDistinct(col(c)).as(s"__nd_$c")) }
    val row = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val stacked = cols.map(c => s"'$c', __n, __nulls_$c, __nd_$c").mkString(", ")
    row.selectExpr(
      s"stack(${cols.length}, $stacked) as (col_name, n_rows, n_nulls, n_distinct)")
  }

  /** Referential-integrity audit of one fact→dim foreign key: row and
    * distinct-key counts plus how many rows/keys are ORPHANED (no dim
    * match — the join-loss a silent inner join would eat). One left join
    * on the key + one aggregate; NULL foreign keys count as orphan rows
    * but not as keys (countDistinct skips null). Returns ONE row — union
    * audits across keys and publish next to the dataset. */
  def fkAudit(fact: DataFrame, factKey: String,
              dim: DataFrame, dimKey: String): DataFrame = {
    val d = dim.select(col(dimKey).as("__dk")).distinct()
    fact.select(col(factKey).as("__fk"))
      .join(d, col("__fk") === col("__dk"), "left_outer")
      .agg(count(lit(1)).as("n_fact_rows"),
        countDistinct(col("__fk")).as("n_distinct_keys"),
        sum(when(col("__dk").isNull, 1L).otherwise(0L)).as("n_orphan_rows"),
        countDistinct(when(col("__dk").isNull, col("__fk"))).as("n_orphan_keys"))
  }

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
