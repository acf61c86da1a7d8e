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
    // Built entirely with the functions API (aggregates nested inside
    // struct/array, labels via lit(c)) — no selectExpr string to re-parse,
    // so a column named `weird name`, `a'b` or `a.b` profiles fine. The
    // inline() unpivot replaces the old stack() selectExpr one-for-one.
    // col() itself parses dots as nested-field access, so names are
    // backquoted (embedded backticks doubled) before resolution.
    def c0(c: String): Column = col("`" + c.replace("`", "``") + "`")
    val entries = cols.map { c =>
      struct(lit(c).as("col_name"),
        count(lit(1)).as("n_rows"),
        sum(when(c0(c).isNull, 1L).otherwise(0L)).as("n_nulls"),
        countDistinct(c0(c)).as("n_distinct"))
    }
    df.agg(array(entries: _*).as("__profile"))
      .select(inline(col("__profile")))
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

  /** Functional-dependency audit lhs → rhs: does every lhs value map to
    * exactly ONE rhs value? The schema-discovery / denormalization-safety
    * check (an FD that holds means rhs can move to a dimension keyed by
    * lhs; a violated "key" means dedup/joins on it are unsound). One row:
    * (fd, n_lhs_keys, n_violating_keys, holds) — a key violates when it
    * maps to > 1 DISTINCT NON-NULL rhs value (countDistinct skips nulls,
    * so lhs → {x, null} reads as determined — the SQL-standard FD
    * reading, mirrored by the oracle twin). One aggregation per audited
    * pair, keyed on lhs. */
  def fdAudit(df: DataFrame, fdName: String, lhs: Seq[String],
              rhs: String): DataFrame = {
    df.groupBy(lhs.map(col): _*)
      .agg(countDistinct(col(rhs)).as("__nd"))
      .agg(lit(fdName).as("fd"),
        count(lit(1)).as("n_lhs_keys"),
        // coalesce: SUM over zero groups is NULL, and an empty relation
        // must read (0 violations, holds) — the vacuous FD — not unknown
        coalesce(sum(when(col("__nd") > 1, 1L).otherwise(0L)), lit(0L))
          .as("n_violating_keys"))
      .withColumn("holds", col("n_violating_keys") === 0)
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

  /** Cross-table reconciliation audit (round 10) — the "did the copy
    * land" check run after every replication/migration/backfill: both
    * sides bucket by the (numeric) key, each bucket reduces to a row
    * count and an ORDER-INDEPENDENT checksum (bitwise XOR of the per-row
    * `xxhash64(key, values...)`), and the buckets full-outer-join into a
    * verdict table. A diverging bucket localizes the damage to
    * 1/nBuckets of the keyspace without ever comparing rows — the audit
    * moves 2·nBuckets rows over the network, not data.
    *
    * XOR is the right fold: commutative/associative (partition-order
    * free), and a single flipped row flips the bucket checksum with
    * probability 1 − 2⁻⁶⁴ (two DIFFERENT corruptions canceling needs a
    * hash collision). The checksum replays exactly in DuckDB integer SQL
    * (`XxhashSql.hashLong2Cte` + bit_xor), so the whole audit is
    * oracle-checkable.
    *
    * Scale shape: one map-side-combined aggregation per side (bucket
    * count is the only shuffle key), one nBuckets-row join. */
  def reconcile(src: DataFrame, dst: DataFrame, keyCol: String,
                valueCol: String, nBuckets: Int = 64): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    def side(df: DataFrame, n: String, x: String) = df
      .select(pmod(col(keyCol).cast("long"), lit(nBuckets.toLong)).as("bucket"),
        xxhash64(col(keyCol).cast("long"), col(valueCol).cast("long")).as("__h"))
      .groupBy("bucket")
      .agg(count(lit(1)).as(n), expr("bit_xor(__h)").as(x))
    side(src, "n_src", "xor_src")
      .join(side(dst, "n_dst", "xor_dst"), Seq("bucket"), "full_outer")
      .withColumn("counts_match",
        coalesce(col("n_src"), lit(0L)) === coalesce(col("n_dst"), lit(0L)))
      .withColumn("checksum_match",
        col("counts_match") && coalesce(col("xor_src"), lit(0L)) ===
          coalesce(col("xor_dst"), lit(0L)))
  }
}
