package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Feature discretization / distribution profiling — fixed-width histograms
  * and equi-depth (quantile) bucketing. The reference eyeballs distributions
  * in pandas (`describe()`-style ad hoc); at 100 TB the histogram IS the
  * profile, and bucketing is the standard feature transform before training.
  */
object Binning {

  /** Fixed-width histogram: count + exact 2dp sum per bin over
    * [lo, lo + nBins*width); values outside clamp to the edge bins.
    * One map-side-combined aggregation — scan speed, no window.
    *
    * Bin arithmetic is a single IEEE divide + floor on both engines
    * (mirrored in [[sqlFixedWidthHistogram]]), so bin ids — and therefore
    * the whole result — hash-compare exactly. */
  def fixedWidthHistogram(df: DataFrame, valueCol: String,
                          lo: Double, width: Double, nBins: Int): DataFrame = {
    val bin = least(greatest(floor((col(valueCol) - lit(lo)) / lit(width)), lit(0.0)),
      lit((nBins - 1).toDouble)).cast("long")
    df.groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"),
        graft.util.Det.fixedSum(col(valueCol), 2).as("value_sum"))
      .withColumn("bin_lo", lit(lo) + col("bin").cast("double") * lit(width))
  }

  /** SQL twin of [[fixedWidthHistogram]] (DuckDB dialect). */
  def sqlFixedWidthHistogram(table: String, valueCol: String,
                             lo: Double, width: Double, nBins: Int): String =
    s"""SELECT
       |  CAST(least(greatest(floor(($valueCol - $lo) / $width), 0.0), ${nBins - 1}.0) AS BIGINT) AS bin,
       |  COUNT(*) AS n,
       |  ${graft.util.Det.sqlFixedSum(valueCol, 2)} AS value_sum,
       |  CAST($lo AS DOUBLE) + CAST(least(greatest(floor(($valueCol - $lo) / $width), 0.0), ${nBins - 1}.0) AS BIGINT) * CAST($width AS DOUBLE) AS bin_lo
       |FROM $table GROUP BY 1""".stripMargin

  /** Equi-depth bucketing: `ntile(n)` over a TOTAL order (pass a unique
    * tiebreak so bucket membership is deterministic). Returns the input
    * plus a `bucket` column in [1, n].
    *
    * Scale note: a global ntile is a single-partition sort — correct for
    * dimension-scale inputs. For fact-scale discretization use
    * [[boundariesFromSample]] + [[assignByBoundaries]].
    *
    * BOUND (runtime-enforced, r10): input under
    * [[graft.util.RowBound.DimensionScaleRows]] rows, guarded in-plan. */
  def equiDepthBuckets(df: DataFrame, n: Int, order: Seq[String]): DataFrame = {
    val w = Window.orderBy(order.map(col): _*)
    df.withColumn("bucket", graft.util.RowBound.guarded(
      ntile(n).over(w), w, graft.util.RowBound.DimensionScaleRows,
      "Binning.equiDepthBuckets"))
  }

  /** The fact-scale equi-depth path, pass 1: bucket BOUNDARIES from a
    * deterministic key-hash sample (the overflow-reduced Knuth
    * multiplicative hash [[DataSplit.stratifiedExact]] uses — unlike
    * xxhash64 it has an exact SQL twin, so the sample and therefore every
    * boundary is oracle-replicable and stable across runs). ntile sorts
    * only the sample; result is ONE row holding the n-1 upper bounds as a
    * sorted array.
    *
    * The ntile runs in ONE task (global order), so the sample must be
    * ROW-bounded, not fraction-bounded: boundary precision depends on the
    * ABSOLUTE sample size (quantile estimate error ~ 1/sqrt(rows)), not on
    * the sampled fraction, and a fixed 5% of a 100 TB table is 5 TB
    * through a single thread. The effective fraction is therefore
    * `min(fraction, maxSampleRows / count)` — one column-pruned count
    * (parquet answers it from row-group metadata), then the same hash
    * threshold. At fixture scale the cap never binds (15k rows * 5% = 750
    * << 1M), so the q_bin2 oracle's fixed-threshold SQL twin stays exact.
    * Hash granularity is 1e-6: below ~1e-6 effective fraction the
    * threshold floors at 1 (expected sample = count/1e6, still row-capped
    * within 1e-6 * count of the target). */
  def boundariesFromSample(df: DataFrame, valueCol: String, keyCol: String,
                           fraction: Double, n: Int,
                           maxSampleRows: Long = 1000000L): DataFrame = {
    require(fraction > 0 && fraction <= 1, s"fraction in (0,1], got $fraction")
    require(maxSampleRows > 0, s"maxSampleRows must be positive, got $maxSampleRows")
    val total = df.count()
    val eff =
      if (total == 0L) fraction
      else math.min(fraction, maxSampleRows.toDouble / total)
    val u = pmod(pmod(col(keyCol), lit(1000000L)) * lit(2654435761L), lit(1000000L))
    val sampled = df.where(u < lit(math.max(1L, (eff * 1e6).toLong)))
      .select(col(valueCol), col(keyCol))
    val w = Window.orderBy(col(valueCol), col(keyCol))
    // BOUND (runtime-enforced, r10): the ntile input is the hash sample,
    // expected ≤ maxSampleRows by the eff-fraction cap; the hash is
    // key-uniform, so 8x the cap is beyond any binomial tail — tripping
    // the guard means the sampler (not the data) broke.
    sampled.withColumn("__b", graft.util.RowBound.guarded(
        ntile(n).over(w), w, math.max(8L * maxSampleRows, 1024L),
        "Binning.boundariesFromSample"))
      .groupBy(col("__b")).agg(max(col(valueCol)).as("__hi"))
      .where(col("__b") < n) // top bucket is unbounded
      .agg(sort_array(collect_list(col("__hi"))).as("bounds"))
  }

  /** Winsorize: clip `valueCol` at sampled percentile bounds — the
    * standard outlier-taming feature transform (the clip-don't-drop
    * complement to `Anomaly.zScores`' flag-don't-touch). Adds
    * `<valueCol>_w` = value clipped into [p(loPct), p(hiPct)], where the
    * percentile estimates are ntile(100) bucket maxima from the same
    * row-capped deterministic hash sample as [[boundariesFromSample]] —
    * so the clip bounds are SQL-replicable (hash-exact oracle, q_anom2)
    * and the boundary pass is O(maxSampleRows) whatever the corpus size.
    * Clipping itself is comparisons only (no arithmetic): a broadcast of
    * ONE bounds row into the fact scan. A sample smaller than 100 rows
    * leaves some ntile buckets empty; a missing bound yields null and
    * least/greatest ignore nulls => that side degrades to no clipping. */
  def winsorize(df: DataFrame, valueCol: String, keyCol: String,
                loPct: Int, hiPct: Int, fraction: Double,
                maxSampleRows: Long = 1000000L): DataFrame = {
    require(1 <= loPct && loPct < hiPct && hiPct <= 99,
      s"need 1 <= loPct < hiPct <= 99, got ($loPct, $hiPct)")
    val bounds = boundariesFromSample(df, valueCol, keyCol, fraction, n = 100,
      maxSampleRows)
    df.crossJoin(broadcast(bounds))
      .withColumn(s"${valueCol}_w",
        least(greatest(col(valueCol), try_element_at(col("bounds"), lit(loPct))),
          try_element_at(col("bounds"), lit(hiPct))))
      .drop("bounds")
  }

  /** Pass 2: assign `bucket` = 1 + #bounds strictly below the value — a
    * broadcast of ONE row (the bounds array) crossed into the fact scan;
    * the filter-over-n-element-array lambda is interpreted but O(n) with
    * n = bucket count, so the assignment stays scan-speed. Ties sit in
    * the LOWER bucket (bound < value, mirrored by the SQL twin). */
  def assignByBoundaries(df: DataFrame, valueCol: String,
                         bounds: DataFrame): DataFrame =
    df.crossJoin(broadcast(bounds))
      .withColumn("bucket",
        (size(filter(col("bounds"), b => b < col(valueCol))) + lit(1)).cast("long"))
      .drop("bounds")

  /** Population stability index between two snapshots of a numeric
    * column — THE production drift gate for model/pipeline inputs
    * (PSI < 0.1 stable, 0.1–0.25 watch, > 0.25 investigate). Buckets are
    * the PREV snapshot's sampled equi-depth boundaries (the same
    * row-capped deterministic machinery as [[boundariesFromSample]] —
    * SQL-replicable), both snapshots are bucket-counted at scan speed,
    * and PSI = Σ_b (p_b − q_b)·ln(p_b/q_b) with add-one smoothing on the
    * counts (p=(c+1)/(N+n)) so an emptied bucket contributes large finite
    * drift, never ±∞. Per-bucket terms round ONCE to integer micro-nats
    * (the q_txt14 transcendental policy), the PSI rollup is an exact
    * BIGINT sum. Returns one row per bucket (counts + term) plus the
    * total `psi` on every row.
    *
    * Scale shape: one bounded boundary pass on prev, one scan-aggregate
    * per snapshot, then everything is n-buckets-sized.
    *
    * NULL values would land silently in bucket 1 (`b < null` is null, the
    * boundary filter drops it, size 0 ⇒ bucket 1) — masquerading as
    * low-end drift; both snapshots are null-filtered instead, so a null
    * RATE change shows up in the row counts, not as fake distribution
    * movement. Profile nulls with [[DataQuality.profile]]. */
  def psiReport(prev0: DataFrame, next0: DataFrame, valueCol: String,
                keyCol: String, fraction: Double, n: Int,
                maxSampleRows: Long = 1000000L): DataFrame = {
    val prev = prev0.where(col(valueCol).isNotNull)
    val next = next0.where(col(valueCol).isNotNull)
    val bounds = boundariesFromSample(prev, valueCol, keyCol, fraction, n,
      maxSampleRows)
    val pa = assignByBoundaries(prev, valueCol, bounds)
      .groupBy("bucket").agg(count(lit(1)).as("n_prev"))
    val pb = assignByBoundaries(next, valueCol, bounds)
      .groupBy("bucket").agg(count(lit(1)).as("n_next"))
    val buckets = prev.sparkSession.range(1, n + 1)
      .select(col("id").as("bucket"))
    val na = prev.agg(count(lit(1)).as("__na"))
    val nb = next.agg(count(lit(1)).as("__nb"))
    def share(cnt: Column, tot: Column) =
      (cnt + lit(1L)).cast("double") / (tot + lit(n.toLong)).cast("double")
    val withTerm = buckets
      .join(pa, Seq("bucket"), "left_outer")
      .join(pb, Seq("bucket"), "left_outer")
      .crossJoin(broadcast(na)).crossJoin(broadcast(nb))
      .select(col("bucket"),
        coalesce(col("n_prev"), lit(0L)).as("n_prev"),
        coalesce(col("n_next"), lit(0L)).as("n_next"),
        round((share(coalesce(col("n_next"), lit(0L)), col("__nb"))
            - share(coalesce(col("n_prev"), lit(0L)), col("__na")))
          * log(share(coalesce(col("n_next"), lit(0L)), col("__nb"))
              / share(coalesce(col("n_prev"), lit(0L)), col("__na")))
          * lit(1e6), 0).cast("long").as("term_micro"))
    val tot = withTerm.agg(sum(col("term_micro")).as("__psi_micro"))
    withTerm.crossJoin(broadcast(tot))
      .withColumn("psi", col("__psi_micro").cast("double") / lit(1e6))
      .drop("__psi_micro")
  }

  /** Exact weighted median per group: the smallest value whose cumulative
    * weight reaches HALF the group's total — lower weighted median,
    * decided by the integer comparison 2·cum >= total (no division, no
    * interpolation ⇒ the emitted value is an INPUT value, bit-identical
    * cross-engine; the robust center for weight-skewed distributions,
    * e.g. revenue-weighted price points).
    *
    * Shape: weights pre-aggregate onto distinct values first (the window
    * then runs over #distinct-values rows, not raw rows), one group
    * partitioning shared by the cumulative and total sums, one crossing
    * filter + min. `weightCol` must be a non-negative integer column;
    * zero-total groups emit nothing (no median of nothing). */
  /** Shared scaffold of the weighted-percentile family: weights
    * pre-aggregate onto DISTINCT values (the windows then run over
    * #values rows, never raw rows), then cumulative and total weight
    * sums share one group partitioning. `weightCol` must be a
    * non-negative integer column; zero-total groups are dropped. */
  private def cumWeights(df: DataFrame, groupCol: String, valueCol: String,
                         weightCol: String): DataFrame = {
    val perVal = df.groupBy(col(groupCol), col(valueCol))
      .agg(sum(col(weightCol).cast("long")).as("__w"))
    val ord = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(valueCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val all = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
    perVal.select(col(groupCol), col(valueCol),
        sum(col("__w")).over(ord).as("__cum"),
        sum(col("__w")).over(all).as("__tot"))
      .where(col("__tot") > 0)
  }

  /** Exact weighted quartiles per group in ONE aggregation: q_p = the
    * smallest value whose cumulative weight reaches p of the total,
    * decided integer-only (4·cum >= tot, 2·cum >= tot, 4·cum >= 3·tot —
    * no division, no interpolation: every emitted quartile is an INPUT
    * value, bit-identical cross-engine). The weighted box plot behind
    * weight-skewed distribution summaries. Zero-total groups emit
    * nothing. */
  def weightedQuartiles(df: DataFrame, groupCol: String, valueCol: String,
                        weightCol: String): DataFrame =
    cumWeights(df, groupCol, valueCol, weightCol)
      .groupBy(col(groupCol))
      .agg(
        min(when(col("__cum") * 4 >= col("__tot"), col(valueCol))).as("wq1"),
        min(when(col("__cum") * 2 >= col("__tot"), col(valueCol))).as("wmedian"),
        min(when(col("__cum") * 4 >= col("__tot") * 3, col(valueCol))).as("wq3"),
        max(col("__tot")).as("total_weight"))

  /** Exact weighted median per group — the p50 slice of
    * [[weightedQuartiles]] (same integer crossing rule, same scaffold,
    * the emitted value is an INPUT value), kept as its own entry point
    * for the common robust-center use. */
  def weightedMedian(df: DataFrame, groupCol: String, valueCol: String,
                     weightCol: String): DataFrame =
    weightedQuartiles(df, groupCol, valueCol, weightCol)
      .select(col(groupCol), col("wmedian").as("weighted_median"),
        col("total_weight"))
}
