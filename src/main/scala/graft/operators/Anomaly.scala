package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group z-score outlier flagging — the numeric twin of the text
  * quality gate: drop (or mark) fact rows that sit far from their group's
  * distribution before they poison a training set or a dashboard.
  *
  * Determinism: the group mean/std come from exact BIGINT sufficient
  * statistics (scaled-integer sum and sum-of-squares — order-independent),
  * and the final z expression is fixed IEEE double arithmetic mirrored
  * textually by [[sqlZScores]]. One shuffle (the group window); no second
  * pass, no driver-side stats.
  */
object Anomaly {

  /** Adds `z` (population z-score of `valueCol` within `groupCol`, from
    * exact `scale`-dp sums) and `is_outlier` (|z| > threshold). Groups
    * with zero variance get z = null (never flagged).
    *
    * The v² statistic accumulates in DECIMAL(38,0), not BIGINT: Spark's
    * BIGINT sum silently WRAPS on overflow (non-ANSI mode) while the
    * DuckDB twin promotes SUM(BIGINT) to HUGEINT — so for |value|·10^scale
    * above ~3e9 the two engines would diverge silently. Each v² term fits
    * (38,0) exactly ((9.2e18)² ≈ 8.5e37 < 1e38); a group SUM that still
    * overflows (38,0) — needs n·v̄² > 1e38 — becomes NULL, which flows to
    * z = null / is_outlier = false: degraded VISIBLY, never wrong. Within
    * decimal range the sum is exact on both engines and both cast the
    * same integer to double, so z stays hash-exact cross-engine. */
  def zScores(df: DataFrame, groupCol: String, valueCol: String,
              scale: Int, threshold: Double): DataFrame = {
    val p10 = math.pow(10.0, scale)
    val w = Window.partitionBy(groupCol)
    val v = round(col(valueCol) * lit(p10)).cast("long")
    val vd = v.cast("decimal(19,0)")
    val n = count(lit(1)).over(w).cast("double")
    val sx = sum(vd).over(w).cast("double") // decimal(29,0): exact to 1e29
    val sxx = sum(vd * vd).over(w).cast("double")
    val varPop = (sxx - sx * sx / n) / n
    val z = (v.cast("double") - sx / n) / sqrt(varPop)
    df.withColumn("z", when(varPop > lit(0.0), z))
      .withColumn("is_outlier", coalesce(abs(col("z")) > lit(threshold), lit(false)))
  }

  /** Median/MAD robust outlier flags — the robust companion to [[zScores]]:
    * a z-score gate fails exactly when it matters most (a heavy outlier
    * inflates the group sigma and hides itself); the median and the median
    * absolute deviation have a 50% breakdown point, so the flag survives
    * arbitrarily bad contamination of up to half the group.
    *
    * Adds `med`, `mad`, `robust_z` (= |v−med|/mad, null when mad = 0) and
    * `is_outlier` (|v−med| > k·mad; zero-MAD groups — over half the group
    * identical — never flag, mirroring zScores' zero-variance convention).
    *
    * Determinism: values are scaled to `scale`-dp integers, so every
    * median is either an integer or an exact .5 midpoint, every deviation
    * a multiple of 0.25 — all exact in IEEE doubles far below 2^53, and
    * the interpolated percentile at 0.5 computes identically in Spark and
    * DuckDB. Hash-exact cross-engine.
    *
    * Plan shape: TWO entire-partition window aggregates over the SAME
    * partitioning — one exchange, each aggregate evaluated once per
    * group. Exact percentile buffers a group's values in executor memory
    * (inherently non-mergeable): right when the group is dimension-keyed
    * (bounded rows per supplier/day); for unbounded groups use the GK
    * sketch path (SketchOps.gkQuantiles, q_agg13) instead. */
  def robustOutliers(df: DataFrame, groupCol: String, valueCol: String,
                     scale: Int, k: Double): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val p10 = math.pow(10.0, scale)
    val w = Window.partitionBy(groupCol)
    val v = round(col(valueCol) * lit(p10)).cast("long")
    val dev = abs(v.cast("double") - col("med"))
    df.withColumn("med", percentile(v, lit(0.5)).over(w))
      .withColumn("mad", percentile(dev, lit(0.5)).over(w))
      .withColumn("robust_z", when(col("mad") > lit(0.0), dev / col("mad")))
      .withColumn("is_outlier",
        coalesce(when(col("mad") > lit(0.0), dev > lit(k) * col("mad")),
          lit(false)))
  }

  /** DuckDB twin of [[zScores]]'s arithmetic for a value expression `x`
    * over window text `w` (same op order, same casts). */
  def sqlZScores(x: String, scale: Int, threshold: Double, w: String): (String, String) = {
    val p10 = "1" + "0" * scale
    val v = s"CAST(round(($x)*$p10.0, 0) AS BIGINT)"
    val n = s"CAST(COUNT(*) OVER $w AS DOUBLE)"
    val sx = s"CAST(SUM($v) OVER $w AS DOUBLE)"
    val sxx = s"CAST(SUM($v*$v) OVER $w AS DOUBLE)"
    val varPop = s"(($sxx - $sx*$sx/$n) / $n)"
    val z = s"CASE WHEN $varPop > 0.0 THEN (CAST($v AS DOUBLE) - $sx/$n) / sqrt($varPop) END"
    (z, s"coalesce(abs($z) > $threshold, false)")
  }
}
