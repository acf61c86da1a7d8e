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
