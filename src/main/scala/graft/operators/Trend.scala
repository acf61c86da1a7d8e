package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-key ordinary-least-squares trend — the direction-and-rate summary a
  * monitoring pipeline wants per entity (is this supplier's revenue
  * drifting up or down, and how fast?): one slope/intercept per key from
  * a single aggregation over (x, value) observations.
  *
  * Determinism: the five sufficient statistics (n, Σx, Σv, Σxv, Σx²) are
  * exact integer sums; the closed-form slope
  * (n·Σxv − Σx·Σv) / (n·Σx² − Σx·Σx) is then fixed IEEE double
  * arithmetic, textually mirrored by the SQL twin — hash-exact
  * cross-engine.
  *
  * Overflow discipline (same class as [[Anomaly.zScores]]'s v² fix): the
  * product sums accumulate in DECIMAL(38,0), because Spark's BIGINT sum
  * silently WRAPS in non-ANSI mode while DuckDB promotes to HUGEINT —
  * at 100 TB a revenue-scale Σxv crosses 2^63 long before anyone notices.
  * Each x·v term fits (29,0) by construction; a group sum that still
  * overflows (38,0) becomes NULL and flows to a null slope — degraded
  * visibly, never wrong.
  *
  * Plan shape: one hash aggregation on the key (map-side partials), no
  * window, no join; skew bounded by the hottest key's observation count.
  */
object Trend {

  /** Adds one row per key: n, slope, intercept of value (scaled to
    * `scale`-dp integers) over the integer regressor `xCol`. Keys whose
    * regressor is constant (n = 1, or all x equal — zero denominator)
    * get null slope/intercept rather than a fabricated trend. */
  def slopes(df: DataFrame, keyCol: String, xCol: Column, valueCol: String,
             scale: Int): DataFrame = {
    val p10 = math.pow(10.0, scale)
    val xd = xCol.cast("long").cast("decimal(19,0)")
    val vd = round(col(valueCol) * lit(p10)).cast("long").cast("decimal(19,0)")
    val agg = df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(xd).as("__sx"), sum(vd).as("__sy"),
        sum(xd * vd).as("__sxy"), sum(xd * xd).as("__sxx"),
        // EXACT degenerate-regressor detector: for large-magnitude x
        // (epoch-microsecond regressors, n·Σx² ≫ 2^53) a mathematically-
        // zero denominator can double-round to a tiny POSITIVE value, so
        // a denom>0 test alone would emit an enormous garbage slope —
        // and both engines would compute it identically, hiding it from
        // the hash-exact oracle. countDistinct is integer-exact.
        countDistinct(xd).as("__ndx"))
    val n = col("n").cast("double")
    val sx = col("__sx").cast("double")
    val sy = col("__sy").cast("double")
    val sxy = col("__sxy").cast("double")
    val sxx = col("__sxx").cast("double")
    val denom = n * sxx - sx * sx
    val slope = (n * sxy - sx * sy) / denom
    // denom>0 stays as a second guard: with ≥2 distinct x the true denom
    // is strictly positive (Cauchy–Schwarz), but catastrophic cancellation
    // can still round it to 0 — better null than ±Infinity.
    val ok = col("__ndx") > lit(1) && denom > lit(0.0)
    agg.withColumn("slope", when(ok, slope))
      .withColumn("intercept",
        when(ok, (sy - slope * sx) / n))
      .drop("__sx", "__sy", "__sxy", "__sxx", "__ndx")
  }

  /** DuckDB twin of [[slopes]]' arithmetic for regressor text `x` and
    * value text `v` (grouped context; same op order, same casts). DuckDB
    * SUM(BIGINT) is HUGEINT — exact like the decimal path — and both
    * engines cast the same integers to double before the IEEE formula. */
  def sql(x: String, v: String, scale: Int): (String, String, String) = {
    val p10 = "1" + "0" * scale
    val vi = s"CAST(round(($v)*$p10.0, 0) AS BIGINT)"
    val n = "CAST(COUNT(*) AS DOUBLE)"
    val sx = s"CAST(SUM($x) AS DOUBLE)"
    val sy = s"CAST(SUM($vi) AS DOUBLE)"
    val sxy = s"CAST(SUM(($x)*$vi) AS DOUBLE)"
    val sxx = s"CAST(SUM(($x)*($x)) AS DOUBLE)"
    val denom = s"($n*$sxx - $sx*$sx)"
    val slope = s"($n*$sxy - $sx*$sy) / $denom"
    // Same exact guard as the Spark side: COUNT(DISTINCT x) > 1 catches the
    // constant regressor even when the IEEE denom rounds to a tiny positive.
    val ok = s"(COUNT(DISTINCT $x) > 1 AND $denom > 0.0)"
    (s"CASE WHEN $ok THEN $slope END",
     s"CASE WHEN $ok THEN ($sy - ($slope)*$sx) / $n END",
     "COUNT(*)")
  }
}
