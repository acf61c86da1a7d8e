package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.WindowSpec
import org.apache.spark.sql.functions._

/** Cross-engine determinism helpers.
  *
  * The driver hash-compares our DataFrame results against DuckDB running the
  * `oracleSql` text on the same parquet (SURVEY.md §5.2, §7.4). Floating sums
  * are order-dependent, and Spark's partial aggregation order differs from
  * DuckDB's sequential scan — so any oracle-checked SUM/AVG over doubles must
  * be exact. All money-ish fixture columns carry at most `scale` decimal
  * digits (verified against /root/testdata: prices 2dp, discounts 2dp,
  * quantities 0dp), so we sum exactly in scaled integer space (LONG) and
  * divide once at the end. `bigint/double` division is a single correctly
  * rounded IEEE op in both engines => bitwise-identical doubles.
  *
  * Every helper here has a one-line SQL twin (the `sql*` builders) so the
  * DataFrame expression and the oracle text can never drift apart.
  */
object Det {

  private def p10(scale: Int): String = "1" + ("0" * scale)

  /** Exact sum of a fixed-point double column: SUM(CAST(round(x*10^s) AS LONG)) / 10^s. */
  def fixedSum(c: Column, scale: Int = 2): Column =
    sum(round(c * lit(p10(scale).toDouble)).cast("long")) / lit(p10(scale).toDouble)

  /** SQL twin of [[fixedSum]] (DuckDB dialect, = ANSI). */
  def sqlFixedSum(x: String, scale: Int = 2): String =
    s"(SUM(CAST(round(($x)*${p10(scale)}.0,0) AS BIGINT))/${p10(scale)}.0)"

  /** Exact mean: fixedSum / COUNT(*). Division order mirrors [[sqlFixedAvg]]. */
  def fixedAvg(c: Column, scale: Int = 2): Column =
    fixedSum(c, scale) / count(lit(1))

  def sqlFixedAvg(x: String, scale: Int = 2): String =
    s"(${sqlFixedSum(x, scale)}/COUNT(*))"

  /** Windowed exact sum (safe under DuckDB's segment-tree window aggregation,
    * which re-associates double additions; integer addition is associative). */
  def fixedSumOver(c: Column, scale: Int, w: WindowSpec): Column =
    sum(round(c * lit(p10(scale).toDouble)).cast("long")).over(w) / lit(p10(scale).toDouble)

  def sqlFixedSumOver(x: String, scale: Int, windowText: String): String =
    s"(SUM(CAST(round(($x)*${p10(scale)}.0,0) AS BIGINT)) OVER $windowText/${p10(scale)}.0)"
}
