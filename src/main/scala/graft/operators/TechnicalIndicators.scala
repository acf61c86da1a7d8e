package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Output row of [[TechnicalIndicators.ema]]. Top-level (not nested in the
  * object) so the generated `UnsafeProjection` serializer can reference it:
  * Janino cannot resolve inner-class methods like
  * `TechnicalIndicators$EmaRow.key()` and falls back to interpreted
  * projection on every row when the class is nested. */
case class EmaRow(key: Long, ord: Long, value: Double, ema: Double)

/** Technical indicators over per-key price series — the feature
  * engineering the reference's partitioned OHLCV layout exists to feed
  * (SURVEY.md §2.B [ANA]; `README.md:46`).
  *
  * Numerics: windowed mean/variance are computed from EXACT integer-cent
  * window sums (sum, sum-of-squares, count are exact longs; the final
  * double formula is the same op sequence on both engines), so Bollinger
  * and RSI are bit-deterministic and DuckDB-oracle-checkable with no
  * rounding. EMA is genuinely recursive — no window built-in exists — so
  * it runs as a per-key streaming pass after repartition +
  * sortWithinPartitions: one shuffle, constant memory per series, the
  * scalable shape for recursive state at 100 TB.
  */
object TechnicalIndicators {

  /** Exact windowed mean/stddev of a 2dp column over `w`, as
    * (mean, sd) columns built from integer-cent sums. `sd` uses the
    * sample variance with a >=0 clamp (fp can dip epsilon-negative). */
  def meanSd(c: Column, w: WindowSpec): (Column, Column) = {
    val cents = round(c * 100.0).cast("long")
    val s = sum(cents).over(w).cast("double")
    val sq = sum(cents * cents).over(w).cast("double")
    val n = count(lit(1)).over(w).cast("double")
    val mean = s / n / 100.0
    // n=1 => sample variance undefined AND (n-1)=0 would trip ANSI's
    // divide-by-zero (which applies to doubles too) — guard to 0.
    val varCents2 = when(n > 1.0,
      greatest((sq - s * s / n) / (n - lit(1.0)), lit(0.0))).otherwise(lit(0.0))
    val sd = sqrt(varCents2) / 100.0
    (mean, sd)
  }

  /** SQL twin of [[meanSd]] — keep the op sequence in lockstep. */
  def sqlMeanSd(x: String, windowText: String): (String, String) = {
    val s = s"CAST(SUM(CAST(round(($x)*100.0,0) AS BIGINT)) OVER $windowText AS DOUBLE)"
    val sq = s"CAST(SUM(CAST(round(($x)*100.0,0) AS BIGINT)*CAST(round(($x)*100.0,0) AS BIGINT)) OVER $windowText AS DOUBLE)"
    val n = s"CAST(COUNT(*) OVER $windowText AS DOUBLE)"
    (s"$s / $n / 100.0",
      s"sqrt(CASE WHEN $n > 1.0 THEN greatest(($sq - $s * $s / $n) / ($n - 1.0), 0.0) ELSE 0.0 END) / 100.0")
  }

  /** Relative Strength Index over `period` rows: exact cent gains/losses,
    * explicit zero-loss guard (RSI=100) so no engine-specific inf/NaN. */
  def rsi(valueCol: Column, w: WindowSpec, frame: WindowSpec): Column = {
    val cents = round(valueCol * 100.0).cast("long")
    val diff = cents - lag(cents, 1).over(w)
    val gain = when(diff > 0, diff).otherwise(0L)
    val loss = when(diff < 0, -diff).otherwise(0L)
    val avgGain = sum(gain).over(frame).cast("double") / count(lit(1)).over(frame)
    val avgLoss = sum(loss).over(frame).cast("double") / count(lit(1)).over(frame)
    when(avgLoss === 0.0, lit(100.0))
      .otherwise(lit(100.0) - lit(100.0) / (lit(1.0) + avgGain / avgLoss))
  }

  /** Exponential moving average per key: recursive
    * ema_t = alpha*x_t + (1-alpha)*ema_{t-1}, seeded with the first value.
    * Implemented as repartition(key) + sortWithinPartitions + one
    * streaming pass per partition (keys are contiguous after the sort, so
    * state is a single (key, ema) pair at a time). */
  def ema(df: DataFrame, keyCol: String, ordCol: String, valueCol: String,
          alpha: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val prepared = df.select(
      col(keyCol).cast("long").as("key"),
      col(ordCol).cast("long").as("ord"),
      col(valueCol).cast("double").as("value"))
      .repartition(col("key"))
      .sortWithinPartitions(col("key"), col("ord"))
    prepared.as[(Long, Long, Double)].mapPartitions { it =>
      var curKey = Long.MinValue
      var curEma = 0.0
      it.map { case (k, o, v) =>
        curEma = if (k != curKey) v else alpha * v + (1 - alpha) * curEma
        curKey = k
        EmaRow(k, o, v, curEma)
      }
    }(Encoders.product[EmaRow])
      .toDF("key", "ord", "value", "ema")
      .withColumnRenamed("key", keyCol)
      .withColumnRenamed("ord", ordCol)
      .withColumnRenamed("value", valueCol)
  }

  /** In-memory reference EMA for tests. */
  def emaReference(values: Seq[Double], alpha: Double): Seq[Double] =
    values.tail.scanLeft(values.head)((prev, x) => alpha * x + (1 - alpha) * prev)
}
