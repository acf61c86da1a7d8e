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
       |  $lo + CAST(least(greatest(floor(($valueCol - $lo) / $width), 0.0), ${nBins - 1}.0) AS BIGINT) * $width AS bin_lo
       |FROM $table GROUP BY 1""".stripMargin

  /** Equi-depth bucketing: `ntile(n)` over a TOTAL order (pass a unique
    * tiebreak so bucket membership is deterministic). Returns the input
    * plus a `bucket` column in [1, n].
    *
    * Scale note: a global ntile is a single-partition sort — correct for
    * dimension-scale inputs (this operator's intended use: deriving bucket
    * BOUNDARIES from a sample or an aggregate, then joining them back).
    * For fact-scale discretization, compute boundaries here on an
    * aggregate, then assign buckets with a broadcast range join — that
    * composition stays scan-speed. */
  def equiDepthBuckets(df: DataFrame, n: Int, order: Seq[String]): DataFrame = {
    val w = Window.orderBy(order.map(col): _*)
    df.withColumn("bucket", ntile(n).over(w))
  }
}
