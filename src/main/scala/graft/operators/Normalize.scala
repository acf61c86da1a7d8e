package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group feature scaling — the last transform before numeric columns
  * feed a model: bring each group's values onto a common scale so one
  * entity's unit choice doesn't dominate the gradient. Two standard maps:
  * min-max to [0,1] and rank-based (percent_rank, robust to outliers the
  * way [[Anomaly.robustOutliers]] is — a single huge value squashes
  * min-max scaling but shifts ranks by one slot).
  *
  * Determinism: min/max are exact; (v − min)/(max − min) is one IEEE
  * division of exact integers when values are `scale`-dp scaled, emitted
  * raw (never re-rounded — the cross-engine rule). percent_rank is the
  * exact rational (rank−1)/(n−1) on a TOTAL order — callers must pass
  * tie-break columns to make the order total or ranks of tied rows are
  * still deterministic (rank ties share a value) but the ORDER contract
  * documents intent.
  *
  * Plan shape: both are ONE window over the group key (entire-partition
  * frame for min/max — no sort; ordered frame for ranks); sharing the
  * partitioning means applying both costs a single shuffle. Skew bounded
  * by the hottest group.
  */
object Normalize {

  /** Adds `asCol` = (v − group min)/(group max − group min) over
    * `scale`-dp integers; constant groups (max = min) get null rather
    * than a fabricated position. */
  def minMax(df: DataFrame, groupCol: String, valueCol: String, scale: Int,
             asCol: String): DataFrame = {
    val p10 = math.pow(10.0, scale)
    val w = Window.partitionBy(groupCol)
    val v = round(col(valueCol) * lit(p10)).cast("long")
    val lo = min(v).over(w).cast("double")
    val hi = max(v).over(w).cast("double")
    df.withColumn(asCol,
      when(hi > lo, (v.cast("double") - lo) / (hi - lo)))
  }

  /** Adds `asCol` = percent_rank of the row within its group under
    * `order` (make it total — end with a unique key). Exact rational;
    * single-row groups get 0.0 (Spark and ANSI SQL agree). */
  def percentRank(df: DataFrame, groupCol: String, order: Seq[Column],
                  asCol: String): DataFrame = {
    require(order.nonEmpty, "need an ordering; end it with a unique key")
    val w = Window.partitionBy(groupCol).orderBy(order: _*)
    df.withColumn(asCol, percent_rank().over(w))
  }
}
