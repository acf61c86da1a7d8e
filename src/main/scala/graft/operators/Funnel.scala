package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis (view -> click -> purchase): how many users
  * reach each stage, where stage i+1 only counts events STRICTLY AFTER
  * the user's first stage-i time (the product-analytics conversion
  * definition — a purchase before the first view is not a conversion).
  *
  * Scale shape: every stage time is a conditional `min` window over the
  * SAME `partitionBy(user)` spec, so Catalyst chains all stages behind
  * ONE hash shuffle of the events — no per-stage self-joins of the event
  * log (the naive formulation shuffles the log once per stage). The final
  * per-user reduction and global count are map-side-combined aggregates
  * over one row per user. */
object Funnel {

  /** One row with `n_<stage>` user counts, one column per stage in order.
    * A user is counted at stage i iff they completed stages 0..i in
    * strict event-time order. */
  def funnelCounts(events: DataFrame, userCol: String, typeCol: String,
                   tsCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val w = Window.partitionBy(userCol)
    val withStageTimes = stages.zipWithIndex.foldLeft(
      events.select(col(userCol), col(typeCol), col(tsCol))) {
      case (df, (stage, i)) =>
        val hit =
          if (i == 0) col(typeCol) === stage
          else col(typeCol) === stage && col(tsCol) > col(s"__t${i - 1}")
        df.withColumn(s"__t$i", min(when(hit, col(tsCol))).over(w))
    }
    // stage times are constant per user; max() just reads the value
    val perUser = withStageTimes.groupBy(userCol)
      .agg(max(s"__t0").as("__t0"),
        stages.indices.drop(1).map(i => max(s"__t$i").as(s"__t$i")): _*)
    val counts = stages.zipWithIndex.map { case (stage, i) =>
      count(col(s"__t$i")).as(s"n_$stage")
    }
    perUser.agg(counts.head, counts.tail: _*)
  }
}
