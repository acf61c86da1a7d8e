package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch gap-based sessionization — the standard first transform over any
  * clickstream/event table (the reference's event-shaped data is the OHLCV
  * tick stream, `data_collection/dags/stock_data_airflow_local_aws_s3.py:36`;
  * a training-data pipeline needs the same cut for behavioral corpora).
  *
  * A session is a maximal run of one user's events where consecutive gaps
  * are <= `gapSeconds`. Classic two-window shape: `lag` marks session
  * starts, a running SUM numbers them — both windows share ONE partitioning
  * (`user`, ordered by time), so the whole operator costs exactly one
  * shuffle and one sort (two stacked Window nodes, no second Exchange —
  * the numbering window consumes the lag window's output, so they cannot
  * fuse into one node, but they reuse its clustering).
  *
  * Scale: sessions are user-local, so the only data movement is the hash
  * shuffle on `user` — skew is bounded by the hottest user (bot traffic);
  * cap upstream with [[Curation.capPerDomain]]-style limits if needed. The
  * streaming twin (true event-time sessions with timeout) is
  * `streaming/StreamOps.sessionize` (S-STRM6); this is its replayable
  * batch form, and the two agree on closed sessions.
  */
object Sessionize {

  /** Adds `session_seq` (1-based per user) and `is_session_start`.
    * Ordering is (ts, tiebreak...) — pass a unique tiebreak column so the
    * numbering is total and the result deterministic under ts ties. */
  def assignSessions(df: DataFrame, userCol: String, tsCol: String,
                     gapSeconds: Long, tiebreak: String*): DataFrame = {
    val ord = (col(tsCol) +: tiebreak.map(col)).toSeq
    val w = Window.partitionBy(userCol).orderBy(ord: _*)
    // Exact integer microseconds on both engines (unix_micros / epoch_us);
    // no double epoch arithmetic that could round differently.
    val us = unix_micros(col(tsCol))
    val prev = lag(us, 1).over(w)
    val isStart = prev.isNull || (us - prev > lit(gapSeconds * 1000000L))
    df.withColumn("is_session_start", isStart)
      .withColumn("session_seq",
        sum(col("is_session_start").cast("long")).over(w))
  }

  /** Per-session rollup: bounds, event count, exact value sum. The
    * aggregation keys (user, session_seq) have the window's partitioning
    * key as a subset, so Catalyst runs it in the SAME stage — the whole
    * rollup costs one shuffle end to end (PlanShapeSpec-asserted). */
  def sessionStats(df: DataFrame, userCol: String, tsCol: String,
                   gapSeconds: Long, valueCol: String,
                   tiebreak: String*): DataFrame =
    assignSessions(df, userCol, tsCol, gapSeconds, tiebreak: _*)
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        graft.util.Det.fixedSum(col(valueCol), 2).as("value_sum"))

  /** Distinct (user_id, wk) epoch-week activity pairs — the SUFFICIENT
    * STATISTIC for every engagement metric below: tiny next to raw
    * events, and countDistinct-insensitive to duplicate pairs (so
    * incremental stores can append without cross-batch dedup). */
  def userWeeks(events: DataFrame, userCol: String, tsCol: String): DataFrame =
    events.select(col(userCol).as("user_id"),
        floor(unix_timestamp(col(tsCol)).cast("double") / lit(604800.0))
          .cast("long").as("wk"))
      .distinct()

  /** WAU / trailing-4-week MAU / stickiness per epoch-week over a
    * [[userWeeks]]-shaped frame (q_sess4's core; see that query for the
    * fan-out design — framed COUNT(DISTINCT) exists in no engine, so each
    * pair supports its <= 4 target weeks via sequence-explode). Duplicate
    * (user_id, wk) input rows cannot change the result. */
  def engagementFromUserWeeks(uw: DataFrame): DataFrame = {
    val weeks = uw.select(col("wk").as("week")).distinct()
    val wau = uw.groupBy(col("wk").as("week"))
      .agg(countDistinct(col("user_id")).as("wau"))
    val mau = uw
      .select(col("user_id"), explode(sequence(col("wk"), col("wk") + 3)).as("week"))
      .join(broadcast(weeks), Seq("week"))
      .groupBy("week").agg(countDistinct(col("user_id")).as("mau"))
    wau.join(mau, Seq("week"))
      .select(col("week"), col("wau"), col("mau"),
        (col("wau").cast("double") / col("mau").cast("double")).as("stickiness"))
  }
}
