package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}
import graft.streaming.StreamOps
import graft.util.Det.sqlFixedSum

/** Streaming operators, registered as their deterministic batch twins
  * (SURVEY.md §2.B Q-STRM1–3): the same column expressions run under
  * `readStream` (graft.streaming.StreamOps); watermark/stateful-dedup
  * behavior (S-STRM4/5) is streaming-only and covered by MemoryStream
  * unit tests.
  */
object StreamQueries extends QueryModule {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_strm1" -> ((s, d) =>
      StreamOps.tumblingHourly(Tables.load(s, d, "events")).orderBy("ws")),
    "q_strm2" -> ((s, d) =>
      StreamOps.slidingHourly(Tables.load(s, d, "events")).orderBy("ws")),
    "q_strm3" -> ((s, d) =>
      StreamOps.sessionized(Tables.load(s, d, "events"))
        .orderBy("user_id", "session_start")),
  )

  def oracleSql: Map[String, String] = Map(
    "q_strm1" ->
      s"""SELECT date_trunc('hour', ts) AS ws, COUNT(*) AS n_ev,
         |  ${sqlFixedSum("value", 2)} AS sum_value
         |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // Sliding windows expanded arithmetically: an event at t belongs to the
    // 4 slide-aligned starts in (t-1h, t]; integer µs arithmetic => exact.
    "q_strm2" ->
      """SELECT ws, COUNT(*) AS n_ev
        |FROM (SELECT ((epoch_us(ts) // 900000000) - t.k) * 900 AS ws
        |      FROM events CROSS JOIN range(4) AS t(k))
        |GROUP BY ws ORDER BY ws""".stripMargin,
    // Gaps-and-islands twin of session_window: same-session iff the gap to
    // the previous event is <= 30 min — Spark's boundary is INCLUSIVE
    // (verified by the MemoryStream boundary test, SURVEY.md §7.4.4).
    "q_strm3" ->
      s"""WITH g AS (
         |  SELECT user_id, ts, event_id, value,
         |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) <= INTERVAL 30 MINUTE
         |         THEN 0 ELSE 1 END AS new_s
         |  FROM events),
         |sess AS (
         |  SELECT user_id, ts, value,
         |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
         |  FROM g)
         |SELECT user_id, min(ts) AS session_start, COUNT(*) AS n_ev,
         |  ${sqlFixedSum("value", 2)} AS sum_value
         |FROM sess GROUP BY user_id, sid
         |ORDER BY user_id, session_start""".stripMargin,
  )
}
