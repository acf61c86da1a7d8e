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

    // Batch twin of the stream-stream interval join (StreamOps
    // .streamStreamJoin): even-id events joined to odd-id events of the
    // same user within [ts, ts + 30 min]. The watermarks inside the
    // operator bound streaming state; batch execution eliminates them,
    // so the twin is oracle-checkable while the MemoryStream spec covers
    // the streaming path.
    "q_sjoin1" -> ((s, d) => {
      val e = Tables.load(s, d, "events")
      StreamOps.streamStreamJoin(
          e.where(col("event_id") % 2 === 0),
          e.where(col("event_id") % 2 === 1))
        .orderBy("left_id", "right_id")
    }),

    // Ordered conversion funnel over the event log: users reaching
    // view -> click (after their first view) -> purchase (after that
    // click). All stage times are windows over ONE user-hash shuffle —
    // no per-stage self-join of the log.
    "q_funnel1" -> ((s, d) =>
      graft.operators.Funnel.funnelCounts(Tables.load(s, d, "events"),
        "user_id", "event_type", "ts", Seq("view", "click", "purchase"))),

    // Batch shadow of the incremental daily-update merge (IncrementalUpdate
    // .upsert, the foreachBatch kernel): updated keys replace stored rows,
    // new keys insert, untouched rows pass through. Oracle-checked.
    "q_merge1" -> ((s, d) => {
      val orders = Tables.load(s, d, "orders")
        .select("o_orderkey", "o_orderdate", "o_totalprice")
      val store = orders.where(col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
      val updates = orders.where(col("o_orderkey") % 7 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + lit(1.0))
      graft.streaming.IncrementalUpdate.upsert(store, updates, Seq("o_orderkey"))
        .orderBy("o_orderkey")
    }),
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
    "q_sjoin1" ->
      """WITH l AS (SELECT * FROM events WHERE event_id % 2 = 0),
        |r AS (SELECT * FROM events WHERE event_id % 2 = 1)
        |SELECT l.event_id AS left_id, r.event_id AS right_id,
        |  l.user_id AS user_id, l.ts AS left_ts, r.ts AS right_ts
        |FROM l JOIN r ON l.user_id = r.user_id
        |  AND r.ts BETWEEN l.ts AND l.ts + INTERVAL 30 MINUTE
        |ORDER BY left_id, right_id""".stripMargin,
    "q_funnel1" ->
      """WITH t0 AS (SELECT user_id, min(ts) AS t FROM events
        |            WHERE event_type = 'view' GROUP BY user_id),
        |t1 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
        |       JOIN t0 ON e.user_id = t0.user_id AND e.ts > t0.t
        |       WHERE e.event_type = 'click' GROUP BY e.user_id),
        |t2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
        |       JOIN t1 ON e.user_id = t1.user_id AND e.ts > t1.t
        |       WHERE e.event_type = 'purchase' GROUP BY e.user_id)
        |SELECT (SELECT COUNT(*) FROM t0) AS n_view,
        |       (SELECT COUNT(*) FROM t1) AS n_click,
        |       (SELECT COUNT(*) FROM t2) AS n_purchase""".stripMargin,
    "q_merge1" ->
      """WITH store AS (
        |  SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
        |  WHERE o_orderdate < TIMESTAMP '1996-01-01'),
        |upd AS (
        |  SELECT o_orderkey, o_orderdate, o_totalprice + 1.0 AS o_totalprice
        |  FROM orders WHERE o_orderkey % 7 = 0),
        |u AS (SELECT *, 0 AS src FROM upd UNION ALL SELECT *, 1 AS src FROM store)
        |SELECT o_orderkey, o_orderdate, o_totalprice
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY src) AS rn FROM u)
        |WHERE rn = 1 ORDER BY o_orderkey""".stripMargin,
  )
}
