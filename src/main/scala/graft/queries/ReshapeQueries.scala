package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}
import graft.operators.{TimeSeriesOps, Trend}
import graft.util.Det.sqlFixedSum

/** Reshaping + time-series regularization: pivot/unpivot and the
  * resample/gap-fill operators an OHLCV feature pipeline needs
  * (calendar-grid join + last-observation-carried-forward).
  */
object ReshapeQueries extends QueryModule {

  private val priorities =
    Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Pivot: order counts by status x priority. Missing combos are 0 on
    // both sides (Spark pivot yields null -> coalesce).
    "q_pivot1" -> ((s, d) =>
      Tables.load(s, d, "orders")
        .groupBy("o_orderstatus")
        .pivot("o_orderpriority", priorities)
        .count()
        .select(col("o_orderstatus") +:
          priorities.map(p => coalesce(col(s"`$p`"), lit(0L)).as(p)): _*)
        .orderBy("o_orderstatus")),

    // Unpivot: lineitem measures to long form.
    "q_unpivot1" -> ((s, d) =>
      Tables.load(s, d, "lineitem")
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          "measure", "value")
        .orderBy("l_orderkey", "l_linenumber", "measure", "value")),

    // Monthly resample with zero-fill: every (supplier, month) in the
    // supplier's span appears, gap months at 0.
    "q_ts1" -> ((s, d) =>
      TimeSeriesOps.resampleMonthlyZeroFill(
        Tables.load(s, d, "lineitem"), "l_suppkey", "l_shipdate", "l_extendedprice")
        .orderBy("l_suppkey", "month")),

    // Daily-grid LOCF: per-supplier daily revenue carried forward across
    // non-shipping days.
    "q_ts2" -> ((s, d) => {
      val daily = Tables.load(s, d, "lineitem")
        .groupBy(col("l_suppkey"), col("l_shipdate").cast("date").as("day"))
        .agg(graft.util.Det.fixedSum(col("l_extendedprice"), 2).as("v"))
      TimeSeriesOps.forwardFill(
        TimeSeriesOps.gridJoinDaily(daily, "l_suppkey", "day"),
        "l_suppkey", Seq(col("day")), "v", "v_filled")
        .select("l_suppkey", "day", "v_filled")
        .orderBy("l_suppkey", "day")
    }),

    // Q-TS3 (round 5): per-supplier revenue trend — OLS slope/intercept of
    // daily revenue (integer cents) over the day index, closed-form from
    // ONE aggregation of exact sufficient statistics (decimal accumulators;
    // a BIGINT Σxv wraps silently at warehouse scale). No window, no join;
    // constant-regressor keys get null slope, never a fabricated trend.
    "q_ts3" -> ((s, d) => {
      val daily = Tables.load(s, d, "lineitem")
        .groupBy(col("l_suppkey"), col("l_shipdate").cast("date").as("day"))
        .agg(sum(round(col("l_extendedprice") * lit(100.0)).cast("long"))
          .as("cents"))
      Trend.slopes(daily, "l_suppkey",
          datediff(col("day"), lit("1995-01-01")), "cents", scale = 0)
        .select("l_suppkey", "n", "slope", "intercept")
        .orderBy("l_suppkey")
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "q_pivot1" -> {
      val cols = priorities.map(p =>
        s"""COUNT(*) FILTER (WHERE o_orderpriority = '$p') AS "$p"""").mkString(",\n  ")
      s"""SELECT o_orderstatus,
         |  $cols
         |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
    },
    "q_unpivot1" ->
      """SELECT l_orderkey, l_linenumber, measure, value FROM (
        |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS value FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem)
        |ORDER BY l_orderkey, l_linenumber, measure, value""".stripMargin,
    "q_ts1" ->
      s"""WITH monthly AS (
         |  SELECT l_suppkey, CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
         |    ${sqlFixedSum("l_extendedprice", 2)} AS month_value
         |  FROM lineitem GROUP BY 1, 2),
         |spans AS (SELECT l_suppkey, min(month) AS lo, max(month) AS hi FROM monthly GROUP BY 1),
         |grid AS (SELECT l_suppkey,
         |           CAST(unnest(generate_series(CAST(lo AS TIMESTAMP), CAST(hi AS TIMESTAMP), INTERVAL 1 MONTH)) AS DATE) AS month
         |         FROM spans)
         |SELECT g.l_suppkey, g.month, coalesce(m.month_value, 0.0) AS month_value
         |FROM grid g LEFT JOIN monthly m ON m.l_suppkey = g.l_suppkey AND m.month = g.month
         |ORDER BY g.l_suppkey, g.month""".stripMargin,
    "q_ts2" ->
      s"""WITH daily AS (
         |  SELECT l_suppkey, CAST(l_shipdate AS DATE) AS day,
         |    ${sqlFixedSum("l_extendedprice", 2)} AS v
         |  FROM lineitem GROUP BY 1, 2),
         |spans AS (SELECT l_suppkey, min(day) AS lo, max(day) AS hi FROM daily GROUP BY 1),
         |grid AS (SELECT l_suppkey,
         |           CAST(unnest(generate_series(CAST(lo AS TIMESTAMP), CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
         |         FROM spans),
         |j AS (SELECT g.l_suppkey, g.day, d.v
         |      FROM grid g LEFT JOIN daily d ON d.l_suppkey = g.l_suppkey AND d.day = g.day),
         |g2 AS (SELECT l_suppkey, day, v,
         |         count(v) OVER (PARTITION BY l_suppkey ORDER BY day ROWS UNBOUNDED PRECEDING) AS grp
         |       FROM j)
         |SELECT l_suppkey, day, max(v) OVER (PARTITION BY l_suppkey, grp) AS v_filled
         |FROM g2 ORDER BY l_suppkey, day""".stripMargin,
    "q_ts3" -> {
      val (slope, intercept, n) = Trend.sql("x", "cents", scale = 0)
      s"""WITH daily AS (
         |  SELECT l_suppkey, CAST(l_shipdate AS DATE) AS day,
         |    SUM(CAST(round(l_extendedprice*100.0, 0) AS BIGINT)) AS cents
         |  FROM lineitem GROUP BY 1, 2),
         |obs AS (
         |  SELECT l_suppkey, date_diff('day', DATE '1995-01-01', day) AS x,
         |    cents
         |  FROM daily)
         |SELECT l_suppkey, $n AS n, $slope AS slope, $intercept AS intercept
         |FROM obs GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin
    },
  )
}
