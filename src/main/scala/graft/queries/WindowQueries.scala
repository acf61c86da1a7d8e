package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}
import graft.operators.Similarity
import graft.util.Det

/** Window functions and top-k (SURVEY.md §2.B Q-WIN1–5, Q-TOP1–2) — the
  * stock feature-engineering heart: returns, SMAs, rolling sums, running
  * extrema, rankings. Every orderBy inside a window carries a unique
  * tie-break key so results are deterministic (SURVEY.md §7.4.2); windowed
  * double sums use the exact fixed-point form (safe under DuckDB's
  * segment-tree re-association AND Spark's own retry reordering).
  */
object WindowQueries extends QueryModule {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q-WIN1: ranking family.
    "q_win1" -> ((s, d) => {
      val byStatus = Window.partitionBy("o_orderstatus")
      val unique = byStatus.orderBy(col("o_orderdate"), col("o_orderkey"))
      val byDate = byStatus.orderBy(col("o_orderdate"))
      Tables.load(s, d, "orders").select(
        col("o_orderkey"), col("o_orderstatus"),
        row_number().over(unique).cast("long").as("rn"),
        rank().over(byDate).cast("long").as("rnk"),
        dense_rank().over(byDate).cast("long").as("drnk"),
        ntile(4).over(unique).cast("long").as("nt"))
        .orderBy("o_orderstatus", "rn")
    }),

    // Q-WIN2: lag -> per-event "return" (the daily-return shape, ANA core).
    "q_win2" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.load(s, d, "events")
        .select(col("event_id"), col("user_id"), col("value"),
          lag(col("value"), 1).over(w).as("prev_value"))
        // nullif: sf0.1 contains zero-valued events, and ANSI mode raises
        // on double division by zero (null-returns is the finance
        // convention for a return off a zero base anyway)
        .withColumn("ret", col("value") / nullif(col("prev_value"), lit(0.0)) - lit(1))
        .orderBy("event_id")
    }),

    // Q-WIN3: 20-row SMA over each supplier's shipment timeline.
    "q_win3" -> ((s, d) => {
      // The in-window order must be TOTAL: (shipdate, orderkey, linenumber)
      // is not unique in the fixture, so extendedprice + quantity complete
      // the key (otherwise sliding-frame membership is tie-order-dependent).
      val w = Window.partitionBy("l_suppkey")
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"), col("l_quantity"))
        .rowsBetween(-19, Window.currentRow)
      Tables.load(s, d, "lineitem").select(
        col("l_suppkey"), col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"), col("l_quantity"),
        (Det.fixedSumOver(col("l_extendedprice"), 2, w) / count(lit(1)).over(w)).as("sma20"))
        .orderBy("l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber",
          "l_extendedprice", "l_quantity")
    }),

    // Q-WIN4: 7-day rolling sum via a RANGE frame on epoch seconds.
    "q_win4" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").cast("long"))
        .rangeBetween(-604800L, Window.currentRow)
      Tables.load(s, d, "orders").select(
        col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        Det.fixedSumOver(col("o_totalprice"), 2, w).as("rolling7d"))
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    }),

    // Q-WIN5: cumulative running max + drawdown-style delta.
    "q_win5" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.load(s, d, "orders").select(
        col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"),
        max(col("o_totalprice")).over(w).as("running_max"))
        .withColumn("drawdown", col("o_totalprice") - col("running_max"))
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    }),

    // Distribution window functions: percent_rank/cume_dist are exact
    // ratios of ints (deterministic); nth_value over a unique order.
    "q_win6" -> ((s, d) => {
      val unique = Window.partitionBy("o_orderstatus")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.load(s, d, "orders").select(
        col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        percent_rank().over(unique).as("pct_rank"),
        cume_dist().over(unique).as("cdist"),
        nth_value(col("o_totalprice"), 3).over(
          unique.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("third_price"))
        .orderBy("o_orderstatus", "o_totalprice", "o_orderkey")
    }),

    // Quantile binning: ntile deciles of order value within each status —
    // the feature-bucketing shape (per-group window, total order => exact).
    "q_win7" -> ((s, d) => {
      val w = Window.partitionBy("o_orderstatus")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.load(s, d, "orders").select(
        col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        ntile(10).over(w).cast("long").as("decile"))
        .orderBy("o_orderstatus", "o_totalprice", "o_orderkey")
    }),

    // U-UDF1: the one deliberate scalar `udf()` registration demo
    // (SURVEY.md §2.B U-UDF1) — same answer as q_win2, with the return
    // computed by a registered UDF instead of a Column expression. Kept as
    // the single example of the escape hatch, and as the measured reason
    // the rest of the repo avoids it: the UDF is an opaque non-codegen
    // black box (per-row boxing, breaks whole-stage fusion, no pushdown
    // through it), while q_win2's built-in form stays fused. Same IEEE op
    // sequence, so it still hash-matches the oracle.
    "q_udf1" -> ((s, d) => {
      val pctChange = udf((value: java.lang.Double, prev: java.lang.Double) =>
        if (value == null || prev == null || prev.doubleValue == 0.0) null
        else java.lang.Double.valueOf(value.doubleValue / prev.doubleValue - 1.0))
      s.udf.register("pct_change", pctChange)
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.load(s, d, "events")
        .select(col("event_id"), col("user_id"), col("value"),
          lag(col("value"), 1).over(w).as("prev_value"))
        .withColumn("ret", call_udf("pct_change", col("value"), col("prev_value")))
        .orderBy("event_id")
    }),

    // Q-TOP1: global top-k => TakeOrderedAndProject (plan-shape-tested).
    "q_top1" -> ((s, d) =>
      Tables.load(s, d, "orders").select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)),

    // Q-TOP2: per-group top-k => WindowGroupLimit in Spark 4.
    "q_top2" -> ((s, d) =>
      Similarity.topKPerGroup(Tables.load(s, d, "orders"), Seq("o_custkey"),
        Seq(col("o_totalprice").desc, col("o_orderkey").asc), 2)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")),
  )

  private val win3Frame =
    "(PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_extendedprice, l_quantity ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)"

  def oracleSql: Map[String, String] = Map(
    "q_win1" ->
      """SELECT o_orderkey, o_orderstatus,
        |  CAST(row_number() OVER (PARTITION BY o_orderstatus ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS rn,
        |  CAST(rank() OVER (PARTITION BY o_orderstatus ORDER BY o_orderdate) AS BIGINT) AS rnk,
        |  CAST(dense_rank() OVER (PARTITION BY o_orderstatus ORDER BY o_orderdate) AS BIGINT) AS drnk,
        |  CAST(ntile(4) OVER (PARTITION BY o_orderstatus ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS nt
        |FROM orders ORDER BY o_orderstatus, rn""".stripMargin,
    "q_win2" ->
      """SELECT event_id, user_id, value, prev_value, value / nullif(prev_value, 0.0) - 1 AS ret
        |FROM (SELECT event_id, user_id, value,
        |        lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
        |      FROM events)
        |ORDER BY event_id""".stripMargin,
    "q_win3" ->
      s"""SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber, l_extendedprice, l_quantity,
         |  ${Det.sqlFixedSumOver("l_extendedprice", 2, "w")} / COUNT(*) OVER w AS sma20
         |FROM lineitem WINDOW w AS $win3Frame
         |ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber, l_extendedprice, l_quantity""".stripMargin,
    "q_win4" ->
      s"""SELECT o_custkey, o_orderkey, o_orderdate,
         |  ${Det.sqlFixedSumOver("o_totalprice", 2,
              "(PARTITION BY o_custkey ORDER BY CAST(epoch(o_orderdate) AS BIGINT) RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)")} AS rolling7d
         |FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
    "q_win5" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  max(o_totalprice) OVER w AS running_max,
        |  o_totalprice - max(o_totalprice) OVER w AS drawdown
        |FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
    "q_win6" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cdist,
        |  nth_value(o_totalprice, 3) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS third_price
        |FROM orders WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderstatus, o_totalprice, o_orderkey""".stripMargin,
    "q_win7" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice,
        |  CAST(ntile(10) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS decile
        |FROM orders ORDER BY o_orderstatus, o_totalprice, o_orderkey""".stripMargin,
    "q_udf1" ->
      """SELECT event_id, user_id, value, prev_value, value / nullif(prev_value, 0.0) - 1 AS ret
        |FROM (SELECT event_id, user_id, value,
        |        lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
        |      FROM events)
        |ORDER BY event_id""".stripMargin,
    "q_top1" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q_top2" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |        row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |      FROM orders)
        |WHERE rn <= 2 ORDER BY o_custkey, rn""".stripMargin,
  )
}
