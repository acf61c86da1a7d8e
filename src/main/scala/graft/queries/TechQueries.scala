package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}
import graft.operators.TechnicalIndicators

/** Technical-indicator queries (the [ANA] stock feature surface): Bollinger
  * bands and RSI with exact integer-cent numerics (oracle-checked, no
  * rounding), EMA via the recursive per-key streaming pass — oracle-checked
  * against a RECURSIVE CTE that replays the identical IEEE recurrence
  * (0.2*x + 0.8*prev; 1-0.2 == the 0.8 literal bit-for-bit) row by row.
  */
object TechQueries extends QueryModule {

  // q_win3's total in-window order over the non-unique lineitem keys.
  private val ordCols = Seq("l_shipdate", "l_orderkey", "l_linenumber",
    "l_extendedprice", "l_quantity")
  private val byNameOrd = ordCols.map(col)
  private val w = Window.partitionBy("l_suppkey").orderBy(byNameOrd: _*)
  private val w20 = w.rowsBetween(-19, Window.currentRow)
  private val w14 = w.rowsBetween(-13, Window.currentRow)
  private val winSql =
    "(PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_extendedprice, l_quantity)"
  private val win20Sql = winSql.dropRight(1) +
    " ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)"
  private val win14Sql = winSql.dropRight(1) +
    " ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)"
  private def outOrder(df: DataFrame): DataFrame =
    df.orderBy((col("l_suppkey") +: byNameOrd): _*)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Bollinger bands: 20-row mean +/- 2 sd from exact cent sums.
    "q_ta1" -> ((s, d) => {
      val (mean, sd) = TechnicalIndicators.meanSd(col("l_extendedprice"), w20)
      outOrder(Tables.load(s, d, "lineitem").select(
        (col("l_suppkey") +: byNameOrd) :+
          mean.as("sma20") :+ sd.as("sd20") :+
          (mean + lit(2.0) * sd).as("bb_upper") :+
          (mean - lit(2.0) * sd).as("bb_lower"): _*))
    }),

    // RSI(14) over each supplier's shipment series.
    "q_ta2" -> ((s, d) =>
      outOrder(Tables.load(s, d, "lineitem").select(
        (col("l_suppkey") +: byNameOrd) :+
          TechnicalIndicators.rsi(col("l_extendedprice"), w, w14).as("rsi14"): _*))),

    // EMA(alpha=0.2) of per-supplier daily revenue — recursive streaming
    // pass; oracle = recursive CTE stepping the same recurrence.
    "q_ta3" -> ((s, d) => {
      val daily = Tables.load(s, d, "lineitem")
        .groupBy(col("l_suppkey"), col("l_shipdate").cast("date").as("day"))
        .agg(graft.util.Det.fixedSum(col("l_extendedprice"), 2).as("revenue"))
        .withColumn("day_ord",
          datediff(col("day"), lit("1970-01-01").cast("date")).cast("long"))
      TechnicalIndicators.ema(daily, "l_suppkey", "day_ord", "revenue", alpha = 0.2)
        .withColumn("ema", round(col("ema"), 6))
        .orderBy("l_suppkey", "day_ord")
    }),
  )

  def oracleSql: Map[String, String] = {
    val (meanSql, sdSql) = TechnicalIndicators.sqlMeanSd("l_extendedprice", "w")
    Map(
      "q_ta1" ->
        s"""SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber, l_extendedprice, l_quantity,
           |  $meanSql AS sma20,
           |  $sdSql AS sd20,
           |  $meanSql + 2.0 * $sdSql AS bb_upper,
           |  $meanSql - 2.0 * $sdSql AS bb_lower
           |FROM lineitem WINDOW w AS $win20Sql
           |ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber, l_extendedprice, l_quantity""".stripMargin,
      "q_ta2" ->
        s"""WITH c AS (
           |  SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber, l_extendedprice, l_quantity,
           |    CAST(round(l_extendedprice*100.0, 0) AS BIGINT) AS cents
           |  FROM lineitem),
           |d AS (
           |  SELECT *, cents - lag(cents, 1) OVER $winSql AS diff FROM c),
           |g AS (
           |  SELECT *,
           |    CASE WHEN diff > 0 THEN diff ELSE 0 END AS gain,
           |    CASE WHEN diff < 0 THEN -diff ELSE 0 END AS loss
           |  FROM d),
           |a AS (
           |  SELECT *,
           |    CAST(SUM(gain) OVER f AS DOUBLE) / COUNT(*) OVER f AS avg_gain,
           |    CAST(SUM(loss) OVER f AS DOUBLE) / COUNT(*) OVER f AS avg_loss
           |  FROM g WINDOW f AS $win14Sql)
           |SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber, l_extendedprice, l_quantity,
           |  CASE WHEN avg_loss = 0.0 THEN 100.0
           |       ELSE 100.0 - 100.0 / (1.0 + avg_gain / avg_loss) END AS rsi14
           |FROM a
           |ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber, l_extendedprice, l_quantity""".stripMargin,
      // Recursion joins each level's frontier (one row per supplier) back
      // to the ranked daily table — exactly the operator's per-key scan,
      // so every step's 0.2*x + 0.8*prev is the same IEEE op sequence.
      "q_ta3" ->
        """WITH RECURSIVE daily AS (
          |  SELECT l_suppkey, CAST(l_shipdate AS DATE) AS day,
          |    (SUM(CAST(round(l_extendedprice*100.0,0) AS BIGINT))/100.0) AS revenue
          |  FROM lineitem GROUP BY 1, 2),
          |d AS (
          |  SELECT l_suppkey, date_diff('day', DATE '1970-01-01', day) AS day_ord, revenue,
          |    row_number() OVER (PARTITION BY l_suppkey ORDER BY day) AS rn
          |  FROM daily),
          |r AS (
          |  SELECT l_suppkey, day_ord, revenue, rn, revenue AS ema FROM d WHERE rn = 1
          |  UNION ALL
          |  SELECT d.l_suppkey, d.day_ord, d.revenue, d.rn, 0.2*d.revenue + 0.8*r.ema
          |  FROM d JOIN r ON d.l_suppkey = r.l_suppkey AND d.rn = r.rn + 1)
          |SELECT l_suppkey, day_ord, revenue, round(ema, 6) AS ema
          |FROM r ORDER BY l_suppkey, day_ord""".stripMargin,
    )
  }
}
