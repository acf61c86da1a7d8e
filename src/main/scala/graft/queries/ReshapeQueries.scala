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

    // Q-TS4 (round 7): autocorrelation at lags 1..3 of each supplier's
    // monthly revenue (zero-filled integer-cents series) — the
    // periodicity diagnostic before choosing feature windows. Exact
    // integer numerator/denominator (multiplied through by n²); the final
    // quotient is rounded to 6dp for the compare (the q_agg9 convention:
    // DuckDB's HUGEINT→DOUBLE conversion can differ from the JVM's
    // decimal→double by 1 ulp, observed on this very query).
    "q_ts4" -> ((s, d) =>
      TimeSeriesOps.acf(monthlyCentsFilled(s, d), "l_suppkey", "month",
          "cents", maxLag = AcfMaxLag)
        .withColumn("acf", round(col("acf"), 6))
        .orderBy("l_suppkey", "lag")),

    // Q-TS5 (round 7): change-point detection — per-supplier arg-max
    // |mean shift| between the 14 days before and after each grid day
    // (both windows full). All-integer => hash-exact.
    "q_ts5" -> ((s, d) =>
      TimeSeriesOps.meanShiftChangepoint(dailyCentsFilled(s, d),
          "l_suppkey", "day", "cents", w = ShiftW)
        .orderBy("l_suppkey")),

    // Q-TS7 (round 7): seasonal-naive forecast backtest — the baseline
    // every forecasting effort must beat: x̂_t = x_{t-7} on the daily
    // grid; per supplier the MAE (Σ|err| / n — ONE division of exact
    // integers) and the signed bias. Mean-of-quotients metrics (MAPE)
    // are deliberately out: summing per-row double quotients is
    // order-dependent across engines. One lag on the grid partitioning.
    "q_ts7" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("l_suppkey").orderBy("day")
      dailyCentsFilled(s, d)
        .withColumn("__pred", lag(col("cents"), 7).over(w))
        .where(col("__pred").isNotNull)
        .withColumn("__err", col("cents") - col("__pred"))
        .groupBy("l_suppkey")
        .agg(count(lit(1)).as("n"),
          (sum(abs(col("__err"))).cast("double") /
            count(lit(1)).cast("double")).as("mae_cents"),
          (sum(col("__err")).cast("double") /
            count(lit(1)).cast("double")).as("bias_cents"))
        .orderBy("l_suppkey")
    }),

    // Q-TS8 (round 9): Holt double-exponential smoothing (level + trend)
    // with the 7-day-ahead forecast — the actual forecasting primitive
    // the reference's prediction purpose calls for, one step past the
    // q_ts7 seasonal-naive baseline and the q_ta3 level-only EMA. Both
    // recurrences run in EXACT integer micro-units (the emaMicro
    // discipline — no IEEE result enters state; trend goes negative on
    // falling series, rhaDiv carries both signs); forecast = level +
    // 7·trend is a pure integer add. α = 1/5, β = 1/10. Oracle = a
    // recursive CTE stepping the identical coupled integer recurrences.
    "q_ts8" -> ((s, d) => {
      graft.operators.TechnicalIndicators.holtMicro(
          Shared.supplierDailyCents(s, d), "l_suppkey", "day_ord", "cents",
          unitsScale = 2, alphaNum = 1, alphaDen = 5,
          betaNum = 1, betaDen = 10)
        .withColumn("forecast7_micro",
          col("level_micro") + lit(7L) * col("trend_micro"))
        .orderBy("l_suppkey", "day_ord")
    }),

    // Q-ANOM5 (round 9): Page CUSUM change-point detection over the
    // exact clipped-micro return series — fires on a SUSTAINED mean
    // shift, the blind spot of the per-point z-score gates (q_anom1/4):
    // s⁺ = max(0, s⁺ + x − k) / s⁻ = min(0, s⁻ + x + k) with the
    // textbook post-alarm reset; k = 0 (no drift allowance), h = 2e6.
    // The threshold is asymmetry-aware BY NECESSITY: a positive series
    // bounds every down-move at −1e6 micro (−100%), so a reachable h
    // must sit within a few crash-days' sum — at these params the
    // fixture fires 10.6k up / 85 down alarms (both branches live, the
    // de-vacuuming rule). Pure integer recurrence (the emaMicro
    // discipline), serial per key; oracle = recursive CTE carrying the
    // pre-reset emissions and post-reset state separately.
    "q_anom5" -> ((s, d) => {
      graft.operators.TechnicalIndicators.cusumMicro(
          Shared.supplierReturns(s, d), "l_suppkey", "day_ord", "x",
          kMicro = 0L, hMicro = 2000000L)
        .orderBy("l_suppkey", "day_ord")
    }),

    // Q-ANOM4 (round 7): seasonality-aware anomaly gate — z-scoring raw
    // daily revenue (q_anom1) flags every Monday of a weekly-cyclic
    // series; here the SCALED-INTEGER detrended value d = 7x − T is
    // z-scored within its (supplier, ISO-weekday) cohort, so only days
    // abnormal FOR THAT WEEKDAY fire. Integer sufficient statistics (the
    // q_anom1 discipline — z-scoring the double residual would put
    // order-dependent float sums in the aggregate), raw IEEE z.
    "q_anom4" -> ((s, d) => {
      val det = TimeSeriesOps.detrendedDaily(dailyCentsFilled(s, d),
          "l_suppkey", "day", "cents", halfWindow = SeasonHalfW)
        .select(col("l_suppkey"), col("day"), col("__d").as("d"),
          (col("l_suppkey") * 10 + col("__dow")).as("grp"))
      graft.operators.Anomaly.zScores(det, "grp", "d",
          scale = 0, threshold = 3.0)
        .select("l_suppkey", "day", "d", "z", "is_outlier")
        .orderBy("l_suppkey", "day")
    }),

    // Q-TS6 (round 7, hardened round 8): additive seasonal decomposition
    // of daily revenue — 7-day centered-MA trend, ISO-weekday seasonal
    // mean of the scaled detrended series. Seasonal and residual are
    // exact integer micro-units (integer round-half-away division from
    // integer sufficient statistics — the r7 driver gate proved the
    // 6dp-rounded double chain flips on a 1-ulp engine difference);
    // trend stays T/7, a single exact-operand IEEE division.
    "q_ts6" -> ((s, d) =>
      TimeSeriesOps.seasonalDecompose(dailyCentsFilled(s, d),
          "l_suppkey", "day", "cents", halfWindow = SeasonHalfW)
        .orderBy("l_suppkey", "day")),
  )

  private val AcfMaxLag = 3
  private val ShiftW = 14
  private val SeasonHalfW = 3

  /** Per-supplier monthly revenue in integer cents, zero-filled onto the
    * supplier's [min, max] month grid — the regular series q_ts4 needs. */
  private def monthlyCentsFilled(s: SparkSession, d: String): DataFrame = {
    val monthly = Tables.load(s, d, "lineitem")
      .groupBy(col("l_suppkey"),
        date_trunc("month", col("l_shipdate")).cast("date").as("month"))
      .agg(sum(round(col("l_extendedprice") * lit(100.0)).cast("long"))
        .as("cents"))
    val spans = monthly.groupBy(col("l_suppkey"))
      .agg(min(col("month")).as("__lo"), max(col("month")).as("__hi"))
    spans.select(col("l_suppkey"),
        explode(sequence(col("__lo"), col("__hi"),
          expr("INTERVAL '1' MONTH"))).as("month"))
      .join(monthly, Seq("l_suppkey", "month"), "left_outer")
      .select(col("l_suppkey"), col("month"),
        coalesce(col("cents"), lit(0L)).as("cents"))
  }

  /** Daily twin of [[monthlyCentsFilled]] — the regular grid four queries
    * share (q_ts5/6/7, q_anom4), memoized like any other shared
    * intermediate (at cluster scale the zero-filled grid is a persisted
    * table every downstream diagnostic reads). The grid fill is hinted
    * shuffle-hash: the daily table is ~#keys·days/4 rows, and Spark's
    * broadcast pick re-BUILDS that ~600k-row broadcast relation on the
    * driver per execution (~2.5 s measured at sf0.1) where the
    * shuffle-hash join pays a partitioned build instead. */
  private def dailyCentsFilled(s: SparkSession, d: String): DataFrame =
    graft.util.Memo.cachedDf(s, s"daily_cents_filled|$d") {
      val daily = Tables.load(s, d, "lineitem")
        .groupBy(col("l_suppkey"), col("l_shipdate").cast("date").as("day"))
        .agg(sum(round(col("l_extendedprice") * lit(100.0)).cast("long"))
          .as("cents"))
      val spans = daily.groupBy(col("l_suppkey"))
        .agg(min(col("day")).as("__lo"), max(col("day")).as("__hi"))
      spans.select(col("l_suppkey"),
          explode(sequence(col("__lo"), col("__hi"))).as("day"))
        .join(daily.hint("shuffle_hash"), Seq("l_suppkey", "day"), "left_outer")
        .select(col("l_suppkey"), col("day"),
          coalesce(col("cents"), lit(0L)).as("cents"))
    }

  /** Oracle CTE text for [[monthlyCentsFilled]] / [[dailyCentsFilled]]:
    * grain = 'month'/'day' with the matching truncation + step. */
  private def filledCtes(grain: String): String = {
    val (expr0, step) =
      if (grain == "month")
        ("CAST(date_trunc('month', l_shipdate) AS DATE)", "INTERVAL 1 MONTH")
      else ("CAST(l_shipdate AS DATE)", "INTERVAL 1 DAY")
    s"""agg0 AS (SELECT l_suppkey, $expr0 AS g,
       |    SUM(CAST(round(l_extendedprice*100.0,0) AS BIGINT)) AS cents
       |  FROM lineitem GROUP BY 1, 2),
       |spans AS (SELECT l_suppkey, min(g) AS lo, max(g) AS hi FROM agg0 GROUP BY 1),
       |grid AS (SELECT l_suppkey,
       |    CAST(unnest(generate_series(CAST(lo AS TIMESTAMP), CAST(hi AS TIMESTAMP), $step)) AS DATE) AS g
       |  FROM spans),
       |f AS (SELECT grid.l_suppkey, grid.g, coalesce(agg0.cents, 0) AS cents
       |  FROM grid LEFT JOIN agg0 ON agg0.l_suppkey = grid.l_suppkey AND agg0.g = grid.g)""".stripMargin
  }

  private def acfSql: String = {
    val lags = (1 to AcfMaxLag).map(k =>
      s"lag(cents,$k) OVER w AS x$k").mkString(", ")
    val devs = (1 to AcfMaxLag).map(k =>
      s"CAST(n AS HUGEINT)*x$k - s AS d$k").mkString(", ")
    val nums = (1 to AcfMaxLag).map(k => s"SUM(d0*d$k) AS n$k").mkString(", ")
    val arms = (1 to AcfMaxLag).map(k =>
      s"SELECT l_suppkey, $k AS lag, n, CASE WHEN den > 0 THEN round(CAST(n$k AS DOUBLE)/CAST(den AS DOUBLE), 6) END AS acf FROM agg"
    ).mkString("\n  UNION ALL ")
    s"""WITH ${filledCtes("month")},
       |st AS (SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n, SUM(cents) AS s
       |  FROM f GROUP BY 1),
       |lagd AS (SELECT f.l_suppkey, st.n, st.s, cents, $lags
       |  FROM f JOIN st USING (l_suppkey)
       |  WINDOW w AS (PARTITION BY f.l_suppkey ORDER BY g)),
       |dv AS (SELECT l_suppkey, n, CAST(n AS HUGEINT)*cents - s AS d0, $devs
       |  FROM lagd),
       |agg AS (SELECT l_suppkey, max(n) AS n, SUM(d0*d0) AS den, $nums
       |  FROM dv GROUP BY 1)
       |SELECT l_suppkey, lag, n, acf FROM (
       |  $arms)
       |ORDER BY l_suppkey, lag""".stripMargin
  }

  private def shiftSql: String =
    s"""WITH ${filledCtes("day")},
       |win AS (SELECT l_suppkey, g AS day,
       |    SUM(cents) OVER wl AS l, COUNT(*) OVER wl AS nl,
       |    SUM(cents) OVER wr AS r, COUNT(*) OVER wr AS nr
       |  FROM f
       |  WINDOW wl AS (PARTITION BY l_suppkey ORDER BY g
       |      ROWS BETWEEN $ShiftW PRECEDING AND 1 PRECEDING),
       |    wr AS (PARTITION BY l_suppkey ORDER BY g
       |      ROWS BETWEEN 1 FOLLOWING AND $ShiftW FOLLOWING)),
       |sh AS (SELECT l_suppkey, day, CAST(r - l AS BIGINT) AS shift
       |  FROM win WHERE nl = $ShiftW AND nr = $ShiftW)
       |SELECT l_suppkey, day, shift FROM (
       |  SELECT l_suppkey, day, shift, row_number() OVER (PARTITION BY l_suppkey
       |      ORDER BY abs(shift) DESC, day ASC) AS rn FROM sh)
       |WHERE rn = 1 ORDER BY l_suppkey""".stripMargin

  private def seasonalSql: String = {
    val span = 2 * SeasonHalfW + 1
    s"""WITH ${filledCtes("day")},
       |tr AS (SELECT l_suppkey, g AS day, cents,
       |    SUM(cents) OVER wt AS t, COUNT(*) OVER wt AS nt
       |  FROM f
       |  WINDOW wt AS (PARTITION BY l_suppkey ORDER BY g
       |      ROWS BETWEEN $SeasonHalfW PRECEDING AND $SeasonHalfW FOLLOWING)),
       |tf AS (SELECT l_suppkey, day, cents, t, isodow(day) AS dow,
       |    $span*cents - t AS dd
       |  FROM tr WHERE nt = $span),
       |se AS (SELECT l_suppkey, dow, CAST(SUM(dd) AS BIGINT) AS sd,
       |    CAST(COUNT(*) AS BIGINT) AS nd
       |  FROM tf GROUP BY 1, 2),
       |sm AS (SELECT l_suppkey, dow,
       |    CASE WHEN sd >= 0
       |      THEN (2*sd*1000000 + $span*nd) // (2*$span*nd)
       |      ELSE -((2*(-sd)*1000000 + $span*nd) // (2*$span*nd)) END
       |      AS seasonal_micro
       |  FROM se),
       |r AS (SELECT tf.l_suppkey, tf.day, tf.cents, tf.t, sm.seasonal_micro,
       |    tf.dd*1000000 - $span*sm.seasonal_micro AS ra
       |  FROM tf JOIN sm ON sm.l_suppkey = tf.l_suppkey AND sm.dow = tf.dow)
       |SELECT l_suppkey, day, CAST(cents AS BIGINT) AS value,
       |  CAST(t AS DOUBLE)/$span.0 AS trend,
       |  seasonal_micro,
       |  CAST(CASE WHEN ra >= 0 THEN (2*ra + $span) // (2*$span)
       |       ELSE -((2*(-ra) + $span) // (2*$span)) END AS BIGINT)
       |    AS residual_micro
       |FROM r
       |ORDER BY l_suppkey, day""".stripMargin
  }

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
    "q_ts4" -> acfSql,
    "q_ts5" -> shiftSql,
    "q_ts6" -> seasonalSql,
    // CUSUM: the recursive replay carries pre-reset emissions (sp, sn —
    // what the alarm fired on) and post-reset state (sp_st, sn_st)
    // side by side; pure greatest/least integer arithmetic.
    "q_anom5" -> {
      val K = 0L; val H = 2000000L
      def sp(prev: String) = s"greatest(0, $prev + d.x - $K)"
      def sn(prev: String) = s"least(0, $prev + d.x + $K)"
      s"""WITH RECURSIVE ${Shared.supplierMarketReturnsSql},
         |d AS (
         |  SELECT l_suppkey, day_ord, x,
         |    row_number() OVER (PARTITION BY l_suppkey ORDER BY day_ord) AS rn
         |  FROM sx),
         |r AS (
         |  SELECT l_suppkey, day_ord, x, rn,
         |    greatest(0, x - $K) AS sp, least(0, x + $K) AS sn,
         |    CASE WHEN greatest(0, x - $K) > $H THEN 0
         |         ELSE greatest(0, x - $K) END AS sp_st,
         |    CASE WHEN least(0, x + $K) < -$H THEN 0
         |         ELSE least(0, x + $K) END AS sn_st
         |  FROM d WHERE rn = 1
         |  UNION ALL
         |  SELECT d.l_suppkey, d.day_ord, d.x, d.rn,
         |    ${sp("r.sp_st")}, ${sn("r.sn_st")},
         |    CASE WHEN ${sp("r.sp_st")} > $H THEN 0 ELSE ${sp("r.sp_st")} END,
         |    CASE WHEN ${sn("r.sn_st")} < -$H THEN 0 ELSE ${sn("r.sn_st")} END
         |  FROM d JOIN r ON d.l_suppkey = r.l_suppkey AND d.rn = r.rn + 1)
         |SELECT l_suppkey, day_ord, x,
         |  CAST(sp AS BIGINT) AS sp_micro, CAST(sn AS BIGINT) AS sn_micro,
         |  CASE WHEN sp > $H THEN 'up' WHEN sn < -$H THEN 'down' END AS alarm
         |FROM r ORDER BY l_suppkey, day_ord""".stripMargin
    },
    // Holt: the two coupled integer recurrences replayed level by level;
    // the trend step needs l_t twice, so the l_t CASE is inlined at each
    // site (pure arithmetic — no LATERAL, whose correlated scalars
    // mis-decorrelate in recursive CTEs, per the verify recipe).
    "q_ts8" -> {
      val a = "(d.cents*10000 + 4*(r.lvl + r.tr))"
      val lvl = s"CASE WHEN $a >= 0 THEN (2*$a + 5) // 10" +
        s" ELSE -((-2*$a + 5) // 10) END"
      def b(l: String) = s"(($l) - r.lvl + 9*r.tr)"
      val tr = s"CASE WHEN ${b(lvl)} >= 0 THEN (2*${b(lvl)} + 10) // 20" +
        s" ELSE -((-2*${b(lvl)} + 10) // 20) END"
      s"""WITH RECURSIVE ${Shared.supplierMarketReturnsSql},
         |d AS (
         |  SELECT l_suppkey, day_ord, cents,
         |    row_number() OVER (PARTITION BY l_suppkey ORDER BY day_ord) AS rn
         |  FROM dd),
         |r AS (
         |  SELECT l_suppkey, day_ord, cents, rn,
         |    cents*10000 AS lvl, CAST(0 AS BIGINT) AS tr
         |  FROM d WHERE rn = 1
         |  UNION ALL
         |  SELECT d.l_suppkey, d.day_ord, d.cents, d.rn, $lvl, $tr
         |  FROM d JOIN r ON d.l_suppkey = r.l_suppkey AND d.rn = r.rn + 1)
         |SELECT l_suppkey, day_ord, cents AS value_units,
         |  CAST(lvl AS BIGINT) AS level_micro, CAST(tr AS BIGINT) AS trend_micro,
         |  CAST(lvl + 7*tr AS BIGINT) AS forecast7_micro
         |FROM r ORDER BY l_suppkey, day_ord""".stripMargin
    },
    "q_ts7" ->
      s"""WITH ${filledCtes("day")},
         |p AS (SELECT l_suppkey, cents,
         |    lag(cents, 7) OVER (PARTITION BY l_suppkey ORDER BY g) AS pred
         |  FROM f)
         |SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(abs(cents - pred)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         |    AS mae_cents,
         |  CAST(SUM(cents - pred) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         |    AS bias_cents
         |FROM p WHERE pred IS NOT NULL
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_anom4" -> {
      val (z, outlier) = graft.operators.Anomaly.sqlZScores("d", scale = 0,
        threshold = 3.0, w = "(PARTITION BY grp)")
      s"""WITH ${filledCtes("day")},
         |tr AS (SELECT l_suppkey, g AS day, cents,
         |    SUM(cents) OVER wt AS t, COUNT(*) OVER wt AS nt
         |  FROM f
         |  WINDOW wt AS (PARTITION BY l_suppkey ORDER BY g
         |      ROWS BETWEEN $SeasonHalfW PRECEDING AND $SeasonHalfW FOLLOWING)),
         |dd AS (SELECT l_suppkey, day, ${2 * SeasonHalfW + 1}*cents - t AS d,
         |    l_suppkey*10 + isodow(day) AS grp
         |  FROM tr WHERE nt = ${2 * SeasonHalfW + 1})
         |SELECT l_suppkey, day, CAST(d AS BIGINT) AS d,
         |  $z AS z, $outlier AS is_outlier
         |FROM dd ORDER BY l_suppkey, day""".stripMargin
    },
  )
}
