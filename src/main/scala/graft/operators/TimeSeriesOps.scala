package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.Det

/** Time-series resampling for OHLCV-shaped data — the operations the
  * reference's partitioned price history exists to feed (`README.md:46`):
  * regularize an irregular event series onto a fixed calendar grid and
  * carry observations forward across gaps.
  *
  * Scale shape: the calendar grid is generated per-key with `sequence`
  * + `explode` (executor-side, no driver loop) and the fill is a window
  * `last(ignoreNulls)` over the key partition — one shuffle on the key,
  * same as any per-symbol window. No collect, no python-style reindexing.
  */
object TimeSeriesOps {

  /** Resample to month grain with zero-fill: every (key, month) in the
    * key's [min, max] month span appears exactly once; months with no
    * rows get agg value 0. */
  def resampleMonthlyZeroFill(df: DataFrame, keyCol: String, tsCol: String,
                              valueCol: String): DataFrame = {
    val monthly = df
      .groupBy(col(keyCol), date_trunc("month", col(tsCol)).cast("date").as("month"))
      .agg(Det.fixedSum(col(valueCol), 2).as("month_value"))
    val spans = monthly.groupBy(col(keyCol))
      .agg(min(col("month")).as("__lo"), max(col("month")).as("__hi"))
    val grid = spans.select(col(keyCol),
      explode(sequence(col("__lo"), col("__hi"), expr("INTERVAL '1' MONTH"))).as("month"))
    grid.join(monthly, Seq(keyCol, "month"), "left_outer")
      .select(col(keyCol), col("month"),
        coalesce(col("month_value"), lit(0.0)).as("month_value"))
  }

  /** Last-observation-carried-forward over a calendar grid: null values
    * (gap rows) take the most recent non-null value at-or-before them
    * within the key. `orderCols` must be a total order within the key. */
  def forwardFill(df: DataFrame, keyCol: String, orderCols: Seq[Column],
                  valueCol: String, filledName: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(filledName, last(col(valueCol), ignoreNulls = true).over(w))
  }

  /** Expand a per-(key, day) frame onto the full daily calendar of each
    * key's [min, max] span (gap days carry null values). Input must be
    * unique per (key, day) — aggregate first. */
  def gridJoinDaily(daily: DataFrame, keyCol: String, dayCol: String): DataFrame = {
    val spans = daily.groupBy(col(keyCol))
      .agg(min(col(dayCol)).as("__lo"), max(col(dayCol)).as("__hi"))
    val grid = spans.select(col(keyCol),
      explode(sequence(col("__lo"), col("__hi"))).as(dayCol))
    grid.join(daily, Seq(keyCol, dayCol), "left_outer")
  }

  /** Daily-grid LOCF: regularize to one row per (key, day) across the
    * key's span, carrying the last value forward across non-trading days —
    * the canonical OHLCV gap-fill. */
  def dailyLocf(df: DataFrame, keyCol: String, tsCol: String,
                valueCol: String): DataFrame = {
    val daily = df.select(col(keyCol), col(tsCol).cast("date").as("day"),
      col(valueCol))
    forwardFill(gridJoinDaily(daily, keyCol, "day"),
      keyCol, Seq(col("day")), valueCol, s"${valueCol}_filled")
  }

  /** Sample autocorrelation r_k per key at lags 1..maxLag over an
    * INTEGER-valued regular series (`valueCol` LONG, one row per
    * consecutive `idxCol` step — resample/zero-fill first). The
    * periodicity diagnostic behind seasonality detection and
    * feature-window selection.
    *
    *   r_k = Σ_{t>k} (x_t - x̄)(x_{t-k} - x̄)  /  Σ_t (x_t - x̄)²
    *
    * Determinism: multiplying through by n² makes both sums exact
    * integers — num_k = Σ (n·x_t - S)(n·x_{t-k} - S), den = Σ (n·x_t - S)²
    * with S = Σx — accumulated in DECIMAL, then one cast each to double
    * and ONE IEEE division. Deterministic within Spark; an oracle compare
    * must still round the quotient (observed: DuckDB's HUGEINT→DOUBLE
    * conversion lands 1 ulp off the JVM's correctly-rounded decimal cast
    * for >2^53 sums). Constant series (den = 0) yield null, never NaN.
    *
    * Shape: one window partition per key (lag + count + sum in a single
    * pass), one key-wise aggregation per lag — no self-joins, no collect.
    * Returns (key, lag, n, acf). */
  def acf(df: DataFrame, keyCol: String, idxCol: String, valueCol: String,
          maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(idxCol))
    val wAll = Window.partitionBy(col(keyCol))
    val xd = col(valueCol).cast("long").cast("decimal(19,0)")
    val laggedCols =
      Seq(col(keyCol), xd.as("__x"),
        count(lit(1)).over(wAll).cast("decimal(19,0)").as("__n"),
        sum(xd).over(wAll).cast("decimal(19,0)").as("__s")) ++
      (1 to maxLag).map(k => lag(xd, k).over(w).as(s"__x$k"))
    val lagged = df.select(laggedCols: _*)
    val dev = (x: Column) => col("__n") * x - col("__s")
    val aggCols =
      Seq(sum(dev(col("__x")) * dev(col("__x"))).as("__den")) ++
      (1 to maxLag).map(k =>
        sum(dev(col("__x")) * dev(col(s"__x$k"))).as(s"__num$k"))
    val agg = lagged.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"), aggCols: _*)
    val pairs = array((1 to maxLag).map(k =>
      struct(lit(k).as("lag"), col(s"__num$k").as("num"))): _*)
    agg.select(col(keyCol), col("n"), col("__den"),
        explode(pairs).as("__p"))
      .select(col(keyCol), col("__p.lag").as("lag"), col("n"),
        when(col("__den") > 0,
          col("__p.num").cast("double") / col("__den").cast("double"))
          .as("acf"))
  }

  /** Change-point detection by two-sided window mean shift: at each point
    * of a regular integer series, the difference between the sum of the
    * NEXT w values and the sum of the PREVIOUS w values (both windows must
    * be full). The per-key arg-max |shift| is the most likely level-shift
    * location — the drift detector run over ingest volumes and price
    * series before a model retrain. All-integer => hash-exact.
    *
    * Returns one row per key that has at least 2w+1 points:
    * (key, idx, shift) with ties broken toward the earliest index. */
  def meanShiftChangepoint(df: DataFrame, keyCol: String, idxCol: String,
                           valueCol: String, w: Int): DataFrame = {
    require(w >= 1, s"w must be >= 1, got $w")
    // Prefix-sum formulation: both framed sums come from GROWING frames
    // [unboundedPreceding, +k] — Spark evaluates those incrementally
    // (add-only), so the whole thing is O(n) per key instead of the
    // O(n·w) re-aggregation of two bounded sliding frames, and ALL the
    // expressions below share ONE WindowExec on one (key, idx) sort:
    //   R = S(+w) - S(0),  L = S(-1) - S(-w-1),  shift = R - L
    // (same long integers exactly; empty prefixes coalesce to 0).
    // Full-window eligibility comes from the row number, not framed counts.
    val ord = Window.partitionBy(col(keyCol)).orderBy(col(idxCol))
    def pre(hi: Int) = sum(col("__x"))
      .over(ord.rowsBetween(Window.unboundedPreceding, hi))
    val all = Window.partitionBy(col(keyCol))
    val x = col(valueCol).cast("long")
    val shifted = df.select(col(keyCol), col(idxCol), x.as("__x"))
      .select(col(keyCol), col(idxCol),
        ((pre(w) - pre(0)) -
          (coalesce(pre(-1), lit(0L)) - coalesce(pre(-w - 1), lit(0L))))
          .as("shift"),
        row_number().over(ord).as("__rn"),
        count(lit(1)).over(all).as("__n"))
      .where(col("__rn") > w && col("__rn") + w <= col("__n"))
      .select(col(keyCol), col(idxCol), col("shift"))
    // arg-max as an AGGREGATION, not a rank window (r15): min of the
    // struct (−|shift|, idx, shift) is exactly (|shift| desc, idx asc) —
    // partial-aggregated map-side, no second full sort of the shift
    // table. (|shift| is bounded far below 2^63, so negation is safe.)
    shifted.groupBy(col(keyCol))
      .agg(min(struct((-abs(col("shift"))).as("__na"),
        col(idxCol).as("__idx"), col("shift").as("__s"))).as("__b"))
      .select(col(keyCol), col("__b.__idx").as(idxCol), col("__b.__s").as("shift"))
  }

  /** Interior rows of a regular daily integer series with the centered
    * (2h+1)-day trend sum attached: (key, day, __x, __t, __dow,
    * __d = (2h+1)·x − T) — __t and __d exact integers, __dow the ISO
    * weekday. The shared core of [[seasonalDecompose]] and the
    * seasonal-aware anomaly gate (z-scoring __d within (key, dow) keeps
    * the sufficient statistics integer, where z-scoring the DOUBLE
    * residual would put order-dependent float sums in the aggregate).
    * Centered sum via the growing-frame prefix-sum trick (see
    * [[meanShiftChangepoint]]): T(t) = S(+h) − S(−h−1), row-number
    * eligibility — ONE WindowExec, O(n). */
  def detrendedDaily(df: DataFrame, keyCol: String, dayCol: String,
                     valueCol: String, halfWindow: Int): DataFrame = {
    require(halfWindow >= 1, s"halfWindow must be >= 1, got $halfWindow")
    val span = 2 * halfWindow + 1
    val ord = Window.partitionBy(col(keyCol)).orderBy(col(dayCol))
    def pre(hi: Int) = sum(col("__x"))
      .over(ord.rowsBetween(Window.unboundedPreceding, hi))
    val all = Window.partitionBy(col(keyCol))
    val x = col(valueCol).cast("long")
    df.select(col(keyCol), col(dayCol), x.as("__x"))
      .select(col(keyCol), col(dayCol), col("__x"),
        (pre(halfWindow) - coalesce(pre(-halfWindow - 1), lit(0L))).as("__t"),
        row_number().over(ord).as("__rn"),
        count(lit(1)).over(all).as("__n"))
      .where(col("__rn") > halfWindow && col("__rn") + halfWindow <= col("__n"))
      .select(col(keyCol), col(dayCol), col("__x"), col("__t"),
        (weekday(col(dayCol)) + 1).as("__dow"),
        (lit(span) * col("__x") - col("__t")).as("__d"))
  }

  /** Classical additive seasonal decomposition on a regular daily integer
    * series: trend = centered (2h+1)-day moving average, seasonal = the
    * ISO-weekday mean of the detrended series, residual = the rest.
    * Rows without a full trend window are dropped (the standard edge
    * treatment).
    *
    * Determinism (round-8 hardening — the r7 driver gate flipped the
    * 6dp-rounded double seasonal/residual on a 1-ulp engine difference):
    * the trend sum T and the scaled detrended value d = (2h+1)·x − T are
    * exact integers, and seasonal/residual are now emitted as exact
    * integer MICRO-units via integer round-half-away division — no
    * double ever reaches them:
    *   seasonal_micro = rha(Σd · 1e6, (2h+1)·n)
    *   residual_micro = rha(d·1e6 − (2h+1)·seasonal_micro, 2h+1)
    * where rha(a, b) = sign(a)·((2·|a| + b) div (2·b)). Only `trend`
    * stays a double: T/(2h+1) is ONE correctly-rounded IEEE division of
    * exact operands, bitwise identical on every engine. Two window
    * passes + one weekday aggregation; no joins beyond the seasonal
    * broadcast-back. Overflow bound: 2e6·|Σd| < 2^63, i.e. |Σd| < 4.6e12
    * (≈ 4 600 key-days at a billion cents detrended each) — widen to
    * DECIMAL(38,0) past that.
    *
    * Output: (key, day, value, trend, seasonal_micro, residual_micro). */
  def seasonalDecompose(df: DataFrame, keyCol: String, dayCol: String,
                        valueCol: String, halfWindow: Int): DataFrame = {
    val span = 2 * halfWindow + 1
    // feeds BOTH the seasonal-mean aggregation and the residual join —
    // materialized so the detrend window pass runs once, not per branch
    val trended = detrendedDaily(df, keyCol, dayCol, valueCol, halfWindow)
      .localCheckpoint()
    // rha(a, b) with b > 0, written with CASE so both engines use plain
    // truncating integer division on non-negative operands
    def rha(a: String, b: String) =
      s"CASE WHEN $a >= 0 THEN (2L * ($a) + ($b)) div (2L * ($b)) " +
        s"ELSE -((2L * (-($a)) + ($b)) div (2L * ($b))) END"
    val seasonal = trended.groupBy(col(keyCol), col("__dow"))
      .agg(sum(col("__d")).as("__sd"), count(lit(1)).as("__nd"))
      .withColumn("seasonal_micro",
        expr(rha("__sd * 1000000L", s"${span}L * __nd")))
      .select(col(keyCol), col("__dow"), col("seasonal_micro"))
    // #keys × 7 rows — always broadcastable
    trended.join(broadcast(seasonal), Seq(keyCol, "__dow"))
      .withColumn("__ra",
        col("__d") * lit(1000000L) - lit(span.toLong) * col("seasonal_micro"))
      .select(col(keyCol), col(dayCol),
        col("__x").as("value"),
        (col("__t").cast("double") / lit(span.toDouble)).as("trend"),
        col("seasonal_micro"),
        expr(rha("__ra", s"${span}L")).as("residual_micro"))
  }
}
