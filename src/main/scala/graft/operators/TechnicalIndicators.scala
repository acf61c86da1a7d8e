package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Output row of [[TechnicalIndicators.ema]]. Top-level (not nested in the
  * object) so the generated `UnsafeProjection` serializer can reference it:
  * Janino cannot resolve inner-class methods like
  * `TechnicalIndicators$EmaRow.key()` and falls back to interpreted
  * projection on every row when the class is nested. */
case class EmaRow(key: Long, ord: Long, value: Double, ema: Double)

/** Output row of [[TechnicalIndicators.emaMicro]] — same top-level-class
  * rule as [[EmaRow]]. `emaMicro` is the state in exact micro-units of
  * the value (value·1e6). */
case class EmaMicroRow(key: Long, ord: Long, valueUnits: Long, emaMicro: Long)

case class HoltMicroRow(key: Long, ord: Long, valueUnits: Long,
                        levelMicro: Long, trendMicro: Long)

case class CusumRow(key: Long, ord: Long, x: Long,
                    spMicro: Long, snMicro: Long, alarm: Option[String])

case class SarMicroRow(key: Long, ord: Long, valueUnits: Long,
                       sarMicro: Long, dir: Long)

/** Technical indicators over per-key price series — the feature
  * engineering the reference's partitioned OHLCV layout exists to feed
  * (SURVEY.md §2.B [ANA]; `README.md:46`).
  *
  * Numerics: windowed mean/variance are computed from EXACT integer-cent
  * window sums (sum, sum-of-squares, count are exact longs; the final
  * double formula is the same op sequence on both engines), so Bollinger
  * and RSI are bit-deterministic and DuckDB-oracle-checkable with no
  * rounding. EMA is genuinely recursive — no window built-in exists — so
  * it runs as a per-key streaming pass after repartition +
  * sortWithinPartitions: one shuffle, constant memory per series, the
  * scalable shape for recursive state at 100 TB.
  */
object TechnicalIndicators {

  /** Exact windowed mean/stddev of a 2dp column over `w`, as
    * (mean, sd) columns built from integer-cent sums. `sd` uses the
    * sample variance with a >=0 clamp (fp can dip epsilon-negative). */
  def meanSd(c: Column, w: WindowSpec): (Column, Column) = {
    val cents = round(c * 100.0).cast("long")
    val s = sum(cents).over(w).cast("double")
    val sq = sum(cents * cents).over(w).cast("double")
    val n = count(lit(1)).over(w).cast("double")
    val mean = s / n / 100.0
    // n=1 => sample variance undefined AND (n-1)=0 would trip ANSI's
    // divide-by-zero (which applies to doubles too) — guard to 0.
    val varCents2 = when(n > 1.0,
      greatest((sq - s * s / n) / (n - lit(1.0)), lit(0.0))).otherwise(lit(0.0))
    val sd = sqrt(varCents2) / 100.0
    (mean, sd)
  }

  /** SQL twin of [[meanSd]] — keep the op sequence in lockstep. */
  def sqlMeanSd(x: String, windowText: String): (String, String) = {
    val s = s"CAST(SUM(CAST(round(($x)*100.0,0) AS BIGINT)) OVER $windowText AS DOUBLE)"
    val sq = s"CAST(SUM(CAST(round(($x)*100.0,0) AS BIGINT)*CAST(round(($x)*100.0,0) AS BIGINT)) OVER $windowText AS DOUBLE)"
    val n = s"CAST(COUNT(*) OVER $windowText AS DOUBLE)"
    (s"$s / $n / 100.0",
      s"sqrt(CASE WHEN $n > 1.0 THEN greatest(($sq - $s * $s / $n) / ($n - 1.0), 0.0) ELSE 0.0 END) / 100.0")
  }

  /** Relative Strength Index over `period` rows: exact cent gains/losses,
    * explicit zero-loss guard (RSI=100) so no engine-specific inf/NaN. */
  def rsi(valueCol: Column, w: WindowSpec, frame: WindowSpec): Column = {
    val cents = round(valueCol * 100.0).cast("long")
    val diff = cents - lag(cents, 1).over(w)
    val gain = when(diff > 0, diff).otherwise(0L)
    val loss = when(diff < 0, -diff).otherwise(0L)
    val avgGain = sum(gain).over(frame).cast("double") / count(lit(1)).over(frame)
    val avgLoss = sum(loss).over(frame).cast("double") / count(lit(1)).over(frame)
    when(avgLoss === 0.0, lit(100.0))
      .otherwise(lit(100.0) - lit(100.0) / (lit(1.0) + avgGain / avgLoss))
  }

  /** Exponential moving average per key: recursive
    * ema_t = alpha*x_t + (1-alpha)*ema_{t-1}, seeded with the first value.
    * Implemented as repartition(key) + sortWithinPartitions + one
    * streaming pass per partition (keys are contiguous after the sort, so
    * state is a single (key, ema) pair at a time). */
  def ema(df: DataFrame, keyCol: String, ordCol: String, valueCol: String,
          alpha: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val prepared = df.select(
      col(keyCol).cast("long").as("key"),
      col(ordCol).cast("long").as("ord"),
      col(valueCol).cast("double").as("value"))
      .repartition(col("key"))
      .sortWithinPartitions(col("key"), col("ord"))
    prepared.as[(Long, Long, Double)].mapPartitions { it =>
      var curKey = Long.MinValue
      var curEma = 0.0
      it.map { case (k, o, v) =>
        curEma = if (k != curKey) v else alpha * v + (1 - alpha) * curEma
        curKey = k
        EmaRow(k, o, v, curEma)
      }
    }(Encoders.product[EmaRow])
      .toDF("key", "ord", "value", "ema")
      .withColumnRenamed("key", keyCol)
      .withColumnRenamed("ord", ordCol)
      .withColumnRenamed("value", valueCol)
  }

  /** In-memory reference EMA for tests. */
  def emaReference(values: Seq[Double], alpha: Double): Seq[Double] =
    values.tail.scanLeft(values.head)((prev, x) => alpha * x + (1 - alpha) * prev)

  /** Round-half-away-from-zero integer division, b > 0 — the exact
    * quantization step of [[emaMicro]]; mirrored literally by the oracle
    * CTEs (CASE on sign + nonnegative floor division on both engines). */
  def rhaDiv(a: Long, b: Long): Long =
    if (a >= 0) (2 * a + b) / (2 * b) else -((-2 * a + b) / (2 * b))

  /** ENGINE-VERSION-EXACT exponential moving average (round-8 hardening;
    * the fragility audit measured the double-recurrence q_ta3/q_ta4
    * outputs within 2 ulps of a 6dp rounding boundary — bit-identical
    * inputs, but one round-IMPLEMENTATION difference between builds
    * (Spark's exact BigDecimal HALF_UP vs a float-scaled libc round)
    * from flipping). The recurrence itself is integer arithmetic:
    *
    * The caller supplies the series as EXACT integers in `unitsCol`
    * (`unitsScale` dp of the natural value — e.g. cents = 2):
    *
    *   state e_0 = c_0 · 10^(6−unitsScale)     (micro-units of the value)
    *   e_t = rhaDiv(aNum·c_t·10^(6−uS) + (aDen−aNum)·e_{t−1}, aDen)
    *
    * i.e. the classic ema_t = α·x_t + (1−α)·ema_{t−1} with α = aNum/aDen,
    * re-quantized to 1e-6 of the value unit at every step (steady-state
    * drift vs the real-valued EMA ≤ 0.5/α micro — invisible at 6dp-1
    * precision, and DETERMINISTIC: every engine computes the identical
    * integers).
    *
    * Same distributed shape as [[ema]]: repartition(key) +
    * sortWithinPartitions + one constant-memory streaming pass — the
    * scalable plan for serial per-key state at 100 TB. Overflow: needs
    * aDen·|value|·1e6 < 2^63, i.e. |value| < 9.2e12/aDen — widen the
    * state to BigInt past that (same recurrence, wider carrier).
    *
    * Output: (key, ord, value_units = c_t, ema_micro = e_t). */
  def emaMicro(df: DataFrame, keyCol: String, ordCol: String,
               unitsCol: String, unitsScale: Int,
               alphaNum: Long, alphaDen: Long): DataFrame = {
    require(alphaDen > 0 && alphaNum > 0 && alphaNum <= alphaDen,
      s"alpha must be in (0,1]: $alphaNum/$alphaDen")
    require(unitsScale >= 0 && unitsScale <= 6,
      s"unitsScale must be in [0,6], got $unitsScale")
    val spark = df.sparkSession
    import spark.implicits._
    val up = math.pow(10.0, 6 - unitsScale).toLong
    val prepared = df.select(
      col(keyCol).cast("long").as("key"),
      col(ordCol).cast("long").as("ord"),
      col(unitsCol).cast("long").as("units"))
      .repartition(col("key"))
      .sortWithinPartitions(col("key"), col("ord"))
    prepared.as[(Long, Long, Long)].mapPartitions { it =>
      // explicit started flag, not a key sentinel: a key column may hold
      // ANY long (including Long.MinValue) in this generic operator
      var started = false
      var curKey = 0L
      var curEma = 0L
      it.map { case (k, o, c) =>
        curEma =
          if (!started || k != curKey) c * up
          else rhaDiv(alphaNum * c * up + (alphaDen - alphaNum) * curEma, alphaDen)
        started = true
        curKey = k
        EmaMicroRow(k, o, c, curEma)
      }
    }(Encoders.product[EmaMicroRow])
      .toDF("key", "ord", "value_units", "ema_micro")
      .withColumnRenamed("key", keyCol)
      .withColumnRenamed("ord", ordCol)
  }

  /** Multi-column [[emaMicro]]: the IDENTICAL per-column recurrence run
    * over several unit columns in ONE repartition + sort + streaming
    * pass (r15 — q_ta17's Wilder system smoothed +DM, −DM and TR as
    * three separate emaMicro passes and paid two extra exchanges plus
    * two joins to put the results back side-by-side; the recurrences
    * are per-column independent, so one fold carries all the state).
    * Output: (key, ord, <c> = input units, <c>_s = ema micro) per
    * column. */
  def emaMicroMulti(df: DataFrame, keyCol: String, ordCol: String,
                    unitsCols: Seq[String], unitsScale: Int,
                    alphaNum: Long, alphaDen: Long): DataFrame = {
    require(unitsCols.nonEmpty, "need at least one units column")
    require(alphaDen > 0 && alphaNum > 0 && alphaNum <= alphaDen,
      s"alpha must be in (0,1]: $alphaNum/$alphaDen")
    require(unitsScale >= 0 && unitsScale <= 6,
      s"unitsScale must be in [0,6], got $unitsScale")
    val spark = df.sparkSession
    import spark.implicits._
    val up = math.pow(10.0, 6 - unitsScale).toLong
    val n = unitsCols.length
    val prepared = df.select(
      col(keyCol).cast("long").as("key"),
      col(ordCol).cast("long").as("ord"),
      array(unitsCols.map(c => col(c).cast("long")): _*).as("units"))
      .repartition(col("key"))
      .sortWithinPartitions(col("key"), col("ord"))
    prepared.as[(Long, Long, Array[Long])].mapPartitions { it =>
      var started = false
      var curKey = 0L
      val curEmas = new Array[Long](n)
      it.map { case (k, o, cs) =>
        val fresh = !started || k != curKey
        var i = 0
        while (i < n) {
          curEmas(i) =
            if (fresh) cs(i) * up
            else rhaDiv(alphaNum * cs(i) * up +
              (alphaDen - alphaNum) * curEmas(i), alphaDen)
          i += 1
        }
        started = true
        curKey = k
        (k, o, cs.clone(), curEmas.clone())
      }
    }.toDF("key", "ord", "__units", "__emas")
      .select(Seq(col("key").as(keyCol), col("ord").as(ordCol)) ++
        unitsCols.zipWithIndex.map { case (c, i) => col("__units")(i).as(c) } ++
        unitsCols.zipWithIndex.map { case (c, i) => col("__emas")(i).as(s"${c}_s") }: _*)
  }

  /** ENGINE-VERSION-EXACT Holt double-exponential smoothing (level +
    * trend) — the forecasting primitive the reference domain's
    * prediction purpose actually calls for: a forecast h steps out is
    * level + h·trend. Same integer-recurrence discipline as [[emaMicro]]
    * (no IEEE result ever enters state):
    *
    *   l_0 = c_0·10^(6−uS),  b_0 = 0
    *   l_t = rhaDiv(aNum·c_t·10^(6−uS) + (aDen−aNum)·(l_{t−1} + b_{t−1}), aDen)
    *   b_t = rhaDiv(bNum·(l_t − l_{t−1}) + (bDen−bNum)·b_{t−1}, bDen)
    *
    * Same distributed shape: repartition(key) + sortWithinPartitions +
    * one constant-memory streaming pass — serial per key by nature, never
    * serial across keys. Both state values can be negative (a falling
    * level drives trend below zero); rhaDiv carries both sign branches.
    *
    * Output: (key, ord, value_units, level_micro, trend_micro). */
  def holtMicro(df: DataFrame, keyCol: String, ordCol: String,
                unitsCol: String, unitsScale: Int,
                alphaNum: Long, alphaDen: Long,
                betaNum: Long, betaDen: Long): DataFrame = {
    require(alphaDen > 0 && alphaNum > 0 && alphaNum <= alphaDen &&
      betaDen > 0 && betaNum > 0 && betaNum <= betaDen,
      s"alpha/beta must be in (0,1]: $alphaNum/$alphaDen, $betaNum/$betaDen")
    require(unitsScale >= 0 && unitsScale <= 6,
      s"unitsScale must be in [0,6], got $unitsScale")
    val spark = df.sparkSession
    import spark.implicits._
    val up = math.pow(10.0, 6 - unitsScale).toLong
    val prepared = df.select(
      col(keyCol).cast("long").as("key"),
      col(ordCol).cast("long").as("ord"),
      col(unitsCol).cast("long").as("units"))
      .repartition(col("key"))
      .sortWithinPartitions(col("key"), col("ord"))
    prepared.as[(Long, Long, Long)].mapPartitions { it =>
      // started flag, not a key sentinel (a key may be Long.MinValue)
      var started = false
      var curKey = 0L
      var lvl = 0L
      var trd = 0L
      it.map { case (k, o, c) =>
        if (!started || k != curKey) { started = true; lvl = c * up; trd = 0L }
        else {
          val prevLvl = lvl
          lvl = rhaDiv(alphaNum * c * up + (alphaDen - alphaNum) * (lvl + trd),
            alphaDen)
          trd = rhaDiv(betaNum * (lvl - prevLvl) + (betaDen - betaNum) * trd,
            betaDen)
        }
        curKey = k
        HoltMicroRow(k, o, c, lvl, trd)
      }
    }(Encoders.product[HoltMicroRow])
      .toDF("key", "ord", "value_units", "level_micro", "trend_micro")
      .withColumnRenamed("key", keyCol)
      .withColumnRenamed("ord", ordCol)
  }

  /** Page CUSUM change-point detector over an EXACT integer micro series
    * (round 9) — the control chart that fires on a sustained mean SHIFT
    * rather than a single outlier (the q_anom1 z-score's blind spot):
    *
    *   s⁺_t = max(0, s⁺_{t−1} + x_t − k)   alarm 'up'   when s⁺ > h
    *   s⁻_t = min(0, s⁻_{t−1} + x_t + k)   alarm 'down' when s⁻ < −h
    *
    * with the textbook post-alarm reset to 0 (detection restarts). k is
    * the drift allowance, h the decision threshold, both in micro. The
    * two alarms are mutually exclusive per step (up needs x > k, down
    * needs x < −k). Pure integer arithmetic — engine-exact; emitted
    * s⁺/s⁻ are the PRE-reset values (what the alarm fired on).
    * Same distributed shape as [[emaMicro]]: serial per key, never
    * across keys. */
  def cusumMicro(df: DataFrame, keyCol: String, ordCol: String,
                 microCol: String, kMicro: Long, hMicro: Long): DataFrame = {
    require(kMicro >= 0 && hMicro > 0, s"need k >= 0 < h: $kMicro, $hMicro")
    val spark = df.sparkSession
    import spark.implicits._
    val prepared = df.select(
      col(keyCol).cast("long").as("key"),
      col(ordCol).cast("long").as("ord"),
      col(microCol).cast("long").as("x"))
      .repartition(col("key"))
      .sortWithinPartitions(col("key"), col("ord"))
    prepared.as[(Long, Long, Long)].mapPartitions { it =>
      // started flag, not a key sentinel (a key may be Long.MinValue);
      // the reset state is 0/0 so the seed is the same either way, but
      // the pattern stays uniform with emaMicro/holtMicro
      var started = false
      var curKey = 0L
      var sp = 0L
      var sn = 0L
      it.map { case (k, o, x) =>
        if (!started || k != curKey) { started = true; sp = 0L; sn = 0L }
        sp = math.max(0L, sp + x - kMicro)
        sn = math.min(0L, sn + x + kMicro)
        val alarm =
          if (sp > hMicro) Some("up")
          else if (sn < -hMicro) Some("down") else None
        val row = CusumRow(k, o, x, sp, sn, alarm)
        if (sp > hMicro) sp = 0L
        if (sn < -hMicro) sn = 0L
        curKey = k
        row
      }
    }(Encoders.product[CusumRow])
      .toDF("key", "ord", "x", "sp_micro", "sn_micro", "alarm")
      .withColumnRenamed("key", keyCol)
      .withColumnRenamed("ord", ordCol)
  }

  /** In-memory reference of [[cusumMicro]] for tests. */
  def cusumReference(xs: Seq[Long], kMicro: Long, hMicro: Long)
      : Seq[(Long, Long, Option[String])] = {
    var sp = 0L; var sn = 0L
    xs.map { x =>
      sp = math.max(0L, sp + x - kMicro)
      sn = math.min(0L, sn + x + kMicro)
      val alarm =
        if (sp > hMicro) Some("up")
        else if (sn < -hMicro) Some("down") else None
      val out = (sp, sn, alarm)
      if (sp > hMicro) sp = 0L
      if (sn < -hMicro) sn = 0L
      out
    }
  }

  /** In-memory reference of [[holtMicro]] for tests. */
  def holtMicroReference(units: Seq[Long], alphaNum: Long, alphaDen: Long,
                         betaNum: Long, betaDen: Long,
                         unitsScale: Int): Seq[(Long, Long)] = {
    val up = math.pow(10.0, 6 - unitsScale).toLong
    units.headOption.map { h =>
      units.tail.scanLeft((h * up, 0L)) { case ((l, b), c) =>
        val nl = rhaDiv(alphaNum * c * up + (alphaDen - alphaNum) * (l + b),
          alphaDen)
        val nb = rhaDiv(betaNum * (nl - l) + (betaDen - betaNum) * b, betaDen)
        (nl, nb)
      }
    }.getOrElse(Seq.empty)
  }

  /** Rolling volatility over EXACT micro-unit returns (round 9 — the
    * flagship risk feature of the reference's domain, in the q_ta1/q_ta3
    * numeric discipline): per key, the period-over-period return is
    * quantized ONCE to exact integer micro
    * (r_micro = rhaDiv((c_t − c_{t−1})·1e6, c_{t−1}), the emaMicro
    * rounding rule — no IEEE division survives into state), then the
    * rolling sample standard deviation comes from exact BIGINT window
    * sums (Σr, Σr², n) with the double formula applied once at the end —
    * the meanSd pattern, so the emitted vol is a bit-identical chain on
    * every engine (casts of exact integers, same-order arithmetic, one
    * correctly-rounded sqrt).
    *
    * All windowed — one shuffle on the key, no serial pass (unlike the
    * genuinely recursive EMA). Requires positive `unitsCol` values
    * (returns are undefined at c ≤ 0; revenue/price series by
    * construction). Overflow: |r_micro| ≤ 1e6·max-swing — the window sum
    * of squares needs window·r² < 2^63, i.e. a 100x daily swing (r =
    * 1e8) holds to window ≈ 900.
    *
    * Output: (key, ord, value_units, r_micro — null on each key's first
    * row, vol_micro — sample stddev of the window's returns in micro
    * units, 0.0 when fewer than 2 returns are in frame). */
  def rollingVolMicro(df: DataFrame, keyCol: String, ordCol: String,
                      unitsCol: String, window: Int): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(ordCol))
    val wv = Window.partitionBy(col(keyCol)).orderBy(col(ordCol))
      .rowsBetween(-(window - 1), 0)
    val c = col(unitsCol).cast("long")
    // rhaDiv as a Column: round-half-away integer division, both
    // branches routed through non-negative operands so floor == truncate
    // on any engine (the emaMicro oracle convention)
    val withR = df.select(col(keyCol), col(ordCol), c.as("__u"))
      .withColumn("__prev", lag(col("__u"), 1).over(w))
      .withColumn("__a", (col("__u") - col("__prev")) * lit(1000000L))
      .withColumn("r_micro",
        when(col("__prev").isNull, lit(null).cast("long"))
          .when(col("__a") >= 0, expr("(2 * __a + __prev) div (2 * __prev)"))
          .otherwise(-expr("(-2 * __a + __prev) div (2 * __prev)")))
    val n = count(col("r_micro")).over(wv).cast("double")
    val s = sum(col("r_micro")).over(wv).cast("double")
    val sq = sum(col("r_micro") * col("r_micro")).over(wv).cast("double")
    withR
      .withColumn("vol_micro",
        when(n > 1.0, sqrt(greatest((sq - s * s / n) / (n - lit(1.0)), lit(0.0))))
          .otherwise(lit(0.0)))
      .select(col(keyCol), col(ordCol), col("__u").as("value_units"),
        col("r_micro"), col("vol_micro"))
  }

  /** Per-key exact micro-unit returns — the r_micro quantization step of
    * [[rollingVolMicro]] factored out for the CROSS-series features
    * (rolling beta q_ta12, lead-lag correlation q_corr2). Emits
    * (keyCols..., ordCol, value_units, r_micro) with r_micro null on each
    * key's first row; `keyCols` may be empty for a single global series
    * (the market index — one row per period, so the unpartitioned window
    * is a non-issue). `clampMicro > 0` clips the return to ±clampMicro
    * (null-preserving — Spark's greatest/least SKIP nulls, so the clamp
    * must branch explicitly or a first-row null would collapse to
    * -clampMicro and survive downstream null filters). The clip is both
    * the robust-feature practice for ratio features and the OVERFLOW
    * BOUND for downstream sums of products: with |r| ≤ C and window n,
    * Σr² ≤ n·C² must stay under 2^63 (C = 1e7, n = 2500 ⇒ 2.5e17 ✓). */
  def returnsMicro(df: DataFrame, keyCols: Seq[String], ordCol: String,
                   unitsCol: String, clampMicro: Long = 0L): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(ordCol))
    val c = col(unitsCol).cast("long")
    val base = df.select(keyCols.map(col) :+ col(ordCol) :+ c.as("__u"): _*)
      .withColumn("__prev", lag(col("__u"), 1).over(w))
      .withColumn("__a", (col("__u") - col("__prev")) * lit(1000000L))
      .withColumn("r_micro",
        when(col("__prev").isNull, lit(null).cast("long"))
          .when(col("__a") >= 0, expr("(2 * __a + __prev) div (2 * __prev)"))
          .otherwise(-expr("(-2 * __a + __prev) div (2 * __prev)")))
    val clamped =
      if (clampMicro > 0)
        base.withColumn("r_micro",
          when(col("r_micro").isNull, lit(null).cast("long"))
            .otherwise(least(greatest(col("r_micro"), lit(-clampMicro)),
              lit(clampMicro))))
      else base
    clamped.select(keyCols.map(col) :+ col(ordCol) :+
      col("__u").as("value_units") :+ col("r_micro"): _*)
  }

  /** In-memory reference of [[emaMicro]] for tests (inputs already in
    * `unitsScale`-dp units). */
  def emaMicroReference(units: Seq[Long], alphaNum: Long, alphaDen: Long,
                        unitsScale: Int): Seq[Long] = {
    val up = math.pow(10.0, 6 - unitsScale).toLong
    units.tail.scanLeft(units.head * up)((prev, c) =>
      rhaDiv(alphaNum * c * up + (alphaDen - alphaNum) * prev, alphaDen))
  }

  /** ENGINE-VERSION-EXACT parabolic SAR (round 11) — Wilder's stop-and-
    * reverse trail, the classic trend-following stop: the SAR accelerates
    * toward the extreme point (EP) of the current trend and REVERSES when
    * price crosses it. Close-only adaptation (the daily frame carries no
    * intraday high/low; close stands in for both — documented, not
    * hidden). Four-field integer state per key, the [[emaMicro]]
    * discipline (no IEEE result ever enters state):
    *
    *   init (first bar):    dir = +1, sar = ep = c₀·10^(6−uS), af = afStart
    *   each later bar:      sar += rhaDiv(af·(ep − sar), afDen)
    *     long  (dir = +1):  c < sar ⇒ reverse (dir = −1, sar = ep,
    *                        ep = c, af = afStart); else a new high bumps
    *                        ep and af (af = min(af + afStep, afMax))
    *     short (dir = −1):  mirror image.
    *
    * Same distributed shape as every serial recurrence here:
    * repartition(key) + sortWithinPartitions + one constant-memory
    * streaming pass. Overflow: af·|ep − sar| ≤ afMax·2·maxMicro — at
    * cents scale and afMax 20 that is ~1.6e13 « 2^63.
    * Output: (key, ord, value_units, sar_micro, dir ∈ {−1, +1}). */
  def sarMicro(df: DataFrame, keyCol: String, ordCol: String,
               unitsCol: String, unitsScale: Int,
               afStart: Long = 2L, afStep: Long = 2L, afMax: Long = 20L,
               afDen: Long = 100L): DataFrame = {
    require(afDen > 0 && afStart > 0 && afStep > 0 && afMax >= afStart &&
      afMax <= afDen, s"af ladder out of range: $afStart/$afStep/$afMax/$afDen")
    require(unitsScale >= 0 && unitsScale <= 6,
      s"unitsScale must be in [0,6], got $unitsScale")
    val spark = df.sparkSession
    import spark.implicits._
    val up = math.pow(10.0, 6 - unitsScale).toLong
    val prepared = df.select(
      col(keyCol).cast("long").as("key"),
      col(ordCol).cast("long").as("ord"),
      col(unitsCol).cast("long").as("units"))
      .repartition(col("key"))
      .sortWithinPartitions(col("key"), col("ord"))
    prepared.as[(Long, Long, Long)].mapPartitions { it =>
      // started flag, not a key sentinel (a key may be Long.MinValue)
      var started = false
      var curKey = 0L
      var dir = 1L
      var sar = 0L
      var ep = 0L
      var af = afStart
      it.map { case (k, o, c) =>
        val cm = c * up
        if (!started || k != curKey) {
          started = true; dir = 1L; sar = cm; ep = cm; af = afStart
        } else {
          sar += rhaDiv(af * (ep - sar), afDen)
          if (dir == 1L) {
            if (cm < sar) { dir = -1L; sar = ep; ep = cm; af = afStart }
            else if (cm > ep) { ep = cm; af = math.min(af + afStep, afMax) }
          } else {
            if (cm > sar) { dir = 1L; sar = ep; ep = cm; af = afStart }
            else if (cm < ep) { ep = cm; af = math.min(af + afStep, afMax) }
          }
        }
        curKey = k
        SarMicroRow(k, o, c, sar, dir)
      }
    }(Encoders.product[SarMicroRow])
      .toDF("key", "ord", "value_units", "sar_micro", "dir")
      .withColumnRenamed("key", keyCol)
      .withColumnRenamed("ord", ordCol)
  }
}
