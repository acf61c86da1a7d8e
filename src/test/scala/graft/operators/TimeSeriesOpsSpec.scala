package graft.operators

import java.sql.Date
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The round-7 diagnostics over regular integer series: autocorrelation,
  * two-window mean-shift change points, and additive seasonal
  * decomposition. Crafted series with hand-derivable answers; the engine
  * math is exact integer until a final division, so assertions are exact
  * (=== on doubles) wherever the expected value is representable.
  */
class TimeSeriesOpsSpec extends SparkSpec {
  import spark.implicits._

  private def series(key: String, xs: Seq[Long]) =
    xs.zipWithIndex.map { case (x, i) => (key, i.toLong, x) }
      .toDF("k", "idx", "x")

  test("acf: alternating series is perfectly anti-correlated at lag 1, correlated at lag 2") {
    // x = 0,10,0,10,... n even => mean exact; the sample ACF of a pure
    // period-2 square wave: r_1 = -(n-1)/n, r_2 = (n-2)/n (edge-clipped
    // sums of ±(n*5)^2 terms). n = 8: r_1 = -7/8, r_2 = 6/8.
    val df = series("a", Seq(0L, 10L, 0L, 10L, 0L, 10L, 0L, 10L))
    val rows = TimeSeriesOps.acf(df, "k", "idx", "x", maxLag = 2)
      .collect().map(r => r.getInt(1) -> r.getDouble(3)).toMap
    assert(rows(1) === -7.0 / 8.0)
    assert(rows(2) === 6.0 / 8.0)
  }

  test("acf: constant series yields null (den = 0), never NaN; n is the series length") {
    val df = series("c", Seq(5L, 5L, 5L, 5L))
    val rows = TimeSeriesOps.acf(df, "k", "idx", "x", maxLag = 2).collect()
    assert(rows.length === 2)
    assert(rows.forall(_.isNullAt(3)), "constant series must null every lag")
    assert(rows.forall(_.getLong(2) === 4L))
  }

  test("acf matches the brute-force estimator on an irregular-valued series") {
    val xs = Seq(3L, 1L, 4L, 1L, 5L, 9L, 2L, 6L, 5L, 3L)
    val n = xs.length
    val s = xs.sum
    def dev(i: Int) = n.toLong * xs(i) - s
    def brute(k: Int): Double = {
      val num = (k until n).map(i => BigInt(dev(i)) * BigInt(dev(i - k))).sum
      val den = (0 until n).map(i => BigInt(dev(i)) * BigInt(dev(i))).sum
      num.toDouble / den.toDouble
    }
    val rows = TimeSeriesOps.acf(series("b", xs), "k", "idx", "x", maxLag = 3)
      .collect().map(r => r.getInt(1) -> r.getDouble(3)).toMap
    (1 to 3).foreach(k => assert(rows(k) === brute(k), s"lag $k"))
  }

  test("meanShiftChangepoint: planted level shift found at the earliest max-|shift| point") {
    // 20 zeros then 20 hundreds, w=5: |R-L| maxes (500) at indices 19 and
    // 20; the (|shift| desc, idx asc) tie-break must pick 19.
    val df = series("s", Seq.fill(20)(0L) ++ Seq.fill(20)(100L))
    val rows = TimeSeriesOps.meanShiftChangepoint(df, "k", "idx", "x", w = 5)
      .collect()
    assert(rows.length === 1)
    assert(rows(0).getLong(1) === 19L)
    assert(rows(0).getLong(2) === 500L)
  }

  test("meanShiftChangepoint: keys shorter than 2w+1 emit nothing") {
    val df = series("tiny", Seq(1L, 2L, 3L, 4L))
    assert(TimeSeriesOps.meanShiftChangepoint(df, "k", "idx", "x", w = 5)
      .count() === 0L)
  }

  private def daySeries(key: String, start: String, xs: Seq[Long]) =
    xs.zipWithIndex.map { case (x, i) =>
      (key, Date.valueOf(java.time.LocalDate.parse(start).plusDays(i.toLong)), x)
    }.toDF("k", "day", "x")

  test("seasonalDecompose: a linear series is pure trend — zero seasonal, zero residual") {
    // x_t = 10t: the 7-day centered MA of a line IS the line, so the
    // detrended series is identically 0 and everything else follows.
    val df = daySeries("lin", "2024-01-01", (0 until 21).map(_ * 10L))
    val rows = TimeSeriesOps.seasonalDecompose(df, "k", "day", "x", halfWindow = 3)
      .collect()
    assert(rows.length === 15, "3 edge rows dropped each side")
    rows.foreach { r =>
      assert(r.getDouble(3) === r.getLong(2).toDouble, "trend = value on a line")
      assert(r.getLong(4) === 0L, "seasonal_micro")
      assert(r.getLong(5) === 0L, "residual_micro")
    }
  }

  test("seasonalDecompose: a planted weekly bump lands in exactly one weekday's seasonal") {
    // base 70 with +70 every Monday over 5 weeks: trend stays flat at
    // 80 (each 7-day window holds exactly one bump), so detrended is
    // +60/-10 and the Monday seasonal is exactly 60, others -10.
    val start = java.time.LocalDate.parse("2024-01-01") // a Monday
    val xs = (0 until 35).map(i => if (i % 7 == 0) 140L else 70L)
    val df = daySeries("w", start.toString, xs)
    val rows = TimeSeriesOps.seasonalDecompose(df, "k", "day", "x", halfWindow = 3)
      .collect()
    rows.foreach { r =>
      assert(r.getDouble(3) === 80.0, s"flat trend at ${r.getDate(1)}")
      val isMon = r.getDate(1).toLocalDate.getDayOfWeek.getValue == 1
      assert(r.getLong(4) === (if (isMon) 60000000L else -10000000L),
        s"seasonal_micro at ${r.getDate(1)}")
      assert(r.getLong(5) === 0L, s"residual_micro at ${r.getDate(1)}")
    }
  }

  test("seasonalDecompose: micro rounding is half-away-from-zero, exact on both signs") {
    // Seasonal means with non-terminating 7ths: base 0 with one +1 bump
    // per week makes Σd/(7n) land on fractional micro boundaries; assert
    // the integer rha formula against an independent BigDecimal compute.
    val xs = (0 until 28).map(i => if (i % 7 == 3) 9L else 2L)
    val df = daySeries("f", "2024-01-01", xs)
    val rows = TimeSeriesOps.seasonalDecompose(df, "k", "day", "x", halfWindow = 3)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val x = r.getLong(2)
      val t = math.round(r.getDouble(3) * 7).toLong // T is exact: trend*7
      val d = BigInt(7L * x - t)
      // recompute seasonal from scratch for this row's weekday cohort
      val dow = r.getDate(1).toLocalDate.getDayOfWeek.getValue
      val cohort = rows.filter(_.getDate(1).toLocalDate.getDayOfWeek.getValue == dow)
      val sd = cohort.map(c => BigInt(7L * c.getLong(2) -
        math.round(c.getDouble(3) * 7).toLong)).sum
      val b = BigInt(7L * cohort.length)
      def rha(a: BigInt, b: BigInt): BigInt =
        if (a >= 0) (2 * a + b) / (2 * b) else -((2 * (-a) + b) / (2 * b))
      val sm = rha(sd * 1000000, b)
      assert(r.getLong(4) === sm.toLong, s"seasonal_micro at ${r.getDate(1)}")
      val ra = d * 1000000 - 7 * sm
      assert(r.getLong(5) === rha(ra, BigInt(7)).toLong,
        s"residual_micro at ${r.getDate(1)}")
    }
  }
}
