package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Round-4 operational operators: sessionization, snapshot diff, binning,
  * exact stratified sampling, and the exact-sums correlation path. */
class OpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("assignSessions cuts sessions exactly at the gap boundary") {
    // user 1: events at 0s, 10s, 1810s (gap 1800 exceeded? 1800 is NOT
    // > 1800 -> same session), 3700s (gap 1890 > 1800 -> new session).
    val df = Seq(
      (1L, 1L, ts(0)), (1L, 2L, ts(10)), (1L, 3L, ts(1810)),
      (1L, 4L, ts(3700)), (2L, 5L, ts(50))
    ).toDF("user_id", "event_id", "ts")
    val out = Sessionize.assignSessions(df, "user_id", "ts", 1800, "event_id")
      .select("user_id", "event_id", "session_seq")
      .as[(Long, Long, Long)].collect().toSet
    assert(out === Set((1L, 1L, 1L), (1L, 2L, 1L), (1L, 3L, 1L),
      (1L, 4L, 2L), (2L, 5L, 1L)))
  }

  test("assignSessions costs ONE shuffle and ONE sort (windows share them)") {
    val df = Seq((1L, 1L, ts(0))).toDF("user_id", "event_id", "ts")
    val plan = Sessionize.assignSessions(df, "user_id", "ts", 1800, "event_id")
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size === 1, plan.take(1500))
    assert("Sort ".r.findAllIn(plan).size === 1, plan.take(1500))
  }

  test("sessionStats rolls up bounds, counts, and exact sums per session") {
    val df = Seq(
      (1L, 1L, ts(0), 1.25), (1L, 2L, ts(10), 2.50),
      (1L, 3L, ts(5000), 0.25)
    ).toDF("user_id", "event_id", "ts", "value")
    val out = Sessionize.sessionStats(df, "user_id", "ts", 1800, "value", "event_id")
      .select("user_id", "session_seq", "n_events", "value_sum")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(out === Set((1L, 1L, 2L, 3.75), (1L, 2L, 1L, 0.25)))
  }

  test("SnapshotDiff classifies added/removed/changed and drops unchanged") {
    val prev = Seq((1L, "A", 10.0), (2L, "B", 20.0), (3L, "C", 30.0),
      (5L, null.asInstanceOf[String], 50.0)).toDF("k", "st", "price")
    val next = Seq((2L, "B", 20.0), (3L, "X", 30.0), (4L, "D", 40.0),
      (5L, "E", 50.0)).toDF("k", "st", "price")
    val out = SnapshotDiff.diff(prev, next, Seq("k"), Seq("st", "price"))
      .select("k", "change_type").as[(Long, String)].collect().toMap
    // 1 removed, 2 unchanged (absent), 3 changed, 4 added, 5 null->E changed
    assert(out === Map(1L -> "removed", 3L -> "changed", 4L -> "added",
      5L -> "changed"))
  }

  test("SnapshotDiff is a single full-outer join, no extra shuffle of a side") {
    val prev = Seq((1L, "A")).toDF("k", "st")
    val next = Seq((1L, "A")).toDF("k", "st")
    val plan = SnapshotDiff.diff(prev, next, Seq("k"), Seq("st"))
      .queryExecution.executedPlan.toString
    assert("FullOuter".r.findAllIn(plan).size === 1, plan.take(1500))
  }

  test("fixedWidthHistogram clamps outliers into the edge bins") {
    val df = Seq(-5.0, 0.0, 9.99, 10.0, 25.0, 99.0, 250.0)
      .toDF("x")
    val out = Binning.fixedWidthHistogram(df, "x", lo = 0.0, width = 10.0, nBins = 10)
      .select("bin", "n").as[(Long, Long)].collect().toMap
    // -5 clamps to bin 0; 250 clamps to bin 9; 10.0 lands in bin 1.
    assert(out === Map(0L -> 3L, 1L -> 1L, 2L -> 1L, 9L -> 2L))
  }

  test("equiDepthBuckets fills buckets to within one row of each other") {
    val df = spark.range(0, 103).select(col("id").as("v"))
    val sizes = Binning.equiDepthBuckets(df, 8, Seq("v"))
      .groupBy("bucket").count().as[(Int, Long)].collect().toMap
    assert(sizes.keySet === (1 to 8).toSet)
    assert(sizes.values.max - sizes.values.min <= 1)
    assert(sizes.values.sum === 103L)
  }

  test("weightedMedian: weight skew moves the median; exact crossing picks the boundary value") {
    val df = Seq(
      // group a: values 1..4, weight piled on 4 -> median 4 (cum at 4 is
      // the first to reach half of 1+1+1+7 = 10)
      ("a", 1.0, 1L), ("a", 2.0, 1L), ("a", 3.0, 1L), ("a", 4.0, 7L),
      // group b: exact half-crossing AT value 1 (2*2 >= 4) -> lower median 1
      ("b", 1.0, 2L), ("b", 2.0, 2L),
      // group c: all-zero weights -> emits nothing
      ("c", 9.0, 0L)).toDF("g", "v", "w")
    val got = Binning.weightedMedian(df, "g", "v", "w")
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(got === Map("a" -> ((4.0, 10L)), "b" -> ((1.0, 4L))))
  }

  test("weightedMedian: unit weights reduce to the plain lower median") {
    val df = (1 to 9).map(i => ("k", i.toDouble, 1L)).toDF("g", "v", "w")
    val r = Binning.weightedMedian(df, "g", "v", "w").collect()
    assert(r.length === 1 && r(0).getDouble(1) === 5.0)
  }

  test("weightedQuartiles: unit weights reduce to lower quartiles; skew pulls them together") {
    val unit = (1 to 8).map(i => ("u", i.toDouble, 1L)).toDF("g", "v", "w")
    val r = Binning.weightedQuartiles(unit, "g", "v", "w").collect()(0)
    // crossings at cum>=2, >=4, >=6 of 8
    assert((r.getDouble(1), r.getDouble(2), r.getDouble(3)) === ((2.0, 4.0, 6.0)))
    // one value owns 90% of the weight -> all three quartiles land on it
    val skew = Seq(("s", 1.0, 1L), ("s", 2.0, 1L), ("s", 9.0, 18L)).toDF("g", "v", "w")
    val sk = Binning.weightedQuartiles(skew, "g", "v", "w").collect()(0)
    assert((sk.getDouble(1), sk.getDouble(2), sk.getDouble(3)) === ((9.0, 9.0, 9.0)))
    assert(sk.getLong(4) === 20L)
  }

  test("sample boundaries + broadcast assignment: ties go to the lower bucket") {
    val df = spark.range(1, 81).select(col("id").as("k"),
      col("id").cast("double").as("v"))
    // fraction 1.0 => the "sample" is the full set: bounds are exact
    // quartile maxima [20, 40, 60]
    val bounds = Binning.boundariesFromSample(df, "v", "k", fraction = 1.0, n = 4)
    assert(bounds.select("bounds").as[Seq[Double]].head() === Seq(20.0, 40.0, 60.0))
    val got = Binning.assignByBoundaries(df, "v", bounds)
      .select("k", "bucket").as[(Long, Long)].collect().toMap
    assert(got(20L) === 1L, "boundary value stays in the lower bucket")
    assert(got(21L) === 2L && got(60L) === 3L && got(61L) === 4L && got(80L) === 4L)
    assert(got.values.groupBy(identity).view.mapValues(_.size).toMap ===
      Map(1L -> 20, 2L -> 20, 3L -> 20, 4L -> 20))
  }

  test("boundariesFromSample: the row cap bounds the single-task sort at any fraction") {
    val df = spark.range(1, 10001).select(col("id").as("k"),
      col("id").cast("double").as("v"))
    // fraction 1.0 but cap 500 => effective fraction 500/10000 = 5% — the
    // SAME hash threshold an explicit fraction=0.05 produces, so the two
    // calls must yield identical boundaries (proves the cap binds and
    // reduces to the plain fraction path, nothing else)
    val capped = Binning.boundariesFromSample(df, "v", "k",
      fraction = 1.0, n = 4, maxSampleRows = 500L)
    val fractional = Binning.boundariesFromSample(df, "v", "k", fraction = 0.05, n = 4)
    assert(capped.select("bounds").as[Seq[Double]].head() ===
      fractional.select("bounds").as[Seq[Double]].head())
    // and an unbinding cap leaves the full-sample boundaries untouched
    val loose = Binning.boundariesFromSample(df, "v", "k",
      fraction = 1.0, n = 4, maxSampleRows = 1000000L)
    assert(loose.select("bounds").as[Seq[Double]].head() ===
      Seq(2500.0, 5000.0, 7500.0))
  }

  test("psiReport: identical snapshots score exactly 0; a shifted tail drifts positive and finite") {
    val prev = spark.range(1, 1001).select(col("id").as("k"),
      col("id").cast("double").as("v"))
    val same = Binning.psiReport(prev, prev, "v", "k", fraction = 1.0, n = 4)
      .collect()
    assert(same.length === 4)
    // equal counts + equal totals => every share ratio is exactly 1 =>
    // every term ln(1)=0 => psi EXACTLY 0
    assert(same.forall(r => r.getLong(3) === 0L && r.getDouble(4) === 0.0))
    // shift everything up one bucket width: a quarter of the mass crosses
    // each boundary (values already in the unbounded top bucket moving
    // FURTHER up would be invisible to bucket counts — and should be)
    val drifted = prev.withColumn("v", col("v") + 250.0)
    val psi = Binning.psiReport(prev, drifted, "v", "k", fraction = 1.0, n = 4)
      .head().getDouble(4)
    assert(psi > 0.0 && psi.isFinite, s"drift must be positive and finite, got $psi")
    // emptied-bucket extreme: everything lands in the top bucket
    val collapsed = prev.withColumn("v", col("v") + 10000.0)
    val psiC = Binning.psiReport(prev, collapsed, "v", "k", fraction = 1.0, n = 4)
      .head().getDouble(4)
    assert(psiC > psi && psiC.isFinite, "add-one smoothing keeps empty buckets finite")
  }

  test("winsorize clips into the sampled percentile band; tiny samples degrade to no clip") {
    val df = spark.range(1, 1001).select(col("id").as("k"),
      col("id").cast("double").as("v"))
    // fraction 1.0 => exact percentiles of 1..1000: p5 = 50, p95 = 950
    val out = Binning.winsorize(df, "v", "k", loPct = 5, hiPct = 95, fraction = 1.0)
      .select("v", "v_w").as[(Double, Double)].collect().toMap
    assert(out(25.0) === 50.0 && out(50.0) === 50.0, "below-p5 clips up")
    assert(out(500.0) === 500.0, "in-band values untouched")
    assert(out(999.0) === 950.0 && out(950.0) === 950.0, "above-p95 clips down")
    // a 10-row sample leaves ntile buckets 11..99 empty: the hi bound is
    // null and greatest/least ignore it — upper side degrades to no clip
    val tiny = spark.range(1, 11).select(col("id").as("k"), col("id").cast("double").as("v"))
    val tout = Binning.winsorize(tiny, "v", "k", loPct = 5, hiPct = 95, fraction = 1.0)
      .select("v", "v_w").as[(Double, Double)].collect().toMap
    assert(tout(10.0) === 10.0, "missing upper bound must not clip")
  }

  test("stratifiedExact takes exactly ceil(frac*n) per stratum, key-stable") {
    val df = spark.range(0, 1000).select(col("id"),
      (col("id") % 3).cast("string").as("g"))
    val out = DataSplit.stratifiedExact(df, "g", "id", 0.25)
    val counts = out.groupBy("g").count().as[(String, Long)].collect().toMap
    // strata sizes: g=0 -> 334, g=1/2 -> 333; ceil(0.25*n) = 84
    assert(counts === Map("0" -> 84L, "1" -> 84L, "2" -> 84L))
    // membership is a pure function of the key: repartitioning changes nothing
    val again = DataSplit.stratifiedExact(df.repartition(17), "g", "id", 0.25)
    assert(out.select("id").as[Long].collect().toSet ===
      again.select("id").as[Long].collect().toSet)
  }

  test("overlapJoin equals the naive inequality join, each pair exactly once") {
    // intervals engineered to span multiple buckets, share buckets without
    // overlapping, and tie exactly at the closed boundary
    val a = Seq((1L, 10L, 0L, 250L), (1L, 11L, 300L, 1000L),
      (1L, 12L, 999L, 999L), (2L, 20L, 0L, 5000L))
      .toDF("k", "aid", "s", "e")
    val b = Seq((1L, 90L, 250L, 260L), (1L, 91L, 1000L, 2000L),
      (1L, 92L, 261L, 299L), (2L, 93L, 4000L, 4001L), (3L, 94L, 0L, 9999L))
      .toDF("k", "bid", "ws", "we")
    val got = IntervalJoin.overlapJoin(a, b, "k", "s", "e", "ws", "we",
        bucketWidth = 100L)
      .select("aid", "bid").as[(Long, Long)].collect().sorted.toSeq
    // naive reference: plain inequality join (fine at test size)
    val expect = a.as[(Long, Long, Long, Long)].collect().flatMap { case (k, aid, s, e) =>
      b.as[(Long, Long, Long, Long)].collect().collect {
        case (k2, bid, ws, we) if k == k2 && s <= we && ws <= e => (aid, bid)
      }
    }.sorted.toSeq
    assert(got === expect)
    assert(got === got.distinct, "canonical-bucket emission must not duplicate")
    assert(got.contains((10L, 90L)), "closed-boundary touch (e == ws) must match")
  }

  test("overlapJoin drops inverted intervals instead of joining them wrongly") {
    // end < start is bad upstream data: sequence(lo, hi) would generate a
    // DESCENDING bucket range for it — wrong candidate buckets, spurious
    // pairs. The guard must drop the row, keep everything else.
    val a = Seq((1L, 10L, 0L, 250L), (1L, 11L, 900L, 100L)) // 11 inverted
      .toDF("k", "aid", "s", "e")
    val b = Seq((1L, 90L, 200L, 260L), (1L, 91L, 100L, 900L))
      .toDF("k", "bid", "ws", "we")
    val got = IntervalJoin.overlapJoin(a, b, "k", "s", "e", "ws", "we", 100L)
      .select("aid", "bid").as[(Long, Long)].collect().toSet
    assert(got === Set((10L, 90L), (10L, 91L)),
      s"inverted interval must produce no pairs, got $got")
  }

  test("overlapJoin plans a hash join — never BroadcastNestedLoop/cartesian") {
    val a = Seq((1L, 10L, 0L, 250L)).toDF("k", "aid", "s", "e")
    val b = Seq((1L, 90L, 250L, 260L)).toDF("k", "bid", "ws", "we")
    val p = IntervalJoin.overlapJoin(a, b, "k", "s", "e", "ws", "we", 100L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(1500))
  }

  test("zScores flags the planted outlier and nulls zero-variance groups") {
    val df = (Seq.fill(20)(10.0) :+ 100.0).zipWithIndex
      .map { case (v, i) => ("g1", i, v) }
      .++(Seq(("flat", 100, 5.0), ("flat", 101, 5.0)))
      .toDF("g", "i", "v")
    val out = Anomaly.zScores(df, "g", "v", scale = 0, threshold = 2.0)
    val flagged = out.where(col("is_outlier")).select("g", "i")
      .as[(String, Int)].collect().toSet
    assert(flagged === Set(("g1", 20)))
    val flat = out.where(col("g") === "flat").select("z")
      .collect().map(_.isNullAt(0))
    assert(flat.forall(identity), "zero-variance groups must have null z")
  }

  test("robustOutliers: MAD gate fires where the outlier-inflated sigma hides it") {
    // g1: 21 values (10..29 + one 10000) — the outlier lifts sigma to
    // ~2200, so EVERY inlier sits at |z| < 1 and a z-gate barely sees the
    // outlier; median = 20 (11th of 21), deviations sorted give MAD = 5
    // ⇒ only 10000 crosses 3·MAD. "flat": MAD = 0 ⇒ never flagged.
    // "single": 1 row, MAD 0.
    val df = ((10 to 29).map(v => ("g1", v, v.toDouble)) :+ ("g1", 99, 10000.0))
      .++(Seq(("flat", 1, 5.0), ("flat", 2, 5.0), ("flat", 3, 6.0),
        ("single", 1, 42.0)))
      .toDF("g", "i", "v")
    val out = Anomaly.robustOutliers(df, "g", "v", scale = 0, k = 3.0)
    val flagged = out.where(col("is_outlier")).select("g", "i")
      .as[(String, Int)].collect().toSet
    assert(flagged === Set(("g1", 99)))
    val g1 = out.where(col("g") === "g1").select("med", "mad").head()
    assert(g1.getDouble(0) === 20.0 && g1.getDouble(1) === 5.0)
    val zeroMad = out.where(col("g").isin("flat", "single"))
      .select("robust_z").collect()
    assert(zeroMad.forall(_.isNullAt(0)),
      "zero-MAD groups must have null robust_z")
    assert(out.where(col("g") === "flat" && col("mad") =!= 0.0).count() === 0)
  }

  test("Normalize: min-max hits exact endpoints, nulls constant groups; percent_rank is outlier-robust") {
    val df = Seq(
      ("g", 1, 10.0), ("g", 2, 20.0), ("g", 3, 30.0), ("g", 4, 1000000.0),
      ("const", 1, 5.0), ("const", 2, 5.0))
      .toDF("k", "i", "v")
    val out = Normalize.percentRank(
        Normalize.minMax(df, "k", "v", scale = 2, "mm"),
        "k", Seq(col("v"), col("i")), "pr")
      .select("k", "i", "mm", "pr").collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (Option(r.get(2)), r.getDouble(3))).toMap
    assert(out(("g", 1)) === (Some(0.0), 0.0)) // exact endpoints
    assert(out(("g", 4)) === (Some(1.0), 1.0))
    // the outlier squashes min-max (20 maps to ~1e-5) but percent_rank
    // keeps the inliers evenly spread — the robustness claim
    assert(out(("g", 2))._1.get.asInstanceOf[Double] < 1e-4)
    assert(out(("g", 2))._2 === 1.0 / 3.0)
    assert(out(("const", 1))._1 === None, "constant group must null min-max")
    assert(out(("const", 1))._2 === 0.0) // ties: percent_rank of first = 0
  }

  test("Normalize: the min-max + rank pair costs ONE exchange") {
    val df = Seq(("g", 1, 1.0)).toDF("k", "i", "v")
    val plan = Normalize.percentRank(
        Normalize.minMax(df, "k", "v", scale = 2, "mm"),
        "k", Seq(col("v"), col("i")), "pr")
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size === 1, plan)
  }

  test("Trend.slopes: exact line recovered; constant regressor yields null, never a fake trend") {
    val df = Seq(
      ("up", 0L, 10.0), ("up", 1L, 12.0), ("up", 2L, 14.0),
      ("flatx", 5L, 1.0), ("flatx", 5L, 2.0), ("one", 3L, 7.0))
      .toDF("k", "x", "v")
    val out = Trend.slopes(df, "k", col("x"), "v", scale = 0)
      .select("k", "slope", "intercept").collect()
      .map(r => r.getString(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(out("up") === (Some(2.0), Some(10.0))) // small ints: IEEE-exact
    assert(out("flatx") === (None, None), "zero denominator must null out")
    assert(out("one") === (None, None), "single observation has no trend")
  }

  test("Trend.slopes: decimal accumulators survive a product sum past BIGINT") {
    // x=100, v=9.2e17 => one x*v term is 9.2e19 > Long.MaxValue: a BIGINT
    // accumulator wraps to garbage (and a bare long PRODUCT wraps before
    // summing); the decimal path recovers the true slope 9.2e15.
    val df = Seq(("g", 0L, 0.0), ("g", 100L, 9.2e17)).toDF("k", "x", "v")
    val slope = Trend.slopes(df, "k", col("x"), "v", scale = 0)
      .select("slope").head().getDouble(0)
    assert(math.abs(slope / 9.2e15 - 1.0) < 1e-9, slope.toString)
  }

  test("Trend.slopes: constant large-magnitude regressor nulls out even if the IEEE denom rounds positive") {
    // x identical at epoch-microsecond magnitude: n*sumXX and sumX^2 are
    // ~4.3e33 each (ulp ~5e17), so the mathematically-zero denominator is
    // at the mercy of double rounding — the countDistinct guard must null
    // the slope regardless of which way it rounds.
    val x = 1723500000000000L // ~2024 in epoch micros
    val df = Seq(("k", x, 1.0), ("k", x, 5.0), ("k", x, 9.0)).toDF("k", "x", "v")
    val r = Trend.slopes(df, "k", col("x"), "v", scale = 2).head()
    assert(r.isNullAt(r.fieldIndex("slope")), "constant regressor => null slope")
    assert(r.isNullAt(r.fieldIndex("intercept")))
  }

  test("robustOutliers: two windows share ONE exchange") {
    val df = Seq(("g", 1, 1.0)).toDF("g", "i", "v")
    val plan = Anomaly.robustOutliers(df, "g", "v", scale = 0, k = 3.0)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size === 1, plan)
  }

  test("zScores stays exact when v*v exceeds BIGINT (decimal sufficient statistics)") {
    // |v| = 4e9 => v*v = 1.6e19 > Long.MaxValue: a BIGINT accumulator
    // silently wraps (and diverges from DuckDB's HUGEINT); the decimal
    // path must produce the true z = ±1 for a symmetric 2-point group
    val df = Seq(("g", 4000000000.0), ("g", 4000001000.0)).toDF("g", "v")
    val out = Anomaly.zScores(df, "g", "v", scale = 0, threshold = 2.0)
      .select("v", "z").as[(Double, Double)].collect().toMap
    // tolerance 1e-2, not 1e-6: the one-pass (sxx - sx²/n) formula cancels
    // ~3.2e19-scale doubles to a ~2.5e5-scale variance — ~1e-3 relative
    // error is inherent to the FORMULA (identically on both engines; the
    // exactness contract is cross-engine, not statistical). A wrapped
    // BIGINT accumulator yields garbage/null z here, not ±1.
    assert(math.abs(out(4000000000.0) + 1.0) < 1e-2, out.toString)
    assert(math.abs(out(4000001000.0) - 1.0) < 1e-2, out.toString)
  }

  test("exact-sums correlation matches a direct Pearson computation") {
    // two series over shared days with a known positive correlation
    val xs = (0 until 50).map(i => i.toLong * 100 + 37)
    val ys = xs.map(x => x * 3 + 1000 + (x % 7))  // near-perfect linear
    val n = xs.size.toDouble
    val (sx, sy) = (xs.sum.toDouble, ys.sum.toDouble)
    val sxy = xs.zip(ys).map { case (a, b) => a.toDouble * b }.sum
    val sxx = xs.map(a => a.toDouble * a).sum
    val syy = ys.map(b => b.toDouble * b).sum
    val expect = (n * sxy - sx * sy) /
      (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    val daily = xs.indices.map(i => (1L, i, xs(i))) ++
      ys.indices.map(i => (2L, i, ys(i)))
    val df = daily.toDF("k", "day", "cents")
    val a = df.select(col("k").as("ka"), col("day"), col("cents").as("xa"))
    val b = df.select(col("k").as("kb"), col("day"), col("cents").as("xb"))
    val stats = a.join(b, "day").where(col("ka") < col("kb"))
      .groupBy("ka", "kb").agg(count(lit(1)).as("n"),
        sum("xa").as("sx"), sum("xb").as("sy"),
        sum(col("xa") * col("xb")).as("sxy"),
        sum(col("xa") * col("xa")).as("sxx"),
        sum(col("xb") * col("xb")).as("syy"))
    def d(c: String) = col(c).cast("double")
    val corr = (d("n") * d("sxy") - d("sx") * d("sy")) /
      (sqrt(d("n") * d("sxx") - d("sx") * d("sx")) *
       sqrt(d("n") * d("syy") - d("sy") * d("sy")))
    val got = stats.select(corr).as[Double].head()
    assert(math.abs(got - expect) < 1e-12, s"got $got expect $expect")
    assert(got > 0.999)
  }

  test("interval coverage: overlap merges, adjacency does not, duplicates counted once") {
    // key 1: [1,5] [3,8] overlap -> island [1,8]; [9,12] is ADJACENT to
    //        nothing ([8]+1=9 touches but does not overlap) -> own island;
    //        [10,11] nests inside [9,12]. covered = 8 + 4 = 12, span = 12.
    // key 2: identical duplicate intervals [4,6] x2 -> one island, covered 3.
    val iv = Seq(
      (1L, 1L, 5L, 1L), (1L, 3L, 8L, 2L), (1L, 9L, 12L, 3L), (1L, 10L, 11L, 4L),
      (2L, 4L, 6L, 5L), (2L, 4L, 6L, 6L)
    ).toDF("k", "s", "e", "id")
    val got = IntervalJoin.coverage(iv, Seq("k"), "s", "e", Seq("id"))
      .select("k", "n_intervals", "n_islands", "covered_units", "span_units")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sorted
    assert(got === Seq((1L, 4L, 2L, 12L, 12L), (2L, 2L, 1L, 3L, 3L)))
    // a contained interval arriving FIRST in start order still merges
    // (running max end, not last end): [1,10] then [2,3] then [4,5]
    val nest = Seq((9L, 1L, 10L, 1L), (9L, 2L, 3L, 2L), (9L, 4L, 5L, 3L))
      .toDF("k", "s", "e", "id")
    val g2 = IntervalJoin.coverage(nest, Seq("k"), "s", "e", Seq("id"))
      .select("n_islands", "covered_units").as[(Long, Long)].head()
    assert(g2 === ((1L, 10L)))
  }
}
