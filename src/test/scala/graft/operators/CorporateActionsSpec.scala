package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CorporateActionsSpec extends SparkSpec {
  import spark.implicits._

  // key 1: adjusted closes 100, 102, 104, 106 cents with a 2:1 split
  // effective at ord 2 -> raw = adj * (factor product of events after t):
  // raw = 200, 204, 104, 106. key 2: no events, raw == adj.
  private val series = Seq(
    (1L, 0L, 200L, 100L), (1L, 1L, 204L, 102L),
    (1L, 2L, 104L, 104L), (1L, 3L, 106L, 106L),
    (2L, 0L, 50L, 50L), (2L, 1L, 55L, 55L)
  ).toDF("k", "ord", "raw", "adj")

  test("splitEvents: exact ratio-change detection, integer fast path, no-event key silent") {
    val ev = CorporateActions.splitEvents(series, Seq("k"), "ord", "raw", "adj")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), Option(r.get(4))))
    assert(ev.length === 1)
    val (k, ord, num, den, fi) = ev.head
    assert(k === 1L && ord === 2L)
    // factor = R_prev*A / (R*A_prev) = 204*104 / (104*102) = 2
    assert(num === 204L * 104L && den === 104L * 102L && fi === Some(2L))
  }

  test("splitEvents: a 3:2 split keeps the exact rational, factor_int null") {
    // raw = adj * 3/2 before the event at ord 1
    val s32 = Seq((7L, 0L, 150L, 100L), (7L, 1L, 104L, 104L))
      .toDF("k", "ord", "raw", "adj")
    val ev = CorporateActions.splitEvents(s32, Seq("k"), "ord", "raw", "adj")
      .collect()
    assert(ev.length === 1)
    val r = ev.head
    // num/den = 150*104 / (104*100) = 3/2 (unreduced)
    assert(r.getLong(2) === 150L * 104L && r.getLong(3) === 104L * 100L)
    assert(r.isNullAt(4), "3:2 is not an integer factor")
  }

  test("backAdjust: detected events rebuild the adjusted series exactly; rational factors work") {
    val ev = CorporateActions.splitEvents(series, Seq("k"), "ord", "raw", "adj")
      .select(col("k"), col("ord"), col("factor_int").as("fnum"),
        lit(1L).as("fden"))
    val got = CorporateActions.backAdjust(series, Seq("k"), "ord", "raw", ev)
      .select("k", "ord", "adj", "adj_rebuilt")
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    got.foreach { case (k, ord, adj, rebuilt) =>
      assert(rebuilt === adj, s"($k,$ord): $rebuilt != $adj")
    }
    // rational 3:2 factor path: raw 150 at ord 0 with event (3,2) at ord 1
    val s32 = Seq((7L, 0L, 150L, 100L), (7L, 1L, 104L, 104L))
      .toDF("k", "ord", "raw", "adj")
    val ev32 = Seq((7L, 1L, 3L, 2L)).toDF("k", "ord", "fnum", "fden")
    val got32 = CorporateActions.backAdjust(s32, Seq("k"), "ord", "raw", ev32)
      .select("ord", "adj_rebuilt").as[(Long, Long)].collect().toMap
    assert(got32 === Map(0L -> 100L, 1L -> 104L))
  }

  test("backAdjust: the per-key event bound fails fast on a fact-scale 'event' table") {
    val big = (1 to 2000).map(i => (9L, i.toLong, 2L, 1L))
      .toDF("k", "ord", "fnum", "fden")
    val df = Seq((9L, 0L, 100L)).toDF("k", "ord", "raw")
    val e = intercept[Exception] {
      CorporateActions.backAdjust(df, Seq("k"), "ord", "raw", big,
        maxEventsPerKey = 1000).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("not an event table")), msgs(e).mkString(" | "))
  }

  test("classifyEvents labels every action kind with exact ratios and amounts") {
    // One key per kind. adj constant; raw multiplier changes at ord 1 by
    // the planted factor (raw = adj·c, factor = c_prev/c_curr).
    val rows = Seq(
      // 2:1 split: c 6 -> 3
      (1L, 0L, 600L, 100L), (1L, 1L, 300L, 100L),
      // reverse 1:5: c 1 -> 5
      (2L, 0L, 700L, 700L), (2L, 1L, 3500L, 700L),
      // 3:2 split (small rational): c 3 -> 2
      (3L, 0L, 3000L, 1000L), (3L, 1L, 2000L, 1000L),
      // dividend (factor 21/20): c 21 -> 20; the ex-day price drop IS the
      // dividend: R_prev 2100 -> R_t 2000 => D = 100 (= R_prev·(1−den/num))
      (4L, 0L, 2100L, 100L), (4L, 1L, 2000L, 100L),
      // unknown: factor 1000:999 (0.1% — under no classification)
      (5L, 0L, 1000000L, 999L), (5L, 1L, 999000L, 999L))
      .toDF("k", "ord", "raw", "adj")
    val got = CorporateActions.classifyEvents(rows, Seq("k"), "ord", "raw", "adj")
      .select("k", "action", "split_num", "split_den", "div_cents", "div_exact")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), Option(r.get(2)), Option(r.get(3)),
          Option(r.get(4)), Option(r.get(5)))).toMap
    assert(got(1L) === ("split", Some(2L), Some(1L), None, None))
    assert(got(2L) === ("reverse_split", Some(1L), Some(5L), None, None))
    assert(got(3L) === ("split", Some(3L), Some(2L), None, None))
    assert(got(4L) === ("dividend", None, None, Some(100L), Some(true)))
    // 1000/999 ≈ 1.001: within the 10% dividend zone by magnitude BUT the
    // zone starts above 1 — wait, 1000/999 > 1 and ≤ 1.1, so it IS a
    // dividend by the documented rule; assert that, not 'unknown'
    assert(got(5L)._1 === "dividend")
    // a genuinely unclassifiable factor: 997:800 (1.24625, not small-rational)
    val odd = Seq((6L, 0L, 99700L, 100L), (6L, 1L, 80000L, 100L))
      .toDF("k", "ord", "raw", "adj")
    val u = CorporateActions.classifyEvents(odd, Seq("k"), "ord", "raw", "adj")
      .select("action").as[String].head()
    assert(u === "unknown")
  }

  test("classifyEvents agrees with splitEvents on WHERE events fire") {
    val ev = CorporateActions.splitEvents(series, Seq("k"), "ord", "raw", "adj")
      .select("k", "ord").as[(Long, Long)].collect().toSet
    val cl = CorporateActions.classifyEvents(series, Seq("k"), "ord", "raw", "adj")
      .select("k", "ord").as[(Long, Long)].collect().toSet
    assert(ev === cl)
  }

  test("detection plans ONE key exchange; back-adjust broadcasts the event arrays") {
    val p1 = CorporateActions.splitEvents(series, Seq("k"), "ord", "raw", "adj")
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(p1).length === 1, p1.take(1200))
    val ev = Seq((1L, 2L, 2L, 1L)).toDF("k", "ord", "fnum", "fden")
    val p2 = CorporateActions.backAdjust(series, Seq("k"), "ord", "raw", ev)
      .queryExecution.executedPlan.toString
    assert(p2.contains("BroadcastHashJoin"), p2.take(1200))
  }

  test("splitEventReturns == splitEvents + returnsMicro + joins (fusion law, r16)") {
    // Random per-key integer series with planted ratio changes — both
    // return signs, clamp live (tiny clamp bound), multi-event keys, and
    // a no-event key. The fused single-window-pass form must equal the
    // composed three-pass form row for row.
    val rnd = new scala.util.Random(16L)
    val rows = (0L until 8L).flatMap { k =>
      var adj = 100L + rnd.nextInt(100)
      (0L until 20L).map { ord =>
        adj = math.max(1L, adj + rnd.nextInt(21) - 10)
        val mult = if (k % 2 == 0 && ord >= 10) 1L else if (k % 2 == 0) 3L else 1L
        (k, ord, adj * mult, adj)
      }
    }
    val df = rows.toDF("k", "ord", "raw", "adj")
    Seq(0L, 50000L).foreach { clamp =>
      def rets(c: String, out: String) =
        TechnicalIndicators.returnsMicro(df, Seq("k"), "ord", c, clampMicro = clamp)
          .select(col("k"), col("ord"), col("r_micro").as(out))
      val composed = CorporateActions.splitEvents(df, Seq("k"), "ord", "raw", "adj")
        .select("k", "ord")
        .join(rets("raw", "raw_ret_micro"), Seq("k", "ord"))
        .join(rets("adj", "adj_ret_micro"), Seq("k", "ord"))
        .withColumn("distortion_micro",
          col("adj_ret_micro") - col("raw_ret_micro"))
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      val fused = CorporateActions.splitEventReturns(
          df, Seq("k"), "ord", "raw", "adj", clampMicro = clamp)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(fused === composed, s"clamp=$clamp")
      assert(fused.nonEmpty, s"clamp=$clamp vacuous")
    }
  }
}
