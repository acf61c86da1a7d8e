package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TradingCalendarSpec extends SparkSpec {
  import spark.implicits._

  // market sessions: days 10, 11, 12, 15, 16 (13/14 are never traded by
  // anyone — NOT sessions). key 1 trades all its window's sessions; key 2
  // misses session 11 and 15 inside its window.
  private val daily = Seq(
    (1L, 10L, 100L), (1L, 11L, 110L), (1L, 12L, 120L),
    (2L, 10L, 50L), (2L, 12L, 70L), (2L, 16L, 90L),
    (3L, 15L, 30L), (3L, 16L, 31L)
  ).toDF("k", "day_ord", "cents")

  test("sessionCalendar: dense index over the union of observed days") {
    val cal = TradingCalendar.sessionCalendar(daily, "day_ord")
      .as[(Long, Long)].collect().toSeq.sorted
    assert(cal === Seq((10L, 1L), (11L, 2L), (12L, 3L), (15L, 4L), (16L, 5L)))
  }

  test("sessionAudit: expected counts CALENDAR sessions in the key's window, not days") {
    val cal = TradingCalendar.sessionCalendar(daily, "day_ord")
    val got = TradingCalendar.sessionAudit(daily, Seq("k"), "day_ord", cal)
      .select("k", "first_day", "last_day", "expected_sessions",
        "present_sessions", "missing_sessions")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq.sorted
    assert(got === Seq(
      (1L, 10L, 12L, 3L, 3L, 0L),   // complete history (the R13 screen keeps this)
      (2L, 10L, 16L, 5L, 3L, 2L),   // missing sessions 11 and 15 (not 13/14!)
      (3L, 15L, 16L, 2L, 2L, 0L)))
  }

  test("gapFillLocf: full grid, LOCF over gaps, was_present auditable") {
    val cal = TradingCalendar.sessionCalendar(daily, "day_ord")
    val got = TradingCalendar.gapFillLocf(daily, Seq("k"), "day_ord", "cents", cal)
      .where(col("k") === 2L)
      .select("session_idx", "day_ord", "was_present", "cents_filled")
      .as[(Long, Long, Boolean, Long)].collect().toSeq.sorted
    assert(got === Seq(
      (1L, 10L, true, 50L),
      (2L, 11L, false, 50L),  // gap: carried from day 10
      (3L, 12L, true, 70L),
      (4L, 15L, false, 70L),  // gap: carried from day 12
      (5L, 16L, true, 90L)))
    // never-null invariant: the grid starts at each key's first present day
    val all = TradingCalendar.gapFillLocf(daily, Seq("k"), "day_ord", "cents", cal)
    assert(all.where(col("cents_filled").isNull).count() === 0L)
  }

  test("nextSessionMap: gaps map forward, sessions map to themselves, lookback covers the head") {
    val cal = TradingCalendar.sessionCalendar(daily, "day_ord")
    val m = TradingCalendar.nextSessionMap(cal, lookbackDays = 2)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    // sessions: 10, 11, 12, 15, 16; lookback 2 covers days 8-9
    assert(m === Seq(
      (8L, 10L, 1L), (9L, 10L, 1L), (10L, 10L, 1L),
      (11L, 11L, 2L), (12L, 12L, 3L),
      (13L, 15L, 4L), (14L, 15L, 4L), (15L, 15L, 4L),
      (16L, 16L, 5L)))
    // the mapping is a function: one row per covered day
    assert(m.map(_._1).distinct.size === m.size)
  }

  test("alignCrossListed: union grid, per-side LOCF, staleness, overlap window") {
    // pair 1: A trades days 10,12,14 (holiday 11,13); B trades 11,12,13
    // (holiday 10 pre-listing, 14 post-window). Union sessions 10..14.
    val sides = Seq(
      (1L, "a", 10L, 100L), (1L, "a", 12L, 120L), (1L, "a", 14L, 140L),
      (1L, "b", 11L, 211L), (1L, "b", 12L, 212L), (1L, "b", 13L, 213L))
      .toDF("k", "side", "day_ord", "px")
    val got = TradingCalendar.alignCrossListed(sides, Seq("k"), "side",
        "day_ord", "px")
      .select("k", "session_idx", "day_ord", "a_px", "a_stale", "b_px", "b_stale")
      .as[(Long, Long, Long, Long, Boolean, Long, Boolean)]
      .collect().sortBy(_._2)
    // overlap = union sessions where BOTH are inside their listing window:
    // days 11 (B's first, A stale-carrying 100), 12 (both fresh), 13
    // (A stale 120, B fresh); day 10 (B unlisted) and 14 (B delisted) drop
    assert(got.map(r => (r._3, r._4, r._5, r._6, r._7)).toSeq === Seq(
      (11L, 100L, true, 211L, false),
      (12L, 120L, false, 212L, false),
      (13L, 120L, true, 213L, false)))
    // the per-pair session index is dense over the union calendar
    assert(got.map(_._2).toSeq === Seq(2L, 3L, 4L))
    // a stray side value fails fast instead of vanishing in the pivot
    val bad = Seq((1L, "c", 10L, 1L)).toDF("k", "side", "day_ord", "px")
    val e = intercept[Exception] {
      TradingCalendar.alignCrossListed(sides.unionByName(bad), Seq("k"),
        "side", "day_ord", "px").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("side must be 'a' or 'b'")),
      msgs(e).mkString(" | "))
    // a duplicate (pair, side, day) FACT row raises instead of silently
    // dropping the whole union session (round-12 advisory fix)
    val dup = Seq((1L, "a", 12L, 999L)).toDF("k", "side", "day_ord", "px")
    val e2 = intercept[Exception] {
      TradingCalendar.alignCrossListed(sides.unionByName(dup), Seq("k"),
        "side", "day_ord", "px").collect()
    }
    assert(msgs(e2).exists(_.contains("duplicate (pair, side, day)")),
      msgs(e2).mkString(" | "))
    // the harder case: a same-side duplicate on a day the OTHER side is
    // outside its window (total group count stays 2 — a total-count guard
    // would emit a phantom overlap session instead of raising)
    val dupEdge = Seq((1L, "a", 14L, 999L)).toDF("k", "side", "day_ord", "px")
    val e3 = intercept[Exception] {
      TradingCalendar.alignCrossListed(sides.unionByName(dupEdge), Seq("k"),
        "side", "day_ord", "px").collect()
    }
    assert(msgs(e3).exists(_.contains("duplicate (pair, side, day)")),
      msgs(e3).mkString(" | "))
  }

  test("plan shape: calendar joins broadcast; LOCF shares the grid's key shuffle") {
    val cal = TradingCalendar.sessionCalendar(daily, "day_ord")
    val p = TradingCalendar.gapFillLocf(daily, Seq("k"), "day_ord", "cents", cal)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(1500))
  }
}
