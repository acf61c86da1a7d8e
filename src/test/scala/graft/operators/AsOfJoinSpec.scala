package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val right = Seq(
    (1L, ts("2024-01-01 10:00:00"), 1.0, 100L),
    (1L, ts("2024-01-01 12:00:00"), 2.0, 101L),
    (1L, ts("2024-01-01 12:00:00"), 3.0, 102L), // tie on time: max event_id wins
    (2L, ts("2024-01-01 11:00:00"), 9.0, 200L)
  ).toDF("k", "t", "v", "eid")

  private val left = Seq(
    (1L, ts("2024-01-01 09:00:00"), "before-any"),
    (1L, ts("2024-01-01 12:00:00"), "exactly-at"), // at-or-before: inclusive
    (1L, ts("2024-01-01 23:00:00"), "after-all"),
    (2L, ts("2024-01-01 11:30:00"), "simple"),
    (3L, ts("2024-01-01 11:30:00"), "no-right-key")
  ).toDF("lk", "lt", "tag")

  private def run() = AsOfJoin.lastAtOrBefore(left, right,
    "lk", "lt", "k", "t", rightValueCols = Seq("v"), tieBreak = Seq("eid"))
    .select("tag", "asof_t", "asof_v").collect()
    .map(r => r.getString(0) -> ((Option(r.get(1)).map(_.toString), Option(r.get(2))))).toMap

  test("at-or-before semantics with deterministic ties") {
    val m = run()
    assert(m("before-any") === ((None, None)))
    // equal timestamp is included; among the two 12:00 rows eid=102 wins
    assert(m("exactly-at")._2 === Some(3.0))
    assert(m("after-all")._2 === Some(3.0))
    assert(m("simple")._2 === Some(9.0))
    assert(m("no-right-key") === ((None, None)))
  }

  test("range-join formulation agrees with union+window on every case") {
    val a = run()
    val b = AsOfJoin.lastAtOrBeforeViaRangeJoin(left, right,
      "lk", "lt", "k", "t", rightValueCols = Seq("v"), tieBreak = Seq("eid"))
      .select("tag", "asof_t", "asof_v").collect()
      .map(r => r.getString(0) -> ((Option(r.get(1)).map(_.toString), Option(r.get(2))))).toMap
    assert(a === b)
  }

  test("auto formulation picks broadcast range-join for a small right side, window for large") {
    def planOf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan.toString
    // 4-row right side: well under the broadcast threshold
    val small = planOf(AsOfJoin.lastAtOrBeforeAuto(left, right,
      "lk", "lt", "k", "t", Seq("v"), Seq("eid")))
    assert(small.contains("BroadcastHashJoin"), s"expected broadcast plan:\n$small")
    assert(!small.contains("Window"), "small-right path must not sort a window")
    // broadcast disabled => same call must fall back to the union+window shape
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val large = planOf(AsOfJoin.lastAtOrBeforeAuto(left, right,
        "lk", "lt", "k", "t", Seq("v"), Seq("eid")))
      assert(large.contains("Window"), s"expected union+window plan:\n$large")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("forward as-of: earliest right at-or-after, min tie-break") {
    val out = AsOfJoin.firstAtOrAfter(left, right, "lk", "lt", "k", "t",
      Seq("v"), Seq("eid"))
      .select("tag", "asof_v").collect()
      .map(r => (r.getString(0), Option(r.get(1)))).toMap
    assert(out("before-any") === Some(1.0))  // 10:00 row is next
    assert(out("exactly-at") === Some(2.0))  // at-or-after inclusive, MIN eid of the 12:00 pair
    assert(out("after-all") === None)        // nothing after 23:00
    assert(out("simple") === None)           // key 2's only row is before 11:30
    assert(out("no-right-key") === None)
  }

  test("nearest: closer side wins, equal distance -> before, missing sides degrade") {
    val m = AsOfJoin.nearest(left, right,
      "lk", "lt", "k", "t", rightValueCols = Seq("v"), tieBreak = Seq("eid"))
      .select("tag", "asof_v").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(m("before-any") === Some(1.0), "no before -> the after match")
    assert(m("exactly-at") === Some(3.0), "zero distance: the at-time row (max tie-break)")
    assert(m("after-all") === Some(3.0), "no after -> the before match")
    assert(m("simple") === Some(9.0))
    assert(m("no-right-key") === None)
    // a left row exactly midway between two right rows: before wins the tie
    val midL = Seq((1L, ts("2024-01-01 11:00:00"), "midway")).toDF("lk", "lt", "tag")
    val tie = AsOfJoin.nearest(midL, right,
      "lk", "lt", "k", "t", rightValueCols = Seq("v"), tieBreak = Seq("eid"))
      .select("asof_v").collect().head.get(0)
    assert(tie === 1.0, "10:00 and 12:00 are equidistant from 11:00 -> the before row")
    // a strictly-closer after row beats a farther before row
    val closeL = Seq((1L, ts("2024-01-01 11:40:00"), "late")).toDF("lk", "lt", "tag")
    val close = AsOfJoin.nearest(closeL, right,
      "lk", "lt", "k", "t", rightValueCols = Seq("v"), tieBreak = Seq("eid"))
      .select("asof_v").collect().head.get(0)
    // the after side carries firstAtOrAfter's convention: MIN tie-break
    // among the equal-time 12:00 rows -> eid=101 (v=2.0)
    assert(close === 2.0, "12:00 (20 min) beats 10:00 (100 min), min tie-break")
    // a null left time has no distance to anything -> no match (pandas
    // merge_asof semantics), never a silent fall-through to the after row
    val nullL = Seq((1L, null.asInstanceOf[Timestamp], "null-time")).toDF("lk", "lt", "tag")
    val nul = AsOfJoin.nearest(nullL, right,
      "lk", "lt", "k", "t", rightValueCols = Seq("v"), tieBreak = Seq("eid"))
      .select("asof_v").collect().head
    assert(nul.isNullAt(0), "null left time must produce a null asof match")
  }

  test("nearest plans ONE exchange: both direction windows share the key partitioning") {
    val p = AsOfJoin.nearest(left, right,
      "lk", "lt", "k", "t", rightValueCols = Seq("v"), tieBreak = Seq("eid"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges === 1, s"expected a single key shuffle, got $exchanges:\n${p.take(1500)}")
  }

  test("lastWithin clears matches older than the lookback") {
    val out = AsOfJoin.lastWithin(left, right, "lk", "lt", "k", "t",
      Seq("v"), Seq("eid"), expr("INTERVAL 1 HOUR"))
      .select("tag", "asof_v").collect()
      .map(r => (r.getString(0), Option(r.get(1)))).toMap
    assert(out("exactly-at") === Some(3.0)) // 0 min old
    assert(out("after-all") === None)       // 11 h old -> cleared
  }
}
