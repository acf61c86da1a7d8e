package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(m * 60000L)

  test("stage ordering is strict: out-of-order purchases don't convert") {
    // u1: full ordered funnel. u2: purchase BEFORE view (no conversion past
    // view). u3: view+click only. u4: click without view (counts nowhere).
    val ev = Seq(
      (1L, "view", ts(1)), (1L, "click", ts(2)), (1L, "purchase", ts(3)),
      (2L, "purchase", ts(1)), (2L, "view", ts(2)), (2L, "click", ts(3)),
      (3L, "view", ts(1)), (3L, "click", ts(5)),
      (4L, "click", ts(1))
    ).toDF("user_id", "event_type", "ts")
    val out = Funnel.funnelCounts(ev, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"))
      .as[(Long, Long, Long)].head()
    assert(out === ((3L, 3L, 1L))) // views: u1,u2,u3; clicks: same; purchase: u1
  }

  test("same-timestamp events don't satisfy the STRICTLY-after rule") {
    val ev = Seq((1L, "view", ts(1)), (1L, "click", ts(1)))
      .toDF("user_id", "event_type", "ts")
    val out = Funnel.funnelCounts(ev, "user_id", "event_type", "ts",
      Seq("view", "click")).as[(Long, Long)].head()
    assert(out === ((1L, 0L)))
  }

  test("all stages ride one hash shuffle of the events") {
    val ev = Seq((1L, "view", ts(1))).toDF("user_id", "event_type", "ts")
    val p = Funnel.funnelCounts(ev, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"))
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(p).length === 1,
      s"stage windows + per-user reduce must share one shuffle:\n${p.take(1500)}")
  }
}
