package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec

/** Streaming-only behavior (SURVEY.md §5.2.2, S-STRM4/5): watermark late-data
  * drop and stateful dedup, driven through MemoryStream micro-batches. The
  * windowed column expressions themselves are oracle-checked via the batch
  * twins (q_strm1–3).
  */
case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
              event_type: String, value: Double, props: String)

class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def ev(id: Long, t: String, v: Double = 1.0) =
    Ev(id, ts(t), 1L, "click", v, "{}")

  private def runBatches(q: DataFrame => DataFrame, mode: OutputMode,
                         batches: Seq[Ev]*): Seq[org.apache.spark.sql.Row] = {
    val mem = MemoryStream[Ev](spark)
    val name = s"t${System.nanoTime()}"
    val query = q(mem.toDF()).writeStream.format("memory")
      .queryName(name).outputMode(mode).start()
    try {
      batches.foreach { b => mem.addData(b); query.processAllAvailable() }
      spark.table(name).collect().toSeq
    } finally query.stop()
  }

  test("batch-vs-stream parity: tumbling, sliding, session windows on the fixture") {
    // the q_strm1-3 batch twins are oracle-checked; this closes the loop by
    // asserting the STREAMING execution of the same functions over the same
    // fixture rows (fed as three micro-batches) produces identical results
    val slice = graft.Tables.load(spark, sf, "events")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .as[Ev].collect().sortBy(_.event_id).take(600)
    assert(slice.length === 600, "fixture slice short")
    val batches = slice.grouped(200).toSeq
    def parity(op: DataFrame => DataFrame, label: String): Unit = {
      val expected = op(slice.toSeq.toDF()).collect().map(_.toString).sorted
      val mem = MemoryStream[Ev](spark)
      val name = s"t${System.nanoTime()}"
      // Complete mode: the final result table equals the batch result
      // regardless of how rows were split across micro-batches
      val q = op(mem.toDF()).writeStream.format("memory")
        .queryName(name).outputMode(OutputMode.Complete()).start()
      try {
        batches.foreach { b => mem.addData(b.toSeq); q.processAllAvailable() }
        val got = spark.table(name).collect().map(_.toString).sorted
        assert(got === expected, s"$label: stream result differs from batch twin")
      } finally q.stop()
    }
    parity(StreamOps.tumblingHourly, "tumbling")
    parity(StreamOps.slidingHourly, "sliding")
    parity(StreamOps.sessionized, "session")
  }

  test("S-STRMRECON: streaming checksum state equals the batch audit after EVERY prefix") {
    // XOR's order-freedom means the state is the batch answer at every
    // micro-batch boundary, not just the end — asserted per prefix
    val rows = (1L to 300L).map(k => (k, k * 7L + 1))
    val mem = MemoryStream[(Long, Long)](spark)
    val name = s"recon${System.nanoTime()}"
    val q = StreamOps.reconcileChecksums(
        mem.toDF().toDF("k", "v"), "k", "v", nBuckets = 8)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete()).start()
    try {
      rows.grouped(100).zipWithIndex.foreach { case (chunk, i) =>
        mem.addData(chunk)
        q.processAllAvailable()
        val seen = rows.take((i + 1) * 100)
        val expected = StreamOps.reconcileChecksums(
            seen.toDF("k", "v"), "k", "v", nBuckets = 8)
          .collect().map(_.toString).sorted
        val got = spark.table(name).collect().map(_.toString).sorted
        assert(got === expected, s"prefix ${i + 1} diverged")
      }
      // and the final streaming state verifies a clean batch copy green
      val audit = graft.operators.DataQuality.reconcile(
        rows.toDF("k", "v"), rows.toDF("k", "v"), "k", "v", nBuckets = 8)
      assert(audit.where("NOT checksum_match").count() === 0)
    } finally q.stop()
  }

  test("S-DRIFT: schema change points flagged in the micro-batch where they land") {
    // the q_dq8 planted drift, arriving as generations: batch 1 = gens 1+2,
    // batch 2 = gen 3 (the widening-to-double and the status conflict)
    val g1 = Seq((1L, "k", "bigint"), (1L, "price_cents", "int"),
      (1L, "status", "string"), (1L, "region", "string"), (1L, "note", "string"))
    val g2 = Seq((2L, "k", "bigint"), (2L, "price_cents", "bigint"),
      (2L, "status", "string"), (2L, "region_name", "string"), (2L, "note", "string"))
    val g3 = Seq((3L, "k", "bigint"), (3L, "price_cents", "double"),
      (3L, "status", "bigint"), (3L, "region_name", "string"), (3L, "note", "string"))
    val mem = MemoryStream[(Long, String, String)](spark)
    val name = s"drift${System.nanoTime()}"
    val q = StreamOps.schemaDriftOnArrival(mem.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    def snap(): Set[(String, Long, String, String, String)] =
      spark.table(name).as[StreamOps.SchemaDriftChange].collect()
        .map(c => (c.col_name, c.gen, c.prev_type, c.data_type, c.change)).toSet
    try {
      mem.addData(g1 ++ g2); q.processAllAvailable()
      val b1 = snap()
      assert(b1 === Set(
        ("k", 1L, null, "bigint", "appeared"),
        ("price_cents", 1L, null, "int", "appeared"),
        ("status", 1L, null, "string", "appeared"),
        ("region", 1L, null, "string", "appeared"),
        ("note", 1L, null, "string", "appeared"),
        ("region_name", 2L, null, "string", "appeared"),
        ("price_cents", 2L, "int", "bigint", "widened")))
      mem.addData(g3); q.processAllAvailable()
      // only the NEW change points of batch 2 — state carried the rest
      assert(snap() -- b1 === Set(
        ("price_cents", 3L, "bigint", "double", "widened"),
        ("status", 3L, "string", "bigint", "conflict")))
      // the stable columns never re-fire
      assert((snap() -- b1).forall(c => c._1 == "price_cents" || c._1 == "status"))
    } finally q.stop()
    // batch/stream parity: the same function over the whole inventory as a
    // BATCH Dataset emits the same change-point set
    val batch = StreamOps.schemaDriftOnArrival((g1 ++ g2 ++ g3).toDS())
      .collect().map(c => (c.col_name, c.gen, c.prev_type, c.data_type, c.change)).toSet
    assert(batch === snap())
  }

  test("S-STRM8: drift monitor flags a window whose mix leaves the reference") {
    val ref = Seq("click" -> 0.5, "view" -> 0.5)
    def e(id: Long, t: String, typ: String) = Ev(id, ts(t), 1L, typ, 1.0, "{}")
    // window 10:00: perfect 2/2 mix -> tvd 0; window 11:00: all 'error'
    // (outside the reference) -> tvd 1; window 12:00: 3/1 -> tvd 0.25
    val rows = runBatches(StreamOps.driftMonitor(_, "event_type", ref, 0.3),
      OutputMode.Append(),
      Seq(e(1, "2024-01-01 10:00:01", "click"), e(2, "2024-01-01 10:10:00", "click"),
        e(3, "2024-01-01 10:20:00", "view"), e(4, "2024-01-01 10:30:00", "view"),
        e(5, "2024-01-01 11:01:00", "error"), e(6, "2024-01-01 11:02:00", "error"),
        e(7, "2024-01-01 12:01:00", "click"), e(8, "2024-01-01 12:02:00", "click"),
        e(9, "2024-01-01 12:03:00", "click"), e(10, "2024-01-01 12:04:00", "view")),
      // advance the watermark far enough to close every window above
      Seq(e(99, "2024-01-01 15:00:00", "click")))
    val byWs = rows.map(r => r.getTimestamp(0).toString -> (r.getLong(1),
      r.getDouble(2), r.getBoolean(3))).toMap
    assert(byWs("2024-01-01 10:00:00.0") === ((4L, 0.0, false)))
    assert(byWs("2024-01-01 11:00:00.0") === ((2L, 1.0, true)))
    assert(byWs("2024-01-01 12:00:00.0") === ((4L, 0.25, false)))
  }

  test("S-STRM4: watermark drops events later than 10 minutes behind max ts") {
    val rows = runBatches(StreamOps.watermarkedTumbling, OutputMode.Append(),
      // batch 1: window [10:00,11:00) gets 2 events; max ts 11:30
      Seq(ev(1, "2024-01-01 10:05:00"), ev(2, "2024-01-01 10:20:00"),
          ev(3, "2024-01-01 11:30:00")),
      // batch 2: watermark = 11:20 -> the 10:00 window is closed and
      // emitted; this late event for it must be DROPPED
      Seq(ev(4, "2024-01-01 10:40:00")),
      // batch 3: advance far so remaining windows close
      Seq(ev(5, "2024-01-01 15:00:00")))
    val counts = rows.map(r => (r.getTimestamp(0).toString, r.getLong(1))).toMap
    assert(counts("2024-01-01 10:00:00.0") === 2L) // late ev4 not counted
  }

  test("S-STRM5: dropDuplicatesWithinWatermark dedups within the horizon") {
    val rows = runBatches(StreamOps.dedupedStream, OutputMode.Append(),
      Seq(ev(1, "2024-01-01 10:00:00"), ev(1, "2024-01-01 10:00:30"),
          ev(2, "2024-01-01 10:01:00")),
      Seq(ev(2, "2024-01-01 10:02:00"), ev(3, "2024-01-01 10:03:00")))
    val ids = rows.map(_.getLong(0)).sorted
    assert(ids === Seq(1L, 2L, 3L))
  }

  test("stream-stream interval join matches within the window, drops outside") {
    val clicks = MemoryStream[Ev](spark)
    val buys = MemoryStream[Ev](spark)
    val name = s"t${System.nanoTime()}"
    val q = StreamOps.streamStreamJoin(clicks.toDF(), buys.toDF())
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      clicks.addData(ev(1, "2024-01-01 10:00:00"))
      buys.addData(
        ev(100, "2024-01-01 10:10:00"), // inside [10:00, 10:30] -> joins
        ev(101, "2024-01-01 11:00:00")) // outside -> dropped
      q.processAllAvailable()
      val rows = spark.table(name)
        .select("left_id", "right_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.toSet === Set((1L, 100L)))
    } finally q.stop()
  }

  test("S-STRM7: transformWithState running totals agree with mapGroupsWithState") {
    // transformWithState requires the RocksDB state store — child session
    // so the engine-wide HDFS-backed default stays untouched
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[(Long, Double)](s2)
    val name = s"t${System.nanoTime()}"
    val q = StreamOps.runningTotalsTws(mem.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      mem.addData((1L, 10.0), (1L, 5.0), (2L, 1.0)); q.processAllAvailable()
      mem.addData((1L, 2.0)); q.processAllAvailable()
      val last = s2.table(name)
        .groupBy("user_id")
        .agg(org.apache.spark.sql.functions.max("n_events").as("n"),
          org.apache.spark.sql.functions.max("total_value").as("v"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      // identical to the mapGroupsWithState expectation below
      assert(last(1L) === ((3L, 17.0)))
      assert(last(2L) === ((1L, 1.0)))
    } finally q.stop()
  }

  test("mapGroupsWithState carries per-user running totals across micro-batches") {
    val mem = MemoryStream[(Long, Double)](spark)
    val name = s"t${System.nanoTime()}"
    val q = StreamOps.runningTotals(mem.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      mem.addData((1L, 10.0), (1L, 5.0), (2L, 1.0)); q.processAllAvailable()
      mem.addData((1L, 2.0)); q.processAllAvailable()
      val last = spark.table(name)
        .groupBy("user_id")
        .agg(org.apache.spark.sql.functions.max("n_events").as("n"),
          org.apache.spark.sql.functions.max("total_value").as("v"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      assert(last(1L) === ((3L, 17.0))) // state survived batch 1 -> batch 2
      assert(last(2L) === ((1L, 1.0)))
    } finally q.stop()
  }

  test("S-STRM6: sessions close on the next event OR on event-time timeout, exactly once") {
    val mem = MemoryStream[(Long, java.sql.Timestamp)](spark)
    val name = s"t${System.nanoTime()}"
    val withWm = mem.toDF().toDF("user_id", "ts").withWatermark("ts", "0 seconds")
    import spark.implicits._
    val q = StreamOps.sessionsWithTimeout(withWm.as[(Long, java.sql.Timestamp)], 30)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    def closed() = spark.table(name)
      .select("user_id", "session_start", "n_ev")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2))).toSet
    try {
      // session A: two events 10 min apart
      mem.addData((1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:10:00")))
      q.processAllAvailable()
      assert(closed().isEmpty, "open session must not be emitted")
      // an event far later CLOSES session A in-line (same user)
      mem.addData((1L, ts("2024-01-01 12:00:00")))
      q.processAllAvailable()
      assert(closed() === Set((1L, "2024-01-01 10:00:00.0", 2L)))
      // another user's event pushes the WATERMARK past session B's gap —
      // the timeout path must close it without any user-1 event arriving
      mem.addData((2L, ts("2024-01-01 15:00:00")))
      q.processAllAvailable()
      mem.addData((2L, ts("2024-01-01 15:01:00")))
      q.processAllAvailable()
      assert(closed().contains((1L, "2024-01-01 12:00:00.0", 1L)),
        s"timeout must close the 12:00 session, got ${closed()}")
      // no double emission of session A
      assert(closed().count(_._2 == "2024-01-01 10:00:00.0") === 1)
    } finally q.stop()
  }

  test("session_window boundary: a gap of exactly 30 min MERGES (inclusive)") {
    // SURVEY.md §7.4.4 flagged this boundary; empirically Spark 4.1 merges
    // the boundary-equal event. The SQL oracle twin mirrors with `<=`.
    val out = StreamOps.sessionized(Seq(
      ev(1, "2024-01-01 10:00:00"),
      ev(2, "2024-01-01 10:29:59"), // merges (gap < 30 min from ev1)
      ev(3, "2024-01-01 10:59:59"), // merges (gap < 30 min from ev2)
      ev(4, "2024-01-01 11:29:59"), // exactly 30:00 after ev3 -> still merges
      ev(5, "2024-01-01 13:00:00")  // far later -> new session
    ).toDF())
    val sessions = out.collect().map(r => (r.getTimestamp(1).toString, r.getLong(2))).sorted
    assert(sessions.length === 2)
    assert(sessions(0) === ("2024-01-01 10:00:00.0", 4L))
    assert(sessions(1) === ("2024-01-01 13:00:00.0", 1L))
  }
}
