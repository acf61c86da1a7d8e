package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.TechnicalIndicators

/** S-STRMTA: streaming Holt maintenance must equal the batch recurrence
  * over the union after EVERY batch, drop late/replayed rows, and keep
  * state bounded to three longs per key. */
class StreamingIndicatorsSpec extends SparkSpec {
  import spark.implicits._

  private def batchHolt(rows: Seq[(Long, Long, Long)]): Map[(Long, Long), (Long, Long)] =
    TechnicalIndicators.holtMicro(rows.toDF("k", "ord", "c"), "k", "ord", "c",
        unitsScale = 2, alphaNum = 1, alphaDen = 5, betaNum = 1, betaDen = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(3), r.getLong(4))))
      .toMap

  test("streaming Holt equals batch holtMicro over the union after every batch") {
    val mem = MemoryStream[(Long, Long, Long)](spark)
    val name = s"t${System.nanoTime()}"
    val q = StreamingIndicators.holtOnArrival(mem.toDS(), unitsScale = 2,
        alphaNum = 1, alphaDen = 5, betaNum = 1, betaDen = 10)
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    val b1 = Seq((1L, 0L, 1000L), (1L, 1L, 1100L), (2L, 0L, 500L))
    val b2 = Seq((1L, 2L, 900L), (2L, 1L, 450L), (2L, 2L, 700L))
    try {
      def emitted(): Map[(Long, Long), (Long, Long)] =
        spark.table(name).collect()
          .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(3), r.getLong(4))))
          .toMap
      mem.addData(b1: _*); q.processAllAvailable()
      assert(emitted() === batchHolt(b1))
      mem.addData(b2: _*); q.processAllAvailable()
      assert(emitted() === batchHolt(b1 ++ b2),
        "after batch 2 the union of emissions must equal the batch run")
    } finally q.stop()
  }

  test("late and replayed observations are dropped; state is replay-idempotent") {
    val mem = MemoryStream[(Long, Long, Long)](spark)
    val name = s"t${System.nanoTime()}"
    val q = StreamingIndicators.holtOnArrival(mem.toDS(), unitsScale = 2,
        alphaNum = 1, alphaDen = 5, betaNum = 1, betaDen = 10)
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      mem.addData((1L, 0L, 1000L), (1L, 1L, 1100L)); q.processAllAvailable()
      val beforeReplay = spark.table(name).count()
      // replay batch 1 verbatim + one genuinely late row: all dropped
      mem.addData((1L, 0L, 1000L), (1L, 1L, 1100L), (1L, 0L, 9999L))
      q.processAllAvailable()
      val afterReplay = spark.table(name).count()
      assert(afterReplay === beforeReplay,
        "the replayed/late batch must emit ZERO rows, not just leave state intact")
      // then a fresh in-order row still folds from the UNCORRUPTED state
      mem.addData((1L, 2L, 1200L)); q.processAllAvailable()
      assert(spark.table(name).count() === afterReplay + 1)
      val all = spark.table(name).collect()
        .map(r => (r.getLong(1), (r.getLong(3), r.getLong(4)))).toMap
      val expect = batchHolt(
        Seq((1L, 0L, 1000L), (1L, 1L, 1100L), (1L, 2L, 1200L)))
      assert(all(2L) === expect((1L, 2L)),
        "post-replay fold must equal the clean batch recurrence")
    } finally q.stop()
  }

  test("within-batch arrival order does not matter (the fold sorts)") {
    val mem = MemoryStream[(Long, Long, Long)](spark)
    val name = s"t${System.nanoTime()}"
    val q = StreamingIndicators.holtOnArrival(mem.toDS(), unitsScale = 2,
        alphaNum = 1, alphaDen = 5, betaNum = 1, betaDen = 10)
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      mem.addData((1L, 2L, 900L), (1L, 0L, 1000L), (1L, 1L, 1100L))
      q.processAllAvailable()
      val got = spark.table(name).collect()
        .map(r => (r.getLong(1), (r.getLong(3), r.getLong(4)))).toMap
      val expect = batchHolt(
          Seq((1L, 0L, 1000L), (1L, 1L, 1100L), (1L, 2L, 900L)))
        .map { case ((_, o), v) => o -> v }
      assert(got === expect)
    } finally q.stop()
  }
}
