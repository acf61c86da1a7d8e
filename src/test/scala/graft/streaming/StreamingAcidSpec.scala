package graft.streaming

import java.nio.file.Files
import graft.SparkSpec
import graft.operators.AcidTable

/** Streaming ingestion into the ACID table: one atomic version per
  * micro-batch, replay-idempotent through the manifest token. */
class StreamingAcidSpec extends SparkSpec {
  import spark.implicits._

  test("each micro-batch commits one version; replay no-ops on the token") {
    val incoming = Files.createTempDirectory("graft_sacid_in").toString
    val table = Files.createTempDirectory("graft_sacid_tbl").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_sacid_ckpt").toString
    val schema = Seq((0L, 0L)).toDF("k", "v").schema

    Seq((1L, 10L), (2L, 20L)).toDF("k", "v").write.parquet(s"$incoming/f1")
    StreamingAcid.run(spark, s"$incoming/*", schema, table, ckpt)
    assert(AcidTable.versions(spark, table) === Seq(1L))

    Seq((3L, 30L)).toDF("k", "v").write.parquet(s"$incoming/f2")
    StreamingAcid.run(spark, s"$incoming/*", schema, table, ckpt)
    assert(AcidTable.versions(spark, table) === Seq(1L, 2L))
    def rows = AcidTable.read(spark, table)
      .select("k", "v").as[(Long, Long)].collect().toSet
    assert(rows === Set(1L -> 10L, 2L -> 20L, 3L -> 30L))

    // replay of batch 1 (failure-after-commit shape): the token no-ops —
    // no new version, no doubled rows
    val replayV = AcidTable.commitAppendOnce(
      Seq((3L, 30L)).toDF("k", "v"), table, "stream-batch-1")
    assert(replayV === 2L, "replay must return the already-published version")
    assert(AcidTable.versions(spark, table) === Seq(1L, 2L))
    assert(rows === Set(1L -> 10L, 2L -> 20L, 3L -> 30L))

    // snapshot isolation across the stream: version 1 still serves its
    // original state
    assert(AcidTable.readAsOf(spark, table, 1)
      .select("k", "v").as[(Long, Long)].collect().toSet ===
      Set(1L -> 10L, 2L -> 20L))
  }

  test("expectations split each micro-batch; replay no-ops BOTH tables") {
    import org.apache.spark.sql.functions.col
    val incoming = Files.createTempDirectory("graft_sacid_exp_in").toString
    val table = Files.createTempDirectory("graft_sacid_exp_tbl").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_sacid_exp_ck").toString
    val qroot = s"$table/_quarantine"
    val schema = Seq((0L, 0L)).toDF("k", "v").schema
    val exps = Seq("positive_v" -> (col("v") > 0))

    Seq((1L, 10L), (2L, -1L)).toDF("k", "v").write.parquet(s"$incoming/f1")
    StreamingAcid.runExpect(spark, s"$incoming/*", schema, table, ckpt, exps)
    def rows(r: String) = AcidTable.read(spark, r)
      .select("k", "v").as[(Long, Long)].collect().toSet
    assert(rows(table) === Set(1L -> 10L))
    assert(rows(qroot) === Set(2L -> -1L))
    assert(AcidTable.read(spark, qroot).select("__violations")
      .head().getString(0) === "positive_v")

    // a second batch with no violations: table advances, quarantine doesn't
    Seq((3L, 30L)).toDF("k", "v").write.parquet(s"$incoming/f2")
    StreamingAcid.runExpect(spark, s"$incoming/*", schema, table, ckpt, exps)
    assert(rows(table) === Set(1L -> 10L, 3L -> 30L))
    assert(AcidTable.versions(spark, qroot) === Seq(1L))

    // replay of batch 0 (crash-after-commit shape): BOTH tokens no-op
    val (v, rej, qv) = AcidTable.commitAppendExpect(
      Seq((9L, -9L)).toDF("k", "v"), table, exps,
      onViolation = "quarantine", token = Some("stream-batch-0"))
    assert(v === 1L && qv === Some(1L),
      "the replayed batch returns both already-published versions")
    assert(rej === 1L)
    assert(rows(table) === Set(1L -> 10L, 3L -> 30L))
    assert(rows(qroot) === Set(2L -> -1L))
  }
}
