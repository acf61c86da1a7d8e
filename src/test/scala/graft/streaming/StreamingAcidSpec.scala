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

}
