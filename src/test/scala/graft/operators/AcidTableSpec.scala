package graft.operators

import java.io.File
import graft.SparkSpec
import org.apache.spark.sql.functions._

class AcidTableSpec extends SparkSpec {

  private def freshRoot(tag: String): String =
    new File(System.getProperty("java.io.tmpdir"),
      s"graft_acid_spec_${tag}_${System.nanoTime()}").getAbsolutePath

  private def kv(pairs: (Long, Long)*) = {
    import spark.implicits._
    pairs.toDF("k", "v")
  }

  private def asSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("k", "v").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("overwrite commits version; read-as-of survives a later overwrite") {
    val root = freshRoot("rw")
    val v1 = AcidTable.commitOverwrite(kv(1L -> 10L, 2L -> 20L), root)
    assert(v1 === 1L)
    val v2 = AcidTable.commitOverwrite(kv(2L -> 99L, 3L -> 30L), root)
    assert(v2 === 2L)
    // snapshot isolation: v1's state is byte-identical after the overwrite
    assert(asSet(AcidTable.readAsOf(spark, root, 1)) === Set(1L -> 10L, 2L -> 20L))
    assert(asSet(AcidTable.read(spark, root)) === Set(2L -> 99L, 3L -> 30L))
    assert(AcidTable.currentVersion(spark, root) === 2L)
  }

  test("append publishes prev-live union new files") {
    val root = freshRoot("ap")
    AcidTable.commitOverwrite(kv(1L -> 10L), root)
    AcidTable.commitAppend(kv(2L -> 20L, 3L -> 30L), root)
    assert(asSet(AcidTable.read(spark, root)) ===
      Set(1L -> 10L, 2L -> 20L, 3L -> 30L))
    assert(asSet(AcidTable.readAsOf(spark, root, 1)) === Set(1L -> 10L))
    val h = AcidTable.history(spark, root)
    assert(h.map(x => (x._1, x._2)) === Seq((1L, "overwrite"), (2L, "append")))
    // the append manifest references MORE files than v1 (v1's plus its own)
    assert(h(1)._3 > h(0)._3)
  }

  test("a concurrent writer claiming the same version fails fast (Conflict)") {
    val root = freshRoot("cf")
    AcidTable.commitOverwrite(kv(1L -> 1L), root)
    // the real race: both writers read current=1 and try to publish v2 —
    // the create-exclusive manifest write lets exactly one win
    AcidTable.publish(spark, root, 2L, "overwrite", Seq("data/x/f.parquet"))
    val e = intercept[AcidTable.Conflict] {
      AcidTable.publish(spark, root, 2L, "overwrite", Seq("data/y/f.parquet"))
    }
    assert(e.version === 2L)
    // and the loser's state is untouched: v2 is the winner's file list
    assert(AcidTable.versions(spark, root) === Seq(1L, 2L))
    // a full commit retried after the loss lands on the NEXT version
    assert(AcidTable.commitOverwrite(kv(9L -> 9L), root) === 3L)
  }

  test("diffVersions composes SnapshotDiff over two snapshots") {
    val root = freshRoot("df")
    AcidTable.commitOverwrite(kv(1L -> 10L, 2L -> 20L, 3L -> 30L), root)
    AcidTable.commitOverwrite(kv(2L -> 21L, 3L -> 30L, 4L -> 40L), root)
    val d = AcidTable.diffVersions(spark, root, 1, 2, Seq("k"), Seq("v"))
      .select("k", "change_type").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d === Map(1L -> "removed", 2L -> "changed", 4L -> "added"))
  }

  test("vacuum keeps files any retained manifest references, drops the rest") {
    val root = freshRoot("vc")
    AcidTable.commitOverwrite(kv(1L -> 10L), root)            // v1
    AcidTable.commitAppend(kv(2L -> 20L), root)               // v2 refs v1's files
    val (mDel, fDel) = AcidTable.vacuum(spark, root, retainLast = 1)
    assert(mDel === 1)
    assert(fDel === 0, "v1's files are referenced by the retained v2 append")
    assert(asSet(AcidTable.read(spark, root)) === Set(1L -> 10L, 2L -> 20L))
    intercept[IllegalArgumentException] { AcidTable.readAsOf(spark, root, 1) }

    // an overwrite strands the old files; vacuum then reclaims them
    AcidTable.commitOverwrite(kv(9L -> 90L), root)            // v3
    val (mDel2, fDel2) = AcidTable.vacuum(spark, root, retainLast = 1)
    assert(mDel2 === 1 && fDel2 > 0)
    assert(asSet(AcidTable.read(spark, root)) === Set(9L -> 90L))
  }

  test("compact rewrites the current state into numFiles, data identical") {
    val root = freshRoot("cp")
    AcidTable.commitOverwrite(kv((1L to 50L).map(i => i -> i * 2): _*), root)
    AcidTable.commitAppend(kv((51L to 99L).map(i => i -> i * 2): _*), root)
    val v3 = AcidTable.compact(spark, root, numFiles = 2)
    assert(v3 === 3L)
    val h = AcidTable.history(spark, root)
    assert(h.map(_._2) === Seq("overwrite", "append", "compact"))
    assert(h(2)._3 === 2, "compacted version lists exactly numFiles files")
    assert(h(2)._3 < h(1)._3, "compaction must shrink the file count")
    // identical data, and the pre-compaction version is untouched
    assert(asSet(AcidTable.read(spark, root)) ===
      (1L to 99L).map(i => i -> i * 2).toSet)
    assert(asSet(AcidTable.readAsOf(spark, root, 2)) ===
      asSet(AcidTable.readAsOf(spark, root, 3)))
  }

  test("commitAppendOnce: a seen token no-ops; a stranger's token is honored") {
    val root = freshRoot("tok")
    AcidTable.commitOverwrite(kv(1L -> 1L), root)
    assert(AcidTable.commitAppendOnce(kv(2L -> 2L), root, "t-1") === 2L)
    // replay: same token, different (even bogus) data — must be a no-op
    assert(AcidTable.commitAppendOnce(kv(99L -> 99L), root, "t-1") === 2L)
    assert(AcidTable.versions(spark, root) === Seq(1L, 2L))
    assert(asSet(AcidTable.read(spark, root)) === Set(1L -> 1L, 2L -> 2L))
    // a version published elsewhere with the token short-circuits the
    // commit entirely (the crashed-own-attempt recovery shape)
    AcidTable.publish(spark, root, 3L, "append",
      Seq("data/none/x.parquet"), Some("t-2"))
    assert(AcidTable.commitAppendOnce(kv(5L -> 5L), root, "t-2") === 3L)
    assert(AcidTable.versions(spark, root) === Seq(1L, 2L, 3L))
  }

  test("time travel by wall clock picks the latest commit at-or-before") {
    val root = freshRoot("ts")
    AcidTable.commitOverwrite(kv(1L -> 10L), root)
    Thread.sleep(5)
    val mid = System.currentTimeMillis()
    Thread.sleep(5)
    AcidTable.commitOverwrite(kv(2L -> 20L), root)
    assert(asSet(AcidTable.readAsOfTimestamp(spark, root, mid)) ===
      Set(1L -> 10L), "mid-window timestamp must resolve to v1")
    assert(asSet(AcidTable.readAsOfTimestamp(spark, root,
      System.currentTimeMillis())) === Set(2L -> 20L))
    val e = intercept[IllegalArgumentException] {
      AcidTable.readAsOfTimestamp(spark, root,
        AcidTable.commitTimestamp(spark, root, 1) - 1)
    }
    assert(e.getMessage.contains("at or before"))
  }

  test("an empty table fails with a clear message, not an empty scan") {
    val root = freshRoot("em")
    val e = intercept[IllegalArgumentException] { AcidTable.read(spark, root) }
    assert(e.getMessage.contains("no committed version"))
  }
}
