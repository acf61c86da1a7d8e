package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.AcidTable

/** Round 15: DELTA-based SQL DELETE / UPDATE / MERGE INTO — a table
  * that declared its merge key takes SQL DML as deletion-vector
  * commits (files_rewritten = 0), the economics the engine's MOR path
  * already owns, now reachable from the SQL surface. */
class AcidDeltaSpec extends SparkSpec {
  import spark.implicits._

  private val base = Files.createTempDirectory("graft_aciddelta").toString
  spark.conf.set("spark.sql.catalog.dl", "graft.sources.AcidCatalog")
  spark.conf.set("spark.sql.catalog.dl.root", base)

  private def kv(pairs: (Long, Long)*) = pairs.toDF("k", "v").coalesce(1)

  private def mk(name: String): String = {
    val root = s"$base/$name"
    Seq(1L to 10L, 11L to 20L, 21L to 30L).foreach { r =>
      AcidTable.commitAppend(kv(r.map(i => i -> i * 10): _*), root,
        statsCols = Seq("k"))
    }
    AcidTable.setMergeKey(spark, root, "k")
    root
  }

  private def state(name: String): Set[(Long, Long)] =
    spark.sql(s"SELECT k, v FROM dl.$name").as[(Long, Long)]
      .collect().toSet

  test("SQL DELETE lands as a deletion-vector commit: " +
      "files_rewritten = 0, one mask, answer exact") {
    val root = mk("d1")
    val before = AcidTable.entriesOf(spark, root, 3L).map(_.path).toSet
    spark.sql("DELETE FROM dl.d1 WHERE k BETWEEN 13 AND 17")
    assert(state("d1") ===
      ((1L to 30L).toSet -- (13L to 17L)).map(i => i -> i * 10))
    val entries = AcidTable.entriesOf(spark, root,
      AcidTable.currentVersion(spark, root))
    // EVERY data file carries by path — nothing was rewritten
    assert(entries.map(_.path).toSet === before,
      "a delta DELETE must not rewrite any data file")
    // exactly the statically-pruned file is masked (k in [13,17] can
    // only live in the 11..20 file — stats confine the mask)
    assert(entries.count(_.dv.isDefined) === 1)
    assert(AcidTable.actionOf(spark, root, 4L) === "delete")
    // pre-delete snapshot untouched
    assert(AcidTable.readAsOf(spark, root, 3L).count() === 30L)
  }

  test("SQL UPDATE masks the old row where it sits and appends the " +
      "new version") {
    val root = mk("u1")
    val before = AcidTable.entriesOf(spark, root, 3L).map(_.path).toSet
    spark.sql("UPDATE dl.u1 SET v = v + 1 WHERE k % 10 = 7")
    val expect = (1L to 30L).map(i =>
      i -> (if (i % 10 == 7) i * 10 + 1 else i * 10)).toSet
    assert(state("u1") === expect)
    val entries = AcidTable.entriesOf(spark, root,
      AcidTable.currentVersion(spark, root))
    assert(before.subsetOf(entries.map(_.path).toSet),
      "every original file must carry by path")
    assert(entries.exists(e => !before.contains(e.path)),
      "the new row versions land as new files")
    // k%10=7 has no pushable range — all three files masked, and the
    // mask keys simply match nothing in files without a 7-key
    assert(entries.count(_.dv.isDefined) === 3)
  }

  test("SQL MERGE INTO answers exactly like the engine's mergeMor on " +
      "the same workload, with files_rewritten = 0") {
    val root = mk("m1")
    val twin = s"$base/m1twin"
    Seq(1L to 10L, 11L to 20L, 21L to 30L).foreach { r =>
      AcidTable.commitAppend(kv(r.map(i => i -> i * 10): _*), twin,
        statsCols = Seq("k"))
    }
    val ups = Seq((5L, 555L), (15L, 1515L), (40L, 400L)).toDF("k", "v")
    AcidTable.mergeMor(ups, twin, "k", statsCols = Seq("k"))
    ups.createOrReplaceTempView("dl_src")
    spark.sql(
      """MERGE INTO dl.m1 t USING dl_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET v = s.v
        |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""".stripMargin)
    assert(state("m1") ===
      AcidTable.read(spark, twin).as[(Long, Long)].collect().toSet)
    val before = AcidTable.entriesOf(spark, root, 3L).map(_.path).toSet
    val entries = AcidTable.entriesOf(spark, root,
      AcidTable.currentVersion(spark, root))
    assert(before.subsetOf(entries.map(_.path).toSet),
      "no data file rewritten by the delta MERGE")
    assert(AcidTable.actionOf(spark, root, 4L) === "merge")
  }

  test("MERGE with a DELETE clause masks without rewriting") {
    val root = mk("md1")
    Seq((3L, 0L), (23L, 0L)).toDF("k", "v")
      .createOrReplaceTempView("dl_del_src")
    spark.sql(
      """MERGE INTO dl.md1 t USING dl_del_src s ON t.k = s.k
        |WHEN MATCHED THEN DELETE""".stripMargin)
    assert(state("md1") ===
      ((1L to 30L).toSet -- Set(3L, 23L)).map(i => i -> i * 10))
    val entries = AcidTable.entriesOf(spark, root,
      AcidTable.currentVersion(spark, root))
    assert(entries.map(_.path).toSet ===
      AcidTable.entriesOf(spark, root, 3L).map(_.path).toSet)
  }

  test("a second delta op layers mask paths on the same column; " +
      "compactDvs folds them away") {
    val root = mk("l1")
    spark.sql("DELETE FROM dl.l1 WHERE k = 2")
    spark.sql("DELETE FROM dl.l1 WHERE k = 4")
    assert(state("l1") ===
      ((1L to 30L).toSet -- Set(2L, 4L)).map(i => i -> i * 10))
    val masked = AcidTable.entriesOf(spark, root,
      AcidTable.currentVersion(spark, root)).filter(_.dv.isDefined)
    assert(masked.exists(_.dv.get.paths.length == 2),
      "the twice-hit file layers both mask paths")
    AcidTable.compactDvs(spark, root, statsCols = Seq("k"))
    assert(state("l1") ===
      ((1L to 30L).toSet -- Set(2L, 4L)).map(i => i -> i * 10))
    assert(AcidTable.entriesOf(spark, root,
      AcidTable.currentVersion(spark, root)).forall(_.dv.isEmpty))
  }

  test("CDC: a SQL MERGE on a CDC-stamped keyed table publishes the " +
      "keyed logical delta with the commit") {
    val root = mk("c1")
    AcidTable.enableCdc(spark, root)
    Seq((5L, 555L), (40L, 400L)).toDF("k", "v")
      .createOrReplaceTempView("dl_cdc_src")
    spark.sql(
      """MERGE INTO dl.c1 t USING dl_cdc_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET v = s.v
        |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""".stripMargin)
    val feed = AcidTable.changeFeedOf(spark, root, 4L).get
      .select("_change_type", "k", "v").as[(String, Long, Long)]
      .collect().toSet
    assert(feed === Set(("update_preimage", 5L, 50L),
      ("update_postimage", 5L, 555L), ("insert", 40L, 400L)))
  }

  test("group-based path still serves tables WITHOUT a declared key") {
    val root = s"$base/g1"
    Seq(1L to 10L, 11L to 20L).foreach { r =>
      AcidTable.commitAppend(kv(r.map(i => i -> i * 10): _*), root,
        statsCols = Seq("k"))
    }
    val before = AcidTable.entriesOf(spark, root, 2L).map(_.path).toSet
    spark.sql("DELETE FROM dl.g1 WHERE k BETWEEN 3 AND 5")
    val entries = AcidTable.entriesOf(spark, root,
      AcidTable.currentVersion(spark, root))
    assert(entries.forall(_.dv.isEmpty), "group path writes no masks")
    assert(entries.exists(e => !before.contains(e.path)),
      "group path rewrites the affected file")
    assert(spark.sql("SELECT count(*) FROM dl.g1").head().getLong(0) === 17L)
  }
}
