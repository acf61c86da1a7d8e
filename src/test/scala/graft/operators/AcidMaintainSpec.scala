package graft.operators

import java.io.File
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round 14: the auto-maintenance policy (rules on top of DESCRIBE
  * DETAIL's gauges) and expectations at the MERGE gate. */
class AcidMaintainSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    new File(System.getProperty("java.io.tmpdir"),
      s"graft_acid_maint_${tag}_${System.nanoTime()}").getAbsolutePath

  private def kv(pairs: (Long, Long)*) =
    pairs.toDF("k", "v").coalesce(1)

  private def asSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("k", "v").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("maintain() folds mask debt and packs shred when thresholds " +
      "cross; answers unchanged; a within-policy table is a no-op") {
    val root = freshRoot("m")
    // churn: 6 tiny single-file appends + one MOR delete = shred + debt
    (0L to 5L).foreach { i =>
      AcidTable.commitAppend(kv((i * 10 + 1 to i * 10 + 10)
        .map(j => j -> j * 10): _*), root, statsCols = Seq("k"))
    }
    AcidTable.deleteMor(spark, root, "k", 7L, 9L)
    val logical = ((1L to 60L).toSet -- (7L to 9L)).map(i => i -> i * 10)
    assert(asSet(AcidTable.read(spark, root)) === logical)
    val policy = AcidTable.MaintenancePolicy(maxFiles = 3, targetFiles = 2,
      smallBytes = 1L << 30, maxMaskRatio = 0.0)
    val actions = AcidTable.maintain(spark, root, policy,
      statsCols = Seq("k"))
    assert(actions.map(_._1) === Seq("compactDvs", "compactSmall"))
    val entries = AcidTable.entriesOf(spark, root,
      AcidTable.currentVersion(spark, root))
    assert(entries.length === 2 && !entries.exists(_.dv.isDefined))
    assert(asSet(AcidTable.read(spark, root)) === logical,
      "maintenance changes layout, never answers")
    // the maintained table is now within policy: second pass is a no-op
    assert(AcidTable.maintain(spark, root, policy, Seq("k")) === Seq.empty)
    // time travel still reaches the pre-maintenance history
    assert(asSet(AcidTable.readAsOf(spark, root, 6L)) ===
      (1L to 60L).map(i => i -> i * 10).toSet)
  }

  test("maintain() vacuums past the retention horizon when asked") {
    val root = freshRoot("v")
    (1L to 5L).foreach { i =>
      AcidTable.commitAppend(kv(i -> i * 10), root)
    }
    val actions = AcidTable.maintain(spark, root,
      AcidTable.MaintenancePolicy(maxFiles = 1000, retainVersions = 2))
    assert(actions.map(_._1) === Seq("vacuum"))
    assert(AcidTable.versions(spark, root) === Seq(4L, 5L))
    assert(AcidTable.read(spark, root).count() === 5L)
  }

  test("vacuumOrphans sweeps failed-job debris, never referenced or " +
      "fresh files") {
    val root = freshRoot("o")
    AcidTable.commitAppend(kv(1L -> 10L, 2L -> 20L), root,
      statsCols = Seq("k"))
    AcidTable.deleteMor(spark, root, "k", 1L, 1L) // DV mask = referenced
    // plant a failed job's debris: an unreferenced commit dir with one
    // OLD file and one FRESH file
    val debris = new File(root, "data/dead-job-uuid")
    assert(debris.mkdirs())
    val old = new File(debris, "part-00000-9.parquet")
    val young = new File(debris, "part-00001-9.parquet")
    Seq(old, young).foreach { fl =>
      java.nio.file.Files.write(fl.toPath, Array[Byte](1, 2, 3)); ()
    }
    assert(old.setLastModified(System.currentTimeMillis() - 3600_000L))
    assert(debris.setLastModified(System.currentTimeMillis() - 3600_000L))
    val before = asSet(AcidTable.read(spark, root))
    val swept = AcidTable.vacuumOrphans(spark, root,
      minAgeMillis = 11L * 60 * 1000)
    assert(swept === 1, "only the OLD orphan goes; the fresh one is " +
      "in-flight-write protected")
    assert(!old.exists() && young.exists())
    assert(asSet(AcidTable.read(spark, root)) === before,
      "referenced data and masks untouched")
    // age out the survivor: second sweep takes it AND the empty dir
    assert(young.setLastModified(System.currentTimeMillis() - 3600_000L))
    assert(AcidTable.vacuumOrphans(spark, root,
      minAgeMillis = 11L * 60 * 1000) === 1)
    assert(!debris.exists(), "emptied orphan commit dir is removed")
    // and through the maintenance policy
    val debris2 = new File(root, "data/dead-job-2")
    assert(debris2.mkdirs())
    val f2 = new File(debris2, "x.parquet")
    java.nio.file.Files.write(f2.toPath, Array[Byte](1))
    assert(f2.setLastModified(System.currentTimeMillis() - 3600_000L))
    assert(debris2.setLastModified(System.currentTimeMillis() - 3600_000L))
    val actions = AcidTable.maintain(spark, root,
      AcidTable.MaintenancePolicy(maxFiles = 1000, maxMaskRatio = 1e9,
        orphanAgeMillis = 11L * 60 * 1000))
    assert(actions === Seq(("vacuumOrphans", 1L)))
  }

  test("mergeExpect 'fail' aborts before any write on a violation; a " +
      "clean batch merges") {
    val root = freshRoot("f")
    AcidTable.commitAppend(kv(1L -> 10L, 2L -> 20L), root,
      statsCols = Seq("k"))
    val ex = intercept[AcidTable.ExpectationViolation] {
      AcidTable.mergeExpect(kv(2L -> -5L), root, "k",
        Seq("nonneg_v" -> (col("v") >= 0)), onViolation = "fail")
    }
    assert(ex.counts === Map("nonneg_v" -> 1L))
    assert(AcidTable.currentVersion(spark, root) === 1L,
      "nothing published on a failed expectation")
    val (v, _, _, rejected, qv) = AcidTable.mergeExpect(kv(2L -> 22L),
      root, "k", Seq("nonneg_v" -> (col("v") >= 0)), onViolation = "fail",
      statsCols = Seq("k"))
    assert(rejected === 0L && qv.isEmpty)
    assert(asSet(AcidTable.readAsOf(spark, root, v)) ===
      Set(1L -> 10L, 2L -> 22L))
  }

  test("mergeExpect 'quarantine' merges the clean split (COW and MOR) " +
      "and quarantines the rest; all-rejected publishes no junk merge") {
    Seq("cow", "mor").foreach { strategy =>
      val root = freshRoot(s"q_$strategy")
      AcidTable.commitAppend(kv((1L to 10L).map(i => i -> i * 10): _*),
        root, statsCols = Seq("k"))
      // 2 clean updates, 1 violating update, 1 clean insert
      val ups = kv(2L -> 222L, 3L -> -1L, 5L -> 555L, 11L -> 111L)
      val (v, _, rewritten, rejected, qv) = AcidTable.mergeExpect(ups, root,
        "k", Seq("nonneg_v" -> (col("v") >= 0)),
        onViolation = "quarantine", strategy = strategy,
        statsCols = Seq("k"), quarantineToken = Some(s"b1-$strategy"))
      assert(rejected === 1L && qv.isDefined)
      if (strategy == "mor") assert(rewritten === 0)
      val expect = ((1L to 10L).map(i => i -> i * 10).toMap ++
        Map(2L -> 222L, 5L -> 555L, 11L -> 111L)).toSet
      assert(asSet(AcidTable.readAsOf(spark, root, v)) === expect,
        s"$strategy: the violating row must NOT be merged")
      val q = AcidTable.read(spark, s"$root/_quarantine")
      assert(q.select("k", "v", "__violations").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getString(2))).toSet ===
        Set((3L, -1L, "nonneg_v")))
      // quarantine replay no-ops on its token
      val replay = AcidTable.commitAppendOnce(
        q.limit(1), s"$root/_quarantine", s"b1-$strategy")
      assert(Some(replay) === qv)

      // an all-rejected batch: no merge version, everything quarantined
      val before = AcidTable.currentVersion(spark, root)
      val (v2, _, _, rej2, qv2) = AcidTable.mergeExpect(
        kv(4L -> -44L), root, "k",
        Seq("nonneg_v" -> (col("v") >= 0)), onViolation = "quarantine",
        strategy = strategy, statsCols = Seq("k"))
      assert(v2 === before && rej2 === 1L && qv2.isDefined,
        "all-rejected: current version returned, no junk merge commit")
    }
  }
}
