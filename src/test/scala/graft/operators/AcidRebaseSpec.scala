package graft.operators

import java.io.File
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round 13: optimistic commit rebase (two racing appends BOTH land;
  * overlapping writes surface ConcurrentModification), manifest
  * checkpointing (token lookup bounded by checkpoint + suffix, counted),
  * and the empty-string-stat parse fix (ADVICE r12 high). */
class AcidRebaseSpec extends SparkSpec {

  private def freshRoot(tag: String): String =
    new File(System.getProperty("java.io.tmpdir"),
      s"graft_acid_rebase_${tag}_${System.nanoTime()}").getAbsolutePath

  private def kv(pairs: (Long, Long)*) = {
    import spark.implicits._
    pairs.toDF("k", "v").coalesce(1)
  }

  private def asSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("k", "v").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("racing appends ALL land as consecutive versions, no rows lost") {
    val root = freshRoot("race")
    AcidTable.commitOverwrite(kv(0L -> 0L), root)
    val n = 8
    val gate = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(n)
    val futures = (1 to n).map { i =>
      pool.submit(new java.util.concurrent.Callable[Long] {
        def call(): Long = {
          gate.await()
          AcidTable.commitAppend(kv(i.toLong -> i.toLong * 10), root)
        }
      })
    }
    gate.countDown() // all writers plan against the same head, then race
    val published = futures.map(_.get(120, TimeUnit.SECONDS)).toSet
    pool.shutdown()
    // every writer landed, on a distinct consecutive version
    assert(published === (2L to (n + 1).toLong).toSet)
    assert(AcidTable.versions(spark, root) === (1L to (n + 1).toLong))
    // and the final state references every writer's rows
    assert(asSet(AcidTable.read(spark, root)) ===
      ((0 to n).map(i => i.toLong -> i.toLong * 10)).toSet)
  }

  test("a COW merge racing an append: both land (WriteSerializable)") {
    val root = freshRoot("cowrace")
    AcidTable.commitOverwrite(kv(1L -> 10L, 2L -> 20L), root,
      statsCols = Seq("k"))
    val gate = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(2)
    val merge = pool.submit(new java.util.concurrent.Callable[Long] {
      def call(): Long = {
        gate.await()
        AcidTable.mergeCow(kv(2L -> 99L), root, "k", statsCols = Seq("k"))._1
      }
    })
    val append = pool.submit(new java.util.concurrent.Callable[Long] {
      def call(): Long = {
        gate.await()
        AcidTable.commitAppend(kv(7L -> 70L), root, statsCols = Seq("k"))
      }
    })
    gate.countDown()
    val vs = Set(merge.get(120, TimeUnit.SECONDS), append.get(120, TimeUnit.SECONDS))
    pool.shutdown()
    assert(vs === Set(2L, 3L), "both committers published, no version burned")
    assert(asSet(AcidTable.read(spark, root)) ===
      Set(1L -> 10L, 2L -> 99L, 7L -> 70L))
  }

  test("rebase validation: a commit whose base entry was rewritten conflicts") {
    val root = freshRoot("stale")
    AcidTable.commitOverwrite(kv(1L -> 10L), root, statsCols = Seq("k"))
    val stale = AcidTable.entriesOf(spark, root, 1L) // plan against v1
    // a concurrent COW rewrites the file the stale plan was based on
    AcidTable.mergeCow(kv(1L -> 11L), root, "k", statsCols = Seq("k"))
    val e = intercept[AcidTable.ConcurrentModification] {
      AcidTable.commitRebase(spark, root, "delete", removed = stale,
        added = Seq.empty)
    }
    assert(e.gone === stale.map(_.render).sorted)
    // while a stale-but-disjoint plan (nothing removed) rebases and lands
    val fresh = AcidTable.commitRebase(spark, root, "append", Nil,
      AcidTable.entriesOf(spark, root, 1L))._1 // any entries: re-add v1's file
    assert(fresh === 3L)
  }

  test("same render at head: a stale COW on an UNtouched file rebases") {
    val root = freshRoot("disj")
    // two files via two appends, stats disjoint
    AcidTable.commitAppend(kv(1L -> 10L), root, statsCols = Seq("k"))
    AcidTable.commitAppend(kv(100L -> 1000L), root, statsCols = Seq("k"))
    val base = AcidTable.entriesOf(spark, root, 2L)
    val lowFile = base.filter(_.statFor("k").exists(_.max < 100L))
    assert(lowFile.length === 1)
    // an append lands after our snapshot…
    AcidTable.commitAppend(kv(200L -> 2000L), root, statsCols = Seq("k"))
    // …but our COW plan only removed the low file, which is still live
    val (v, kept) = AcidTable.commitRebase(spark, root, "delete",
      removed = lowFile, added = Seq.empty)
    assert(v === 4L)
    assert(kept === 2, "the high file AND the concurrent append both carried")
    assert(asSet(AcidTable.read(spark, root)) ===
      Set(100L -> 1000L, 200L -> 2000L))
  }

  test("concurrent same-token appends: exactly one version lands") {
    val root = freshRoot("tok")
    AcidTable.commitOverwrite(kv(0L -> 0L), root)
    val gate = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(2)
    val fs = (1 to 2).map { _ =>
      pool.submit(new java.util.concurrent.Callable[Long] {
        def call(): Long = {
          gate.await()
          AcidTable.commitAppendOnce(kv(5L -> 50L), root, "batch-42")
        }
      })
    }
    gate.countDown()
    val got = fs.map(_.get(120, TimeUnit.SECONDS)).toSet
    pool.shutdown()
    assert(got === Set(2L), "both callers converge on the one tokened version")
    assert(AcidTable.versions(spark, root) === Seq(1L, 2L))
    assert(AcidTable.read(spark, root).where(col("k") === 5L).count() === 1L)
  }

  test("checkpoint bounds token lookup to one checkpoint + the suffix") {
    val root = freshRoot("ckpt")
    val n = 35 // crosses two checkpoint intervals (16, 32)
    (1 to n).foreach { i =>
      AcidTable.commitAppendOnce(kv(i.toLong -> i.toLong), root, s"b-$i")
    }
    assert(AcidTable.checkpointVersions(spark, root) === Seq(16L, 32L))
    // a fresh idempotent commit opens ≤ CheckpointEvery manifest-layer
    // files (checkpoint + suffix, twice: the pre-check and the in-loop
    // recheck), never the 35-manifest history
    val before = AcidTable.manifestOpens.get()
    AcidTable.commitAppendOnce(kv(99L -> 99L), root, "b-new")
    val delta = AcidTable.manifestOpens.get() - before
    assert(delta <= AcidTable.CheckpointEvery,
      s"token-checked commit opened $delta manifest-layer files")
    // replay of a PRE-checkpoint token answers from the checkpoint alone
    val b2 = AcidTable.manifestOpens.get()
    assert(AcidTable.commitAppendOnce(kv(2L -> 2L), root, "b-2") === 2L)
    assert(AcidTable.manifestOpens.get() - b2 <= 2L)
    // a plain snapshot read stays O(1) manifests
    val b3 = AcidTable.manifestOpens.get()
    AcidTable.read(spark, root).count()
    assert(AcidTable.manifestOpens.get() - b3 <= 1L)
    // vacuum keeps only the newest checkpoint; old tokens still no-op
    AcidTable.vacuum(spark, root, retainLast = 2)
    assert(AcidTable.checkpointVersions(spark, root) === Seq(32L))
    assert(AcidTable.commitAppendOnce(kv(3L -> 3L), root, "b-3") === 3L,
      "a vacuumed-away version's token still answers from the checkpoint")
  }

  test("an all-empty-string stats column round-trips (ADVICE r12 high)") {
    import spark.implicits._
    val root = freshRoot("emptystr")
    val df = Seq((1L, ""), (2L, "")).toDF("k", "s").coalesce(1)
    // pre-fix: the commit succeeded but every later read threw on the
    // 'c:s::' stat line, leaving the table version unreadable
    AcidTable.commitOverwrite(df, root, statsCols = Seq("k", "s"))
    assert(AcidTable.read(spark, root).count() === 2L)
    val st = AcidTable.entriesOf(spark, root, 1L).head.strStatFor("s")
    assert(st.exists(s => s.min == "" && s.max == ""))
    // and the next commit (which re-reads the manifest) still works
    AcidTable.commitAppend(Seq((3L, "x")).toDF("k", "s").coalesce(1),
      root, statsCols = Seq("k", "s"))
    assert(AcidTable.read(spark, root).count() === 3L)
    // empty bounds still prune correctly: a range strictly above "" keeps
    // the file out only when its max ("") sorts below the lower bound
    val pr = AcidTable.readWhere(spark, root, 1L,
      Seq(AcidTable.StrRange("s", "a", "b")))
    assert(pr.filesScanned === 0 && pr.filesTotal === 1)
  }
}
