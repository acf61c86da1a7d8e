package graft.streaming

import java.io.File
import graft.SparkSpec
import graft.operators.AcidTable

class AcidTailSpec extends SparkSpec {

  private def fresh(tag: String): String =
    new File(System.getProperty("java.io.tmpdir"),
      s"graft_acidtail_${tag}_${System.nanoTime()}").getAbsolutePath

  private def kv(pairs: (Long, Long)*) = {
    import spark.implicits._
    pairs.toDF("k", "v").coalesce(1)
  }

  test("tail delivers each append's increment exactly once across restarts") {
    val root = fresh("t")
    val ck = fresh("ck")
    AcidTable.commitAppend(kv(1L -> 10L), root)
    AcidTable.commitAppend(kv(2L -> 20L), root)
    val seen = scala.collection.mutable.Map.empty[Long, Set[Long]]
    def collect(df: org.apache.spark.sql.DataFrame, v: Long): Unit =
      seen(v) = df.select("k").collect().map(_.getLong(0)).toSet
    val p1 = AcidTail.tail(spark, root, ck)(collect)
    assert(p1 === Seq(1L, 2L))
    assert(seen === Map(1L -> Set(1L), 2L -> Set(2L)),
      "each increment is ONLY the appended rows, carried files untouched")
    // replay ("process restart"): nothing redelivered, nothing read
    assert(AcidTail.tail(spark, root, ck)(collect) === Seq.empty)
    // a third append lands; only IT is delivered on the next tail
    AcidTable.commitAppend(kv(3L -> 30L), root)
    assert(AcidTail.tail(spark, root, ck)(collect) === Seq(3L))
    assert(seen(3L) === Set(3L))
    // a brand-new checkpoint replays the full history (new consumer)
    val ck2 = fresh("ck2")
    assert(AcidTail.tail(spark, root, ck2)((_, _) => ()) === Seq(1L, 2L, 3L))
  }

  test("crash between process and marker replays that version only") {
    val root = fresh("c")
    val ck = fresh("ck")
    AcidTable.commitAppend(kv(1L -> 10L), root)
    AcidTable.commitAppend(kv(2L -> 20L), root)
    var calls = Vector.empty[Long]
    // the consumer dies mid-v2: v1's marker is down, v2's is not
    intercept[RuntimeException] {
      AcidTail.tail(spark, root, ck) { (_, v) =>
        calls :+= v
        if (v == 2L) throw new RuntimeException("boom")
      }
    }
    assert(calls === Vector(1L, 2L))
    assert(AcidTail.processedVersions(spark, root, ck) === Set(1L))
    // restart: v2 replays (at-least-once at the callback), v1 does not
    calls = Vector.empty
    assert(AcidTail.tail(spark, root, ck) { (_, v) => calls :+= v } === Seq(2L))
    assert(calls === Vector(2L))
  }

  test("a non-append commit fails fast unless the consumer opts in") {
    val root = fresh("na")
    val ck = fresh("ck")
    AcidTable.commitAppend(kv(1L -> 10L), root)
    AcidTable.commitOverwrite(kv(9L -> 90L), root)
    val e = intercept[IllegalStateException] {
      AcidTail.tail(spark, root, ck)((_, _) => ())
    }
    assert(e.getMessage.contains("'overwrite'"))
    assert(e.getMessage.contains("changesBetween"), "the message names the fix")
    assert(AcidTail.processedVersions(spark, root, ck) === Set(1L),
      "the append BEFORE the rewrite was delivered and checkpointed")
    // opted in: the rewrite's files are delivered verbatim
    var got = Set.empty[Long]
    val p = AcidTail.tail(spark, root, ck, allowNonAppend = true) { (df, _) =>
      got = df.select("k").collect().map(_.getLong(0)).toSet
    }
    assert(p === Seq(2L) && got === Set(9L))
  }

  test("tailChanges delivers the logical delta for every action, checkpointed") {
    val root = fresh("cdc")
    val ck = fresh("ck")
    AcidTable.commitAppend(kv(1L -> 10L, 2L -> 20L), root,
      statsCols = Seq("k", "v"))
    // a non-append commit the plain tail would refuse: overwrite that
    // changes one row, drops one, adds one
    AcidTable.commitOverwrite(kv(1L -> 11L, 3L -> 30L), root,
      statsCols = Seq("k", "v"))
    val feeds = scala.collection.mutable.Map.empty[Long, Map[Long, String]]
    val p = AcidTail.tailChanges(spark, root, ck, Seq("k"), Seq("v")) {
      (df, v) =>
        feeds(v) = df.select("k", "change_type").collect()
          .map(r => r.getLong(0) -> r.getString(1)).toMap
    }
    assert(p === Seq(1L, 2L))
    assert(feeds(1L) === Map(1L -> "added", 2L -> "added"),
      "the first version feeds its whole snapshot as inserts")
    assert(feeds(2L) === Map(1L -> "changed", 2L -> "removed", 3L -> "added"))
    // replay: nothing redelivered
    assert(AcidTail.tailChanges(spark, root, ck, Seq("k"), Seq("v")) {
      (_, _) => fail("must not be called on replay")
    } === Seq.empty)
    // a COW merge lands; only its delta is delivered, carried rows cancel
    AcidTable.mergeCow(kv(2L -> 99L), root, "k", statsCols = Seq("k", "v"))
    val p3 = AcidTail.tailChanges(spark, root, ck, Seq("k"), Seq("v")) {
      (df, v) => feeds(v) = df.select("k", "change_type").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    }
    assert(p3 === Seq(3L))
    assert(feeds(3L) === Map(2L -> "added"),
      "k=2 was absent at v2 (overwrite dropped it); the merge re-adds it — " +
        "and k=1/k=3, carried by reference or value, never appear")
  }

  test("a vacuum-retired predecessor fails the tail instead of redelivering") {
    val root = fresh("vac")
    val ck = fresh("ck")
    AcidTable.commitAppend(kv(1L -> 10L), root)
    AcidTable.commitAppend(kv(2L -> 20L), root)
    AcidTable.commitAppend(kv(3L -> 30L), root)
    // a consumer processed v1-2, then fell behind while vacuum retired them
    assert(AcidTail.tail(spark, root, ck)((_, _) => ()) === Seq(1L, 2L, 3L))
    AcidTable.commitAppend(kv(4L -> 40L), root)
    AcidTable.commitAppend(kv(5L -> 50L), root)
    assert(AcidTail.tail(spark, root, ck)((_, _) => ()) === Seq(4L, 5L))
    AcidTable.vacuum(spark, root, retainLast = 1) // only v5 survives
    // a FRESH checkpoint must not silently treat v5's snapshot as an
    // increment (pre-fix: every already-live row would be redelivered)
    val ck2 = fresh("ck2")
    val e = intercept[IllegalStateException] {
      AcidTail.tail(spark, root, ck2)((_, _) => ())
    }
    assert(e.getMessage.contains("vacuum"))
    assert(e.getMessage.contains("fresh checkpoint"), "the message names the fix")
    // same guard on the CDC tail
    val e2 = intercept[IllegalStateException] {
      AcidTail.tailChanges(spark, root, fresh("ck3"), Seq("k"), Seq("v")) {
        (_, _) => fail("must not deliver")
      }
    }
    assert(e2.getMessage.contains("vacuum"))
    // while the caught-up consumer keeps tailing new appends fine
    AcidTable.commitAppend(kv(6L -> 60L), root)
    assert(AcidTail.tail(spark, root, ck)((_, _) => ()) === Seq(6L))
  }

  test("tail and tailChanges checkpoint in separate marker namespaces") {
    val root = fresh("ns")
    val ck = fresh("ck")
    AcidTable.commitAppend(kv(1L -> 10L), root, statsCols = Seq("k", "v"))
    AcidTable.commitAppend(kv(2L -> 20L), root, statsCols = Seq("k", "v"))
    // the file tail processes everything under THIS checkpoint dir…
    assert(AcidTail.tail(spark, root, ck)((_, _) => ()) === Seq(1L, 2L))
    // …which must NOT satisfy the CDC tail: same dir, different payloads
    assert(AcidTail.tailChanges(spark, root, ck, Seq("k"), Seq("v")) {
      (_, _) => ()
    } === Seq(1L, 2L))
    assert(AcidTail.processedVersions(spark, root, ck) === Set(1L, 2L))
    assert(AcidTail.processedChangeVersions(spark, root, ck) === Set(1L, 2L))
    // and each mode's replay is independently empty
    assert(AcidTail.tail(spark, root, ck)((_, _) => ()) === Seq.empty)
    assert(AcidTail.tailChanges(spark, root, ck, Seq("k"), Seq("v")) {
      (_, _) => ()
    } === Seq.empty)
  }

  test("two racing tailers: callbacks at-least-once, markers exactly-once") {
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val root = fresh("race")
    val ck = fresh("ck")
    (1L to 3L).foreach(i => AcidTable.commitAppend(kv(i -> i * 10), root))
    val calls = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val gate = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(2)
    val fs = (1 to 2).map { _ =>
      pool.submit(new java.util.concurrent.Callable[Seq[Long]] {
        def call(): Seq[Long] = {
          gate.await()
          AcidTail.tail(spark, root, ck) { (_, v) => calls.add(v); () }
        }
      })
    }
    gate.countDown()
    val returned = fs.map(_.get(120, TimeUnit.SECONDS))
    pool.shutdown()
    // the CHECKPOINTED lists partition the versions exactly: no version
    // claimed by both tailers, none missed
    assert(returned(0).toSet.intersect(returned(1).toSet) === Set.empty)
    assert(returned(0).toSet ++ returned(1).toSet === Set(1L, 2L, 3L))
    // the CALLBACK is at-least-once: every version processed >= 1 time
    // (both tailers may have processed the same version before one lost
    // the marker — that is the documented contract, not a bug)
    import scala.jdk.CollectionConverters._
    assert(calls.asScala.toSet === Set(1L, 2L, 3L))
    assert(calls.size >= 3)
    assert(AcidTail.processedVersions(spark, root, ck) === Set(1L, 2L, 3L))
  }

  test("increments tile the table: union of increments == latest snapshot") {
    val root = fresh("ti")
    AcidTable.commitAppend(kv(1L -> 1L, 2L -> 2L), root)
    AcidTable.commitAppend(kv(3L -> 3L), root)
    AcidTable.commitAppend(kv(4L -> 4L, 5L -> 5L), root)
    val v = AcidTable.currentVersion(spark, root)
    val union = (1L to v).flatMap(AcidTail.readAdded(spark, root, _))
      .reduce(_.unionByName(_))
    assert(union.select("k").collect().map(_.getLong(0)).toSet ===
      AcidTable.read(spark, root).select("k").collect().map(_.getLong(0)).toSet)
    assert(union.count() === AcidTable.read(spark, root).count())
  }
}
