package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  test("report computes all metrics in one pass, long-form") {
    val df = Seq(
      (1L, Some("a"), 10.0),
      (2L, None, -1.0),
      (2L, Some("c"), 0.0),
      (3L, Some("zz"), 5.0)
    ).toDF("id", "cat", "v")
    val rep = DataQuality.report(df, Seq(
      "n_rows" -> count(lit(1)),
      "null_cat" -> DataQuality.nullCount(col("cat")),
      "dup_id" -> DataQuality.duplicateKeys(col("id")),
      "nonpositive_v" -> DataQuality.violations(col("v") <= 0),
      "bad_cat" -> DataQuality.violations(!col("cat").isin("a", "b", "c"))))
      .as[(String, Double)].collect().toMap
    assert(rep === Map(
      "n_rows" -> 4.0, "null_cat" -> 1.0, "dup_id" -> 1.0,
      "nonpositive_v" -> 2.0, "bad_cat" -> 1.0))
  }

  test("observe: in-flight metrics equal the report, no extra scan") {
    val df = Seq(
      (1L, Option("a"), 10.0), (2L, Option.empty[String], -1.0),
      (2L, Option("c"), 0.0), (3L, Option("zz"), 5.0)
    ).toDF("id", "cat", "v")
    val checks = Seq(
      "n_rows" -> count(lit(1)),
      "null_cat" -> DataQuality.nullCount(col("cat")),
      "nonpositive_v" -> DataQuality.violations(col("v") <= 0))

    @volatile var seen: Map[String, Double] = Map.empty
    val latch = new java.util.concurrent.CountDownLatch(1)
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String, qe: org.apache.spark.sql.execution.QueryExecution,
                             ns: Long): Unit = {
        qe.observedMetrics.get("dq").foreach { row =>
          seen = row.schema.fieldNames.map(n =>
            n -> row.getAs[Double](n)).toMap
          latch.countDown()
        }
      }
      override def onFailure(f: String, qe: org.apache.spark.sql.execution.QueryExecution,
                             e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val out = DataQuality.observed(df, "dq", checks)
      assert(out.count() === 4, "observe must not change the data")
      assert(latch.await(30, java.util.concurrent.TimeUnit.SECONDS),
        "observed metrics never arrived")
      val expect = DataQuality.report(df, checks)
        .as[(String, Double)].collect().toMap
      assert(seen === expect)
    } finally spark.listenerManager.unregister(listener)
  }

  test("profile: exact per-column row/null/distinct counts from one pass, no joins") {
    val df = Seq(
      (Some(1L), Some("a")), (Some(2L), Some("a")), (Some(2L), None),
      (None, Some("b"))
    ).toDF("k", "s")
    val out = DataQuality.profile(df, Seq("k", "s")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("k") === ((4L, 1L, 2L)), "nulls excluded from distinct")
    assert(out("s") === ((4L, 1L, 2L)))
    val plan = DataQuality.profile(df, Seq("k", "s"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"profile must stay one scan:\n$plan")
  }

  test("profile survives column names with quotes, spaces and dots") {
    val weird = Seq("it's", "two words", "looks.nested")
    val df = Seq((1L, "a", 2.0), (1L, null, 3.0))
      .toDF(weird: _*)
    val out = DataQuality.profile(df, weird).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("it's") === ((2L, 0L, 1L)))
    assert(out("two words") === ((2L, 1L, 1L)))
    assert(out("looks.nested") === ((2L, 0L, 2L)))
  }

  test("fkAudit counts orphan rows and keys; null FKs are orphan rows, not keys") {
    val fact = Seq(Some(1L), Some(1L), Some(2L), Some(7L), Some(7L), None)
      .map(Tuple1(_)).toDF("fk")
    val dim = Seq(1L, 2L, 3L).map(Tuple1(_)).toDF("dk")
    val r = DataQuality.fkAudit(fact, "fk", dim, "dk").head()
    assert(r.getLong(0) === 6L, "n_fact_rows")
    assert(r.getLong(1) === 3L, "n_distinct_keys (null skipped)")
    assert(r.getLong(2) === 3L, "orphan rows: two 7s + one null")
    assert(r.getLong(3) === 1L, "orphan keys: just 7")
  }

  test("report is a single aggregation: exactly one Aggregate pair, no joins") {
    val df = Seq((1L, 2.0)).toDF("id", "v")
    val plan = DataQuality.report(df, Seq(
      "n_rows" -> count(lit(1)),
      "nonpositive_v" -> DataQuality.violations(col("v") <= 0)))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"unexpected join in plan:\n$plan")
  }

  test("reconcile: clean copy all-green; one flipped value trips EXACTLY its bucket") {
    val src = (1L to 200L).map(k => (k, k * 100L)).toDF("k", "v")
    val clean = DataQuality.reconcile(src, src, "k", "v", nBuckets = 8)
    assert(clean.where(!col("checksum_match") || !col("counts_match")).count() === 0)
    assert(clean.count() === 8)
    // flip one value: key 42 -> bucket 42 % 8 = 2 diverges, others stay green
    val dst = src.withColumn("v", when(col("k") === 42L, col("v") + 1L).otherwise(col("v")))
    val bad = DataQuality.reconcile(src, dst, "k", "v", nBuckets = 8)
      .select("bucket", "counts_match", "checksum_match")
      .as[(Long, Boolean, Boolean)].collect().toSeq.sorted
    assert(bad.count(!_._3) === 1 && bad.find(!_._3).get._1 === 2L)
    assert(bad.forall(_._2), "value corruption must not trip counts_match")
    // a MISSING row trips both counts and checksum in its bucket
    val dropped = DataQuality.reconcile(src, src.where(col("k") =!= 17L), "k", "v", 8)
      .where(!col("counts_match"))
      .select("bucket").as[Long].collect().toSeq
    assert(dropped === Seq(17L % 8))
    // checksum is order-independent: a shuffled/repartitioned copy matches
    val shuffled = src.repartition(7, col("v")).sortWithinPartitions(col("v").desc)
    val reord = DataQuality.reconcile(src, shuffled, "k", "v", 8)
    assert(reord.where(!col("checksum_match")).count() === 0)
  }
}
