package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("capPerDomain keeps the top-cap rows per domain, deterministically") {
    // 3 domains x 100 rows; quality = id so the top-5 are known exactly
    val df = spark.range(0, 300).select(col("id"),
      (col("id") % 3).cast("string").as("dom"))
    val out = Curation.capPerDomain(df, col("dom"), 5, col("id").desc)
      .as[(Long, String)].collect().toSet
    assert(out.size === 15)
    (0 until 3).foreach { dm =>
      // largest id < 300 with id % 3 == dm is 297 + dm
      val expect = (297 + dm to 0 by -3).take(5).map(v => (v.toLong, dm.toString))
      expect.foreach(e => assert(out.contains(e), s"missing $e"))
    }
  }

  test("capPerDomain plan uses WindowGroupLimit (map-side pre-pruning)") {
    val df = spark.range(0, 1000).select(col("id"),
      (col("id") % 7).cast("string").as("dom"))
    val p = Curation.capPerDomain(df, col("dom"), 3, col("id").desc)
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), p.take(1200))
  }

  test("weightedSample: exact k, key-stable, weight-monotone, top-k plan") {
    // two weight classes over 2000 keys: w=50 for ids < 400, else w=1
    val df = spark.range(0, 2000).select(col("id"),
      when(col("id") < 400, 50.0).otherwise(1.0).as("w"))
    val got = Curation.weightedSample(df, col("id"), col("w"), k = 200)
    val ids = got.select("id").as[Long].collect().toSet
    assert(ids.size === 200, "exactly k rows")
    val again = Curation.weightedSample(df.repartition(17), col("id"), col("w"), 200)
      .select("id").as[Long].collect().toSet
    assert(again === ids, "sample is a pure function of keys+weights")
    // heavy items are 20% of the corpus but weight 50x: they must
    // dominate the sample (expected inclusion prob ~1 vs ~0.1)
    val heavy = ids.count(_ < 400)
    assert(heavy > 150, s"weight monotonicity: got $heavy/200 heavy")
    val p = Curation.weightedSample(df, col("id"), col("w"), 200)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
  }

  test("weightedSample: oracle-boundary margin dwarfs libm drift (q_sample6 contract)") {
    // q_sample6 compares the selected SET only, so the single cross-engine
    // hazard is the ln() score ordering flipping at the rank-k boundary.
    // Pin the fixture margin: the k/k+1 relative score gap must sit many
    // orders above libm's ~1e-16 1-ulp drift (measured ~5e-4 at sf0.01;
    // this guard fires long before the oracle could become flaky).
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .where(col("n_chars") > 0)
    val u = (pmod(xxhash64(col("doc_id")), lit(1000000L)).cast("double") + lit(0.5)) / 1e6
    val scores = docs.select((log(u) / col("n_chars").cast("double")).as("score"))
      .orderBy(col("score").desc).limit(101)
      .as[Double].collect()
    val (s100, s101) = (scores(99), scores(100))
    val rel = math.abs((s100 - s101) / s100)
    assert(rel > 1e-9, s"rank-100/101 relative margin $rel too thin for a libm-robust oracle")
  }

  test("weightedSample: non-positive weights are excluded; short sample when eligible < k") {
    // contract (scaladoc): min(k, #rows with weight > 0) rows — a weight
    // of 0 or less is ineligible by construction, never silently included
    val df = spark.range(0, 100).select(col("id"),
      when(col("id") < 10, 5.0).when(col("id") < 20, 0.0)
        .otherwise(-1.0).as("w"))
    val got = Curation.weightedSample(df, col("id"), col("w"), k = 50)
      .select("id").as[Long].collect().toSet
    assert(got.size === 10, s"only the 10 positive-weight rows are eligible, got ${got.size}")
    assert(got.forall(_ < 10L), s"sample must hold only positive-weight keys: $got")
  }

  test("selectUnderBudget equals the single-window formulation") {
    // weights 1..200 in a scrambled insertion order; order by weight asc
    val df = spark.range(1, 201).select(
      pmod(col("id") * 7, lit(201)).as("k"), col("id").as("w"))
      .repartition(13)
    val budget = 500L
    val got = Curation.selectUnderBudget(df, "w", budget, col("w").asc)
      .select("k", "w", "running_total")
      .as[(Long, Long, Long)].collect().sortBy(_._2)
    // reference: plain cumulative sum (single window, fine at test size)
    val expect = (1L to 200L).scanLeft(0L)(_ + _).tail.zipWithIndex
      .takeWhile(_._1 <= budget)
      .map { case (acc, i) => (pmod(lit((i + 1) * 7), lit(201)), i + 1L, acc) }
    assert(got.length === expect.length)
    got.zip(expect).foreach { case ((_, w, rt), (_, ew, ert)) =>
      assert(w === ew && rt === ert)
    }
    // the cut is exact: adding the next row would exceed the budget
    val total = got.map(_._2).sum
    assert(total <= budget && total + (got.length + 1) > budget)
  }

  test("selectUnderBudget: zero budget and budget >= total") {
    val df = spark.range(1, 11).select(col("id").as("k"), lit(2L).as("w"))
    assert(Curation.selectUnderBudget(df, "w", 0L, col("k")).count() === 0)
    val all = Curation.selectUnderBudget(df, "w", 1000L, col("k"))
    assert(all.count() === 10)
    assert(all.agg(max("running_total")).as[Long].head() === 20L)
  }

  // ---- waterfillMixture -------------------------------------------------

  private def plan(avail: Seq[(String, Long)], budget: Long, maxEpochs: Int = 2) =
    Curation.waterfillMixture(avail.toDF("src", "avail"), "src", "avail",
        lit(budget), maxEpochs)
      .select("src", "avail", "cap", "alloc")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap

  test("waterfill: small sources saturate at cap, the rest share one level") {
    // caps (x2): a=20, b=40, c=200, d=200; budget 160
    // a saturates (share 40 > 20); then share floor(140/3)=46 > 40: b
    // saturates too; then share floor(100/2)=50 <= 200: level = 50.
    val got = plan(Seq("a" -> 10L, "b" -> 20L, "c" -> 100L, "d" -> 100L), 160L)
    assert(got("a")._4 === 20L && got("b")._4 === 40L)
    assert(got("c")._4 === 50L && got("d")._4 === 50L)
  }

  test("waterfill: budget >= total cap gives every source its cap") {
    val got = plan(Seq("a" -> 5L, "b" -> 50L), 1000L)
    assert(got("a")._4 === 10L && got("b")._4 === 100L)
  }

  test("waterfill: allocation never exceeds budget; floor deficit < n") {
    for (budget <- Seq(0L, 7L, 33L, 160L, 301L)) {
      val got = plan(Seq("a" -> 10L, "b" -> 20L, "c" -> 100L, "d" -> 23L), budget)
      val total = got.values.map(_._4).sum
      val capSum = got.values.map(_._3).sum
      assert(total <= math.min(budget, capSum))
      if (budget <= capSum) assert(budget - total < got.size,
        s"budget=$budget total=$total: deficit must be floor slack only")
      got.values.foreach { case (_, _, cap, alloc) => assert(alloc <= cap) }
    }
  }

  test("temperatureMixture: exact budget, flattening direction, integer isqrt weights") {
    val per = Seq(("big", 1000000L), ("mid", 10000L), ("small", 100L))
      .toDF("src", "avail")
    val got = Curation.temperatureMixture(per, "src", "avail", lit(50000L))
      .select("src", "avail", "weight", "alloc").as[(String, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    // isqrt weights: 1000, 100, 10
    assert(got("big")._3 === 1000L && got("mid")._3 === 100L && got("small")._3 === 10L)
    // largest-remainder apportionment sums EXACTLY to the budget
    assert(got.values.map(_._4).sum === 50000L)
    // the flattening: shares follow sqrt, so the small source's share of
    // the budget (10/1110) far exceeds its share of the corpus (1e-4)
    val smallShare = got("small")._4.toDouble / 50000.0
    assert(smallShare > 0.008 && smallShare < 0.010)
    // proportional-to-weight within integer rounding
    got.values.foreach { case (_, _, w, a) =>
      assert(math.abs(a - 50000.0 * w / 1110.0) <= 1.0) }
  }

  test("temperatureMixture: zero-weight corpus allocates nothing; epochs surface repetition") {
    val got = Curation.temperatureMixture(
        Seq(("a", 0L), ("b", 0L)).toDF("src", "avail"), "src", "avail", lit(99L))
      .select("src", "alloc").as[(String, Long)].collect().toMap
    assert(got.values.forall(_ === 0L), "W = 0 must allocate nothing")
    val rep = Curation.temperatureMixture(
        Seq(("tiny", 4L), ("huge", 1000000L)).toDF("src", "avail"),
        "src", "avail", lit(100000L))
      .where(col("src") === "tiny")
      .select("epochs").as[Double].collect().head
    // tiny gets ~100000*2/1002 ≈ 200 tokens from 4 available ⇒ ~50 epochs:
    // temperature sampling repeats freely, and the column makes that visible
    assert(rep > 10.0, s"expected heavy repetition surfaced in epochs, got $rep")
  }

  test("waterfill: empty source gets zero allocation and null epochs") {
    val row = Curation.waterfillMixture(
        Seq(("a", 0L), ("b", 50L)).toDF("src", "avail"), "src", "avail",
        lit(60L), 2)
      .where(col("src") === "a").collect().head
    assert(row.getAs[Long]("alloc") === 0L)
    assert(row.isNullAt(row.fieldIndex("epochs")))
  }

  test("waterfill: epoch ratio reported; maxEpochs bounds it") {
    val got = Curation.waterfillMixture(
        Seq(("a", 10L), ("b", 1000L)).toDF("src", "avail"), "src", "avail",
        lit(500L), maxEpochs = 3)
      .select("src", "alloc", "epochs").as[(String, Long, Double)]
      .collect().map(r => r._1 -> r).toMap
    // a saturates at 3 epochs (30 tokens); b gets floor(470/1)=470
    assert(got("a")._2 === 30L && got("a")._3 === 3.0)
    assert(got("b")._2 === 470L && got("b")._3 === 0.47)
  }
}
