package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.functions.VectorOps

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.load(spark, sf, "embeddings")

  test("cosine: self-similarity ~1, bounds [-1,1] over the whole fixture") {
    val stats = emb.crossJoin(
        broadcast(emb.where(col("vec_id") === 0).select(col("embedding").as("q"))))
      .select(VectorOps.cosine(col("embedding"), col("q")).as("sim"),
        col("vec_id"))
      .agg(min("sim"), max("sim"),
        max(when(col("vec_id") === 0, col("sim"))).as("self"))
      .head()
    assert(stats.getDouble(0) >= -1.0 - 1e-9)
    assert(stats.getDouble(1) <= 1.0 + 1e-9)
    assert(math.abs(stats.getDouble(2) - 1.0) < 1e-9)
  }

  test("cosineToClassCentroid: colinear vectors score exactly 1.0, planted outlier lowest") {
    // label 0: a and b are the SAME direction (b = a/2) + outlier e on the
    // orthogonal axis; label 1: two 90-degree-apart vectors (symmetric).
    // All components exactly representable => the micro-unit snap is exact
    // and cos(a)=cos(b) BITWISE; the outlier must rank strictly lowest.
    val df = Seq(
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(0.5f, 0.0f), 0),
      (3L, Array(0.0f, 0.25f), 0),
      (4L, Array(0.0f, 1.0f), 1),
      (5L, Array(1.0f, 0.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val m = Similarity.cosineToClassCentroid(df, "vec_id", "embedding", "label")
      .select("vec_id", "cos_centroid").as[(Long, Double)].collect().toMap
    assert(m(1L) === m(2L), "colinear vectors must score identically")
    assert(m(4L) === m(5L), "symmetric vectors must score identically")
    assert(m(3L) < m.removed(3L).values.min, "outlier must be strictly lowest")
    // exact values: label-0 sum = (1.5e6, 0.25e6); cos(a) = 1.5e12 /
    // (1e6 * sqrt(1.5e6^2 + 0.25e6^2))
    val c2 = 1.5e6 * 1.5e6 + 0.25e6 * 0.25e6
    assert(m(1L) === 1.5e12 / (math.sqrt(1.0e12) * math.sqrt(c2)))
  }

  test("brute-force top-k: query vector itself ranks first") {
    val top = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      emb.where(col("vec_id") === 0), "embedding", 5)
      .as[(Long, Double)].collect()
    assert(top.head._1 === 0L)
    assert(top.head._2 === 1.0)
    assert(top.map(_._2).sliding(2).forall(p => p.head >= p.last), "descending")
  }

  test("LSH ANN: bucket contains the query itself; results subset of brute force ordering") {
    val q = emb.where(col("vec_id") === 0)
    val ann = Similarity.lshTopK(emb, "vec_id", "embedding", q, "embedding", 5, 8, 64)
      .as[(Long, Double)].collect()
    assert(ann.head._1 === 0L, "query must be its own nearest neighbor")
    // recall vs brute force: every ANN hit is a genuine vector with the
    // same (rounded) sim the brute-force path computes
    val bf = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, "embedding", 500)
      .as[(Long, Double)].collect().toMap
    ann.foreach { case (id, s) => assert(bf(id) === s) }
  }

  test("hard negatives: top-k similar vectors never share the anchor's label") {
    val anchors = emb.where(col("vec_id").isin(0, 1))
    val anchorLabels = anchors.select("vec_id", "label")
      .as[(Long, Long)].collect().toMap
    val out = Similarity.hardNegatives(emb, "vec_id", "embedding", "label",
      anchors, k = 5)
      .join(emb.select(col("vec_id"), col("label")), "vec_id")
      .select("query_id", "vec_id", "sim", "rn", "label")
      .as[(Long, Long, Double, Long, Long)].collect()
    assert(out.length === 10, "k=5 negatives per anchor")
    out.foreach { case (q, _, _, _, lbl) =>
      assert(lbl !== anchorLabels(q), s"anchor $q got a same-label negative")
    }
    // agrees with a hand-rolled filtered brute force for anchor 0
    val expect = emb.crossJoin(broadcast(
        emb.where(col("vec_id") === 0).select(col("embedding").as("q"), col("label").as("ql"))))
      .where(col("label") =!= col("ql"))
      .select(col("vec_id"), round(VectorOps.cosine(col("embedding"), col("q")), 6).as("sim"))
      .orderBy(col("sim").desc, col("vec_id")).limit(5)
      .as[(Long, Double)].collect().toSeq
    val got = out.filter(_._1 == 0L).sortBy(_._4).map(r => (r._2, r._3)).toSeq
    assert(got === expect)
  }

  test("multi-probe LSH: recall at least single-probe's, measured against brute force") {
    val q = emb.where(col("vec_id") === 0)
    val k = 10
    val bf = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, "embedding", k)
      .as[(Long, Double)].collect().map(_._1).toSet
    def recall(ids: Seq[Long]) = ids.count(bf.contains).toDouble / bf.size
    val single = Similarity.lshTopK(emb, "vec_id", "embedding", q, "embedding",
      k, numPlanes = 8, dim = 64).as[(Long, Double)].collect().map(_._1)
    val multi = Similarity.lshTopKMultiProbe(emb, "vec_id", "embedding", q, "embedding",
      k, numPlanes = 8, dim = 64).as[(Long, Double)].collect().map(_._1)
    assert(multi.head === 0L, "query is its own nearest neighbor")
    val (rs, rm) = (recall(single), recall(multi))
    info(f"recall@$k: single-probe $rs%.2f, multi-probe $rm%.2f")
    assert(rm >= rs, "probing Hamming-1 buckets must not lose recall")
    assert(rm > 0.0)
  }

  test("int8 quantization: cosine error small, top-k overlap high") {
    // compare exact vs quantized cosine against the same query vector
    val scored = emb
      .withColumn("__q8", VectorOps.quantizeInt8(col("embedding")))
      .crossJoin(broadcast(
        emb.where(col("vec_id") === 0).select(
          col("embedding").as("__qv"),
          VectorOps.quantizeInt8(col("embedding")).as("__qv8"))))
      .select(col("vec_id"),
        VectorOps.cosine(col("embedding"), col("__qv")).as("exact"),
        VectorOps.cosineInt8(col("__q8"), col("__qv8")).as("quant"))
    val maxErr = scored.agg(max(abs(col("exact") - col("quant")))).head().getDouble(0)
    info(f"max |cos_exact - cos_int8| = $maxErr%.4f")
    assert(maxErr < 0.02, s"quantization error too large: $maxErr")
    // top-10 by quantized sim overlaps top-10 exact almost entirely
    val exactTop = scored.orderBy(col("exact").desc, col("vec_id"))
      .limit(10).select("vec_id").as[Long].collect().toSet
    val quantTop = scored.orderBy(col("quant").desc, col("vec_id"))
      .limit(10).select("vec_id").as[Long].collect().toSet
    assert(exactTop.intersect(quantTop).size >= 8,
      s"overlap ${exactTop.intersect(quantTop).size}/10")
  }

  test("LSH-bucketed recall collapses at low thresholds (the r9 oracle-family adjudication)") {
    // why q_sim2/q_dedup6/7/21 run the exact within-block kernel: at a
    // pair-producing threshold (0.3 on the sf0.01 fixture, 111 exact
    // pairs) the sign-bucket collision probability (1−θ/π)^planes ≈ 0.6%
    // per band at θ≈72° misses most qualifying pairs even across 24
    // bands. Precision stays exact (every emitted pair is re-scored) —
    // the LSH trade is recall, measured here, not hoped away.
    val emb01 = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val exact = pairSet(Similarity.allPairsAboveThreshold(
      emb01, "vec_id", "embedding", col("label"), 0.3))
    val bucketed = pairSet(Similarity.lshBucketedPairsAboveThreshold(
      emb01, "vec_id", "embedding", col("label"), 0.3, dim = 64))
    assert(exact.size >= 100, s"fixture should yield ~111 pairs at 0.3, got ${exact.size}")
    assert(bucketed.subsetOf(exact), "precision must stay exact (re-scored candidates)")
    assert(bucketed.size < exact.size,
      s"recall must be < 1 at sim 0.3 (got ${bucketed.size}/${exact.size}) — " +
        "if this ever reaches 1.0 the exact-kernel adjudication should be revisited")
  }

  test("exact-integer pair kernel: agrees with the float kernel away from the threshold") {
    val emb01 = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val exactQ = Similarity.allPairsAboveThresholdExact(
      emb01, "vec_id", "embedding", col("label"), thrNum = 3, thrDen = 10)
      .select("id_a", "id_b", "sim").as[(Long, Long, Double)].collect()
    val floatQ = Similarity.allPairsAboveThreshold(
      emb01, "vec_id", "embedding", col("label"), 0.3)
      .select("id_a", "id_b", "sim").as[(Long, Long, Double)].collect()
    // quantization at 2^13 moves a 64-dim cosine by well under 1% — the
    // two kernels may only disagree on pairs hugging 0.3 exactly; on
    // this fixture they agree pair-for-pair, and each quantized sim is
    // within 0.01 of the float cosine.
    assert(exactQ.map(t => (t._1, t._2)).toSet === floatQ.map(t => (t._1, t._2)).toSet)
    val fm = floatQ.map(t => (t._1, t._2) -> t._3).toMap
    exactQ.foreach { case (a, b, s) =>
      assert(math.abs(s - fm((a, b))) < 0.01, s"pair ($a,$b): $s vs ${fm((a, b))}")
    }
    // hand-checked exact values: orthogonal, identical, and a known-angle
    // pair — the integer threshold must make the textbook calls
    val hand = Seq(
      (1L, 0, Array(1f, 0f, 0f, 0f)), (2L, 0, Array(0f, 1f, 0f, 0f)),   // cos 0
      (3L, 0, Array(0.5f, 0.5f, 0f, 0f)), (4L, 0, Array(1f, 1f, 0f, 0f)), // cos 1
      (5L, 0, Array(1f, 0.2f, 0f, 0f))  // cos(2,5) ≈ 0.196 < 0.3: excluded
    ).toDF("vec_id", "label", "embedding")
    val got = Similarity.allPairsAboveThresholdExact(
      hand, "vec_id", "embedding", col("label"), 3, 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 3L), (1L, 4L), (1L, 5L), (2L, 3L), (2L, 4L),
      (3L, 4L), (3L, 5L), (4L, 5L)), s"got $got")
    // identical directions: sim ≈ 1 (dot = √(na·nb) algebraically, but the
    // emitted quotient uses √na·√nb — two independent roundings, so the
    // value is deterministic yet may sit 1-2 ulps under 1.0)
    val one = Similarity.allPairsAboveThresholdExact(
      hand.where(col("vec_id").isin(3L, 4L)), "vec_id", "embedding",
      col("label"), 3, 10).select("sim").as[Double].collect()
    assert(one.length === 1 && math.abs(one.head - 1.0) < 1e-14, one.toSeq)
  }

  test("LSH-bucketed pair list equals exact all-pairs on fixture + planted near-dups") {
    // planted corpus: per label, random base vectors plus perturbed copies
    // (cosine ~0.99) — every planted pair must survive the bucketed path
    val rnd = new scala.util.Random(7)
    def vec() = Array.fill(64)(rnd.nextGaussian().toFloat)
    def perturb(v: Array[Float]) = v.map(x => x + 0.05f * rnd.nextGaussian().toFloat)
    val rows = (0 until 40).flatMap { i =>
      val base = vec()
      Seq((i.toLong * 2, i % 4, base), (i.toLong * 2 + 1, i % 4, perturb(base)))
    }
    val planted = rows.toDF("vec_id", "label", "embedding")
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b", "sim").as[(Long, Long, Double)].collect().toSet
    val exact = pairSet(Similarity.allPairsAboveThreshold(
      planted, "vec_id", "embedding", col("label"), 0.5))
    val bucketed = pairSet(Similarity.lshBucketedPairsAboveThreshold(
      planted, "vec_id", "embedding", col("label"), 0.5, dim = 64))
    assert(exact.size >= 40, s"plant failed: only ${exact.size} qualifying pairs")
    assert(bucketed === exact,
      s"missed ${(exact -- bucketed).take(3)} / extra ${(bucketed -- exact).take(3)}")
    // and on the real fixture (sparse: random vectors rarely clear 0.5)
    val fxExact = pairSet(Similarity.allPairsAboveThreshold(
      emb, "vec_id", "embedding", col("label"), 0.5))
    val fxBucketed = pairSet(Similarity.lshBucketedPairsAboveThreshold(
      emb, "vec_id", "embedding", col("label"), 0.5, dim = 64))
    assert(fxBucketed === fxExact)
  }

  test("autoPlanesPerBand: fixture sizes pin the round-4 default; log2 growth beyond") {
    // <= targetBucketLoad, and every fixture/1x-bench size, resolve to the
    // round-4 default of 4 => oracle-checked results unchanged there
    assert(Similarity.autoPlanesPerBand(0) === 4)
    assert(Similarity.autoPlanesPerBand(500) === 4)
    assert(Similarity.autoPlanesPerBand(2000) === 4)
    // beyond: ceil(log2(n/128)) — buckets grow with the corpus
    assert(Similarity.autoPlanesPerBand(5000) === 6)
    assert(Similarity.autoPlanesPerBand(20000) === 8)
    assert(Similarity.autoPlanesPerBand(1L << 47) === 40) // 100 TB of 8-byte rows
    // the ANN probe floor: tiny corpora still get >= 2 planes
    assert(Similarity.autoPlanesPerBand(300, minPlanes = 2) === 2)
  }

  test("bandsForRecall: reproduces the shipped defaults and prices plane growth") {
    // planes=4, θ=60°, miss 0.6% => the shipped 24 bands (realized 0.51%)
    assert(Similarity.bandsForRecall(4) === 24)
    // each extra plane multiplies the requirement by ~3/2 (p shrinks 2/3x)
    val b = (4 to 10).map(Similarity.bandsForRecall(_))
    assert(b.sliding(2).forall(w => w(1) > w(0)), s"monotone: $b")
    assert(b.last.toDouble / b.head > math.pow(1.5, 6) * 0.7, s"~(3/2)^Δ growth: $b")
    // and the returned count actually achieves the target miss prob
    for (planes <- Seq(4, 7, 10)) {
      val p = math.pow(2.0 / 3.0, planes)
      val miss = math.pow(1.0 - p, Similarity.bandsForRecall(planes))
      assert(miss <= 0.006 + 1e-12, s"planes=$planes realized miss $miss")
    }
  }

  test("HyperplaneBuckets kernel is bitwise-equal to the Column lshBucket fold") {
    val (numBands, planes, seed) = (5, 6, 42L)
    val colForm = array((0 until numBands).map { b =>
      Similarity.lshBucket(col("embedding"),
        Similarity.hyperplanes(planes, 64, seed + b), planes)
    }: _*)
    val exprForm = graft.functions.HyperplaneBuckets(
      col("embedding"), numBands, planes, 64, seed)
    val diff = emb.select(colForm.as("a"), exprForm.as("b"))
      .where(not(col("a") === col("b"))).count()
    assert(diff === 0L, "same seeded planes, same fold order, same buckets")
    // length-mismatch vector: Column form's null dots fall to bucket 0s
    val short = Seq(Tuple1(Array.fill(3)(1.0f))).toDF("embedding")
    val got = short.select(exprForm.as("b")).as[Seq[Long]].head()
    assert(got === Seq.fill(numBands)(0L))
  }

  test("AutoPlanes default equals the pinned round-4 plane count at fixture scale") {
    def pairs(planes: Int) = Similarity.lshBucketedPairsAboveThreshold(
        emb, "vec_id", "embedding", col("label"), 0.5, dim = 64,
        planesPerBand = planes)
      .select("id_a", "id_b", "sim").as[(Long, Long, Double)].collect().toSet
    assert(pairs(Similarity.AutoPlanes) === pairs(4))
  }

  test("bucket cap: a flooded sign bucket is dropped, a distinct near-dup pair survives") {
    // 500 copies of ONE vector collapse into the same bucket in every band
    // (the embedding mirror of boilerplate text); one perturbed pair of a
    // different random vector lives in tiny buckets and must survive.
    val rnd = new scala.util.Random(11)
    val template = Array.fill(64)(rnd.nextGaussian().toFloat)
    val other = Array.fill(64)(rnd.nextGaussian().toFloat)
    val flood = (0 until 500).map(i => (i.toLong, 0, template))
    val planted = Seq((9000L, 0, other),
      (9001L, 0, other.map(x => x + 0.05f * rnd.nextGaussian().toFloat)))
    val df = (flood ++ planted).toDF("vec_id", "label", "embedding")
    val obs = org.apache.spark.sql.Observation("emb_cap")
    val pairs = Similarity.lshBucketedPairsAboveThreshold(
        df, "vec_id", "embedding", col("label"), 0.5, dim = 64, maxBucketSize = 50,
        capObs = Some(obs))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((9000L, 9001L)), s"planted pair must survive the cap, got $pairs")
    assert(!pairs.exists(p => p._1 < 500L), "flooded bucket pairs must be dropped")
    // the 500 identical vectors land in ONE over-cap bucket per band (the
    // 2 planted vectors may or may not share it): >= 24 dropped buckets,
    // >= 500 rows each — the cap's cost is reported, not silent
    val m = obs.get
    assert(m("dropped_buckets").asInstanceOf[Long] >= 24L, m.toString)
    assert(m("dropped_rows").asInstanceOf[Long] >= 24L * 500, m.toString)
  }

  test("topKPerGroup returns at most k rows per group, correctly ranked") {
    val df = Seq((1, 10.0), (1, 30.0), (1, 20.0), (2, 5.0)).toDF("g", "v")
    val out = Similarity.topKPerGroup(df, Seq("g"), Seq(col("v").desc), 2)
      .select("g", "v", "rn").as[(Int, Double, Long)].collect().sorted
    assert(out === Seq((1, 20.0, 2L), (1, 30.0, 1L), (2, 5.0, 1L)).sorted)
  }

  test("centroidDrift: identical halves give exactly 1.0; an orthogonal shift drops it; lone-half labels vanish") {
    val rows = Seq(
      // label 0: both halves average to the same direction -> cos 1.0
      (0L, 0, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, 0, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      // label 1: half A on x, half B on y -> cos 0.0
      (2L, 1, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (3L, 1, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      // label 2: only the even half exists -> no drift row
      (4L, 2, Array(0.0f, 0.0f, 1.0f, 0.0f)))
      .toDF("vec_id", "label", "embedding")
    val got = Similarity.centroidDrift(rows, "embedding", "label",
        pmod(col("vec_id"), lit(2)))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(got === Map(0 -> 1.0, 1 -> 0.0))
  }
}
