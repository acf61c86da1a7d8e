package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "a b a"),
    (2L, "a c"),
    (3L, "c c c c")
  ).toDF("doc_id", "text")

  private def post = Bm25.postings(corpus, "doc_id", col("text"))

  /** The operator's exact-integer formula replicated independently —
    * milli-pinned idf, rational tfc scaled to integer num/den, integer
    * round-half-up — asserts the Spark plumbing computes the declared
    * math, term by term. */
  private def contribMicro(tf: Long, dl: Long, df: Long, n: Long, sumDl: Long): Long = {
    val idfMilli = math.round(
      math.log(1.0 + (n.toDouble - df.toDouble + 0.5) / (df.toDouble + 0.5)) * 1000.0)
    val num = 44L * tf * sumDl
    val den = 20L * tf * sumDl + 6L * sumDl + 18L * dl * n
    (2L * idfMilli * num * 1000L + den) / (2L * den) // positives: / == div
  }

  test("postings: one row per (doc, term) with tf and doc length") {
    val rows = post.as[(Long, String, Long, Long)].collect().toSet
    assert(rows === Set(
      (1L, "a", 2L, 3L), (1L, "b", 1L, 3L),
      (2L, "a", 1L, 2L), (2L, "c", 1L, 2L),
      (3L, "c", 4L, 4L)))
  }

  test("scoreMicro matches the hand formula exactly (N=3, S=9)") {
    val q = Seq((1L, "a"), (1L, "c")).toDF("query_id", "term")
    val got = Bm25.scoreMicro(post, q)
      .as[(Long, Long, Long)].collect().map { case (_, d, s) => d -> s }.toMap
    // df(a)=2, df(c)=2, N=3, S=Σdl=9
    val a1 = contribMicro(2, 3, 2, 3, 9L) // doc1: a tf=2 dl=3
    val a2 = contribMicro(1, 2, 2, 3, 9L) // doc2: a tf=1 dl=2
    val c2 = contribMicro(1, 2, 2, 3, 9L) // doc2: c tf=1 dl=2
    val c3 = contribMicro(4, 4, 2, 3, 9L) // doc3: c tf=4 dl=4
    assert(got === Map(1L -> a1, 2L -> (a2 + c2), 3L -> c3))
    // one hand-pinned anchor so a systematic formula drift can't hide in
    // the replicated math: idf_milli = round(1000·ln(1.6)) = 470;
    // num = 44·2·9 = 792, den = 20·2·9 + 6·9 + 18·3·3 = 576;
    // 470·792·1000/576 = 646250 exactly (the half-up add can't move it)
    assert(a1 === 646250L)
  }

  test("idf milli-pin is off-boundary for EVERY possible df at fixture corpus sizes") {
    // The only libm value in scoring is idf, pinned at milli precision.
    // For the pin to be engine-build-exact, 1000·ln(1+(N−df+0.5)/(df+0.5))
    // must sit away from every round-half boundary by far more than libm
    // drift (≤ a few ulp ≈ 1e-12 at this magnitude). Sweep every df the
    // corpora can produce: margins are 1.3e-2 (N=50), 3.0e-3 (N=500),
    // 2.5e-5 (N=5000) — ≥ 10^7× the worst libm disagreement.
    for (n <- Seq(50L, 500L, 5000L)) {
      var worst = Double.MaxValue
      var df = 1L
      while (df <= n) {
        val v = math.log(1.0 +
          (n.toDouble - df.toDouble + 0.5) / (df.toDouble + 0.5)) * 1000.0
        val frac = v - math.floor(v)
        worst = math.min(worst, math.abs(frac - 0.5))
        df += 1
      }
      assert(worst > 1e-6, s"idf milli margin too small at N=$n: $worst")
    }
  }

  test("query terms are a SET: duplicated query terms don't double-count") {
    val q1 = Seq((1L, "a"), (1L, "a")).toDF("query_id", "term")
    val q2 = Seq((1L, "a")).toDF("query_id", "term")
    val s1 = Bm25.scoreMicro(post, q1).orderBy("doc_id").as[(Long, Long, Long)].collect()
    val s2 = Bm25.scoreMicro(post, q2).orderBy("doc_id").as[(Long, Long, Long)].collect()
    assert(s1.toSeq === s2.toSeq)
  }

  test("topK ranks by score desc with doc_id tie-break, k enforced") {
    val scored = Seq((1L, 10L, 5L), (1L, 3L, 9L), (1L, 7L, 5L), (1L, 2L, 1L))
      .toDF("query_id", "doc_id", "score_micro")
    val got = Bm25.topK(scored, 3)
      .select("doc_id", "rank").as[(Long, Long)].collect().toSeq
    assert(got === Seq((3L, 1L), (7L, 2L), (10L, 3L))) // 7 before 10 on tie
  }

  test("proximity: window bound, min distance and hit count") {
    //       pos: 0 1 2 3 4 5 6 7
    val docs = Seq(
      (1L, "x spark a b join y spark z"), // spark@1,6 join@4 -> dists 3, 2
      (2L, "spark a b c d e f join"),     // dist 7 > window 5: excluded
      (3L, "join spark")                  // dist 1
    ).toDF("doc_id", "text")
    val got = Bm25.proximity(docs, "doc_id", col("text"), Seq(("spark", "join")), 5)
      .orderBy("doc_id")
      .select("doc_id", "min_dist", "n_hits").as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 2L, 2L), (3L, 1L, 1L)))
  }

  test("rrfFuse sums per-ranker reciprocal ranks as exact integers") {
    // doc 10 ranked 1 and 3; doc 20 only by one ranker at rank 2
    val ranked = Seq((1L, 10L, 1L), (1L, 10L, 3L), (1L, 20L, 2L))
      .toDF("query_id", "doc_id", "rank")
    val got = Bm25.rrfFuse(ranked).orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    val r = (k: Long) => math.round(1e6 / (60.0 + k.toDouble))
    assert(got === Seq((1L, 10L, r(1) + r(3)), (1L, 20L, r(2))))
  }

  test("incrementalPostings: append-only merge equals a full rebuild") {
    val day1 = corpus.where(col("doc_id") =!= 2L)
    val day2 = corpus.where(col("doc_id") === 2L)
    val merged = Bm25.incrementalPostings(
        Bm25.postings(day1, "doc_id", col("text")), day2, "doc_id", col("text"))
      .as[(Long, String, Long, Long)].collect().toSet
    val full = post.as[(Long, String, Long, Long)].collect().toSet
    assert(merged === full)
    // and the scores derived from the merge match the full index exactly
    val q = Seq((1L, "a"), (1L, "c")).toDF("query_id", "term")
    val ms = Bm25.scoreMicro(Bm25.postings(day1, "doc_id", col("text"))
        .unionByName(Bm25.postings(day2, "doc_id", col("text"))), q)
      .as[(Long, Long, Long)].collect().toSet
    val fs = Bm25.scoreMicro(post, q).as[(Long, Long, Long)].collect().toSet
    assert(ms === fs)
  }

  test("phraseSearch finds runs; overlapping occurrences all count") {
    val docs = Seq(
      (1L, "a b c a b"),   // "a b" at 0 and 3
      (2L, "b b b b"),     // "b b" at 0,1,2 (overlapping)
      (3L, "a c b"),       // both terms, never adjacent in order
      (4L, "b a")          // reversed: no "a b"
    ).toDF("doc_id", "text")
    val ab = Bm25.phraseSearch(docs, "doc_id", col("text"), Seq(10L -> "a b"))
      .orderBy("doc_id")
      .select("doc_id", "n_occurrences", "first_pos")
      .as[(Long, Long, Long)].collect().toSeq
    assert(ab === Seq((1L, 2L, 0L)))
    val bb = Bm25.phraseSearch(docs, "doc_id", col("text"), Seq(11L -> "b b"))
      .select("doc_id", "n_occurrences", "first_pos")
      .as[(Long, Long, Long)].collect().toSeq
    assert(bb === Seq((2L, 3L, 0L)))
  }

  test("phraseSearch repeated-term phrase needs every offset, not just any") {
    val docs = Seq(
      (1L, "x b b b y"),   // "b b b" at 1
      (2L, "b b y b b")    // two "b b" runs but never three in a row
    ).toDF("doc_id", "text")
    val got = Bm25.phraseSearch(docs, "doc_id", col("text"), Seq(1L -> "b b b"))
      .select("doc_id", "n_occurrences", "first_pos")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 1L, 1L)))
  }

  test("mmrSelect: λ=1 is plain top-k by relevance; ties to lower doc_id") {
    val cands = Seq((1L, 900L), (2L, 800L), (3L, 900L), (4L, 700L))
      .toDF("doc_id", "rel_micro")
    val sims = Seq((1L, 3L, 999999L)).toDF("id_a", "id_b", "sim_micro")
    val got = Bm25.mmrSelect(cands, sims, k = 3, lambdaMicro = 1000000L)
      .select("rank", "doc_id").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 1L), (2L, 3L), (3L, 2L)))
  }

  test("mmrSelect: a near-duplicate of the top hit is pushed out of the page") {
    // docs 1 and 2 are near-identical (sim 0.99); 3 is distinct but less
    // relevant. Plain top-2 = (1, 2); MMR at λ=0.7 must pick (1, 3).
    val cands = Seq((1L, 900000L), (2L, 890000L), (3L, 600000L))
      .toDF("doc_id", "rel_micro")
    val sims = Seq((1L, 2L, 990000L), (1L, 3L, 100000L), (2L, 3L, 120000L))
      .toDF("id_a", "id_b", "sim_micro")
    val got = Bm25.mmrSelect(cands, sims, k = 2)
      .select("doc_id").as[Long].collect().toSeq
    assert(got === Seq(1L, 3L))
  }

  test("mmrSelect: deterministic, missing pairs penalize zero, k caps at candidates") {
    val cands = Seq((5L, 500000L), (6L, 400000L)).toDF("doc_id", "rel_micro")
    val sims = spark.emptyDataFrame
      .select(lit(0L).as("id_a"), lit(0L).as("id_b"), lit(0L).as("sim_micro"))
      .limit(0)
    val once = Bm25.mmrSelect(cands, sims, k = 10).collect().toSeq
    val again = Bm25.mmrSelect(cands, sims, k = 10).collect().toSeq
    assert(once === again)
    assert(once.map(_.getLong(1)) === Seq(5L, 6L))
  }

  test("mmrSelect: sparse sims with negative entries — missing pairs floor the max at 0") {
    // selected = {1}. Candidate 2's only pair with 1 is NEGATIVE
    // (sim -0.5): the per-pair penalty inside the max is
    // max(getOrElse((2,1), 0)) = -500000 — but candidate 3 has NO pair
    // with 1, so its penalty is exactly 0, not "no contribution".
    // rel: 1=900k, 2=880k, 3=600k. λ=0.7:
    //   mmr(2) = 0.7·880000 − 0.3·(−500000) = 616000 + 150000 = 766000 µ²
    //   mmr(3) = 0.7·600000 − 0.3·0        = 420000 µ²
    // so 2 wins step 2 BECAUSE the negative sim is a bonus — the exact
    // semantics the q_srch8 oracle mirrors per-pair with COALESCE(sim,0).
    val cands = Seq((1L, 900000L), (2L, 880000L), (3L, 600000L))
      .toDF("doc_id", "rel_micro")
    val sims = Seq((1L, 2L, -500000L)).toDF("id_a", "id_b", "sim_micro")
    val got = Bm25.mmrSelect(cands, sims, k = 3)
      .select("doc_id", "mmr_micro").as[(Long, Long)].collect().toSeq
    assert(got.map(_._1) === Seq(1L, 2L, 3L))
    assert(got(1)._2 === 700000L * 880000L + 300000L * 500000L)
    // step 3: selected = {1, 2}; candidate 3 pairs with neither ->
    // max(0, 0) = 0 penalty
    assert(got(2)._2 === 700000L * 600000L)
  }

  test("scoring plan: queries and stats are broadcast, postings never re-shuffled") {
    val q = Seq((1L, "a")).toDF("query_id", "term")
    val p = Bm25.scoreMicro(post, q).queryExecution.executedPlan.toString
    assert("BroadcastExchange".r.findAllIn(p).length >= 2,
      s"query terms + df + corpus stats must broadcast:\n${p.take(1500)}")
    // the only hash exchanges allowed are the postings build (groupBy doc/term)
    // and the final per-(query,doc) rollup — no join-driven repartition of
    // the postings side
    assert(!p.contains("SortMergeJoin"),
      s"scoring must not sort-merge-join the postings:\n${p.take(1500)}")
  }
}
