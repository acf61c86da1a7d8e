package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, text: String): Any =
    Seq(text).toDF("text").select(c.as("v")).head().get(0)

  test("tokens: lowercases, splits on runs of whitespace, drops empties") {
    assert(one(TextOps.tokens(col("text")), "  Hello   WORLD\tfoo\nbar  ")
      === Seq("hello", "world", "foo", "bar"))
  }

  test("surprisalScores: OOV gibberish outscores fluent text; micro-nat math is exact") {
    // LM slice (ids 1..3): "the cat sat" x heavy repetition => those
    // tokens are cheap; doc 10 reuses them, doc 20 is all-OOV gibberish
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat"),
      (3L, "the mat sat on the cat"),
      (10L, "the cat sat on the mat"), // held-out, all in-vocab
      (20L, "zxqv wfjp qqqz xxyy"),    // held-out, all OOV
      (30L, "")                        // tokenless: absent from output
    ).toDF("doc_id", "text")
    val out = TextOps.surprisalScores(docs, "doc_id", col("text"),
        col("doc_id") < 10L)
      .select("doc_id", "n_tokens", "nll_micro", "avg_nll")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(!out.contains(30L), "empty doc must be absent")
    assert(out(20L)._4 > out(10L)._4, "OOV gibberish must score higher")
    // exact check, doc 20: N = 15 LM tokens, V = 5 vocab; every token OOV
    // => surprisal = round(ln(20/1) * 1e6) = 2995732, x4 tokens
    assert(out(20L)._2 === 4L)
    assert(out(20L)._3 === 4L * math.round(math.log(20.0) * 1e6))
    // doc 10 = the(2) cat(1) sat(1) on(1) mat(1): cnt the=5, cat=3, sat=3,
    // on=2, mat=2 => per-term micro-nats from the same formula
    def s(cnt: Long) = math.round(math.log(20.0 / (cnt + 1)) * 1e6)
    assert(out(10L)._3 === 2 * s(5) + s(3) + s(3) + s(2) + s(2))
    assert(out(10L)._4 === out(10L)._3.toDouble / 1e6 / 6.0)
  }

  test("sourceKlDivergence: mixture-identical sources score exactly 0, drifted source positive") {
    // a and b have IDENTICAL unigram distributions => each equals the
    // corpus mixture => every ln ratio is exactly 1 => kl is EXACTLY 0;
    // c is all-drift vocabulary => strictly positive
    val docs = Seq(
      ("a", "x x y z"), ("a", "x y"),
      ("b", "x x y z"), ("b", "x y"),
      ("c", "q q q r")
    ).toDF("source", "text")
    val m = TextOps.sourceKlDivergence(docs, "source", col("text"))
      .select("source", "n_tokens", "kl").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(m("a")._1 === 6L && m("b")._1 === 6L && m("c")._1 === 4L)
    // a vs corpus-of-{a,b,c}: c's tokens dilute the mixture, so a/b drift
    // slightly from the corpus too — but a and b must agree BITWISE
    assert(m("a")._2 === m("b")._2, "identical sources must score identically")
    assert(m("c")._2 > m("a")._2, "drifted source must score strictly higher")
    // exact-zero case: corpus of ONLY the two identical sources
    val z = TextOps.sourceKlDivergence(docs.where(col("source") =!= "c"),
        "source", col("text"))
      .select("kl").collect().map(_.getDouble(0))
    assert(z.forall(_ === 0.0), s"mixture-identical sources must give kl=0, got ${z.toSeq}")
  }

  test("importanceWeights: target-like docs score positive, off-domain negative, exact rollup") {
    // target domain (t=true) speaks {x,y}; the rest of the corpus speaks
    // {q,r}. Scoring docs: 10 is pure target-vocab => positive avg_llr;
    // 11 is pure off-domain vocab => negative; sanity: the micro-nat
    // rollup identity holds exactly.
    val docs = Seq(
      (1L, "src0", "x y x y x y"), (2L, "src0", "x x y y"),
      (3L, "other", "q r q r q r"), (4L, "other", "q q r r"),
      (10L, "other", "x y x y"), (11L, "src0", "q r q r")
    ).toDF("doc_id", "source", "text")
    val m = TextOps.importanceWeights(docs, "doc_id", col("text"),
        col("source") === "src0")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(m(10L)._3 > 0.0, s"target-vocab doc must score positive, got ${m(10L)}")
    assert(m(11L)._3 < 0.0, s"off-domain doc must score negative, got ${m(11L)}")
    assert(m(10L)._3 === m(10L)._2.toDouble / 1e6 / m(10L)._1.toDouble)
    assert(m.keySet === Set(1L, 2L, 3L, 4L, 10L, 11L), "every doc is scored")
  }

  test("diversityReport: repetitive source scores lower ttr; 1-token group degrades to null ratio") {
    val docs = Seq(
      ("div", "a b c d e f"), ("div", "g h i j"),
      ("rep", "a a a a a a"), ("rep", "a a a a"),
      ("tiny", "a")
    ).toDF("source", "text")
    val m = TextOps.diversityReport(docs, "source", col("text"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4), r.getLong(5),
         if (r.isNullAt(6)) None else Some(r.getDouble(6)))).toMap
    assert(m("div")._3 === 1.0 && m("rep")._3 === 0.1)
    assert(m("div")._6 === Some(1.0), "all-distinct bigrams => ratio 1")
    // rep: 8 bigrams, all "a a" => 1 distinct
    assert(m("rep")._4 === 8L && m("rep")._5 === 1L && m("rep")._6 === Some(0.125))
    assert(m("tiny")._4 === 0L && m("tiny")._6 === None,
      "a 1-token group has no bigrams and a null ratio, not NaN")
  }

  test("sourceOverlapMatrix: identical sources hit 1.0, disjoint pairs are present at 0.0") {
    val docs = Seq(
      ("a", "w x y z w x"), ("b", "w x y z"), // same distinct 3-shingle set? a adds (z w x),(y z w)
      ("c", "p q r s")                        // disjoint from both
    ).toDF("source", "text")
    val m = TextOps.sourceOverlapMatrix(docs, "source", col("text"), 3)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(m.keySet === Set(("a", "b"), ("a", "c"), ("b", "c")),
      "dense matrix: every pair present, including zero-overlap ones")
    // b's shingles {wxy, xyz} are a strict subset of a's 4
    assert(m(("a", "b")) === ((4L, 2L, 2L, 0.5)))
    assert(m(("a", "c"))._3 === 0L && m(("a", "c"))._4 === 0.0)
    assert(m(("b", "c"))._3 === 0L)
  }

  test("sourceOverlapMatrix: boilerplate-shingle cap fires, drops the hot key, keeps sources visible") {
    // 6 sources share exactly one boilerplate shingle ("hot one two") and
    // have 3 unique shingles each; sources "y"/"z" are ONLY boilerplate
    val docs = (1 to 6).map(i => (s"s$i", s"hot one two u${i}a u${i}b u${i}c")) ++
      Seq(("y", "hot one two"), ("z", "hot one two"))
    val df = docs.toDF("source", "text")
    val obs = org.apache.spark.sql.Observation()
    val m = TextOps.sourceOverlapMatrix(df, "source", col("text"), 3,
        maxShingleSources = 3, capObs = Some(obs))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) None else Some(r.getDouble(5)))).toMap
    // the one crowded bucket (df=8 > cap=3) was dropped, with its 8 rows
    assert(obs.get("dropped_buckets") === 1L && obs.get("dropped_rows") === 8L)
    // pairs among s1..s6: ONLY the boilerplate was shared -> 0.0 now
    assert(m(("s1", "s2")) === ((3L, 3L, 0L, Some(0.0))))
    // y/z lost their whole vocabulary but stay visible: n=0; a non-empty
    // union still yields a real 0.0, the empty-vs-empty pair yields null
    assert(m(("s1", "z")) === ((3L, 0L, 0L, Some(0.0))))
    assert(m(("y", "z")) === ((0L, 0L, 0L, None)), "empty union -> null, not NaN")
    assert(m.keySet.size === 28, "dense 8x8 upper triangle")
    // default cap does NOT bind: boilerplate shared by all
    val loose = TextOps.sourceOverlapMatrix(df, "source", col("text"), 3)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(4)).toMap
    assert(loose(("s1", "s2")) === 1L && loose(("s1", "z")) === 1L)
  }

  test("compressionSignals: repetition compresses better than prose; deterministic; empty-safe") {
    val docs = Seq(
      (1L, "spam spam spam spam spam spam spam spam spam spam spam spam"),
      (2L, "the quick brown fox jumps over a lazy dog while rain falls"),
      (3L, "")
    ).toDF("doc_id", "text")
    val m = TextOps.compressionSignals(docs, "doc_id", col("text")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(m(1L)._3.get < m(2L)._3.get,
      s"repetitive text must compress better: $m")
    assert(m(3L)._1 === 0L && m(3L)._3 === None, "empty text yields null ratio")
    val again = TextOps.compressionSignals(docs, "doc_id", col("text")).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(again === m.view.mapValues(_._2).toMap, "deflate must be bit-repeatable")
  }

  test("contamination report: copied eval doc scores 1.0, fresh doc 0.0, partial in between") {
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    val eval = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta"),   // exact copy
      (11L, "totally novel words nowhere else written down"),   // fresh
      (12L, "one two three four unique closing words here")     // partial prefix
    ).toDF("doc_id", "text")
    val m = TextOps.contaminationReport(train, eval, "doc_id", col("text"))
      .select("doc_id", "contamination").as[(Long, Double)].collect().toMap
    assert(m(10L) === 1.0)
    assert(m(11L) === 0.0)
    assert(m(12L) > 0.0 && m(12L) < 1.0, s"partial overlap got ${m(12L)}")
  }

  test("repetition report: repeated text scores high, diverse text low") {
    val docs = Seq(
      (1L, "spam spam spam spam spam spam spam spam"),
      (2L, "eight entirely different tokens appear exactly once here")
    ).toDF("doc_id", "text")
    val m = TextOps.repetitionReport(docs, "doc_id", col("text"))
      .select("doc_id", "dup_word_frac", "top_bigram_frac")
      .as[(Long, Double, Double)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(m(1L)._1 === 1.0 - 1.0 / 8.0) // one distinct word of eight
    assert(m(1L)._2 === 1.0)             // every bigram is "spam spam"
    assert(m(2L)._1 === 0.0)
    assert(m(2L)._2 === 1.0 / 7.0)       // 7 bigrams, all unique
  }

  test("BPE-ish token count: letter runs, digit runs, single punctuation") {
    assert(one(TextOps.bpeishTokenCount(col("text")), "ab12cd, x!") === 6L)
    // ab | 12 | cd | , | x | !
  }

  test("language-ID: argmax of marker hits, alphabetical tie-break") {
    val pred = TextOps.predictedLang(
      TextOps.langMarkers.map { case (l, ms) =>
        l -> TextOps.markerHits(TextOps.tokens(col("text")), ms) })
    assert(one(pred, "the cat and the dog is here") === "en")
    assert(one(pred, "el que la de los") === "es")
    // zero hits everywhere -> all tie at 0 -> alphabetically first
    assert(one(pred, "zzz qqq") === "de")
  }

  test("quality signals: ratios on a known sentence") {
    val t = "the price is 42 dollars"
    assert(one(TextOps.wordCount(col("text")), t) === 5L)
    assert(one(TextOps.digitRatio(col("text")), t)
      === 2.0 / t.length)
    assert(one(TextOps.stopwordRatio(col("text")), t) === 2.0 / 5.0) // the, is
  }

  test("packSequences: bins respect the budget, cover all docs, deterministic") {
    val docs = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), TextOps.wordCount(col("text")).as("n_tok"))
    val budget = 600L
    val packed = TextOps.packSequences(docs, col("doc_id"), col("n_tok"), budget)
    // every doc assigned exactly once
    assert(packed.count() === docs.count())
    assert(packed.select("doc_id").distinct().count() === docs.count())
    // no bin over budget (except single oversized docs, which get own bins)
    val bins = packed.groupBy("bin_id")
      .agg(sum("n_tok").as("tot"), count(lit(1)).as("n"))
    assert(bins.where(col("tot") > budget && col("n") > 1).count() === 0,
      "multi-doc bin over budget")
    // packing efficiency: bins are reasonably full, not one doc per bin
    val avgPerBin = packed.count().toDouble / bins.count()
    assert(avgPerBin > 1.5, s"greedy fill expected, got $avgPerBin docs/bin")
    // deterministic across runs and partition counts
    val again = TextOps.packSequences(
      docs.repartition(7), col("doc_id"), col("n_tok"), budget)
      .select("doc_id", "bin_id").as[(Long, Long)].collect().sortBy(_._1).toSeq
    val once = packed.select("doc_id", "bin_id").as[(Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(again.map(_._1) === once.map(_._1))
    // bin ids depend on range partitioning, but bin CONTENTS must be the
    // same partition-count-independent grouping when the session's
    // shuffle partitioning is equal; at minimum membership sizes agree
    assert(again.groupBy(_._2).values.map(_.size).toSeq.sorted ===
      once.groupBy(_._2).values.map(_.size).toSeq.sorted)
  }

  test("bigrams pairs adjacent tokens; <2 tokens yields empty, not reversed") {
    val bg = TextOps.bigrams(TextOps.tokens(col("text")))
    assert(one(bg, "a b c d") ===
      scala.collection.mutable.ArraySeq("a b", "b c", "c d"))
    assert(one(bg, "  Hello   World ") ===
      scala.collection.mutable.ArraySeq("hello world"))
    assert(one(bg, "solo") === scala.collection.mutable.ArraySeq.empty[String])
    assert(one(bg, "") === scala.collection.mutable.ArraySeq.empty[String])
  }

  test("compositeQualityMicro: deterministic, monotone in its signals, null on empty") {
    val q = TextOps.compositeQualityMicro(col("text"))
    val diverse = one(q, "the quick brown fox and a clever dog ran far").asInstanceOf[Long]
    val again = one(q, "the quick brown fox and a clever dog ran far").asInstanceOf[Long]
    assert(diverse === again, "re-run must be identical")
    // pure repetition: distinct ratio collapses, stopwords absent => lower
    val repetitive = one(q, "spam spam spam spam spam spam spam spam spam spam")
      .asInstanceOf[Long]
    assert(repetitive < diverse)
    assert(one(q, "") === null)
    assert(one(q, "   ") === null)
    // bounded: each of the three blended signals is in [0, 1]
    assert(diverse > 0L && diverse <= 1000000L)
  }

  test("rolling fingerprint: deterministic, order-sensitive, stable range") {
    val fp = TextOps.rollingFingerprint(TextOps.tokens(col("text")))
    val a = one(fp, "alpha beta gamma").asInstanceOf[Long]
    val a2 = one(fp, "alpha beta gamma").asInstanceOf[Long]
    val b = one(fp, "gamma beta alpha").asInstanceOf[Long]
    assert(a === a2, "re-run must be identical")
    assert(a !== b, "token order must matter")
    assert(a >= 0 && a < 2147483647L)
  }

  test("domainClassify: count votes win, ties go to the smaller label, unseen is unknown") {
    val train = Seq(
      (1L, "apple banana apple", "fruit"),
      (2L, "zebra yak", "zoo"),
      (3L, "banana", "zoo")).toDF("id", "text", "lab")
    val test_ = Seq(
      (10L, "apple apple", "fruit"),   // apple: fruit=2, zoo=0 -> fruit
      (11L, "zebra", "zoo"),           // zoo only
      (12L, "banana", "fruit"),        // banana: fruit=1, zoo=1 tie -> fruit (min label)
      (13L, "quux corge", "zoo")       // no trained token -> unknown
    ).toDF("id", "text", "lab")
    val got = TextOps.domainClassify(train, test_, "id", "text", "lab")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(got === Map(
      10L -> (("fruit", "fruit")),
      11L -> (("zoo", "zoo")),
      12L -> (("fruit", "fruit")),
      13L -> (("zoo", "unknown"))))
  }

  test("domainClassify: token multiplicity on BOTH sides weighs the vote") {
    // train: 'x' seen 3x under a, 1x under b; 'y' 4x under b.
    // test doc 'x x y': score(a) = 3+3 = 6, score(b) = 1+1+4 = 6 — tie on
    // aggregate, min label a wins; doc 'x y y' -> a=3, b=1+8=9 -> b.
    val train = Seq(
      (1L, "x x x", "a"), (2L, "x", "b"), (3L, "y y y y", "b"))
      .toDF("id", "text", "lab")
    val test_ = Seq((10L, "x x y", "?"), (11L, "x y y", "?"))
      .toDF("id", "text", "lab")
    val got = TextOps.domainClassify(train, test_, "id", "text", "lab")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got === Map(10L -> "a", 11L -> "b"))
  }
}
