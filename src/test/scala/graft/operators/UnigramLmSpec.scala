package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  // classic corpus: "lo" is a very frequent substring; "hello"/"hell"
  // share a prefix; "zq" appears once (its pieces must still cover it
  // via single characters)
  private val docs = Seq(
    (1L, "lo lo lo lo lo hello hello hello hell"),
    (2L, "lo lo lo hello lolo lolo zq")
  ).toDF("doc_id", "text")

  test("coverage is total: singles always kept, every word round-trips") {
    val (pieces, seg) = UnigramLm.learn(docs, col("text"), targetVocab = 12)
    val pset = pieces.map(_.piece).toSet
    val chars = Seq("l", "o", "h", "e", "z", "q")
    chars.foreach(c => assert(pset.contains(c), s"single '$c' missing"))
    // every word's segmentation concatenates back to the word and uses
    // only learned pieces
    seg.foreach { case (w, _, ps) =>
      assert(ps.mkString === w, s"$w -> $ps")
      ps.foreach(p => assert(pset.contains(p), s"$w used unlearned '$p'"))
    }
    assert(pieces.size <= 12)
  }

  test("a frequent substring survives pruning and wins segmentation") {
    val (pieces, seg) = UnigramLm.learn(docs, col("text"), targetVocab = 10)
    val pset = pieces.map(_.piece).toSet
    assert(pset.contains("lo"), s"'lo' (freq-dominant) pruned: $pset")
    val m = seg.map(s => s._1 -> s._3).toMap
    assert(m("lo") === Seq("lo"))
    assert(m("lolo") === Seq("lo", "lo"))
    // the one-off word still segments (single-char fallback)
    assert(m("zq").mkString === "zq")
  }

  test("deterministic: two runs produce the identical table and segmentation") {
    val a = UnigramLm.learn(docs, col("text"), targetVocab = 10)
    val b = UnigramLm.learn(docs, col("text"), targetVocab = 10)
    assert(a._1 === b._1)
    assert(a._2 === b._2)
  }

  test("encodedTokenCounts: broadcast word-length join, exact counts") {
    val (_, seg) = UnigramLm.learn(docs, col("text"), targetVocab = 10)
    val lens = seg.map(s => s._1 -> s._3.length).toMap
    // doc 1: 5x lo + 3x hello + hell
    val exp1 = 5L * lens("lo") + 3L * lens("hello") + lens("hell")
    val exp2 = 3L * lens("lo") + lens("hello") + 2L * lens("lolo") + lens("zq")
    val counts = UnigramLm.encodedTokenCounts(docs, "doc_id", col("text"), spark, seg)
      .select("doc_id", "n_unigram_tokens").as[(Long, Long)].collect().toMap
    assert(counts === Map(1L -> exp1, 2L -> exp2))
    val p = UnigramLm.encodedTokenCounts(docs, "doc_id", col("text"), spark, seg)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
  }

  test("driver budget: an undersized budget fails fast with the estimate") {
    val e = intercept[IllegalArgumentException] {
      UnigramLm.learn(docs, col("text"), targetVocab = 10,
        driverFoldMaxBytes = 8L)
    }
    assert(e.getMessage.contains("driver fold budget"))
  }
}
