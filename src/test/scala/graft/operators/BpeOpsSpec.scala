package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BpeOpsSpec extends SparkSpec {
  import spark.implicits._

  // the Sennrich et al. classic: {low:5, lower:2, newest:6, widest:3}
  private def classicCorpus = Seq(
    (1L, Seq.fill(5)("low").mkString(" ")),
    (2L, Seq.fill(2)("lower").mkString(" ")),
    (3L, Seq.fill(6)("newest").mkString(" ")),
    (4L, Seq.fill(3)("widest").mkString(" "))
  ).toDF("doc_id", "text")

  test("learnMerges reproduces the classic merge sequence with deterministic tie-breaks") {
    val (merges, vocab) = BpeOps.learnMerges(classicCorpus, col("text"), 3)
    // es and st both count 9 -> (e,s) wins the pair-asc tie-break; then
    // (es,t) at 9; then lo/ow tie at 7 -> (l,o)
    assert(merges.map(m => (m._2, m._3, m._4)) ===
      Seq(("e", "s", 9L), ("es", "t", 9L), ("l", "o", 7L)))
    assert(merges.map(_._1) === Seq(0, 1, 2), "ranks are dense from 0")
    val syms = vocab.select("word", "symbols").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(syms("newest") === Seq("n", "e", "w", "est"))
    assert(syms("widest") === Seq("w", "i", "d", "est"))
    assert(syms("low") === Seq("lo", "w"))
  }

  test("learnMerges: greedy leftmost-first merge inside repeats; stops when no pair repeats") {
    val df = Seq((1L, "aaa aaa")).toDF("doc_id", "text")
    val (merges, vocab) = BpeOps.learnMerges(df, col("text"), 10)
    // (a,a) count 4 (two per "aaa") -> merge; "aaa" -> [aa, a]; then
    // (aa,a) count 2 -> merge -> [aaa]; then nothing repeats
    assert(merges.map(m => (m._2, m._3)) === Seq(("a", "a"), ("aa", "a")))
    assert(vocab.select("symbols").head().getSeq[String](0) === Seq("aaa"))
  }

  test("encodedTokenCounts: per-doc counts follow the symbolized vocab via broadcast join") {
    val (_, vocab) = BpeOps.learnMerges(classicCorpus, col("text"), 3)
    val m = BpeOps.encodedTokenCounts(classicCorpus, "doc_id", col("text"), vocab)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // after 3 merges: low=[lo,w]=2, lower=[lo,w,e,r]=4, newest=4, widest=4
    assert(m(1L) === ((5L, 10L)))
    assert(m(2L) === ((2L, 8L)))
    assert(m(3L) === ((6L, 24L)))
    assert(m(4L) === ((3L, 12L)))
  }
}
