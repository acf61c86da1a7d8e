package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  // a 30-token span planted inside otherwise-unrelated 20-token contexts
  private val span = (1 to 30).map(i => s"shared$i").mkString(" ")
  private val docs = Seq(
    (0L, (1 to 20).map(i => s"alpha$i").mkString(" ") + " " + span + " " +
      (1 to 20).map(i => s"omega$i").mkString(" ")),
    (1L, (1 to 5).map(i => s"beta$i").mkString(" ") + " " + span + " " +
      (1 to 35).map(i => s"gamma$i").mkString(" ")),
    (2L, (1 to 60).map(i => s"delta$i").mkString(" ")),
    (3L, (1 to 60).map(i => s"delta$i").mkString(" "))
  ).toDF("doc_id", "text")

  test("planted 30-token span found with exact bounds; exact dup spans whole doc") {
    val out = SpanDedup.duplicatedSpans(docs, "doc_id", col("text"),
        shingleN = 8, minSpanTokens = 16)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // doc0's span starts at token 21, doc1's at token 6, length 30
    assert(out.contains((0L, 1L, 21L, 6L, 30L)), s"got $out")
    // docs 2/3 are verbatim dups: one full-length span
    assert(out.contains((2L, 3L, 1L, 1L, 60L)), s"got $out")
    // nothing else qualifies (contexts are all-distinct tokens)
    assert(out.size === 2, s"got $out")
  }

  test("spans shorter than minSpanTokens are suppressed") {
    val out = SpanDedup.duplicatedSpans(docs, "doc_id", col("text"),
      shingleN = 8, minSpanTokens = 31)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(out === Set((2L, 3L, 1L, 1L, 60L)))
  }

  test("a repeated boilerplate shingle above the df cap is dropped (runs split, join bounded)") {
    val boiler = "subscribe to our newsletter now for more great offers daily"
    val flood = (0 until 50).map(i =>
      (100L + i, s"unique${i}a unique${i}b " + boiler + s" unique${i}c unique${i}d"))
      .toDF("doc_id", "text")
    // every pair of the 50 docs shares only the 10-token boilerplate run;
    // with the cap below 50 the shared shingles are dropped -> no pairs
    val capped = SpanDedup.duplicatedSpans(flood, "doc_id", col("text"),
      shingleN = 8, minSpanTokens = 8, maxShingleDf = 10)
    assert(capped.count() === 0)
    val uncapped = SpanDedup.duplicatedSpans(flood, "doc_id", col("text"),
      shingleN = 8, minSpanTokens = 8, maxShingleDf = 10000)
    assert(uncapped.count() === 50L * 49 / 2)
  }
}
