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

  test("rolling fingerprint: deterministic, order-sensitive, stable range") {
    val fp = TextOps.rollingFingerprint(TextOps.tokens(col("text")))
    val a = one(fp, "alpha beta gamma").asInstanceOf[Long]
    val a2 = one(fp, "alpha beta gamma").asInstanceOf[Long]
    val b = one(fp, "gamma beta alpha").asInstanceOf[Long]
    assert(a === a2, "re-run must be identical")
    assert(a !== b, "token order must matter")
    assert(a >= 0 && a < 2147483647L)
  }
}
