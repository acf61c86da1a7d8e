package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.SparkSpec

class UnicodeNormSpec extends SparkSpec {
  import spark.implicits._

  // decomposed e + U+0301, precomposed é, decomposed q + U+0301 (no
  // precomposed form exists), astral-plane G-clef, ASCII
  private val decomposedE = "cafe\u0301"
  private val precomposedE = "caf\u00e9"
  private val decomposedQ = "q\u0301"
  private val clef = new String(Character.toChars(0x1D11E))

  test("NFC composes decomposed sequences; identity on already-NFC text") {
    val got = Seq(decomposedE, precomposedE, decomposedQ, clef, "plain")
      .toDF("s").select(NfcNormalize(col("s"))).as[String].collect().toSeq
    assert(got === Seq(precomposedE, precomposedE, decomposedQ, clef, "plain"))
  }

  test("strip_accents drops combining marks from either composition form") {
    val got = Seq(precomposedE, decomposedE, "\u00fc\u00f1\u00c9", "\u00f8", clef)
      .toDF("s").select(StripAccents(col("s"))).as[String].collect().toSeq
    // ø is NOT a combining-mark letter and must survive (DuckDB parity)
    assert(got === Seq("cafe", "cafe", "unE", "\u00f8", clef))
  }

  test("interpreted eval matches the codegen path") {
    // eval() directly (interpreted) vs the DataFrame pipeline (codegen)
    val inputs = Seq(decomposedE, precomposedE, decomposedQ, clef, "x", "")
    for (s <- inputs) {
      val lit8 = org.apache.spark.sql.catalyst.expressions.Literal(
        UTF8String.fromString(s))
      assert(NfcNormalize(lit8).eval(null) ===
        UTF8String.fromString(java.text.Normalizer.normalize(s,
          java.text.Normalizer.Form.NFC)))
      assert(StripAccents(lit8).eval(null) ===
        UTF8String.fromString(java.text.Normalizer.normalize(s,
          java.text.Normalizer.Form.NFD)
          .filter(c => Character.getType(c) != Character.NON_SPACING_MARK)))
    }
    val df = inputs.toDF("s")
      .select(NfcNormalize(col("s")).as("n"), StripAccents(col("s")).as("a"))
    val gen = df.as[(String, String)].collect().toSeq
    val exp = inputs.map { s =>
      (java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC),
        java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
          .filter(c => Character.getType(c) != Character.NON_SPACING_MARK))
    }
    assert(gen === exp)
  }

  test("pure-ASCII fast path returns the input with no allocation") {
    val s = UTF8String.fromString("only ascii here 123")
    assert(UnicodeNormOps.nfc(s) eq s)
    assert(UnicodeNormOps.stripAccents(s) eq s)
    assert(UnicodeNormOps.isAscii(s))
    assert(!UnicodeNormOps.isAscii(UTF8String.fromString(precomposedE)))
  }

  test("null propagates; non-string input is rejected at analysis") {
    val df = Seq(Some("a"), None).toDF("s")
    val got = df.select(NfcNormalize(col("s"))).collect().map(_.isNullAt(0)).toSeq
    assert(got === Seq(false, true))
    val err = intercept[Exception] {
      Seq(1).toDF("i").select(NfcNormalize(col("i"))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("string"))
  }

  test("both expressions stay inside whole-stage codegen") {
    val docs = graft.Tables.load(spark, sf, "documents")
    val p = docs
      .select(NfcNormalize(col("text")), StripAccents(col("text")))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix is the WholeStageCodegen marker in the simple plan
    // string — the Project evaluating both expressions must carry it
    assert("""\*\(\d+\) Project \[nfc_normalize""".r.findFirstIn(p).isDefined,
      p.take(800))
  }
}
