package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text canonicalization for crawl-scale corpora (SURVEY.md §2.B
  * Q-TXT26/27). Web text arrives in mixed composition forms — the same
  * visible string as precomposed é (U+00E9) or e + U+0301 — and exact-hash
  * dedup, tokenization and sort keys all silently fracture on the
  * difference, so NFC normalization is the first pass of any text
  * pipeline. Accent stripping (NFD, drop combining marks) is the
  * aggressive cousin used for fuzzy matching / canonical grouping.
  *
  * Spark has no built-in for either (as of 4.x); these are native Catalyst
  * expressions (SURVEY.md §4.3 path b — an Expression, not a UDF) so they
  * stay inside whole-stage codegen with no serialization boundary.
  *
  * Scale design: both carry a pure-ASCII FAST PATH — a byte scan with no
  * allocation — because a crawl corpus is overwhelmingly ASCII and
  * java.text.Normalizer costs ~µs/string plus two copies. The scan is one
  * branch per 8 bytes' worth of work; non-ASCII rows fall through to the
  * JDK normalizer (UAX#15, the same algorithm DuckDB's utf8proc
  * implements, so oracle twins agree byte-for-byte).
  */
object UnicodeNormOps {

  /** True iff every byte is < 0x80 — NFC/NFD/strip-accents are all
    * identity on pure ASCII. */
  def isAscii(s: UTF8String): Boolean = {
    val n = s.numBytes
    val base = s.getBaseObject
    val off = s.getBaseOffset
    var i = 0
    while (i < n) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) < 0) return false
      i += 1
    }
    true
  }

  /** UAX#15 canonical composition (NFC). */
  def nfc(s: UTF8String): UTF8String =
    if (isAscii(s)) s
    else UTF8String.fromString(Normalizer.normalize(s.toString, Normalizer.Form.NFC))

  /** NFD then drop all combining marks (Unicode category Mn) — DuckDB
    * strip_accents semantics (utf8proc STRIPMARK): é→e, ü→u, ñ→n, but
    * ø stays ø (not a mark) and ﬁ stays ﬁ (no canonical decomposition). */
  def stripAccents(s: UTF8String): UTF8String = {
    if (isAscii(s)) return s
    val d = Normalizer.normalize(s.toString, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(d.length)
    var i = 0
    while (i < d.length) {
      val cp = d.codePointAt(i)
      if (Character.getType(cp) != Character.NON_SPACING_MARK) sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }
}

/** Base for the two string->string normalizers: interpreted eval and
  * codegen both route to the same static helper, so the paths cannot
  * drift. */
abstract class UnicodeNormExpression extends UnaryExpression {

  /** Static helper method name on [[UnicodeNormOps]]. */
  protected def helper: String

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.UnicodeNormOps.$helper($c);")
}

/** nfc_normalize(string) — Unicode NFC canonical composition. */
case class NfcNormalize(child: Expression) extends UnicodeNormExpression {
  override protected def helper: String = "nfc"
  override def prettyName: String = "nfc_normalize"
  override def nullSafeEval(input: Any): Any =
    UnicodeNormOps.nfc(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** strip_accents(string) — NFD + drop combining marks (category Mn). */
case class StripAccents(child: Expression) extends UnicodeNormExpression {
  override protected def helper: String = "stripAccents"
  override def prettyName: String = "strip_accents"
  override def nullSafeEval(input: Any): Any =
    UnicodeNormOps.stripAccents(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}
  def apply(c: Column): Column = columnOf(NfcNormalize(expressionOf(c)))
}

object StripAccents {
  import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}
  def apply(c: Column): Column = columnOf(StripAccents(expressionOf(c)))
}
