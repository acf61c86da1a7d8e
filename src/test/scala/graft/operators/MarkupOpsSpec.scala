package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MarkupOpsSpec extends SparkSpec {
  import spark.implicits._

  private def extract(html: String): String =
    Seq(html).toDF("h").select(MarkupOps.extractText(col("h")).as("t"))
      .as[String].head()

  test("extractText strips tags, decodes entities, collapses whitespace") {
    val got = extract(
      "<html><body><p>alpha &amp; beta</p>\n<div>  gamma&nbsp;&lt;x&gt;</div></body></html>")
    assert(got === "alpha & beta gamma <x>")
  }

  test("script/style bodies vanish whole — even with raw '<' inside") {
    val got = extract(
      "<head><style>p { color: red; }</style>" +
        "<script>var x = 1; if (x < 2) { x = 3; }</script></head><body>kept words</body>")
    assert(got === "kept words")
  }

  test("amp decodes LAST: double-encoded entities decode exactly one level") {
    assert(extract("<p>&amp;lt;</p>") === "&lt;")
  }

  test("uppercase SCRIPT/STYLE blocks vanish whole (old crawl HTML)") {
    assert(extract("<SCRIPT>if (x < 2) { x = 3; }</SCRIPT><P>kept</P>") === "kept")
    assert(extract("<Style>p { }</Style>ok") === "ok")
  }

  test("HTML comments are stripped, including ones containing '>'") {
    assert(extract("<!-- breadcrumb > home -->visible<!-- x -->") === "visible")
  }

  test("anchor stats: <article>/<aside> are NOT anchors; uppercase <A> is") {
    val html = "<article><p>long body text</p></article><a href=\"/\">hi</a>" +
      "<A HREF=\"/x\">Yo</A><aside>side</aside>"
    val row = Seq(html).toDF("h")
      .select(MarkupOps.markupStats(col("h")).map { case (n, c) => c.as(n) }: _*)
      .collect().head
    assert(row.getAs[Long]("n_links") === 2L)
    assert(row.getAs[Long]("anchor_chars") === ("hi".length + "Yo".length).toLong)
  }

  test("tags become word boundaries, not glue") {
    assert(extract("<p>one</p><p>two</p>") === "one two")
  }

  test("markupStats: counts, link density, text ratio") {
    val html = "<html><body><a href=\"/\">click me</a> plus twenty more chars" +
      "<script>if (x < 2) { }</script></body></html>"
    val row = Seq(html).toDF("h")
      .select(MarkupOps.markupStats(col("h")).map { case (n, c) => c.as(n) }: _*)
      .collect().head
    assert(row.getAs[Long]("n_links") === 1L)
    // <html> <body> <a> </a> <script> </script> </body> </html> — the raw
    // '< 2' inside the script body is NOT a tag
    assert(row.getAs[Long]("n_tags") === 8L)
    assert(row.getAs[Long]("anchor_chars") === "click me".length.toLong)
    val text = extract(html)
    assert(row.getAs[Long]("text_chars") === text.length.toLong)
    assert(row.getAs[Double]("link_density") ===
      "click me".length.toDouble / text.length.toDouble)
    assert(row.getAs[Double]("text_ratio") ===
      text.length.toDouble / html.length.toDouble)
  }

  test("markupStats: zero visible text gives null link density, not NaN") {
    val row = Seq("<style>p { }</style>").toDF("h")
      .select(MarkupOps.markupStats(col("h")).map { case (n, c) => c.as(n) }: _*)
      .collect().head
    assert(row.getAs[Long]("text_chars") === 0L)
    assert(row.isNullAt(row.fieldIndex("link_density")))
  }

  test("lineFilter keeps substantial punctuated lines, drops junk, preserves order") {
    val doc = Seq(
      "This line has enough words.",      // kept
      "{ var x = 1; }",                   // code spill
      "Please enable JavaScript to continue.", // template stub
      "lorem ipsum dolor sit amet.",      // filler
      "ok.",                              // too few words
      "no terminal punctuation here",     // unterminated
      "Another good line stays in!"       // kept
    ).mkString("\n")
    val row = Seq(doc).toDF("t")
      .select(MarkupOps.lineFilter(col("t")).map { case (n, c) => c.as(n) }: _*)
      .collect().head
    assert(row.getAs[Long]("n_lines") === 7L)
    assert(row.getAs[Long]("n_kept") === 2L)
    assert(row.getAs[Double]("kept_ratio") === 2.0 / 7.0)
    assert(row.getAs[String]("clean_text") ===
      "This line has enough words.\nAnother good line stays in!")
  }

  test("lineFilter minWords is configurable") {
    val row = Seq("one two.\nsolo.").toDF("t")
      .select(MarkupOps.lineFilter(col("t"), minWords = 2).map { case (n, c) => c.as(n) }: _*)
      .collect().head
    assert(row.getAs[Long]("n_kept") === 1L)
    assert(row.getAs[String]("clean_text") === "one two.")
  }

  test("sentenceStats: runs of terminals close a sentence; fragments count") {
    val row = Seq("One two. Three four five!! Six? trailing frag").toDF("t")
      .select(MarkupOps.sentenceStats(col("t")).map { case (n, c) => c.as(n) }: _*)
      .collect().head
    assert(row.getAs[Long]("n_sentences") === 4L)
    assert(row.getAs[Long]("total_words") === 2L + 3L + 1L + 2L)
    assert(row.getAs[Long]("avg_words_micro") === math.round(8.0 * 1e6 / 4.0))
    assert(row.getAs[Long]("max_sent_chars") === "Three four five!!".length.toLong)
  }

  test("sentenceStats: punctuation-only text yields null stats, not 0/NaN-cast") {
    val row = Seq("!!!").toDF("t")
      .select(MarkupOps.sentenceStats(col("t")).map { case (n, c) => c.as(n) }: _*)
      .collect().head
    assert(row.getAs[Long]("n_sentences") === 0L)
    assert(row.isNullAt(row.fieldIndex("total_words")))
    assert(row.isNullAt(row.fieldIndex("avg_words_micro")))
    assert(row.isNullAt(row.fieldIndex("max_sent_chars")))
  }

  test("sentenceStats: trailing-punct text emits no empty sentence") {
    val row = Seq("a b. c d.").toDF("t")
      .select(MarkupOps.sentenceStats(col("t")).map { case (n, c) => c.as(n) }: _*)
      .collect().head
    assert(row.getAs[Long]("n_sentences") === 2L)
    assert(row.getAs[Long]("total_words") === 4L)
  }

  test("the full extraction plan is one narrow map stage (no shuffle)") {
    val df = Seq((1L, "<p>x</p>")).toDF("doc_id", "h")
      .select(col("doc_id"), MarkupOps.extractText(col("h")).as("t"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"extraction must not shuffle:\n$plan")
  }
}
