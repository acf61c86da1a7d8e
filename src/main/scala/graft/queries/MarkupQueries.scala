package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}
import graft.operators.MarkupOps

/** Web-markup extraction + crawl-cleaning queries over `documents`
  * (SURVEY.md §2.B Q-TXT28–30, Q-PIPE5). The fixture text is clean, so
  * each query first WRAPS it in deterministic markup / line / sentence
  * structure with the same generator chain the oracle replicates — the
  * q_txt13/q_txt26 synthetic-enrichment pattern.
  *
  * Every operator is a pure column expression (MarkupOps), so all four
  * plans are a single narrow map stage over the scan plus whatever the
  * final rollup needs — extraction at crawl scale must not shuffle.
  */
object MarkupQueries extends QueryModule {

  // ---- synthetic page (q_txt28 / oracle twin) ---------------------------
  // Script body contains a RAW `<` and braces: the block-strip-first
  // contract is what keeps them out of the visible text. Entities cover
  // the decode chain including the amp-last rule.
  private def pageHtml(id: org.apache.spark.sql.Column,
                       text: org.apache.spark.sql.Column) = concat(
    lit("<html><head><title>Doc "), id.cast("string"), lit("</title>"),
    lit("<style>p { color: red; }</style>"),
    lit("<script>var x = 1; if (x < 2) { x = 3; }</script></head><body>"),
    lit("<nav><a href=\"/\">home portal</a> <a href=\"/idx\">archive index</a></nav>"),
    lit("<p>"), substring(text, 1, 40), lit(" &amp; details</p>"),
    lit("<div class=\"main\">"), substring(text, 41, 200), lit("</div>"),
    lit("<footer>contact &lt;admin&gt;</footer></body></html>"))

  private val pageHtmlSql =
    """'<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) || '</title>' ||
      |'<style>p { color: red; }</style>' ||
      |'<script>var x = 1; if (x < 2) { x = 3; }</script></head><body>' ||
      |'<nav><a href="/">home portal</a> <a href="/idx">archive index</a></nav>' ||
      |'<p>' || substring(text, 1, 40) || ' &amp; details</p>' ||
      |'<div class="main">' || substring(text, 41, 200) || '</div>' ||
      |'<footer>contact &lt;admin&gt;</footer></body></html>'""".stripMargin

  /** DuckDB twin of MarkupOps.extractText over the SQL expression `h`. */
  private def extractSql(h: String): String =
    s"""trim(regexp_replace(
       |  replace(replace(replace(replace(replace(replace(
       |    regexp_replace(regexp_replace(regexp_replace(regexp_replace($h,
       |      '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
       |      '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
       |      '(?s)<!--.*?-->', ' ', 'g'),
       |      '<[^>]*>', ' ', 'g'),
       |    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
       |    '&#39;', chr(39)), '&nbsp;', ' '), '&amp;', '&'),
       |  '\\s+', ' ', 'g'))""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Q-TXT28: HTML text extraction + markup quality signals — the WET
    // pass. One narrow map stage; stats and extraction share subtrees.
    "q_txt28" -> ((s, d) => {
      val paged = Tables.load(s, d, "documents")
        .select(col("doc_id"), pageHtml(col("doc_id"), col("text")).as("__html"))
      val statCols = MarkupOps.markupStats(col("__html"))
        .map { case (n, c) => c.as(n) }
      paged.select(
          Seq(col("doc_id"), MarkupOps.extractText(col("__html")).as("clean_text"))
            ++ statCols: _*)
        .orderBy("doc_id")
    }),

    // Q-TXT29: C4-style line filter over newline-structured docs — code
    // spill, template junk, nav stubs and unterminated fragments drop;
    // pure HOF filter, the doc never leaves its row. The third line's
    // terminal punctuation depends on doc_id so the keep-count is
    // data-dependent, not constant.
    "q_txt29" -> ((s, d) => {
      val mtext = concat(
        substring(col("text"), 1, 45), lit("."), lit("\n"),
        lit("{ var x = 1; }"), lit("\n"),
        substring(col("text"), 46, 45),
        when(col("doc_id") % 3 =!= 0, lit("!")).otherwise(lit("")), lit("\n"),
        lit("lorem ipsum dolor sit amet"), lit("\n"),
        lit("ok."), lit("\n"),
        lit("Please enable JavaScript to continue."), lit("\n"),
        substring(col("text"), 91, 40))
      val cols = MarkupOps.lineFilter(col("__mt")).map { case (n, c) => c.as(n) }
      Tables.load(s, d, "documents")
        .select(col("doc_id"), mtext.as("__mt"))
        .select(col("doc_id") +: cols: _*)
        .orderBy("doc_id")
    }),

    // Q-TXT30: sentence segmentation stats over punctuated docs — the
    // length-shape profile (avg/max sentence size) a quality gate reads.
    "q_txt30" -> ((s, d) => {
      val stext = concat(
        substring(col("text"), 1, 30), lit(". "),
        substring(col("text"), 31, 40), lit("!! "),
        substring(col("text"), 71, 30), lit("? "),
        lit("and a trailing fragment"))
      val cols = MarkupOps.sentenceStats(col("__st")).map { case (n, c) => c.as(n) }
      Tables.load(s, d, "documents")
        .select(col("doc_id"), stext.as("__st"))
        .select(col("doc_id") +: cols: _*)
        .orderBy("doc_id")
    }),

    // Q-PIPE5: web-curation composition — markup noise must not defeat
    // dedup. Even docs render their own text through template A; odd docs
    // render their EVEN NEIGHBOR'S text through template B (different
    // style/script/attrs, same visible text). Extraction collapses each
    // pair to one canonical text; exact grouping on it finds them.
    "q_pipe5" -> ((s, d) => {
      val docs = Tables.load(s, d, "documents")
      val leaders = docs.where(col("doc_id") % 2 === 0)
        .select(col("doc_id").as("leader_id"), substring(col("text"), 1, 80).as("base"))
      val va = concat(lit("<html><body><p>"), col("base"), lit("</p></body></html>"))
      val vb = concat(
        lit("<html><head><style>body { margin: 0; }</style></head>"),
        lit("<body><script>track();</script><div class=\"x\">  "), col("base"),
        lit("  </div><footer></footer></body></html>"))
      docs.select(col("doc_id"), (col("doc_id") - col("doc_id") % 2).as("leader_id"))
        .join(leaders, Seq("leader_id"))
        .select(col("doc_id"),
          when(col("doc_id") % 2 === 0, va).otherwise(vb).as("__html"))
        .select(col("doc_id"), col("__html"),
          MarkupOps.extractText(col("__html")).as("canon"))
        .groupBy("canon")
        .agg(count(lit(1)).as("n_docs"), min("doc_id").as("min_doc"),
          max("doc_id").as("max_doc"),
          countDistinct(col("__html")).as("n_markups"))
        .orderBy("min_doc")
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "q_txt28" -> {
      s"""WITH page AS (SELECT doc_id, $pageHtmlSql AS html FROM documents),
         |ext AS (SELECT doc_id, html, ${extractSql("html")} AS clean_text,
         |  length(array_to_string(
         |    regexp_extract_all(html, '(?is)<a(?:\\s[^>]*)?>(.*?)</a>', 1), '')) AS anchors
         |  FROM page)
         |SELECT doc_id, clean_text,
         |  CAST(len(regexp_extract_all(html, '<[a-zA-Z/][^>]*>')) AS BIGINT) AS n_tags,
         |  CAST(len(regexp_extract_all(html, '(?i)<a[ >]')) AS BIGINT) AS n_links,
         |  CAST(anchors AS BIGINT) AS anchor_chars,
         |  CAST(length(clean_text) AS BIGINT) AS text_chars,
         |  CAST(length(html) AS BIGINT) AS html_chars,
         |  CAST(length(clean_text) AS DOUBLE) / CAST(length(html) AS DOUBLE)
         |    AS text_ratio,
         |  CAST(anchors AS DOUBLE) /
         |    CAST(nullif(length(clean_text), 0) AS DOUBLE) AS link_density
         |FROM ext ORDER BY doc_id""".stripMargin
    },
    "q_txt29" -> {
      val keep = """l -> len(list_filter(regexp_split_to_array(lower(trim(l)), '\s+'),
                   |        x -> length(x) > 0)) >= 3
                   |      AND regexp_matches(l, '[.!?]$')
                   |      AND NOT contains(l, '{') AND NOT contains(l, '}')
                   |      AND NOT contains(lower(l), 'lorem ipsum')
                   |      AND NOT contains(lower(l), 'javascript')""".stripMargin
      s"""WITH m AS (SELECT doc_id,
         |    substring(text, 1, 45) || '.' || chr(10) ||
         |    '{ var x = 1; }' || chr(10) ||
         |    substring(text, 46, 45) ||
         |    (CASE WHEN doc_id % 3 <> 0 THEN '!' ELSE '' END) || chr(10) ||
         |    'lorem ipsum dolor sit amet' || chr(10) ||
         |    'ok.' || chr(10) ||
         |    'Please enable JavaScript to continue.' || chr(10) ||
         |    substring(text, 91, 40) AS mt
         |  FROM documents),
         |sp AS (SELECT doc_id, string_split(mt, chr(10)) AS lines FROM m),
         |k AS (SELECT doc_id, lines, list_filter(lines, $keep) AS kept FROM sp)
         |SELECT doc_id,
         |  CAST(len(lines) AS BIGINT) AS n_lines,
         |  CAST(len(kept) AS BIGINT) AS n_kept,
         |  CAST(len(kept) AS DOUBLE) / CAST(len(lines) AS DOUBLE) AS kept_ratio,
         |  array_to_string(kept, chr(10)) AS clean_text
         |FROM k ORDER BY doc_id""".stripMargin
    },
    "q_txt30" -> {
      def wc(v: String) =
        s"len(list_filter(regexp_split_to_array(lower(trim($v)), '\\s+'), x -> length(x) > 0))"
      s"""WITH m AS (SELECT doc_id,
         |    substring(text, 1, 30) || '. ' ||
         |    substring(text, 31, 40) || '!! ' ||
         |    substring(text, 71, 30) || '? ' ||
         |    'and a trailing fragment' AS st
         |  FROM documents),
         |se AS (SELECT doc_id,
         |    list_filter(regexp_extract_all(st, '[^.!?]+(?:[.!?]+|$$)', 0),
         |      s -> ${wc("s")} > 0) AS sents
         |  FROM m),
         |ag AS (SELECT doc_id, sents,
         |    list_sum(list_transform(sents, s -> ${wc("s")})) AS total_words,
         |    list_max(list_transform(sents, s -> length(trim(s)))) AS max_chars
         |  FROM se)
         |SELECT doc_id,
         |  CAST(len(sents) AS BIGINT) AS n_sentences,
         |  CAST(total_words AS BIGINT) AS total_words,
         |  CAST(round(CAST(total_words AS DOUBLE) * 1000000.0 /
         |       CAST(len(sents) AS DOUBLE), 0) AS BIGINT) AS avg_words_micro,
         |  CAST(max_chars AS BIGINT) AS max_sent_chars
         |FROM ag ORDER BY doc_id""".stripMargin
    },
    "q_pipe5" -> {
      s"""WITH leaders AS (SELECT doc_id AS leader_id,
         |    substring(text, 1, 80) AS base
         |  FROM documents WHERE doc_id % 2 = 0),
         |pages AS (SELECT d.doc_id,
         |    CASE WHEN d.doc_id % 2 = 0
         |      THEN '<html><body><p>' || l.base || '</p></body></html>'
         |      ELSE '<html><head><style>body { margin: 0; }</style></head>' ||
         |           '<body><script>track();</script><div class="x">  ' || l.base ||
         |           '  </div><footer></footer></body></html>'
         |    END AS html
         |  FROM documents d
         |  JOIN leaders l ON l.leader_id = d.doc_id - d.doc_id % 2),
         |c AS (SELECT doc_id, html, ${extractSql("html")} AS canon FROM pages)
         |SELECT canon, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc,
         |  CAST(COUNT(DISTINCT html) AS BIGINT) AS n_markups
         |FROM c GROUP BY canon ORDER BY min_doc""".stripMargin
    },
  )
}
