package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Web-markup text extraction — the WET-style pass a crawl corpus runs
  * before any text operator sees a byte: strip script/style, strip tags,
  * decode entities, collapse whitespace. Plus the per-page markup quality
  * signals (tag counts, link density, text-to-markup ratio) and the
  * C4-style per-line filter that drops navigation stubs, code spill and
  * template junk.
  *
  * The reference repo ingests clean vendor CSVs and never sees markup;
  * this is part of the declared LLM-pipeline extension surface
  * (SURVEY.md §2.B) — at 100 TB of crawl, extraction IS the first job.
  *
  * Spark-first shape: every operator here is a pure COLUMN expression —
  * codegen'd regexp/replace/HOF built-ins, no UDF, no shuffle, no state.
  * Extraction of a 100 TB crawl is one narrow map stage that fuses into
  * whatever scan/filter/dedup plan consumes it. The per-line filter uses
  * the `filter()` higher-order function on the split array rather than
  * explode + re-group: the document never leaves its row, so there is
  * NOTHING to shuffle back together.
  *
  * Oracle-exactness: the regex dialect is kept inside the Java-regex /
  * RE2 (DuckDB) common subset — no lookaround, no backreferences — and
  * entity decoding is a fixed replace chain with `&amp;` LAST (the
  * standard single-pass contract: double-encoded entities decode one
  * level), so the DuckDB twin is byte-identical.
  */
object MarkupOps {

  /** Visible text of an HTML payload.
    *
    * Order matters and is part of the contract:
    *  1. script/style blocks go first as WHOLE blocks (`(?s)` + non-greedy)
    *     — their bodies may contain raw `<` (`if (x < 2)`) that would
    *     derail a naive tag strip;
    *  2. then every remaining tag `<[^>]*>` becomes a space (block
    *     boundaries must separate words, not glue them);
    *  3. then the core entities decode, `&amp;` last;
    *  4. then whitespace collapses and trims.
    */
  def extractText(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    // Known limit (shared with real WET extractors): a raw '>' inside a
    // QUOTED attribute value truncates the tag match early — full
    // tolerance needs a parser, not a regex; crawl HTML rarely hits it
    // and the oracle twin shares the exact behavior.
    val noTags = regexp_replace(noComment, "<[^>]*>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) => regexp_replace(c, e, r) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Markup quality signals for one page, from the SAME two derivations
    * the extractor makes (the optimizer shares the subtrees):
    * (n_tags, n_links, anchor_chars, text_chars, html_chars,
    * text_ratio, link_density).
    *
    * `n_tags` counts real tag openers (`<` followed by a letter or `/`) so
    * a raw `< 2` inside a script body is not a tag; anchor text is the
    * concatenation of `<a ...>...</a>` bodies BEFORE tag stripping (link
    * density = how much of the visible text is clickable — the classic
    * boilerplate-page discriminator). Ratios are raw IEEE quotients of
    * exact integer lengths — bit-identical on both engines. */
  def markupStats(html: Column): Seq[(String, Column)] = {
    // `<a(?:\s...)?>` — NOT `<a[^>]*>`, which would also open at
    // `<article>`/`<aside>`/`<audio>` and swallow their bodies as
    // "anchor text"; (?i) matches old uppercase crawl HTML
    val anchors = length(array_join(
      regexp_extract_all(html, lit("(?is)<a(?:\\s[^>]*)?>(.*?)</a>"), lit(1)), ""))
    val textChars = length(extractText(html))
    val htmlChars = length(html)
    Seq(
      "n_tags" -> regexp_count(html, lit("<[a-zA-Z/][^>]*>")).cast("long"),
      "n_links" -> regexp_count(html, lit("(?i)<a[ >]")).cast("long"),
      "anchor_chars" -> anchors.cast("long"),
      "text_chars" -> textChars.cast("long"),
      "html_chars" -> htmlChars.cast("long"),
      "text_ratio" -> (textChars.cast("double") / htmlChars.cast("double")),
      "link_density" -> (anchors.cast("double") /
        when(textChars === 0, lit(null)).otherwise(textChars).cast("double")))
  }

  /** C4-style line keep predicate: >= `minWords` words, ends in terminal
    * punctuation, no curly braces (code spill), and none of the template
    * phrases ("lorem ipsum", "javascript" — the enable-JS stub). */
  private def keepLine(l: Column, minWords: Int): Column =
    (size(TextOps.tokens(l)) >= minWords) &&
      l.rlike("[.!?]$") &&
      !l.contains("{") && !l.contains("}") &&
      !lower(l).contains("lorem ipsum") &&
      !lower(l).contains("javascript")

  /** Per-document line filter over newline-structured text: kept lines
    * rejoined in order plus the keep accounting. Pure HOF `filter` on the
    * split array — the doc never leaves its row. Output columns:
    * (n_lines, n_kept, kept_ratio, clean_text). */
  def lineFilter(text: Column, minWords: Int = 3): Seq[(String, Column)] = {
    val lines = split(text, "\n")
    val kept = filter(lines, l => keepLine(l, minWords))
    Seq(
      "n_lines" -> size(lines).cast("long"),
      "n_kept" -> size(kept).cast("long"),
      "kept_ratio" -> (size(kept).cast("double") / size(lines).cast("double")),
      "clean_text" -> array_join(kept, "\n"))
  }

  /** Sentence segmentation by terminal-punctuation runs: each sentence is
    * a maximal run of non-terminal chars plus its closing `[.!?]+` (a
    * trailing unterminated fragment counts as a sentence — real crawl text
    * is often cut mid-sentence). Per-doc stats only; the sentence list
    * itself stays inside the row. Output: (n_sentences, total_words,
    * avg_words_micro, max_sent_chars).
    *
    * `avg_words_micro` is rounded ONCE to integer micro-units (the q_txt19
    * transcendental policy — here it is just a quotient, but the single
    * round keeps the column exactly comparable cross-engine). */
  def sentenceStats(text: Column): Seq[(String, Column)] = {
    // group idx 0 = whole match (Spark's default of 1 would demand a
    // capturing group; the pattern deliberately has none)
    val sents = regexp_extract_all(text, lit("[^.!?]+(?:[.!?]+|$)"), lit(0))
    // The `|$` alternative admits one EMPTY trailing match when the text
    // ends in punctuation; drop zero-word fragments so "a. b." is 2
    // sentences, not 3.
    val clean = filter(sents, s => size(TextOps.tokens(s)) > 0)
    val words = aggregate(clean, lit(0L),
      (acc, s) => acc + size(TextOps.tokens(s)).cast("long"))
    // Zero word-bearing sentences (punctuation-only text) yields NULL
    // stats, matching the SQL twin's list_sum/list_max over an empty
    // list — a fold would emit 0 and NaN-cast garbage instead.
    val none = size(clean) === 0
    Seq(
      "n_sentences" -> size(clean).cast("long"),
      "total_words" -> when(none, lit(null)).otherwise(words).cast("long"),
      "avg_words_micro" -> round(words.cast("double") * lit(1e6) /
        nullif(size(clean), lit(0)).cast("double"), 0).cast("long"),
      "max_sent_chars" -> when(none, lit(null)).otherwise(
        aggregate(clean, lit(0L),
          (acc, s) => greatest(acc, length(trim(s)).cast("long")))).cast("long"))
  }
}
