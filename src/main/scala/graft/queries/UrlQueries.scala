package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}
import graft.operators.{Curation, Dedup, TextOps, UrlOps}

/** URL/domain normalization queries (SURVEY.md §2.B Q-CURL1/2): the
  * web-crawl front door — canonicalize messy URL spellings, dedup exact
  * re-crawls by canonical form, and feed the extracted domain into the
  * per-domain cap. The fixtures carry no URL column, so both engines
  * derive the SAME deterministic messy URL per document (mixed-case
  * scheme/host, explicit :443, per-doc tracking params, fragments) — the
  * canonicalization work under test is identical to a real crawl column's.
  */
object UrlQueries extends QueryModule {

  // Deterministic messy URL per document. Collisions by design: the
  // canonical form depends only on (source, doc_id % 50), so several docs
  // normalize to the same URL and the dedup has real work at every SF.
  private def rawUrl = concat(
    when(pmod(col("doc_id"), lit(3)) === 0, lit("HTTPS://"))
      .when(pmod(col("doc_id"), lit(3)) === 1, lit("https://"))
      .otherwise(lit("Https://")),
    when(pmod(col("doc_id"), lit(2)) === 0, lit("WWW.")).otherwise(lit("www.")),
    col("source"), lit(".Example.COM"),
    when(pmod(col("doc_id"), lit(4)) === 0, lit(":443")).otherwise(lit("")),
    lit("/docs/page-"), pmod(col("doc_id"), lit(50)).cast("string"),
    lit("?utm_source=feed&p="), pmod(col("doc_id"), lit(50)).cast("string"),
    lit("&utm_campaign=c"), col("doc_id").cast("string"),
    lit("&q=spark"),
    when(pmod(col("doc_id"), lit(6)) === 0,
      concat(lit("&gclid=g"), col("doc_id").cast("string"))).otherwise(lit("")),
    when(pmod(col("doc_id"), lit(5)) === 0,
      concat(lit("#Section-"), col("doc_id").cast("string"))).otherwise(lit("")))

  private val rawUrlSql =
    """CASE doc_id % 3 WHEN 0 THEN 'HTTPS://' WHEN 1 THEN 'https://' ELSE 'Https://' END ||
      |    CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE 'www.' END || source || '.Example.COM' ||
      |    CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END ||
      |    '/docs/page-' || (doc_id % 50) ||
      |    '?utm_source=feed&p=' || (doc_id % 50) || '&utm_campaign=c' || doc_id || '&q=spark' ||
      |    CASE WHEN doc_id % 6 = 0 THEN '&gclid=g' || doc_id ELSE '' END ||
      |    CASE WHEN doc_id % 5 = 0 THEN '#Section-' || doc_id ELSE '' END""".stripMargin

  private def canonical(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "documents")
      .select(col("doc_id"), col("n_chars"),
        UrlOps.canonicalizeUrl(rawUrl).as("url"))
      .withColumn("domain", UrlOps.domainOf(col("url")))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q-CURL1: canonicalize + dedup by canonical URL (min doc_id survives).
    // One hash shuffle on the canonical string; everything upstream is
    // scan-speed expressions.
    "q_curl1" -> ((s, d) =>
      graft.operators.Dedup.exactByKeys(canonical(s, d), Seq("url"), Seq("doc_id"))
        .select("doc_id", "url", "domain")
        .orderBy("doc_id")),

    // Q-CURL2: the curation chain — URL dedup, then at most 3 docs per
    // extracted domain (best by n_chars; WindowGroupLimit pre-prunes
    // map-side, so a hot domain never ships its whole row set).
    "q_curl2" -> ((s, d) =>
      Curation.capPerDomain(
          graft.operators.Dedup.exactByKeys(canonical(s, d), Seq("url"), Seq("doc_id")),
          col("domain"), 3, col("n_chars").desc, col("doc_id").asc)
        .select("doc_id", "domain", "n_chars")
        .orderBy("doc_id")),

    // Q-CURL3 (round 11): politeness-scheduled crawl frontier — after URL
    // dedup, each host's URLs get a priority rank (longest doc first, id
    // tiebreak) and a WAVE number at 2 fetches per host per politeness
    // window: the stateless schedule any number of fetch workers can
    // slice independently. One window over the host shuffle.
    "q_curl3" -> ((s, d) =>
      UrlOps.frontierSchedule(
          graft.operators.Dedup.exactByKeys(canonical(s, d), Seq("url"), Seq("doc_id")),
          col("domain"), perWave = 2,
          priority = Seq(col("n_chars").desc, col("doc_id").asc))
        .select("doc_id", "domain", "n_chars", "host_rank", "wave")
        .orderBy("doc_id")),

    // Q-PIPE1: the FULL curation pipeline as ONE declarative plan — what
    // a user of this engine actually ships: URL canonicalize + dedup ->
    // quality gate -> exact content dedup -> per-domain cap -> global
    // token-budget cut. Five stages, each individually oracle-checked
    // elsewhere (q_curl1/2, q_txt15, q_dedup1, q_sample3/4), here chained
    // and verified END TO END against one DuckDB query. Catalyst fuses
    // the scan + URL expressions + quality filters into one stage; the
    // shuffles are exactly the three the semantics require (url dedup,
    // content dedup, domain cap) plus the budget's range partition.
    "q_pipe1" -> ((s, d) => {
      val canon = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("text"), col("n_chars"),
          UrlOps.canonicalizeUrl(rawUrl).as("url"))
        .withColumn("domain", UrlOps.domainOf(col("url")))
      val urlDeduped = Dedup.exactByKeys(canon, Seq("url"), Seq("doc_id"))
      val quality = urlDeduped.where(
        TextOps.wordCount(col("text")) >= 30 &&
        TextOps.meanWordLen(col("text")).between(3.0, 10.0) &&
        TextOps.digitRatio(col("text")) <= 0.2)
      val contentDeduped = Dedup.exactByExpr(quality,
        Dedup.contentHash(col("text")), "__h", Seq("doc_id")).drop("__h")
      val capped = Curation.capPerDomain(contentDeduped,
        col("domain"), 3, col("n_chars").desc, col("doc_id").asc)
        .select(col("doc_id"), col("domain"), col("n_chars"),
          TextOps.wordCount(col("text")).as("n_tok"))
      Curation.selectUnderBudget(capped, "n_tok", budget = 5000L,
          col("n_chars").desc, col("doc_id").asc)
        .select("doc_id", "domain", "n_tok", "running_total")
        .orderBy("doc_id")
    }))

  def oracleSql: Map[String, String] = {
    val base =
      s"""WITH raw AS (SELECT doc_id, n_chars, $rawUrlSql AS url FROM documents),
         |${UrlOps.canonicalizeSqlCtes("raw", Seq("doc_id", "n_chars"))},
         |deduped AS (
         |  SELECT doc_id, url, domain, n_chars FROM (
         |    SELECT doc_id, url, domain, n_chars,
         |      row_number() OVER (PARTITION BY url ORDER BY doc_id) AS rn
         |    FROM canon)
         |  WHERE rn = 1)""".stripMargin
    Map(
      "q_curl1" ->
        s"""$base
           |SELECT doc_id, url, domain FROM deduped ORDER BY doc_id""".stripMargin,
      "q_curl2" ->
        s"""$base
           |SELECT doc_id, domain, n_chars FROM (
           |  SELECT doc_id, domain, n_chars,
           |    row_number() OVER (PARTITION BY domain
           |      ORDER BY n_chars DESC, doc_id) AS rn
           |  FROM deduped)
           |WHERE rn <= 3 ORDER BY doc_id""".stripMargin,
      "q_curl3" ->
        s"""$base
           |SELECT doc_id, domain, n_chars,
           |  CAST(host_rank AS BIGINT) AS host_rank,
           |  CAST((host_rank - 1) // 2 + 1 AS BIGINT) AS wave
           |FROM (
           |  SELECT doc_id, domain, n_chars,
           |    row_number() OVER (PARTITION BY domain
           |      ORDER BY n_chars DESC, doc_id) AS host_rank
           |  FROM deduped)
           |ORDER BY doc_id""".stripMargin,
      "q_pipe1" -> {
        val tokSql = TextDedupQueries.tokSql
        s"""WITH raw AS (SELECT doc_id, text, n_chars, $rawUrlSql AS url FROM documents),
           |${UrlOps.canonicalizeSqlCtes("raw", Seq("doc_id", "text", "n_chars"))},
           |urldedup AS (SELECT doc_id, text, n_chars, domain FROM (
           |    SELECT doc_id, text, n_chars, domain,
           |      row_number() OVER (PARTITION BY url ORDER BY doc_id) AS rn
           |    FROM canon) WHERE rn = 1),
           |quality AS (SELECT * FROM (
           |    SELECT doc_id, text, n_chars, domain,
           |      CAST(len($tokSql) AS BIGINT) AS n_words FROM urldedup)
           |  WHERE n_words >= 30
           |    AND (CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE) /
           |           nullif(CAST(n_words AS DOUBLE), 0.0)) BETWEEN 3.0 AND 10.0
           |    AND (CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) /
           |           nullif(CAST(length(text) AS DOUBLE), 0.0)) <= 0.2),
           |contentdedup AS (SELECT doc_id, domain, n_chars, n_words FROM (
           |    SELECT *, row_number() OVER (
           |      PARTITION BY sha256(lower(trim(text))) ORDER BY doc_id) AS crn
           |    FROM quality) WHERE crn = 1),
           |capped AS (SELECT doc_id, domain, n_chars, n_words FROM (
           |    SELECT *, row_number() OVER (
           |      PARTITION BY domain ORDER BY n_chars DESC, doc_id) AS drn
           |    FROM contentdedup) WHERE drn <= 3),
           |sel AS (SELECT doc_id, domain, n_words AS n_tok,
           |    CAST(SUM(n_words) OVER (ORDER BY n_chars DESC, doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_total
           |  FROM capped)
           |SELECT doc_id, domain, n_tok, running_total FROM sel
           |WHERE running_total <= 5000 ORDER BY doc_id""".stripMargin
      })
  }
}
