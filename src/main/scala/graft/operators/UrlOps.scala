package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL/domain normalization — the standard FIRST pass of web-crawl
  * curation (before any text dedup): the same page arrives under dozens of
  * spellings (scheme/host case, explicit default ports, fragments,
  * tracking parameters), and canonicalizing + dedup-by-URL removes the
  * bulk of exact re-crawls at scan speed, before a single token is hashed.
  *
  * Everything here is pure codegen'd expressions (regexp over short
  * strings + one tiny HOF over the split query) — no UDF, no shuffle until
  * the dedup itself (one hash shuffle on the canonical URL). Each step has
  * an exact DuckDB twin (`canonicalizeUrlSql`) so the whole pass is
  * oracle-checkable; the canonical form is deterministic, which also makes
  * it a stable partitioning/bucketing key for downstream per-domain work
  * (`Curation.capPerDomain`).
  *
  * Canonical form: lowercase scheme and host, default port stripped
  * (http:80 / https:443), empty path normalized to "/", tracking
  * parameters removed (remaining parameters keep their original order —
  * reordering would merge URLs whose servers treat order as meaningful),
  * fragment dropped.
  */
object UrlOps {

  /** Anchored match for a tracking query parameter (the industry stop
    * list: utm_*, click ids, ref) — same regex dialect in Spark (Java)
    * and DuckDB (RE2). */
  val TrackingParamRegex = "^(utm_[a-z0-9_]*|gclid|fbclid|msclkid|ref)="

  private val schemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private val authRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
  private val restRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$"

  /** Canonical URL as one Column expression (composable into any plan). */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    val scheme = lower(regexp_extract(noFrag, schemeRe, 1))
    val auth = lower(regexp_extract(noFrag, authRe, 1))
    val host = when(scheme === "http", regexp_replace(auth, ":80$", ""))
      .when(scheme === "https", regexp_replace(auth, ":443$", ""))
      .otherwise(auth)
    val rest = regexp_extract(noFrag, restRe, 1)
    val path = regexp_extract(rest, "^([^?]*)", 1)
    val rawQ = regexp_extract(rest, "^[^?]*\\?(.*)$", 1)
    val kept = filter(split(rawQ, "&"),
      p => !p.rlike(TrackingParamRegex) && p =!= lit(""))
    val q = array_join(kept, "&")
    concat(scheme, lit("://"), host,
      when(path === "", lit("/")).otherwise(path),
      when(q === "", lit("")).otherwise(concat(lit("?"), q)))
  }

  /** Lowercase, portless host of a CANONICAL url. */
  def hostOf(canonicalUrl: Column): Column =
    regexp_extract(canonicalUrl, authRe, 1)

  /** Domain for per-domain curation: canonical host minus a leading www. */
  def domainOf(canonicalUrl: Column): Column =
    regexp_replace(hostOf(canonicalUrl), "^www\\.", "")

  /** Exact dedup by canonical URL: keeps the minimum-`tieBreak` row per
    * canonical form and adds the canonical URL as `urlOut`. One hash
    * shuffle on the canonical string — the row_number=1 formulation, so
    * the survivor is deterministic (same reasoning as [[Dedup]]). */
  def dedupByUrl(df: DataFrame, rawUrl: Column, urlOut: String,
                 tieBreak: Seq[String]): DataFrame =
    Dedup.exactByExpr(df, canonicalizeUrl(rawUrl), urlOut, tieBreak)

  /** DuckDB twin of [[canonicalizeUrl]] as CTE stages over an input
    * relation exposing `url` (plus carried columns): emits `canon` with
    * the canonical `url` and its `domain`. Kept structurally parallel to
    * the Column pipeline above — same regexes, same CASE arms — so the
    * two dialects cannot drift independently. */
  def canonicalizeSqlCtes(inputCte: String, carry: Seq[String]): String = {
    val c = if (carry.isEmpty) "" else carry.mkString("", ", ", ",")
    s"""u_nf AS (SELECT $c regexp_replace(url, '#.*', '') AS nf FROM $inputCte),
       |u_parts AS (SELECT $c
       |  lower(regexp_extract(nf, '$schemeRe', 1)) AS scheme,
       |  lower(regexp_extract(nf, '$authRe', 1)) AS auth,
       |  regexp_extract(nf, '$restRe', 1) AS rest FROM u_nf),
       |u_host AS (SELECT $c scheme,
       |  CASE WHEN scheme = 'http' THEN regexp_replace(auth, ':80$$', '')
       |       WHEN scheme = 'https' THEN regexp_replace(auth, ':443$$', '')
       |       ELSE auth END AS host,
       |  regexp_extract(rest, '^([^?]*)', 1) AS path,
       |  regexp_extract(rest, '^[^?]*\\?(.*)$$', 1) AS rawq FROM u_parts),
       |u_q AS (SELECT $c scheme, host,
       |  CASE WHEN path = '' THEN '/' ELSE path END AS path,
       |  array_to_string(list_filter(string_split(rawq, '&'),
       |    p -> NOT regexp_matches(p, '$TrackingParamRegex') AND p <> ''), '&') AS q
       |  FROM u_host),
       |canon AS (SELECT $c
       |  scheme || '://' || host || path ||
       |    CASE WHEN q = '' THEN '' ELSE '?' || q END AS url,
       |  regexp_replace(host, '^www\\.', '') AS domain FROM u_q)""".stripMargin
  }

  /** Politeness-scheduled crawl frontier (round 11): a crawler may issue
    * at most `perWave` fetches per politeness window against one host.
    * Given a prioritized frontier, assign each URL its within-host rank
    * and its WAVE — the politeness window in which it becomes fetchable:
    * wave = (rank − 1) div perWave + 1. The schedule is a pure FUNCTION
    * of the frontier (no scheduler state), so any number of fetch workers
    * can claim disjoint wave slices independently, and a re-plan after a
    * partial crawl is just this operator over the remaining frontier.
    * ONE window over the host shuffle; skew is bounded by the hottest
    * host's frontier (exactly the thing the wave number then spreads over
    * time). `priority` must be total (end it with a unique id) or the
    * schedule is nondeterministic. */
  def frontierSchedule(df: DataFrame, hostCol: Column, perWave: Int,
                       priority: Seq[Column]): DataFrame = {
    require(perWave >= 1, s"perWave must be >= 1, got $perWave")
    require(priority.nonEmpty, "need a priority order; end it with the id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(hostCol).orderBy(priority: _*)
    df.withColumn("host_rank", row_number().over(w).cast("long"))
      .withColumn("wave", expr(s"(host_rank - 1) div $perWave") + 1L)
  }
}
