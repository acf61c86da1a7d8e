package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}
import graft.functions.VectorOps
import graft.operators.{Bm25, Similarity, TextOps}

/** Keyword / hybrid retrieval over `documents` + `embeddings` — the search
  * layer of the LLM-curation surface (SURVEY.md §2.B Q-SRCH1–3). The
  * reference has no query layer at all (analysis deferred to Glue/SageMaker,
  * `README.md:46`); BM25, positional proximity and lexical+semantic fusion
  * are what its downstream consumers would run first.
  *
  * All score-emitting queries are fully DuckDB-oracle-checked with
  * ENGINE-VERSION-EXACT scores (round-8 hardening after the r7 driver
  * gate flipped q_srch1/3/4 on a libm ulp): tfc is exact-integer
  * rational, idf is milli-pinned per term with a margin proof, and every
  * downstream value is integer arithmetic — see Bm25's object scaladoc.
  */
object SearchQueries extends QueryModule {

  import TextDedupQueries.tokSql
  import Shared.cosSql

  /** Fixed literal query set over the fixture vocabulary ('dup' is the one
    * rare term — df 26/500 — so q1 exercises a high-idf term). */
  private val bmQueries: Seq[(Long, String)] = Seq(
    1L -> "spark join dup",
    2L -> "fast hash scan",
    3L -> "stream window batch",
    4L -> "customer query filter",
    5L -> "big data vector")

  private val proxPairs = Seq(("spark", "join"), ("hash", "table"), ("window", "stream"))
  private val proxWindow = 5

  /** Query-by-example seed docs for the hybrid ranker (doc_id == vec_id by
    * fixture construction, FIXTURES.md §A). */
  private val seeds = Seq(0L, 7L, 13L)

  /** Phrase set over the fixture vocabulary — includes a repeated-term
    * phrase (the DISTINCT-offset case) and a 3-term run. */
  private val phrases: Seq[(Long, String)] = Seq(
    1L -> "batch batch batch",
    2L -> "window window",
    3L -> "table scan",
    4L -> "hash scan join")

  private def bmQueryDf(s: SparkSession): DataFrame = {
    import s.implicits._
    bmQueries.flatMap { case (id, t) => t.split(' ').toSeq.map(id -> _) }
      .toDF("query_id", "term")
  }

  /** BM25 top-10 for the fixed ad-hoc query set — q_srch1's whole surface
    * AND the list q_srch6 slices its top-3 snippets from; scored once per
    * (session, corpus), exactly as a serving tier caches a hot query
    * set's result list. */
  private def bmTop10(s: SparkSession, d: String): DataFrame =
    graft.util.Memo.cachedDf(s, s"bm_top10|$d") {
      Bm25.topK(Bm25.scoreMicro(Shared.bm25Postings(s, d), bmQueryDf(s)), 10)
    }

  /** Lexical tower: BM25 top-50 per seed over the seed doc's term set
    * (self excluded) — shared by q_srch3 (fusion) and q_srch7 (mining),
    * so it is memoized: the towers are built once per (session, corpus). */
  private def lexTop50(s: SparkSession, d: String): DataFrame =
    graft.util.Memo.cachedDf(s, s"lex_top50|$d") {
      val docs = Tables.load(s, d, "documents")
      val seedTerms = docs.where(col("doc_id").isin(seeds: _*))
        .select(col("doc_id").as("query_id"),
          explode(TextOps.tokens(col("text"))).as("term"))
        .distinct()
      Bm25.topK(
          Bm25.scoreMicro(Shared.bm25Postings(s, d), seedTerms)
            .where(col("doc_id") =!= col("query_id")), 50)
        .select(col("query_id"), col("doc_id"), col("rank"))
    }

  /** Semantic tower: embedding-cosine top-50 per seed (self excluded). */
  private def semTop50(s: SparkSession, d: String): DataFrame =
    graft.util.Memo.cachedDf(s, s"sem_top50|$d") {
      val emb = Tables.load(s, d, "embeddings")
      val seedVecs = emb.where(col("vec_id").isin(seeds: _*))
        .select(col("vec_id").as("query_id"), col("embedding").as("__qv"))
      val semScored = emb.crossJoin(broadcast(seedVecs))
        .where(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("doc_id"),
          round(VectorOps.cosine(col("embedding"), col("__qv")), 6).as("sim"))
      Similarity.topKPerGroup(semScored, Seq("query_id"),
          Seq(col("sim").desc, col("doc_id").asc), 50)
        .select(col("query_id"), col("doc_id"), col("rn").as("rank"))
    }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Q-SRCH1: BM25 top-10 per query — postings built once (memoized,
    // shared with q_srch3), query terms broadcast onto them; the ranked
    // list itself is memoized and re-sliced by q_srch6.
    "q_srch1" -> ((s, d) => bmTop10(s, d).orderBy("query_id", "rank")),

    // Q-SRCH10 (round 11): ranking-quality evaluation of the BM25 top-10
    // against a DETERMINISTIC relevance standard (conjunctive match: a
    // doc is relevant iff it contains EVERY query term) — the eval table
    // a retrieval stack publishes per query set: first relevant rank,
    // reciprocal rank, hits/precision at 5 and 10, recall at 10. All
    // exact integers: rr/recall via the positive-branch rhaDiv,
    // precision@k = hits·(1e6/k) (k divides 1e6 — a pure multiply).
    // Relevance from the memoized postings (one join + one aggregate),
    // never a text rescan.
    "q_srch10" -> ((s, d) => {
      import s.implicits._
      val nTerms = bmQueries
        .map { case (id, t) => (id, t.split(' ').distinct.length.toLong) }
        .toDF("query_id", "n_terms")
      val rel = Shared.bm25Postings(s, d)
        .join(broadcast(bmQueryDf(s)), Seq("term"))
        .groupBy("query_id", "doc_id")
        .agg(countDistinct("term").as("__m"))
        .join(broadcast(nTerms), Seq("query_id"))
        .where(col("__m") === col("n_terms"))
        .select("query_id", "doc_id")
      val nRel = rel.groupBy("query_id").agg(count(lit(1)).as("n_relevant"))
      val marked = bmTop10(s, d)
        .join(rel.withColumn("__rel", lit(1L)), Seq("query_id", "doc_id"),
          "left_outer")
        .withColumn("__rel", coalesce(col("__rel"), lit(0L)))
      marked.groupBy("query_id").agg(
          min(when(col("__rel") === 1, col("rank"))).as("first_rel_rank"),
          sum(when(col("rank") <= 5, col("__rel")).otherwise(lit(0L)))
            .as("hits_at_5"),
          sum(col("__rel")).as("hits_at_10"))
        .join(nRel, Seq("query_id"), "left_outer")
        .withColumn("n_relevant", coalesce(col("n_relevant"), lit(0L)))
        .withColumn("rr_micro", when(col("first_rel_rank").isNotNull,
          expr("(2 * 1000000 + first_rel_rank) div (2 * first_rel_rank)")))
        .withColumn("p5_micro", col("hits_at_5") * 200000L)
        .withColumn("p10_micro", col("hits_at_10") * 100000L)
        .withColumn("recall10_micro", when(col("n_relevant") > 0,
          expr("(2 * hits_at_10 * 1000000 + n_relevant) div (2 * n_relevant)")))
        .orderBy("query_id")
    }),

    // Q-SRCH2: positional proximity — docs where a term pair co-occurs
    // within 5 positions, with closest distance and hit count.
    "q_srch2" -> ((s, d) =>
      Bm25.proximity(Tables.load(s, d, "documents"), "doc_id", col("text"),
          proxPairs, proxWindow)
        .orderBy("term_a", "term_b", "doc_id")),

    // Q-SRCH3: hybrid query-by-example — BM25 over the seed doc's terms
    // fused with embedding-cosine ranking by reciprocal-rank fusion.
    "q_srch3" -> ((s, d) => {
      val fused = Bm25.rrfFuse(lexTop50(s, d).unionByName(semTop50(s, d)))
      Similarity.topKPerGroup(fused, Seq("query_id"),
          Seq(col("rrf_micro").desc, col("doc_id").asc), 10)
        .select(col("query_id"), col("doc_id"), col("rrf_micro"),
          col("rn").as("rank"))
        .orderBy("query_id", "rank")
    }),

    // Q-SRCH4: day-2 index maintenance — the stored day-1 postings are
    // reloaded from disk, ONLY the day-2 docs are tokenized, and scoring
    // runs over the merged index. The contract (merged == full rebuild)
    // is what the oracle enforces: its SQL indexes the WHOLE corpus.
    "q_srch4" -> ((s, d) => {
      import s.implicits._
      val day2 = Tables.load(s, d, "documents").where(col("doc_id") % 5 === 0)
      // materialized: scoreMicro consumes its postings THREE times (df
      // rollup, corpus stats, the scoring join) — lazy would tokenize the
      // day-2 batch once per consumer (r15: 6 parquet scans -> 2)
      val merged = Bm25.incrementalPostings(
        Shared.storedPostings(s, d), day2, "doc_id", col("text"))
        .localCheckpoint()
      Bm25.topK(Bm25.scoreMicro(merged, bmQueryDf(s)), 10)
        .orderBy("query_id", "rank")
    }),

    // Q-SRCH5: exact phrase search — n-term runs found relationally
    // (pos - offset agreement), overlapping occurrences all counted.
    "q_srch5" -> ((s, d) =>
      Bm25.phraseSearch(Tables.load(s, d, "documents"), "doc_id", col("text"),
          phrases)
        .orderBy("phrase_id", "doc_id")),

    // Q-SRCH6: keyword-in-context snippets for the BM25 top-3 — a ±3-token
    // window around the doc's FIRST occurrence of any query term. The
    // window slice happens on the top-3 rows only (30 rows total), never
    // the corpus; first-hit positions come from the same broadcast-join
    // shape as scoring.
    "q_srch6" -> ((s, d) => {
      val q = bmQueryDf(s)
      val top = bmTop10(s, d).where(col("rank") <= 3)
      // semi-join the corpus down to the <=30 result docs BEFORE the
      // position explode — the snippet pass never tokenizes a non-result
      val docs = Tables.load(s, d, "documents")
        .join(broadcast(top.select("doc_id").distinct()), Seq("doc_id"), "left_semi")
      val firstHit = docs
        .select(col("doc_id"), posexplode(TextOps.tokens(col("text"))).as(Seq("pos", "term")))
        .join(broadcast(q), Seq("term"))
        .groupBy("query_id", "doc_id")
        .agg(min(col("pos")).cast("long").as("first_pos"))
      val start = greatest(lit(1L), col("first_pos") + 1L - 3L)
      top.join(firstHit, Seq("query_id", "doc_id"))
        .join(docs.select(col("doc_id"), TextOps.tokens(col("text")).as("__toks")),
          Seq("doc_id"))
        .select(col("query_id"), col("doc_id"), col("rank"), col("first_pos"),
          array_join(slice(col("__toks"), start.cast("int"), lit(7)), " ").as("snippet"))
        .orderBy("query_id", "rank")
    }),

    // Q-SRCH7: hard-negative mining — the DISAGREEMENT set of the two
    // towers. lex_only = term overlap but semantically far (the classic
    // hard negative for embedding training); sem_only = semantically near
    // with no term overlap (the paraphrase the lexical index misses).
    // Anti-joins over the two top-50 lists; the corpus is scanned once
    // per tower, never per pair.
    "q_srch7" -> ((s, d) => {
      val lex = lexTop50(s, d)
      val sem = semTop50(s, d)
      val lexOnly = lex.join(sem, Seq("query_id", "doc_id"), "left_anti")
        .select(col("query_id"), col("doc_id"), lit("lex_only").as("side"), col("rank"))
      val semOnly = sem.join(lex, Seq("query_id", "doc_id"), "left_anti")
        .select(col("query_id"), col("doc_id"), lit("sem_only").as("side"), col("rank"))
      lexOnly.unionByName(semOnly)
        .orderBy("query_id", "side", "rank", "doc_id")
    }),

    // Q-SRCH8: MMR diversification — the semantic top-50 for seed 0
    // reranked so near-duplicate hits stop crowding the page: greedy
    // λ·rel − (1−λ)·maxSimToSelected over exact integer micro scores.
    // Retrieval + the 50×50 pairwise sims stay distributed; only the
    // output-sized candidate list reaches the driver greedy.
    // ORACLE-CHECKED as of round 9: k is a fixed contract constant, so
    // the data-dependent greedy unrolls into k chained MATERIALIZED CTEs
    // (the k-core-peel playbook) — each step's argmax is a plain
    // ORDER BY/LIMIT 1 with the penalty as a correlated MAX over the
    // already-selected set; every compared value is integer micro.
    "q_srch8" -> ((s, d) => {
      val emb = Tables.load(s, d, "embeddings")
      val qv = emb.where(col("vec_id") === 0).select(col("embedding").as("__qe"))
      val scored = emb.crossJoin(broadcast(qv)).where(col("vec_id") =!= 0)
        .select(col("vec_id").as("doc_id"), col("embedding"),
          round(VectorOps.cosine(col("embedding"), col("__qe")) * lit(1e6), 0)
            .cast("long").as("rel_micro"))
      val cands = scored.orderBy(col("rel_micro").desc, col("doc_id").asc)
        .limit(50).localCheckpoint()
      val a = cands.select(col("doc_id").as("id_a"), col("embedding").as("__ea"))
      val b = cands.select(col("doc_id").as("id_b"), col("embedding").as("__eb"))
      val sims = a.join(broadcast(b), col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          round(VectorOps.cosine(col("__ea"), col("__eb")) * lit(1e6), 0)
            .cast("long").as("sim_micro"))
      Bm25.mmrSelect(cands.select("doc_id", "rel_micro"), sims, k = 10)
        .orderBy("rank")
    }),

    // Q-SRCH9 (round 7): prefix autocomplete — top-3 completions per
    // standing 2-char prefix by corpus token frequency. The completion
    // index is the vocabulary rollup keyed by an equi-joinable prefix
    // (substring, not startsWith, so the join hashes — never a nested
    // loop); ties break lexicographically. All integer => hash-exact.
    "q_srch9" -> ((s, d) => {
      import s.implicits._
      val vocab = Tables.load(s, d, "documents")
        .select(explode(TextOps.tokens(col("text"))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("n"))
        .withColumn("prefix", substring(col("tok"), 1, 2))
      val prefixes = Seq("ta", "sc", "wi", "me", "fa").toDF("prefix")
      val pick = org.apache.spark.sql.expressions.Window.partitionBy("prefix")
        .orderBy(col("n").desc, col("tok").asc)
      vocab.join(broadcast(prefixes), Seq("prefix"))
        .withColumn("rank", row_number().over(pick))
        .where(col("rank") <= 3)
        .withColumn("rank", col("rank").cast("long"))
        .select("prefix", "rank", "tok", "n")
        .orderBy("prefix", "rank")
    }),
  )

  /** Shared SQL CTE chain mirroring Bm25.postings + df/stats — kept in
    * lockstep with the operator (same grouping, same double derivations). */
  private val postCtes =
    s"""tok AS (SELECT doc_id, $tokSql AS toks FROM documents),
       |post AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, t.w AS term,
       |                CAST(COUNT(*) AS BIGINT) AS tf
       |         FROM tok, unnest(toks) AS t(w) GROUP BY doc_id, dl, term),
       |dft AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM post GROUP BY term),
       |stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       |                 CAST(SUM(dl) AS BIGINT) AS sum_dl
       |          FROM (SELECT doc_id, dl FROM post GROUP BY doc_id, dl)),
       |idft AS (SELECT f.term, s.n_docs, s.sum_dl,
       |                CAST(round(ln(1.0 +
       |                  (CAST(s.n_docs AS DOUBLE) - CAST(f.df AS DOUBLE) + 0.5) /
       |                  (CAST(f.df AS DOUBLE) + 0.5)) * 1000.0, 0) AS BIGINT)
       |                  AS idf_milli
       |         FROM dft f, stats s)""".stripMargin

  /** Per-(query,doc,term) BM25 contribution in micro-units — the SQL twin
    * of Bm25.scoreMicro's exact-integer formula (round-8 hardening): tfc
    * scaled by k1Den·bDen·S into integer num/den (coefficients 44/20/6/18
    * for k1=6/5, b=3/4), idf pinned per term at milli precision (the only
    * libm value — margin-proved off-boundary in Bm25Spec), and the
    * contribution an integer round-half-up division. No transcendental or
    * double-division result reaches the compared value. */
  private def contribCte(qryCte: String, extraWhere: String): String =
    s"""contrib AS (
       |  SELECT q.query_id, p.doc_id,
       |    (2 * i.idf_milli * (44 * p.tf * i.sum_dl) * 1000 +
       |     (20 * p.tf * i.sum_dl + 6 * i.sum_dl + 18 * p.dl * i.n_docs))
       |    // (2 * (20 * p.tf * i.sum_dl + 6 * i.sum_dl + 18 * p.dl * i.n_docs))
       |      AS c
       |  FROM post p JOIN $qryCte q ON p.term = q.term
       |       JOIN idft i ON p.term = i.term
       |  $extraWhere),
       |scored AS (SELECT query_id, doc_id, CAST(SUM(c) AS BIGINT) AS score_micro
       |           FROM contrib GROUP BY query_id, doc_id)""".stripMargin

  /** Shared CTE chain ending in `lex` and `sem` — the two retrieval
    * towers' per-seed top-50 lists, used by the q_srch3 and q_srch7
    * oracles. */
  private lazy val twoTowerCtes: String = {
    val seedList = seeds.mkString("(", ", ", ")")
    s"""$postCtes,
       |seedq AS (SELECT doc_id AS query_id, t.w AS term
       |          FROM tok, unnest(toks) AS t(w)
       |          WHERE doc_id IN $seedList GROUP BY doc_id, t.w),
       |${contribCte("seedq", "WHERE p.doc_id <> q.query_id")},
       |lex AS (SELECT query_id, doc_id, rank FROM (
       |  ${rankedSql("scored", "score_micro", 50)}) WHERE rank <= 50),
       |sem0 AS (SELECT s.vec_id AS query_id, e.vec_id AS doc_id,
       |                round(${cosSql("e.embedding", "s.embedding")}, 6) AS sim
       |         FROM embeddings e, embeddings s
       |         WHERE s.vec_id IN $seedList AND e.vec_id <> s.vec_id),
       |sem AS (SELECT query_id, doc_id, rank FROM (
       |  ${rankedSql("sem0", "sim", 50)}) WHERE rank <= 50)""".stripMargin
  }

  private def rankedSql(source: String, scoreCol: String, k: Int): String =
    s"""SELECT query_id, doc_id, $scoreCol,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |         ORDER BY $scoreCol DESC, doc_id) AS BIGINT) AS rank
       |  FROM $source""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q_srch9" ->
      s"""WITH v AS (
         |  SELECT t.w AS tok, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM (SELECT $tokSql AS toks FROM documents), unnest(toks) AS t(w)
         |  GROUP BY 1),
         |p AS (SELECT * FROM (VALUES ('ta'), ('sc'), ('wi'), ('me'), ('fa'))
         |      AS x(prefix)),
         |r AS (SELECT p.prefix, v.tok, v.n,
         |    row_number() OVER (PARTITION BY p.prefix
         |        ORDER BY v.n DESC, v.tok ASC) AS rank
         |  FROM v JOIN p ON substring(v.tok, 1, 2) = p.prefix)
         |SELECT prefix, rank, tok, n FROM r WHERE rank <= 3
         |ORDER BY prefix, rank""".stripMargin,
    "q_srch10" -> {
      val vals = bmQueries.flatMap { case (id, t) =>
        t.split(' ').toSeq.map(w => s"(CAST($id AS BIGINT), '$w')")
      }.mkString(", ")
      s"""WITH $postCtes,
         |qry AS (SELECT * FROM (VALUES $vals) AS v(query_id, term)),
         |${contribCte("qry", "")},
         |top10 AS (SELECT query_id, doc_id, rank FROM (
         |  ${rankedSql("scored", "score_micro", 10)}) WHERE rank <= 10),
         |nt AS (SELECT query_id, CAST(COUNT(DISTINCT term) AS BIGINT) AS n_terms
         |  FROM qry GROUP BY 1),
         |relm AS (SELECT q.query_id, p.doc_id,
         |    CAST(COUNT(DISTINCT p.term) AS BIGINT) AS m
         |  FROM qry q JOIN post p ON p.term = q.term GROUP BY 1, 2),
         |rel AS (SELECT r.query_id, r.doc_id
         |  FROM relm r JOIN nt ON r.query_id = nt.query_id AND r.m = nt.n_terms),
         |nrel AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_relevant
         |  FROM rel GROUP BY 1),
         |mk AS (SELECT t.query_id, t.rank,
         |    CASE WHEN r.doc_id IS NOT NULL THEN 1 ELSE 0 END AS isrel
         |  FROM top10 t LEFT JOIN rel r
         |    ON t.query_id = r.query_id AND t.doc_id = r.doc_id),
         |ag AS (SELECT query_id,
         |    MIN(CASE WHEN isrel = 1 THEN rank END) AS first_rel_rank,
         |    CAST(SUM(CASE WHEN rank <= 5 THEN isrel ELSE 0 END) AS BIGINT)
         |      AS hits_at_5,
         |    CAST(SUM(isrel) AS BIGINT) AS hits_at_10
         |  FROM mk GROUP BY 1)
         |SELECT a.query_id, CAST(a.first_rel_rank AS BIGINT) AS first_rel_rank,
         |  a.hits_at_5, a.hits_at_10,
         |  CAST(coalesce(n.n_relevant, 0) AS BIGINT) AS n_relevant,
         |  CASE WHEN a.first_rel_rank IS NOT NULL THEN
         |    CAST((2*1000000 + a.first_rel_rank) // (2*a.first_rel_rank) AS BIGINT)
         |  END AS rr_micro,
         |  CAST(a.hits_at_5 * 200000 AS BIGINT) AS p5_micro,
         |  CAST(a.hits_at_10 * 100000 AS BIGINT) AS p10_micro,
         |  CASE WHEN coalesce(n.n_relevant, 0) > 0 THEN
         |    CAST((2*a.hits_at_10*1000000 + n.n_relevant) // (2*n.n_relevant)
         |      AS BIGINT)
         |  END AS recall10_micro
         |FROM ag a LEFT JOIN nrel n ON a.query_id = n.query_id
         |ORDER BY a.query_id""".stripMargin
    },
    "q_srch1" -> {
      val vals = bmQueries.flatMap { case (id, t) =>
        t.split(' ').toSeq.map(w => s"(CAST($id AS BIGINT), '$w')")
      }.mkString(", ")
      s"""WITH $postCtes,
         |qry AS (SELECT * FROM (VALUES $vals) AS v(query_id, term)),
         |${contribCte("qry", "")}
         |SELECT query_id, doc_id, score_micro, rank FROM (
         |  ${rankedSql("scored", "score_micro", 10)})
         |WHERE rank <= 10
         |ORDER BY query_id, rank""".stripMargin
    },
    // q_srch4's oracle is deliberately the FULL-corpus index: the query
    // under test merges stored day-1 postings with freshly-tokenized
    // day-2 docs, and must equal a from-scratch rebuild exactly.
    "q_srch4" -> {
      val vals = bmQueries.flatMap { case (id, t) =>
        t.split(' ').toSeq.map(w => s"(CAST($id AS BIGINT), '$w')")
      }.mkString(", ")
      s"""WITH $postCtes,
         |qry AS (SELECT * FROM (VALUES $vals) AS v(query_id, term)),
         |${contribCte("qry", "")}
         |SELECT query_id, doc_id, score_micro, rank FROM (
         |  ${rankedSql("scored", "score_micro", 10)})
         |WHERE rank <= 10
         |ORDER BY query_id, rank""".stripMargin
    },
    "q_srch5" -> {
      val vals = phrases.flatMap { case (pid, p) =>
        val ts = p.trim.toLowerCase.split("\\s+").toSeq
        ts.zipWithIndex.map { case (t, off) =>
          s"(CAST($pid AS BIGINT), '$t', $off, ${ts.size})"
        }
      }.mkString(", ")
      s"""WITH tok AS (SELECT doc_id, $tokSql AS toks FROM documents),
         |pos AS (SELECT doc_id, toks[r.i] AS term, r.i - 1 AS p
         |        FROM tok, unnest(range(1, len(toks) + 1)) AS r(i)),
         |pt AS (SELECT * FROM (VALUES $vals) AS v(phrase_id, term, off, plen)),
         |m AS (SELECT t.phrase_id, p.doc_id, t.plen, p.p - t.off AS s, t.off
         |      FROM pos p JOIN pt t ON p.term = t.term
         |      WHERE p.p - t.off >= 0),
         |occ AS (SELECT phrase_id, doc_id, plen, s,
         |               COUNT(DISTINCT off) AS n_off
         |        FROM m GROUP BY phrase_id, doc_id, plen, s)
         |SELECT phrase_id, doc_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_occurrences,
         |  CAST(MIN(s) AS BIGINT) AS first_pos
         |FROM occ WHERE n_off = plen
         |GROUP BY phrase_id, doc_id
         |ORDER BY phrase_id, doc_id""".stripMargin
    },
    "q_srch6" -> {
      val vals = bmQueries.flatMap { case (id, t) =>
        t.split(' ').toSeq.map(w => s"(CAST($id AS BIGINT), '$w')")
      }.mkString(", ")
      s"""WITH $postCtes,
         |qry AS (SELECT * FROM (VALUES $vals) AS v(query_id, term)),
         |${contribCte("qry", "")},
         |top3 AS (SELECT query_id, doc_id, rank FROM (
         |  ${rankedSql("scored", "score_micro", 3)}) WHERE rank <= 3),
         |pos AS (SELECT doc_id, toks[r.i] AS term, r.i - 1 AS p
         |        FROM tok, unnest(range(1, len(toks) + 1)) AS r(i)),
         |fh AS (SELECT q.query_id, pos.doc_id, CAST(MIN(pos.p) AS BIGINT) AS first_pos
         |       FROM pos JOIN qry q ON pos.term = q.term
         |       GROUP BY q.query_id, pos.doc_id)
         |SELECT t.query_id, t.doc_id, t.rank, fh.first_pos,
         |  array_to_string(k.toks[
         |    greatest(1, fh.first_pos + 1 - 3):greatest(1, fh.first_pos + 1 - 3) + 6],
         |    ' ') AS snippet
         |FROM top3 t
         |JOIN fh ON fh.query_id = t.query_id AND fh.doc_id = t.doc_id
         |JOIN tok k ON k.doc_id = t.doc_id
         |ORDER BY t.query_id, t.rank""".stripMargin
    },
    "q_srch2" -> {
      val vals = proxPairs.map { case (a, b) => s"('$a', '$b')" }.mkString(", ")
      s"""WITH tok AS (SELECT doc_id, $tokSql AS toks FROM documents),
         |pos AS (SELECT doc_id, toks[r.i] AS term, r.i - 1 AS p
         |        FROM tok, unnest(range(1, len(toks) + 1)) AS r(i)),
         |pairs AS (SELECT * FROM (VALUES $vals) AS v(term_a, term_b)),
         |j AS (SELECT v.term_a, v.term_b, a.doc_id, abs(a.p - b.p) AS dist
         |      FROM pos a JOIN pairs v ON a.term = v.term_a
         |      JOIN pos b ON b.doc_id = a.doc_id AND b.term = v.term_b
         |      WHERE abs(a.p - b.p) <= $proxWindow)
         |SELECT term_a, term_b, doc_id,
         |  CAST(MIN(dist) AS BIGINT) AS min_dist,
         |  CAST(COUNT(*) AS BIGINT) AS n_hits
         |FROM j GROUP BY term_a, term_b, doc_id
         |ORDER BY term_a, term_b, doc_id""".stripMargin
    },
    "q_srch3" -> {
      s"""WITH $twoTowerCtes,
         |allr AS (SELECT query_id, doc_id, rank FROM lex
         |         UNION ALL SELECT query_id, doc_id, rank FROM sem),
         |fused AS (SELECT query_id, doc_id,
         |    CAST(SUM(CAST(round(1000000.0 / (60.0 + CAST(rank AS DOUBLE)), 0) AS BIGINT))
         |      AS BIGINT) AS rrf_micro
         |  FROM allr GROUP BY query_id, doc_id)
         |SELECT query_id, doc_id, rrf_micro, rank FROM (
         |  ${rankedSql("fused", "rrf_micro", 10)})
         |WHERE rank <= 10
         |ORDER BY query_id, rank""".stripMargin
    },
    "q_srch7" ->
      s"""WITH $twoTowerCtes
         |SELECT query_id, doc_id, side, rank FROM (
         |  SELECT l.query_id, l.doc_id, 'lex_only' AS side, l.rank FROM lex l
         |  WHERE NOT EXISTS (SELECT 1 FROM sem s
         |    WHERE s.query_id = l.query_id AND s.doc_id = l.doc_id)
         |  UNION ALL
         |  SELECT s.query_id, s.doc_id, 'sem_only' AS side, s.rank FROM sem s
         |  WHERE NOT EXISTS (SELECT 1 FROM lex l
         |    WHERE l.query_id = s.query_id AND l.doc_id = s.doc_id))
         |ORDER BY query_id, side, rank, doc_id""".stripMargin,
    // MMR replayed exactly: k = 10 is a contract constant, so the greedy
    // unrolls into 10 chained MATERIALIZED CTEs (the k-core-peel
    // playbook — MATERIALIZED stops DuckDB re-inlining each level at
    // every reference). Step i's penalty mirrors mmrSelect BIT-FOR-BIT:
    // MAX over the docs already in s_{i-1} of COALESCE(sim, 0) — each
    // selected doc contributes its pair sim OR 0 when the pair is absent
    // from the sims table (round-9 advice: a bare MAX over present pairs
    // would diverge on a sparse sims table with negative sims, where the
    // operator floors each missing pair at 0 inside the max). Written as
    // a plain cross-join + left-join aggregate — DuckDB rejects non-inner
    // joins on correlated columns, and decorrelated joins dodge the
    // mis-decorrelation class entirely. The argmax is ORDER BY
    // (mmr DESC, doc_id) LIMIT 1 — mmrSelect's exact tie-break. All
    // compared values are integer micro (BIGINT).
    "q_srch8" -> {
      val steps = (2 to 10).map { i =>
        val (p, s) = (i - 1, i)
        s"""c$s AS MATERIALIZED (
           |  SELECT c.doc_id, c.rel_micro,
           |    700000*c.rel_micro - 300000*MAX(COALESCE(x.sim_micro, 0)) AS mmr
           |  FROM (SELECT * FROM cands
           |        WHERE doc_id NOT IN (SELECT doc_id FROM s$p)) c
           |  CROSS JOIN s$p sel
           |  LEFT JOIN simsall x ON x.id_a = c.doc_id AND x.id_b = sel.doc_id
           |  GROUP BY c.doc_id, c.rel_micro),
           |s$s AS MATERIALIZED (SELECT * FROM s$p UNION ALL
           |  SELECT doc_id, rel_micro, mmr, $s FROM
           |    (SELECT * FROM c$s ORDER BY mmr DESC, doc_id LIMIT 1))""".stripMargin
      }.mkString(",\n")
      s"""WITH
         |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         |scored AS (SELECT vec_id AS doc_id, embedding,
         |    CAST(round(${cosSql("embedding", "qe")} * 1000000.0, 0) AS BIGINT) AS rel_micro
         |  FROM embeddings, q WHERE vec_id <> 0),
         |cands AS MATERIALIZED (SELECT doc_id, embedding, rel_micro FROM scored
         |  ORDER BY rel_micro DESC, doc_id LIMIT 50),
         |simsall AS MATERIALIZED (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    CAST(round(${cosSql("a.embedding", "b.embedding")} * 1000000.0, 0) AS BIGINT) AS sim_micro
         |  FROM cands a JOIN cands b ON a.doc_id <> b.doc_id),
         |s1 AS MATERIALIZED (SELECT doc_id, rel_micro, 700000*rel_micro AS mmr, 1 AS rank
         |  FROM cands ORDER BY mmr DESC, doc_id LIMIT 1),
         |$steps
         |SELECT CAST(rank AS BIGINT) AS rank, doc_id, rel_micro,
         |  CAST(mmr AS BIGINT) AS mmr_micro
         |FROM s10 ORDER BY rank""".stripMargin
    },
  )
}
