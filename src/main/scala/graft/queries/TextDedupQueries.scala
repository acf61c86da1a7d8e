package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}
import graft.operators.{Dedup, NearDup, TextOps}

/** Text analysis + deduplication over `documents` (north star,
  * BASELINE.json; SURVEY.md §2.B Q-TXT1–2, Q-DEDUP1–2 + extensions):
  * tokenize/word-freq, per-language stats, language-ID heuristic, quality
  * scoring, token counting, fingerprinting, exact + sketch dedup, exact
  * n-gram Jaccard. Sketch queries (MinHash/SimHash/fingerprint) have no
  * SQL twin (engine-specific hashes) and are property-tested instead.
  */
object TextDedupQueries extends QueryModule {

  // SQL twin of TextOps.tokens — keep in lockstep.
  private[queries] val tokSql =
    """list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> length(x) > 0)"""

  private def inList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("(", ",", ")")

  // Shared oracle for q_fuzzy1 (shared-trigram blocking) and q_fuzzy2
  // (prefix filtering): both engine paths must produce this exact output.
  private val fuzzyJaccardSql =
    """WITH o AS (SELECT DISTINCT lower(p_name) AS o_name FROM part),
      |c AS (SELECT DISTINCT substr(o_name, 4) AS c_name FROM o),
      |og AS (SELECT o_name, unnest(list_distinct(CASE WHEN length(o_name) < 3
      |         THEN [o_name] ELSE list_transform(
      |         range(1, length(o_name) - 1), i -> o_name[i:i+2]) END)) AS g FROM o),
      |cg AS (SELECT c_name, unnest(list_distinct(CASE WHEN length(c_name) < 3
      |         THEN [c_name] ELSE list_transform(
      |         range(1, length(c_name) - 1), i -> c_name[i:i+2]) END)) AS g FROM c),
      |osz AS (SELECT o_name, COUNT(*) AS sz FROM og GROUP BY 1),
      |csz AS (SELECT c_name, COUNT(*) AS sz FROM cg GROUP BY 1),
      |inter AS (SELECT c_name, o_name, COUNT(*) AS i FROM cg JOIN og USING (g) GROUP BY 1, 2)
      |SELECT c_name, o_name,
      |  CAST(i AS DOUBLE) / CAST(csz.sz + osz.sz - i AS DOUBLE) AS sim
      |FROM inter JOIN csz USING (c_name) JOIN osz USING (o_name)
      |WHERE CAST(i AS DOUBLE) / CAST(csz.sz + osz.sz - i AS DOUBLE) >= 0.4
      |ORDER BY c_name, o_name""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q-TXT1: tokenize + explode + word frequency.
    "q_txt1" -> ((s, d) =>
      Tables.load(s, d, "documents")
        .select(explode(TextOps.tokens(col("text"))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("w").asc)),

    // Q-TXT2: per-language corpus stats.
    "q_txt2" -> ((s, d) =>
      Tables.load(s, d, "documents")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          sum(TextOps.wordCount(col("text"))).as("sum_words"))
        .orderBy("lang")),

    // Language-ID heuristic: marker-stopword hit counts per language,
    // argmax with alphabetical tie-break.
    "q_txt3" -> ((s, d) => {
      val base = Tables.load(s, d, "documents")
        .withColumn("toks", TextOps.tokens(col("text")))
      val scored = TextOps.langMarkers.foldLeft(base) { case (df, (l, ms)) =>
        df.withColumn(s"s_$l", TextOps.markerHits(col("toks"), ms))
      }
      val pred = TextOps.predictedLang(
        TextOps.langMarkers.map { case (l, _) => l -> col(s"s_$l") })
      scored.select(col("doc_id"), col("s_de"), col("s_en"), col("s_es"),
          col("s_fr"), col("s_zh"), pred.as("pred_lang"),
          (pred === col("lang")).as("is_match"))
        .orderBy("doc_id")
    }),

    // Quality scoring: length / word-shape / stopword / digit signals.
    "q_txt4" -> ((s, d) =>
      Tables.load(s, d, "documents").select(
        col("doc_id"), col("n_chars"),
        TextOps.wordCount(col("text")).as("n_words"),
        round(TextOps.meanWordLen(col("text")), 6).as("mean_wlen"),
        round(TextOps.stopwordRatio(col("text")), 6).as("stop_ratio"),
        round(TextOps.digitRatio(col("text")), 6).as("digit_ratio"))
        .orderBy("doc_id")),

    // Token counting: whitespace, BPE-ish regex segmentation, chars/4.
    "q_txt5" -> ((s, d) =>
      Tables.load(s, d, "documents").select(
        col("doc_id"),
        TextOps.wordCount(col("text")).as("n_ws_tokens"),
        TextOps.bpeishTokenCount(col("text")).as("n_bpe_tokens"),
        TextOps.estTokensByChars(col("text")).as("est_chars_tokens"))
        .orderBy("doc_id")),

    // Context-window chunking: 200-char chunks, 50-char overlap.
    "q_txt7" -> ((s, d) =>
      Tables.load(s, d, "documents")
        .select(col("doc_id"),
          posexplode(TextOps.chunks(col("text"), chunkChars = 200, overlap = 50)))
        .select(col("doc_id"), col("pos").cast("long").as("chunk_idx"),
          col("col").as("chunk"))
        .orderBy("doc_id", "chunk_idx")),

    // Token-overlap between consecutive docs, written DECLARATIVELY with
    // size(array_intersect(sort_array(array_distinct(...)))) — the
    // injected optimizer rule (plans.IntersectCountRewrite) swaps in the
    // fused two-pointer codegen expression; no operator is named in user
    // code. Oracle-checked (string-token intersect counts; 64-bit hash
    // collisions are absent on this vocabulary).
    "q_txt8" -> ((s, d) => {
      def hs(c: org.apache.spark.sql.Column) =
        sort_array(array_distinct(transform(TextOps.tokens(c), x => xxhash64(x))))
      val t = Tables.load(s, d, "documents")
      val a = t.select(col("doc_id"), col("text").as("ta"))
      val b = t.select((col("doc_id") - 1).as("doc_id"), col("text").as("tb"))
      a.join(b, "doc_id")
        .select(col("doc_id"),
          size(array_intersect(hs(col("ta")), hs(col("tb")))).cast("long").as("overlap"))
        .orderBy("doc_id")
    }),

    // Per-language token-count z-scores — stratified outlier detection,
    // the quality-filtering primitive (drop |z| > cutoff docs before
    // training). Exact integer token sums (sum, sum-of-squares, count are
    // exact longs) => the double mean/sd/z sequence is identical on both
    // engines: division and sqrt are correctly rounded IEEE ops, so the
    // raw z hash-matches with no rounding. Stats side is 5 rows =>
    // broadcast join, one pass over the corpus.
    "q_txt10" -> ((s, d) => {
      val t = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("lang"), TextOps.wordCount(col("text")).as("n_tok"))
      val stats = t.groupBy("lang").agg(
        sum("n_tok").as("s"), sum(col("n_tok") * col("n_tok")).as("sq"),
        count(lit(1)).as("n"))
      val (sd, sqd, nd) = (col("s").cast("double"), col("sq").cast("double"),
        col("n").cast("double"))
      val mean = sd / nd
      val variance = when(nd > 1.0,
        greatest((sqd - sd * sd / nd) / (nd - lit(1.0)), lit(0.0))).otherwise(lit(0.0))
      t.join(broadcast(stats), "lang")
        .select(col("doc_id"), col("lang"), col("n_tok"),
          ((col("n_tok").cast("double") - mean) /
            nullif(sqrt(variance), lit(0.0))).as("z"))
        .orderBy("doc_id")
    }),

    // Sequence packing: documents -> fixed-token-budget training bins,
    // greedy first-fit in doc_id order (rows-only: bin ids depend on the
    // range partitioning; budget/coverage/determinism are spec-tested).
    "q_txt9" -> ((s, d) => {
      val docs = Tables.load(s, d, "documents")
        .select(col("doc_id"), TextOps.wordCount(col("text")).as("n_tok"))
      TextOps.packSequences(docs, col("doc_id"), col("n_tok"), tokenBudget = 600)
        .orderBy("doc_id")
    }),

    // Deterministic train/val/test assignment — oracle-checked since the
    // round-5 switch from xxhash64 to the SQL-replicable Knuth bucket.
    "q_sample1" -> ((s, d) =>
      graft.operators.DataSplit.assignSplit(
        Tables.load(s, d, "customer").select("c_custkey"),
        col("c_custkey"), Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .orderBy("c_custkey")),

    // Mixture resampling: downsample documents to a 50/30/20 source recipe
    // (the pre-training data-recipe step). Acceptance rates are derived
    // in-plan from per-source counts and applied as a key-hash threshold;
    // the hash and rate arithmetic are SQL-replicable, so oracle-checked.
    "q_sample2" -> ((s, d) =>
      graft.operators.DataSplit.resampleToMixture(
        Tables.load(s, d, "documents").select("doc_id", "source"),
        "doc_id", "source", Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2))
        .select("doc_id", "source").orderBy("doc_id")),

    // Q-SAMPLE8: temperature sampling — downsample toward f_s ∝ n_s^0.5
    // (the multilingual rebalancing rule: minority sources over-represented
    // relative to their natural share). Fractions derived in-plan from the
    // counts, pow/division rounded once at 6dp, then the same
    // SQL-replicable hash threshold as q_sample2 => hash-exact.
    "q_sample8" -> ((s, d) =>
      graft.operators.DataSplit.temperatureResample(
        Tables.load(s, d, "documents").select("doc_id", "source"),
        "doc_id", "source", alpha = 0.5)
        .select("doc_id", "source").orderBy("doc_id")),

    // Q-SAMPLE9: deterministic epoch shuffle — each epoch's reproducible
    // global training order derived at scan speed (key-stable Knuth hash;
    // no shuffle, no window, no RNG state). The writer materializes the
    // order via repartitionByRange(epoch, shuffle_key); a dense
    // row_number would serialize each epoch through one task.
    "q_sample9" -> ((s, d) =>
      graft.operators.DataSplit.epochShuffleKeys(
          Tables.load(s, d, "documents").select("doc_id"), "doc_id", epochs = 3)
        .orderBy("epoch", "shuffle_key", "doc_id")),

    // Composite quality GATE (the Gopher-rule application step, distinct
    // from q_txt4's signal computation): per-rule pass flags + the
    // conjunction, so downstream can both filter and attribute drops.
    // One scan, all rules as column expressions.
    "q_txt15" -> ((s, d) =>
      Tables.load(s, d, "documents").select(
        col("doc_id"),
        (TextOps.wordCount(col("text")) >= 30).as("r_words"),
        TextOps.meanWordLen(col("text")).between(3.0, 10.0).as("r_wlen"),
        (TextOps.digitRatio(col("text")) <= 0.2).as("r_digit"))
        .withColumn("keep", col("r_words") && col("r_wlen") && col("r_digit"))
        .orderBy("doc_id")),

    // Per-domain cap (anti-spam curation): keep at most 5 docs per source,
    // the longest first (ties to the lowest doc_id). The row_number<=cap
    // shape compiles to WindowGroupLimit: map-side top-cap pre-pruning.
    "q_sample3" -> ((s, d) =>
      graft.operators.Curation.capPerDomain(
        Tables.load(s, d, "documents").select("doc_id", "source", "n_chars"),
        col("source"), cap = 5, col("n_chars").desc, col("doc_id").asc)
        .orderBy("doc_id")),

    // Global token-budget selection: best documents (longest-first order)
    // until the 10k-token training budget is spent — two-pass global
    // prefix sum, no single-partition window.
    "q_sample4" -> ((s, d) => {
      val docs = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("n_chars"), TextOps.wordCount(col("text")).as("n_tok"))
      graft.operators.Curation.selectUnderBudget(docs, "n_tok", budget = 10000L,
        col("n_chars").desc, col("doc_id").asc)
        .orderBy("doc_id")
    }),

    // Q-SAMPLE6: deterministic weighted sample — 100 documents with
    // probability proportional to length (the quality-weighted corpus
    // cut). ORACLE-CHECKED as of round 9: the key-stable uniform draw is
    // replayed via XxhashSql.hashLongCte and only the selected SET is
    // compared (scores never leave the plan), so the ln() transcendental
    // can only matter at the rank-100/101 boundary — whose fixture margin
    // is ~12 orders above libm drift. Determinism, exact-k and weight
    // monotonicity stay property-tested (CurationSpec).
    "q_sample6" -> ((s, d) =>
      graft.operators.Curation.weightedSample(
          Tables.load(s, d, "documents").select("doc_id", "lang", "n_chars"),
          col("doc_id"), col("n_chars").cast("double"), k = 100)
        .orderBy("doc_id")),

    // Q-SAMPLE7 (round 5): class rebalancing — EXACTLY 250 documents per
    // language: minority langs oversampled by deterministic replication
    // (epoch-ordered `copy` index), majority langs downsampled by the
    // hash-order rank cut. One count agg + broadcast factors + explode +
    // one WindowGroupLimit-pruned rank per class; hash-exact oracle.
    "q_sample7" -> ((s, d) =>
      graft.operators.DataSplit.balanceClasses(
          Tables.load(s, d, "documents").select("doc_id", "lang"),
          classCol = "lang", keyCol = "doc_id", target = 250L)
        .orderBy("lang", "doc_id", "copy")),

    // Rolling-hash document fingerprint. ORACLE-CHECKED as of round 9:
    // the "engine-specific" ingredient is Spark's xxhash64 over token
    // strings, which XxhashSql.hashStringCtes re-derives from scratch;
    // the Karp-Rabin fold is then an exact integer recursion the oracle
    // replays per doc (one recursive-CTE level per token position).
    "q_txt6" -> ((s, d) =>
      Tables.load(s, d, "documents").select(
        col("doc_id"),
        TextOps.rollingFingerprint(TextOps.tokens(col("text"))).as("fingerprint"))
        .orderBy("doc_id")),

    // Q-DEDUP1: exact content dedup on a normalization hash, deterministic
    // survivor (min doc_id).
    // NOT converted to exactByKeysProjected (r16 — VERDICT r15 #7 probed
    // and rejected here): the __rn = 1 window form already gets map-side
    // top-1 pruning from Spark's WindowGroupLimit pushdown, while the
    // projected min-of-struct compiles to SortAggregate (structs are not
    // hash-aggregable) and adds a map-side sort — probed 0.27 -> 0.39 s
    // (q_curl2/3 regressed the same way; q_set4 keeps the projected form
    // on its r15 measured win).
    "q_dedup1" -> ((s, d) =>
      Dedup.exactByExpr(Tables.load(s, d, "documents"),
        Dedup.contentHash(substring(col("text"), 1, 50)), "h", Seq("doc_id"))
        .select("doc_id", "h").orderBy("doc_id")),

    // Q-DEDUP2: MinHash+LSH near-dup candidate pairs. ORACLE-CHECKED as
    // of round 8: the "engine-specific hash" exclusion fell to
    // XxhashSql — the oracle re-derives every shingle's XXH64, all 32
    // permutation hashes, the band folds and the bucket join from the
    // fixture text (recall on planted duplicates stays property-tested).
    // Shared memoized intermediate — q_dedup5 clusters the same pair
    // list without recomputing it.
    "q_dedup2" -> ((s, d) => Shared.lshCandidates(s, d).orderBy("id_a", "id_b")),

    // SimHash near-dup pairs by hamming distance — ORACLE-CHECKED as of
    // round 8 (XxhashSql recomputes every token hash and SimHash bit;
    // the oracle replays the chunk-pigeonhole candidate semantics at the
    // recall-lossy hamming<=16 operating point). The sketch comes from
    // the memoized persisted fingerprint index (Shared.simhashTable — a
    // stored table at cluster scale), so the query measures the per-run
    // cost: bucket join + Hamming filter.
    "q_dedup3" -> ((s, d) =>
      NearDup.simhashPairs(Shared.simhashTable(s, d), "doc_id", maxHamming = 16)
        .orderBy("id_a", "id_b")),

    // Q-DEDUP12 (round 5): corpus-scale SimHash candidates — the Manku
    // 3-of-6-block tables (~2^32 buckets vs the 4-chunk form's 2^16 per
    // chunk, which collapses past ~1e5 docs). Exact pigeonhole at
    // hamming<=3; output-identical to simhashPairs at the same bound
    // (spec-asserted) — which is also its round-8 oracle: the exactness
    // contract lets the oracle compare against brute-force hamming<=3
    // over the XxhashSql-recomputed simhashes.
    "q_dedup12" -> ((s, d) =>
      NearDup.simhashPairsWide(Shared.simhashTable(s, d), "doc_id", maxHamming = 3)
        .orderBy("id_a", "id_b")),

    // SemDeDup: semantic dedup via k-means cells (rows-only: the
    // quantizer is not SQL-replicable; precision/planted-dup-recall are
    // spec-tested). Reuses the SAME cached IVF assignment the ANN
    // queries probe — one quantizer fit serves search and dedup.
    "q_dedup9" -> ((s, d) => {
      val (indexed, _) = graft.operators.IvfAnn.cachedIndex(
        s, d, "embedding", numClusters = 16)(Tables.load(s, d, "embeddings"))
      graft.operators.SemDedup.survivors(indexed, "vec_id", "embedding", minSim = 0.3)
        .select("vec_id", "label").orderBy("vec_id")
    }),

    // End-to-end near-dup pipeline tail: cluster MinHash-LSH candidate
    // pairs into connected components. ORACLE-CHECKED as of round 8: the
    // oracle recomputes the full candidate chain (XxhashSql) and runs
    // min-reachable-vertex components as a recursive CTE; also
    // unit-tested on known graphs.
    "q_dedup5" -> ((s, d) =>
      NearDup.connectedComponents(Shared.lshCandidates(s, d)).orderBy("v")),

    // Embedding-cosine near-dup dedup end-to-end: threshold pairs within
    // label blocks -> connected components -> survivors. Oracle-checked:
    // the edge list is deterministic (q_sim2 oracles it) and the min-label
    // components are a DuckDB recursive CTE. The component labels are the
    // MEMOIZED Shared.cosineComponents (r11) — q_dedup7 reads the same
    // table, so the star contraction runs once per session, not per query.
    "q_dedup6" -> ((s, d) => {
      val comp = Shared.cosineComponents(s, d)
      Tables.load(s, d, "embeddings").select("vec_id", "label")
        .join(comp.where(col("v") =!= col("component")).select("v"),
          col("vec_id") === col("v"), "left_anti")
        .orderBy("vec_id")
    }),

    // Connected-component labels themselves over the same deterministic
    // edge list — the oracle-checked twin of q_dedup5's shape: every
    // clustered vertex with the min vertex id reachable from it (served
    // from the same memoized component table as q_dedup6).
    "q_dedup7" -> ((s, d) =>
      Shared.cosineComponents(s, d).orderBy("v")),

    // Incremental dedup arrival path: candidate pairs touching a NEW doc
    // batch, found by joining its band table against the persisted corpus
    // band index — no corpus recompute. ORACLE-CHECKED as of round 8:
    // bands are corpus-independent, so the oracle's from-scratch
    // full-corpus chain (XxhashSql) restricted to pairs touching the
    // day-2 batch IS the incremental contract (still property-tested
    // across random splits, where the oracle pins one split). The stored
    // side comes from the ON-DISK band store (written once per session,
    // RELOADED from parquet — the full index lifecycle, not a plan reuse).
    "q_dedup8" -> ((s, d) => {
      val docs = Tables.load(s, d, "documents").select("doc_id", "text")
      NearDup.incrementalLshCandidates(
        NearDup.lshBandTable(docs.where(col("doc_id") % 5 === 0), "doc_id", col("text")),
        Shared.storedBands(s, d))
        .orderBy("id_a", "id_b")
    }),

    // Q-DEDUP21 (round 8): SEMANTIC dedup-on-arrival — the day-2
    // embedding batch (vec_id % 5 == 0) assigned to its deterministic
    // cell (the label block, so the contract is SQL-replicable; k-means
    // cells stay on q_dedup9) and probed against the ON-DISK day-1 cell
    // store (written once per session, RELOADED from parquet — the full
    // index lifecycle). new×new plus new×stored cosine pairs only; the
    // stored corpus is never re-paired against itself. ORACLE-ENFORCED
    // incremental contract (the q_dedup16 discipline): output equals the
    // full within-cell recompute over day-1 ∪ day-2 restricted to pairs
    // touching day-2.
    "q_dedup21" -> ((s, d) => {
      val day2 = Tables.load(s, d, "embeddings").where(col("vec_id") % 5 === 0)
        .select(col("label").cast("long").as("__cluster"),
          col("vec_id"), col("embedding"))
      graft.operators.SemDedup.incrementalPairsWithinCells(
          day2,
          Shared.storedCells(s, d).select(col("__cluster"),
            col("__id").as("vec_id"), col("__vec").as("embedding")),
          "vec_id", "embedding", minSim = 0.3)
        .orderBy("id_a", "id_b")
    }),

    // Exact n-gram Jaccard pairs within a language block (the ground truth
    // for the sketches; oracle-checked). Block-local kernel: each block's
    // arrays decode once and pair in-memory — ~2.5x over the join form on
    // this corpus (identical output; join form remains the unbounded-block
    // path).
    "q_dedup4" -> ((s, d) =>
      NearDup.exactJaccardPairsBlocked(Tables.load(s, d, "documents"), "doc_id",
        col("text"), col("lang"), shingleN = 3, minSim = 0.05)
        .orderBy("id_a", "id_b")),

    // Q-DEDUP10: exact duplicated-span detection — maximal verbatim
    // cross-document spans >= 12 tokens via positional 4-gram shingle
    // hashes + diagonal gaps-and-islands (oracle-checked; never doc x doc;
    // shared memoized intermediate — q_dedup11 clusters the same spans).
    "q_dedup10" -> ((s, d) =>
      Shared.spanPairs(s, d).orderBy("id_a", "id_b", "start_a", "start_b")),

    // Q-DEDUP11: dup-cluster observability — size histogram of the
    // connected components over the duplicated-span pair list (how much
    // of the corpus sits in verbatim-duplicate clusters, and how big they
    // are). Oracle-checked via the recursive-CTE components twin.
    "q_dedup11" -> ((s, d) =>
      Shared.spanComponents(s, d)
        .groupBy("component").agg(count(lit(1)).as("cluster_size"))
        .groupBy("cluster_size").agg(count(lit(1)).as("n_clusters"))
        .orderBy("cluster_size")),

    // Q-DEDUP13: quality-aware cluster survival — keep the BEST doc per
    // verbatim-span dup cluster (longest by n_chars, id tie-break), not
    // the arbitrary min-id; unclustered docs pass through. The production
    // form of the q_dedup11 components.
    "q_dedup13" -> ((s, d) =>
      NearDup.dedupByComponentsBestFrom(
          Tables.load(s, d, "documents").select("doc_id", "n_chars"),
          "doc_id",
          Shared.spanComponents(s, d),
          Seq(col("n_chars").desc, col("doc_id").asc))
        .orderBy("doc_id")),

    // Q-TXT25: compression-ratio quality signal — deflated/raw bytes per
    // doc (the classic cheap spam gate: repetition compresses). Rows-only:
    // deflate output is engine-specific; monotonicity + determinism are
    // spec-asserted.
    "q_txt25" -> ((s, d) =>
      TextOps.compressionSignals(Tables.load(s, d, "documents"),
          "doc_id", col("text"))
        .orderBy("doc_id")),

    // Q-DEDUP14: the LSH S-curve for the REGISTERED MinHash parameters
    // (r=4 rows/band, b=8 bands): collision probability as a function of
    // true Jaccard — the tuning artifact that justifies the threshold the
    // dedup family operates at. Pure math at 6dp => hash-exact.
    "q_dedup14" -> ((s, d) => {
      val steps = s.range(1, 20)
      steps.select((col("id").cast("double") / lit(20.0)).as("jaccard"))
        .select(col("jaccard"),
          round(lit(1.0) - pow(lit(1.0) - pow(col("jaccard"), lit(4.0)), lit(8.0)), 6)
            .as("p_collide"))
        .orderBy("jaccard")
    }),

    // Q-TXT24: vocabulary coverage curve — cumulative token coverage of
    // the top-50 vocabulary (the vocab-size / OOV-budget table read before
    // fixing a tokenizer). Distributed: vocab rollup + TakeOrdered top-k;
    // the single-partition cumsum window runs on the 50 SURVIVORS only.
    // BOUND: structural — limit(50) sits UPSTREAM of the global window in
    // this same expression, so the one-task sort can never see more than
    // 50 rows (no runtime guard needed; whitelisted in
    // GlobalWindowSweepSpec).
    "q_txt24" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val wc = Tables.load(s, d, "documents")
        .select(explode(TextOps.tokens(col("text"))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("cnt"))
        .localCheckpoint() // feeds the total AND the top-k
      val tot = wc.agg(sum(col("cnt")).as("total"))
      val o = Window.orderBy(col("cnt").desc, col("w").asc)
      wc.orderBy(col("cnt").desc, col("w").asc).limit(50)
        .crossJoin(broadcast(tot))
        .select(row_number().over(o).cast("long").as("rank"), col("w"), col("cnt"),
          sum(col("cnt")).over(o.rowsBetween(Window.unboundedPreceding,
            Window.currentRow)).cast("long").as("cum_cnt"),
          (sum(col("cnt")).over(o.rowsBetween(Window.unboundedPreceding,
            Window.currentRow)).cast("double") / col("total").cast("double"))
            .as("cum_coverage"))
        .orderBy("rank")
    }),

    // Q-TXT18: bigram count table (the n-gram LM statistic / collocation
    // front door): top-15 bigrams per language by raw count with a
    // deterministic tie-break. One explode + one aggregation; the rank is
    // WindowGroupLimit-pre-pruned so a hot language never ships its whole
    // bigram tail.
    "q_txt18" -> ((s, d) => {
      val t = Tables.load(s, d, "documents")
        .select(col("lang"), TextOps.tokens(col("text")).as("__toks"))
      val counts = t
        .select(col("lang"), explode(TextOps.bigrams(col("__toks"))).as("bigram"))
        .groupBy("lang", "bigram").agg(count(lit(1)).as("n"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy(col("n").desc, col("bigram").asc)
      counts.withColumn("__rn", row_number().over(w))
        .where(col("__rn") <= 15).drop("__rn")
        .orderBy("lang", "bigram")
    }),

    // Q-TXT17: corpus-level overlap — distinct-shingle Jaccard between the
    // train and eval splits (the corpus-granularity contamination metric
    // next to q_txt11's per-document report). ONE scan: per-shingle
    // membership flags via max(), then three sums — no shingle x shingle
    // join, no distinct-then-join; the quotient ships as raw IEEE (exact
    // integer inputs divide bitwise-identically in both engines).
    "q_txt17" -> ((s, d) => {
      val sh = NearDup.withShingles(
          Tables.load(s, d, "documents").select(col("doc_id"), col("text")),
          col("text"), 3)
        .select(explode(col("__sh")).as("s"),
          (col("doc_id") % 10 =!= 0).as("is_train"))
      sh.groupBy("s")
        .agg(max(when(col("is_train"), 1).otherwise(0)).as("a"),
          max(when(!col("is_train"), 1).otherwise(0)).as("b"))
        .agg(sum(col("a")).cast("long").as("n_train_shingles"),
          sum(col("b")).cast("long").as("n_eval_shingles"),
          sum(col("a") * col("b")).cast("long").as("n_shared"))
        .select(col("n_train_shingles"), col("n_eval_shingles"), col("n_shared"),
          (col("n_shared").cast("double") /
            (col("n_train_shingles") + col("n_eval_shingles") - col("n_shared"))
              .cast("double")).as("jaccard"))
    }),

    // Q-TXT16: boilerplate shingle report — the df-cap's companion tool:
    // which 3-gram shingles are over-common across the corpus (distinct
    // per doc, so df = document frequency). At crawl scale this IS the
    // stop-shingle list the dedup joins drop.
    "q_txt16" -> ((s, d) =>
      NearDup.withShingles(
          Tables.load(s, d, "documents").select(col("doc_id"), col("text")),
          col("text"), 3)
        .select(col("doc_id"), explode(col("__sh")).as("s"))
        .groupBy("s").agg(count(lit(1)).as("df"))
        .where(col("df") >= 5)
        .orderBy(col("df").desc, col("s"))),

    // Decontamination: eval split (doc_id % 10 == 0) checked for 3-gram
    // shingle overlap against the train split — one hash join on shingle
    // hashes, never doc x doc.
    "q_txt11" -> ((s, d) => {
      val docs = Tables.load(s, d, "documents")
      TextOps.contaminationReport(
        docs.where(col("doc_id") % 10 =!= 0),
        docs.where(col("doc_id") % 10 === 0),
        "doc_id", col("text"), shingleN = 3)
        .orderBy("doc_id")
    }),

    // Repetition quality filters: duplicate-word and top-bigram fractions.
    "q_txt12" -> ((s, d) =>
      TextOps.repetitionReport(Tables.load(s, d, "documents"), "doc_id", col("text"))
        .orderBy("doc_id")),

    // TF-IDF keyword extraction: top-3 terms per document by
    // tf * ln(N/df). Two aggregations (term-frequency, document-
    // frequency — the df table is vocabulary-sized) + a per-doc top-k
    // window; the corpus size joins in as a broadcast scalar, never a
    // driver-side collect. Scores rounded at 6dp (ln is transcendental;
    // raw IEEE would diverge between engines) and the rounded score IS
    // the ranking key, so ranking is engine-independent too.
    "q_txt14" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.load(s, d, "documents")
      // materialized once: tf feeds BOTH the document-frequency rollup and
      // the scoring join (lazy would tokenize the corpus twice)
      val tf = docs.select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        .localCheckpoint()
      val dft = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      val scored = tf.join(dft, Seq("term")).crossJoin(broadcast(nDocs))
        .select(col("doc_id"), col("term"),
          round(col("tf") * log(col("n_docs").cast("double") / col("df").cast("double")), 6)
            .as("score"))
      val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term").asc)
      scored.withColumn("__rk", row_number().over(w)).where(col("__rk") <= 3)
        .select("doc_id", "term", "score")
        .orderBy(col("doc_id"), col("score").desc, col("term"))
    }),

    // Q-TXT19: CCNet-style perplexity-proxy scoring — per-doc average
    // surprisal under the held-in split's add-one unigram LM. Per-term
    // surprisal rounds ONCE to integer micro-nats (q_txt14's
    // transcendental policy); the doc rollup is then an exact
    // order-independent BIGINT sum => hash-exact.
    "q_txt19" -> ((s, d) =>
      TextOps.surprisalScores(Tables.load(s, d, "documents"),
          "doc_id", col("text"), col("doc_id") % 10 =!= 0)
        .orderBy("doc_id")),

    // Q-TXT20: source-drift diagnostics — KL(source ‖ corpus) per source
    // over unigram distributions (the data-recipe health check). One
    // tokenize pass; corpus totals derive from the per-source table;
    // micro-nat rounding + exact BIGINT rollup => hash-exact.
    "q_txt20" -> ((s, d) =>
      TextOps.sourceKlDivergence(Tables.load(s, d, "documents"),
          "source", col("text"))
        .orderBy("source")),

    // Q-TXT21: DSIR-style importance weighting — per-doc log-likelihood
    // ratio between the src0 target-domain unigram LM and the raw-corpus
    // LM (resampling on the weight shifts the mixture toward the target).
    // One tokenize pass, two vocab-sized LM rollups, one term join;
    // micro-nat rounding + exact BIGINT rollup => hash-exact.
    "q_txt21" -> ((s, d) =>
      TextOps.importanceWeights(Tables.load(s, d, "documents"),
          "doc_id", col("text"), col("source") === "src0")
        .orderBy("doc_id")),

    // Q-TXT22: distinct-n diversity per source — type-token ratio +
    // distinct-bigram ratio (the corpus-health diagnostics that catch a
    // source collapsing into template spam). Exact counts and raw
    // quotients only => hash-exact.
    "q_txt22" -> ((s, d) =>
      TextOps.diversityReport(Tables.load(s, d, "documents"),
          "source", col("text"))
        .orderBy("source")),

    // Q-TXT23: pairwise source-overlap matrix — distinct-3-shingle Jaccard
    // between every source pair (the redundancy map read before weighting
    // sources; q_txt17 is its train/eval special case). Dense matrix:
    // zero-overlap pairs are rows, not absences. Intersection cost is
    // bounded by vocabulary × sources², never corpus rows².
    "q_txt23" -> ((s, d) =>
      TextOps.sourceOverlapMatrix(Tables.load(s, d, "documents"),
          "source", col("text"), shingleN = 3)
        .orderBy("source_a", "source_b")),

    // Q-PIPE2: per-source corpus-health dashboard — doc/token counts,
    // distinct-n diversity, and KL drift vs the corpus mixture in ONE
    // table (the data-recipe review artifact; composition of the round-5
    // diagnostics operators). Output is #sources-sized; a production run
    // would share the tokenized intermediate across the three legs — here
    // each leg keeps its own oracle-checked shape.
    "q_pipe2" -> ((s, d) => {
      val docs = Tables.load(s, d, "documents")
      val counts = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
      val div = TextOps.diversityReport(docs, "source", col("text"))
        .select("source", "n_tokens", "n_types", "ttr", "distinct_bigram_ratio")
      val kl = TextOps.sourceKlDivergence(docs, "source", col("text"))
        .select(col("source"), col("kl"))
      counts.join(div, Seq("source")).join(kl, Seq("source")).orderBy("source")
    }),

    // Q-BPE1: BPE tokenizer induction — the learned merge table (rank,
    // pair, count) under the (count desc, pair asc) tie-break. Rows-only:
    // each iteration's pair statistics depend on the previous iteration's
    // data-dependent argmax, which no fixed SQL text can express; the
    // classic-corpus merge sequence is spec-asserted instead. Training
    // runs on the vocabulary-sized word-frequency table, never the corpus.
    "q_bpe1" -> ((s, d) =>
      graft.operators.BpeOps.mergeTable(s, Shared.bpe(s, d)._1).orderBy("rank")),

    // Q-BPE2: per-doc token counts under the learned BPE tokenizer (what
    // sequence packing / token budgeting consumes). Vocabulary-sized
    // word→length table broadcast-joined to the corpus — the merge fold
    // never runs at corpus scale. Rows-only (inherits q_bpe1's argmax).
    "q_bpe2" -> ((s, d) =>
      graft.operators.BpeOps.encodedTokenCounts(
          Tables.load(s, d, "documents"), "doc_id", col("text"),
          Shared.bpe(s, d)._2)
        .orderBy("doc_id")),

    // Q-UNIG1 (round 10): unigram-LM tokenizer induction (the
    // SentencePiece-unigram sibling of Q-BPE1): EM-estimated piece model
    // pruned top-down to the target vocabulary; the learned piece table
    // (rank, piece, Viterbi count, logp). Rows-only by the same
    // impossibility class as Q-BPE1 — every EM iteration's segmentation
    // depends on the previous iteration's data-dependent estimates and
    // the prune argmin feeds back into the next E-step; classic-corpus
    // behavior is spec-asserted (UnigramLmSpec). Training runs on the
    // vocabulary-sized word-frequency table, never the corpus.
    "q_unig1" -> ((s, d) =>
      graft.operators.UnigramLm.pieceTable(s, Shared.unigram(s, d)._1)
        .orderBy("rank")),

    // Q-UNIG2 (round 10): per-doc token counts under the learned unigram
    // segmentation — the q_bpe2 twin: the vocabulary-sized word→n_pieces
    // table broadcast-joins onto the corpus, Viterbi never runs at
    // corpus scale. Rows-only (inherits q_unig1's EM loop).
    "q_unig2" -> ((s, d) =>
      graft.operators.UnigramLm.encodedTokenCounts(
          Tables.load(s, d, "documents"), "doc_id", col("text"),
          s, Shared.unigram(s, d)._2)
        .orderBy("doc_id")),

    // Q-PIPE3 (round 6): the tokenize→budget→pack composition a
    // pre-training data pipeline actually runs end-to-end — learn the BPE
    // merge table (vocab-bound driver fold, memoized with q_bpe1/2),
    // broadcast per-word token lengths onto the corpus, then pack docs
    // into 512-token training bins, greedy first-fit in doc_id order.
    // Rows-only: inherits q_bpe1's argmax AND q_txt9's
    // partitioning-dependent bin ids; budget/coverage spec-asserted.
    "q_pipe3" -> ((s, d) => {
      val counts = graft.operators.BpeOps.encodedTokenCounts(
        Tables.load(s, d, "documents"), "doc_id", col("text"),
        Shared.bpe(s, d)._2)
      TextOps.packSequences(counts, col("doc_id"), col("n_bpe_tokens"),
          tokenBudget = 512)
        .orderBy("doc_id")
    }),

    // Q-PIPE7: context-length padding-waste table — the choose-the-seq-len
    // companion to q_pipe3's packing: for each candidate context length,
    // the token overhead of padding every doc's chunks up to the boundary
    // (pad = (L - nt mod L) mod L, exact integer math). One tokenize scan,
    // the 4-row length table broadcast onto it.
    "q_pipe7" -> ((s, d) => {
      import s.implicits._
      val nt = Tables.load(s, d, "documents")
        .select(size(TextOps.tokens(col("text"))).cast("long").as("__nt"))
      val ls = Seq(32L, 64L, 128L, 256L).toDF("seq_len")
      nt.crossJoin(broadcast(ls))
        .select(col("seq_len"), col("__nt"),
          (col("__nt") + pmod(col("seq_len") - pmod(col("__nt"), col("seq_len")),
            col("seq_len"))).as("__padded"))
        .groupBy("seq_len")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("__nt")).as("total_tokens"),
          sum(col("__padded")).as("padded_tokens"))
        .withColumn("waste_frac",
          (col("padded_tokens") - col("total_tokens")).cast("double") /
            col("padded_tokens").cast("double"))
        .orderBy("seq_len")
    }),

    // Entity resolution: fuzzy catalog-name alignment — corrupted variants
    // (first 3 chars dropped) matched back to the original name vocabulary
    // by character-trigram Jaccard; candidates from a shared-trigram join,
    // exact verify on collisions only (never all-pairs).
    "q_fuzzy1" -> ((s, d) => {
      val names = Tables.load(s, d, "part")
        .select(lower(col("p_name")).as("o_name")).distinct()
      val corrupted = names
        .select(substring(col("o_name"), 4, 100).as("c_name")).distinct()
      graft.operators.FuzzyJoin.matchByTrigramJaccard(
          corrupted, "c_name", col("c_name"),
          names, "o_name", col("o_name"), minSim = 0.4)
        .orderBy("c_name", "o_name")
    }),

    // Same entity-resolution output through the corpus-scale path: PPJoin
    // prefix filtering (only each record's rarest trigrams enter the
    // candidate join) + length filter. Lossless by the prefix-filter
    // pigeonhole — same oracle as q_fuzzy1, hash-exact.
    "q_fuzzy2" -> ((s, d) => {
      val names = Tables.load(s, d, "part")
        .select(lower(col("p_name")).as("o_name")).distinct()
      val corrupted = names
        .select(substring(col("o_name"), 4, 100).as("c_name")).distinct()
      graft.operators.FuzzyJoin.matchByTrigramJaccardPrefix(
          corrupted, "c_name", col("c_name"),
          names, "o_name", col("o_name"), minSim = 0.4)
        .orderBy("c_name", "o_name")
    }),

    // Q-FUZZY3 (round 7): typo/variant pairs by Levenshtein distance <= 2
    // over the distinct name vocabulary — the edit-distance complement to
    // the trigram matchers. Blocking is the LOSSLESS length band
    // (ED <= k forces |Δlen| <= k): each name fans to its 2k+1 candidate
    // lengths and pairs equi-join on length, never all-pairs. Both
    // engines implement standard Levenshtein => hash-exact.
    "q_fuzzy3" -> ((s, d) =>
      graft.operators.FuzzyJoin.editDistancePairs(
          Tables.load(s, d, "part"), lower(col("p_name")), maxDist = 2)
        .orderBy("name_a", "name_b")),

    // PII scrubbing: deterministic synthetic PII is appended per doc (the
    // fixture has none), then redacted and counted — the pre-training
    // scrub pass, at scan speed, oracle-checked byte-for-byte.
    "q_txt13" -> ((s, d) => {
      val enriched = Tables.load(s, d, "documents").select(col("doc_id"),
        concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com or 555-0123 now")).as("t"))
      val (ne, np) = TextOps.piiCounts(col("t"))
      enriched.select(col("doc_id"), ne.as("n_emails"), np.as("n_phones"),
          TextOps.redactPii(col("t")).as("clean"))
        .orderBy("doc_id")
    }),

    // Q-TXT31: Zipf-slope corpus-health diagnostic — per source, fit
    // log(count) ~ slope * log(rank) over the top-100 terms (healthy
    // natural text sits near -1; template floods flatten it, long-tail
    // gibberish steepens it). Ranks via WindowGroupLimit (map-side
    // top-100 per source), logs micro-rounded ONCE, then the least-
    // squares slope from exact BIGINT sufficient statistics — one final
    // double division.
    "q_txt31" -> ((s, d) => {
      val tf = Tables.load(s, d, "documents")
        .select(col("source"), explode(TextOps.tokens(col("text"))).as("term"))
        .groupBy("source", "term").agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("source").orderBy(col("cnt").desc, col("term").asc)
      val ranked = tf
        .withColumn("rank", row_number().over(w).cast("long"))
        .where(col("rank") <= 100)
      val x = round(log(col("rank").cast("double")) * lit(1e6), 0).cast("long")
      val y = round(log(col("cnt").cast("double")) * lit(1e6), 0).cast("long")
      ranked.select(col("source"), x.as("x"), y.as("y"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_terms"), sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
        .select(col("source"), col("n_terms"),
          ((col("n_terms") * col("sxy") - col("sx") * col("sy")).cast("double") /
            nullif(col("n_terms") * col("sxx") - col("sx") * col("sx"), lit(0L))
              .cast("double")).as("zipf_slope"))
        .orderBy("source")
    }),

    // Q-TXT32: quality-threshold sweep — the choose-the-gate table read
    // BEFORE fixing a filter: for each candidate threshold, how many docs
    // and what token fraction survive. One scan computes the per-doc
    // score; the 5-row threshold table broadcasts onto it.
    "q_txt32" -> ((s, d) => {
      import s.implicits._
      val sc = Tables.load(s, d, "documents")
        .select(col("doc_id"),
          size(TextOps.tokens(col("text"))).cast("long").as("__nt"),
          TextOps.compositeQualityMicro(col("text")).as("__score"))
      val ts = Seq(350000L, 400000L, 450000L, 500000L, 550000L).toDF("threshold")
      val kept = col("__score").isNotNull && (col("__score") >= col("threshold"))
      sc.crossJoin(broadcast(ts))
        .groupBy("threshold")
        .agg(sum(when(kept, 1L).otherwise(0L)).as("n_kept"),
          count(lit(1)).as("n_docs"),
          sum(when(kept, col("__nt")).otherwise(0L)).as("kept_tokens"),
          sum(col("__nt")).as("total_tokens"))
        .select(col("threshold"), col("n_kept"),
          (col("n_kept").cast("double") / col("n_docs").cast("double"))
            .as("frac_docs"),
          col("kept_tokens"),
          (col("kept_tokens").cast("double") / col("total_tokens").cast("double"))
            .as("frac_tokens"))
        .orderBy("threshold")
    }),

    // Q-TXT33 (round 7): integer token-voting domain classifier — train
    // on even doc_ids, score the odd half, publish the confusion matrix
    // (actual × predicted doc counts). Pure-integer class scores (the
    // multinomial count form; ln-free by the q_sample6 adjudication) with
    // (score desc, label asc) tie-break => hash-exact.
    "q_txt33" -> ((s, d) => {
      val docs = Tables.load(s, d, "documents")
      val pred = TextOps.domainClassify(
        docs.where(pmod(col("doc_id"), lit(2)) === 0),
        docs.where(pmod(col("doc_id"), lit(2)) === 1),
        "doc_id", "text", "source")
      pred.groupBy(col("actual"), col("predicted"))
        .agg(count(lit(1)).as("n"))
        .orderBy("actual", "predicted")
    }),

    // Q-TXT34 (round 7): per-source Pareto frontier on (token count,
    // quality score) — the skyline docs no other same-source doc strictly
    // beats on BOTH axes: the "best long docs" shortlist a curation
    // review reads (length and quality trade off; the frontier is the
    // whole trade-off curve). Scalable form: per distinct token count the
    // max quality, then a shifted running max over counts DESC — a doc is
    // dominated iff that running max (over strictly-longer docs) strictly
    // exceeds its quality. O(n log n), no pairwise; the oracle states the
    // same predicate as NOT EXISTS (fine at fixture size). All integer.
    "q_txt34" -> ((s, d) => {
      val sc = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("source"),
          size(TextOps.tokens(col("text"))).cast("long").as("nt"),
          TextOps.compositeQualityMicro(col("text")).as("q"))
        .where(col("q").isNotNull)
        .localCheckpoint() // feeds BOTH the frontier table and the join
                           // back — lazy would re-score the corpus twice
      val perNt = sc.groupBy(col("source"), col("nt"))
        .agg(max(col("q")).as("__mq"))
      val wNt = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy(col("nt").desc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val best = perNt.select(col("source"), col("nt"),
        max(col("__mq")).over(wNt).as("__best"))
      sc.join(best, Seq("source", "nt"))
        .where(col("__best").isNull || col("__best") <= col("q"))
        .select("doc_id", "source", "nt", "q")
        .orderBy("doc_id")
    }),

    // Q-TXT35 (round 7): PMI collocations — the strongest-associated
    // bigrams (pmi = ln(c_ab·N / (c_a·c_b)), counts from the bigram table
    // itself: c_a = left-position, c_b = right-position totals), minimum
    // count 5, top-20 by (pmi_micro desc, pair). The phrase-mining /
    // multiword-expression table. The ln argument is a quotient of double
    // PRODUCTS of exact counts in fixed textual order, rounded ONCE to
    // micro-nats (the q_txt20 transcendental policy) => hash-exact.
    "q_txt35" -> ((s, d) => {
      val all = Tables.load(s, d, "documents")
        .select(TextOps.tokens(col("text")).as("__toks"))
        .select(explode(TextOps.bigrams(col("__toks"))).as("__bg"))
        .select(split(col("__bg"), " ").as("__p"))
        .select(col("__p").getItem(0).as("a"), col("__p").getItem(1).as("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("n_ab"))
        .localCheckpoint() // feeds the left, right, and grand-total rollups
      val ca = all.groupBy("a").agg(sum(col("n_ab")).as("__ca"))
      val cb = all.groupBy("b").agg(sum(col("n_ab")).as("__cb"))
      val n = all.agg(sum(col("n_ab")).as("__n"))
      all.where(col("n_ab") >= 5)
        .join(ca, Seq("a")).join(cb, Seq("b"))
        .crossJoin(broadcast(n))
        .select(col("a"), col("b"), col("n_ab"),
          round(log((col("n_ab").cast("double") * col("__n").cast("double")) /
            (col("__ca").cast("double") * col("__cb").cast("double"))) * lit(1e6), 0)
            .cast("long").as("pmi_micro"))
        .orderBy(col("pmi_micro").desc, col("a"), col("b"))
        .limit(20)
    }),

    // Q-PIPE8 (round 7): the RAG-ingestion pipeline end-to-end — chunk
    // the corpus (the q_txt7 grain), embed every chunk with a
    // feature-hashed bag-of-words vector (64 dims; the hashing trick with
    // a DELIBERATELY SQL-expressible token hash — ascii/length
    // arithmetic, not xxhash, so the whole pipeline stays oracle-exact),
    // and retrieve the top-3 chunks per standing query by exact cosine.
    // The dim join is postings-shaped (queries broadcast); integer dot
    // products and norms, one division + sqrts per pair => hash-exact.
    "q_pipe8" -> ((s, d) => {
      import s.implicits._
      def dimOf(t: Column): Column =
        pmod(ascii(substring(t, 1, 1)) * lit(31) +
          ascii(substring(t, 2, 1)) * lit(7) + length(t), lit(64))
      def vecs(df: DataFrame, idCol: String, textCol: String, cntName: String) =
        df.select(col(idCol), explode(TextOps.tokens(col(textCol))).as("__t"))
          .select(col(idCol), dimOf(col("__t")).as("dim"))
          .groupBy(idCol, "dim").agg(count(lit(1)).as(cntName))
      val chunks = Tables.load(s, d, "documents")
        .select(col("doc_id"),
          posexplode(TextOps.chunks(col("text"), chunkChars = 200, overlap = 50))
            .as(Seq("chunk_idx", "chunk")))
        .select((col("doc_id") * 1000 + col("chunk_idx")).as("chunk_id"),
          col("chunk"))
      // feeds BOTH the norms and the dot products — one chunk+tokenize
      // pass over the corpus, not one per consumer
      val cvec = vecs(chunks, "chunk_id", "chunk", "cnt").localCheckpoint()
      val qdf = Seq((1L, "fast hash join"), (2L, "table scan slow"),
        (3L, "merge sort window")).toDF("query_id", "qtext")
      val qvec = vecs(qdf, "query_id", "qtext", "qcnt")
      val cn = cvec.groupBy("chunk_id").agg(sum(col("cnt") * col("cnt")).as("__c2"))
      val qn = qvec.groupBy("query_id").agg(sum(col("qcnt") * col("qcnt")).as("__q2"))
      val dot = cvec.join(broadcast(qvec), Seq("dim"))
        .groupBy("query_id", "chunk_id")
        .agg(sum(col("cnt") * col("qcnt")).as("__dot"))
      val pick = org.apache.spark.sql.expressions.Window.partitionBy("query_id")
        .orderBy(col("sim").desc, col("chunk_id").asc)
      dot.join(cn, Seq("chunk_id")).join(broadcast(qn), Seq("query_id"))
        .select(col("query_id"), col("chunk_id"),
          (col("__dot").cast("double") /
            (sqrt(col("__c2").cast("double")) * sqrt(col("__q2").cast("double"))))
            .as("sim"))
        .withColumn("rn", row_number().over(pick)).where(col("rn") <= 3)
        .withColumn("rn", col("rn").cast("long"))
        .orderBy("query_id", "rn")
    }),

    // Q-TXT36 (round 7): classifier evaluation on-cluster — per-class
    // precision/recall/F1 of the q_txt33 domain classifier from exact
    // integer tp/fp/fn counts (one aggregation over the prediction
    // table); P and R are single exact-operand divisions and F1 chains
    // IEEE ops on identical doubles => hash-exact. Classes with no
    // predictions (P undefined) or no members (R undefined) null out.
    "q_txt36" -> ((s, d) => {
      val docs = Tables.load(s, d, "documents")
      val pred = TextOps.domainClassify(
        docs.where(pmod(col("doc_id"), lit(2)) === 0),
        docs.where(pmod(col("doc_id"), lit(2)) === 1),
        "doc_id", "text", "source").localCheckpoint()
      val classes = pred.select(col("actual").as("cls"))
        .union(pred.select(col("predicted").as("cls"))).distinct()
      val tp = pred.where(col("actual") === col("predicted"))
        .groupBy(col("actual").as("cls")).agg(count(lit(1)).as("tp"))
      val np = pred.groupBy(col("predicted").as("cls"))
        .agg(count(lit(1)).as("n_pred"))
      val na = pred.groupBy(col("actual").as("cls"))
        .agg(count(lit(1)).as("n_actual"))
      val joined = classes
        .join(tp, Seq("cls"), "left_outer")
        .join(np, Seq("cls"), "left_outer")
        .join(na, Seq("cls"), "left_outer")
        .select(col("cls"), coalesce(col("tp"), lit(0L)).as("tp"),
          coalesce(col("n_pred"), lit(0L)).as("n_pred"),
          coalesce(col("n_actual"), lit(0L)).as("n_actual"))
      val p = when(col("n_pred") > 0,
        col("tp").cast("double") / col("n_pred").cast("double"))
      val r = when(col("n_actual") > 0,
        col("tp").cast("double") / col("n_actual").cast("double"))
      joined.select(col("cls"), col("tp"), col("n_pred"), col("n_actual"),
          p.as("precision"), r.as("recall"),
          when(p.isNotNull && r.isNotNull && (p + r) > 0,
            lit(2.0) * p * r / (p + r)).as("f1"))
        .orderBy("cls")
    }),

    // Q-TXT26: Unicode NFC normalization (native codegen'd expression —
    // Spark has no built-in). The fixture text is pure ASCII, so a
    // deterministic base+combining-mark suffix is appended per doc (the
    // same generator chain on both sides); NFC then composes it into the
    // precomposed letter wherever one exists — every (base, mark) combo
    // composes EXCEPT base 'q', which Unicode has no precomposed form for,
    // so the 'q' docs keep their length and pin the don't-compose case.
    "q_txt26" -> ((s, d) => {
      val bases = array(lit("e"), lit("a"), lit("u"), lit("o"), lit("q"))
      val marks = array(lit("\u0301"), lit("\u0300"), lit("\u0308"), lit("\u0303"))
      val decorated = concat(substring(col("text"), 1, 40), lit(" "),
        element_at(bases, (col("doc_id") % 5).cast("int") + 1),
        element_at(marks, (col("doc_id") % 4).cast("int") + 1))
      Tables.load(s, d, "documents")
        .select(col("doc_id"), decorated.as("__raw"))
        .select(col("doc_id"),
          graft.functions.NfcNormalize(col("__raw")).as("norm_text"),
          length(col("__raw")).cast("long").as("n_raw"))
        .withColumn("n_nfc", length(col("norm_text")).cast("long"))
        .withColumn("composed", col("n_nfc") < col("n_raw"))
        .orderBy("doc_id")
    }),

    // Q-TXT27: accent/case/whitespace canonical grouping — three variants
    // of a shared base (raw; uppercased + accent-decorated; whitespace-
    // inflated) collapse to ONE canonical form under
    // strip_accents(lower(trim(collapse_ws(x)))), the fuzzy-dedup
    // canonical key. Groups of 3 consecutive docs share the leader's text.
    "q_txt27" -> ((s, d) => {
      val docs = Tables.load(s, d, "documents")
      val leaders = docs.where(col("doc_id") % 3 === 0)
        .select(col("doc_id").as("leader_id"),
          substring(col("text"), 1, 60).as("base"))
      val v = docs
        .select(col("doc_id"), (col("doc_id") % 3).as("m"),
          (col("doc_id") - col("doc_id") % 3).as("leader_id"))
        .join(leaders, Seq("leader_id"))
        .select(col("doc_id"),
          when(col("m") === 0, col("base"))
            .when(col("m") === 1,
              translate(upper(col("base")), "AEO", "\u00C1\u00C9\u00D3"))
            .otherwise(regexp_replace(col("base"), " ", "   ")).as("variant"))
      val canon = graft.functions.StripAccents(
        lower(trim(regexp_replace(col("variant"), "\\s+", " "))))
      v.select(col("doc_id"), col("variant"), canon.as("canon"))
        .groupBy("canon")
        .agg(count(lit(1)).as("n_docs"), min("doc_id").as("min_doc"),
          max("doc_id").as("max_doc"),
          countDistinct(col("variant")).as("n_variants"))
        .orderBy("min_doc")
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "q_pipe7" ->
      s"""WITH nt AS (SELECT CAST(len($tokSql) AS BIGINT) AS n FROM documents),
         |ls AS (SELECT * FROM (VALUES (CAST(32 AS BIGINT)), (64), (128), (256))
         |       AS v(seq_len)),
         |pad AS (SELECT seq_len, n,
         |    n + ((seq_len - (n % seq_len)) % seq_len) AS padded
         |  FROM nt, ls),
         |ag AS (SELECT seq_len, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(SUM(n) AS BIGINT) AS total_tokens,
         |    CAST(SUM(padded) AS BIGINT) AS padded_tokens
         |  FROM pad GROUP BY seq_len)
         |SELECT seq_len, n_docs, total_tokens, padded_tokens,
         |  CAST(padded_tokens - total_tokens AS DOUBLE) /
         |    CAST(padded_tokens AS DOUBLE) AS waste_frac
         |FROM ag ORDER BY seq_len""".stripMargin,
    "q_txt31" ->
      s"""WITH tf AS (SELECT source, t.w AS term, CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM (SELECT source, $tokSql AS toks FROM documents), unnest(toks) AS t(w)
         |  GROUP BY source, term),
         |r AS (SELECT source, term, cnt,
         |    CAST(row_number() OVER (PARTITION BY source
         |      ORDER BY cnt DESC, term) AS BIGINT) AS rank FROM tf),
         |xy AS (SELECT source,
         |    CAST(round(ln(CAST(rank AS DOUBLE)) * 1000000.0, 0) AS BIGINT) AS x,
         |    CAST(round(ln(CAST(cnt AS DOUBLE)) * 1000000.0, 0) AS BIGINT) AS y
         |  FROM r WHERE rank <= 100),
         |a AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_terms,
         |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         |    CAST(SUM(x*y) AS BIGINT) AS sxy, CAST(SUM(x*x) AS BIGINT) AS sxx
         |  FROM xy GROUP BY source)
         |SELECT source, n_terms,
         |  CAST(n_terms*sxy - sx*sy AS DOUBLE) /
         |    CAST(nullif(n_terms*sxx - sx*sx, 0) AS DOUBLE) AS zipf_slope
         |FROM a ORDER BY source""".stripMargin,
    "q_txt32" ->
      s"""WITH sc AS (SELECT doc_id,
         |    CAST(len($tokSql) AS BIGINT) AS nt,
         |    ${Shared.qualityScoreMicroSql} AS score
         |  FROM documents),
         |ts AS (SELECT * FROM (VALUES (CAST(350000 AS BIGINT)), (400000),
         |       (450000), (500000), (550000)) AS v(threshold)),
         |ag AS (SELECT threshold,
         |    CAST(SUM(CASE WHEN score IS NOT NULL AND score >= threshold
         |             THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |    CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(SUM(CASE WHEN score IS NOT NULL AND score >= threshold
         |             THEN nt ELSE 0 END) AS BIGINT) AS kept_tokens,
         |    CAST(SUM(nt) AS BIGINT) AS total_tokens
         |  FROM sc, ts GROUP BY threshold)
         |SELECT threshold, n_kept,
         |  CAST(n_kept AS DOUBLE) / CAST(n_docs AS DOUBLE) AS frac_docs,
         |  kept_tokens,
         |  CAST(kept_tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE) AS frac_tokens
         |FROM ag ORDER BY threshold""".stripMargin,
    "q_pipe8" -> {
      def tok(c: String) =
        s"""list_filter(regexp_split_to_array(lower(trim($c)), '\\s+'), x -> length(x) > 0)"""
      def dim(t: String) =
        s"(ascii(substring($t,1,1))*31 + ascii(substring($t,2,1))*7 + length($t)) % 64"
      s"""WITH ch AS (
         |  SELECT doc_id*1000 + CAST((t.s - 1) / 150 AS BIGINT) AS chunk_id,
         |    substring(text, CAST(t.s AS INT), 200) AS chunk
         |  FROM documents, unnest(range(1, greatest(length(text) - 50, 1) + 1, 150)) AS t(s)),
         |ct AS (SELECT chunk_id, unnest(${tok("chunk")}) AS t FROM ch),
         |cv AS (SELECT chunk_id, ${dim("t")} AS dim, CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM ct GROUP BY 1, 2),
         |q AS (SELECT * FROM (VALUES (CAST(1 AS BIGINT), 'fast hash join'),
         |       (2, 'table scan slow'), (3, 'merge sort window')) v(query_id, qtext)),
         |qt AS (SELECT query_id, unnest(${tok("qtext")}) AS t FROM q),
         |qv AS (SELECT query_id, ${dim("t")} AS dim, CAST(COUNT(*) AS BIGINT) AS qcnt
         |  FROM qt GROUP BY 1, 2),
         |cn AS (SELECT chunk_id, SUM(cnt*cnt) AS c2 FROM cv GROUP BY 1),
         |qn AS (SELECT query_id, SUM(qcnt*qcnt) AS q2 FROM qv GROUP BY 1),
         |dt AS (SELECT qv.query_id, cv.chunk_id, SUM(cv.cnt*qv.qcnt) AS dot
         |  FROM cv JOIN qv USING (dim) GROUP BY 1, 2),
         |sc AS (SELECT dt.query_id, dt.chunk_id,
         |    CAST(dot AS DOUBLE)/(sqrt(CAST(c2 AS DOUBLE))*sqrt(CAST(q2 AS DOUBLE))) AS sim
         |  FROM dt JOIN cn ON cn.chunk_id = dt.chunk_id
         |  JOIN qn ON qn.query_id = dt.query_id)
         |SELECT query_id, chunk_id, sim, rn FROM (
         |  SELECT sc.*, row_number() OVER (PARTITION BY query_id
         |      ORDER BY sim DESC, chunk_id) AS rn FROM sc)
         |WHERE rn <= 3 ORDER BY query_id, rn""".stripMargin
    },
    "q_txt36" ->
      s"""WITH tr AS (SELECT source AS lab, unnest($tokSql) AS t
         |  FROM documents WHERE doc_id % 2 = 0),
         |w AS (SELECT t, lab, COUNT(*) AS w FROM tr GROUP BY 1, 2),
         |te AS (SELECT doc_id, unnest($tokSql) AS t
         |  FROM documents WHERE doc_id % 2 = 1),
         |sc AS (SELECT doc_id, lab, SUM(w.w) AS score
         |  FROM te JOIN w USING (t) GROUP BY 1, 2),
         |pr AS (SELECT doc_id, lab FROM (
         |    SELECT doc_id, lab, row_number() OVER (PARTITION BY doc_id
         |        ORDER BY score DESC, lab ASC) AS rn FROM sc)
         |  WHERE rn = 1),
         |pred AS (SELECT b.doc_id, b.actual, coalesce(pr.lab, 'unknown') AS predicted
         |  FROM (SELECT doc_id, source AS actual FROM documents
         |        WHERE doc_id % 2 = 1) b
         |  LEFT JOIN pr ON pr.doc_id = b.doc_id),
         |cls AS (SELECT DISTINCT cls FROM
         |  (SELECT actual AS cls FROM pred UNION ALL SELECT predicted FROM pred)),
         |tp AS (SELECT actual AS cls, CAST(COUNT(*) AS BIGINT) AS tp FROM pred
         |  WHERE actual = predicted GROUP BY 1),
         |np AS (SELECT predicted AS cls, CAST(COUNT(*) AS BIGINT) AS n_pred
         |  FROM pred GROUP BY 1),
         |na AS (SELECT actual AS cls, CAST(COUNT(*) AS BIGINT) AS n_actual
         |  FROM pred GROUP BY 1),
         |j AS (SELECT cls.cls, coalesce(tp.tp, 0) AS tp,
         |    coalesce(np.n_pred, 0) AS n_pred, coalesce(na.n_actual, 0) AS n_actual
         |  FROM cls LEFT JOIN tp USING (cls) LEFT JOIN np USING (cls)
         |  LEFT JOIN na USING (cls)),
         |m AS (SELECT cls, tp, n_pred, n_actual,
         |    CASE WHEN n_pred > 0 THEN CAST(tp AS DOUBLE)/CAST(n_pred AS DOUBLE) END AS p,
         |    CASE WHEN n_actual > 0 THEN CAST(tp AS DOUBLE)/CAST(n_actual AS DOUBLE) END AS r
         |  FROM j)
         |SELECT cls, tp, n_pred, n_actual, p AS precision, r AS recall,
         |  CASE WHEN p IS NOT NULL AND r IS NOT NULL AND (p + r) > 0
         |       THEN 2.0 * p * r / (p + r) END AS f1
         |FROM m ORDER BY cls""".stripMargin,
    "q_txt35" ->
      s"""WITH t AS (SELECT $tokSql AS toks FROM documents),
         |bg AS (SELECT unnest(list_transform(range(2, len(toks) + 1),
         |         i -> toks[i-1] || ' ' || toks[i])) AS bigram FROM t),
         |sp AS (SELECT string_split(bigram, ' ') AS p FROM bg),
         |ab AS (SELECT p[1] AS a, p[2] AS b, CAST(COUNT(*) AS BIGINT) AS n_ab
         |  FROM sp GROUP BY 1, 2),
         |ca AS (SELECT a, SUM(n_ab) AS c FROM ab GROUP BY 1),
         |cb AS (SELECT b, SUM(n_ab) AS c FROM ab GROUP BY 1),
         |n AS (SELECT SUM(n_ab) AS n FROM ab)
         |SELECT ab.a, ab.b, ab.n_ab,
         |  CAST(round(ln((CAST(ab.n_ab AS DOUBLE) * CAST(n.n AS DOUBLE)) /
         |    (CAST(ca.c AS DOUBLE) * CAST(cb.c AS DOUBLE))) * 1e6, 0) AS BIGINT)
         |    AS pmi_micro
         |FROM ab JOIN ca ON ca.a = ab.a JOIN cb ON cb.b = ab.b CROSS JOIN n
         |WHERE ab.n_ab >= 5
         |ORDER BY pmi_micro DESC, ab.a, ab.b LIMIT 20""".stripMargin,
    "q_txt34" ->
      s"""WITH sc AS (SELECT doc_id, source,
         |    CAST(len($tokSql) AS BIGINT) AS nt,
         |    ${Shared.qualityScoreMicroSql} AS q
         |  FROM documents),
         |f AS (SELECT * FROM sc WHERE q IS NOT NULL)
         |SELECT doc_id, source, nt, q FROM f d
         |WHERE NOT EXISTS (SELECT 1 FROM f o
         |  WHERE o.source = d.source AND o.nt > d.nt AND o.q > d.q)
         |ORDER BY doc_id""".stripMargin,
    "q_txt33" ->
      s"""WITH tr AS (SELECT source AS lab, unnest($tokSql) AS t
         |  FROM documents WHERE doc_id % 2 = 0),
         |w AS (SELECT t, lab, COUNT(*) AS w FROM tr GROUP BY 1, 2),
         |te AS (SELECT doc_id, unnest($tokSql) AS t
         |  FROM documents WHERE doc_id % 2 = 1),
         |sc AS (SELECT doc_id, lab, SUM(w.w) AS score
         |  FROM te JOIN w USING (t) GROUP BY 1, 2),
         |pr AS (SELECT doc_id, lab FROM (
         |    SELECT doc_id, lab, row_number() OVER (PARTITION BY doc_id
         |        ORDER BY score DESC, lab ASC) AS rn FROM sc)
         |  WHERE rn = 1),
         |base AS (SELECT doc_id, source AS actual FROM documents
         |  WHERE doc_id % 2 = 1)
         |SELECT base.actual, coalesce(pr.lab, 'unknown') AS predicted,
         |  CAST(COUNT(*) AS BIGINT) AS n
         |FROM base LEFT JOIN pr ON pr.doc_id = base.doc_id
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_txt26" ->
      """SELECT doc_id, norm_text, n_raw,
        |  CAST(length(norm_text) AS BIGINT) AS n_nfc,
        |  (CAST(length(norm_text) AS BIGINT) < n_raw) AS composed
        |FROM (
        |  SELECT doc_id, nfc_normalize(raw) AS norm_text,
        |         CAST(length(raw) AS BIGINT) AS n_raw
        |  FROM (SELECT doc_id,
        |          substring(text, 1, 40) || ' ' ||
        |          (['e','a','u','o','q'])[CAST(doc_id % 5 AS INT) + 1] ||
        |          ([chr(769), chr(768), chr(776), chr(771)])[CAST(doc_id % 4 AS INT) + 1]
        |          AS raw
        |        FROM documents))
        |ORDER BY doc_id""".stripMargin,
    "q_txt27" ->
      """WITH leaders AS (
        |  SELECT doc_id AS leader_id, substring(text, 1, 60) AS base
        |  FROM documents WHERE doc_id % 3 = 0),
        |v AS (SELECT d.doc_id,
        |        CASE CAST(d.doc_id % 3 AS INT)
        |          WHEN 0 THEN l.base
        |          WHEN 1 THEN translate(upper(l.base),
        |                        'AEO', chr(193) || chr(201) || chr(211))
        |          ELSE replace(l.base, ' ', '   ') END AS variant
        |      FROM documents d
        |      JOIN leaders l ON l.leader_id = d.doc_id - d.doc_id % 3),
        |c AS (SELECT doc_id, variant,
        |        strip_accents(lower(trim(regexp_replace(variant, '\s+', ' ', 'g'))))
        |          AS canon
        |      FROM v)
        |SELECT canon, CAST(COUNT(*) AS BIGINT) AS n_docs, MIN(doc_id) AS min_doc,
        |       MAX(doc_id) AS max_doc,
        |       CAST(COUNT(DISTINCT variant) AS BIGINT) AS n_variants
        |FROM c GROUP BY canon ORDER BY min_doc""".stripMargin,
    "q_txt1" ->
      s"""SELECT w, COUNT(*) AS n
         |FROM (SELECT unnest($tokSql) AS w FROM documents)
         |GROUP BY w ORDER BY n DESC, w""".stripMargin,
    "q_txt2" ->
      s"""SELECT lang, COUNT(*) AS n_docs,
         |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
         |  CAST(SUM(CAST(len($tokSql) AS BIGINT)) AS BIGINT) AS sum_words
         |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q_txt3" -> {
      val scoreExprs = TextOps.langMarkers.map { case (l, ms) =>
        s"CAST(len(list_filter(toks, x -> x IN ${inList(ms)})) AS BIGINT) AS s_$l"
      }.mkString(",\n  ")
      val langs = TextOps.langMarkers.map(_._1).sorted
      val cases = langs.dropRight(1).map { l =>
        val conds = langs.filter(_ != l).map(o => s"s_$l >= s_$o").mkString(" AND ")
        s"WHEN $conds THEN '$l'"
      }.mkString("\n    ")
      s"""WITH t AS (SELECT doc_id, lang, $tokSql AS toks FROM documents),
         |sc AS (SELECT doc_id, lang,
         |  $scoreExprs
         |FROM t)
         |SELECT doc_id, s_de, s_en, s_es, s_fr, s_zh, pred_lang, (pred_lang = lang) AS is_match
         |FROM (SELECT *, CASE
         |    $cases
         |    ELSE '${langs.last}' END AS pred_lang FROM sc)
         |ORDER BY doc_id""".stripMargin
    },
    "q_txt4" ->
      s"""WITH t AS (SELECT doc_id, text, n_chars, CAST(len($tokSql) AS BIGINT) AS n_words FROM documents)
         |SELECT doc_id, n_chars, n_words,
         |  round(CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE) / nullif(CAST(n_words AS DOUBLE), 0.0), 6) AS mean_wlen,
         |  round(CAST(len(list_filter($tokSql, x -> x IN ${inList(TextOps.langMarkers.toMap.apply("en"))})) AS DOUBLE) / nullif(CAST(n_words AS DOUBLE), 0.0), 6) AS stop_ratio,
         |  round(CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) / nullif(CAST(length(text) AS DOUBLE), 0.0), 6) AS digit_ratio
         |FROM t ORDER BY doc_id""".stripMargin,
    "q_txt5" ->
      s"""SELECT doc_id,
         |  CAST(len($tokSql) AS BIGINT) AS n_ws_tokens,
         |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_bpe_tokens,
         |  CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_chars_tokens
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q_txt7" ->
      """WITH c AS (
        |  SELECT doc_id, t.s AS s, substring(text, CAST(t.s AS INT), 200) AS chunk
        |  FROM documents, unnest(range(1, greatest(length(text) - 50, 1) + 1, 150)) AS t(s))
        |SELECT doc_id, CAST((s - 1) / 150 AS BIGINT) AS chunk_idx, chunk
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
    "q_txt10" ->
      s"""WITH t AS (SELECT doc_id, lang, CAST(len($tokSql) AS BIGINT) AS n_tok FROM documents),
         |st AS (SELECT lang,
         |         CAST(SUM(n_tok) AS DOUBLE) AS s,
         |         CAST(SUM(n_tok * n_tok) AS DOUBLE) AS sq,
         |         CAST(COUNT(*) AS DOUBLE) AS n
         |       FROM t GROUP BY lang)
         |SELECT t.doc_id, t.lang, t.n_tok,
         |  (CAST(t.n_tok AS DOUBLE) - s / n) /
         |    nullif(sqrt(CASE WHEN n > 1.0
         |                     THEN greatest((sq - s * s / n) / (n - 1.0), 0.0)
         |                     ELSE 0.0 END), 0.0) AS z
         |FROM t JOIN st ON t.lang = st.lang
         |ORDER BY t.doc_id""".stripMargin,
    "q_txt8" -> {
      def tok(c: String) =
        s"""list_filter(regexp_split_to_array(lower(trim($c)), '\\s+'), x -> length(x) > 0)"""
      s"""SELECT a.doc_id,
         |  CAST(len(list_intersect(list_distinct(${tok("a.text")}),
         |                          list_distinct(${tok("b.text")}))) AS BIGINT) AS overlap
         |FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
         |ORDER BY a.doc_id""".stripMargin
    },
    "q_txt15" ->
      s"""WITH t AS (SELECT doc_id, text, CAST(len($tokSql) AS BIGINT) AS n_words FROM documents)
         |SELECT doc_id,
         |  n_words >= 30 AS r_words,
         |  (CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE) /
         |     nullif(CAST(n_words AS DOUBLE), 0.0)) BETWEEN 3.0 AND 10.0 AS r_wlen,
         |  (CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) /
         |     nullif(CAST(length(text) AS DOUBLE), 0.0)) <= 0.2 AS r_digit,
         |  (n_words >= 30) AND
         |  ((CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE) /
         |      nullif(CAST(n_words AS DOUBLE), 0.0)) BETWEEN 3.0 AND 10.0) AND
         |  ((CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) /
         |      nullif(CAST(length(text) AS DOUBLE), 0.0)) <= 0.2) AS keep
         |FROM t ORDER BY doc_id""".stripMargin,
    "q_sample3" ->
      """SELECT doc_id, source, n_chars FROM (
        |  SELECT doc_id, source, n_chars,
        |    row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 5 ORDER BY doc_id""".stripMargin,
    "q_sample4" ->
      s"""SELECT doc_id, n_chars, n_tok, running_total FROM (
         |  SELECT doc_id, n_chars, CAST(len($tokSql) AS BIGINT) AS n_tok,
         |    CAST(SUM(CAST(len($tokSql) AS BIGINT)) OVER (
         |      ORDER BY n_chars DESC, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_total
         |  FROM documents)
         |WHERE running_total <= 10000 ORDER BY doc_id""".stripMargin,
    "q_sample7" ->
      """WITH c AS (
        |  SELECT lang, CAST(ceil(250.0 / COUNT(*)) AS BIGINT) AS k
        |  FROM documents GROUP BY lang),
        |e AS (
        |  SELECT d.doc_id, d.lang,
        |    unnest(generate_series(1, c.k)) AS copy
        |  FROM documents d JOIN c USING (lang)),
        |r AS (
        |  SELECT doc_id, lang, copy,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY copy, ((doc_id % 1000000) * 2654435761) % 1000000, doc_id) AS rk
        |  FROM e)
        |SELECT doc_id, lang, copy FROM r WHERE rk <= 250
        |ORDER BY lang, doc_id, copy""".stripMargin,
    // Karp-Rabin fingerprint replayed from scratch: xxhash64 of every
    // distinct token re-derived by the string-hash chain, then the fold
    // acc' = (acc*131 + pmod(h, 2^31-1)) % (2^31-1) stepped as a
    // recursive CTE over token positions (working set: one row per doc
    // per level; every value a nonnegative exact integer). Empty token
    // lists fingerprint to the fold seed 0 on both engines.
    "q_txt6" ->
      s"""WITH RECURSIVE
         |doc AS MATERIALIZED (SELECT doc_id, $tokSql AS toks FROM documents),
         |pos AS MATERIALIZED (
         |  SELECT doc_id, CAST(r.i AS BIGINT) AS p, toks[r.i] AS s
         |  FROM doc, unnest(range(1, len(toks) + 1)) AS r(i)),
         |str AS MATERIALIZED (SELECT DISTINCT s FROM pos),
         |${XxhashSql.hashStringCtes("str")},
         |ph AS MATERIALIZED (
         |  SELECT pos.doc_id, pos.p,
         |    ((xxh.h % 2147483647) + 2147483647) % 2147483647 AS hm
         |  FROM pos JOIN xxh ON xxh.s = pos.s),
         |dn AS MATERIALIZED (SELECT doc_id, CAST(len(toks) AS BIGINT) AS nt FROM doc),
         |roll AS (
         |  SELECT doc_id, CAST(0 AS BIGINT) AS p, CAST(0 AS BIGINT) AS acc, nt FROM dn
         |  UNION ALL
         |  SELECT r.doc_id, r.p + 1, (r.acc * 131 + ph.hm) % 2147483647, r.nt
         |  FROM roll r JOIN ph ON ph.doc_id = r.doc_id AND ph.p = r.p + 1
         |  WHERE r.p < r.nt)
         |SELECT doc_id, acc AS fingerprint FROM roll WHERE p = nt
         |ORDER BY doc_id""".stripMargin,
    // A-ES weighted sample replayed from scratch: the uniform draw is the
    // key's xxhash64 (XxhashSql.hashLongCte re-derives Spark's
    // XXH64.hashLong in integer SQL), score = ln(u)/w, top-100. ln() is
    // the one transcendental — safe here because only the SELECTED SET is
    // compared (no score column) and the rank-100/101 score gap on the
    // fixture is ~12 orders of magnitude above libm's 1-ulp drift
    // (measured 5e-4 relative vs ~1e-16; CurationSpec pins the margin).
    "q_sample6" -> {
      val hashed = XxhashSql.hashLongCte(
        "SELECT doc_id, lang, n_chars FROM documents WHERE n_chars > 0",
        "doc_id", "hs")
      s"""WITH hsrc AS MATERIALIZED (SELECT doc_id, lang, n_chars, hs FROM $hashed),
         |sc AS (SELECT doc_id, lang, n_chars,
         |    ln((CAST(((hs % 1000000) + 1000000) % 1000000 AS DOUBLE) + 0.5)
         |        / 1000000.0) / CAST(n_chars AS DOUBLE) AS score
         |  FROM hsrc),
         |top AS (SELECT doc_id, lang, n_chars FROM sc
         |        ORDER BY score DESC, doc_id LIMIT 100)
         |SELECT doc_id, lang, n_chars FROM top ORDER BY doc_id""".stripMargin
    },

    "q_sample1" ->
      """SELECT c_custkey,
        |  CASE WHEN ((c_custkey % 1000000) * 2654435761) % 1000000 < 800000 THEN 'train'
        |       WHEN ((c_custkey % 1000000) * 2654435761) % 1000000 < 900000 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_sample2" ->
      """WITH fr(source, frac) AS (VALUES ('src0', CAST(0.5 AS DOUBLE)),
        |                                ('src1', CAST(0.3 AS DOUBLE)),
        |                                ('src2', CAST(0.2 AS DOUBLE))),
        |j AS (SELECT d.source, CAST(COUNT(*) AS DOUBLE) AS n, frac
        |      FROM documents d JOIN fr ON d.source = fr.source
        |      GROUP BY d.source, frac),
        |nt AS (SELECT min(n / frac) AS nt FROM j),
        |rates AS (SELECT source, least(CAST(1.0 AS DOUBLE), frac * nt / n) AS rate
        |          FROM j CROSS JOIN nt)
        |SELECT d.doc_id, d.source FROM documents d JOIN rates r ON d.source = r.source
        |WHERE CAST(((d.doc_id % 1000000) * 2654435761) % 1000000 AS DOUBLE) / 1e6 < r.rate
        |ORDER BY d.doc_id""".stripMargin,
    "q_sample9" ->
      """SELECT doc_id, epoch,
        |  ((((doc_id % 1000000) * 3 + epoch) % 1000000) * 2654435761) % 1000000 AS shuffle_key
        |FROM documents CROSS JOIN (SELECT unnest(range(0, 3)) AS epoch)
        |ORDER BY epoch, shuffle_key, doc_id""".stripMargin,
    "q_sample8" ->
      """WITH c AS (SELECT source, CAST(COUNT(*) AS DOUBLE) AS n
        |           FROM documents GROUP BY source),
        |w AS (SELECT source, n, round(pow(n, 0.5), 6) AS w FROM c),
        |f AS (SELECT source, n, round(w / (SELECT SUM(w) FROM w), 6) AS f FROM w),
        |nt AS (SELECT min(n / f) AS nt FROM f),
        |rates AS (SELECT source, least(CAST(1.0 AS DOUBLE), f * nt / n) AS rate
        |          FROM f CROSS JOIN nt)
        |SELECT d.doc_id, d.source FROM documents d JOIN rates r USING (source)
        |WHERE CAST(((d.doc_id % 1000000) * 2654435761) % 1000000 AS DOUBLE) / 1e6 < r.rate
        |ORDER BY d.doc_id""".stripMargin,
    "q_dedup1" ->
      """SELECT doc_id, h
        |FROM (SELECT doc_id, sha256(lower(trim(substring(text, 1, 50)))) AS h,
        |        row_number() OVER (PARTITION BY sha256(lower(trim(substring(text, 1, 50)))) ORDER BY doc_id) AS rn
        |      FROM documents)
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "q_dedup6" ->
      s"""${Shared.componentsSql}
         |SELECT e.vec_id, e.label FROM embeddings e
         |WHERE e.vec_id NOT IN (SELECT v FROM comp WHERE v <> component)
         |ORDER BY e.vec_id""".stripMargin,
    "q_dedup7" ->
      s"""${Shared.componentsSql}
         |SELECT v, component FROM comp ORDER BY v""".stripMargin,
    // Round-8 flips (VERDICT r7 "What's missing" #5, extended): the
    // MinHash/SimHash family oracles re-derive Spark's xxhash64 from the
    // fixture text (XxhashSql — see its scaladoc), so the candidate
    // pairs, clusters, incremental arrivals and SimHash pair sets are
    // all hash-compared against a genuine from-scratch recompute.
    "q_dedup2" ->
      s"""WITH RECURSIVE ${XxhashSql.minhashLshCtes(tokSql)}
         |SELECT id_a, id_b FROM cpairs ORDER BY id_a, id_b""".stripMargin,
    // min-reachable-vertex components over the SAME recomputed pair list
    "q_dedup5" ->
      s"""WITH RECURSIVE ${XxhashSql.minhashLshCtes(tokSql)},
         |edges AS (SELECT id_a AS src, id_b AS dst FROM cpairs
         |          UNION SELECT id_b AS src, id_a AS dst FROM cpairs),
         |reach(v, r) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.v),
         |comp AS (SELECT v, min(r) AS component FROM reach GROUP BY v)
         |SELECT v, component FROM comp ORDER BY v""".stripMargin,
    // incremental==restricted-full-recompute for the band store: the full
    // corpus pair set restricted to pairs touching the day-2 batch
    // (bands are corpus-independent, so full recompute == stored ∪ new)
    "q_dedup8" ->
      s"""WITH RECURSIVE ${XxhashSql.minhashLshCtes(tokSql)}
         |SELECT id_a, id_b FROM cpairs
         |WHERE id_a % 5 = 0 OR id_b % 5 = 0
         |ORDER BY id_a, id_b""".stripMargin,
    // SimHash 16-bit-chunk pigeonhole candidates at the recall-lossy
    // hamming<=16 operating point: pairs sharing >= 1 chunk AND within
    // the bound — exactly the operator's candidate semantics
    "q_dedup3" ->
      s"""WITH RECURSIVE ${XxhashSql.simhashCtes(tokSql)},
         |chunks AS MATERIALIZED (
         |  SELECT doc_id, simhash, CAST(r.range AS INTEGER) AS c,
         |    (shu // (CASE r.range WHEN 0 THEN 1 WHEN 1 THEN 65536
         |             WHEN 2 THEN 4294967296 ELSE 281474976710656 END)) % 65536 AS cv
         |  FROM sh, range(0, 4) r)
         |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
         |FROM chunks a JOIN chunks b
         |  ON a.c = b.c AND a.cv = b.cv AND a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 16
         |ORDER BY id_a, id_b""".stripMargin,
    // the wide Manku tables are an EXACT pigeonhole at hamming<=3, so the
    // oracle is the brute-force pair set over the recomputed simhashes
    "q_dedup12" ->
      s"""WITH RECURSIVE ${XxhashSql.simhashCtes(tokSql)}
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
         |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
         |ORDER BY id_a, id_b""".stripMargin,
    // The incremental==restricted-full-recompute contract, literally: the
    // full within-cell cosine pair set, restricted to pairs touching the
    // day-2 batch — exactly what the store-served incremental join must
    // emit.
    "q_dedup21" ->
      s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b
         |FROM embeddings a JOIN embeddings b
         |  ON a.label = b.label AND a.vec_id < b.vec_id
         |WHERE round(${Shared.cosSql("a.embedding", "b.embedding")}, 6) >= 0.3
         |  AND (a.vec_id % 5 = 0 OR b.vec_id % 5 = 0)
         |ORDER BY id_a, id_b""".stripMargin,
    "q_dedup4" ->
      s"""WITH t AS (SELECT doc_id, lang, $tokSql AS toks FROM documents),
         |sh AS (SELECT doc_id, lang,
         |         unnest(list_distinct(list_transform(range(1, len(toks) - 1),
         |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS s
         |       FROM t WHERE len(toks) >= 3),
         |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
         |          FROM sh a JOIN sh b ON a.lang = b.lang AND a.s = b.s AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2)
         |SELECT id_a, id_b,
         |  CAST(i AS DOUBLE) / CAST(sa.sz + sb.sz - i AS DOUBLE) AS jaccard
         |FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
         |WHERE CAST(i AS DOUBLE) / CAST(sa.sz + sb.sz - i AS DOUBLE) >= 0.05
         |ORDER BY id_a, id_b""".stripMargin,
    "q_dedup10" ->
      graft.operators.SpanDedup.duplicatedSpansSql(tokSql, shingleN = 4, minSpanTokens = 12),
    "q_dedup11" ->
      s"""WITH RECURSIVE ${graft.operators.SpanDedup.spanCtes(tokSql, 4, 12)},
         |pairs AS (SELECT DISTINCT id_a, id_b FROM spans),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |          UNION SELECT id_b AS src, id_a AS dst FROM pairs),
         |reach(v, r) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.v),
         |comp AS (SELECT v, min(r) AS component FROM reach GROUP BY v)
         |SELECT cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters FROM
         |  (SELECT component, CAST(COUNT(*) AS BIGINT) AS cluster_size
         |   FROM comp GROUP BY component)
         |GROUP BY cluster_size ORDER BY cluster_size""".stripMargin,
    "q_dedup14" ->
      """SELECT CAST(i AS DOUBLE) / 20.0 AS jaccard,
        |  round(1.0 - pow(1.0 - pow(CAST(i AS DOUBLE) / 20.0, 4.0), 8.0), 6) AS p_collide
        |FROM (SELECT unnest(range(1, 20)) AS i) ORDER BY jaccard""".stripMargin,
    "q_txt24" ->
      s"""WITH wc AS (SELECT w, COUNT(*) AS cnt
         |  FROM (SELECT unnest($tokSql) AS w FROM documents) GROUP BY 1),
         |tot AS (SELECT SUM(cnt) AS total FROM wc),
         |top AS (SELECT w, cnt FROM wc ORDER BY cnt DESC, w LIMIT 50)
         |SELECT CAST(row_number() OVER (ORDER BY cnt DESC, w) AS BIGINT) AS rank,
         |  w, CAST(cnt AS BIGINT) AS cnt,
         |  CAST(SUM(cnt) OVER (ORDER BY cnt DESC, w ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cnt,
         |  CAST(SUM(cnt) OVER (ORDER BY cnt DESC, w ROWS UNBOUNDED PRECEDING) AS DOUBLE)
         |    / CAST(total AS DOUBLE) AS cum_coverage
         |FROM top CROSS JOIN tot ORDER BY rank""".stripMargin,
    "q_dedup13" ->
      s"""WITH RECURSIVE ${graft.operators.SpanDedup.spanCtes(tokSql, 4, 12)},
         |pairs AS (SELECT DISTINCT id_a, id_b FROM spans),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |          UNION SELECT id_b AS src, id_a AS dst FROM pairs),
         |reach(v, r) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.v),
         |comp AS (SELECT v, min(r) AS component FROM reach GROUP BY v),
         |dc AS (SELECT d.doc_id, d.n_chars,
         |    COALESCE(c.component, d.doc_id) AS comp
         |  FROM documents d LEFT JOIN comp c ON c.v = d.doc_id)
         |SELECT doc_id, n_chars FROM (
         |  SELECT doc_id, n_chars, row_number() OVER (PARTITION BY comp
         |    ORDER BY n_chars DESC, doc_id) AS rn FROM dc)
         |WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "q_txt18" ->
      s"""WITH t AS (SELECT lang, $tokSql AS toks FROM documents),
         |bg AS (SELECT lang, unnest(list_transform(range(2, len(toks) + 1),
         |         i -> toks[i-1] || ' ' || toks[i])) AS bigram FROM t),
         |c AS (SELECT lang, bigram, COUNT(*) AS n FROM bg GROUP BY 1, 2)
         |SELECT lang, bigram, n FROM (
         |  SELECT *, row_number() OVER (PARTITION BY lang
         |    ORDER BY n DESC, bigram) AS rn FROM c)
         |WHERE rn <= 15 ORDER BY lang, bigram""".stripMargin,
    "q_txt17" ->
      s"""WITH t AS (SELECT doc_id, $tokSql AS toks FROM documents),
         |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 1),
         |         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS s
         |       FROM t WHERE len(toks) >= 3),
         |fl AS (SELECT s, max(CASE WHEN doc_id % 10 <> 0 THEN 1 ELSE 0 END) AS a,
         |              max(CASE WHEN doc_id % 10 = 0 THEN 1 ELSE 0 END) AS b
         |       FROM sh GROUP BY s)
         |SELECT CAST(SUM(a) AS BIGINT) AS n_train_shingles,
         |  CAST(SUM(b) AS BIGINT) AS n_eval_shingles,
         |  CAST(SUM(a * b) AS BIGINT) AS n_shared,
         |  CAST(SUM(a * b) AS DOUBLE) /
         |    CAST(SUM(a) + SUM(b) - SUM(a * b) AS DOUBLE) AS jaccard
         |FROM fl""".stripMargin,
    "q_txt16" ->
      s"""WITH t AS (SELECT doc_id, $tokSql AS toks FROM documents),
         |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 1),
         |         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS s
         |       FROM t WHERE len(toks) >= 3)
         |SELECT s, CAST(COUNT(*) AS BIGINT) AS df FROM sh GROUP BY s
         |HAVING COUNT(*) >= 5 ORDER BY df DESC, s""".stripMargin,
    "q_txt11" ->
      s"""WITH t AS (SELECT doc_id, $tokSql AS toks FROM documents),
         |sh AS (SELECT doc_id,
         |         unnest(list_distinct(list_transform(range(1, len(toks) - 1),
         |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS s
         |       FROM t WHERE len(toks) >= 3),
         |tr AS (SELECT DISTINCT s FROM sh WHERE doc_id % 10 <> 0),
         |ev AS (SELECT doc_id, s FROM sh WHERE doc_id % 10 = 0)
         |SELECT ev.doc_id, COUNT(*) AS n_shingles,
         |  CAST(SUM(CASE WHEN tr.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
         |  CAST(SUM(CASE WHEN tr.s IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         |    / CAST(COUNT(*) AS DOUBLE) AS contamination
         |FROM ev LEFT JOIN tr ON ev.s = tr.s
         |GROUP BY ev.doc_id ORDER BY ev.doc_id""".stripMargin,
    "q_txt12" ->
      s"""WITH t AS (SELECT doc_id, $tokSql AS toks FROM documents),
         |base AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 2),
         |perdoc AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_words,
         |             CAST(len(list_distinct(toks)) AS BIGINT) AS nd FROM base),
         |bg AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
         |         i -> toks[i] || ' ' || toks[i+1])) AS s FROM base),
         |top AS (SELECT doc_id, max(c) AS top_n, CAST(SUM(c) AS BIGINT) AS n_bg
         |        FROM (SELECT doc_id, s, COUNT(*) AS c FROM bg GROUP BY 1, 2)
         |        GROUP BY doc_id)
         |SELECT p.doc_id, n_words,
         |  CAST(1 AS DOUBLE) - CAST(nd AS DOUBLE) / CAST(n_words AS DOUBLE) AS dup_word_frac,
         |  CAST(top_n AS DOUBLE) / CAST(n_bg AS DOUBLE) AS top_bigram_frac
         |FROM perdoc p JOIN top USING (doc_id) ORDER BY p.doc_id""".stripMargin,
    "q_txt14" ->
      s"""WITH toks AS (SELECT doc_id, unnest($tokSql) AS term FROM documents),
         |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
         |dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT COUNT(*) AS n_docs FROM documents),
         |scored AS (SELECT doc_id, term,
         |  round(tf * ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)), 6) AS score
         |  FROM tf JOIN dft USING (term) CROSS JOIN n),
         |rk AS (SELECT doc_id, term, score,
         |  row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rk
         |  FROM scored)
         |SELECT doc_id, term, score FROM rk WHERE rk <= 3
         |ORDER BY doc_id, score DESC, term""".stripMargin,
    "q_txt19" ->
      s"""WITH toks AS (SELECT doc_id, doc_id % 10 <> 0 AS is_lm,
         |         unnest($tokSql) AS w FROM documents),
         |tf AS (SELECT doc_id, is_lm, w, COUNT(*) AS tf FROM toks GROUP BY 1, 2, 3),
         |lm AS (SELECT w, SUM(tf) AS cnt FROM tf WHERE is_lm GROUP BY 1),
         |tot AS (SELECT SUM(cnt) AS n_lm, COUNT(*) AS v_lm FROM lm),
         |s AS (SELECT doc_id, tf,
         |    CAST(round(ln(CAST(n_lm + v_lm AS DOUBLE) /
         |      CAST(COALESCE(cnt, 0) + 1 AS DOUBLE)) * 1e6, 0) AS BIGINT) * tf AS s
         |  FROM tf LEFT JOIN lm USING (w) CROSS JOIN tot)
         |SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
         |  CAST(SUM(s) AS BIGINT) AS nll_micro,
         |  CAST(SUM(s) AS DOUBLE) / 1e6 / CAST(SUM(tf) AS DOUBLE) AS avg_nll
         |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_txt20" ->
      s"""WITH toks AS (SELECT source, unnest($tokSql) AS w FROM documents),
         |sw AS (SELECT source, w, COUNT(*) AS csw FROM toks GROUP BY 1, 2),
         |cw AS (SELECT w, SUM(csw) AS cw FROM sw GROUP BY 1),
         |ns AS (SELECT source, SUM(csw) AS ns FROM sw GROUP BY 1),
         |n AS (SELECT SUM(csw) AS n FROM sw),
         |t AS (SELECT sw.source,
         |    CAST(round(ln((CAST(csw AS DOUBLE) * CAST(n AS DOUBLE)) /
         |      (CAST(cw AS DOUBLE) * CAST(ns AS DOUBLE))) * 1e6, 0) AS BIGINT) * csw AS t,
         |    ns
         |  FROM sw JOIN cw USING (w) JOIN ns ON sw.source = ns.source CROSS JOIN n)
         |SELECT source, CAST(max(ns) AS BIGINT) AS n_tokens,
         |  CAST(SUM(t) AS BIGINT) AS kl_micro,
         |  CAST(SUM(t) AS DOUBLE) / 1e6 / CAST(max(ns) AS DOUBLE) AS kl
         |FROM t GROUP BY source ORDER BY source""".stripMargin,
    "q_txt21" ->
      s"""WITH tf AS (SELECT doc_id, source = 'src0' AS t, w, COUNT(*) AS tf
         |  FROM (SELECT doc_id, source, unnest($tokSql) AS w FROM documents)
         |  GROUP BY 1, 2, 3),
         |raw AS (SELECT w, SUM(tf) AS cr FROM tf GROUP BY 1),
         |tgt AS (SELECT w, SUM(tf) AS ct FROM tf WHERE t GROUP BY 1),
         |tot AS (SELECT SUM(cr) AS nr, SUM(COALESCE(ct, 0)) AS nt, COUNT(*) AS v
         |  FROM raw LEFT JOIN tgt USING (w)),
         |s AS (SELECT doc_id,
         |    CAST(round(ln((CAST(COALESCE(ct, 0) + 1 AS DOUBLE) * CAST(nr + v AS DOUBLE)) /
         |      (CAST(cr + 1 AS DOUBLE) * CAST(nt + v AS DOUBLE))) * 1e6, 0) AS BIGINT) * tf AS s,
         |    tf
         |  FROM tf JOIN raw USING (w) LEFT JOIN tgt USING (w) CROSS JOIN tot)
         |SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
         |  CAST(SUM(s) AS BIGINT) AS llr_micro,
         |  CAST(SUM(s) AS DOUBLE) / 1e6 / CAST(SUM(tf) AS DOUBLE) AS avg_llr
         |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_txt22" ->
      s"""WITH t AS (SELECT source, $tokSql AS toks FROM documents),
         |uni AS (SELECT source, COUNT(*) AS n_tokens, COUNT(DISTINCT w) AS n_types
         |  FROM (SELECT source, unnest(toks) AS w FROM t) GROUP BY 1),
         |bi AS (SELECT source, COUNT(*) AS n_bigrams,
         |    COUNT(DISTINCT bg) AS n_distinct_bigrams
         |  FROM (SELECT source, unnest(list_transform(range(2, len(toks) + 1),
         |          i -> toks[i-1] || ' ' || toks[i])) AS bg FROM t)
         |  GROUP BY 1)
         |SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens,
         |  CAST(n_types AS BIGINT) AS n_types,
         |  CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS ttr,
         |  CAST(COALESCE(n_bigrams, 0) AS BIGINT) AS n_bigrams,
         |  CAST(COALESCE(n_distinct_bigrams, 0) AS BIGINT) AS n_distinct_bigrams,
         |  CASE WHEN COALESCE(n_bigrams, 0) > 0
         |    THEN CAST(n_distinct_bigrams AS DOUBLE) / CAST(n_bigrams AS DOUBLE) END
         |    AS distinct_bigram_ratio
         |FROM uni LEFT JOIN bi USING (source) ORDER BY source""".stripMargin,
    "q_txt23" ->
      s"""WITH t AS (SELECT source, $tokSql AS toks FROM documents),
         |sh AS (SELECT DISTINCT source,
         |    unnest(list_distinct(list_transform(range(1, len(toks) - 1),
         |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS s
         |  FROM t WHERE len(toks) >= 3),
         |sz AS (SELECT source, COUNT(*) AS n FROM sh GROUP BY 1),
         |ix AS (SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS shared
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.source < b.source GROUP BY 1, 2)
         |SELECT sa.source AS source_a, sb.source AS source_b,
         |  CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
         |  CAST(COALESCE(shared, 0) AS BIGINT) AS n_shared,
         |  CAST(COALESCE(shared, 0) AS DOUBLE) /
         |    CAST(sa.n + sb.n - COALESCE(shared, 0) AS DOUBLE) AS jaccard
         |FROM sz sa JOIN sz sb ON sa.source < sb.source
         |LEFT JOIN ix ON ix.source_a = sa.source AND ix.source_b = sb.source
         |ORDER BY source_a, source_b""".stripMargin,
    "q_pipe2" ->
      s"""WITH t AS (SELECT source, $tokSql AS toks FROM documents),
         |cnt AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1),
         |uw AS (SELECT source, unnest(toks) AS w FROM t),
         |uni AS (SELECT source, COUNT(*) AS n_tokens, COUNT(DISTINCT w) AS n_types
         |  FROM uw GROUP BY 1),
         |bi AS (SELECT source, COUNT(*) AS nb, COUNT(DISTINCT bg) AS ndb
         |  FROM (SELECT source, unnest(list_transform(range(2, len(toks) + 1),
         |          i -> toks[i-1] || ' ' || toks[i])) AS bg FROM t)
         |  GROUP BY 1),
         |sw AS (SELECT source, w, COUNT(*) AS csw FROM uw GROUP BY 1, 2),
         |cw AS (SELECT w, SUM(csw) AS cw FROM sw GROUP BY 1),
         |ns AS (SELECT source, SUM(csw) AS ns FROM sw GROUP BY 1),
         |n AS (SELECT SUM(csw) AS n FROM sw),
         |klt AS (SELECT sw.source,
         |    CAST(round(ln((CAST(csw AS DOUBLE) * CAST(n AS DOUBLE)) /
         |      (CAST(cw AS DOUBLE) * CAST(ns AS DOUBLE))) * 1e6, 0) AS BIGINT) * csw AS kt,
         |    ns
         |  FROM sw JOIN cw USING (w) JOIN ns ON sw.source = ns.source CROSS JOIN n),
         |kl AS (SELECT source,
         |    CAST(SUM(kt) AS DOUBLE) / 1e6 / CAST(max(ns) AS DOUBLE) AS kl
         |  FROM klt GROUP BY source)
         |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
         |  CAST(n_tokens AS BIGINT) AS n_tokens, CAST(n_types AS BIGINT) AS n_types,
         |  CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS ttr,
         |  CASE WHEN COALESCE(nb, 0) > 0
         |    THEN CAST(ndb AS DOUBLE) / CAST(nb AS DOUBLE) END AS distinct_bigram_ratio,
         |  kl
         |FROM cnt JOIN uni USING (source) LEFT JOIN bi USING (source)
         |  JOIN kl USING (source)
         |ORDER BY source""".stripMargin,
    "q_fuzzy3" ->
      """WITH n AS (SELECT DISTINCT lower(p_name) AS name FROM part
        |  WHERE p_name IS NOT NULL)
        |SELECT a.name AS name_a, b.name AS name_b,
        |  CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
        |FROM n a JOIN n b ON a.name < b.name
        |  AND abs(length(a.name) - length(b.name)) <= 2
        |WHERE levenshtein(a.name, b.name) <= 2
        |ORDER BY name_a, name_b""".stripMargin,
    "q_fuzzy1" -> fuzzyJaccardSql,
    // q_fuzzy2 is the SAME output via prefix filtering — one oracle text,
    // two engine paths, both must hash-match it
    "q_fuzzy2" -> fuzzyJaccardSql,
    "q_txt13" ->
      s"""WITH t AS (SELECT doc_id,
         |  text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com or 555-0123 now' AS t
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(t, '${TextOps.emailPattern}')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(t, '${TextOps.phonePattern}')) AS BIGINT) AS n_phones,
         |  regexp_replace(regexp_replace(t, '${TextOps.emailPattern}', '<EMAIL>', 'g'),
         |    '${TextOps.phonePattern}', '<PHONE>', 'g') AS clean
         |FROM t ORDER BY doc_id""".stripMargin,
  )
}
