package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Entity resolution: fuzzy string matching via character-trigram Jaccard
  * — the classic record-linkage join (match "goldenrod lavender spring"
  * against its corrupted/abbreviated variants) without an all-pairs
  * string-distance pass.
  *
  * Shape: each side explodes to its distinct trigram set, candidates are
  * pairs sharing >= 1 trigram (ONE hash-partitioned join on the trigram),
  * and only candidates are scored — exact Jaccard over sorted trigram-hash
  * arrays via the codegen'd SortedLongIntersectCount kernel, the same
  * verify-after-block pattern as the document dedup family. A pair with no
  * shared trigram has Jaccard 0, so the blocking loses nothing above any
  * threshold > 0. Common trigrams fan out (sum over trigram of
  * |left|x|right| within the trigram); at corpus scale drop stop-trigrams
  * (document frequency cap) the way shingle-dedup drops stop-shingles.
  */
object FuzzyJoin {

  /** Distinct character trigrams of a (lowercased) string; strings shorter
    * than 3 chars yield their whole self as the one "trigram". */
  def trigrams(s: Column): Column = {
    val lower0 = lower(s)
    array_distinct(
      when(length(lower0) < 3, array(lower0))
        .otherwise(transform(sequence(lit(1), length(lower0) - 2),
          i => substring(lower0, i, lit(3)))))
  }

  private def prep(df: DataFrame, id: String, text: Column, idOut: String) =
    df.select(col(id).as(idOut),
      sort_array(array_distinct(transform(trigrams(text), g => xxhash64(g)))).as(s"__g_$idOut"))

  /** Exact re-score of the candidate pairs against the full sorted
    * trigram-hash arrays — both blocking strategies funnel through this. */
  private def scoreCandidates(candidates: DataFrame, l: DataFrame, r: DataFrame,
      leftId: String, rightId: String, minSim: Double): DataFrame =
    candidates
      .join(l, Seq("__lid")).join(r, Seq("__rid"))
      .select(col("__lid"), col("__rid"),
        graft.functions.SortedLongIntersectCount(
          col("__g___lid"), col("__g___rid")).as("__i"),
        size(col("__g___lid")).as("__sa"), size(col("__g___rid")).as("__sb"))
      .select(col("__lid").as(leftId), col("__rid").as(rightId),
        (col("__i").cast("double") /
          (col("__sa") + col("__sb") - col("__i")).cast("double")).as("sim"))
      .where(col("sim") >= minSim)

  /** All (left, right) pairs with trigram Jaccard >= minSim.
    * Output: (leftIdCol, rightIdCol, sim). */
  def matchByTrigramJaccard(
      left: DataFrame, leftId: String, leftText: Column,
      right: DataFrame, rightId: String, rightText: Column,
      minSim: Double): DataFrame = {
    // Materialize each side's trigram table once: it feeds BOTH the
    // blocking explode and the verify join — left lazy, the plan computes
    // the whole tokenize->hash->sort prep twice per side (the doubled-
    // sketch trap; same fix as NearDup.lshCandidatePairs).
    val l = prep(left, leftId, leftText, "__lid").localCheckpoint()
    val r = prep(right, rightId, rightText, "__rid").localCheckpoint()
    val lx = l.select(col("__lid"), explode(col("__g___lid")).as("__g"))
    val rx = r.select(col("__rid"), explode(col("__g___rid")).as("__g"))
    val candidates = lx.join(rx, Seq("__g"))
      .select("__lid", "__rid").distinct()
    scoreCandidates(candidates, l, r, leftId, rightId, minSim)
  }

  /** Same output as [[matchByTrigramJaccard]] — LOSSLESSLY — via prefix
    * filtering (the PPJoin family of set-similarity joins): only each
    * record's |s| - ceil(minSim*|s|) + 1 globally-RAREST trigrams are
    * exploded into the candidate join. Any pair with Jaccard >= t shares
    * >= ceil(t*|s|) trigrams per side, so by pigeonhole over a shared
    * global (df, trigram) order at least one shared trigram falls in both
    * prefixes — no qualifying pair is lost. A length filter
    * (t*|a| <= |b| <= |a|/t) further prunes before the distinct.
    *
    * This is the corpus-scale path: shared-trigram blocking fans out as
    * sum over trigram of |left|x|right| — quadratic in the df of stop
    * trigrams — while the prefix join touches only rare trigrams. The df
    * table is bounded by the distinct-trigram vocabulary (alphabet^3-ish),
    * so it broadcasts at any corpus size. Epsilons bias the fp bounds
    * toward longer prefixes / looser length windows, so rounding can only
    * add candidates (removed by the exact verify), never drop them. */
  def matchByTrigramJaccardPrefix(
      left: DataFrame, leftId: String, leftText: Column,
      right: DataFrame, rightId: String, rightText: Column,
      minSim: Double): DataFrame = {
    require(minSim > 0.0 && minSim <= 1.0, s"minSim must be in (0,1], got $minSim")
    val eps = 1e-9
    // Materialized once each: l/r feed the df count, the prefix explode,
    // AND the verify join (3 consumers — lazy would plan the prep 3x).
    val l = prep(left, leftId, leftText, "__lid").localCheckpoint()
    val r = prep(right, rightId, rightText, "__rid").localCheckpoint()
    val lx = l.select(col("__lid").as("__id"), explode(col("__g___lid")).as("__g"))
    val rx = r.select(col("__rid").as("__id"), explode(col("__g___rid")).as("__g"))
    // document frequency over BOTH sides = the global rare-first token
    // order prefix filtering requires (ties broken by the hash itself).
    // Vocabulary-sized — checkpointed so the two prefixSide consumers
    // share one build, and broadcastable at any corpus size.
    val dfTable = lx.unionByName(rx).groupBy("__g").agg(count(lit(1)).as("__df"))
      .localCheckpoint()
    def prefixSide(x: DataFrame, idOut: String) = {
      val ranked = sort_array(collect_list(struct(col("__df"), col("__g"))))
      val prefixLen = (size(col("__ranked")) -
        ceil(lit(minSim) * size(col("__ranked")) - eps) + 1).cast("int")
      x.join(broadcast(dfTable), Seq("__g"))
        .groupBy("__id")
        .agg(ranked.as("__ranked"))
        .select(col("__id").as(idOut), size(col("__ranked")).as(s"__sz_$idOut"),
          explode(slice(transform(col("__ranked"), s => s.getField("__g")),
            lit(1), prefixLen)).as("__g"))
    }
    val candidates = prefixSide(lx, "__lid").join(prefixSide(rx, "__rid"), Seq("__g"))
      .where(col("__sz___rid").cast("double") >= lit(minSim) * col("__sz___lid") - eps &&
             col("__sz___lid").cast("double") >= lit(minSim) * col("__sz___rid") - eps)
      .select("__lid", "__rid").distinct()
    scoreCandidates(candidates, l, r, leftId, rightId, minSim)
  }

  /** All DISTINCT-value pairs within Levenshtein distance `maxDist` — the
    * typo/variant-clustering primitive (the edit-distance complement to
    * the trigram-Jaccard matchers above; both engines implement standard
    * Levenshtein, so this one is oracle-exact).
    *
    * Blocking is the LOSSLESS length band: ED <= k forces
    * |len(a) - len(b)| <= k, so each value fans out to its 2k+1 candidate
    * lengths and pairs equi-join on the length — never an all-pairs
    * cross. Candidate volume is Σ (values per length band)², values NOT
    * rows (the distinct is the first thing that happens); for name-like
    * columns that is vocabulary-sized. The exact filter then computes
    * Levenshtein once per candidate. */
  def editDistancePairs(df: DataFrame, textCol: Column,
                        maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val names = df.select(textCol.as("name"))
      .where(col("name").isNotNull).distinct().localCheckpoint()
    val a = names.select(col("name").as("name_a"),
      length(col("name")).as("__l"))
    val b = names.select(col("name").as("name_b"),
      explode(sequence(length(col("name")) - maxDist,
        length(col("name")) + maxDist)).as("__l"))
    a.join(b, Seq("__l"))
      .where(col("name_a") < col("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .where(col("dist") <= maxDist)
      .select(col("name_a"), col("name_b"), col("dist").cast("long").as("dist"))
  }
}
