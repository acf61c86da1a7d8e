package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Near-duplicate detection sketches for document corpora: MinHash+LSH
  * banding, SimHash, and exact n-gram Jaccard (the verifier). North-star
  * dedup surface (BASELINE.json; SURVEY.md §2.B Q-DEDUP2).
  *
  * Scale shape: everything is expression-level (codegen'd HOFs) followed by
  * ONE shuffle on (band, bucket) — the classic LSH plan that avoids the
  * all-pairs O(n^2) join. Candidate verification joins only within buckets.
  * All hash seeds are fixed constants => fully deterministic re-runs.
  */
object NearDup {

  /** Distinct word n-gram shingles built from a pre-materialized tokens
    * ATTRIBUTE. The lambda references the tokens column 3x per gram — if
    * handed an inline tokens *expression* instead of an attribute, Column
    * tree construction duplicates the whole split/filter chain into every
    * reference, re-tokenizing each document ~3x per shingle (measured 16s
    * vs <1s to shingle 5k docs). Hence the private builder + the
    * `withShingles` two-projection shape below. */
  private def shinglesOf(toks: Column, n: Int): Column = {
    val idx = when(size(toks) >= n, sequence(lit(1), size(toks) - (n - 1)))
      .otherwise(array().cast("array<int>"))
    array_distinct(transform(idx, i =>
      concat_ws(" ", (0 until n).map(o => element_at(toks, i + o)): _*)))
  }

  /** Adds `__sh` (distinct word n-gram shingles of `text`) to `df`,
    * tokenizing each row exactly once; rows with fewer than `n` tokens are
    * dropped (they have no shingles). */
  def withShingles(df: DataFrame, text: Column, n: Int): DataFrame =
    df.withColumn("__toks", TextOps.tokens(text))
      .where(size(col("__toks")) >= n)
      .withColumn("__sh", shinglesOf(col("__toks"), n))
      .drop("__toks")

  /** Back-compat expression form — fine for single-reference use. */
  def shingles(text: Column, n: Int): Column = shinglesOf(TextOps.tokens(text), n)

  /** k-permutation MinHash signatures, computed as an exploded aggregation:
    * explode shingles once, hash each shingle STRING once to a 64-bit
    * base, then k parallel `min(xxhash64(base, k))` partial aggregates —
    * ONE shuffle on doc id, map-side combined. Deriving the k permutation
    * hashes from the 8-byte base instead of re-hashing the string per
    * permutation makes the hash stage O(len + k) per shingle, not
    * O(len * k); the derived family is still uniform and seed-fixed.
    * (A nested lambda formulation — transform over transform per row —
    * re-evaluates the shingle expression per hash and falls out of
    * codegen; measured ~200x slower. This shape scales to arbitrarily
    * long documents.) */
  def minhashSignatures(docs: DataFrame, idCol: String, text: Column,
                        shingleN: Int, numHashes: Int): DataFrame = {
    val sh = withShingles(docs.select(col(idCol).as("__id"), text.as("__text")),
      col("__text"), shingleN)
      .select(col("__id"), explode(col("__sh")).as("__s"))
      .select(col("__id"), xxhash64(col("__s")).as("__h"))
    val sigCols = (0 until numHashes).map(h => min(xxhash64(col("__h"), lit(h))).as(s"__m$h"))
    sh.groupBy("__id").agg(sigCols.head, sigCols.tail: _*)
      .select(col("__id"), array((0 until numHashes).map(h => col(s"__m$h")): _*).as("__sig"))
  }

  /** The LSH band table `(__band, __bucket, __id)` — one row per doc per
    * band. This is the PERSISTABLE dedup index: a doc's rows depend only
    * on its own text (MinHash is corpus-independent), so the table of a
    * corpus is the union of the tables of its parts — which is what makes
    * [[incrementalLshCandidates]] exact, not approximate. */
  def lshBandTable(
      docs: DataFrame, idCol: String, text: Column,
      shingleN: Int = 3, numHashes: Int = 32, rowsPerBand: Int = 4): DataFrame = {
    require(numHashes % rowsPerBand == 0)
    val numBands = numHashes / rowsPerBand
    val sig = minhashSignatures(docs, idCol, text, shingleN, numHashes)
    sig.select(col("__id"),
      posexplode(array((0 until numBands).map(b =>
        xxhash64(slice(col("__sig"), b * rowsPerBand + 1, rowsPerBand), lit(b))): _*)))
      .withColumnRenamed("pos", "__band").withColumnRenamed("col", "__bucket")
  }

  /** Default bucket-population cap for the LSH-family candidate joins —
    * far above any per-bucket population the test fixtures produce (their
    * whole corpora are <= 5k docs), so capped and uncapped results are
    * identical there; at corpus scale it is the knob that bounds the join. */
  val DefaultMaxBucketSize: Int = 10000

  /** Drops every bucket (equality-key group) whose population exceeds
    * `cap` BEFORE a candidate self-join. A bucket of size s contributes
    * s² candidate rows, so one boilerplate/near-empty-document bucket of
    * 100k docs is 10^10 pairs — the classic LSH skew-killer on web text.
    * An over-common band value carries no similarity signal (it matches
    * everything), so dropping it trades a bounded sliver of recall for a
    * sum(min(s, cap)²) join bound; pairs sharing any OTHER band survive.
    * One map-side-combined count aggregation; the over-cap key list is
    * tiny (<= n/cap keys) so AQE broadcasts the anti-join.
    *
    * The cap's cost is OBSERVABLE, not silent: pass an `Observation` and
    * the run reports `dropped_buckets` / `dropped_rows` (rows = band-table
    * rows anti-joined away). The metrics ride the bucket-count aggregate
    * the anti-join needs anyway; in the observed mode the (tiny, <= n/cap
    * keys) crowded list is materialized eagerly, which (a) publishes the
    * metrics at operator-build time — a lazily-planned CollectMetrics dies
    * two ways: callers self-join the result, duplicating the observed node
    * (duplicate-name metrics don't publish), and on a zero-drop run AQE's
    * empty-relation propagation prunes the empty broadcast side, metrics
    * node included — and (b) stops the self-joining callers re-running the
    * count aggregate once per join side. */
  private[graft] def dropCrowdedBuckets(
      banded: DataFrame, keys: Seq[String], cap: Int,
      obs: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    require(cap > 1, s"maxBucketSize must be > 1, got $cap")
    val counts = banded.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__bn"))
    val crowded = obs match {
      case Some(o) => counts.observe(o,
          coalesce(sum(when(col("__bn") > cap, lit(1L))), lit(0L)).as("dropped_buckets"),
          coalesce(sum(when(col("__bn") > cap, col("__bn"))), lit(0L)).as("dropped_rows"))
        .where(col("__bn") > cap).select(keys.map(col): _*)
        .localCheckpoint()
      case None => counts.where(col("__bn") > cap).select(keys.map(col): _*)
    }
    banded.join(crowded, keys, "left_anti")
  }

  /** LSH banding: candidate pairs are doc pairs sharing >= 1 identical band
    * of `rowsPerBand` consecutive signature values. Buckets holding more
    * than `maxBucketSize` docs are dropped before the self-join (see
    * [[dropCrowdedBuckets]] — the default never triggers on the fixtures).
    * Returns (id_a, id_b) with id_a < id_b, distinct. */
  def lshCandidatePairs(
      docs: DataFrame, idCol: String, text: Column,
      shingleN: Int = 3, numHashes: Int = 32, rowsPerBand: Int = 4,
      maxBucketSize: Int = DefaultMaxBucketSize,
      capObs: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    // Materialize the band table before self-joining it: a lazy self-join
    // plans the whole scan->tokenize->minhash->band pipeline ONCE PER SIDE
    // (2x the dominant cost — at corpus scale, a doubled sketch pass).
    // localCheckpoint computes the sketch once and joins the materialized
    // partitions, same as StreamingDedup persists its batch bands.
    val banded = dropCrowdedBuckets(
      lshBandTable(docs, idCol, text, shingleN, numHashes, rowsPerBand)
        .localCheckpoint(),
      Seq("__band", "__bucket"), maxBucketSize, capObs)
    val a = banded.select(col("__band"), col("__bucket"), col("__id").as("id_a"))
    val b = banded.select(col("__band"), col("__bucket"), col("__id").as("id_b"))
    a.join(b, Seq("__band", "__bucket"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Incremental dedup candidates when a batch of NEW docs arrives: every
    * candidate pair touching a new doc, WITHOUT recomputing the corpus —
    * the 100 TB shape (a full-corpus re-sketch per daily batch is the
    * scale-killer). One join of the (small) new band table against the
    * persisted corpus index gives new x old; a self-join of the new table
    * gives new x new. Exactly equals the full recompute restricted to
    * pairs involving a new id (property-tested). Robust to `storedBands`
    * already containing (some of) the new ids — e.g. a replayed micro-batch
    * whose previous append survived: self-pairs are filtered and the
    * duplicate cross pairs collapse in the `distinct`, preserving the
    * id_a < id_b invariant of the output.
    *
    * The bucket cap is computed over the UNION of new + stored bands —
    * exactly the populations the equivalent full recompute would see — so
    * capped incremental output still equals the capped full recompute
    * restricted to new ids, and a boilerplate bucket that grew past the
    * cap in the store stops joining against every future batch. */
  def incrementalLshCandidates(newBands: DataFrame, storedBands: DataFrame,
                               maxBucketSize: Int = DefaultMaxBucketSize,
                               capObs: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    require(maxBucketSize > 1, s"maxBucketSize must be > 1, got $maxBucketSize")
    // The cap count rides the SAME (band, bucket) partitioning the
    // candidate join needs: one tagged union, one window count (over-cap
    // buckets dropped in place — no separate aggregate + anti-joins), then
    // the capped table is materialized ONCE (it feeds three join sides;
    // left lazy each would replan the new batch's minhash pipeline).
    // `capObs` mirrors dropCrowdedBuckets' observability on this arrival
    // path: dropped band-table rows + buckets, published by the
    // localCheckpoint materialization below (`__bn`-first rows mark one
    // count per dropped bucket).
    val tagged = newBands.select(col("__band"), col("__bucket"), col("__id"))
      .withColumn("__isnew", lit(true))
      .unionByName(storedBands.select(col("__band"), col("__bucket"), col("__id"))
        .withColumn("__isnew", lit(false)))
    val w = Window.partitionBy("__band", "__bucket")
    val wRn = w.orderBy("__id", "__isnew")
    val counted = tagged.withColumn("__bn", count(lit(1)).over(w))
    val observed = capObs match {
      case Some(o) => counted
        .withColumn("__rn", row_number().over(wRn))
        .observe(o,
          coalesce(sum(when(col("__bn") > maxBucketSize && col("__rn") === 1, lit(1L))),
            lit(0L)).as("dropped_buckets"),
          coalesce(sum(when(col("__bn") > maxBucketSize, lit(1L))), lit(0L))
            .as("dropped_rows"))
        .drop("__rn")
      case None => counted
    }
    val kept = observed
      .where(col("__bn") <= maxBucketSize)
      .drop("__bn")
      .localCheckpoint()
    val n = kept.where(col("__isnew"))
      .select(col("__band"), col("__bucket"), col("__id").as("__new"))
    val o = kept.where(!col("__isnew"))
      .select(col("__band"), col("__bucket"), col("__id").as("__old"))
    val newOld = n.join(o, Seq("__band", "__bucket"))
      .where(col("__new") =!= col("__old"))
      .select(least(col("__new"), col("__old")).as("id_a"),
        greatest(col("__new"), col("__old")).as("id_b"))
    val n2 = n.select(col("__band"), col("__bucket"), col("__new").as("id_b"))
    val newNew = n.withColumnRenamed("__new", "id_a")
      .join(n2, Seq("__band", "__bucket"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
    newOld.unionByName(newNew).distinct()
  }

  /** Estimated Jaccard from MinHash signatures: fraction of equal slots. */
  def estJaccard(sigA: Column, sigB: Column, numHashes: Int): Column =
    size(filter(zip_with(sigA, sigB, (x, y) => x === y), e => e)).cast("double") / numHashes

  /** 64-bit SimHash of a token multiset: bit b is the sign of
    * sum(tf * (hash bit b ? +1 : -1)). Computed as an exploded aggregation
    * over token OCCURRENCES — summing ±1 per occurrence is identical to
    * tf-weighting per distinct token, so no intermediate (doc, token, tf)
    * aggregation level exists: ONE map-side-combined shuffle on doc id,
    * whatever the doc length. */
  def simhash(docs: DataFrame, idCol: String, text: Column): DataFrame = {
    val toks = docs.select(col(idCol).as("__id"), explode(TextOps.tokens(text)).as("__tok"))
      .select(col("__id"), xxhash64(col("__tok")).as("__h"))
    val bitSums = (0 until 64).map { bb =>
      sum(when(col("__h").bitwiseAND(lit(1L << bb)) =!= 0, lit(1L))
        .otherwise(lit(-1L))).as(s"__b$bb")
    }
    val sums = toks.groupBy("__id").agg(bitSums.head, bitSums.tail: _*)
    val sh = (0 until 64).foldLeft(lit(0L)) { (acc, bb) =>
      acc.bitwiseOR(when(col(s"__b$bb") > 0, lit(1L << bb)).otherwise(lit(0L)))
    }
    sums.select(col("__id").as(idCol), sh.as("simhash"))
  }

  /** SimHash near-dup candidates: pigeonhole on 16-bit chunks — any pair
    * with hamming distance <= 3 must agree on >= 1 of 4 chunks, so a
    * bucket join on (chunk_idx, chunk) finds ALL such pairs without
    * O(n^2). A `maxHamming` above 3 still filters the candidates it sees
    * but is recall-lossy (pairs differing in every chunk are never
    * candidates) — that's the LSH trade, not a bug. Chunk buckets holding
    * more than `maxBucketSize` docs are dropped before the self-join
    * ([[dropCrowdedBuckets]]) — on web text, near-empty docs collapse into
    * a few giant all-zero-ish chunks. */
  /** The 4x16-bit chunk explosion the pigeonhole joins bucket on — shared
    * by the text SimHash pairs and the image dHash pairs (the pair
    * machinery is hash-agnostic over any 64-bit fingerprint column). */
  private[graft] def hashChunks16(h: DataFrame, idCol: String, hashCol: String): DataFrame =
    h.select(col(idCol).as("__id"), col(hashCol).as("__h64"),
      posexplode(array((0 until 4).map(c =>
        shiftright(col(hashCol), c * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .withColumnRenamed("pos", "__chunk").withColumnRenamed("col", "__cv")

  /** Corpus size at which the 16-bit-chunk pigeonhole's 2^16 buckets per
    * chunk start crowding (collision volume ~ n²/2^16 — measured
    * superlinear past ~10^5 docs, ScaleBench round 5) and callers should
    * switch to the ~2^32-bucket 3-of-6-block tables ([[hashCombos20]]).
    * The auto-routing image entry points key off this. */
  private[graft] val WideHashThreshold: Long = 100000L

  /** The Manku 3-of-6-block combination explosion [[simhashPairsWide]]
    * buckets on, factored out so the incremental (new-vs-stored) pair
    * path can band the SAME way past [[WideHashThreshold]]. Blocks of
    * 11/11/11/11/10/10 bits; a pair within Hamming 3 agrees on >= 3
    * blocks, hence collides in >= 1 of the C(6,3)=20 combinations. Output
    * shape matches [[hashChunks16]] — (__chunk = combo id, __cv = hashed
    * 3-block key, __id, __h64) — so every consumer is band-mode-agnostic. */
  private[graft] def hashCombos20(h: DataFrame, idCol: String, hashCol: String): DataFrame = {
    val offsets = Seq(0, 11, 22, 33, 44, 54)
    val widths = Seq(11, 11, 11, 11, 10, 10)
    def blockVal(i: Int) =
      shiftright(col(hashCol), offsets(i)).bitwiseAND(lit((1L << widths(i)) - 1))
    val combos = offsets.indices.combinations(3).toSeq // 20 of them
    val keys = combos.zipWithIndex.map { case (c, ci) =>
      // combo id + the three block values, hashed into one 64-bit key —
      // width-independent and collision-negligible at these key counts
      xxhash64(lit(ci), blockVal(c(0)), blockVal(c(1)), blockVal(c(2)))
    }
    h.select(col(idCol).as("__id"), col(hashCol).as("__h64"),
      posexplode(array(keys: _*)))
      .withColumnRenamed("pos", "__chunk").withColumnRenamed("col", "__cv")
  }

  def simhashPairs(sh: DataFrame, idCol: String, maxHamming: Int = 3,
                   maxBucketSize: Int = DefaultMaxBucketSize,
                   capObs: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    // Materialized before the self-join for the same reason as
    // lshCandidatePairs: `sh` is usually the full simhash aggregation, and
    // a lazy self-join would compute it once per side.
    val chunks = dropCrowdedBuckets(
      hashChunks16(sh, idCol, "simhash")
        .withColumnRenamed("__h64", "simhash")
        .localCheckpoint(),
      Seq("__chunk", "__cv"), maxBucketSize, capObs)
    val a = chunks.select(col("__chunk"), col("__cv"), col("__id").as("id_a"), col("simhash").as("sh_a"))
    val b = chunks.select(col("__chunk"), col("__cv"), col("__id").as("id_b"), col("simhash").as("sh_b"))
    a.join(b, Seq("__chunk", "__cv"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long").as("hamming"))
      // hamming is a pure function of the pair, so filtering BEFORE the
      // dedup is equivalent — and shrinks the distinct's shuffle input by
      // the filter's selectivity (most bucket-collision pairs fail it)
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /** SimHash near-dup candidates at CORPUS scale — the multi-block
    * refinement of [[simhashPairs]] (the design of Manku/Jain/Sarma's
    * web-crawl dedup paper): split the 64-bit fingerprint into 6 blocks
    * (11/11/11/11/10/10 bits); a pair with hamming distance <= 3 differs
    * in at most 3 blocks, so it AGREES on >= 3 — hence it collides in at
    * least one of the C(6,3) = 20 three-block combinations. Keying each
    * combination table on the (~32-bit) concatenated block values gives a
    * ~2^32 bucket space per table vs the 4-chunk form's 2^16 — collision
    * volume ~ n²/2^32 stays dup-group-bound for corpora where the 16-bit
    * chunks have already collapsed (measured: the 4-chunk form goes
    * superlinear past ~10^5 docs — ScaleBench round 5). Cost: 20 rows per
    * doc in the band table instead of 4 — the classic rows-for-buckets
    * LSH trade.
    *
    * Output is IDENTICAL to [[simhashPairs]] at maxHamming <= 3 (both are
    * exact-pigeonhole candidate generators followed by the exact hamming
    * filter; spec-asserted): use this form when n approaches the 16-bit
    * chunk space, the 4-chunk form below it. */
  def simhashPairsWide(sh: DataFrame, idCol: String, maxHamming: Int = 3,
                       maxBucketSize: Int = DefaultMaxBucketSize,
                       capObs: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    require(maxHamming <= 3,
      s"simhashPairsWide's 3-of-6-block pigeonhole is exact only for maxHamming <= 3, got $maxHamming")
    val banded = dropCrowdedBuckets(
      hashCombos20(sh, idCol, "simhash").localCheckpoint(),
      Seq("__chunk", "__cv"), maxBucketSize, capObs)
    val a = banded.select(col("__chunk"), col("__cv"), col("__id").as("id_a"), col("__h64").as("sh_a"))
    val b = banded.select(col("__chunk"), col("__cv"), col("__id").as("id_b"), col("__h64").as("sh_b"))
    a.join(b, Seq("__chunk", "__cv"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long").as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Incremental (new-batch-vs-stored) pigeonhole pairs over any 64-bit
    * fingerprint column — the shared core of
    * [[graft.multimodal.Multimodal.incrementalImageNearDups]] and its
    * audio twin: near-dup pairs TOUCHING the new batch (new×new plus
    * new×stored) without rescanning the stored corpus' media. `wide`
    * selects the band mode — [[hashChunks16]] below [[WideHashThreshold]],
    * [[hashCombos20]] at corpus scale — and both modes emit identical
    * pairs at maxHamming <= 3 (exact pigeonholes + the exact hamming
    * filter). The crowded-bucket cap is counted over the UNION exactly as
    * the full recompute would count it (a new-side-only cap would both
    * miss the blowup protection on stored crowds and break the
    * incremental == restricted-full-recompute equality); a doc_id
    * recurring in both tables never self-pairs (strict id_a < id_b). One
    * bucket-local join over the tagged union, cap riding the same
    * partitioning, materialized ONCE (it feeds both join sides). */
  private[graft] def incrementalHashPairs(
      newHashes: DataFrame, storedHashes: DataFrame,
      idCol: String, hashCol: String,
      maxHamming: Int, maxBucketSize: Int, wide: Boolean): DataFrame = {
    require(maxHamming <= 3,
      s"the pigeonhole band tables are exact only for maxHamming <= 3, got $maxHamming")
    def bands(df: DataFrame) =
      if (wide) hashCombos20(df, idCol, hashCol) else hashChunks16(df, idCol, hashCol)
    val tagged = bands(newHashes).withColumn("__isnew", lit(true))
      .unionByName(bands(storedHashes).withColumn("__isnew", lit(false)))
    val w = Window.partitionBy("__chunk", "__cv")
    val capped = tagged.withColumn("__bn", count(lit(1)).over(w))
      .where(col("__bn") <= maxBucketSize).drop("__bn")
      .localCheckpoint()
    val a = capped.select(col("__chunk"), col("__cv"), col("__id").as("id_a"),
      col("__h64").as("__ha"), col("__isnew").as("__na"))
    val b = capped.select(col("__chunk"), col("__cv"), col("__id").as("id_b"),
      col("__h64").as("__hb"), col("__isnew").as("__nb"))
    a.join(b, Seq("__chunk", "__cv"))
      .where(col("id_a") < col("id_b") && (col("__na") || col("__nb")))
      .select(col("id_a"), col("id_b"),
        bit_count(col("__ha").bitwiseXOR(col("__hb"))).cast("long").as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Exact n-gram Jaccard similarity for all pairs within a blocking key —
    * the ground-truth verifier for the sketches above, and an
    * oracle-checkable query (Q-DEDUP4).
    *
    * Formulation: block-self-join + `array_intersect`, i.e. exactly ONE row
    * of bounded work per candidate pair. The alternative — explode shingles
    * and join on (block, shingle) — costs sum(per-shingle doc-count^2),
    * which degenerates catastrophically when documents share vocabulary
    * (measured 28s vs ~2s on 5k near-duplicate docs). Use
    * [[exactJaccardVerify]] with LSH candidates instead of blocking when no
    * natural block exists: sketch-candidates + per-pair exact verify is the
    * 100 TB composition.
    *
    * Guarded: a block of s rows joins into s² candidate rows, so a block
    * above `maxBlockSize` FAILS FAST (before the quadratic join runs)
    * rather than silently degenerating ~10,000x at a 100x block scale-up.
    * The operator is exact by contract, so it never auto-falls back to the
    * recall-lossy LSH path — the error message points there instead. The
    * guard's count rides the localCheckpoint'ed shingle table (which the
    * self-join reuses, halving the dominant shingle pass as a side effect). */
  def exactJaccardPairs(
      docs: DataFrame, idCol: String, text: Column, block: Column,
      shingleN: Int = 3, minSim: Double = 0.1,
      maxBlockSize: Int = DefaultMaxBucketSize): DataFrame = {
    // Shingles are hashed to 64-bit longs and SORTED before the pairwise
    // intersect, so the custom two-pointer codegen expression
    // (SortedLongIntersectCount) counts the overlap with zero allocation.
    // 64-bit collisions are negligible => Jaccard values are identical to
    // the string formulation the oracle runs.
    val sh = withShingles(
        docs.select(block.as("__blk"), col(idCol), text.as("__text")),
        col("__text"), shingleN)
      .select(col("__blk"), col(idCol),
        sort_array(array_distinct(transform(col("__sh"), s => xxhash64(s)))).as("__shh"))
      .localCheckpoint()
    val biggest = sh.groupBy("__blk").agg(count(lit(1)).as("__n"))
      .agg(max(col("__n"))).head()
    val maxBlock = if (biggest.isNullAt(0)) 0L else biggest.getLong(0)
    require(maxBlock <= maxBlockSize,
      s"exactJaccardPairs: a block holds $maxBlock rows (> maxBlockSize=$maxBlockSize); " +
      s"the exact pair join would generate ~${maxBlock}^2 candidates — route through " +
      "lshCandidatePairs + exactJaccardVerify for unbounded blocks, or raise maxBlockSize")
    val a = sh.select(col("__blk"), col(idCol).as("id_a"), col("__shh").as("__sha"))
    val b = sh.select(col("__blk"), col(idCol).as("id_b"), col("__shh").as("__shb"))
    a.join(b, Seq("__blk"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        graft.functions.SortedLongIntersectCount(col("__sha"), col("__shb")).as("__inter"),
        size(col("__sha")).as("__sza"), size(col("__shb")).as("__szb"))
      .select(col("id_a"), col("id_b"),
        (col("__inter").cast("double") /
          (col("__sza") + col("__szb") - col("__inter")).cast("double")).as("jaccard"))
      .where(col("jaccard") >= minSim)
  }

  /** Block-local variant of [[exactJaccardPairs]]: groups each block onto
    * one task, decodes every shingle array ONCE, and runs the quadratic
    * pair loop over in-memory primitive arrays — no per-pair row
    * materialization (the join form copies both arrays into each of the
    * ~n^2/2 joined rows; measured ~3x). Requires each block's arrays to
    * fit in task memory (fine for language/label blocks; use the join form
    * for unbounded blocks). Identical output to the join form.
    */
  def exactJaccardPairsBlocked(
      docs: DataFrame, idCol: String, text: Column, block: Column,
      shingleN: Int = 3, minSim: Double = 0.1,
      maxBlockSize: Int = DefaultMaxBucketSize): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // TRIANGULAR TILING (r15): one task per block serialized the whole
    // quadratic loop on the dominant block (one language owns most of a
    // real corpus — 1 of 32 cores busy). Chunk each block's items by
    // id mod G and run one task per unordered chunk pair (gi <= gj): the
    // n²/2 comparisons split into G(G+1)/2 tiles of ~(n/G)² each. Each
    // item is shuffled G times (its chunk meets every other chunk once)
    // — G is capped so the duplication factor stays bounded on big
    // clusters; past the cap extra parallelism buys less than the G×
    // shuffle volume costs (per-tile work is already bounded by the
    // maxBlockSize guard).
    val g = math.min(16, math.max(1, math.ceil(
      math.sqrt(2.0 * spark.sparkContext.defaultParallelism)).toInt))
    val sh = withShingles(
        docs.select(block.cast("string").as("__blk"), col(idCol).cast("long").as("__id"),
          text.as("__text")),
        col("__text"), shingleN)
      .select(col("__blk"), col("__id"),
        sort_array(array_distinct(transform(col("__sh"), s => xxhash64(s)))).as("__shh"))
      // block size rides along so the quadratic guard (a BLOCK-level
      // contract) stays exact inside tile-level tasks
      .withColumn("__n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("__blk")))
      .withColumn("__c", pmod(col("__id"), lit(g.toLong)).cast("int"))
      .withColumn("__t", explode(sequence(lit(0), lit(g - 1))))
      .select(col("__blk"), col("__n"),
        least(col("__c"), col("__t")).as("__ti"),
        greatest(col("__c"), col("__t")).as("__tj"),
        col("__c"), col("__id"), col("__shh"))
      // each copy lands in a distinct tile (t varies, c fixed): chunk-ti
      // items reach tile (ti, tj) via t = tj and chunk-tj items via
      // t = ti — exactly once each, no double-counting
      .as[(String, Long, Int, Int, Int, Long, Array[Long])]
    sh.groupByKey(t => (t._1, t._3, t._4)).flatMapGroups { (key, it) =>
      val (blk, ti, tj) = key
      val all = it.toArray
      all.headOption.foreach { h =>
        require(h._2 <= maxBlockSize,
          s"exactJaccardPairsBlocked: block '$blk' holds ${h._2} rows " +
          s"(> maxBlockSize=$maxBlockSize); route through lshCandidatePairs + exactJaccardVerify")
      }
      def side(c: Int) =
        all.iterator.filter(_._5 == c).map(t => (t._6, t._7)).toArray.sortBy(_._1)
      val out = Seq.newBuilder[(Long, Long, Double)]
      def pair(ia: Long, aa: Array[Long], ib: Long, ab: Array[Long]): Unit = {
        var x = 0; var y = 0; var c = 0
        while (x < aa.length && y < ab.length) {
          val u = aa(x); val v = ab(y)
          if (u == v) { c += 1; x += 1; y += 1 }
          else if (u < v) x += 1 else y += 1
        }
        val jac = c.toDouble / (aa.length + ab.length - c).toDouble
        if (jac >= minSim)
          out += (if (ia < ib) (ia, ib, jac) else (ib, ia, jac))
      }
      if (ti == tj) {
        val items = side(ti)
        var i = 0
        while (i < items.length) {
          var j = i + 1
          while (j < items.length) {
            pair(items(i)._1, items(i)._2, items(j)._1, items(j)._2)
            j += 1
          }
          i += 1
        }
      } else {
        val a = side(ti); val b = side(tj)
        var i = 0
        while (i < a.length) {
          var j = 0
          while (j < b.length) {
            pair(a(i)._1, a(i)._2, b(j)._1, b(j)._2)
            j += 1
          }
          i += 1
        }
      }
      out.result().iterator
    }.toDF("id_a", "id_b", "jaccard")
  }

  /** Connected components over a candidate-pair edge list — the final
    * stage of a dedup pipeline: near-dup pairs form clusters, and exactly
    * one document per cluster survives. Alternating LARGE-STAR/SMALL-STAR
    * rounds (the Kiveris et al. "Connected Components in MapReduce and
    * Beyond" scheme, also what GraphFrames ships): each round rewires every
    * edge toward its neighborhood minimum, so component HEIGHT roughly
    * halves per round and a path of n vertices finishes in O(log n) rounds
    * — where plain min-label propagation needs O(diameter) rounds and
    * fail-fasts on exactly the chain-shaped clusters (template pages
    * A~B~C~…) a web-scale near-dup graph produces. `localCheckpoint` per
    * round truncates the growing lineage, which is what keeps iterative
    * DataFrame algorithms viable at scale.
    * Returns (v, component) for every vertex mentioned in `pairs`, where
    * component = min vertex id reachable. */
  def connectedComponents(pairs: DataFrame, idA: String = "id_a",
                          idB: String = "id_b", maxIter: Int = 20): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    // Orient every edge hi→lo; self-loops drop out of the iteration (their
    // vertices are restored by the final vertex join).
    val init = pairs
      .select(col(idA).as("u"), col(idB).as("v"))
      .where(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      .distinct().localCheckpoint()

    // size-adaptive broadcast of the per-round mins table (r15; shared
    // helper r16): the rounds run over localCheckpointed frames with no
    // statistics, so the planner can never pick the broadcast itself;
    // `bound` is a proven upper bound on the mins row count (see call
    // sites). Threshold = autoBroadcastJoinThreshold / ~100 B per built
    // hash-relation row — the planner's own decision re-derived; big
    // graphs keep the shuffle.
    def maybeBroadcast(df: DataFrame, bound: Long): DataFrame =
      SizeAdaptive.maybeBroadcast(df, bound)

    // LARGE-STAR: per vertex u over the SYMMETRIZED adjacency, m =
    // min(N(u) ∪ {u}); every strictly-larger neighbor v > u re-points to m.
    // Min is algebraic, so the hot component-root key collapses map-side;
    // the join back duplicates one mins row per adjacency row (AQE splits
    // the skewed partition).
    def largeStar(e: DataFrame, eCount: Long): DataFrame = {
      val sym = e.unionAll(e.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy("u").agg(min("v").as("__mn"))
        .select(col("u").as("__u"), least(col("__mn"), col("u")).as("__m"))
      // mins has one row per distinct u of sym: <= 2·|e|
      sym.join(maybeBroadcast(mins, 2 * eCount), col("u") === col("__u"))
        .where(col("v") > col("u"))
        .select(col("v").as("u"), col("__m").as("v")) // m <= u < v: stays hi→lo
        .distinct()
    }

    // SMALL-STAR: per vertex u over its SMALLER neighbors (input is
    // oriented hi→lo, so they are exactly the v column), m = min; every
    // smaller neighbor and u itself re-point to m.
    def smallStar(e: DataFrame, eBound: Long): DataFrame = {
      val mins = e.groupBy("u").agg(min("v").as("__m"))
        .select(col("u").as("__u"), col("__m"))
      e.join(maybeBroadcast(mins, eBound), col("u") === col("__u"))
        .select(col("v").as("a"), col("__m").as("b"))
        .where(col("a") =!= col("b"))
        .select(greatest(col("a"), col("b")).as("u"),
          least(col("a"), col("b")).as("v"))
        .unionByName(mins.select(col("__u").as("u"), col("__m").as("v")))
        .distinct()
    }

    var cur = init
    var prevCount = cur.count()

    // Fixpoint edges are (member, root). Every endpoint of the ORIGINAL
    // pair list gets a label; vertices no fixpoint edge mentions (isolated
    // self-loops) are their own component.
    val verts = pairs.select(col(idA).as("v"))
      .unionAll(pairs.select(col(idB).as("v"))).distinct()
    def labelled(members: DataFrame): DataFrame =
      verts.join(members, col("v") === col("__mv"), "left_outer")
        .select(col("v"), coalesce(col("__comp"), col("v")).as("component"))

    // SIZE-ADAPTIVE LOCAL CONTRACTION (r16): when the deduplicated edge
    // list fits the session's broadcast budget (the same ~100 B/row
    // derivation the loop's own maybeBroadcast uses), the star-contraction
    // rounds are pure scheduling overhead — each round ALREADY pulls a
    // mins table of comparable size to the driver to broadcast it, plus
    // 4+ exchanges and 2 actions, for O(log n) rounds. Collecting the
    // edges ONCE and running the min-label union-find locally moves
    // strictly less data to the driver than one round's broadcast builds,
    // and the resulting label table (≤ 2·|E| rows) re-enters the plan as
    // a broadcast — the decision the planner itself would make for a
    // relation this size. A graph over the threshold keeps the
    // distributed loop exactly as before (spec-pinned equal on random
    // graphs; the threshold follows autoBroadcastJoinThreshold, so
    // cluster configs scale it, and -1 disables it entirely).
    val integralIds = init.schema("u").dataType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => true
      case _ => false // non-integral ids: the long round-trip would be lossy
    }
    if (integralIds && prevCount <= SizeAdaptive.broadcastRowCap(init)) {
      val edges = init.select(col("u").cast("long"), col("v").cast("long"))
        .as[(Long, Long)].collect()
      // union-to-min: the larger root is always re-pointed at the smaller,
      // so each tree's final root IS the component's minimum id (the same
      // min-reachable-vertex fixpoint the star contraction converges to).
      val parent = new java.util.HashMap[Long, Long](edges.length * 2)
      def add(x: Long): Unit =
        if (!parent.containsKey(x)) parent.put(x, x)
      def find(x: Long): Long = {
        var r = x
        while (parent.get(r) != r) r = parent.get(r)
        var c = x
        while (parent.get(c) != r) { val n = parent.get(c); parent.put(c, r); c = n }
        r
      }
      edges.foreach { case (a, b) =>
        add(a); add(b)
        val ra = find(a); val rb = find(b)
        if (ra != rb) parent.put(math.max(ra, rb), math.min(ra, rb))
      }
      val vType = init.schema("u").dataType
      val labels = {
        val it = parent.keySet().iterator()
        val buf = Seq.newBuilder[(Long, Long)]
        while (it.hasNext) { val v = it.next(); buf += ((v, find(v))) }
        buf.result()
      }
      val members = labels.toDF("__mv", "__comp")
        .select(col("__mv").cast(vType).as("__mv"),
          col("__comp").cast(vType).as("__comp"))
      return labelled(maybeBroadcast(members, 2 * prevCount))
    }

    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // large-star emits <= |sym| = 2·|cur| rows pre-distinct, so the
      // small-star mins bound is 2·prevCount
      val next = smallStar(largeStar(cur, prevCount), 2 * prevCount)
        .localCheckpoint()
      val nextCount = next.count()
      // Exact set-equality convergence (both sides are distinct): equal
      // cardinality + empty next∖cur ⇒ identical edge sets. At the
      // fixpoint the graph is a forest of stars centered at each
      // component's minimum — no probabilistic hash compare, a false
      // "converged" would silently split clusters.
      converged = nextCount == prevCount && next.exceptAll(cur).isEmpty
      prevCount = nextCount
      cur = next
      i += 1
    }
    // Fail fast rather than return half-merged clusters: un-converged
    // labels would flow into dedupByComponents* as SPLIT clusters — extra
    // survivors, i.e. silently incomplete dedup. O(log n) rounds cover
    // even a path-shaped component of 2^maxIter vertices, so hitting the
    // cap at the default means something pathological, and the caller
    // must decide, not inherit wrong labels.
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter large-star/" +
        "small-star rounds; raise maxIter (the edge set was still moving)")
    labelled(cur.select(col("u").as("__mv"), col("v").as("__comp")))
  }

  /** Keep one representative (min id) per near-dup cluster; documents in
    * no cluster pass through untouched. */
  def dedupByComponents(docs: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val losers = connectedComponents(pairs)
      .where(col("v") =!= col("component")).select(col("v"))
    docs.join(losers, docs(idCol) === losers("v"), "left_anti")
  }

  /** Keep the BEST document per near-dup cluster — the production form of
    * [[dedupByComponents]]: min-id survival is arbitrary, a real pipeline
    * keeps the highest-quality member (longest, best quality score,
    * freshest). `order` ranks WITHIN a cluster (make it total — end with
    * the id — or survival is nondeterministic); documents in no cluster
    * survive untouched. One window over the component key on top of the
    * component labels; skew bounded by the largest dup cluster. */
  def dedupByComponentsBest(docs: DataFrame, idCol: String, pairs: DataFrame,
                            order: Seq[Column]): DataFrame =
    dedupByComponentsBestFrom(docs, idCol, connectedComponents(pairs), order)

  /** [[dedupByComponentsBest]] over an ALREADY-COMPUTED (v, component)
    * label table — the entry point when the component table is
    * persisted/memoized and shared by several consumers (the
    * cluster-scale shape: contraction runs once, every downstream pass
    * reads the labels). */
  def dedupByComponentsBestFrom(docs: DataFrame, idCol: String,
                                components: DataFrame,
                                order: Seq[Column]): DataFrame = {
    require(order.nonEmpty, "need a within-cluster ranking; end it with the id")
    val comp = components.withColumnRenamed("v", "__v")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__comp")).orderBy(order: _*)
    docs.join(comp, docs(idCol) === comp("__v"), "left_outer")
      .withColumn("__comp", coalesce(col("component"), docs(idCol)))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__v", "component", "__comp", "__rn")
  }

  /** Exact Jaccard verification of a candidate-pair list (e.g. from
    * [[lshCandidatePairs]]): joins each (id_a, id_b) to its shingle set and
    * scores it — work is O(|candidates|), independent of corpus size. */
  def exactJaccardVerify(
      candidates: DataFrame, docs: DataFrame, idCol: String, text: Column,
      shingleN: Int = 3): DataFrame = {
    val sh = withShingles(docs.select(col(idCol).as("__id"), text.as("__text")),
        col("__text"), shingleN)
      .select(col("__id"),
        sort_array(array_distinct(transform(col("__sh"), s => xxhash64(s)))).as("__sh"))
    candidates
      .join(sh.select(col("__id").as("id_a"), col("__sh").as("__sha")), "id_a")
      .join(sh.select(col("__id").as("id_b"), col("__sh").as("__shb")), "id_b")
      .select(col("id_a"), col("id_b"),
        graft.functions.SortedLongIntersectCount(col("__sha"), col("__shb")).as("__i"),
        size(col("__sha")).as("__sza"), size(col("__shb")).as("__szb"))
      .select(col("id_a"), col("id_b"),
        (col("__i").cast("double") /
          (col("__sza") + col("__szb") - col("__i")).cast("double")).as("jaccard"))
  }
}
