package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Distinct word n-gram shingles of a text column. */
  def shingles(text: Column, n: Int): Column = {
    val toks = TextOps.tokens(text)
    val idx = when(size(toks) >= n, sequence(lit(1), size(toks) - (n - 1)))
      .otherwise(array().cast("array<int>"))
    array_distinct(transform(idx, i =>
      concat_ws(" ", (0 until n).map(o => element_at(toks, i + o)): _*)))
  }

  /** k-permutation MinHash signatures, computed as an exploded aggregation:
    * explode shingles once, then k parallel `min(xxhash64(s, h))` partial
    * aggregates — ONE shuffle on doc id, map-side combined. (A nested
    * lambda formulation — transform over transform per row — re-evaluates
    * the shingle expression per hash and falls out of codegen; measured
    * ~200x slower. This shape scales to arbitrarily long documents.) */
  def minhashSignatures(docs: DataFrame, idCol: String, text: Column,
                        shingleN: Int, numHashes: Int): DataFrame = {
    val sh = docs.select(col(idCol).as("__id"), explode(shingles(text, shingleN)).as("__s"))
    val sigCols = (0 until numHashes).map(h => min(xxhash64(col("__s"), lit(h))).as(s"__m$h"))
    sh.groupBy("__id").agg(sigCols.head, sigCols.tail: _*)
      .select(col("__id"), array((0 until numHashes).map(h => col(s"__m$h")): _*).as("__sig"))
  }

  /** LSH banding: candidate pairs are doc pairs sharing >= 1 identical band
    * of `rowsPerBand` consecutive signature values.
    * Returns (id_a, id_b) with id_a < id_b, distinct. */
  def lshCandidatePairs(
      docs: DataFrame, idCol: String, text: Column,
      shingleN: Int = 3, numHashes: Int = 32, rowsPerBand: Int = 4): DataFrame = {
    require(numHashes % rowsPerBand == 0)
    val numBands = numHashes / rowsPerBand
    val sig = minhashSignatures(docs, idCol, text, shingleN, numHashes)
    val banded = sig.select(col("__id"),
      posexplode(array((0 until numBands).map(b =>
        xxhash64(slice(col("__sig"), b * rowsPerBand + 1, rowsPerBand), lit(b))): _*)))
      .withColumnRenamed("pos", "__band").withColumnRenamed("col", "__bucket")
    val a = banded.select(col("__band"), col("__bucket"), col("__id").as("id_a"))
    val b = banded.select(col("__band"), col("__bucket"), col("__id").as("id_b"))
    a.join(b, Seq("__band", "__bucket"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Estimated Jaccard from MinHash signatures: fraction of equal slots. */
  def estJaccard(sigA: Column, sigB: Column, numHashes: Int): Column =
    size(filter(zip_with(sigA, sigB, (x, y) => x === y), e => e)).cast("double") / numHashes

  /** 64-bit SimHash of a token multiset: bit b is the sign of
    * sum(tf * (hash bit b ? +1 : -1)). Computed as an exploded aggregation
    * (scales to any doc length; one shuffle on doc id). */
  def simhash(docs: DataFrame, idCol: String, text: Column): DataFrame = {
    val toks = docs.select(col(idCol).as("__id"), explode(TextOps.tokens(text)).as("__tok"))
      .groupBy("__id", "__tok").agg(count(lit(1)).as("__tf"))
      .withColumn("__h", xxhash64(col("__tok")))
    val bitSums = (0 until 64).map { bb =>
      sum(when(col("__h").bitwiseAND(lit(1L << bb)) =!= 0, col("__tf"))
        .otherwise(-col("__tf"))).as(s"__b$bb")
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
    * candidates) — that's the LSH trade, not a bug. */
  def simhashPairs(sh: DataFrame, idCol: String, maxHamming: Int = 3): DataFrame = {
    val chunks = sh.select(col(idCol).as("__id"), col("simhash"),
      posexplode(array((0 until 4).map(c =>
        shiftright(col("simhash"), c * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .withColumnRenamed("pos", "__chunk").withColumnRenamed("col", "__cv")
    val a = chunks.select(col("__chunk"), col("__cv"), col("__id").as("id_a"), col("simhash").as("sh_a"))
    val b = chunks.select(col("__chunk"), col("__cv"), col("__id").as("id_b"), col("simhash").as("sh_b"))
    a.join(b, Seq("__chunk", "__cv"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long").as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Exact n-gram Jaccard similarity for pairs within a blocking key —
    * the ground-truth verifier for the sketches above, and an
    * oracle-checkable query (Q-DEDUP4). `block` bounds the self-join. */
  def exactJaccardPairs(
      docs: DataFrame, idCol: String, text: Column, block: Column,
      shingleN: Int = 3, minSim: Double = 0.1): DataFrame = {
    val sh = docs.select(col(idCol).as("__id"), block.as("__blk"),
      explode(shingles(text, shingleN)).as("__s"))
    val sizes = sh.groupBy("__id").agg(count(lit(1)).as("__sz"))
    val a = sh.select(col("__blk"), col("__s"), col("__id").as("id_a"))
    val b = sh.select(col("__blk"), col("__s"), col("__id").as("id_b"))
    val inter = a.join(b, Seq("__blk", "__s"))
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("__inter"))
    inter
      .join(sizes.withColumnRenamed("__id", "id_a").withColumnRenamed("__sz", "__sza"), "id_a")
      .join(sizes.withColumnRenamed("__id", "id_b").withColumnRenamed("__sz", "__szb"), "id_b")
      .select(col("id_a"), col("id_b"),
        (col("__inter").cast("double") /
          (col("__sza") + col("__szb") - col("__inter")).cast("double")).as("jaccard"))
      .where(col("jaccard") >= minSim)
  }
}
