package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** SemDeDup-style semantic deduplication (Abbas et al. 2023,
  * arXiv:2303.09540): cluster the embedding space with a k-means coarse
  * quantizer and compare vectors only WITHIN each cluster — the published
  * recipe for semantic dedup of web-scale pretraining corpora, and the
  * third near-dup scale path here next to hyperplane-LSH bucketing
  * (`Similarity.lshBucketedPairsAboveThreshold`) and MinHash-LSH
  * (`NearDup.lshCandidatePairs`).
  *
  * Scale shape: the candidate set is Σ cell² instead of corpus² — pick
  * `numClusters` ∝ corpus size and the expected cell stays constant-sized,
  * so total pair work is LINEAR in the corpus. The cluster assignment is
  * the SAME artifact the IVF ANN index persists (`IvfAnn.cachedIndex`):
  * one k-means fit serves both search and dedup, which is how production
  * curation pipelines amortize it. Exact duplicates can never be missed
  * (identical vectors get identical assignments); near-dups straddling a
  * cell boundary are the approximation, as in the paper.
  */
object SemDedup {

  /** Exact-cosine pairs >= `minSim` within each cell of an assigned
    * corpus (`__cluster` column, e.g. from `IvfAnn.buildIndex` /
    * `cachedIndex`). Callers must pass a MATERIALIZED assignment (the
    * cached index is persisted) — a lazy one would recompute the k-means
    * pipeline under both sides of the self-join. */
  def pairsWithinCells(indexed: DataFrame, idCol: String, vecCol: String,
                       minSim: Double): DataFrame = {
    val a = indexed.select(col("__cluster"), col(idCol).as("id_a"), col(vecCol).as("__va"))
    val b = indexed.select(col("__cluster"), col(idCol).as("id_b"), col(vecCol).as("__vb"))
    a.join(b, Seq("__cluster"))
      .where(col("id_a") < col("id_b") &&
        round(VectorOps.cosine(col("__va"), col("__vb")), 6) >= lit(minSim))
      .select("id_a", "id_b")
  }

  /** Incremental within-cell pairs for a NEW vector batch against a
    * stored assignment (round 8 — the embedding twin of
    * `NearDup.incrementalHashPairs`): candidate pairs touching the batch
    * are new×new plus new×stored, found by a cell-local join — the
    * stored corpus is never re-paired against itself. Contract (the
    * q_dedup16 discipline, oracle-enforced by q_dedup21): the output
    * equals the FULL `pairsWithinCells` recompute over stored ∪ new,
    * restricted to pairs with at least one new id. Pairs are normalized
    * id_a < id_b regardless of which side is stored.
    *
    * Both inputs carry (`__cluster`, idCol, vecCol); ids must be
    * disjoint between the two sides (the store layer excludes a replayed
    * batch's own prior append before calling this). */
  def incrementalPairsWithinCells(newAssigned: DataFrame, stored: DataFrame,
                                  idCol: String, vecCol: String,
                                  minSim: Double): DataFrame = {
    // Drive the join from the NEW side only: per batch the join output is
    // |new ∩ cell| × |cell|, never the stored corpus against itself (a
    // tagged-union self-join filtered on "touches new" would materialize
    // every stored×stored candidate row per cell before discarding it —
    // the full quadratic the incremental path exists to avoid).
    val a = newAssigned.select(col("__cluster"), col(idCol).as("__id_n"),
      col(vecCol).as("__vn"))
    val b = newAssigned.select(col("__cluster"), col(idCol).as("__id_o"),
        col(vecCol).as("__vo"), lit(true).as("__isnew"))
      .unionByName(stored.select(col("__cluster"), col(idCol).as("__id_o"),
        col(vecCol).as("__vo"), lit(false).as("__isnew")))
    a.join(b, Seq("__cluster"))
      // new×new once (strict order); new×stored always (stored ids are
      // disjoint from the batch by the store-layer contract)
      .where((col("__isnew") && col("__id_n") < col("__id_o")) || !col("__isnew"))
      .where(round(VectorOps.cosine(col("__vn"), col("__vo")), 6) >= lit(minSim))
      .select(least(col("__id_n"), col("__id_o")).as("id_a"),
        greatest(col("__id_n"), col("__id_o")).as("id_b"))
  }

  /** End-to-end semantic dedup: within-cell pairs -> connected components
    * -> keep each component's minimum id (deterministic survivor), plus
    * all never-matched rows. `indexed` as in [[pairsWithinCells]]. */
  def survivors(indexed: DataFrame, idCol: String, vecCol: String,
                minSim: Double): DataFrame = {
    val comp = NearDup.connectedComponents(pairsWithinCells(indexed, idCol, vecCol, minSim))
    val losers = comp.where(col("v") =!= col("component")).select("v")
    indexed.join(losers, indexed(idCol) === losers("v"), "left_anti")
      .drop("__cluster")
  }
}
