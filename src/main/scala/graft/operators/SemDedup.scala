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
