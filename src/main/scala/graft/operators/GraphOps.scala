package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Graph-analytics operators over edge lists — the authority-scoring leg
  * of a web-curation pipeline (a page's rank is the classic quality prior
  * used to weight crawled documents before training; reference computes no
  * graph metrics, this is the scale-path extension).
  *
  * Design: vertices and edges stay distributed end-to-end; each PageRank
  * iteration is ONE shuffle (group contributions by destination) plus an
  * equi-join on the source — no driver-side adjacency, no collect. The
  * per-iteration plan is truncated with `localCheckpoint` so the lineage
  * (and the optimizer's input) stays O(1) in the iteration count — the
  * standard guard for iterative DataFrame jobs.
  */
object GraphOps {

  // Fail fast on null endpoints: a null id would silently vanish from
  // every equi-join in the iteration — a truncated graph, not an error
  // (the same silent-drop class as the compactPartitioned null-partition
  // fix). Shared by both rank variants.
  private def checkedEdges(edges: DataFrame, srcCol: String,
                           dstCol: String): DataFrame = {
    def nonNull(c: Column, name: String) =
      when(c.isNull, raise_error(lit(s"null $name edge endpoint"))).otherwise(c)
    edges.select(nonNull(col(srcCol).cast("long"), srcCol).as("__src"),
      nonNull(col(dstCol).cast("long"), dstCol).as("__dst"))
  }

  /** Deterministic integer-arithmetic PageRank: ranks carried in micro
    * units (BIGINT), initialized at 1e6 per vertex, updated for a FIXED
    * number of iterations as
    *
    *   pr'(v) = (100-d)·1e4  +  (d · Σ_{u→v} (pr(u) div outdeg(u))) div 100
    *
    * with damping d expressed in percent. Every operation is integer
    * (truncating division on non-negative values), so the result is
    * bitwise identical in any engine — no float accumulation anywhere.
    * Dangling vertices (no out-edges) leak their mass, the standard
    * simplification when ranks are used as a RELATIVE quality signal.
    * Self-loops and parallel edges are honored as given; dedup edges
    * upstream if multiplicity should not count.
    *
    * Returns (vertex, pr_micro) for every vertex appearing in the edge
    * list. Convergence for relative ordering is fast (5–10 iterations);
    * the caller picks the count, which the oracle twin unrolls. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int, dampingPct: Int = 85): DataFrame = {
    require(iterations >= 0, s"iterations must be >= 0, got $iterations")
    require(dampingPct >= 0 && dampingPct <= 100,
      s"dampingPct must be in [0,100], got $dampingPct")
    val e = checkedEdges(edges, srcCol, dstCol)
      .localCheckpoint() // reused every iteration: materialize once
    val verts = e.select(col("__src").as("vertex"))
      .union(e.select(col("__dst").as("vertex")))
      .distinct().localCheckpoint()
    val outdeg = e.groupBy("__src").agg(count(lit(1)).as("__outdeg"))
      .localCheckpoint()
    val basePr = lit((100L - dampingPct) * 10000L)
    var pr = verts.withColumn("pr_micro", lit(1000000L))
    for (_ <- 1 to iterations) {
      // contributions: pr(u) div outdeg(u) routed along each edge, then
      // partially aggregated map-side by groupBy(dst) — one shuffle/iter
      val contrib = e
        .join(pr.select(col("vertex").as("__src"), col("pr_micro")), Seq("__src"))
        .join(outdeg, Seq("__src"))
        .select(col("__dst"), expr("pr_micro div __outdeg").as("__c"))
        .groupBy("__dst").agg(sum(col("__c")).as("__s"))
      pr = verts
        .join(contrib.withColumnRenamed("__dst", "vertex"), Seq("vertex"), "left_outer")
        .select(col("vertex"),
          (basePr + expr(s"($dampingPct * coalesce(__s, 0L)) div 100"))
            .cast("long").as("pr_micro"))
        .localCheckpoint() // truncate lineage: O(1) plan per iteration
    }
    pr
  }

  /** Personalized PageRank — [[pageRank]] with the teleport mass pinned to
    * a SEED set instead of spread uniformly: scores become graph proximity
    * to the seeds (the data-discovery op: "expand this curated set" —
    * rank everything by closeness to the documents/domains you already
    * trust). Same integer arithmetic, same per-iteration shape; the only
    * change is the base term:
    *
    *   base(v) = ((100-d)·1e4 · |V|) div |S|   if v ∈ seeds, else 0
    *
    * (total teleport mass matches [[pageRank]]'s (100-d)% of |V|·1e6, so
    * scores are comparable across the two). Init is the teleport vector
    * itself. The two counts are driver-side scalars — a setup decision
    * like the BPE argmax, not per-row data movement. Seeds not present in
    * the edge list still emit (isolated seeds keep their base mass). */
  def personalizedPageRank(edges: DataFrame, srcCol: String, dstCol: String,
                           seeds: DataFrame, seedCol: String,
                           iterations: Int, dampingPct: Int = 85): DataFrame = {
    require(iterations >= 0, s"iterations must be >= 0, got $iterations")
    require(dampingPct >= 0 && dampingPct <= 100,
      s"dampingPct must be in [0,100], got $dampingPct")
    val e = checkedEdges(edges, srcCol, dstCol).localCheckpoint()
    val sd = seeds.select(col(seedCol).cast("long").as("vertex"))
      .distinct().localCheckpoint()
    val verts = e.select(col("__src").as("vertex"))
      .union(e.select(col("__dst").as("vertex")))
      .union(sd.select(col("vertex")))
      .distinct().localCheckpoint()
    val nV = verts.count()
    val nS = sd.count()
    require(nS > 0, "seed set must be non-empty")
    val base = ((100L - dampingPct) * 10000L * nV) / nS
    val outdeg = e.groupBy("__src").agg(count(lit(1)).as("__outdeg"))
      .localCheckpoint()
    val teleport = verts
      .join(sd.withColumn("__isSeed", lit(1)), Seq("vertex"), "left_outer")
      .select(col("vertex"),
        when(col("__isSeed").isNotNull, lit(base)).otherwise(lit(0L))
          .as("__base"))
      .localCheckpoint()
    var pr = teleport.select(col("vertex"), col("__base").as("pr_micro"))
    for (_ <- 1 to iterations) {
      val contrib = e
        .join(pr.select(col("vertex").as("__src"), col("pr_micro")), Seq("__src"))
        .join(outdeg, Seq("__src"))
        .select(col("__dst"), expr("pr_micro div __outdeg").as("__c"))
        .groupBy("__dst").agg(sum(col("__c")).as("__s"))
      pr = teleport
        .join(contrib.withColumnRenamed("__dst", "vertex"), Seq("vertex"), "left_outer")
        .select(col("vertex"),
          (col("__base") + expr(s"($dampingPct * coalesce(__s, 0L)) div 100"))
            .cast("long").as("pr_micro"))
        .localCheckpoint()
    }
    pr
  }
}
