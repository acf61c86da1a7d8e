package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** Graph-based ANN (NSW-class — the single-layer navigable-small-world
  * core of HNSW, round 10): completes the ANN family at the
  * recall-vs-probe-count frontier next to IVF (memory/partition axis,
  * [[IvfAnn]]) and PQ (bandwidth axis, [[PqAnn]]). A query greedily walks
  * a proximity GRAPH instead of scanning cells: per hop it expands the
  * current beam's neighbor lists, rescores only those candidates, and
  * keeps the best `beamWidth` — probe cost is
  * O(rounds · beamWidth · M) similarity evaluations, independent of the
  * corpus size.
  *
  * BUILD (offline, partitioned — the 100 TB shape): an exact kNN graph is
  * O(n²), so neighbor lists are built WITHIN IVF cells (the
  * `SemDedup.pairsWithinCells` bounded-block contract: the within-cell
  * self-join is the declared cost, parallel across cells), then stitched
  * navigable by a small long-range mesh: each cell's ENTRY POINT (its
  * vector nearest the centroid) links to every other cell's entry —
  * ≤ cells² extra edges, so the beam can cross cells the way HNSW's upper
  * layers route between regions. The adjacency ships as a plain parquet
  * table ([[IndexStore.writeNsw]]; at cluster scale `bucketBy(src)` so
  * each hop's frontier join co-locates).
  *
  * PROBE: iterative frontier expansion — the distributed formulation of
  * the greedy beam: the (≤ beamWidth)-row frontier broadcast-joins the
  * src-keyed adjacency, new candidates rescore against the broadcast
  * query, the best beamWidth continue. Deterministic (ties → lower id).
  *
  * Approximate by design ⇒ rows-only query (the q_sim3 contract): recall
  * is EMITTED AS DATA via [[Similarity.withRecallAgainst]] and floors are
  * spec-asserted against the brute-force truth. */
object NswAnn {

  /** Build the navigable graph over an IVF-assigned corpus
    * (`indexed` = corpus + `__cluster`, `centers` = (__cluster, __center)).
    * Returns (neighbors(src, dst, sim), entries(__cluster, entry_id)):
    * per-vector top-`m` within-cell neighbors plus the inter-cell
    * entry-point mesh, edges directed (both directions present). */
  def buildGraph(indexed: DataFrame, centers: DataFrame, idCol: String,
                 vecCol: String, m: Int): (DataFrame, DataFrame) = {
    require(m >= 1, s"m must be >= 1, got $m")
    val base = indexed.select(col("__cluster"), col(idCol).as("__id"),
      col(vecCol).as("__v"))
    val a = base.select(col("__cluster"), col("__id").as("src"), col("__v").as("__va"))
    val b = base.select(col("__cluster"), col("__id").as("dst"), col("__v").as("__vb"))
    val withinCell = Similarity.topKPerGroup(
      a.join(b, Seq("__cluster")).where(col("src") =!= col("dst"))
        .select(col("src"), col("dst"),
          VectorOps.cosine(col("__va"), col("__vb")).as("sim")),
      Seq("src"), Seq(col("sim").desc, col("dst").asc), m)
      .drop("rn")
    // entry point per cell: the vector nearest its own centroid
    val entries = Similarity.topKPerGroup(
      base.join(broadcast(centers), Seq("__cluster"))
        .select(col("__cluster"), col("__id"),
          VectorOps.cosine(col("__v"), col("__center")).as("__cs")),
      Seq("__cluster"), Seq(col("__cs").desc, col("__id").asc), 1)
      .select(col("__cluster"), col("__id").as("entry_id"))
    // long-range mesh: every entry links to every other entry (<= cells²
    // edges — the cross-region routing HNSW's upper layers provide)
    val ev = entries.join(base, entries("entry_id") === base("__id"))
      .select(col("entry_id"), col("__v"))
    val mesh = ev.select(col("entry_id").as("src"), col("__v").as("__va"))
      .crossJoin(ev.select(col("entry_id").as("dst"), col("__v").as("__vb")))
      .where(col("src") =!= col("dst"))
      .select(col("src"), col("dst"),
        VectorOps.cosine(col("__va"), col("__vb")).as("sim"))
    (withinCell.unionByName(mesh)
       .groupBy("src", "dst").agg(max(col("sim")).as("sim")),
      entries)
  }

  /** Greedy beam probe: start from every cell entry, expand `rounds`
    * hops, return the top `k` visited by query similarity. `query` must
    * be a single row (asserted). */
  def probe(neighbors: DataFrame, entries: DataFrame, emb: DataFrame,
            idCol: String, vecCol: String, query: DataFrame,
            queryVecCol: String, k: Int, beamWidth: Int = 16,
            rounds: Int = 3): DataFrame = {
    require(k >= 1 && beamWidth >= 1 && rounds >= 1)
    val q = Similarity.requireSingleRow(query, "NswAnn.probe")
      .select(col(queryVecCol).as("__qv"))
    val vecs = emb.select(col(idCol).as("__id"), col(vecCol).as("__v"))
    def score(ids: DataFrame): DataFrame = ids
      .join(vecs, Seq("__id"))
      .crossJoin(broadcast(q))
      .select(col("__id"), VectorOps.cosine(col("__v"), col("__qv")).as("sim"))
    var visited = score(entries.select(col("entry_id").as("__id")).distinct())
      .localCheckpoint()
    // Classic best-first beam: each hop expands the best `beamWidth` of
    // EVERYTHING visited that has not been expanded yet (not just the
    // nodes scored last hop) — a hop that surfaces few/poor fresh
    // candidates cannot shrink or degrade the beam.
    var expanded = visited.select("__id").limit(0).localCheckpoint()
    var r = 0
    while (r < rounds) {
      val frontier = visited
        .join(expanded, Seq("__id"), "left_anti")
        .orderBy(col("sim").desc, col("__id").asc)
        .limit(beamWidth)
        .localCheckpoint()
      val fresh = broadcast(frontier.select(col("__id").as("src")))
        .join(neighbors, Seq("src"))
        .select(col("dst").as("__id")).distinct()
        .join(visited.select("__id"), Seq("__id"), "left_anti")
      val scored = score(fresh).localCheckpoint()
      visited = visited.unionByName(scored).localCheckpoint()
      expanded = expanded.unionByName(frontier.select("__id")).localCheckpoint()
      r += 1
    }
    visited
      .select(col("__id").as(idCol), col("sim"))
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(k)
  }
}
