package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorOps
import graft.util.Memo

/** IVF (inverted-file) approximate nearest neighbor (north star,
  * /root/repo/BASELINE.json "similarity search"; SURVEY.md §2.B Q-SIM
  * family) — the second scale path for similarity search next to hyperplane
  * LSH (Similarity.lshTopK): a k-means coarse quantizer partitions the
  * corpus into `numClusters` cells; a query probes only its `nprobe`
  * closest cells.
  *
  * Scale shape: index BUILD (one MLlib k-means fit + one assignment pass)
  * and query PROBE are separate stages, as in any real IVF deployment —
  * build once, persist the cluster assignment, serve many queries against
  * it. [[cachedIndex]] is the in-process equivalent of the persisted index
  * table. Centroids are tiny (numClusters x dim) and broadcast. Probing
  * touches nprobe/numClusters of the data. Deterministic under a fixed
  * seed.
  */
object IvfAnn {

  /** Assign every row a cluster id under a freshly fit quantizer.
    * Returns (df + `__cluster`, centers as a broadcastable DataFrame). */
  def buildIndex(emb: DataFrame, vecCol: String, numClusters: Int,
                 seed: Long = 42L): (DataFrame, DataFrame) = {
    val spark = emb.sparkSession
    import spark.implicits._
    val feat = emb.withColumn("__features", array_to_vector(
      transform(col(vecCol), x => x.cast("double"))))
    val model = new KMeans().setK(numClusters).setSeed(seed)
      .setFeaturesCol("__features").setPredictionCol("__cluster")
      .fit(feat)
    val indexed = model.transform(feat).drop("__features")
    val centers = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.map(_.toFloat)) }
      .toSeq.toDF("__cluster", "__center")
    (indexed, centers)
  }

  /** [[buildIndex]], built at most once per (session, key, params), with
    * the assignment persisted + materialized — every later probe pays only
    * the probe. `key` names the corpus (e.g. its path). */
  def cachedIndex(spark: SparkSession, key: String, vecCol: String,
                  numClusters: Int, seed: Long = 42L)
                 (corpus: => DataFrame): (DataFrame, DataFrame) =
    Memo.cached(spark, s"ivf|$key|$vecCol|$numClusters|$seed") {
      val (indexed, centers) = buildIndex(corpus, vecCol, numClusters, seed)
      val p = indexed.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      p.count()
      (p, centers.localCheckpoint())
    }

  /** Assign vectors to an EXISTING index's cells without refitting — the
    * arrival path for new embeddings (the ANN mirror of
    * `NearDup.incrementalLshCandidates`): broadcast the tiny centroid
    * table, one scan of the batch, `row_number = 1` per vector on squared-
    * distance order (k-means' own assignment criterion; ties break to the
    * lowest cell id). Output = input columns + `__cluster`, union-able
    * with the stored assignment. */
  def assignToIndex(vecs: DataFrame, idCol: String, vecCol: String,
                    centers: DataFrame): DataFrame = {
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("__d").asc, col("__cluster").asc)
    vecs.crossJoin(broadcast(centers))
      .withColumn("__d", VectorOps.l2(col(vecCol), col("__center")))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__d", "__rn", "__center")
  }

  /** ANN top-k against a prebuilt index: rank cells by centroid cosine to
    * the query vector, brute-force only within the top `nprobe` cells.
    * `query` must have exactly one row (asserted) — for query batches use
    * [[Similarity.topKForQueries]]-style per-query windowing instead of a
    * global limit, which would silently mix cells across queries. */
  def probe(indexed: DataFrame, centers: DataFrame, idCol: String,
            vecCol: String, query: DataFrame, queryVecCol: String,
            k: Int, nprobe: Int): DataFrame = {
    val q = Similarity.requireSingleRow(query, "IvfAnn.probe")
      .select(col(queryVecCol).as("__qv"))
    // rank cells by centroid similarity to the query (tiny cross join)
    val probed = centers.crossJoin(broadcast(q))
      .select(col("__cluster"), col("__qv"),
        VectorOps.cosine(col("__center"), col("__qv")).as("__csim"))
      .orderBy(col("__csim").desc, col("__cluster"))
      .limit(nprobe)
      .select("__cluster", "__qv")
    indexed.join(broadcast(probed), "__cluster")
      .select(col(idCol), round(VectorOps.cosine(col(vecCol), col("__qv")), 6).as("sim"))
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** Batched IVF probe: serve a whole QUERY BATCH against the index in
    * one pass — the production shape (per-query probing would launch one
    * job per query). The (queries x centroids) ranking is a broadcast
    * cross join of two tiny tables; each query's top `nprobe` cells
    * become a broadcast semi-filter on the assignment, so the corpus scan
    * touches only cells some query probes, and `topKPerGroup` ranks per
    * query (WindowGroupLimit — never a global limit mixing queries).
    * Agreement with the single-query [[probe]] is property-tested. */
  def probeBatch(indexed: DataFrame, centers: DataFrame, idCol: String,
                 vecCol: String, queries: DataFrame, queryIdCol: String,
                 queryVecCol: String, k: Int, nprobe: Int): DataFrame = {
    val q = queries.select(col(queryIdCol).as("query_id"), col(queryVecCol).as("__qv"))
    val cells = Similarity.topKPerGroup(
        centers.crossJoin(broadcast(q))
          .select(col("query_id"), col("__qv"), col("__cluster"),
            VectorOps.cosine(col("__center"), col("__qv")).as("__csim")),
        Seq("query_id"), Seq(col("__csim").desc, col("__cluster").asc), nprobe)
      .select("query_id", "__qv", "__cluster")
    Similarity.topKPerGroup(
        indexed.join(broadcast(cells), "__cluster")
          .select(col("query_id"), col(idCol),
            round(VectorOps.cosine(col(vecCol), col("__qv")), 6).as("sim")),
        Seq("query_id"), Seq(col("sim").desc, col(idCol).asc), k)
      .select("query_id", idCol, "sim", "rn")
  }

  /** One-shot build + probe (tests / ad-hoc use; production and the bench
    * go through [[cachedIndex]] + [[probe]]). */
  def topK(emb: DataFrame, idCol: String, vecCol: String,
           query: DataFrame, queryVecCol: String,
           k: Int, numClusters: Int, nprobe: Int, seed: Long = 42L): DataFrame = {
    val (indexed, centers) = buildIndex(emb, vecCol, numClusters, seed)
    probe(indexed, centers, idCol, vecCol, query, queryVecCol, k, nprobe)
  }
}
