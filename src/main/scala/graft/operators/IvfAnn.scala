package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** IVF (inverted-file) approximate nearest neighbor (north star,
  * /root/repo/BASELINE.json "similarity search"; SURVEY.md §2.B Q-SIM
  * family) — the second scale path for similarity search next to hyperplane LSH (Similarity.lshTopK):
  * a k-means coarse quantizer partitions the corpus into `numClusters`
  * cells; a query probes only its `nprobe` closest cells.
  *
  * Scale shape: index build is one MLlib k-means fit (sampled, iterative)
  * + one assignment pass; the index is just an int cluster id per row —
  * partition the corpus by it and a query touches nprobe/numClusters of
  * the data. Centroids are tiny (numClusters x dim) and broadcast.
  * Deterministic under a fixed seed.
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

  /** ANN top-k: probe the `nprobe` cells whose centroids are closest (by
    * cosine) to the query vector, brute-force only within them. */
  def topK(emb: DataFrame, idCol: String, vecCol: String,
           query: DataFrame, queryVecCol: String,
           k: Int, numClusters: Int, nprobe: Int, seed: Long = 42L): DataFrame = {
    val (indexed, centers) = buildIndex(emb, vecCol, numClusters, seed)
    val q = query.select(col(queryVecCol).as("__qv"))
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
}
