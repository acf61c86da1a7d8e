package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorOps
import graft.util.Memo

/** Product quantization (PQ) for embedding search — the third scale path
  * next to hyperplane LSH (`Similarity.lshTopK`) and IVF (`IvfAnn`),
  * completing the classic IVF/LSH/PQ ANN toolbox: vectors are split into
  * `m` subspaces, each subspace gets its own tiny k-means codebook
  * (`k <= 256` codes), and a vector is stored as `m` one-byte codes —
  * dim=64 float32 (256 B) becomes 8 B at m=8, a 32x compression, which is
  * what makes 100 TB embedding corpora scannable at all.
  *
  * Query-time scoring is ADC (asymmetric distance computation): the query
  * stays un-quantized; per subspace a k-entry table of squared distances
  * from the query subvector to each codebook center is computed on the
  * m*k-row codebook frame (tiny, broadcast), and a stored vector's
  * approximate squared L2 distance is the sum of its codes' table
  * entries — the corpus is never decoded.
  *
  * Scale shape: fit touches the corpus m times (once per subspace k-means;
  * at real scale fit on a sample — the codebook does not need every row),
  * encode is one explode (m rows per vector) + broadcast codebook join +
  * two map-side-combined aggregations (min-by per subspace, collect per
  * vector) — no window over unbounded partitions, no driver collect.
  * Probe is one scan of the 8-byte codes with a broadcast m*k table.
  * Deterministic under a fixed seed.
  */
object PqAnn {

  /** Fit per-subspace codebooks. Returns an m*k-row broadcastable frame
    * `(__subspace, __code, __center)`. `dim` must be divisible by `m`. */
  def fitCodebooks(emb: DataFrame, vecCol: String, dim: Int, m: Int, k: Int,
                   seed: Long = 42L): DataFrame = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    require(k <= 256, s"k $k exceeds one-byte code range")
    val spark = emb.sparkSession
    import spark.implicits._
    val subDim = dim / m
    val books = (0 until m).flatMap { j =>
      val sub = emb.select(array_to_vector(transform(
        slice(col(vecCol), j * subDim + 1, subDim),
        x => x.cast("double"))).as("__features"))
      val model = new KMeans().setK(k).setSeed(seed + j)
        .setFeaturesCol("__features").setPredictionCol("__p").fit(sub)
      model.clusterCenters.zipWithIndex.map { case (c, code) =>
        (j, code, c.toArray.map(_.toFloat))
      }
    }
    books.toDF("__subspace", "__code", "__center")
  }

  /** Encode every vector as `m` one-byte codes: explode into subvectors,
    * broadcast-join the codebook, keep the nearest code per subspace via
    * `min(struct(dist, code))` (map-side combined — never a window), and
    * re-assemble codes in subspace order. Output: (idCol, __codes). */
  def encode(emb: DataFrame, idCol: String, vecCol: String,
             codebooks: DataFrame, dim: Int, m: Int): DataFrame = {
    val subDim = dim / m
    val subs = emb.select(col(idCol),
      posexplode(transform(sequence(lit(0), lit(m - 1)),
        j => slice(col(vecCol), j * subDim + lit(1), lit(subDim)))))
      .select(col(idCol), col("pos").as("__subspace"), col("col").as("__subvec"))
    subs.join(broadcast(codebooks), Seq("__subspace"))
      .select(col(idCol), col("__subspace"), col("__code"),
        VectorOps.l2(col("__subvec"), col("__center")).as("__d"))
      .groupBy(col(idCol), col("__subspace"))
      .agg(min(struct(col("__d"), col("__code"))).getField("__code").as("__c"))
      .groupBy(col(idCol))
      .agg(transform(sort_array(collect_list(struct(col("__subspace"), col("__c")))),
        s => s.getField("__c").cast("tinyint")).as("__codes"))
  }

  /** Codebooks + encoded corpus, built once per (session, key, params) and
    * persisted — the stored form of the index; probes pay only the scan. */
  def cachedCodes(spark: SparkSession, key: String, idCol: String, vecCol: String,
                  dim: Int, m: Int, k: Int, seed: Long = 42L)
                 (corpus: => DataFrame): (DataFrame, DataFrame) =
    Memo.cached(spark, s"pq|$key|$idCol|$vecCol|$dim|$m|$k|$seed") {
      val c = corpus
      val books = fitCodebooks(c, vecCol, dim, m, k, seed).localCheckpoint()
      val codes = encode(c, idCol, vecCol, books, dim, m)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      codes.count()
      (books, codes)
    }

  /** The per-query ADC distance table: for each (subspace, code), the
    * squared L2 distance from the query's subvector to that code's
    * center — m*k rows, broadcastable. */
  private def adcTable(codebooks: DataFrame, q: DataFrame, subDim: Int): DataFrame =
    codebooks.crossJoin(broadcast(q))
      .select(col("__subspace"), col("__code"),
        VectorOps.l2(col("__center"),
          slice(col("__qv"), col("__subspace") * subDim + lit(1), lit(subDim))).as("__l2"))
      .select(col("__subspace"), col("__code"), (col("__l2") * col("__l2")).as("__d"))

  /** Sum table entries over each vector's codes → approximate squared L2,
    * ascending top-k, ties to the lower id. */
  private def adcTopK(codes: DataFrame, dtable: DataFrame, idCol: String,
                      k: Int): DataFrame =
    codes.select(col(idCol), posexplode(col("__codes")))
      .select(col(idCol), col("pos").as("__subspace"), col("col").cast("int").as("__code"))
      .join(broadcast(dtable), Seq("__subspace", "__code"))
      .groupBy(col(idCol))
      .agg(sum(col("__d")).as("adc_dist"))
      .select(col(idCol), round(col("adc_dist"), 6).as("adc_dist"))
      .orderBy(col("adc_dist").asc, col(idCol).asc)
      .limit(k)

  /** ADC top-k over the WHOLE code table: one scan of the 8-byte codes
    * with a broadcast m*k distance table. */
  def probe(codes: DataFrame, codebooks: DataFrame, idCol: String,
            query: DataFrame, queryVecCol: String, dim: Int, m: Int,
            k: Int): DataFrame = {
    val q = Similarity.requireSingleRow(query, "PqAnn.probe")
      .select(col(queryVecCol).as("__qv"))
    adcTopK(codes, adcTable(codebooks, q, dim / m), idCol, k)
  }

  /** IVF-PQ — the canonical billion-scale ANN layout: the IVF coarse
    * quantizer picks the query's `nprobe` nearest cells (tiny broadcast
    * centroid ranking, same criterion as the assignment: squared L2),
    * and ADC scores only the codes of vectors IN those cells — touching
    * nprobe/numClusters of the corpus, each row 8 bytes. `assignment`
    * is the IVF index's (idCol, __cluster) table ([[IvfAnn.cachedIndex]]);
    * `centers` its (__cluster, __center) centroids. */
  def probeIvf(codes: DataFrame, codebooks: DataFrame,
               assignment: DataFrame, centers: DataFrame, idCol: String,
               query: DataFrame, queryVecCol: String, dim: Int, m: Int,
               k: Int, nprobe: Int): DataFrame = {
    val q = Similarity.requireSingleRow(query, "PqAnn.probeIvf")
      .select(col(queryVecCol).as("__qv"))
    val cells = centers.crossJoin(broadcast(q))
      .select(col("__cluster"), VectorOps.l2(col("__center"), col("__qv")).as("__cd"))
      .orderBy(col("__cd").asc, col("__cluster").asc)
      .limit(nprobe)
      .select("__cluster")
    val inCells = assignment.select(col(idCol), col("__cluster"))
      .join(broadcast(cells), Seq("__cluster"))
      .select(idCol)
    adcTopK(codes.join(inCells, Seq(idCol)), adcTable(codebooks, q, dim / m), idCol, k)
  }
}
