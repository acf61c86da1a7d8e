package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}
import graft.multimodal.Multimodal
import graft.operators.Similarity

/** Similarity search over embeddings + multimodal binary columns
  * (north star, BASELINE.json; SURVEY.md §2.B Q-SIM1–2).
  */
object SimMmQueries extends QueryModule {

  /** SQL twin of VectorOps.cosine: same double widening, same in-order
    * accumulation, same dot/(sqrt*sqrt) shape. */
  private def cosSql(a: String, b: String): String =
    s"(list_sum(list_transform(range(1, len($a)+1), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))) / " +
    s"(sqrt(list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * " +
    s"sqrt(list_sum(list_transform($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))))"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q-SIM1: brute-force cosine top-k against the vec_id=0 query vector.
    "q_sim1" -> ((s, d) => {
      val emb = Tables.load(s, d, "embeddings")
      Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        emb.where(col("vec_id") === 0), "embedding", k = 11)
        .orderBy(col("sim").desc, col("vec_id"))
    }),

    // Q-SIM2: all pairs above threshold within a label block.
    "q_sim2" -> ((s, d) =>
      Similarity.allPairsAboveThreshold(Tables.load(s, d, "embeddings"),
        "vec_id", "embedding", col("label"), minSim = 0.5)
        .orderBy("id_a", "id_b")),

    // LSH-bucketed ANN top-k (rows-only: approximate by construction;
    // recall vs brute force is property-tested).
    "q_sim3" -> ((s, d) => {
      val emb = Tables.load(s, d, "embeddings")
      Similarity.lshTopK(emb, "vec_id", "embedding",
        emb.where(col("vec_id") === 0), "embedding",
        k = 11, numPlanes = 8, dim = 64)
        .orderBy(col("sim").desc, col("vec_id"))
    }),

    // IVF-quantized ANN top-k (rows-only: k-means is approximate by
    // construction; recall vs brute force is unit-tested).
    "q_sim4" -> ((s, d) => {
      val emb = Tables.load(s, d, "embeddings")
      graft.operators.IvfAnn.topK(emb, "vec_id", "embedding",
        emb.where(col("vec_id") === 0), "embedding",
        k = 11, numClusters = 16, nprobe = 4)
        .orderBy(col("sim").desc, col("vec_id"))
    }),

    // Multimodal: opaque binary payload + typed metadata (oracle-checked).
    "q_mm1" -> ((s, d) =>
      Multimodal.withBinaryMeta(Tables.load(s, d, "documents"), "text")
        .select("doc_id", "n_bytes", "content_sha")
        .orderBy("doc_id")),

    // Multimodal: distributed frame-sampling + feature extraction over the
    // binary payload (decode stubbed; rows-only, unit-tested).
    "q_mm2" -> ((s, d) =>
      Multimodal.sampleFrames(
        Multimodal.withBinaryMeta(Tables.load(s, d, "documents"), "text"),
        stride = 64, frameSize = 16)
        .toDF().orderBy("doc_id", "frame_idx")),
  )

  def oracleSql: Map[String, String] = Map(
    "q_sim1" ->
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
         |SELECT vec_id, round(${cosSql("embedding", "qe")}, 6) AS sim
         |FROM embeddings, q
         |ORDER BY sim DESC, vec_id LIMIT 11""".stripMargin,
    "q_sim2" ->
      s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |  round(${cosSql("a.embedding", "b.embedding")}, 6) AS sim
         |FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
         |WHERE round(${cosSql("a.embedding", "b.embedding")}, 6) >= 0.5
         |ORDER BY id_a, id_b""".stripMargin,
    "q_mm1" ->
      """SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        |  sha256(text) AS content_sha
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
