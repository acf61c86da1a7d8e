package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PqAnnSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 64; private val m = 8; private val k = 16
  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")
  private lazy val books = PqAnn.fitCodebooks(emb, "embedding", dim, m, k)
  private lazy val codes = PqAnn.encode(emb, "vec_id", "embedding", books, dim, m)

  test("codebooks: m*k centers of subDim floats; codes: m one-byte codes in range") {
    val b = books.collect()
    assert(b.length === m * k)
    assert(b.forall(_.getSeq[Float](2).length === dim / m))
    val c = codes.as[(Long, Seq[Byte])].collect()
    assert(c.length === emb.count())
    assert(c.forall(_._2.length === m))
    assert(c.forall(_._2.forall(code => code >= 0 && code < k)))
  }

  test("encoding is deterministic under the fixed seed") {
    val again = PqAnn.encode(emb, "vec_id", "embedding",
      PqAnn.fitCodebooks(emb, "embedding", dim, m, k), dim, m)
      .as[(Long, Seq[Byte])].collect().toMap
    val first = codes.as[(Long, Seq[Byte])].collect().toMap
    assert(again === first)
  }

  test("ADC self-query: the query's own vector ranks first") {
    val top = PqAnn.probe(codes, books, "vec_id",
      emb.where(col("vec_id") === 7), "embedding", dim, m, k = 5)
      .as[(Long, Double)].collect()
    assert(top.head._1 === 7L,
      s"own vector not top-1 by ADC: ${top.toSeq}")
  }

  test("ADC recall vs exact L2 top-k clears the floor; ADC distance approximates true L2") {
    val q = emb.where(col("vec_id") === 0)
    val qv = broadcast(q.select(col("embedding").as("__qv")))
    val exact = emb.crossJoin(qv)
      .select(col("vec_id"), graft.functions.VectorOps.l2(col("embedding"), col("__qv")).as("d"))
      .orderBy(col("d").asc, col("vec_id")).limit(11)
      .as[(Long, Double)].collect()
    val exactIds = exact.map(_._1).toSet
    val adcTop = PqAnn.probe(codes, books, "vec_id", q, "embedding", dim, m, k = 11)
      .as[(Long, Double)].collect()
    val recall = adcTop.count(r => exactIds.contains(r._1)).toDouble / exactIds.size
    info(f"PQ recall@11 = $recall%.2f")
    assert(recall >= 0.3, f"ADC recall $recall%.2f below floor")
    // approximate distance tracks true distance: mean relative error of
    // sqrt(adc) vs true L2 over the whole corpus stays bounded
    val trueD = emb.crossJoin(qv)
      .select(col("vec_id"), graft.functions.VectorOps.l2(col("embedding"), col("__qv")).as("d"))
    val err = PqAnn.probe(codes, books, "vec_id", q, "embedding", dim, m, k = 500)
      .join(trueD, "vec_id")
      .where(col("d") > 0) // the query's own row has true distance 0
      .select(avg(abs(sqrt(col("adc_dist")) - col("d")) / col("d")).as("relerr"))
      .as[Double].head()
    info(f"mean relative ADC error = $err%.3f")
    assert(err < 0.35, f"ADC relative error $err%.3f too large")
  }

  test("IVF-PQ: results come only from probed cells and agree with full-scan ADC") {
    val (assignment, centers) = IvfAnn.buildIndex(emb, "embedding", numClusters = 16)
    val q = emb.where(col("vec_id") === 0)
    val ivfpq = PqAnn.probeIvf(codes, books, assignment, centers, "vec_id",
      q, "embedding", dim, m, k = 11, nprobe = 4)
      .as[(Long, Double)].collect()
    assert(ivfpq.length === 11)
    // consistency: each returned id's ADC distance equals the full-scan ADC
    val full = PqAnn.probe(codes, books, "vec_id", q, "embedding", dim, m, k = 500)
      .as[(Long, Double)].collect().toMap
    ivfpq.foreach { case (id, d) => assert(full(id) === d, s"ADC mismatch for $id") }
    // membership: every returned id sits in one of the query's 4 nearest cells
    val qv = broadcast(q.select(col("embedding").as("__qv")))
    val probedCells = centers.crossJoin(qv)
      .select(col("__cluster"),
        graft.functions.VectorOps.l2(col("__center"), col("__qv")).as("d"))
      .orderBy(col("d").asc, col("__cluster").asc).limit(4)
      .select("__cluster").as[Int].collect().toSet
    val cellOf = assignment.select(col("vec_id"), col("__cluster"))
      .as[(Long, Int)].collect().toMap
    ivfpq.foreach { case (id, _) =>
      assert(probedCells.contains(cellOf(id)), s"$id outside probed cells") }
    // the self-match sits in its own nearest cell, so it must surface
    assert(ivfpq.head._1 === 0L)
  }
}
