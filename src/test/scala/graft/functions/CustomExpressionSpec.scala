package graft.functions

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class CustomExpressionSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.load(spark, sf, "embeddings")

  test("CosineSimilarity expression is bitwise-identical to the HOF fold") {
    val q = emb.where(col("vec_id") === 0).select(col("embedding").as("q"))
    val diffs = emb.crossJoin(broadcast(q))
      .select(VectorOps.cosine(col("embedding"), col("q")).as("fast"),
        VectorOps.cosineHof(col("embedding"), col("q")).as("ref"))
      .where(col("fast") =!= col("ref")) // bitwise: any ulp diff counts
      .count()
    assert(diffs === 0L)
  }

  test("CosineSimilarity nulls on length mismatch") {
    val df = Seq((Array(1.0f, 2.0f), Array(1.0f))).toDF("a", "b")
    assert(df.select(CosineSimilarity(col("a"), col("b"))).head().isNullAt(0))
  }

  test("DotProduct is bitwise-identical to the HOF fold across element types") {
    // float x double: the lshBucket shape (embedding . literal hyperplane)
    val plane = graft.operators.Similarity.hyperplanes(1, 64)
    val fd = emb.select(
        VectorOps.dot(col("embedding"), element_at(plane, 1)).as("fast"),
        VectorOps.dotHof(col("embedding"), element_at(plane, 1)).as("ref"))
      .where(col("fast") =!= col("ref")).count()
    assert(fd === 0L)
    // tinyint x tinyint: the int8-quantized path
    val q8 = emb.select(VectorOps.quantizeInt8(col("embedding")).as("q"))
    val tt = q8.crossJoin(broadcast(
        q8.limit(1).select(col("q").as("p"))))
      .select(VectorOps.dot(col("q"), col("p")).as("fast"),
        VectorOps.dotHof(col("q"), col("p")).as("ref"))
      .where(col("fast") =!= col("ref")).count()
    assert(tt === 0L)
    // and cosineInt8's fused form matches its previous HOF formulation
    val ci = q8.crossJoin(broadcast(q8.limit(1).select(col("q").as("p"))))
      .select(VectorOps.cosineInt8(col("q"), col("p")).as("fast"),
        (VectorOps.dotHof(col("q"), col("p")) /
          nullif(VectorOps.norm2(col("q")) * VectorOps.norm2(col("p")), lit(0.0))).as("ref"))
      .where(col("fast") =!= col("ref")).count()
    assert(ci === 0L)
  }

  test("L2Distance is bitwise-identical to the HOF fold") {
    val q = emb.where(col("vec_id") === 0).select(col("embedding").as("q"))
    val diffs = emb.crossJoin(broadcast(q))
      .select(VectorOps.l2(col("embedding"), col("q")).as("fast"),
        VectorOps.l2Hof(col("embedding"), col("q")).as("ref"))
      .where(col("fast") =!= col("ref")).count()
    assert(diffs === 0L)
  }

  test("SortedLongIntersectCount matches array_intersect cardinality") {
    val df = Seq(
      (Array(1L, 3L, 5L, 9L), Array(2L, 3L, 9L, 11L)),
      (Array[Long](), Array(1L, 2L)),
      (Array(4L, 8L), Array(4L, 8L))
    ).toDF("a", "b")
    val rows = df.select(
      SortedLongIntersectCount(col("a"), col("b")).as("fast"),
      size(array_intersect(col("a"), col("b"))).as("ref"))
      .as[(Int, Int)].collect()
    rows.foreach { case (fast, ref) => assert(fast === ref) }
  }

  test("RollingPolynomialHash is bit-identical to the HOF fold") {
    import graft.operators.TextOps
    val docs = Tables.load(spark, sf, "documents")
    val diff = docs.select(
        TextOps.rollingFingerprint(TextOps.tokens(col("text"))).as("fast"),
        TextOps.rollingFingerprintHof(TextOps.tokens(col("text"))).as("ref"))
      .where(col("fast") =!= col("ref")).count()
    assert(diff === 0L)
  }

  test("custom expressions are SQL-callable via GraftExtensions") {
    emb.createOrReplaceTempView("emb_view")
    val viaSql = spark.sql(
      """SELECT vec_id, cosine_similarity(embedding, embedding) AS s
        |FROM emb_view ORDER BY vec_id LIMIT 5""".stripMargin)
      .as[(Long, Double)].collect()
    assert(viaSql.length === 5)
    viaSql.foreach { case (_, s) => assert(math.abs(s - 1.0) < 1e-9) }
    val ic = spark.sql(
      "SELECT sorted_long_intersect_count(array(1L, 2L, 3L), array(2L, 3L, 4L))")
      .as[Int].head()
    assert(ic === 2)
  }

  test("round-7 expressions are SQL-callable: l2, nfc, accents, rolling hash, sign_project") {
    val l2 = spark.sql(
      "SELECT l2_distance(array(CAST(0.0 AS FLOAT), CAST(3.0 AS FLOAT)), " +
        "array(CAST(4.0 AS FLOAT), CAST(0.0 AS FLOAT)))").as[Double].head()
    assert(l2 === 5.0)
    // e + COMBINING ACUTE normalizes to the precomposed e-acute; the
    // accent strip then drops the mark entirely
    val (nfc, stripped) = spark.sql(
      "SELECT nfc_normalize('café'), strip_accents('café')")
      .as[(String, String)].head()
    assert(nfc === "café" && stripped === "cafe")
    val (h1, h2) = spark.sql(
      "SELECT rolling_token_hash(array('a','b')), rolling_token_hash(array('b','a'))")
      .as[(Long, Long)].head()
    assert(h1 !== h2, "order must matter")
    val proj = spark.sql(
      "SELECT sign_project(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT), " +
        "CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)), 4, 2)")
      .collect()(0).getSeq[Float](0)
    assert(proj.length === 2)
    val bad = intercept[Exception] {
      spark.sql("SELECT sign_project(array(CAST(1.0 AS FLOAT)), 1, id) FROM range(1)")
        .collect()
    }
    assert(bad.getMessage.toLowerCase.contains("literal"))
  }
}
