package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Skew mitigation + IVF ANN: result-equivalence and recall checks. */
class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin produces exactly the rows of the plain join") {
    val orders = Tables.load(spark, sf, "orders")
    val customer = Tables.load(spark, sf, "customer")
    val plain = orders.join(customer, orders("o_custkey") === customer("c_custkey"))
      .select("o_orderkey", "c_name")
    val salted = SkewOps.saltedJoin(orders, customer.withColumnRenamed("c_custkey", "o_custkey"),
      "o_custkey", buckets = 8)
      .select("o_orderkey", "c_name")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }

  test("saltedJoin left-outer keeps unmatched rows exactly once") {
    val l = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "lv")
    val r = Seq((1L, "x")).toDF("k", "rv")
    val out = SkewOps.saltedJoin(l, r, "k", buckets = 4, joinType = "left")
      .select("k", "lv", "rv").as[(Long, String, Option[String])].collect().sortBy(_._1)
    assert(out === Seq((1L, "a", Some("x")), (2L, "b", None), (3L, "c", None)))
  }

  test("twoPhaseSum equals the direct aggregation") {
    val li = Tables.load(spark, sf, "lineitem")
    val direct = li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_rows"), sum("l_quantity").as("sum_l_quantity"))
      .as[(String, Long, Double)].collect().map(t => t._1 -> ((t._2, math.round(t._3 * 100)))).toMap
    val salted = SkewOps.twoPhaseSum(li, Seq("l_returnflag"), Seq("l_quantity"), 8)
      .as[(String, Long, Double)].collect().map(t => t._1 -> ((t._2, math.round(t._3 * 100)))).toMap
    assert(salted === direct)
  }

  test("skewReport surfaces the hot key with exact counts and ratios") {
    val rows = (1 to 80).map(_ => (7L, "x")) ++ (1 to 10).map(i => (i + 100L, "y")) ++
      Seq((200L, "z"), (200L, "z"))
    val df = rows.toDF("user", "v")
    val top = SkewOps.skewReport(df, "user", topK = 3).collect()
    // 12 keys, 92 rows; hot key 7 has 80 rows
    assert(top.length === 3)
    assert(top(0).getLong(0) === 7L && top(0).getLong(1) === 80L)
    assert(top(0).getLong(2) === 92L && top(0).getLong(3) === 12L)
    assert(top(0).getDouble(4) === 80.0 / 92.0)
    assert(top(0).getDouble(5) === 80.0 * 12.0 / 92.0)
    // #2 is key 200 (cnt 2); #3 is the SMALLEST of the cnt-1 keys (tie-break)
    assert(top(1).getLong(0) === 200L && top(1).getLong(1) === 2L)
    assert(top(2).getLong(0) === 101L && top(2).getLong(1) === 1L)
  }

  test("giniByGroup: even spread is 0, single-owner approaches 1, zero-total is null") {
    val df = Seq(
      // group e: four equal keys -> G = (2*(1+2+3+4)*5 - 5*20) / (4*20) = 0
      ("e", 1L, 5L), ("e", 2L, 5L), ("e", 3L, 5L), ("e", 4L, 5L),
      // group o: one key owns all of it -> G = (n-1)/n = 3/4
      ("o", 1L, 0L), ("o", 2L, 0L), ("o", 3L, 0L), ("o", 4L, 12L),
      // group z: zero total -> null, never NaN
      ("z", 1L, 0L), ("z", 2L, 0L)).toDF("g", "k", "x")
    val got = SkewOps.giniByGroup(df, "g", "k", "x").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(2)) null else r.getDouble(2))).toMap
    assert(got === Map("e" -> 0.0, "o" -> 0.75, "z" -> null))
  }

  test("batchByRange equals the single-partition window form on a unique key") {
    val src = Tables.load(spark, sf, "orders").select("o_orderkey")
    val fact = Batching.batchByRange(src, col("o_orderkey"), size = 700)
      .as[(Long, Long)].collect().sortBy(_._1)
    val dim = Batching.withBatchNum(src, "o_orderkey", 700)
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(fact === dim)
    // batch sizes: every batch exactly `size` except the last
    val sizes = fact.groupBy(_._2).map { case (b, rs) => b -> rs.length }
    val lastBatch = sizes.keys.max
    sizes.foreach { case (b, n) => if (b != lastBatch) assert(n === 700) }
  }

  test("assignToIndex reproduces the quantizer's own cell assignment") {
    val emb = Tables.load(spark, sf, "embeddings")
    val (indexed, centers) = IvfAnn.buildIndex(emb, "embedding", numClusters = 8)
    val stored = indexed.select(col("vec_id"), col("__cluster"))
      .as[(Long, Int)].collect().toMap
    val reassigned = IvfAnn.assignToIndex(emb, "vec_id", "embedding", centers)
      .select(col("vec_id"), col("__cluster")).as[(Long, Int)].collect().toMap
    assert(reassigned.keySet === stored.keySet)
    // centers are float-rounded in the index table, so a vector sitting on
    // a cell boundary could legitimately flip; demand near-total agreement
    val agree = stored.count { case (id, c) => reassigned(id) == c }
    assert(agree.toDouble / stored.size >= 0.99,
      s"$agree/${stored.size} assignments agree")
  }

  test("batched IVF probe agrees with the single-query probe for every query") {
    val emb = Tables.load(spark, sf, "embeddings")
    val (indexed0, centers) = IvfAnn.buildIndex(emb, "embedding", numClusters = 16)
    val indexed = indexed0.localCheckpoint()
    val batch = emb.where(col("vec_id").isin(0, 7, 42))
    val got = IvfAnn.probeBatch(indexed, centers, "vec_id", "embedding",
      batch, "vec_id", "embedding", k = 5, nprobe = 4)
      .select("query_id", "vec_id", "sim")
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).sortBy(-_._2).toSeq).toMap
    Seq(0L, 7L, 42L).foreach { qid =>
      val single = IvfAnn.probe(indexed, centers, "vec_id", "embedding",
        emb.where(col("vec_id") === qid), "embedding", k = 5, nprobe = 4)
        .as[(Long, Double)].collect().toSeq
      assert(got(qid) === single, s"batch/single divergence for query $qid")
    }
  }

  test("IVF ANN: query is its own nearest neighbor; recall vs brute force is reported") {
    val emb = Tables.load(spark, sf, "embeddings")
    val q = emb.where(col("vec_id") === 0)
    val ann = IvfAnn.topK(emb, "vec_id", "embedding", q, "embedding",
      k = 10, numClusters = 16, nprobe = 4)
      .as[(Long, Double)].collect()
    assert(ann.head._1 === 0L && ann.head._2 === 1.0)
    val bf = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, "embedding", 10)
      .as[(Long, Double)].collect().map(_._1).toSet
    val recall = ann.map(_._1).count(bf.contains).toDouble / bf.size
    info(f"IVF recall@10 = $recall%.2f (numClusters=16, nprobe=4)")
    assert(recall > 0.0)
  }
}
