package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.queries.{RelationalQueries, WindowQueries, ScanSinkQueries}

/** Plan-shape guards (SURVEY.md §5.2.4): the §4.2 "free lunch" assumptions —
  * pushdown, broadcast, top-k physical operators, partition pruning — must
  * actually appear in the executed plan, or a regression silently turns a
  * scan-light query into a full-table pass at 100 TB.
  */
class PlanShapeSpec extends SparkSpec {

  private def plan(name: String, m: QueryModule): String =
    m.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("holt/cusum serial passes: ONE key exchange then mapPartitions, " +
    "no second shuffle") {
    import spark.implicits._
    val df = Seq((1L, 0L, 100L), (1L, 1L, 110L), (2L, 0L, 50L))
      .toDF("k", "ord", "c")
    val p1 = graft.operators.TechnicalIndicators.holtMicro(df, "k", "ord", "c",
        unitsScale = 2, alphaNum = 1, alphaDen = 5, betaNum = 1, betaDen = 10)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(p1).length === 1, p1.take(1200))
    assert(p1.contains("MapPartitions"), p1.take(1200))
    val p2 = graft.operators.TechnicalIndicators.cusumMicro(df, "k", "ord", "c",
        kMicro = 0L, hMicro = 5L)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(p2).length === 1, p2.take(1200))
  }

  test("q_evt1/q_corr3/q_ta12: dimension sides broadcast, never nested-loop") {
    for (n <- Seq("q_evt1", "q_corr3", "q_ta12")) {
      val p = plan(n, graft.queries.TechQueries)
      assert(p.contains("BroadcastHashJoin"), s"$n:\n" + p.take(1200))
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"$n must not nested-loop:\n" + p.take(1200))
    }
  }

  test("q_bt1: every backtest window rides one key shuffle") {
    // rebuild the chain directly (the registered query serves the memoized
    // frame — cache substitution would print InMemoryRelation): all five
    // key windows + the signal LOCF must share ONE l_suppkey exchange
    import org.apache.spark.sql.expressions.Window
    val wd = Window.partitionBy("l_suppkey").orderBy("day_ord")
    val wRun = wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val w11 = wd.rowsBetween(-10, Window.currentRow) // differs from q_bt1's
    val base = graft.operators.TechnicalIndicators.returnsMicro(
      graft.Tables.load(spark, sf, "lineitem")
        .groupBy(col("l_suppkey"), col("l_shipdate").cast("date").as("day"))
        .agg(sum(round(col("l_extendedprice") * lit(100.0)).cast("long")).as("cents"))
        .withColumn("day_ord",
          datediff(col("day"), lit("1970-01-01").cast("date")).cast("long"))
        .select("l_suppkey", "day_ord", "cents"),
      Seq("l_suppkey"), "day_ord", "cents", clampMicro = 10000000L)
    val p = base
      .withColumn("s", sum(col("value_units")).over(w11))
      .withColumn("sig", when(col("s") > 0, lit(1L)))
      .withColumn("pos", coalesce(
        last(col("sig"), ignoreNulls = true).over(wRun), lit(0L)))
      .withColumn("fwd", lead(col("r_micro"), 1).over(wd))
      .withColumn("cum", sum(col("pos") * col("fwd")).over(wRun))
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning\\(l_suppkey#\\d+L, \\d+\\)".r
      .findAllIn(p).length === 1,
      "one key exchange for the whole window chain:\n" + p.take(1500))
  }

  test("q_scan2: shipdate predicate is pushed to the parquet reader") {
    val p = plan("q_scan2", ScanSinkQueries)
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate"), p)
  }

  test("q_scan1: projection prunes the read schema to selected columns") {
    val p = plan("q_scan1", ScanSinkQueries)
    assert(p.contains("ReadSchema"))
    assert(!p.contains("l_extendedprice"), "unused column must not be read")
  }

  test("q_join2: dimension joins use BroadcastHashJoin") {
    val p = plan("q_join2", RelationalQueries)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"))
  }

  test("q_top1: global top-k plans as TakeOrderedAndProject") {
    assert(plan("q_top1", WindowQueries).contains("TakeOrderedAndProject"))
  }

  test("q_top2: per-group top-k benefits from WindowGroupLimit") {
    assert(plan("q_top2", WindowQueries).contains("WindowGroupLimit"))
  }

  test("q_agg1: hash aggregation runs partial+final around one exchange") {
    val p = plan("q_agg1", graft.queries.AggQueries)
    assert("HashAggregate".r.findAllIn(p).length >= 2, "partial + final expected")
    assert(p.contains("partial_count"), "map-side combine expected")
    // one hash shuffle for the groupBy; the second Exchange is the final
    // total-order sort's range partitioning (oracle determinism, §7.4.2)
    assert("Exchange hashpartitioning".r.findAllIn(p).length === 1,
      "exactly one aggregation shuffle:\n" + p.take(800))
  }

  test("q_join6: equi+range join plans as a hash/merge join, never nested-loop") {
    val p = plan("q_join6", RelationalQueries)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(800))
  }

  test("q_join6 with broadcast disabled flips to SortMergeJoin, never nested-loop") {
    // at 100 TB the events side stops fitting the broadcast threshold; the
    // equi key must carry the join to SMJ, not degrade to BNLJ/cartesian
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = plan("q_join6", RelationalQueries)
      assert(p.contains("SortMergeJoin"), p.take(800))
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        p.take(800))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("batchByRange: fact-scale batch ids plan with no Exchange SinglePartition") {
    val src = Tables.load(spark, sf, "orders").select("o_orderkey")
    // The pre-pass shuffle is range partitioning (parallel), never a
    // single-partition collapse...
    val ranged = src.repartitionByRange(col("o_orderkey"))
    val rp = ranged.queryExecution.executedPlan.toString
    assert(rp.contains("Exchange rangepartitioning"), rp.take(800))
    // ...and the full operator's executed plan has no SinglePartition stage
    // (contrast withBatchNum, whose unpartitioned window forces one).
    val fact = operators.Batching.batchByRange(src, col("o_orderkey"), 1000)
    val p = fact.queryExecution.executedPlan.toString
    assert(!p.contains("SinglePartition"), p.take(800))
    val dim = operators.Batching.withBatchNum(src, "o_orderkey", 1000)
    assert(dim.queryExecution.executedPlan.toString.contains("SinglePartition"))
  }

  test("q_txt11 decontamination: hash join on shingle hashes, never doc x doc") {
    val p = plan("q_txt11", graft.queries.TextDedupQueries)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(800))
    // train side must collapse to DISTINCT shingle hashes before the join
    assert(p.contains("HashAggregate"), "distinct-shingle aggregation expected")
  }

  test("lshBucketedPairsAboveThreshold: bucket-collision joins only, sketch computed once") {
    val emb = Tables.load(spark, sf, "embeddings")
    val p = operators.Similarity.lshBucketedPairsAboveThreshold(
        emb, "vec_id", "embedding", col("label"), 0.5, dim = 64)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(800))
    // the banded table is materialized (localCheckpoint -> ExistingRDD scan),
    // so the hyperplane sketch pipeline exists ZERO times in this plan
    assert(p.contains("Scan ExistingRDD"), p.take(800))
  }

  test("q_scd1: one join for the snapshot diff, no shuffle of the closed history") {
    val p = plan("q_scd1", graft.queries.RelationalQueries)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(800))
    // kept/closed/opened are three selections of ONE full-outer join —
    // exactly one join operator in the whole plan
    val joins = "SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin".r.findAllIn(p).length
    assert(joins === 1, s"expected exactly 1 join, found $joins:\n${p.take(800)}")
  }

  test("partitioned write + year-filtered read hits PartitionFilters, not data filters") {
    val dir = Files.createTempDirectory("graft_part").toString
    val li = Tables.load(spark, sf, "lineitem")
      .withColumn("ship_year", year(col("l_shipdate")))
    operators.IngestEgress.writePartitioned(li, dir, Seq("ship_year"))
    val back = spark.read.parquet(dir).where(col("ship_year") === 1997)
    val p = back.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(ship_year"), p)
    assert(back.count() ===
      li.where(col("ship_year") === 1997).count())
  }

  test("dynamic partition pruning: a filtered dim prunes fact partitions at RUNTIME") {
    // the dim filter is on o_orderdate (not on the join key), so the
    // surviving years are only known after evaluating the dim — static
    // constraint propagation can't do this prune; DPP must
    val dir = Files.createTempDirectory("graft_dpp").toString
    val li = Tables.load(spark, sf, "lineitem")
      .withColumn("ship_year", year(col("l_shipdate")))
    operators.IngestEgress.writePartitioned(li, dir, Seq("ship_year"))
    val fact = spark.read.parquet(dir)
    val dim = Tables.load(spark, sf, "orders")
      .where(col("o_orderdate") < lit("1993-01-01").cast("timestamp"))
      .select(year(col("o_orderdate")).as("o_year")).distinct()
    val pruned = fact.join(dim, fact("ship_year") === dim("o_year"), "left_semi")
    val p = pruned.queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruning"),
      s"no runtime partition-pruning subquery in the fact scan:\n${p.take(1500)}")
    val years = dim.collect().map(_.getInt(0)).toSet
    assert(pruned.count() === li.where(col("ship_year").isin(years.toSeq: _*)).count())
  }

  test("Catalyst's own runtime bloom-filter injection fires on a selective big-big join") {
    // the optimizer counterpart of operators.BloomJoin: with the runtime-
    // filter rule enabled (thresholds tuned to the test fixture's sizes),
    // InjectRuntimeFilter plants bloom_filter_agg/might_contain without
    // any operator-level code
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "1GB")
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val li = Tables.load(s2, sf, "lineitem")
    val pt = Tables.load(s2, sf, "part").where(col("p_size") === 1)
    val j = li.join(pt, li("l_partkey") === pt("p_partkey"))
    val plan = j.queryExecution.optimizedPlan.toString
    assert(plan.contains("might_contain"),
      s"runtime filter not injected:\n${plan.take(1200)}")
    assert(j.count() > 0)
  }

  test("q_sample2: mixture resample reads the corpus exactly twice (counts + filter)") {
    val p = plan("q_sample2", queries.TextDedupQueries)
    assert("Scan parquet".r.findAllIn(p).length === 2, p.take(1200))
  }

  test("q_layout1: z-order key is one scan + one range exchange") {
    val p = plan("q_layout1", ScanSinkQueries)
    assert("Scan parquet".r.findAllIn(p).length === 1, p.take(800))
    assert(p.contains("Exchange rangepartitioning"), p.take(800))
  }

  test("exactByKeysProjected == exactByKeys + select (incl. duplicate keys and " +
    "tie-break ties), with no rank window in the plan") {
    import graft.operators.Dedup
    import spark.implicits._
    val df = Seq(
      (1L, 10L, 5L, "x"), (1L, 9L, 7L, "y"), (1L, 9L, 7L, "z"), // tie on (t1,t2)
      (2L, 3L, 3L, "a"),
      (3L, 8L, 1L, "b"), (3L, 7L, 2L, "c")
    ).toDF("k", "t1", "t2", "other")
    val viaWindow = Dedup.exactByKeys(df, Seq("k"), Seq("t1", "t2"))
      .select("k", "t1", "t2").orderBy("k")
      .as[(Long, Long, Long)].collect().toSeq
    val projected = Dedup.exactByKeysProjected(df, Seq("k"),
        Seq("t1", "t2"), Seq("t1", "t2"))
      .orderBy("k").as[(Long, Long, Long)].collect().toSeq
    assert(projected === viaWindow)
    val p = Dedup.exactByKeysProjected(df, Seq("k"), Seq("t1", "t2"), Seq("t1"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), p.take(800))
    // a kept column outside keys ++ tieBreak is refused, not silently wrong
    intercept[IllegalArgumentException] {
      Dedup.exactByKeysProjected(df, Seq("k"), Seq("t1"), Seq("other"))
    }
  }

  test("curation pipeline prefix: one scan, exactly 3 hash shuffles, WindowGroupLimit cap") {
    // the q_pipe1 stages BEFORE the budget cut (whose RDD prefix-sum pass
    // hides the upstream plan behind an ExistingRDD boundary in PLANS.md):
    // url dedup, content dedup, and the domain cap each require one hash
    // exchange; everything else must fuse into the scan stage.
    import graft.operators.{Curation, Dedup, TextOps, UrlOps}
    val canon = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text"), col("n_chars"),
        UrlOps.canonicalizeUrl(concat(lit("https://a.com/p"), col("doc_id"))).as("url"))
      .withColumn("domain", UrlOps.domainOf(col("url")))
    val urlDeduped = Dedup.exactByKeys(canon, Seq("url"), Seq("doc_id"))
    val quality = urlDeduped.where(TextOps.wordCount(col("text")) >= 30)
    val contentDeduped = Dedup.exactByExpr(quality,
      Dedup.contentHash(col("text")), "__h", Seq("doc_id")).drop("__h")
    val capped = Curation.capPerDomain(contentDeduped,
      col("domain"), 3, col("n_chars").desc, col("doc_id").asc)
    val p = capped.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(p).length === 1, p.take(1200))
    assert("Exchange hashpartitioning".r.findAllIn(p).length === 3, p.take(1200))
    assert(p.contains("WindowGroupLimit"), p.take(1200))
  }

  test("q_corr1: self-join reuses ONE daily-aggregate exchange (single fact scan)") {
    // Without the merge hints Spark broadcasts one side and rebuilds the
    // whole aggregate (and its fact scan) under the BroadcastExchange —
    // twice the I/O at 100 TB. The SMJ form makes both sides demand the
    // same day-hash Exchange, which ReuseExchange then dedupes.
    // assert on the non-AQE plan: the static ReuseExchange rule and AQE's
    // stage reuse make the same decision, and the static plan prints it
    // legibly (AQE's toString hides scans inside materialized stages)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p = graft.queries.OpsQueries.queries("q_corr1")(spark, sf)
        .queryExecution.executedPlan.toString
      assert(p.contains("ReusedExchange"), p.take(1500))
      assert("Scan parquet".r.findAllIn(p).length === 1, p.take(1500))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q_sess2: session rollup reuses the window's user_id shuffle (ONE hash Exchange)") {
    // hash partitioning on user_id — a subset of the grouping keys
    // (user_id, session_seq) — already co-locates every session group, so
    // the aggregation runs in the window's stage with no second Exchange.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // build the rollup directly with a gap that differs from the
      // memoized q_sess2 frame's: Shared.sessionStats is persisted, and
      // the cache manager substitutes InMemoryRelation by logical-plan
      // EQUALITY — an identical rebuild would print whichever cached plan
      // some earlier suite materialized. A different constant keeps the
      // plan shape identical but cache-miss, so the OPERATOR's shape is
      // what's asserted.
      val p = graft.operators.Sessionize.sessionStats(
          graft.Tables.load(spark, sf, "events"),
          "user_id", "ts", 1801L, "value", "event_id")
        .orderBy("user_id", "session_seq")
        .queryExecution.executedPlan.toString
      assert("Exchange hashpartitioning".r.findAllIn(p).length === 1, p.take(1500))
      assert("Scan parquet".r.findAllIn(p).length === 1, p.take(1500))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
