package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.pipeline.StockPipeline

/** The reference's stated future — "daily stock data updates"
  * (`README.md:49`) — end-to-end: new price files stream into the
  * company/year-partitioned store as idempotent upserts. */
class IncrementalUpdateSpec extends SparkSpec {
  import spark.implicits._

  test("daily update: new day inserts, late correction replaces, no duplicates") {
    val symbols = Seq("AAA", "BBB").toDF("Symbol")
    def prices(start: String, days: Int) =
      StockPipeline.syntheticPrices(spark, symbols, start, days)
    val store = Files.createTempDirectory("graft_store").toString + "/store"
    val incoming = Files.createTempDirectory("graft_incoming").toString
    val ckpt = Files.createTempDirectory("graft_merge_ckpt").toString

    // seed the store: Mon 2024-01-01 .. Fri 2024-01-05 for 2 symbols
    val seed = prices("2024-01-01", 5)
    IncrementalUpdate.mergeBatch(seed, store, Seq("company", "year"), Seq("company", "Date"))
    val n0 = spark.read.parquet(store).count()
    assert(n0 === 10)

    // a new trading day (Mon 2024-01-08) arrives as a file
    prices("2024-01-08", 1).write.parquet(s"$incoming/f1")
    IncrementalUpdate.run(spark, s"$incoming/*", seed.schema, store, ckpt)
    assert(spark.read.parquet(store).count() === n0 + 2)

    // a LATE corrected file for 2024-01-03 arrives: same keys, new Close —
    // the merge must replace the old rows, not append next to them
    prices("2024-01-03", 1).withColumn("Close", lit(999.99))
      .write.parquet(s"$incoming/f2")
    IncrementalUpdate.run(spark, s"$incoming/*", seed.schema, store, ckpt)
    val after = spark.read.parquet(store)
    assert(after.count() === n0 + 2, "correction must upsert, not duplicate")
    val corrected = after
      .where(col("company") === "AAA" &&
        col("Date") === lit("2024-01-03").cast("timestamp"))
      .select("Close").as[Double].collect()
    assert(corrected.toSeq === Seq(999.99))

    // replaying the same merge body (simulated batch retry) is idempotent
    IncrementalUpdate.mergeBatch(
      prices("2024-01-03", 1).withColumn("Close", lit(999.99)),
      store, Seq("company", "year"), Seq("company", "Date"))
    assert(spark.read.parquet(store).count() === n0 + 2)

    // layout is the reference's company=/year= tree (...py:53-63)
    val top = new java.io.File(store).listFiles().filter(_.isDirectory).map(_.getName)
    assert(top.nonEmpty && top.forall(_.startsWith("company=")))
  }

  test("store read during merge is statically partition-pruned to touched partitions") {
    val symbols = Seq("AAA", "BBB").toDF("Symbol")
    val store = Files.createTempDirectory("graft_prune_store").toString + "/s"
    StockPipeline.syntheticPrices(spark, symbols, "2023-12-15", 40)
      .write.partitionBy("company", "year").parquet(store)
    // an update touching ONLY (AAA, 2024) — read it back so the plan has
    // no static filters of its own (the streaming micro-batch case)
    val incDir = Files.createTempDirectory("graft_prune_inc").toString + "/f1"
    StockPipeline.syntheticPrices(spark, Seq("AAA").toDF("Symbol"), "2024-01-08", 5)
      .write.parquet(incDir)
    val incoming = spark.read.parquet(incDir)
    val pruned = spark.read.parquet(store)
      .where(IncrementalUpdate.touchedPartitionFilter(incoming, Seq("company", "year")))
    val p = pruned.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: ["), p.take(600))
    assert(p.contains("AAA"), "touched partition value must appear in PartitionFilters:\n" +
      p.linesIterator.filter(_.contains("PartitionFilters")).mkString)
    assert(pruned.select("company", "year").distinct().count() === 1)
  }

  test("touchedPartitionFilter at 1k+ touched partitions: plan-time sane, pruning fires") {
    // a full-universe daily batch (the reference's ~1,062 symbols) touches
    // 1k+ (company, year) partitions — the OR-of-ANDs predicate must not
    // blow up analysis/planning, and must still reach PartitionFilters
    val store = Files.createTempDirectory("graft_fanout_store").toString + "/s"
    spark.range(60).select(
        concat(lit("C"), format_string("%03d", col("id") % 30)).as("company"),
        (lit(2023) + col("id").divide(30).cast("int")).as("year"),
        col("id").as("v"))
      .write.partitionBy("company", "year").parquet(store)
    val incoming = spark.range(1050).select(
      concat(lit("C"), format_string("%03d", col("id") % 525)).as("company"),
      (lit(2023) + col("id").divide(525).cast("int")).as("year"))
    val t0 = System.nanoTime()
    val pruned = spark.read.parquet(store)
      .where(IncrementalUpdate.touchedPartitionFilter(incoming, Seq("company", "year")))
    val plan = pruned.queryExecution.executedPlan.toString // forces full planning
    val planSec = (System.nanoTime() - t0) / 1e9
    info(f"planned 1050-partition predicate in $planSec%.1f s")
    assert(planSec < 30.0, f"planning took $planSec%.1f s — fall back to an IN-tuple filter")
    assert(plan.contains("PartitionFilters: ["), plan.take(600))
    // every store partition is inside the touched set (C000-C029 x both years)
    assert(pruned.select("company", "year").distinct().count() === 60)
    // a disjoint 1k-partition batch prunes the scan to nothing
    val disjoint = spark.range(1000).select(
      concat(lit("X"), col("id").cast("string")).as("company"),
      lit(2023).as("year"))
    val none = spark.read.parquet(store)
      .where(IncrementalUpdate.touchedPartitionFilter(disjoint, Seq("company", "year")))
    assert(none.count() === 0)
  }

  test("upsert is last-writer-wins and passes unmatched rows through") {
    val existing = Seq((1L, "old"), (2L, "keep")).toDF("k", "v")
    val incoming = Seq((1L, "new"), (3L, "ins")).toDF("k", "v")
    val out = IncrementalUpdate.upsert(existing, incoming, Seq("k"))
      .as[(Long, String)].collect().sortBy(_._1)
    assert(out.toSeq === Seq((1L, "new"), (2L, "keep"), (3L, "ins")))
  }
}
