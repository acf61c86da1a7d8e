package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{IntervalJoin, NearDup, Similarity, SpanDedup}

/** Scale-evidence bench for the dedup/ANN candidate families: runs each
  * operator at 1x (~sf0.1 corpus size) and 10x on DETERMINISTIC synthetic
  * corpora generated in-plan (spark.range + xxhash64 — no driver data, the
  * OhlcvGen recipe applied to text/vectors), and reports wall time +
  * emitted pair counts so near-linear growth is measured, not argued.
  *
  * Each corpus plants a ~10% duplicate rate as neighbor pairs (bounded
  * dup-group size), so the TRUE pair count grows linearly by construction
  * and any superlinear growth in work or output is the operator's fault:
  * - MinHash bands hash into an unbounded key space => bucket populations
  *   track dup-group size, not corpus size => linear.
  * - SimHash chunks have 2^16 buckets — large relative to these corpora;
  *   the maxBucketSize cap now bounds the eventual collapse.
  * - Hyperplane-LSH buckets are FIXED at 2^planesPerBand per band, so
  *   collision volume grows ~n^2/2^planes at fixed planes: the bench runs
  *   10x at the 1x planes AND at planes+3 (8x more buckets) to show the
  *   knob restoring near-linearity — at corpus scale planesPerBand must
  *   grow with log2(n), which is the documented operating rule.
  *
  * One JSON line per (op, scale) row; a final summary line reports the
  * 10x/1x wall-time ratios (pure-linear = 10, sublinear warm-up effects
  * can push it below).
  */
object ScaleBench {

  private val V = 200 // vocabulary size; 3-gram space V^3 >> shingle count

  /** n synthetic docs, ~80 tokens each; ids with id % 10 == 1 duplicate
    * doc id-1 exactly (bounded dup groups of 2, 10% dup rate). */
  def syntheticDocs(spark: SparkSession, n: Long): DataFrame = {
    val vocab = array((0 until V).map(i => lit(s"w$i")): _*)
    val seed = when(pmod(col("id"), lit(10)) === 1, col("id") - 1).otherwise(col("id"))
    spark.range(n).select(col("id").as("doc_id"),
      concat_ws(" ", transform(sequence(lit(1), lit(80)),
        j => element_at(vocab, (pmod(xxhash64(seed, j), lit(V.toLong)) + 1).cast("int"))))
        .as("text"))
  }

  /** n synthetic 64-dim vectors in [-1,1]; same 10% neighbor-dup plant. */
  def syntheticEmbeddings(spark: SparkSession, n: Long): DataFrame = {
    val seed = when(pmod(col("id"), lit(10)) === 1, col("id") - 1).otherwise(col("id"))
    spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(1), lit(64)),
        j => (pmod(xxhash64(seed, j), lit(2000001L)).cast("double") / 1e6 - lit(1.0))
          .cast("float")).as("embedding"))
  }

  /** n intervals of fixed `span` µs at CONSTANT density: starts uniform
    * over a horizon that grows with n (more data = more days, not a denser
    * day), 25 cohort keys. True overlap count then grows linearly. */
  def syntheticIntervals(spark: SparkSession, n: Long, span: Long,
                         tag: String): DataFrame =
    spark.range(n).select(col("id").as(s"${tag}_id"),
      pmod(xxhash64(col("id"), lit(tag)), lit(n * 100L)).as(s"${tag}_s"),
      (pmod(xxhash64(col("id"), lit(tag)), lit(n * 100L)) + lit(span)).as(s"${tag}_e"),
      pmod(xxhash64(col("id"), lit(tag + "k")), lit(25L)).cast("long").as(s"${tag}_k"))

  private def timed(op: String, n: Long, extra: String = "")(body: => Long): (String, Double) = {
    val t0 = System.nanoTime()
    val pairs = body
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"op":"$op","n":$n,"pairs":$pairs,"sec":$sec%.2f$extra}""")
    (s"$op$extra|$n", sec)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // untimed warm-up at 1/10th of 1x: pays janino codegen + JIT once, so
    // the 1x rows measure the operator, not first-plan compilation (the
    // same reasoning as Bench's warm-up pass)
    locally {
      val d = syntheticDocs(spark, 500L).localCheckpoint()
      NearDup.lshCandidatePairs(d, "doc_id", col("text")).count()
      NearDup.simhashPairs(NearDup.simhash(d, "doc_id", col("text")), "doc_id", 3).count()
      SpanDedup.duplicatedSpans(d, "doc_id", col("text"), 8, 16).count()
      d.unpersist()
      val e = syntheticEmbeddings(spark, 200L).localCheckpoint()
      Similarity.lshBucketedPairsAboveThreshold(e, "vec_id", "embedding", lit(0), 0.5, 64).count()
      Similarity.lshBucketedPairsAboveThreshold(e, "vec_id", "embedding", lit(0), 0.5, 64,
        planesPerBand = 7).count()
      e.unpersist()
      val wa = syntheticIntervals(spark, 2000L, 5000L, "a").localCheckpoint()
      val wb = syntheticIntervals(spark, 2000L, 2000L, "b").localCheckpoint()
      IntervalJoin.overlapJoin(wa.withColumnRenamed("a_k", "k"),
        wb.withColumnRenamed("b_k", "k"),
        "k", "a_s", "a_e", "b_s", "b_e", 5000L).count()
      wa.join(wb, col("a_k") === col("b_k") &&
        col("a_s") <= col("b_e") && col("b_s") <= col("a_e")).count()
      wa.unpersist(); wb.unpersist()
    }

    val times = scala.collection.mutable.Map[String, Double]()
    for (scale <- Seq(1L, 10L)) {
      val nDocs = 5000L * scale
      val docs = syntheticDocs(spark, nDocs).localCheckpoint()
      times ++= Seq(
        timed("minhash_lsh_candidates", nDocs) {
          NearDup.lshCandidatePairs(docs, "doc_id", col("text")).count()
        },
        timed("simhash_pairs", nDocs) {
          NearDup.simhashPairs(
            NearDup.simhash(docs, "doc_id", col("text")), "doc_id", maxHamming = 3).count()
        },
        timed("duplicated_spans", nDocs) {
          SpanDedup.duplicatedSpans(docs, "doc_id", col("text"),
            shingleN = 8, minSpanTokens = 16).count()
        })
      docs.unpersist()

      val nVec = 2000L * scale
      val emb = syntheticEmbeddings(spark, nVec).localCheckpoint()
      times += timed("embedding_lsh_pairs", nVec, s""","planes":4""") {
        Similarity.lshBucketedPairsAboveThreshold(
          emb, "vec_id", "embedding", lit(0), minSim = 0.5, dim = 64).count()
      }
      if (scale > 1L) // the knob: 8x more buckets restores near-linearity
        times += timed("embedding_lsh_pairs", nVec, s""","planes":7""") {
          Similarity.lshBucketedPairsAboveThreshold(
            emb, "vec_id", "embedding", lit(0), minSim = 0.5, dim = 64,
            planesPerBand = 7).count()
        }
      emb.unpersist()

      // interval-overlap join: bucketized (the operator) vs the naive
      // inequality join Spark would otherwise plan. Constant interval
      // density => true overlaps linear in n; the naive join's work is
      // the per-key product and must grow ~100x at 10x.
      val nInt = 20000L * scale
      val ia = syntheticIntervals(spark, nInt, span = 5000L, tag = "a").localCheckpoint()
      val ib = syntheticIntervals(spark, nInt, span = 2000L, tag = "b").localCheckpoint()
      times += timed("interval_join_bucketized", nInt) {
        IntervalJoin.overlapJoin(
          ia.withColumnRenamed("a_k", "k"), ib.withColumnRenamed("b_k", "k"),
          "k", "a_s", "a_e", "b_s", "b_e", bucketWidth = 5000L).count()
      }
      times += timed("interval_join_naive", nInt) {
        ia.join(ib, col("a_k") === col("b_k") &&
          col("a_s") <= col("b_e") && col("b_s") <= col("a_e")).count()
      }
      ia.unpersist(); ib.unpersist()
    }
    val ratios = Seq(
      "minhash_lsh_candidates" -> (times("minhash_lsh_candidates|50000") / times("minhash_lsh_candidates|5000")),
      "simhash_pairs" -> (times("simhash_pairs|50000") / times("simhash_pairs|5000")),
      "duplicated_spans" -> (times("duplicated_spans|50000") / times("duplicated_spans|5000")),
      "embedding_lsh_pairs@planes4" -> (times("""embedding_lsh_pairs,"planes":4|20000""") / times("""embedding_lsh_pairs,"planes":4|2000""")),
      "embedding_lsh_pairs@planes7_vs_planes4_1x" -> (times("""embedding_lsh_pairs,"planes":7|20000""") / times("""embedding_lsh_pairs,"planes":4|2000""")),
      "interval_join_bucketized" -> (times("interval_join_bucketized|200000") / times("interval_join_bucketized|20000")),
      "interval_join_naive" -> (times("interval_join_naive|200000") / times("interval_join_naive|20000")))
    println(ratios.map { case (k, v) => f""""$k":$v%.1f""" }
      .mkString("""{"metric":"wall_ratio_10x_over_1x",""", ",", "}"))
    spark.stop()
  }
}
