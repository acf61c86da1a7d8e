package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic train/validation/test assignment for training-data
  * pipelines (north star, /root/repo/BASELINE.json "LLM-data-pipeline
  * operators"): split membership is a pure function of the row KEY
  * (hash-bucketed), so it is stable across runs, re-partitioning, cluster
  * sizes, and incremental reprocessing — unlike `randomSplit`, whose
  * assignment depends on partition layout. The industry-standard shape for
  * reproducible corpus splits.
  */
object DataSplit {

  private val Buckets = 10000L

  /** Bucket in [0, 10000) from the key — stable, uniform. General-key
    * (xxhash64 takes any type), but engine-specific: results are not
    * SQL-replicable. The split/sample operators below use [[knuthBucket]]
    * instead so their outputs oracle-check. */
  def bucketOf(key: Column): Column = pmod(xxhash64(key), lit(Buckets))

  /** The repo-standard SQL-replicable key hash (same overflow-reduced
    * Knuth multiplicative form as [[stratifiedExact]] / Binning's
    * boundary sample): bucket in [0, 1e6) from a NUMERIC key. The mod-1e6
    * pre-reduction keeps the product < 2.7e15 (never wraps BIGINT on
    * either engine) at the cost of keys congruent mod 1e6 sharing a
    * bucket — uniform over residues (the multiplier is coprime to 1e6,
    * so k%1e6 -> bucket is a bijection), and fine for id-keyed splits. */
  def knuthBucket(key: Column): Column =
    pmod(pmod(key, lit(KnuthBuckets)) * lit(2654435761L), lit(KnuthBuckets))

  val KnuthBuckets = 1000000L

  /** Adds a `split` column given (name -> fraction) in declared order;
    * fractions must sum to <= 1, remainder falls into the last split.
    * Membership is a [[knuthBucket]] threshold on the numeric key —
    * SQL-replicable (the q_sample1 oracle states the same CASE ladder),
    * stable across runs/partitioning, binomial per-split counts. */
  def assignSplit(df: DataFrame, key: Column, splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).sum <= 1.0 + 1e-9)
    val bucket = knuthBucket(key)
    val bounds = splits.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    val expr0 = splits.zip(bounds).foldLeft(lit(null).cast("string")) {
      case (acc, ((name, _), hi)) =>
        when(acc.isNotNull, acc)
          .when(bucket < lit((hi * KnuthBuckets).toLong), lit(name))
          .otherwise(acc)
    }
    df.withColumn("split", coalesce(expr0, lit(splits.last._1)))
  }

  /** Deterministic epoch shuffle: every training epoch gets its own
    * reproducible global order, derived at SCAN SPEED from the row key —
    * no shuffle, no window, no RNG state. Each row is replicated once per
    * epoch with `shuffle_key` = [[knuthBucket]](key·epochs + epoch)
    * (injective combination for epoch < epochs, so epochs permute
    * independently); a training-data writer materializes the order with
    * `repartitionByRange($"epoch", $"shuffle_key")` + sort-within-
    * partitions — the production path needs the KEY, never a dense
    * row_number (which would serialize each epoch through one task).
    * Same-key rows keep identical keys whatever else is in the corpus
    * (resumable, join-stable), and the order is SQL-replicable. The key is
    * pre-reduced mod 1e6 BEFORE the epoch multiply — congruent
    * ((k mod m)·e + i ≡ k·e + i mod m) and the product stays < 1e6·epochs,
    * so xxhash64-scale keys never wrap BIGINT on either engine (a raw
    * k·epochs wraps silently in non-ANSI Spark above 2^63/epochs while the
    * BIGINT oracle errors). */
  def epochShuffleKeys(df: DataFrame, keyCol: String, epochs: Int): DataFrame = {
    require(epochs >= 1, s"epochs must be >= 1, got $epochs")
    df.withColumn("epoch",
        explode(sequence(lit(0), lit(epochs - 1)).cast("array<bigint>")))
      .withColumn("shuffle_key",
        knuthBucket(pmod(col(keyCol), lit(KnuthBuckets)) * lit(epochs.toLong) + col("epoch")))
  }

  /** Deterministic hash sample: keep ~fraction of rows by key hash.
    * Unlike `df.sample`, membership is key-stable across runs and joins
    * (sampling both sides of a join by the SAME key keeps them aligned). */
  def hashSample(df: DataFrame, key: Column, fraction: Double): DataFrame =
    df.where(bucketOf(key) < lit((fraction * Buckets).toLong))

  /** EXACT stratified sample: precisely ceil(fraction * n_g) rows from each
    * stratum, chosen by a deterministic SQL-replicable key order (Knuth
    * multiplicative hash, overflow-reduced like [[resampleToMixture]]'s) —
    * unlike [[hashSample]], whose per-stratum counts are binomial. Use when
    * the downstream contract is a count ("exactly 20% of every language"),
    * e.g. held-out eval slices.
    *
    * Shape: one shuffle on the stratum, then rank + windowed count in a
    * single Window node (same partitioning). Skew = largest stratum; for a
    * hot stratum at corpus scale, pre-filter with [[hashSample]] at a few
    * times the target rate, then exact-rank the survivors. */
  def stratifiedExact(df: DataFrame, stratumCol: String, keyCol: String,
                      fraction: Double): DataFrame = {
    require(fraction > 0 && fraction <= 1, s"fraction in (0,1], got $fraction")
    val h = knuthBucket(col(keyCol))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratumCol).orderBy(h, col(keyCol))
    df.withColumn("__rk", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(stratumCol)))
      .where(col("__rk") <= ceil(lit(fraction) * col("__n")))
      .drop("__rk", "__n")
  }

  /** Balance classes to EXACTLY `target` rows per class — the class-
    * rebalancing step before training on skewed labels: minority classes
    * are OVERSAMPLED by deterministic replication (each source row gets a
    * `copy` index), majority classes DOWNSAMPLED by the deterministic
    * hash-order rank cut — both directions land on precisely `target`
    * rows per class, reproducibly.
    *
    * Shape: one per-class count aggregation, a broadcast of the
    * (class -> ceil(target/n) replication factor) table, a scan-speed
    * `explode(sequence(1, k))` (row count <= target + n per class), then
    * ONE rank window per class cut at `target` — `row_number <= target`
    * compiles to WindowGroupLimit, so map tasks pre-prune to their local
    * top-`target` before the shuffle. Skew is bounded by `target` per
    * class, not by the hottest class's raw count. Every step (Knuth hash
    * order, IEEE ceil of a double quotient) is SQL-replicable =>
    * hash-exact oracle (q_sample7). */
  def balanceClasses(df: DataFrame, classCol: String, keyCol: String,
                     target: Long): DataFrame = {
    require(target > 0, s"target must be positive, got $target")
    val counts = df.groupBy(classCol).agg(count(lit(1)).as("__n"))
      .withColumn("__k",
        ceil(lit(target).cast("double") / col("__n").cast("double")).cast("long"))
      .drop("__n")
    // epoch-style order: copy 1 of every row, then copy 2, ... — the cut
    // replicates each row floor(target/n) times plus a hash-chosen
    // partial epoch (vs per-key copy bursts under a hash-first order)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(classCol)
      .orderBy(col("copy"), knuthBucket(col(keyCol)), col(keyCol))
    df.join(broadcast(counts), classCol)
      .withColumn("copy", explode(sequence(lit(1L), col("__k"))))
      .drop("__k")
      .withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= target)
      .drop("__rk")
  }

  /** Downsample a multi-source corpus to a TARGET MIXTURE (the pre-training
    * data-recipe step: "50% web, 30% wiki, 20% code"): per-source
    * acceptance rates are derived in-plan — `Nt = min(n_s / f_s)` is the
    * largest total achievable without upsampling any source, and source s
    * keeps `f_s * Nt / n_s` of its rows — then applied as a key-hash
    * threshold. Sources absent from `targetFractions` are dropped.
    *
    * Scale shape: one count aggregation (rows per source), a broadcast of
    * the source->rate table (size = #sources), and a scan-speed filter —
    * no window over per-source partitions (a per-source rank would hot-spot
    * on the largest source), no driver-side counts. Acceptance is a pure
    * function of the key (Knuth multiplicative hash, SQL-replicable), so
    * the sample is stable across runs and incremental reprocessing;
    * realized proportions are binomial around the target. */
  def resampleToMixture(df: DataFrame, keyCol: String, sourceCol: String,
                        targetFractions: Map[String, Double]): DataFrame = {
    require(targetFractions.nonEmpty, "target mixture must name at least one source")
    require(math.abs(targetFractions.values.sum - 1.0) < 1e-9,
      s"target fractions must sum to 1, got ${targetFractions.values.sum}")
    val spark = df.sparkSession
    import spark.implicits._
    val fracs = targetFractions.toSeq.toDF(sourceCol, "__frac")
    val counts = df.groupBy(sourceCol).agg(count(lit(1)).as("__n"))
      .join(fracs, sourceCol)
    // Nt as a global window-min over the counts aggregate: the single-
    // partition stage holds #sources rows (not data rows), and the counts
    // subtree — the only full-corpus scan — appears ONCE in the plan
    // (a separate agg + join would recompute it per consumer).
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    val rates = counts
      .withColumn("__nt", min(col("__n").cast("double") / col("__frac")).over(w))
      .select(col(sourceCol),
        least(lit(1.0), col("__frac") * col("__nt") / col("__n").cast("double")).as("__rate"))
    // knuthBucket's mod-1e6 pre-reduction is what keeps the product
    // BIGINT-safe on both engines (a raw k*c wraps for keys above ~3.4e9,
    // and the oracle would error where Spark wraps); the oracle SQL
    // mirrors the same reduced form.
    val u = knuthBucket(col(keyCol)).cast("double") / 1e6
    df.join(broadcast(rates), sourceCol)
      .where(u < col("__rate"))
      .drop("__rate")
  }

  /** Temperature sampling: downsample toward the mixture `f_s ∝ n_s^alpha`
    * — the multilingual/multi-source rebalancing rule (alpha=1 keeps the
    * natural mixture, alpha→0 approaches uniform; 0.2–0.7 is the usual
    * pre-training range). The target fractions are derived IN-PLAN from
    * the same per-source counts the rate computation needs (no declared
    * recipe, no driver round-trip), then applied exactly like
    * [[resampleToMixture]]: Nt = min(n_s/f_s), key-hash threshold, stable
    * across runs and incremental batches.
    *
    * Cross-engine determinism: pow is transcendental, so the weight and
    * the derived fraction are each rounded ONCE at 6dp (the q_txt14
    * policy) before any comparison; everything downstream is the
    * SQL-replicable Knuth-hash threshold. Scale shape matches
    * resampleToMixture: one count aggregation, singleton-partition window
    * over #sources rows, broadcast rate table, scan-speed filter. */
  def temperatureResample(df: DataFrame, keyCol: String, sourceCol: String,
                          alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha in (0,1], got $alpha")
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    val rates = df.groupBy(sourceCol).agg(count(lit(1)).as("__n"))
      .withColumn("__w", round(pow(col("__n").cast("double"), lit(alpha)), 6))
      .withColumn("__f", round(col("__w") / sum(col("__w")).over(w), 6))
      .withColumn("__nt", min(col("__n").cast("double") / col("__f")).over(w))
      .select(col(sourceCol),
        least(lit(1.0), col("__f") * col("__nt") / col("__n").cast("double")).as("__rate"))
    val u = knuthBucket(col(keyCol)).cast("double") / 1e6
    df.join(broadcast(rates), sourceCol)
      .where(u < col("__rate"))
      .drop("__rate")
  }
}
