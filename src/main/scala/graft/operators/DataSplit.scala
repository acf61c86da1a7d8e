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

  /** Bucket in [0, 10000) from the key — stable, uniform. */
  def bucketOf(key: Column): Column = pmod(xxhash64(key), lit(Buckets))

  /** Adds a `split` column given (name -> fraction) in declared order;
    * fractions must sum to <= 1, remainder falls into the last split. */
  def assignSplit(df: DataFrame, key: Column, splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).sum <= 1.0 + 1e-9)
    val bucket = bucketOf(key)
    val bounds = splits.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    val expr0 = splits.zip(bounds).foldLeft(lit(null).cast("string")) {
      case (acc, ((name, _), hi)) =>
        when(acc.isNotNull, acc).when(bucket < lit((hi * Buckets).toLong), lit(name))
          .otherwise(acc)
    }
    df.withColumn("split", coalesce(expr0, lit(splits.last._1)))
  }

  /** Deterministic hash sample: keep ~fraction of rows by key hash.
    * Unlike `df.sample`, membership is key-stable across runs and joins
    * (sampling both sides of a join by the SAME key keeps them aligned). */
  def hashSample(df: DataFrame, key: Column, fraction: Double): DataFrame =
    df.where(bucketOf(key) < lit((fraction * Buckets).toLong))
}
