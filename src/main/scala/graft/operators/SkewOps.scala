package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys (SURVEY.md §7.4.8 scale posture).
  *
  * Spark 4's AQE already splits skewed SORT-MERGE join partitions at
  * runtime; these operators cover the cases AQE does not: broadcast-free
  * joins against a replicable right side, and single-hot-key aggregations
  * where one reducer would otherwise receive an entire key's rows.
  * At 100 TB a single hot key (e.g. the "unknown" user, the empty
  * document) routinely carries 1-10% of all rows — without salting that is
  * one straggler task pinning the whole stage.
  */
object SkewOps {

  /** Salted equi-join: the large (skewed) side gets a deterministic salt in
    * [0, buckets); the small side is replicated across every salt value.
    * Same result as `large.join(small, key)`, but a hot key's rows spread
    * over `buckets` reducers. Right side grows x buckets — keep it the
    * dimension side. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 buckets: Int, joinType: String = "inner"): DataFrame = {
    // Salt must be uniform per-row but NOT depend on the join key alone
    // (that would re-concentrate the hot key); hash the whole row.
    val salt = pmod(xxhash64(large.columns.toIndexedSeq.map(col): _*), lit(buckets))
    val l = large.withColumn("__salt", salt)
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1)).cast("array<bigint>")))
    l.join(s, l(key) === s(key) && l("__salt") === s("__salt"), joinType)
      .drop(s(key)).drop("__salt")
  }

  /** Two-phase (salted) aggregation for algebraic aggregates: partial
    * aggregate on (key, salt), then final aggregate on key. `partial` and
    * `merge` must form a commutative monoid per column (sum/count/min/max).
    * Spark's own hash aggregate already does map-side partials; this adds a
    * REDUCER-side split for keys too hot for one task. */
  def twoPhaseSum(df: DataFrame, keys: Seq[String], sumCols: Seq[String],
                  buckets: Int): DataFrame = {
    val salt = pmod(xxhash64(df.columns.toIndexedSeq.map(col): _*), lit(buckets))
    val partials = sumCols.map(c => sum(col(c)).as(s"__s_$c"))
    val partial = df.withColumn("__salt", salt)
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(count(lit(1)).as("__n"), partials: _*)
    val finals = sumCols.map(c => sum(col(s"__s_$c")).as(s"sum_$c"))
    partial.groupBy(keys.map(col): _*)
      .agg(sum(col("__n")).as("n_rows"), finals: _*)
  }
}
