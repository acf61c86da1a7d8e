package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Privacy gates for training-data release — the anonymity screens run
  * before a corpus (or its metadata) leaves the pipeline. Complements
  * [[TextOps.redactPii]]'s content-level scrubbing with ROW-level
  * suppression: a record whose quasi-identifier combination is rare is
  * identifying even with every direct identifier removed.
  */
object Privacy {

  /** k-anonymity suppression: keep only rows whose quasi-identifier
    * cohort (the exact combination of `quasiCols` values, nulls included
    * as a value) contains at least `k` rows. One shuffle on the
    * quasi-identifier key (a window count — no join back); the cohort
    * size is emitted as `cohortSizeAs` when non-empty, so release
    * tooling can audit how close each surviving row sits to the floor. */
  def kAnonymize(df: DataFrame, quasiCols: Seq[String], k: Int,
                 cohortSizeAs: String = ""): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    val w = Window.partitionBy(quasiCols.map(col): _*)
    val sized = df.withColumn("__gc", count(lit(1)).over(w))
      .where(col("__gc") >= k)
    if (cohortSizeAs.isEmpty) sized.drop("__gc")
    else sized.withColumnRenamed("__gc", cohortSizeAs)
  }

  /** l-diversity audit — k-anonymity's mandatory companion: a cohort can
    * be large (k-anonymous) yet expose everyone if the SENSITIVE value is
    * uniform inside it (the homogeneity attack). Reports every
    * quasi-identifier cohort with its size and distinct-sensitive-value
    * count, flagging those below `l`. One aggregation (exact distinct
    * rides the same shuffle); release gates join the flagged cohorts back
    * as a suppression list. */
  def lDiversityAudit(df: DataFrame, quasiCols: Seq[String],
                      sensitiveCol: String, l: Int): DataFrame = {
    require(l >= 1, s"l must be >= 1, got $l")
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("cohort_size"),
        countDistinct(col(sensitiveCol)).as("distinct_sensitive"))
      .withColumn("diverse", col("distinct_sensitive") >= l)
  }
}
