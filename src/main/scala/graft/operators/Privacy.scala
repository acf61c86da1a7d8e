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
}
