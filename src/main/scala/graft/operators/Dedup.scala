package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact deduplication (SURVEY.md §2.B Q-SET4 / Q-DEDUP1).
  *
  * `dropDuplicates` is nondeterministic about which row survives (whichever
  * arrives first at the aggregating task). Anything oracle-checked — and
  * anything a reproducible 100 TB pipeline should ship — uses the
  * row_number=1 formulation with a total tie-break instead (SURVEY.md
  * §7.4.2). Cost is identical: one shuffle on the dedup key.
  */
object Dedup {

  /** Keep exactly one row per key set: the minimum by `tieBreak`. */
  def exactByKeys(df: DataFrame, keys: Seq[String], tieBreak: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(tieBreak.map(c => col(c).asc): _*)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** [[exactByKeys]] when the caller keeps only columns from
    * `keys ++ tieBreak`: the survivor's kept values are then determined
    * by the minimum tie-break tuple alone, so the pick folds into ONE
    * partial-aggregated min-of-struct — no full-width sort, no rank
    * window, and the shuffle carries one pre-reduced row per (partition,
    * key) instead of every input row (r15; the q_set4 shape). Output:
    * keys ++ keep, identical rows to
    * `exactByKeys(df, keys, tieBreak).select(keys ++ keep)`. */
  def exactByKeysProjected(df: DataFrame, keys: Seq[String],
                           tieBreak: Seq[String], keep: Seq[String]): DataFrame = {
    require(keep.forall(c => keys.contains(c) || tieBreak.contains(c)),
      "keep must be a subset of keys ++ tieBreak — any other column is " +
        "not determined by the min tie-break tuple; use exactByKeys")
    val m = min(struct(tieBreak.map(col): _*)).as("__m")
    df.groupBy(keys.map(col): _*).agg(m)
      .select(keys.map(col) ++
        keep.filterNot(keys.contains).map(c => col(s"__m.$c").as(c)): _*)
  }

  /** Content dedup by a derived key expression (e.g. a normalization hash). */
  def exactByExpr(df: DataFrame, keyExpr: Column, keyName: String, tieBreak: Seq[String]): DataFrame =
    exactByKeys(df.withColumn(keyName, keyExpr), Seq(keyName), tieBreak)

  /** Canonical text-normalization content hash: sha256 of lower(trim(text)).
    * sha2 is a codegen'd built-in; 256-bit => collision-free in practice at
    * any scale, and the 64-char hex key shuffles far cheaper than long text. */
  def contentHash(textCol: Column): Column = sha2(lower(trim(textCol)), 256)
}
