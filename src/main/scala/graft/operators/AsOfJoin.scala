package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the latest right row with
  * `right.time <= left.time` on the same key (tie rule: at-or-before,
  * matching DuckDB `ASOF JOIN`; SURVEY.md §2.B Q-JOIN7, §7.4.5).
  *
  * Spark has no native as-of join. The scalable formulation is
  * union-then-window: tag both sides, sort each key's timeline once, and
  * carry the last-seen right payload forward with
  * `last(_, ignoreNulls).over(running frame)`. This costs ONE shuffle on the
  * key (both inputs hash-partitioned together) and never materializes the
  * (left x earlier-rights) blow-up that a range-join + row_number
  * formulation would — the property that matters at 100 TB where a hot key
  * can have millions of right rows.
  */
object AsOfJoin {

  /** @param tieBreak right-side columns that make (key, time) unique; among
    *                 equal-time right rows the max tieBreak wins
    *                 (deterministic).
    * @return left rows + `asof_<c>` for each requested right value column
    *         (null when no right row is at-or-before).
    */
  def lastAtOrBefore(
      left: DataFrame,
      right: DataFrame,
      leftKey: String, leftTime: String,
      rightKey: String, rightTime: String,
      rightValueCols: Seq[String],
      tieBreak: Seq[String]): DataFrame = {

    val payloadCols = (rightTime +: tieBreak) ++ rightValueCols
    val l = left
      .withColumn("__k", col(leftKey))
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
    val r = right.select(
      col(rightKey).as("__k"),
      col(rightTime).as("__t"),
      struct(payloadCols.distinct.map(col): _*).as("__rv"))
      .withColumn("__side", lit(0))

    // Right rows sort before left rows at equal time => "at-or-before" is
    // inclusive. Among equal-time right rows the struct (time, tieBreak...)
    // ordering makes `last` deterministic.
    val w = Window.partitionBy("__k")
      .orderBy(col("__t").asc, col("__side").asc, col("__rv").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val joined = l.unionByName(r.withColumn("__lpad", lit(null)), allowMissingColumns = true)
      .drop("__lpad")
      .withColumn("__asof", last(col("__rv"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)

    val valueSel = rightValueCols.map(c => col("__asof").getField(c).as(s"asof_$c"))
    val timeSel = col("__asof").getField(rightTime).as(s"asof_$rightTime")
    joined.select(left.columns.toIndexedSeq.map(col) ++ (timeSel +: valueSel): _*)
  }

  /** Forward as-of: EARLIEST right row with `right.time >= left.time` per
    * key (the "next event after" direction — e.g. first fill after an
    * order). Same union+window shape, mirrored: descending time order,
    * left rows sort before right at equal time so ties are inclusive. */
  def firstAtOrAfter(
      left: DataFrame, right: DataFrame,
      leftKey: String, leftTime: String,
      rightKey: String, rightTime: String,
      rightValueCols: Seq[String], tieBreak: Seq[String]): DataFrame = {

    val payloadCols = (rightTime +: tieBreak) ++ rightValueCols
    val l = left
      .withColumn("__k", col(leftKey))
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
    val r = right.select(
      col(rightKey).as("__k"),
      col(rightTime).as("__t"),
      struct(payloadCols.distinct.map(col): _*).as("__rv"))
      .withColumn("__side", lit(0))

    // Descending time: "first at-or-after" = last right row seen walking
    // backwards. Among equal-time right rows the MIN tieBreak wins
    // (struct desc => last in frame is the smallest).
    val w = Window.partitionBy("__k")
      .orderBy(col("__t").desc, col("__side").asc, col("__rv").desc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val joined = l.unionByName(r.withColumn("__lpad", lit(null)), allowMissingColumns = true)
      .drop("__lpad")
      .withColumn("__asof", last(col("__rv"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)

    val valueSel = rightValueCols.map(c => col("__asof").getField(c).as(s"asof_$c"))
    val timeSel = col("__asof").getField(rightTime).as(s"asof_$rightTime")
    joined.select(left.columns.toIndexedSeq.map(col) ++ (timeSel +: valueSel): _*)
  }

  /** As-of with a maximum lookback: right row must be within `maxLookback`
    * (a Column interval, e.g. `expr("INTERVAL 7 DAYS")`) of the left time. */
  def lastWithin(
      left: DataFrame, right: DataFrame,
      leftKey: String, leftTime: String,
      rightKey: String, rightTime: String,
      rightValueCols: Seq[String], tieBreak: Seq[String],
      maxLookback: Column): DataFrame = {
    val joined = lastAtOrBefore(left, right, leftKey, leftTime, rightKey, rightTime,
      rightValueCols, tieBreak)
    val keep = col(s"asof_$rightTime").isNotNull &&
      col(s"asof_$rightTime") >= (col(leftTime) - maxLookback)
    val cleared = rightValueCols.foldLeft(
      joined.withColumn(s"asof_$rightTime", when(keep, col(s"asof_$rightTime")))) {
      (df, c) => df.withColumn(s"asof_$c", when(keep, col(s"asof_$c")))
    }
    cleared
  }
}
