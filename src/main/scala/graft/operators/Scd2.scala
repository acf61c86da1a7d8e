package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 maintenance: full history of every
  * dimension row, one row per value interval, `[valid_from, valid_to)`
  * with `valid_to IS NULL` + `is_current` marking the live row. The shape
  * the reference's symbol dimension would need the day a company's
  * name/sector changes (its CSV snapshot overwrite loses history).
  *
  * Per snapshot application: ONE key-partitioned full-outer join of the
  * CURRENT slice against the snapshot; closed history passes through
  * untouched. At scale the history table is partitioned by `is_current`
  * so the join reads only the live slice — the closed majority is never
  * scanned. Deterministic: pure column comparisons, no clocks (the
  * snapshot time is an explicit argument).
  */
object Scd2 {

  /** Start a type-2 history from the first snapshot: every row current
    * as of `asOf` (a date Column). */
  def init(snapshot: DataFrame, asOf: Column): DataFrame =
    snapshot
      .withColumn("valid_from", asOf)
      .withColumn("valid_to", lit(null).cast("date"))
      .withColumn("is_current", lit(true))

  /** Apply a full snapshot taken at `asOf`:
    *  - key in both, tracked values unchanged → current row kept as-is
    *  - key in both, changed → current row closed at `asOf` + new current
    *  - key only in history → closed at `asOf` (deleted from the dim)
    *  - key only in snapshot → new current row
    * Tracked comparison is null-safe (`<=>`): a null value is a value,
    * not a perpetual change.
    *
    * Single-pass shape: ONE full-outer join, then each joined row
    * explodes into its 1–2 output rows (kept | closed [+ opened]) — a
    * per-branch filter+union would re-plan the join once per branch and
    * scan both inputs three times (plan-asserted in PlanShapeSpec). */
  def applySnapshot(history: DataFrame, snapshot: DataFrame,
                    keyCols: Seq[String], trackedCols: Seq[String],
                    asOf: Column): DataFrame = {
    val outCols = keyCols ++ trackedCols ++ Seq("valid_from", "valid_to", "is_current")
    require(history.columns.toSet == outCols.toSet,
      s"history columns ${history.columns.mkString(",")} must be exactly keys + tracked + bookkeeping")
    val current = history.where(col("is_current"))
    val past = history.where(!col("is_current"))
    val snapR = snapshot.select(
      keyCols.map(c => col(c).as(s"__k_$c")) ++
        trackedCols.map(c => col(c).as(s"__v_$c")): _*)
    val keyCond = keyCols.map(c => col(c) === col(s"__k_$c")).reduce(_ && _)
    val j = current.join(snapR, keyCond, "full_outer")
    val inSnap = col(s"__k_${keyCols.head}").isNotNull
    val inHist = col(keyCols.head).isNotNull
    val changed = trackedCols.map(c => !(col(c) <=> col(s"__v_$c"))).reduce(_ || _)
    val kept = struct(outCols.map(c => col(c).as(c)): _*)
    val closed = struct(
      (keyCols ++ trackedCols :+ "valid_from").map(c => col(c).as(c)) ++
        Seq(asOf.as("valid_to"), lit(false).as("is_current")): _*)
    val opened = struct(
      keyCols.map(c => col(s"__k_$c").as(c)) ++
        trackedCols.map(c => col(s"__v_$c").as(c)) ++
        Seq(asOf.as("valid_from"), lit(null).cast("date").as("valid_to"),
          lit(true).as("is_current")): _*)
    val rowsOut =
      when(inHist && inSnap && !changed, array(kept))
        .when(inHist && inSnap && changed, array(closed, opened))
        .when(inHist && !inSnap, array(closed))
        .otherwise(array(opened))
    past.select(outCols.map(col): _*)
      .unionByName(j.select(explode(rowsOut).as("__r")).select(col("__r.*")))
  }

  /** Point-in-time view of a type-2 history: the dimension exactly as it
    * stood at `at` — the join target for reprocessing old facts. */
  def asOfView(history: DataFrame, at: Column): DataFrame =
    history.where(col("valid_from") <= at &&
      (col("valid_to").isNull || col("valid_to") > at))
}
