package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order data layout — multi-dimensional clustering for min-max data
  * skipping. A single-column sort gives perfect file-level min/max pruning
  * on that column and none on any other; interleaving the bits of several
  * columns (a Morton / Z space-filling curve) keeps rows that are close in
  * EVERY dimension close in the one-dimensional sort order, so each file's
  * min/max range is narrow on all clustered columns at once. At 100 TB
  * this is the difference between a filter on a secondary column scanning
  * every file and scanning a handful — the same layout step Delta's
  * OPTIMIZE ZORDER BY and Iceberg's sort-order rewrite perform.
  *
  * The z-value is pure integer arithmetic (shift/mask/sum), so it stays in
  * whole-stage codegen and is SQL-replicable for oracle checks; the layout
  * itself is one range repartition + local sort — exactly the cost of any
  * global sort, no extra shuffle.
  */
object Layout {

  /** Morton z-value: interleave the low `bits` bits of each column
    * (clamped into [0, 2^bits)); column i's bit b lands at position
    * b * numCols + i. Fits a long for bits * numCols <= 62. */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty && bits > 0 && bits * cols.size <= 62,
      s"need 0 < bits(${bits}) * cols(${cols.size}) <= 62")
    val n = cols.size
    val maxV = (1L << bits) - 1
    val terms = for {
      (c, ci) <- cols.zipWithIndex
      clamped = greatest(lit(0L), least(c.cast("long"), lit(maxV)))
      b <- 0 until bits
    } yield shiftleft(shiftright(clamped, b).bitwiseAND(lit(1L)), b * n + ci)
    terms.reduce(_ + _)
  }

  /** The DuckDB-equivalent SQL for [[zValue]] — same clamp, shifts, and
    * bit positions, so engine and oracle agree bit-for-bit. */
  def zValueSql(cols: Seq[String], bits: Int): String = {
    val n = cols.size
    val maxV = (1L << bits) - 1
    val terms = for {
      (c, ci) <- cols.zipWithIndex
      cl = s"greatest(CAST(0 AS BIGINT), least(CAST($c AS BIGINT), $maxV))"
      b <- 0 until bits
    } yield s"((($cl >> $b) & 1) << ${b * n + ci})"
    terms.mkString("(", " + ", ")")
  }

  /** Re-layout `df` along the z-curve of `cols`: range-partition by
    * z-value (each output partition owns a contiguous z-range => narrow
    * min/max on every clustered column) and sort within partitions so
    * row-group-level stats are tight too. Write the result partitioned
    * as-is and every file serves min/max skipping on ALL of `cols`. */
  def zorderBy(df: DataFrame, numPartitions: Int, bits: Int, cols: Column*): DataFrame = {
    val z = zValue(cols, bits)
    df.repartitionByRange(numPartitions, z).sortWithinPartitions(z)
  }
}
