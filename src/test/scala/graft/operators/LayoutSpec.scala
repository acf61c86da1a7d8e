package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue: bit interleave is injective and order-preserving on a grid") {
    val grid = spark.range(0, 16).toDF("x")
      .crossJoin(spark.range(0, 16).toDF("y"))
    val zs = grid.select(col("x"), col("y"),
      Layout.zValue(Seq(col("x"), col("y")), 4).as("z"))
      .as[(Long, Long, Long)].collect()
    assert(zs.map(_._3).distinct.length === 256, "injective on the grid")
    // spot-check the Morton pattern: (x=1,y=0)->1, (x=0,y=1)->2, (x=3,y=3)->15
    val m = zs.map { case (x, y, z) => (x, y) -> z }.toMap
    assert(m((0L, 0L)) === 0L)
    assert(m((1L, 0L)) === 1L)
    assert(m((0L, 1L)) === 2L)
    assert(m((3L, 3L)) === 15L)
  }

  test("zValue clamps negatives and overflow into range") {
    val df = Seq((-5L, 100L), (1000L, 2L)).toDF("x", "y")
    val zs = df.select(Layout.zValue(Seq(col("x"), col("y")), 4).as("z"))
      .as[Long].collect()
    // x=-5 clamps to 0, y=100 clamps to 15; x=1000 clamps to 15, y=2
    assert(zs.forall(z => z >= 0 && z < 256))
  }

  /** Sum over range-partitions of each column's (max-min) span — the
    * proxy for min/max skipping: a filter on the column must read every
    * partition whose span covers the value, so smaller summed spans =
    * fewer files read. */
  private def spans(df: DataFrame, c: String): Long =
    df.withColumn("__pid", spark_partition_id())
      .groupBy("__pid").agg((max(col(c)) - min(col(c))).as("span"))
      .agg(sum("span")).as[Long].head()

  test("z-ordered layout skips on BOTH columns; linear sort only on one") {
    // 256x256 grid: every (x, y) cell once — comparable cardinalities,
    // the regime z-ordering exists for. (The fixtures' suppkey range is
    // too small at test SF to show the effect; q_layout1 still oracles
    // the z-value arithmetic on real fixture data.)
    val grid = spark.range(0, 256).toDF("x")
      .crossJoin(spark.range(0, 256).toDF("y"))
    val parts = 16
    val zed = Layout.zorderBy(grid, parts, 8, col("x"), col("y"))
      .localCheckpoint()
    val linear = grid.repartitionByRange(parts, col("x"))
      .sortWithinPartitions("x").localCheckpoint()

    val (zx, zy) = (spans(zed, "x"), spans(zed, "y"))
    val (lx, ly) = (spans(linear, "x"), spans(linear, "y"))
    info(f"summed spans over $parts partitions — zorder: x $zx y $zy; linear: x $lx y $ly")
    // linear sort: near-perfect on x, useless on y (every partition spans
    // the whole y range)
    assert(ly > 255L * (parts - 2), "sanity: linear layout can't skip on y")
    // z-order: BOTH columns' summed spans far below the no-skipping level
    // (ideal square blocks would give ~parts * 255/sqrt(parts) ≈ 1020)
    assert(zy < ly / 2, s"zorder must at least halve the y spans: $zy vs $ly")
    assert(zx < ly / 2, s"zorder keeps x skippable too: $zx vs $ly")
  }
}
