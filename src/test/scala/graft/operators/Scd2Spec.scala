package graft.operators

import java.sql.Date
import org.apache.spark.sql.functions._
import graft.SparkSpec

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private val d1 = to_date(lit("2024-01-01"))
  private val d2 = to_date(lit("2024-02-01"))

  // keys: 1 unchanged, 2 changed, 3 deleted; 4 arrives new in snapshot 2
  private val snap1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
  private val snap2 = Seq((1L, "a"), (2L, "B"), (4L, "d")).toDF("k", "v")

  private def history() = Scd2.applySnapshot(
    Scd2.init(snap1, d1), snap2, Seq("k"), Seq("v"), d2)

  test("applySnapshot covers unchanged/changed/deleted/new in one pass") {
    val rows = history()
      .select("k", "v", "valid_from", "valid_to", "is_current")
      .as[(Long, String, Date, Option[Date], Boolean)]
      .collect().sortBy(r => (r._1, r._3.toString))
    assert(rows.toSeq === Seq(
      (1L, "a", Date.valueOf("2024-01-01"), None, true),
      (2L, "b", Date.valueOf("2024-01-01"), Some(Date.valueOf("2024-02-01")), false),
      (2L, "B", Date.valueOf("2024-02-01"), None, true),
      (3L, "c", Date.valueOf("2024-01-01"), Some(Date.valueOf("2024-02-01")), false),
      (4L, "d", Date.valueOf("2024-02-01"), None, true)))
  }

  test("re-applying the same snapshot is a no-op (idempotent maintenance)") {
    val h2 = history()
    val h3 = Scd2.applySnapshot(h2, snap2, Seq("k"), Seq("v"),
      to_date(lit("2024-03-01")))
    assert(h3.exceptAll(h2).count() === 0)
    assert(h2.exceptAll(h3).count() === 0)
  }

  test("asOfView reconstructs the dimension at any point in time") {
    val h = history()
    val atJan = Scd2.asOfView(h, to_date(lit("2024-01-15")))
      .select("k", "v").as[(Long, String)].collect().toSet
    assert(atJan === Set((1L, "a"), (2L, "b"), (3L, "c")))
    val atFeb = Scd2.asOfView(h, to_date(lit("2024-02-15")))
      .select("k", "v").as[(Long, String)].collect().toSet
    assert(atFeb === Set((1L, "a"), (2L, "B"), (4L, "d")))
  }
}
