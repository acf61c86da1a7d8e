package graft.sources

import java.nio.file.Files
import graft.SparkSpec
import graft.operators.AcidTable

/** Round 14: SQL DELETE / UPDATE / MERGE INTO through the group-based
  * row-level operation — the engine's copy-on-write commit reached by
  * Spark's own rewrite machinery. */
class AcidRowLevelSpec extends SparkSpec {
  import spark.implicits._

  private val base = Files.createTempDirectory("graft_acidrl").toString
  spark.conf.set("spark.sql.catalog.rl", "graft.sources.AcidCatalog")
  spark.conf.set("spark.sql.catalog.rl.root", base)

  private def kv(pairs: (Long, Long)*) = pairs.toDF("k", "v").coalesce(1)

  private def mk(name: String): String = {
    val root = s"$base/$name"
    Seq(1L to 10L, 11L to 20L, 21L to 30L).foreach { r =>
      AcidTable.commitAppend(kv(r.map(i => i -> i * 10): _*), root,
        statsCols = Seq("k"))
    }
    root
  }

  private def state(name: String): Set[(Long, Long)] =
    spark.sql(s"SELECT k, v FROM rl.$name").as[(Long, Long)]
      .collect().toSet

  test("DELETE FROM rewrites only the groups that can match; " +
      "untouched files carry by reference") {
    val root = mk("d1")
    val before = AcidTable.entriesOf(spark, root, 3L).map(_.path).toSet
    spark.sql("DELETE FROM rl.d1 WHERE k BETWEEN 13 AND 17")
    assert(state("d1") ===
      ((1L to 30L).toSet -- (13L to 17L)).map(i => i -> i * 10))
    val after = AcidTable.entriesOf(spark, root,
      AcidTable.currentVersion(spark, root)).map(_.path).toSet
    assert((before & after).size >= 2,
      s"the two unmatched files must carry by reference " +
        s"(before=$before after=$after)")
    // pre-delete snapshot intact
    assert(AcidTable.readAsOf(spark, root, 3L).count() === 30L)
  }

  test("UPDATE mutates matching rows in place (copy-on-write)") {
    mk("u1")
    spark.sql("UPDATE rl.u1 SET v = v + 1 WHERE k % 10 = 7")
    val expect = (1L to 30L).map(i =>
      i -> (if (i % 10 == 7) i * 10 + 1 else i * 10)).toSet
    assert(state("u1") === expect)
  }

  test("MERGE INTO upserts: matched rows update, new keys insert") {
    mk("m1")
    Seq((5L, 555L), (15L, 1515L), (40L, 400L)).toDF("k", "v")
      .createOrReplaceTempView("rl_src")
    spark.sql(
      """MERGE INTO rl.m1 t USING rl_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET v = s.v
        |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""".stripMargin)
    val expect = ((1L to 30L).map(i => i -> i * 10).toMap ++
      Map(5L -> 555L, 15L -> 1515L, 40L -> 400L)).toSet
    assert(state("m1") === expect)
  }

  test("MERGE INTO with DELETE clause removes matched rows") {
    mk("m2")
    Seq(3L, 23L).toDF("k").createOrReplaceTempView("rl_del")
    spark.sql(
      """MERGE INTO rl.m2 t USING rl_del s ON t.k = s.k
        |WHEN MATCHED THEN DELETE""".stripMargin)
    assert(state("m2") ===
      ((1L to 30L).toSet - 3L - 23L).map(i => i -> i * 10))
  }

  test("DELETE of every row leaves a readable empty table") {
    val root = mk("d2")
    spark.sql("DELETE FROM rl.d2 WHERE k > 0")
    assert(spark.sql("SELECT count(*) FROM rl.d2").as[Long].head() === 0L)
    assert(AcidTable.read(spark, root).columns.toSeq === Seq("k", "v"),
      "a schema-bearing empty file must survive")
  }

  test("a row-level SQL op composes with the ACID machinery: history, " +
      "time travel, and a following engine-level merge") {
    val root = mk("c1")
    spark.sql("DELETE FROM rl.c1 WHERE k = 1")
    assert(AcidTable.history(spark, root).map(_._2).last === "merge")
    AcidTable.mergeMor(kv(2L -> 222L), root, "k", statsCols = Seq("k"))
    assert(state("c1").contains(2L -> 222L) &&
      !state("c1").exists(_._1 == 1L))
  }
}
