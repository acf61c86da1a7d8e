package graft.sources

import java.nio.file.Files
import graft.SparkSpec
import graft.operators.AcidTable

/** Round 15: DDL through the catalog — CREATE TABLE (readable from
  * birth), atomic CTAS via StagingTableCatalog (a failed CTAS leaves
  * NOTHING), REPLACE AS SELECT as an overwrite commit, DROP, RENAME,
  * and TBLPROPERTIES persisting as table properties. */
class AcidCtasSpec extends SparkSpec {
  import spark.implicits._

  private val base = Files.createTempDirectory("graft_acidctas").toString
  spark.conf.set("spark.sql.catalog.ct", "graft.sources.AcidCatalog")
  spark.conf.set("spark.sql.catalog.ct.root", base)

  test("CTAS lands v1 atomically and reads back exactly") {
    spark.sql(
      "CREATE TABLE ct.t1 AS SELECT id AS k, id * 10 AS v FROM range(20)")
    assert(spark.sql("SELECT k, v FROM ct.t1").as[(Long, Long)]
      .collect().toSet === (0L until 20L).map(i => i -> i * 10).toSet)
    assert(AcidTable.versions(spark, s"$base/t1") === Seq(1L))
    assert(AcidTable.actionOf(spark, s"$base/t1", 1L) === "overwrite")
  }

  test("plain CREATE TABLE is readable from birth; INSERT INTO appends") {
    spark.sql("CREATE TABLE ct.t2 (k BIGINT, v STRING)")
    assert(spark.sql("SELECT * FROM ct.t2").count() === 0L)
    spark.sql("INSERT INTO ct.t2 VALUES (1, 'a'), (2, 'b')")
    assert(spark.sql("SELECT k, v FROM ct.t2").as[(Long, String)]
      .collect().toSet === Set(1L -> "a", 2L -> "b"))
  }

  test("CTAS onto an existing table fails; the table is untouched") {
    spark.sql("CREATE TABLE ct.t3 AS SELECT id AS k FROM range(5)")
    intercept[Exception] {
      spark.sql("CREATE TABLE ct.t3 AS SELECT id AS k FROM range(50)")
    }
    assert(spark.sql("SELECT count(*) FROM ct.t3").head().getLong(0) === 5L)
    assert(AcidTable.versions(spark, s"$base/t3") === Seq(1L))
  }

  test("a failed CTAS leaves no table behind") {
    intercept[Exception] {
      spark.sql(
        """CREATE TABLE ct.t4 AS
          |SELECT id AS k, assert_true(id < 5, 'boom') AS v
          |FROM range(100000)""".stripMargin)
    }
    assert(AcidTable.versions(spark, s"$base/t4").isEmpty,
      "no manifest may exist after a failed CTAS")
    intercept[Exception] { spark.sql("SELECT * FROM ct.t4").collect() }
  }

  test("REPLACE TABLE AS SELECT overwrites; history stays travelable") {
    spark.sql("CREATE TABLE ct.t5 AS SELECT id AS k FROM range(7)")
    spark.sql("REPLACE TABLE ct.t5 AS SELECT id * 2 AS k FROM range(3)")
    assert(spark.sql("SELECT k FROM ct.t5").as[Long].collect().toSet ===
      Set(0L, 2L, 4L))
    assert(AcidTable.versions(spark, s"$base/t5") === Seq(1L, 2L))
    assert(AcidTable.readAsOf(spark, s"$base/t5", 1L).count() === 7L)
  }

  test("TBLPROPERTIES persist: key routes SQL DELETE through the " +
      "delta path, statsCols collect on option-less writes") {
    spark.sql(
      """CREATE TABLE ct.t6 TBLPROPERTIES ('key'='k', 'statsCols'='k')
        |AS SELECT id AS k, id * 10 AS v FROM range(30)""".stripMargin)
    val root = s"$base/t6"
    assert(AcidTable.tableProperties(spark, root) ===
      Map("key" -> "k", "statsCols" -> "k"))
    // option-less CTAS write collected stats via the property
    assert(AcidTable.entriesOf(spark, root, 1L)
      .forall(_.statFor("k").isDefined))
    val before = AcidTable.entriesOf(spark, root, 1L).map(_.path).toSet
    spark.sql("DELETE FROM ct.t6 WHERE k = 3")
    val entries = AcidTable.entriesOf(spark, root,
      AcidTable.currentVersion(spark, root))
    assert(entries.map(_.path).toSet === before,
      "the declared key must route the delete as a DV commit")
    assert(entries.exists(_.dv.isDefined))
    assert(spark.sql("SELECT count(*) FROM ct.t6").head().getLong(0) === 29L)
  }

  test("DROP TABLE removes it; RENAME moves it") {
    spark.sql("CREATE TABLE ct.t7 AS SELECT id AS k FROM range(4)")
    spark.sql("ALTER TABLE ct.t7 RENAME TO ct.t7b")
    assert(spark.sql("SELECT count(*) FROM ct.t7b").head().getLong(0) === 4L)
    intercept[Exception] { spark.sql("SELECT * FROM ct.t7").collect() }
    spark.sql("DROP TABLE ct.t7b")
    intercept[Exception] { spark.sql("SELECT * FROM ct.t7b").collect() }
    assert(!new java.io.File(s"$base/t7b").exists())
  }
}
