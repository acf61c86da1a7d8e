package graft.sources

import java.nio.file.Files
import graft.SparkSpec
import graft.operators.AcidTable

/** Round 14: the SQL catalog — named tables, VERSION/TIMESTAMP AS OF,
  * INSERT INTO through the DSv2 write path, and the `.history`
  * metadata table. */
class AcidCatalogSpec extends SparkSpec {
  import spark.implicits._

  private val base = Files.createTempDirectory("graft_acidcat").toString
  spark.conf.set("spark.sql.catalog.cat", "graft.sources.AcidCatalog")
  spark.conf.set("spark.sql.catalog.cat.root", base)

  private def kv(pairs: (Long, Long)*) = pairs.toDF("k", "v").coalesce(1)

  private def mk(name: String): String = {
    val root = s"$base/$name"
    AcidTable.commitAppend(kv(1L -> 10L, 2L -> 20L), root,
      statsCols = Seq("k"))
    AcidTable.commitAppend(kv(3L -> 30L), root, statsCols = Seq("k"))
    root
  }

  test("named SELECT resolves the table; VERSION AS OF time-travels") {
    mk("t1")
    assert(spark.sql("SELECT k, v FROM cat.t1").as[(Long, Long)]
      .collect().toSet === Set(1L -> 10L, 2L -> 20L, 3L -> 30L))
    assert(spark.sql("SELECT k FROM cat.t1 VERSION AS OF 1").as[Long]
      .collect().toSet === Set(1L, 2L))
    // pushed filters prune through the SQL surface too
    assert(spark.sql("SELECT v FROM cat.t1 WHERE k = 3").as[Long]
      .collect().toSeq === Seq(30L))
  }

  test("TIMESTAMP AS OF resolves the latest version at-or-before") {
    mk("t2")
    // a future timestamp sees the current state
    assert(spark.sql(
      "SELECT count(*) FROM cat.t2 TIMESTAMP AS OF '2200-01-01'")
      .as[Long].head() === 3L)
    // a timestamp before the first commit fails fast
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM cat.t2 TIMESTAMP AS OF '2000-01-01'")
        .collect()
    }
    assert(e.getMessage.contains("no version committed"))
  }

  test("INSERT INTO appends through the rebase commit; " +
      "INSERT OVERWRITE replaces") {
    val root = mk("t3")
    spark.sql("INSERT INTO cat.t3 VALUES (4, 40)")
    assert(AcidTable.history(spark, root).map(_._2) ===
      Seq("append", "append", "append"))
    assert(spark.sql("SELECT count(*) FROM cat.t3").as[Long].head() === 4L)
    spark.sql("INSERT OVERWRITE cat.t3 VALUES (9, 90)")
    assert(AcidTable.actionOf(spark, root,
      AcidTable.currentVersion(spark, root)) === "overwrite")
    assert(spark.sql("SELECT k, v FROM cat.t3").as[(Long, Long)]
      .collect().toSet === Set(9L -> 90L))
  }

  test("the .history metadata table serves the commit log") {
    val root = mk("t4")
    val got = spark.sql(
      "SELECT version, action, n_files FROM cat.t4.history ORDER BY version")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq
    assert(got === AcidTable.history(spark, root))
    assert(spark.sql("SELECT ts_millis FROM cat.t4.history")
      .as[Long].collect().forall(_ > 0L))
  }

  test("listTables sees only AcidTable directories; DROP removes " +
      "an engine-created table too (round 15: DDL is real now)") {
    mk("t5")
    Files.createDirectory(java.nio.file.Paths.get(s"$base/not_a_table"))
    val names = spark.sql("SHOW TABLES IN cat").collect()
      .map(_.getString(1)).toSet
    assert(names.contains("t5") && !names.contains("not_a_table"))
    spark.sql("DROP TABLE cat.t5")
    assert(!spark.sql("SHOW TABLES IN cat").collect()
      .map(_.getString(1)).contains("t5"))
  }

  test("count(*) through the catalog serves metadata-only too") {
    mk("t6")
    val before = AcidSource.metadataAggs.get()
    assert(spark.sql("SELECT count(*) FROM cat.t6").as[Long].head() === 3L)
    assert(AcidSource.metadataAggs.get() > before,
      "the SQL path shares the ScanBuilder, so the manifest fold serves")
  }

  test("the .detail metadata table serves the physical summary") {
    val root = mk("t7")
    val r = spark.sql(
      "SELECT version, last_action, n_files, data_bytes FROM cat.t7.detail")
      .head()
    assert(r.getLong(0) === 2L && r.getString(1) === "append")
    assert(r.getLong(2) === 2L && r.getLong(3) > 0L)
    // matches the engine-level DESCRIBE DETAIL row
    val api = graft.operators.AcidTable.detail(spark, root).head()
    assert(r.getLong(3) === api.getAs[Long]("data_bytes"))
  }

  test("nested namespaces map to subdirectories") {
    val root = s"$base/ns/deep"
    AcidTable.commitAppend(kv(7L -> 70L), root)
    assert(spark.sql("SELECT k, v FROM cat.ns.deep").as[(Long, Long)]
      .collect().toSet === Set(7L -> 70L))
  }
}
