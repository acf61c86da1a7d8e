package graft.sources

import java.nio.file.Files
import graft.SparkSpec
import graft.operators.AcidTable

/** Round 14: metadata-only aggregate pushdown — COUNT(*)/MIN/MAX
  * answered from the manifest (row counts + file stats) with no data
  * scan, declined whenever exactness would be at risk. */
class AcidAggSpec extends SparkSpec {
  import spark.implicits._

  private def kv(pairs: (Long, Long)*) = pairs.toDF("k", "v").coalesce(1)

  private def fresh(tag: String): String =
    Files.createTempDirectory(s"graft_acidagg_$tag").toString + "/tbl"

  private def served[T](body: => T): (T, Long) = {
    val before = AcidSource.metadataAggs.get()
    val out = body
    (out, AcidSource.metadataAggs.get() - before)
  }

  test("count/min/max fold from the manifest — no data scan") {
    val root = fresh("m")
    AcidTable.commitAppend(kv((1L to 10L).map(i => i -> i * 10): _*), root,
      statsCols = Seq("k"))
    AcidTable.commitAppend(kv((11L to 25L).map(i => i -> i * 10): _*), root,
      statsCols = Seq("k"))
    val df = spark.read.format("graft-acid").option("root", root).load()
    val (row, hits) = served {
      df.agg("k" -> "count", "k" -> "min", "k" -> "max").head()
    }
    assert(hits === 0L, "count(k) could miss nulls — must NOT push")
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) ===
      ((25L, 1L, 25L)))
    val (row2, hits2) = served {
      spark.read.format("graft-acid").option("root", root).load()
        .selectExpr("count(*) AS n", "min(k) AS mn", "max(k) AS mx").head()
    }
    assert(hits2 >= 1L, "count(*)+min+max on stats columns serve " +
      "metadata-only")
    assert((row2.getLong(0), row2.getLong(1), row2.getLong(2)) ===
      ((25L, 1L, 25L)))
    // the plan carries the marker, and ONE constant-row partition
    val agg = spark.read.format("graft-acid").option("root", root).load()
      .selectExpr("count(*)")
    assert(agg.queryExecution.executedPlan.toString
      .contains("metadata-only aggregate"))
  }

  test("declined when exactness is at risk: deletion vectors, missing " +
      "row counts, stat-less columns, filters, group by") {
    val root = fresh("d")
    AcidTable.commitAppend(kv((1L to 10L).map(i => i -> i * 10): _*), root,
      statsCols = Seq("k"))
    def loaded = spark.read.format("graft-acid").option("root", root).load()

    // a filter forces the real scan (and the right filtered answer)
    val (n0, h0) = served {
      loaded.where($"k" > 5L).selectExpr("count(*)").as[Long].head()
    }
    assert(h0 === 0L && n0 === 5L)
    // group by is never pushed
    val (g, h1) = served {
      loaded.groupBy($"k" % 2).count().collect()
    }
    assert(h1 === 0L && g.length === 2)
    // min/max on a column with no stats: real scan, right answer
    val (mv, h2) = served { loaded.selectExpr("min(v)").as[Long].head() }
    assert(h2 === 0L && mv === 10L)

    // a deletion vector makes physical row counts over-count: decline,
    // and the real scan returns the LOGICAL count
    AcidTable.deleteMor(spark, root, "k", 3L, 4L)
    val (n1, h3) = served {
      spark.read.format("graft-acid").option("root", root).load()
        .selectExpr("count(*)").as[Long].head()
    }
    assert(h3 === 0L && n1 === 8L,
      "masked table must scan (metadata would say 10)")
    // fold the masks: metadata serving resumes, now at the logical count
    AcidTable.compactDvs(spark, root, Seq("k"))
    val (n2, h4) = served {
      spark.read.format("graft-acid").option("root", root).load()
        .selectExpr("count(*)").as[Long].head()
    }
    assert(h4 >= 1L && n2 === 8L)

    // a table committed without footer stats has no row counts: decline
    val bare = fresh("b")
    AcidTable.commitAppend(kv(1L -> 1L, 2L -> 2L), bare)
    val (n3, h5) = served {
      spark.read.format("graft-acid").option("root", bare).load()
        .selectExpr("count(*)").as[Long].head()
    }
    assert(h5 === 0L && n3 === 2L)
  }

  test("SUM folds from the sum: segments when the table declares " +
      "sumCols; declined without them, under DVs, and on doubles") {
    val root = fresh("s")
    AcidTable.setSumCols(spark, root, Seq("k", "v"))
    AcidTable.commitAppend(kv((1L to 10L).map(i => i -> i * 10): _*), root,
      statsCols = Seq("k"))
    AcidTable.commitAppend(kv((11L to 25L).map(i => i -> i * 10): _*), root,
      statsCols = Seq("k"))
    assert(AcidTable.entriesOf(spark, root, 2L)
      .forall(e => e.sumFor("k").isDefined && e.sumFor("v").isDefined))
    val (row, hits) = served {
      spark.read.format("graft-acid").option("root", root).load()
        .selectExpr("sum(k) AS sk", "sum(v) AS sv", "count(*) AS n").head()
    }
    assert(hits >= 1L, "declared sumCols must serve SUM metadata-only")
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) ===
      ((325L, 3250L, 25L)))

    // a DV makes the recorded sums stale — decline, real scan exact
    AcidTable.deleteMor(spark, root, "k", 1L, 5L)
    val (s1, h1) = served {
      spark.read.format("graft-acid").option("root", root).load()
        .selectExpr("sum(k)").as[Long].head()
    }
    assert(h1 === 0L && s1 === 325L - 15L)

    // a table WITHOUT the property records no sums: decline
    val plain = fresh("sp")
    AcidTable.commitAppend(kv(1L -> 1L, 2L -> 2L), plain,
      statsCols = Seq("k"))
    val (s2, h2) = served {
      spark.read.format("graft-acid").option("root", plain).load()
        .selectExpr("sum(k)").as[Long].head()
    }
    assert(h2 === 0L && s2 === 3L)

    // a double column never records sums (fp addition is order-
    // dependent): decline, answer from the scan
    val dbl = fresh("sd")
    AcidTable.setSumCols(spark, dbl, Seq("x"))
    AcidTable.commitAppend(
      Seq((1L, 1.5), (2L, 2.5)).toDF("k", "x").coalesce(1), dbl,
      statsCols = Seq("k"))
    assert(AcidTable.entriesOf(spark, dbl, 1L).forall(_.sums.isEmpty))
    val (s3, h3) = served {
      spark.read.format("graft-acid").option("root", dbl).load()
        .selectExpr("sum(x)").as[Double].head()
    }
    assert(h3 === 0L && s3 === 4.0)
  }

  test("old-format manifest lines (no rc: segment) still parse and a " +
      "mixed table declines count pushdown") {
    val root = fresh("mix")
    AcidTable.commitAppend(kv(1L -> 1L), root) // no stats => no rc
    AcidTable.commitAppend(kv(2L -> 2L), root, statsCols = Seq("k"))
    val es = AcidTable.entriesOf(spark, root, 2L)
    assert(es.exists(_.rows.isEmpty) && es.exists(_.rows.isDefined))
    val (n, h) = served {
      spark.read.format("graft-acid").option("root", root).load()
        .selectExpr("count(*)").as[Long].head()
    }
    assert(h === 0L && n === 2L)
  }
}
