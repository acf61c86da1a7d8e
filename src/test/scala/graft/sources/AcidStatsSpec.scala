package graft.sources

import java.nio.file.Files
import graft.SparkSpec
import graft.operators.AcidTable
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Round 14: manifest-derived planner statistics — size/rows reported
  * through SupportsReportStatistics so join strategy sees real numbers
  * (a small acid dim auto-broadcasts) and estimates shrink under
  * pushdown. */
class AcidStatsSpec extends SparkSpec {
  import spark.implicits._

  private def kv(pairs: (Long, Long)*) = pairs.toDF("k", "v").coalesce(1)

  private def fresh(tag: String): String =
    Files.createTempDirectory(s"graft_acidst_$tag").toString + "/tbl"

  test("estimateStatistics reports manifest rows and bytes; the " +
      "estimate shrinks under a pushed filter") {
    val root = fresh("e")
    Seq(1L to 10L, 11L to 20L, 21L to 30L).foreach { r =>
      AcidTable.commitAppend(kv(r.map(i => i -> i * 10): _*), root,
        statsCols = Seq("k"))
    }
    val opts = new CaseInsensitiveStringMap(java.util.Map.of("root", root))
    val scan = new AcidScan(AcidSource.tableSchema(spark, root), opts,
      AcidTable.currentVersion(spark, root))
    val st = scan.estimateStatistics()
    assert(st.numRows().getAsLong === 30L)
    val entries = AcidTable.entriesOf(spark, root, 3L)
    assert(entries.forall(_.bytes.isDefined))
    assert(st.sizeInBytes().getAsLong === entries.flatMap(_.bytes).sum)
    // through the planner: the filtered relation's estimate is smaller
    val df = spark.read.format("graft-acid").option("root", root).load()
    val full = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val pruned = df.where($"k" >= 25L)
      .queryExecution.optimizedPlan.stats.sizeInBytes
    assert(pruned < full,
      s"filter must shrink the size estimate ($pruned !< $full)")
  }

  test("a masked snapshot reports size but withholds the row count " +
      "(physical rows over-count)") {
    val root = fresh("m")
    AcidTable.commitAppend(kv((1L to 10L).map(i => i -> i): _*), root,
      statsCols = Seq("k"))
    AcidTable.deleteMor(spark, root, "k", 2L, 3L)
    val opts = new CaseInsensitiveStringMap(java.util.Map.of("root", root))
    val scan = new AcidScan(AcidSource.tableSchema(spark, root), opts,
      AcidTable.currentVersion(spark, root))
    val st = scan.estimateStatistics()
    assert(st.sizeInBytes().isPresent && !st.numRows().isPresent)
  }

  test("a small acid dim AUTO-BROADCASTS against a bigger fact — no " +
      "hint needed, the size estimate decides") {
    val dimRoot = fresh("d")
    AcidTable.commitAppend(
      (1L to 20L).map(i => (i, s"name_$i")).toDF("k", "nm").coalesce(1),
      dimRoot, statsCols = Seq("k"))
    val factDir = Files.createTempDirectory("graft_acidst_f").toString
    (1L to 20000L).map(i => (i % 20 + 1, i)).toDF("k", "x")
      .write.mode("overwrite").parquet(factDir)
    val dim = spark.read.format("graft-acid").option("root", dimRoot).load()
    val fact = spark.read.parquet(factDir)
    val j = fact.join(dim, Seq("k"))
    assert(j.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"),
      "manifest size stats must let the planner pick broadcast")
    assert(j.count() === 20000L)
  }
}
