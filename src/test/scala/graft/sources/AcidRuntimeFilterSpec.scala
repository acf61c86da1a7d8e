package graft.sources

import java.nio.file.Files
import graft.SparkSpec
import graft.operators.AcidTable
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.types._

/** Round 14: runtime (DPP-style) filtering on the DSv2 scan — a join's
  * observed build-side keys re-plan the scan so excluded files never
  * become partitions. */
class AcidRuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  private def kv(pairs: (Long, Long)*) = pairs.toDF("k", "v").coalesce(1)

  private def fresh(tag: String): String =
    Files.createTempDirectory(s"graft_acidrf_$tag").toString + "/tbl"

  private def threeFiles(): String = {
    val root = fresh("t")
    Seq(1L to 10L, 11L to 20L, 21L to 30L).foreach { r =>
      AcidTable.commitAppend(kv(r.map(i => i -> i * 10): _*), root,
        statsCols = Seq("k"))
    }
    root
  }

  test("filter() with an IN predicate re-plans to the surviving files " +
      "only; answers unchanged") {
    val root = threeFiles()
    val opts = new CaseInsensitiveStringMap(
      java.util.Map.of("root", root))
    val schema = AcidSource.tableSchema(spark, root)
    val scan = new AcidScan(schema, opts,
      AcidTable.currentVersion(spark, root))
    assert(scan.filterAttributes().map(_.fieldNames()(0)).toSeq === Seq("k"))
    assert(scan.toBatch.planInputPartitions().length === 3)
    // the runtime IN set lands: only the middle file's range survives
    case class Lit(v: Long) extends
        org.apache.spark.sql.connector.expressions.Literal[java.lang.Long] {
      override def value(): java.lang.Long = java.lang.Long.valueOf(v)
      override def dataType(): org.apache.spark.sql.types.DataType = LongType
    }
    val in = new Predicate("IN", Array(
      Expressions.column("k"), Lit(13L), Lit(17L)))
    scan.filter(Array(in))
    assert(scan.toBatch.planInputPartitions().length === 1,
      "IN [13,17] must prune files 1..10 and 21..30")
  }

  test("a broadcast join's dim filter prunes the fact scan at runtime " +
      "(dynamic pruning end-to-end)") {
    val root = threeFiles()
    // the dim must be a REAL relation: a local Seq would constant-fold
    // its filter away and DPP sees no selective predicate
    val dimDir = Files.createTempDirectory("graft_acidrf_dim").toString
    Seq((13L, "hot"), (15L, "hot"), (40L, "cold")).toDF("k", "tag")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val fact = spark.read.format("graft-acid").option("root", root).load()
    val before = AcidSource.runtimeFilteredScans.get()
    val prev = (
      spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.useStats"),
      spark.conf.get(
        "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly"))
    spark.conf.set(
      "spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    spark.conf.set(
      "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly",
      "false")
    try {
      val j = fact.join(dim.where($"tag" === "hot"), Seq("k"))
        .select("k", "v")
      info("plan: " + j.queryExecution.executedPlan.toString
        .linesIterator.filter(l => l.contains("RuntimeFilters") ||
          l.contains("dynamicpruning")).mkString(" | "))
      val got = j.as[(Long, Long)].collect().toSet
      assert(got === Set(13L -> 130L, 15L -> 150L))
    } finally {
      spark.conf.set(
        "spark.sql.optimizer.dynamicPartitionPruning.useStats", prev._1)
      spark.conf.set(
        "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly",
        prev._2)
    }
    val pruned = AcidSource.runtimeFilteredScans.get() - before
    assert(pruned >= 1L,
      "Spark must hand the broadcast build-side keys to the scan " +
        "(dynamicpruningexpression on k) and the scan must re-plan")
  }
}
