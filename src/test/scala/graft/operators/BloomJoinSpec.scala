package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("pruned join equals the plain join exactly (fp rows die in the join)") {
    val li = Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
    val dim = Tables.load(spark, sf, "part").where(col("p_size") === 1)
      .select(col("p_partkey").as("l_partkey"), col("p_name"))
    val pruned = BloomJoin.prunedJoin(li, dim, "l_partkey", expectedItems = 32768)
      .select("l_orderkey", "l_linenumber", "l_quantity", "p_name")
    val plain = li.join(dim, "l_partkey")
      .select("l_orderkey", "l_linenumber", "l_quantity", "p_name")
    assert(pruned.count() === plain.count())
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
  }

  test("bloom has no false negatives and a bounded pass-through rate") {
    val keys = spark.range(0, 2000).toDF("k")
    val members = keys.where(col("k") % 10 === 0) // 200 build keys
    val kept = keys.where(BloomJoin.mightContain(
      members, col("k"), col("k"), expectedItems = 1000, fpp = 0.01))
      .as[Long].collect().toSet
    assert((0L until 2000L by 10).forall(kept.contains), "a present key was dropped")
    // 200 members + ~1% fp of the 1800 non-members; allow generous slack
    assert(kept.size < 200 + 180, s"fp rate way above target: ${kept.size}")
  }

  test("might_contain filter sits on the fact scan BELOW the join exchange") {
    val li = Tables.load(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    val dim = Tables.load(spark, sf, "part").where(col("p_size") === 1)
      .select(col("p_partkey").as("l_partkey"))
    val p = BloomJoin.prunedJoin(li, dim, "l_partkey", expectedItems = 32768)
      .queryExecution.executedPlan.toString
    assert(p.contains("might_contain"), p.take(1500))
    assert(p.contains("SortMergeJoin"), "merge hint must model the big-big shape")
    // the probe must be a Filter on the fact SIDE (pre-shuffle), i.e. the
    // might_contain string appears after the fact-side Exchange in the
    // bottom-up rendering — assert it is NOT applied post-join: no Filter
    // above the SortMergeJoin node mentions might_contain.
    val joinIdx = p.indexOf("SortMergeJoin")
    assert(p.indexOf("might_contain", joinIdx) > joinIdx,
      "bloom probe must run under the join, on the scan side")
  }
}
