package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DataSplitSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ids = spark.range(0, 10000).toDF("id")

  test("splits are complete, disjoint, and roughly sized") {
    val out = DataSplit.assignSplit(ids, col("id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = out.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum === 10000L)
    assert(math.abs(counts("train") - 8000L) < 300, counts.toString)
    assert(math.abs(counts("val") - 1000L) < 150, counts.toString)
    assert(math.abs(counts("test") - 1000L) < 150, counts.toString)
  }

  test("assignment is key-stable: invariant under repartitioning and re-runs") {
    def run(parts: Int) = DataSplit.assignSplit(ids.repartition(parts), col("id"),
      Seq("a" -> 0.5, "b" -> 0.5)).as[(Long, String)].collect().toMap
    assert(run(1) === run(7))
  }

  test("hashSample keeps an aligned subset across two keyed tables") {
    val left = spark.range(0, 5000).toDF("k")
    val right = spark.range(0, 5000).select(col("id").as("k"), (col("id") * 2).as("v"))
    val ls = DataSplit.hashSample(left, col("k"), 0.2)
    val rs = DataSplit.hashSample(right, col("k"), 0.2)
    // same keys survive on both sides => the join is lossless on the sample
    assert(ls.join(rs, "k").count() === ls.count())
    assert(math.abs(ls.count() - 1000L) < 150)
  }

  test("resampleToMixture hits the target recipe without upsampling") {
    // skewed corpus: 6000 web / 3000 wiki / 1000 code -> target 20/30/50.
    // code is the binding source (1000/0.5 = 2000 = Nt): kept whole;
    // web keeps 400/6000, wiki keeps 600/3000.
    val corpus = spark.range(0, 10000).select(col("id"),
      when(col("id") < 6000, "web").when(col("id") < 9000, "wiki")
        .otherwise("code").as("source"))
    val out = DataSplit.resampleToMixture(corpus, "id", "source",
      Map("web" -> 0.2, "wiki" -> 0.3, "code" -> 0.5))
    val counts = out.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(counts("code") === 1000L) // binding source: rate 1.0, nothing lost
    assert(math.abs(counts("web") - 400L) < 120, counts.toString)
    assert(math.abs(counts("wiki") - 600L) < 150, counts.toString)
  }

  test("resampleToMixture drops unlisted sources and is key-stable") {
    val corpus = spark.range(0, 4000).select(col("id"),
      when(col("id") % 3 === 0, "a").when(col("id") % 3 === 1, "b")
        .otherwise("junk").as("source"))
    def run(parts: Int) = DataSplit.resampleToMixture(
      corpus.repartition(parts), "id", "source", Map("a" -> 0.5, "b" -> 0.5))
      .select("id", "source").as[(Long, String)].collect().toSet
    val once = run(1)
    assert(!once.exists(_._2 == "junk"))
    assert(run(5) === once) // membership is a pure function of the key
  }

  test("chunking: exact chunks with overlap, short docs yield one chunk") {
    val df = Seq("abcdefghij", "ab").toDF("text")
    val out = df.select(col("text"), TextOps.chunks(col("text"), 4, 1).as("c"))
      .as[(String, Seq[String])].collect().toMap
    // starts 1,4,7 (stride 3, capped at len-overlap=9): full coverage,
    // no trailing fragment
    assert(out("abcdefghij") === Seq("abcd", "defg", "ghij"))
    assert(out("ab") === Seq("ab"))
  }
}
