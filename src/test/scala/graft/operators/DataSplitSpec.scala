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

  test("temperatureResample: alpha=1 keeps everything; alpha=0.5 keeps minority whole, majority at sqrt ratio") {
    val df = spark.range(0, 1000).select(col("id"),
      when(col("id") < 900, "web").otherwise("wiki").as("source"))
    // alpha=1: f_s = n_s/N => every rate is exactly 1.0 — natural mixture
    assert(DataSplit.temperatureResample(df, "id", "source", alpha = 1.0)
      .count() === 1000L)
    // alpha=0.5: Nt pins at the SMALLEST source => wiki (100 rows) keeps
    // all; web keeps ~sqrt(100/900) = 1/3 (binomial around 300)
    val out = DataSplit.temperatureResample(df, "id", "source", alpha = 0.5)
    val counts = out.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(counts("wiki") === 100L, "minority source must be kept whole")
    assert(counts("web") > 230L && counts("web") < 370L,
      s"majority should keep ~1/3, got ${counts("web")}")
    // key-stable: partitioning must not change membership
    val again = DataSplit.temperatureResample(df.repartition(7), "id", "source", 0.5)
      .select("id").as[Long].collect().toSet
    assert(again === out.select("id").as[Long].collect().toSet)
  }

  test("balanceClasses: exactly target per class — oversampled, downsampled, key-stable") {
    // skewed: class a = 10 rows, class b = 100 rows; target 30 per class
    val df = spark.range(0, 110).select(col("id"),
      when(col("id") < 10, "a").otherwise("b").as("cls"))
    val out = DataSplit.balanceClasses(df, "cls", "id", 30L)
    val counts = out.groupBy("cls").count().as[(String, Long)].collect().toMap
    assert(counts === Map("a" -> 30L, "b" -> 30L))
    // minority class: 30 = 3 full epochs of 10 => every row exactly 3 copies
    val aCopies = out.where(col("cls") === "a").groupBy("id").count()
      .as[(Long, Long)].collect()
    assert(aCopies.length === 10 && aCopies.forall(_._2 === 3L), aCopies.toSeq.toString)
    // majority class: 30 DISTINCT rows, no replication
    val b = out.where(col("cls") === "b")
    assert(b.select("copy").distinct().as[Long].collect().toSeq === Seq(1L))
    assert(b.select("id").distinct().count() === 30L)
    // pure function of keys: partitioning changes nothing
    val again = DataSplit.balanceClasses(df.repartition(13), "cls", "id", 30L)
    assert(out.select("id", "cls", "copy").as[(Long, String, Long)].collect().toSet ===
      again.select("id", "cls", "copy").as[(Long, String, Long)].collect().toSet)
  }

  test("epochShuffleKeys: epochs permute independently, keys are corpus-independent") {
    val ids = (0L until 200L).map(Tuple1(_)).toDF("doc_id")
    val out = DataSplit.epochShuffleKeys(ids, "doc_id", 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out.size === 600, "every doc appears once per epoch")
    // epochs produce genuinely different orders: sort positions of the
    // same ids by key must differ between epoch 0 and 1
    def order(e: Long) = (0L until 200L).sortBy(id => (out((id, e)), id))
    assert(order(0) != order(1) && order(1) != order(2))
    // key-stability: a doc's shuffle key ignores the rest of the corpus
    val sub = DataSplit.epochShuffleKeys(
        ids.where(col("doc_id") < 50), "doc_id", 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(sub.forall { case (k, v) => out(k) === v })
  }

  test("epochShuffleKeys: xxhash64-scale keys never wrap (pre-reduced before the epoch multiply)") {
    // A raw key*epochs wraps BIGINT for |key| > Long.MaxValue/epochs; the
    // pre-reduction keeps the product < 1e6*epochs and congruent mod 1e6,
    // so huge keys get the same bucket as their mod-1e6 residue.
    val huge = Long.MaxValue - 3L
    val df = Seq(huge, huge - 1000000L, 42L).map(Tuple1(_)).toDF("doc_id")
    val out = DataSplit.epochShuffleKeys(df, "doc_id", 7).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out.size === 21)
    assert(out.values.forall(k => k >= 0 && k < 1000000L), "bucket range")
    // congruence: keys sharing a mod-1e6 residue share every epoch's key
    (0L until 7L).foreach { e =>
      assert(out((huge, e)) === out((huge - 1000000L, e)), s"epoch $e")
    }
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
