package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  test("trigrams: distinct, lowercased, short-string fallback") {
    val t = Seq("Banana", "ab").toDF("s")
      .select(FuzzyJoin.trigrams(col("s")).as("g")).as[Seq[String]].collect()
    assert(t(0).toSet === Set("ban", "ana", "nan"))
    assert(t(1) === Seq("ab"))
  }

  test("corrupted names match their originals above threshold; unrelated don't pair") {
    val originals = Seq("goldenrod lavender", "midnight chocolate", "quick zephyr")
      .toDF("name")
    val corrupted = Seq("oldenrod lavender", "idnight chocolate").toDF("cname")
    val m = FuzzyJoin.matchByTrigramJaccard(
        corrupted, "cname", col("cname"), originals, "name", col("name"), 0.5)
      .as[(String, String, Double)].collect()
    val pairs = m.map(t => t._1 -> t._2).toSet
    assert(pairs === Set(
      "oldenrod lavender" -> "goldenrod lavender",
      "idnight chocolate" -> "midnight chocolate"),
      s"got $pairs")
    assert(m.forall(_._3 > 0.5))
  }

  test("blocking loses nothing: every pair above threshold shares >= 1 trigram by construction") {
    // exhaustive cross-check on a small vocab: blocked result == all-pairs result
    val vocab = Seq("red ring", "blue ring", "red widget", "blue widget",
      "ed ring", "lue widget").toDF("n")
    val blocked = FuzzyJoin.matchByTrigramJaccard(
        vocab.select(col("n").as("a")), "a", col("a"),
        vocab.select(col("n").as("b")), "b", col("b"), 0.3)
      .as[(String, String, Double)].collect().toSet
    val exhaustive = vocab.select(col("n").as("a"))
      .crossJoin(vocab.select(col("n").as("b")))
      .select(col("a"), col("b"),
        (graft.functions.SortedLongIntersectCount(
            sort_array(transform(FuzzyJoin.trigrams(col("a")), g => xxhash64(g))),
            sort_array(transform(FuzzyJoin.trigrams(col("b")), g => xxhash64(g)))).cast("double") /
          (size(FuzzyJoin.trigrams(col("a"))) + size(FuzzyJoin.trigrams(col("b"))) -
            graft.functions.SortedLongIntersectCount(
              sort_array(transform(FuzzyJoin.trigrams(col("a")), g => xxhash64(g))),
              sort_array(transform(FuzzyJoin.trigrams(col("b")), g => xxhash64(g)))).cast("double"))).as("sim"))
      .where(col("sim") >= 0.3)
      .as[(String, String, Double)].collect().toSet
    assert(blocked === exhaustive)
  }

  test("prefix filtering is lossless: prefix variant == basic blocking at several thresholds") {
    // deterministic vocab with heavy stop-trigram overlap (shared suffixes)
    // plus corrupted variants — the shape prefix filtering exists for
    val words = Seq("golden", "silver", "copper", "bronze", "ivory", "amber",
      "crimson", "violet", "indigo", "maroon")
    val names = for {
      a <- words; b <- words; if a != b
    } yield s"$a $b polish"
    val corrupted = names.zipWithIndex.collect {
      case (n, i) if i % 3 == 0 => n.drop(2)
      case (n, i) if i % 3 == 1 => n.replace("o", "0")
    }
    val l = corrupted.toDF("a")
    val r = names.toDF("b")
    for (t <- Seq(0.3, 0.5, 0.8)) {
      val basic = FuzzyJoin.matchByTrigramJaccard(l, "a", col("a"), r, "b", col("b"), t)
        .as[(String, String, Double)].collect().toSet
      val prefixed = FuzzyJoin.matchByTrigramJaccardPrefix(l, "a", col("a"), r, "b", col("b"), t)
        .as[(String, String, Double)].collect().toSet
      assert(prefixed === basic, s"threshold $t: prefix variant diverged")
      assert(basic.nonEmpty, s"threshold $t: fixture produced no pairs — vacuous test")
    }
  }

  test("prefix variant at minSim=1.0 (prefix length 1) still finds exact duplicates") {
    // t=1.0 is the tightest prefix (a single rarest trigram per record) —
    // the strongest pigeonhole case; only identical trigram sets qualify
    val l = Seq("alpha beta", "gamma delta").toDF("a")
    val r = Seq("Alpha Beta", "epsilon zeta").toDF("b")
    val m = FuzzyJoin.matchByTrigramJaccardPrefix(l, "a", col("a"), r, "b", col("b"), 1.0)
      .as[(String, String, Double)].collect()
    assert(m.toSeq === Seq(("alpha beta", "Alpha Beta", 1.0)))
  }

  test("editDistancePairs: length-band blocking is lossless at the band edge; duplicates collapse") {
    // "ab"/"abcd" differ by the FULL band width (dist 2, Δlen 2) — the
    // pair the blocking must not lose; "abc"/"abd" is the plain typo;
    // "abc"/"zzzz" is inside the band but over the distance.
    val df = Seq("abc", "abd", "ab", "abcd", "zzzz", "abc").toDF("t")
    val got = FuzzyJoin.editDistancePairs(df, col("t"), maxDist = 2)
      .as[(String, String, Long)].collect().toSet
    assert(got === Set(
      ("ab", "abc", 1L), ("ab", "abcd", 2L), ("ab", "abd", 1L),
      ("abc", "abcd", 1L), ("abc", "abd", 1L), ("abcd", "abd", 1L)))
  }
}
