package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(UrlOps.canonicalizeUrl(col("u"))).as[String].collect().toSeq

  test("scheme/host case-folded; path and query case preserved") {
    assert(canon("HTTPS://WWW.Example.COM/Docs/Page?Q=Spark") ===
      Seq("https://www.example.com/Docs/Page?Q=Spark"))
  }

  test("default ports stripped, non-default kept, scheme-mismatched kept") {
    assert(canon(
      "https://a.com:443/x", "http://a.com:80/x",
      "https://a.com:8080/x", "http://a.com:443/x") ===
      Seq("https://a.com/x", "http://a.com/x",
        "https://a.com:8080/x", "http://a.com:443/x"))
  }

  test("fragment dropped, tracking params removed, real params keep order") {
    assert(canon(
      "https://a.com/x?utm_source=f&p=1&utm_campaign=c9&q=spark&gclid=g7#frag",
      "https://a.com/x?b=2&a=1",
      "https://a.com/x?utm_source=only#s") ===
      Seq("https://a.com/x?p=1&q=spark",
        "https://a.com/x?b=2&a=1",
        "https://a.com/x"))
  }

  test("empty path normalized to /; bare URL round-trips") {
    assert(canon("HTTPS://A.com", "https://a.com/") ===
      Seq("https://a.com/", "https://a.com/"))
  }

  test("domainOf strips www and port; hostOf keeps www") {
    val one = Seq("https://www.news.example.com/a").toDF("u")
      .select(UrlOps.hostOf(col("u")).as("h"), UrlOps.domainOf(col("u")).as("d"))
      .as[(String, String)].head()
    assert(one === ("www.news.example.com", "news.example.com"))
  }

  test("dedupByUrl keeps one min-tie-break row per canonical form") {
    val df = Seq(
      (3L, "HTTPS://A.com/x?utm_source=f&p=1"),
      (1L, "https://a.com:443/x?p=1#top"),
      (2L, "https://a.com/y?p=1")).toDF("id", "raw")
    val out = UrlOps.dedupByUrl(df, col("raw"), "url", Seq("id"))
      .select("id", "url").as[(Long, String)].collect().toSet
    assert(out === Set((1L, "https://a.com/x?p=1"), (2L, "https://a.com/y?p=1")))
  }
}
