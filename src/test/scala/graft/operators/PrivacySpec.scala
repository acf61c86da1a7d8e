package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  private val people = Seq(
    (1L, "US", "A"), (2L, "US", "A"), (3L, "US", "A"),
    (4L, "US", "B"), (5L, "US", "B"),
    (6L, "FR", "A"),
    (7L, "FR", null.asInstanceOf[String]), (8L, "FR", null.asInstanceOf[String])
  ).toDF("id", "country", "segment")

  test("kAnonymize suppresses cohorts below k and keeps the rest intact") {
    val out = Privacy.kAnonymize(people, Seq("country", "segment"), k = 2)
      .select("id").collect().map(_.getLong(0)).toSet
    // (US,A)=3 kept, (US,B)=2 kept, (FR,A)=1 suppressed, (FR,null)=2 kept
    // — null is a cohort VALUE (window partitioning groups nulls), not a
    // wildcard
    assert(out === Set(1L, 2L, 3L, 4L, 5L, 7L, 8L))
  }

  test("kAnonymize emits auditable cohort sizes on request; k=1 keeps everything") {
    val sized = Privacy.kAnonymize(people, Seq("country", "segment"), k = 2,
        cohortSizeAs = "cohort")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(sized(1L) === 3L && sized(4L) === 2L && sized(7L) === 2L)
    assert(Privacy.kAnonymize(people, Seq("country"), k = 1).count() === 8L)
  }

  test("lDiversityAudit flags the homogeneous cohort a k-gate would pass") {
    import spark.implicits._
    // cohort A: 4 rows but ONE segment value — k-anonymous at k=4, yet
    // anyone known to be in A is exposed. Cohort B: 2 rows, 2 values.
    val df = Seq(("A", "s1"), ("A", "s1"), ("A", "s1"), ("A", "s1"),
      ("B", "s1"), ("B", "s2")).toDF("country", "segment")
    val got = Privacy.lDiversityAudit(df, Seq("country"), "segment", l = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got === Map("A" -> ((4L, 1L, false)), "B" -> ((2L, 2L, true))))
  }
}
