package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}
import graft.operators.Dedup

/** Set operations (SURVEY.md §2.B Q-SET1–4): union-all (the reference's
  * per-batch reassembly, R3/R11), intersect/except (the symbol screen,
  * R13), and deterministic exact dedup.
  */
object SetQueries extends QueryModule {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_set1" -> ((s, d) => {
      val c = Tables.load(s, d, "customer")
      val a = c.where(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"), lit("a").as("src"))
      val b = c.where(col("c_acctbal") > 5000)
        .select(col("c_custkey"), lit("b").as("src"))
      a.unionByName(b).orderBy("c_custkey", "src")
    }),

    "q_set2" -> ((s, d) =>
      Tables.load(s, d, "customer").select(col("c_nationkey").as("nk"))
        .intersect(Tables.load(s, d, "supplier").select(col("s_nationkey").as("nk")))
        .orderBy("nk")),

    // EXCEPT with a restricted right side (the first 20 suppliers): the
    // unrestricted form returns ZERO rows on every fixture (all nations
    // have suppliers), which made this oracle compare empty sets — the
    // restriction keeps both branches of the set difference exercised
    // (11 kept, 14 excluded at sf0.01).
    "q_set3" -> ((s, d) =>
      Tables.load(s, d, "nation").select(col("n_nationkey").as("nk"))
        .except(Tables.load(s, d, "supplier").where(col("s_suppkey") <= 20)
          .select(col("s_nationkey").as("nk")))
        .orderBy("nk")),

    // Q-SET4: exact dedup with a total tie-break (row_number=1), never
    // dropDuplicates (nondeterministic survivor) — SURVEY.md §7.4.2.
    // (l_orderkey, l_linenumber) alone is non-unique in the fixture;
    // qty + shipdate complete the total tie-break.
    "q_set4" -> ((s, d) =>
      // kept columns ⊆ tie-break ⇒ the projected form is row-identical
      // (see exactByKeysProjected) and folds the rank window into one
      // partial-aggregated min-of-struct
      Dedup.exactByKeysProjected(Tables.load(s, d, "lineitem"),
        Seq("l_partkey", "l_suppkey"),
        Seq("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate"),
        Seq("l_orderkey", "l_linenumber", "l_quantity"))
        .orderBy("l_partkey", "l_suppkey")),
  )

  def oracleSql: Map[String, String] = Map(
    "q_set1" ->
      """SELECT c_custkey, 'a' AS src FROM customer WHERE c_mktsegment = 'BUILDING'
        |UNION ALL
        |SELECT c_custkey, 'b' AS src FROM customer WHERE c_acctbal > 5000
        |ORDER BY c_custkey, src""".stripMargin,
    "q_set2" ->
      """SELECT c_nationkey AS nk FROM customer
        |INTERSECT SELECT s_nationkey AS nk FROM supplier ORDER BY nk""".stripMargin,
    "q_set3" ->
      """SELECT n_nationkey AS nk FROM nation
        |EXCEPT SELECT s_nationkey AS nk FROM supplier WHERE s_suppkey <= 20
        |ORDER BY nk""".stripMargin,
    "q_set4" ->
      """SELECT l_partkey, l_suppkey, l_orderkey, l_linenumber, l_quantity
        |FROM (SELECT l_partkey, l_suppkey, l_orderkey, l_linenumber, l_quantity,
        |        row_number() OVER (PARTITION BY l_partkey, l_suppkey
        |          ORDER BY l_orderkey, l_linenumber, l_quantity, l_shipdate) AS rn
        |      FROM lineitem)
        |WHERE rn = 1 ORDER BY l_partkey, l_suppkey""".stripMargin,
  )
}
