package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}
import graft.operators.AsOfJoin

/** Projection, filters, and the full join family (SURVEY.md §2.B Q-PROJ1,
  * Q-FIL1–2, Q-JOIN1–7).
  *
  * Scale notes: the dimension sides (customer/nation/region) are small and
  * broadcast — verified by plan-shape tests; the fact-fact as-of join uses
  * the single-shuffle union+window operator, not a row-exploding range join.
  * Events are calendar-shifted (-29y) into the orders date range so the
  * temporal joins have matches on the fixtures.
  */
object RelationalQueries extends QueryModule {

  private def shiftedEvents(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "events").select(
      col("event_id"), col("user_id"), col("value"),
      (col("ts") - expr("INTERVAL '29' YEAR")).as("ts2"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q-PROJ1: select/rename/derive (reference R7/R8 Year derivation).
    "q_proj1" -> ((s, d) =>
      Tables.load(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        year(col("l_shipdate")).cast("long").as("ship_year"))
        .orderBy("l_orderkey", "l_linenumber", "revenue", "ship_year")),

    // Q-FIL1: conjunctive/disjunctive predicates, BETWEEN/IN/LIKE/null-safe.
    "q_fil1" -> ((s, d) =>
      Tables.load(s, d, "lineitem")
        .where(col("l_quantity").between(10, 20) &&
               col("l_returnflag").isin("A", "R") &&
               col("l_linestatus").like("O%") &&
               col("l_tax").isNotNull &&
               ((col("l_discount") <=> lit(0.05)) || col("l_discount") > lit(0.07)))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag")),

    // Q-FIL2: history screening — keep keys whose row count == expected
    // (the reference's 6,969 -> 1,062 symbol screen, R13).
    "q_fil2" -> ((s, d) => {
      val cnts = Tables.load(s, d, "orders").groupBy("o_custkey")
        .agg(count(lit(1)).as("n")).where(col("n") === 10)
      Tables.load(s, d, "customer")
        .join(cnts, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    }),

    // Q-JOIN1: inner equi-join fact<->dim.
    "q_join1" -> ((s, d) =>
      Tables.load(s, d, "orders")
        .join(Tables.load(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "c_name", "c_mktsegment", "o_totalprice")
        .orderBy("o_orderkey")),

    // Q-JOIN2: explicit broadcast of the small dims (plan-shape-tested).
    "q_join2" -> ((s, d) =>
      Tables.load(s, d, "customer")
        .join(broadcast(Tables.load(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.load(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .select("c_custkey", "n_name", "r_name")
        .orderBy("c_custkey")),

    // Q-JOIN3: left outer (customers with/without 'P' orders).
    "q_join3" -> ((s, d) =>
      Tables.load(s, d, "customer")
        .join(Tables.load(s, d, "orders").where(col("o_orderstatus") === "P"),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .select("c_custkey", "o_orderkey", "o_totalprice")
        .orderBy(col("c_custkey").asc, col("o_orderkey").asc_nulls_first)),

    // Q-JOIN4: left semi.
    "q_join4" -> ((s, d) =>
      Tables.load(s, d, "customer")
        .join(Tables.load(s, d, "orders").where(col("o_orderstatus") === "O"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name").orderBy("c_custkey")),

    // Q-JOIN5: left anti (the reference's error-skip residue, R6/R13).
    "q_join5" -> ((s, d) =>
      Tables.load(s, d, "customer")
        .join(Tables.load(s, d, "orders").where(col("o_orderstatus") === "P"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name").orderBy("c_custkey")),

    // Q-JOIN6: range join — events within a 30-day window before each order
    // (equi key + range residual => sort-merge, not a cartesian).
    "q_join6" -> ((s, d) => {
      val ev = shiftedEvents(s, d)
      Tables.load(s, d, "orders")
        .join(ev,
          col("user_id") === col("o_custkey") &&
          col("ts2") >= col("o_orderdate") - expr("INTERVAL '30' DAY") &&
          col("ts2") <= col("o_orderdate"), "left_outer")
        .groupBy("o_orderkey").agg(count(col("event_id")).as("n_ev"))
        .orderBy("o_orderkey")
    }),

    // Q-JOIN7: as-of join (latest event at-or-before each order date,
    // per key) via the single-shuffle union+window operator.
    "q_join7" -> ((s, d) => {
      val orders = Tables.load(s, d, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
      AsOfJoin.lastAtOrBefore(orders, shiftedEvents(s, d),
        leftKey = "o_custkey", leftTime = "o_orderdate",
        rightKey = "user_id", rightTime = "ts2",
        rightValueCols = Seq(), tieBreak = Seq("event_id"))
        .select("o_orderkey", "asof_ts2")
        .orderBy("o_orderkey")
    }),

    // Q-JOIN8: the SAME as-of semantics via the broadcast range-join +
    // max-aggregation formulation (the small-right-side plan); verified
    // against the identical oracle as q_join7 — both formulations must
    // agree exactly.
    "q_join8" -> ((s, d) => {
      val orders = Tables.load(s, d, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
      AsOfJoin.lastAtOrBeforeViaRangeJoin(orders, shiftedEvents(s, d),
        leftKey = "o_custkey", leftTime = "o_orderdate",
        rightKey = "user_id", rightTime = "ts2",
        rightValueCols = Seq(), tieBreak = Seq("event_id"))
        .select("o_orderkey", "asof_ts2")
        .orderBy("o_orderkey")
    }),

    // Q-JOIN14 (round 9): TOLERANCE as-of — pandas merge_asof's
    // `tolerance` parameter on the backward direction: the latest
    // at-or-before match counts only within a 365-day lookback; staler
    // matches clear to null (a stock joined to a quote from months ago
    // is worse than no quote). Same single-shuffle operator as q_join7
    // plus one null-out predicate — no extra exchange.
    "q_join14" -> ((s, d) => {
      val orders = Tables.load(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_orderdate")
      AsOfJoin.lastWithin(orders, shiftedEvents(s, d),
        leftKey = "o_custkey", leftTime = "o_orderdate",
        rightKey = "user_id", rightTime = "ts2",
        rightValueCols = Seq(), tieBreak = Seq("event_id"),
        maxLookback = expr("INTERVAL 365 DAYS"))
        .select("o_orderkey", "asof_ts2")
        .orderBy("o_orderkey")
    }),

    // Q-JOIN15 (round 9): FORWARD as-of — pandas merge_asof's
    // direction='forward', registered standalone (it previously ran only
    // inside the nearest pick): the EARLIEST at-or-after match per key.
    // Same single-shuffle union+window operator, opposite sort.
    "q_join15" -> ((s, d) => {
      val orders = Tables.load(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_orderdate")
      AsOfJoin.firstAtOrAfter(orders, shiftedEvents(s, d),
        leftKey = "o_custkey", leftTime = "o_orderdate",
        rightKey = "user_id", rightTime = "ts2",
        rightValueCols = Seq(), tieBreak = Seq("event_id"))
        .select("o_orderkey", "asof_ts2")
        .orderBy("o_orderkey")
    }),

    // Q-JOIN13 (round 9): NEAREST as-of — pandas merge_asof's third
    // direction, completing at-or-before (q_join7/8) and at-or-after:
    // per order, whichever of the latest-before / earliest-after events
    // is closer in exact integer micros, equal distance → before. One
    // key shuffle, two opposite-order windows on it.
    "q_join13" -> ((s, d) => {
      val orders = Tables.load(s, d, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
      AsOfJoin.nearest(orders, shiftedEvents(s, d),
        leftKey = "o_custkey", leftTime = "o_orderdate",
        rightKey = "user_id", rightTime = "ts2",
        rightValueCols = Seq(), tieBreak = Seq("event_id"))
        .select("o_orderkey", "asof_ts2")
        .orderBy("o_orderkey")
    }),

    "q_sub1" -> (aboveCustomerAvg _),

    // Q-JOIN10 (round 7): the TPC-H Q3 shape — top-10 highest-revenue
    // orders still unshipped at the cutoff for one segment. Dimension
    // filter broadcasts; exact 4dp revenue sums; total order under the
    // top-k (revenue exact ⇒ desc sort deterministic, orderkey breaks
    // residual ties).
    "q_join10" -> ((s, d) => {
      val cust = Tables.load(s, d, "customer")
        .where(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val ord = Tables.load(s, d, "orders")
        .where(col("o_orderdate").cast("date") < lit("1998-06-01"))
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
      val li = Tables.load(s, d, "lineitem")
        .where(col("l_shipdate").cast("date") > lit("1998-06-01"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("o_date"),
          col("o_orderpriority"))
        .agg(graft.util.Det.fixedSum(
          col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // Q-JOIN11 (round 7): the TPC-H Q5 shape — revenue by nation where
    // the customer and the line's supplier share the nation, one region.
    // The locality predicate (c_nationkey = s_nationkey) is the join
    // graph's cycle; nation/region broadcast.
    "q_join11" -> ((s, d) => {
      val nr = Tables.load(s, d, "nation")
        .join(Tables.load(s, d, "region"), col("n_regionkey") === col("r_regionkey"))
        .where(col("r_name") === "ASIA")
        .select("n_nationkey", "n_name")
      val cust = Tables.load(s, d, "customer").select("c_custkey", "c_nationkey")
      val supp = Tables.load(s, d, "supplier").select("s_suppkey", "s_nationkey")
      Tables.load(s, d, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(Tables.load(s, d, "orders").select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nr), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(graft.util.Det.fixedSum(
          col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // Q-JOIN12 (round 7): the TPC-H Q10 shape — top-20 customers by
    // revenue lost to returns (l_returnflag = 'R') in one quarter.
    "q_join12" -> ((s, d) => {
      val ord = Tables.load(s, d, "orders")
        .where(col("o_orderdate").cast("date") >= lit("1997-01-01") &&
          col("o_orderdate").cast("date") < lit("1997-04-01"))
        .select("o_orderkey", "o_custkey")
      val cust = Tables.load(s, d, "customer")
        .select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
      val nat = Tables.load(s, d, "nation").select("n_nationkey", "n_name")
      Tables.load(s, d, "lineitem")
        .where(col("l_returnflag") === "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(graft.util.Det.fixedSum(
          col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // Q-JOIN9: big-big join with the fact side bloom-pruned BEFORE its
    // shuffle (Spark's runtime-filter shape, explicit). The bloom's false
    // positives die in the exact join, so the result equals the plain
    // join — only the shuffled volume differs. Plan-shape-tested: the
    // might_contain filter sits under the fact Exchange.
    "q_join9" -> ((s, d) => {
      val li = Tables.load(s, d, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey",
        "l_quantity", "l_extendedprice", "l_shipdate")
      val dim = Tables.load(s, d, "part").where(col("p_size") === 1)
        .select(col("p_partkey").as("l_partkey"), col("p_name"))
      graft.operators.BloomJoin.prunedJoin(li, dim, "l_partkey",
          expectedItems = 32768)
        .select("l_orderkey", "l_linenumber", "l_quantity",
          "l_extendedprice", "l_shipdate", "p_name")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity",
          "l_extendedprice", "l_shipdate")
    }),

    // SCD2 dimension history: snapshot 1 = customer balances, snapshot 2 a
    // month later with every 7th key changed and every 13th key deleted —
    // the type-2 history must close/open exactly the right intervals.
    "q_scd1" -> ((s, d) => {
      val cust = Tables.load(s, d, "customer")
      val s1 = cust.select(col("c_custkey"), col("c_acctbal").as("acctbal"))
      val s2 = cust.where(col("c_custkey") % 13 =!= 0)
        .select(col("c_custkey"),
          (col("c_acctbal") +
            when(col("c_custkey") % 7 === 0, lit(100.0)).otherwise(lit(0.0))).as("acctbal"))
      val h1 = graft.operators.Scd2.init(s1, to_date(lit("2024-01-01")))
      graft.operators.Scd2.applySnapshot(h1, s2,
          Seq("c_custkey"), Seq("acctbal"), to_date(lit("2024-02-01")))
        .orderBy("c_custkey", "valid_from")
    }),

    // Q-SCD2 (round 9): the point-in-time VIEW over the q_scd1 history —
    // the consumption pattern every SCD2 dimension exists for ("the
    // customer dimension as of 2024-02-15"): changed keys show their NEW
    // balance, unchanged keys their original row, deleted keys are
    // absent. One interval predicate over the history — no window, no
    // join.
    "q_scd2" -> ((s, d) => {
      val cust = Tables.load(s, d, "customer")
      val s1 = cust.select(col("c_custkey"), col("c_acctbal").as("acctbal"))
      val s2 = cust.where(col("c_custkey") % 13 =!= 0)
        .select(col("c_custkey"),
          (col("c_acctbal") +
            when(col("c_custkey") % 7 === 0, lit(100.0)).otherwise(lit(0.0))).as("acctbal"))
      val h1 = graft.operators.Scd2.init(s1, to_date(lit("2024-01-01")))
      val hist = graft.operators.Scd2.applySnapshot(h1, s2,
        Seq("c_custkey"), Seq("acctbal"), to_date(lit("2024-02-01")))
      graft.operators.Scd2.asOfView(hist, to_date(lit("2024-02-15")))
        .select("c_custkey", "acctbal", "valid_from")
        .orderBy("c_custkey")
    }),
  )

  /** Correlated-aggregate subquery shape: orders above their customer's
    * mean order value. Decorrelated Spark-side into an exact-mean join
    * (what Catalyst's subquery decorrelation would produce); the oracle
    * keeps the correlated form. */
  private def aboveCustomerAvg(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.load(s, d, "orders")
    val custAvg = orders.groupBy(col("o_custkey").as("ck"))
      .agg(graft.util.Det.fixedAvg(col("o_totalprice"), 2).as("cust_avg"))
    orders.join(custAvg, col("o_custkey") === col("ck"))
      .where(col("o_totalprice") > col("cust_avg"))
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy("o_orderkey")
  }

  private val subquerySql: Map[String, String] = Map(
    "q_sub1" ->
      s"""SELECT o_orderkey, o_custkey, o_totalprice
         |FROM orders o
         |WHERE o_totalprice > (
         |  SELECT ${graft.util.Det.sqlFixedAvg("o_totalprice", 2)}
         |  FROM orders i WHERE i.o_custkey = o.o_custkey)
         |ORDER BY o_orderkey""".stripMargin,
  )

  private val revSum =
    graft.util.Det.sqlFixedSum("l_extendedprice * (1.0 - l_discount)", 4)

  def oracleSql: Map[String, String] = subquerySql ++ Map(
    "q_join10" ->
      s"""SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_date,
         |  o_orderpriority, $revSum AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND CAST(o_orderdate AS DATE) < DATE '1998-06-01'
         |  AND CAST(l_shipdate AS DATE) > DATE '1998-06-01'
         |GROUP BY 1, 2, 3
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q_join11" ->
      s"""SELECT n_name, $revSum AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin,
    "q_join12" ->
      s"""SELECT c_custkey, c_name, c_acctbal, n_name, $revSum AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |  AND CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
         |  AND CAST(o_orderdate AS DATE) < DATE '1997-04-01'
         |GROUP BY 1, 2, 3, 4
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q_join9" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate, p_name
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_size = 1
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate""".stripMargin,
    "q_proj1" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice * (1.0 - l_discount) AS revenue,
        |  CAST(year(l_shipdate) AS BIGINT) AS ship_year
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, revenue, ship_year""".stripMargin,
    "q_fil1" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
        |FROM lineitem
        |WHERE l_quantity BETWEEN 10 AND 20 AND l_returnflag IN ('A','R')
        |  AND l_linestatus LIKE 'O%' AND l_tax IS NOT NULL
        |  AND (l_discount IS NOT DISTINCT FROM 0.05 OR l_discount > 0.07)
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag""".stripMargin,
    "q_fil2" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders GROUP BY o_custkey HAVING COUNT(*) = 10)
        |ORDER BY c_custkey""".stripMargin,
    "q_join1" ->
      """SELECT o_orderkey, c_name, c_mktsegment, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey ORDER BY o_orderkey""".stripMargin,
    "q_join2" ->
      """SELECT c_custkey, n_name, r_name
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey ORDER BY c_custkey""".stripMargin,
    "q_join3" ->
      """SELECT c_custkey, o_orderkey, o_totalprice
        |FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_orderstatus = 'P') o
        |ON c_custkey = o_custkey
        |ORDER BY c_custkey ASC, o_orderkey ASC NULLS FIRST""".stripMargin,
    "q_join4" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        |ORDER BY c_custkey""".stripMargin,
    "q_join5" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin,
    "q_join6" ->
      """SELECT o_orderkey, COUNT(e.event_id) AS n_ev
        |FROM orders o LEFT JOIN
        |  (SELECT event_id, user_id, ts - INTERVAL 29 YEAR AS ts2 FROM events) e
        |ON e.user_id = o.o_custkey
        |  AND e.ts2 >= o.o_orderdate - INTERVAL 30 DAY AND e.ts2 <= o.o_orderdate
        |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin,
    "q_join7" ->
      """SELECT o.o_orderkey,
        |  (SELECT max(e.ts - INTERVAL 29 YEAR) FROM events e
        |   WHERE e.user_id = o.o_custkey AND e.ts - INTERVAL 29 YEAR <= o.o_orderdate) AS asof_ts2
        |FROM orders o ORDER BY o.o_orderkey""".stripMargin,
    "q_join8" ->
      """SELECT o.o_orderkey,
        |  (SELECT max(e.ts - INTERVAL 29 YEAR) FROM events e
        |   WHERE e.user_id = o.o_custkey AND e.ts - INTERVAL 29 YEAR <= o.o_orderdate) AS asof_ts2
        |FROM orders o ORDER BY o.o_orderkey""".stripMargin,
    // q_join14: the q_join7 correlated scalar cleared by the identical
    // lookback predicate (match >= left time - 365 days); the fixture keeps
    // 245 matches and clears 14,755 stale ones - both branches live.
    "q_join14" ->
      """WITH a AS (SELECT o.o_orderkey, o.o_orderdate,
        |  (SELECT max(e.ts - INTERVAL 29 YEAR) FROM events e
        |   WHERE e.user_id = o.o_custkey
        |     AND e.ts - INTERVAL 29 YEAR <= o.o_orderdate) AS m
        |  FROM orders o)
        |SELECT o_orderkey,
        |  CASE WHEN m >= o_orderdate - INTERVAL 365 DAY THEN m END AS asof_ts2
        |FROM a ORDER BY o_orderkey""".stripMargin,
    // q_join13: before/after via the q_join7 correlated scalars, the pick
    // via the same exact-integer micro distances and tie rule (equal
    // distance -> before) the operator pins.
    "q_join13" ->
      """WITH ba AS (SELECT o.o_orderkey, o.o_orderdate,
        |  (SELECT max(e.ts - INTERVAL 29 YEAR) FROM events e
        |   WHERE e.user_id = o.o_custkey AND e.ts - INTERVAL 29 YEAR <= o.o_orderdate) AS b,
        |  (SELECT min(e.ts - INTERVAL 29 YEAR) FROM events e
        |   WHERE e.user_id = o.o_custkey AND e.ts - INTERVAL 29 YEAR >= o.o_orderdate) AS a
        |  FROM orders o)
        |SELECT o_orderkey,
        |  CASE WHEN b IS NULL THEN a
        |       WHEN a IS NULL THEN b
        |       WHEN epoch_us(CAST(o_orderdate AS TIMESTAMP)) - epoch_us(b)
        |            <= epoch_us(a) - epoch_us(CAST(o_orderdate AS TIMESTAMP)) THEN b
        |       ELSE a END AS asof_ts2
        |FROM ba ORDER BY o_orderkey""".stripMargin,
    "q_scd1" ->
      s"""WITH $scdHistSql
        |SELECT * FROM h ORDER BY c_custkey, valid_from""".stripMargin,
    // point-in-time view: the identical history CTE, one interval filter.
    "q_scd2" ->
      s"""WITH $scdHistSql
        |SELECT c_custkey, acctbal, valid_from FROM h
        |WHERE valid_from <= DATE '2024-02-15'
        |  AND (valid_to IS NULL OR valid_to > DATE '2024-02-15')
        |ORDER BY c_custkey""".stripMargin,
    // forward as-of: the q_join7 correlated scalar with min/>=.
    "q_join15" ->
      """SELECT o.o_orderkey,
        |  (SELECT min(e.ts - INTERVAL 29 YEAR) FROM events e
        |   WHERE e.user_id = o.o_custkey
        |     AND e.ts - INTERVAL 29 YEAR >= o.o_orderdate) AS asof_ts2
        |FROM orders o ORDER BY o.o_orderkey""".stripMargin,
  )

  /** The q_scd1/q_scd2 shared two-snapshot SCD2 history as a CTE `h`. */
  private val scdHistSql =
    """s1 AS (SELECT c_custkey, c_acctbal AS bal FROM customer),
      |s2 AS (SELECT c_custkey,
      |         c_acctbal + CASE WHEN c_custkey % 7 = 0 THEN 100.0 ELSE 0.0 END AS bal
      |       FROM customer WHERE c_custkey % 13 <> 0),
      |h AS (
      |  SELECT s1.c_custkey, s1.bal AS acctbal, DATE '2024-01-01' AS valid_from,
      |    CASE WHEN s2.c_custkey IS NULL OR s2.bal <> s1.bal
      |         THEN DATE '2024-02-01' END AS valid_to,
      |    COALESCE(s2.c_custkey IS NOT NULL AND s2.bal = s1.bal, FALSE) AS is_current
      |  FROM s1 LEFT JOIN s2 ON s1.c_custkey = s2.c_custkey
      |  UNION ALL
      |  SELECT s2.c_custkey, s2.bal, DATE '2024-02-01', NULL, TRUE
      |  FROM s2 JOIN s1 ON s1.c_custkey = s2.c_custkey WHERE s2.bal <> s1.bal)""".stripMargin
}
