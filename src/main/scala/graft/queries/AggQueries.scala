package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}
import graft.functions.GeoMean
import graft.util.Det
import graft.util.Det.{sqlFixedAvg, sqlFixedSum}

/** Aggregations (SURVEY.md §2.B Q-AGG1–7). Hash aggregation with partial
  * (map-side) combine on every query; double sums use the exact
  * fixed-point formulation (Det) so results are order-independent —
  * the property that makes them both oracle-stable and re-run-stable on a
  * 1000-executor cluster.
  */
object AggQueries extends QueryModule {

  /** The flagship (SURVEY.md §7.2): per (returnflag, ship year) row count,
    * exact revenue sum, mean quantity — the canonical first analysis over
    * the reference's partition grain (company,year) -> (flag,year). */
  def flagship(s: SparkSession, d: String): DataFrame = {
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    Tables.load(s, d, "lineitem")
      .groupBy(col("l_returnflag"), year(col("l_shipdate")).cast("long").as("ship_year"))
      .agg(count(lit(1)).as("n_rows"),
        Det.fixedSum(rev, 4).as("sum_revenue"),
        Det.fixedAvg(col("l_quantity"), 2).as("avg_qty"))
      .orderBy("l_returnflag", "ship_year")
  }

  /** Distinct (order, part) rows with degenerate mega-baskets dropped
    * (> 50 items) — the basket universe q_agg17/18 mine. The cap is the
    * crowded-bucket knob applied to baskets: pair volume stays bounded by
    * basket size², never the corpus. */
  private def cappedBasketItems(s: SparkSession, d: String): DataFrame = {
    val items = Tables.load(s, d, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    items.withColumn("__bsz",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("ok")))
      .where(col("__bsz") <= 50).drop("__bsz")
  }

  /** Pair supports >= 2 over [[cappedBasketItems]] — the per-order
    * self-join, shared by q_agg17 (the support table), q_agg18 (the
    * rule table), and the q_graph3–6 co-purchase graph (the support
    * threshold doubles as the edge-noise floor). */
  private[queries] def pairSupports(s: SparkSession, d: String): DataFrame = {
    val capped = cappedBasketItems(s, d)
    val a = capped.select(col("ok"), col("pk").as("pk_a"))
    val b = capped.select(col("ok"), col("pk").as("pk_b"))
    a.join(b, Seq("ok")).where(col("pk_a") < col("pk_b"))
      .groupBy("pk_a", "pk_b").agg(count(lit(1)).as("support"))
      .where(col("support") >= 2)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map[String, (SparkSession, String) => DataFrame]("q_agg1" -> (flagship _)) ++
      baseQueries ++ statQueries

  private val baseQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Q-AGG2: multi-key group at the reference's partition grain (R9/R10).
    "q_agg2" -> ((s, d) =>
      Tables.load(s, d, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n_rows"),
          Det.fixedSum(col("l_quantity"), 2).as("sum_qty"),
          Det.fixedSum(col("l_extendedprice"), 2).as("sum_price"),
          min(col("l_discount")).as("min_disc"),
          max(col("l_discount")).as("max_disc"))
        .orderBy("l_returnflag", "l_linestatus")),

    // Q-AGG3: exact distinct count per group.
    "q_agg3" -> ((s, d) =>
      Tables.load(s, d, "orders")
        .groupBy("o_orderstatus")
        .agg(countDistinct(col("o_custkey")).as("n_cust"))
        .orderBy("o_orderstatus")),

    // Q-AGG4: approximate distinct (HLL) — no oracle (approximate), the
    // scale path when exact distinct would shuffle every key.
    "q_agg4" -> ((s, d) =>
      Tables.load(s, d, "orders")
        .groupBy("o_orderstatus")
        .agg(approx_count_distinct(col("o_custkey")).as("approx_cust"))
        .orderBy("o_orderstatus")),

    // Mergeable distinct-count sketches (Apache DataSketches HLL): build
    // one sketch PER MONTH of events, then union-merge the sketches into
    // the total distinct-user estimate — the incremental shape for
    // distinct counts at scale (per-partition sketches are persisted and
    // re-merged instead of rescanning history; no oracle — sketch
    // estimate; merge-equals-whole is property-tested).
    "q_agg14" -> ((s, d) => {
      val monthly = Tables.load(s, d, "events")
        .groupBy(date_trunc("month", col("ts")).as("m"))
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
      monthly.agg(
          count(lit(1)).as("n_months"),
          hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_users"))
    }),

    // Q-AGG5: ROLLUP over the region->nation hierarchy.
    "q_agg5" -> ((s, d) =>
      Tables.load(s, d, "customer")
        .join(broadcast(Tables.load(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.load(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"), Det.fixedSum(col("c_acctbal"), 2).as("sum_bal"))
        .select(coalesce(col("r_name"), lit("ALL")).as("r"),
          coalesce(col("n_name"), lit("ALL")).as("n"),
          col("n_cust"), col("sum_bal"))
        .orderBy("r", "n")),

    // CUBE over (status, priority) — all four grouping combinations.
    "q_agg12" -> ((s, d) =>
      Tables.load(s, d, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_rows"), Det.fixedSum(col("o_totalprice"), 2).as("sum_price"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n_rows"), col("sum_price"))
        .orderBy("status", "priority")),

    // Count-min-sketch heavy hitters (rows-only: sketch estimates; merge
    // and error-bound properties spec-tested): per-language token sketches
    // built in one map-side-combined agg, merged + probed driver-side —
    // only ~KB summaries leave the cluster.
    "q_agg16" -> ((s, d) => {
      val toks = Tables.load(s, d, "documents")
        .select(col("lang"), explode(graft.operators.TextOps.tokens(col("text"))).as("tok"))
      graft.operators.SketchOps.cmsEstimates(toks, "tok", "lang",
        Seq("and", "der", "el", "of", "the"))
        .orderBy("probe")
    }),

    // Q-AGG17: frequent-pair mining over order baskets (the 2-itemset
    // apriori core): distinct (order, part) rows self-join WITHIN an
    // order only (pair volume bounded by basket size², with an explicit
    // basket-size cap so a degenerate mega-basket cannot detonate the
    // join — the q_dedup crowded-bucket knob applied to baskets), pair
    // support counted, support >= 2 kept, top-20 by (support desc, pair).
    "q_agg17" -> ((s, d) =>
      Shared.pairSupports(s, d)
        .orderBy(col("support").desc, col("pk_a"), col("pk_b"))
        .limit(20)),

    // Q-AGG19 (round 7): exact revenue-weighted median quantity per
    // returnflag — the robust center under weight skew. Lower weighted
    // median by the integer crossing 2·cum >= total: no division, no
    // interpolation, the answer is an input value => hash-exact.
    "q_agg19" -> ((s, d) =>
      graft.operators.Binning.weightedMedian(
        Tables.load(s, d, "lineitem").select(col("l_returnflag"),
          col("l_quantity"),
          round(col("l_extendedprice") * lit(100.0)).cast("long").as("w")),
        "l_returnflag", "l_quantity", "w")
        .orderBy("l_returnflag")),

    // Q-AGG21 (round 7): exact revenue-weighted quantity quartiles per
    // returnflag — the weighted box plot in ONE aggregation (q_agg19's
    // crossing rule at p25/p50/p75; quartile values are INPUT values).
    "q_agg21" -> ((s, d) =>
      graft.operators.Binning.weightedQuartiles(
        Tables.load(s, d, "lineitem").select(col("l_returnflag"),
          col("l_quantity"),
          round(col("l_extendedprice") * lit(100.0)).cast("long").as("w")),
        "l_returnflag", "l_quantity", "w")
        .orderBy("l_returnflag")),

    // Q-AGG20 (round 7): revenue-concentration Gini per returnflag across
    // suppliers — the "is this slice dominated by a few keys" summary
    // (the mixture-concentration diagnostic applied to the fixture).
    // Exact rank formulation over the per-supplier rollup; 6dp-rounded
    // single division => hash-exact.
    "q_agg20" -> ((s, d) =>
      graft.operators.SkewOps.giniByGroup(
        Tables.load(s, d, "lineitem")
          .groupBy(col("l_returnflag"), col("l_suppkey"))
          .agg(sum(round(col("l_extendedprice") * lit(100.0)).cast("long"))
            .as("cents")),
        "l_returnflag", "l_suppkey", "cents")
        .orderBy("l_returnflag")),

    // Q-AGG18: association rules over the q_agg17 pairs — confidence in
    // both directions and lift from exact integer supports (raw IEEE
    // quotients); deterministic top-20 on the same total order. The rule
    // table every recommender bootstrap reads off basket data.
    "q_agg18" -> ((s, d) => {
      // localCheckpoint KEPT this time (r16 — VERDICT r15 #5 re-probe at
      // both core counts: 32-core 1.87 -> 1.35, 8-core 1.44 -> 1.21
      // min-of-N; the r15 32-core-only probe that rejected it did not
      // reproduce): the basket-size window makes this subtree expensive
      // enough that one materialize beats two recomputes.
      val items = cappedBasketItems(s, d).localCheckpoint()
      val nBaskets = items.select("ok").distinct()
        .agg(count(lit(1)).as("__n"))
      val itemSup = items.groupBy("pk").agg(count(lit(1)).as("__sup"))
      Shared.pairSupports(s, d)
        .join(itemSup.select(col("pk").as("pk_a"), col("__sup").as("__sa")), "pk_a")
        .join(itemSup.select(col("pk").as("pk_b"), col("__sup").as("__sb")), "pk_b")
        .crossJoin(broadcast(nBaskets))
        .select(col("pk_a"), col("pk_b"), col("support"),
          (col("support").cast("double") / col("__sa").cast("double")).as("conf_ab"),
          (col("support").cast("double") / col("__sb").cast("double")).as("conf_ba"),
          ((col("support") * col("__n")).cast("double") /
            (col("__sa") * col("__sb")).cast("double")).as("lift"))
        .orderBy(col("support").desc, col("pk_a"), col("pk_b"))
        .limit(20)
    }),

    // GROUPING SETS ((status), (priority), ()) — the general form that
    // rollup/cube specialize (independent one-dimension margins + grand
    // total in ONE pass, no self-union); grouping() flags disambiguate
    // rolled-up nulls from genuinely null keys.
    "q_agg15" -> ((s, d) =>
      Tables.load(s, d, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_rows"), Det.fixedSum(col("o_totalprice"), 2).as("sum_price"),
          (grouping(col("o_orderstatus")) * 2 + grouping(col("o_orderpriority")))
            .cast("long").as("gid"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("gid"), col("n_rows"), col("sum_price"))
        .orderBy("gid", "status", "priority")),

    // Approximate per-group quantiles (GK mergeable sketch) — the scale
    // path when exact `percentile`'s full sort-per-group is too expensive
    // (threshold selection over 100 TB). Rows-only: sketch results are
    // partitioning-dependent in general; the spec bounds the rank error
    // against the exact percentile (and at fixture sizes < accuracy the
    // sketch IS exact).
    "q_agg13" -> ((s, d) =>
      Tables.load(s, d, "orders")
        .groupBy("o_orderstatus")
        .agg(percentile_approx(col("o_totalprice"), lit(0.5), lit(10000)).as("p50_approx"),
          count(lit(1)).as("n_rows"))
        .orderBy("o_orderstatus")),

    // Q-AGG6: custom typed UDAF — geometric mean.
    "q_agg6" -> ((s, d) => {
      val gm = udaf(GeoMean.agg)
      Tables.load(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(round(gm(col("l_quantity")), 6).as("geomean_qty"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")
    }),

    // Q-AGG7: first/last per group. l_linenumber is not unique within an
    // order in the fixture, so the ordering key folds in the value
    // (cents <= 5000 < 10000 => collision-free composite): among equal
    // (linenumber, qty) rows any survivor yields the same output.
    "q_agg7" -> ((s, d) => {
      val ord = col("l_linenumber") * 10000 + round(col("l_quantity") * 100).cast("long")
      Tables.load(s, d, "lineitem")
        .groupBy("l_orderkey")
        .agg(min_by(col("l_quantity"), ord).as("first_qty"),
          max_by(col("l_quantity"), ord).as("last_qty"),
          count(lit(1)).as("n_items"))
        .orderBy("l_orderkey")
    }),
  )

  private val statQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact interpolated percentiles per group (median + p90) — the
    // distribution summary a returns pipeline reports. ROUND-10 HARDENING
    // (the r9 fragility audit's one [1e3,1e4)-ulp site): the previous
    // `percentile(...)` + round(...,6) compared a double interpolation
    // against DuckDB's quantile_cont — the exact r7 failure mechanism.
    // Now the interpolation is replayed in EXACT INTEGERS end-to-end:
    // prices as integer cents, the percentile position (n−1)·p in tenths
    // (p ∈ {5/10, 9/10}), and the interpolated value emitted ×10 cents
    // (= milli-dollars): v_milli = c_lo·(10−rem) + c_hi·rem where
    // rem = (n−1)·k mod 10. Positional picks by row_number over the
    // cents sort — ties are between EQUAL cents values, so any tie order
    // yields the same picked value. No round site, no double anywhere.
    "q_agg8" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_orderstatus").orderBy("c")
      val wn = Window.partitionBy("o_orderstatus")
      def pick(k: Int, out: String) =
        sum(expr(s"CASE WHEN rn - 1 = (n-1)*$k div 10 " +
          s"THEN c * (10 - (n-1)*$k % 10) " +
          s"WHEN rn - 1 = (n-1)*$k div 10 + 1 THEN c * ((n-1)*$k % 10) " +
          "ELSE 0 END")).as(out)
      Tables.load(s, d, "orders")
        .select(col("o_orderstatus"),
          round(col("o_totalprice") * lit(100.0)).cast("long").as("c"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("n", count(lit(1)).over(wn))
        .groupBy("o_orderstatus")
        .agg(pick(5, "median_milli"), pick(9, "p90_milli"),
          count(lit(1)).as("n_rows"))
        .orderBy("o_orderstatus")
    }),

    // Fixed-width histogram: integer bucketing is exact => oracle-checked.
    "q_agg10" -> ((s, d) =>
      Tables.load(s, d, "orders")
        .groupBy(floor(col("o_totalprice") / lit(50000.0)).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n_orders"),
          Det.fixedSum(col("o_totalprice"), 2).as("sum_price"))
        .orderBy("bucket")),

    // Approximate percentile — the 100 TB path next to q_agg8's exact
    // sort-based percentile (rows-only: sketch-based, engine-specific).
    "q_agg11" -> ((s, d) =>
      Tables.load(s, d, "orders")
        .groupBy("o_orderstatus")
        .agg(approx_percentile(col("o_totalprice"), lit(0.5), lit(1000)).as("approx_median"),
          approx_percentile(col("o_totalprice"), lit(0.9), lit(1000)).as("approx_p90"))
        .orderBy("o_orderstatus")),

    // Correlation + sample stddev per group. Both are order-dependent
    // float folds => 6dp rounding on bounded corr, 4dp on stddev
    // (SURVEY.md §7.4.1 policy for non-exact aggregates).
    "q_agg9" -> ((s, d) =>
      Tables.load(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("qty_price_corr"),
          round(stddev_samp(col("l_discount")), 6).as("disc_sd"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")),
  )

  private val basketCtes =
    """items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
      |          FROM lineitem),
      |capped AS (SELECT ok, pk FROM (
      |    SELECT ok, pk, COUNT(*) OVER (PARTITION BY ok) AS bsz FROM items)
      |  WHERE bsz <= 50),
      |psup AS (SELECT a.pk AS pk_a, b.pk AS pk_b,
      |    CAST(COUNT(*) AS BIGINT) AS support
      |  FROM capped a JOIN capped b ON a.ok = b.ok AND a.pk < b.pk
      |  GROUP BY a.pk, b.pk HAVING COUNT(*) >= 2)""".stripMargin

  private val statOracle: Map[String, String] = Map(
    "q_agg18" ->
      s"""WITH $basketCtes,
         |nb AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n FROM capped),
         |isup AS (SELECT pk, CAST(COUNT(*) AS BIGINT) AS sup
         |         FROM capped GROUP BY pk)
         |SELECT p.pk_a, p.pk_b, p.support,
         |  CAST(p.support AS DOUBLE) / CAST(ia.sup AS DOUBLE) AS conf_ab,
         |  CAST(p.support AS DOUBLE) / CAST(ib.sup AS DOUBLE) AS conf_ba,
         |  CAST(p.support * nb.n AS DOUBLE) /
         |    CAST(ia.sup * ib.sup AS DOUBLE) AS lift
         |FROM psup p
         |JOIN isup ia ON ia.pk = p.pk_a
         |JOIN isup ib ON ib.pk = p.pk_b, nb
         |ORDER BY p.support DESC, p.pk_a, p.pk_b
         |LIMIT 20""".stripMargin,
    "q_agg17" ->
      s"""WITH $basketCtes
         |SELECT pk_a, pk_b, support FROM psup
         |ORDER BY support DESC, pk_a, pk_b
         |LIMIT 20""".stripMargin,
    "q_agg21" ->
      """WITH pv AS (SELECT l_returnflag, l_quantity,
        |    SUM(CAST(round(l_extendedprice*100.0, 0) AS BIGINT)) AS w
        |  FROM lineitem GROUP BY 1, 2),
        |cw AS (SELECT l_returnflag, l_quantity,
        |    SUM(w) OVER (PARTITION BY l_returnflag ORDER BY l_quantity
        |      ROWS UNBOUNDED PRECEDING) AS cum,
        |    SUM(w) OVER (PARTITION BY l_returnflag) AS tot
        |  FROM pv)
        |SELECT l_returnflag,
        |  MIN(CASE WHEN cum * 4 >= tot THEN l_quantity END) AS wq1,
        |  MIN(CASE WHEN cum * 2 >= tot THEN l_quantity END) AS wmedian,
        |  MIN(CASE WHEN cum * 4 >= tot * 3 THEN l_quantity END) AS wq3,
        |  CAST(MAX(tot) AS BIGINT) AS total_weight
        |FROM cw WHERE tot > 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_agg20" ->
      """WITH rev AS (SELECT l_returnflag, l_suppkey,
        |    SUM(CAST(round(l_extendedprice*100.0, 0) AS BIGINT)) AS x
        |  FROM lineitem GROUP BY 1, 2),
        |r AS (SELECT l_returnflag, x,
        |    row_number() OVER (PARTITION BY l_returnflag ORDER BY x, l_suppkey)
        |      AS i
        |  FROM rev),
        |a AS (SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
        |    SUM(x) AS s, SUM(CAST(i AS HUGEINT) * x) AS a
        |  FROM r GROUP BY 1)
        |SELECT l_returnflag, n AS n_keys,
        |  CASE WHEN s > 0 THEN
        |    round(CAST(2*a - (n+1)*s AS DOUBLE) / CAST(n*s AS DOUBLE), 6)
        |  END AS gini
        |FROM a ORDER BY l_returnflag""".stripMargin,
    "q_agg19" ->
      """WITH pv AS (SELECT l_returnflag, l_quantity,
        |    SUM(CAST(round(l_extendedprice*100.0, 0) AS BIGINT)) AS w
        |  FROM lineitem GROUP BY 1, 2),
        |cw AS (SELECT l_returnflag, l_quantity,
        |    SUM(w) OVER (PARTITION BY l_returnflag ORDER BY l_quantity
        |      ROWS UNBOUNDED PRECEDING) AS cum,
        |    SUM(w) OVER (PARTITION BY l_returnflag) AS tot
        |  FROM pv)
        |SELECT l_returnflag, MIN(l_quantity) AS weighted_median,
        |  CAST(MAX(tot) AS BIGINT) AS total_weight
        |FROM cw WHERE tot > 0 AND cum * 2 >= tot
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_agg10" ->
      s"""SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket,
         |  COUNT(*) AS n_orders,
         |  ${sqlFixedSum("o_totalprice", 2)} AS sum_price
         |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    // exact-integer percentile replay (see the engine-side comment):
    // identical positional picks + tenth-weighted interpolation over
    // integer cents; `//` and `%` on BIGINT are exact on both engines.
    "q_agg8" ->
      """WITH r AS (
        |  SELECT o_orderstatus,
        |    CAST(round(o_totalprice*100.0, 0) AS BIGINT) AS c,
        |    CAST(row_number() OVER (PARTITION BY o_orderstatus
        |      ORDER BY CAST(round(o_totalprice*100.0, 0) AS BIGINT)) AS BIGINT) AS rn,
        |    CAST(COUNT(*) OVER (PARTITION BY o_orderstatus) AS BIGINT) AS n
        |  FROM orders)
        |SELECT o_orderstatus,
        |  CAST(SUM(CASE WHEN rn - 1 = (n-1)*5//10 THEN c * (10 - (n-1)*5%10)
        |                WHEN rn - 1 = (n-1)*5//10 + 1 THEN c * ((n-1)*5%10)
        |                ELSE 0 END) AS BIGINT) AS median_milli,
        |  CAST(SUM(CASE WHEN rn - 1 = (n-1)*9//10 THEN c * (10 - (n-1)*9%10)
        |                WHEN rn - 1 = (n-1)*9//10 + 1 THEN c * ((n-1)*9%10)
        |                ELSE 0 END) AS BIGINT) AS p90_milli,
        |  COUNT(*) AS n_rows
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_agg9" ->
      """SELECT l_returnflag,
        |  round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
        |  round(stddev_samp(l_discount), 6) AS disc_sd,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
  )

  def oracleSql: Map[String, String] = statOracle ++ Map(
    "q_agg1" ->
      s"""SELECT l_returnflag, CAST(year(l_shipdate) AS BIGINT) AS ship_year,
         |  COUNT(*) AS n_rows,
         |  ${sqlFixedSum("l_extendedprice * (1.0 - l_discount)", 4)} AS sum_revenue,
         |  ${sqlFixedAvg("l_quantity", 2)} AS avg_qty
         |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_agg2" ->
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
         |  ${sqlFixedSum("l_quantity", 2)} AS sum_qty,
         |  ${sqlFixedSum("l_extendedprice", 2)} AS sum_price,
         |  min(l_discount) AS min_disc, max(l_discount) AS max_disc
         |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_agg3" ->
      """SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_cust
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_agg12" ->
      s"""SELECT COALESCE(o_orderstatus, 'ALL') AS status,
         |  COALESCE(o_orderpriority, 'ALL') AS priority,
         |  COUNT(*) AS n_rows, ${sqlFixedSum("o_totalprice", 2)} AS sum_price
         |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
         |ORDER BY status, priority""".stripMargin,
    "q_agg15" ->
      s"""SELECT COALESCE(o_orderstatus, 'ALL') AS status,
         |  COALESCE(o_orderpriority, 'ALL') AS priority,
         |  CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid,
         |  COUNT(*) AS n_rows, ${sqlFixedSum("o_totalprice", 2)} AS sum_price
         |FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
         |ORDER BY gid, status, priority""".stripMargin,
    "q_agg5" ->
      s"""SELECT COALESCE(r_name, 'ALL') AS r, COALESCE(n_name, 'ALL') AS n,
         |  COUNT(*) AS n_cust, ${sqlFixedSum("c_acctbal", 2)} AS sum_bal
         |FROM customer JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY ROLLUP (r_name, n_name) ORDER BY r, n""".stripMargin,
    "q_agg6" ->
      """SELECT l_returnflag, round(exp(SUM(ln(l_quantity)) / COUNT(*)), 6) AS geomean_qty,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_agg7" ->
      """SELECT l_orderkey,
        |  arg_min(l_quantity, l_linenumber * 10000 + CAST(round(l_quantity * 100, 0) AS BIGINT)) AS first_qty,
        |  arg_max(l_quantity, l_linenumber * 10000 + CAST(round(l_quantity * 100, 0) AS BIGINT)) AS last_qty,
        |  COUNT(*) AS n_items
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
