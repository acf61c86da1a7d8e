package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}
import graft.operators.{Anomaly, Binning, Curation, DataSplit, GraphOps, IntervalJoin, Normalize, Privacy, Sessionize, SnapshotDiff, TextOps}
import graft.util.Det.sqlFixedSum

/** Operational pipeline queries (round 4): gap sessionization over the
  * event stream, snapshot reconciliation (ship the delta, not the table),
  * distribution profiling (fixed-width histogram, equi-depth buckets),
  * exact stratified sampling, and a pairwise correlation matrix computed
  * from exact integer sums. All oracle-checked hash-exact.
  */
object OpsQueries extends QueryModule {

  private val GapSeconds = 1800L

  // q_diff1's two snapshots, derived deterministically from the SAME orders
  // parquet in both engines: prev drops keys %97==0 (-> 'added' in next),
  // next drops keys %89==3 (-> 'removed') and edits price (%7==0) and
  // status (%11==0) (-> 'changed').
  private def snapshots(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val base = Tables.load(s, d, "orders")
    val prev = base.where(pmod(col("o_orderkey"), lit(97)) =!= 0)
    val next = base.where(pmod(col("o_orderkey"), lit(89)) =!= 3)
      .withColumn("o_totalprice",
        when(pmod(col("o_orderkey"), lit(7)) === 0, col("o_totalprice") + lit(1.0))
          .otherwise(col("o_totalprice")))
      .withColumn("o_orderstatus",
        when(pmod(col("o_orderkey"), lit(11)) === 0, lit("X"))
          .otherwise(col("o_orderstatus")))
    (prev, next)
  }

  // Pearson correlation from exact integer-cent sums: the five sufficient
  // statistics are BIGINT (order-independent => cross-engine exact); the
  // final formula is a fixed double expression mirrored textually in the
  // oracle, so every IEEE op rounds identically. cents ~ 1e7/day/supplier
  // at sf0.1 keeps SUM(xa*xb) < 1e18; at larger SF scale cents down first.
  private def corrFromSums(n: Column, sx: Column, sy: Column, sxy: Column,
                           sxx: Column, syy: Column): (Column, Column, Column) = {
    def d(c: Column) = c.cast("double")
    val cov = d(n) * d(sxy) - d(sx) * d(sy)
    val vx = d(n) * d(sxx) - d(sx) * d(sx)
    val vy = d(n) * d(syy) - d(sy) * d(sy)
    (cov / (sqrt(vx) * sqrt(vy)), vx, vy)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q-SESS1: gap sessionization (30 min) — one shuffle on user_id, one
    // Window node for both the lag and the running session number.
    "q_sess1" -> ((s, d) =>
      Sessionize.assignSessions(Tables.load(s, d, "events"),
          "user_id", "ts", GapSeconds, "event_id")
        .select("user_id", "event_id", "ts", "is_session_start", "session_seq")
        .orderBy("user_id", "ts", "event_id")),

    // Q-SESS2: per-session rollup — bounds, count, exact value sum. The
    // aggregation reuses the session window's co-location (its keys have
    // the window partitioning as a subset); the rollup is memoized
    // (Shared.sessionStats) because q_ijoin1 joins the same table — at
    // cluster scale it is the persisted session table.
    "q_sess2" -> ((s, d) =>
      Shared.sessionStats(s, d).orderBy("user_id", "session_seq")),

    // Q-SESS3: weekly retention cohorts — the activation/retention matrix:
    // cohort = a user's first active week (pure integer epoch-week, no
    // calendar-boundary cross-engine traps), offset = weeks since cohort,
    // cell = distinct returning users. Two aggregations + one broadcast
    // join of the users-sized cohort table; the event scan happens once.
    "q_sess3" -> ((s, d) => {
      val ev = Tables.load(s, d, "events")
        .select(col("user_id"),
          floor(unix_timestamp(col("ts")).cast("double") / lit(604800.0))
            .cast("long").as("__wk"))
      val cohorts = ev.groupBy("user_id").agg(min("__wk").as("__cwk"))
      ev.join(broadcast(cohorts), Seq("user_id"))
        .select(col("user_id"), col("__cwk").as("cohort_week"),
          (col("__wk") - col("__cwk")).as("offset_weeks"))
        .groupBy("cohort_week", "offset_weeks")
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy("cohort_week", "offset_weeks")
    }),

    // Q-SESS4 (round 7): WAU / trailing-4-week MAU / stickiness per
    // epoch-week — the engagement dashboard row. The trailing-window
    // distinct is NOT a window function (no engine does framed
    // COUNT(DISTINCT)): each (user, week) row fans out to the <= 4 target
    // weeks it supports via an in-plan sequence-explode, target weeks are
    // semi-filtered to ones that exist (broadcast of the ~#weeks table),
    // then one exact distinct per target week. Fan-out is a constant 4x
    // of the deduped (user, week) table — linear at any history length.
    // Stickiness = one IEEE division of exact longs => hash-exact.
    "q_sess4" -> ((s, d) =>
      Sessionize.engagementFromUserWeeks(
          Sessionize.userWeeks(Tables.load(s, d, "events"), "user_id", "ts"))
        .orderBy("week")),

    // Q-SESS5 (round 7): event-type transition matrix — counts of
    // adjacent (from -> to) steps within each user's (ts, event_id)
    // stream, with the per-source-state transition probability (one IEEE
    // division of exact longs). The first-order Markov table behind
    // next-step prediction and funnel-leak diagnosis. One lag window on
    // the user partitioning + one aggregation; top-20 deterministic.
    "q_sess5" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val steps = Tables.load(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .select(col("event_type").as("to_type"),
          lag(col("event_type"), 1).over(w).as("from_type"))
        .where(col("from_type").isNotNull)
      val counts = steps.groupBy("from_type", "to_type")
        .agg(count(lit(1)).as("n"))
      val fromTotals = counts.groupBy("from_type")
        .agg(sum(col("n")).as("__ft"))
      counts.join(broadcast(fromTotals), Seq("from_type"))
        .select(col("from_type"), col("to_type"), col("n"),
          (col("n").cast("double") / col("__ft").cast("double")).as("p"))
        .orderBy(col("n").desc, col("from_type"), col("to_type"))
        .limit(20)
    }),

    // Q-SESS7 (round 7): daily growth accounting — DAU, new vs returning
    // users, and the cumulative-uniques curve. Cumulative COUNT(DISTINCT)
    // is not window-able at scale; the scalable identity: each user's
    // FIRST-SEEN day contributes one "new user", and cumulative uniques =
    // running sum of daily new users (a #days-sized window, never user
    // rows). All integer => hash-exact.
    // BOUND: structural — the global window's input is the per-DAY
    // aggregate, one row per calendar day (a century of daily grain is
    // ~36,500 rows, five orders under RowBound.DimensionScaleRows);
    // whitelisted in GlobalWindowSweepSpec.
    "q_sess7" -> ((s, d) => {
      val ev = Tables.load(s, d, "events")
        .select(col("user_id"), col("ts").cast("date").as("day"))
      val dau = ev.groupBy("day")
        .agg(countDistinct(col("user_id")).as("active_users"))
      val firstSeen = ev.groupBy("user_id").agg(min(col("day")).as("day"))
      val newU = firstSeen.groupBy("day").agg(count(lit(1)).as("new_users"))
      val cum = org.apache.spark.sql.expressions.Window.orderBy("day")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val nEv = ev.groupBy("day").agg(count(lit(1)).as("n_events"))
      nEv.join(dau, Seq("day"))
        .join(newU, Seq("day"), "left_outer")
        .select(col("day"), col("n_events"), col("active_users"),
          coalesce(col("new_users"), lit(0L)).as("new_users"))
        .withColumn("returning_users", col("active_users") - col("new_users"))
        .withColumn("cumulative_users", sum(col("new_users")).over(cum))
        .orderBy("day")
    }),

    // Q-SESS6 (round 7): top event-type path trigrams — the 3-step
    // sequences users actually walk (q_sess5's first-order matrix misses
    // multi-step structure). Two lags on the same user partitioning, one
    // aggregation, deterministic top-20. All integer => hash-exact.
    "q_sess6" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.load(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .select(col("event_type").as("e3"),
          lag(col("event_type"), 1).over(w).as("e2"),
          lag(col("event_type"), 2).over(w).as("e1"))
        .where(col("e1").isNotNull)
        .groupBy("e1", "e2", "e3").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("e1"), col("e2"), col("e3"))
        .limit(20)
    }),

    // Q-DQ4 (round 7): self-join cardinality forecast — the check run
    // BEFORE launching a corpus-scale self-join (dedup candidates, basket
    // pairs): per-key row counts c(k) predict exactly Σ c(k)·(c(k)-1)/2
    // output pairs; the top key's share says whether a cap/salt is needed.
    // One aggregation + a broadcast one-row total; all integer.
    "q_dq4" -> ((s, d) => {
      val perKey = Tables.load(s, d, "lineitem")
        .groupBy(col("l_partkey")).agg(count(lit(1)).as("__c"))
        .select(col("l_partkey"),
          expr("__c * (__c - 1) div 2").as("pairs"))
      val tot = perKey.agg(sum(col("pairs")).as("__tot"))
      perKey.crossJoin(broadcast(tot))
        .select(col("l_partkey"), col("pairs"), col("__tot").as("total_pairs"),
          (col("pairs").cast("double") / col("__tot").cast("double"))
            .as("share"))
        .orderBy(col("pairs").desc, col("l_partkey"))
        .limit(10)
    }),

    // Q-DIFF1: snapshot reconciliation — one full-outer sort-merge join on
    // the key; only the delta (added/removed/changed) survives.
    "q_diff1" -> ((s, d) => {
      val (prev, next) = snapshots(s, d)
      SnapshotDiff.diff(prev, next, Seq("o_orderkey"),
          Seq("o_orderstatus", "o_totalprice"))
        .orderBy("o_orderkey")
    }),

    // Q-HIST1: fixed-width histogram of order value — one map-side-combined
    // aggregation, 24 bins over [0, 600k), exact 2dp sums per bin.
    "q_hist1" -> ((s, d) =>
      Binning.fixedWidthHistogram(Tables.load(s, d, "orders"),
          "o_totalprice", lo = 0.0, width = 25000.0, nBins = 24)
        .orderBy("bin")),

    // Q-BIN1: equi-depth feature buckets (ntile 8) over the customer
    // dimension — deterministic via the (acctbal, custkey) total order.
    "q_bin1" -> ((s, d) =>
      Binning.equiDepthBuckets(
          Tables.load(s, d, "customer").select("c_custkey", "c_acctbal"),
          n = 8, order = Seq("c_acctbal", "c_custkey"))
        .withColumn("bucket", col("bucket").cast("long"))
        .orderBy("c_custkey")),

    // Q-BIN2: the FACT-SCALE equi-depth path — boundaries from a 5%
    // deterministic hash sample (only the sample is sorted), broadcast as
    // ONE array row into the fact scan, assignment at scan speed. The
    // 100-TB discretization pattern, end-to-end oracle-checked.
    "q_bin2" -> ((s, d) => {
      val orders = Tables.load(s, d, "orders")
      val bounds = Binning.boundariesFromSample(orders,
        "o_totalprice", "o_orderkey", fraction = 0.05, n = 8)
      Binning.assignByBoundaries(orders, "o_totalprice", bounds)
        .select("o_orderkey", "o_totalprice", "bucket")
        .orderBy("o_orderkey")
    }),

    // Q-SAMPLE5: EXACT stratified sample — ceil(20%) of every language by
    // deterministic key order (vs q_sample1's binomial hash split).
    "q_sample5" -> ((s, d) =>
      DataSplit.stratifiedExact(Tables.load(s, d, "documents")
          .select("doc_id", "lang", "source"),
          stratumCol = "lang", keyCol = "doc_id", fraction = 0.2)
        .orderBy("doc_id")),

    // Q-SAMPLE10: token-budget waterfilling over (source, lang) strata —
    // the data-mixture planner. Budget = total corpus tokens, repetition
    // ceiling 2 epochs: small strata saturate at 2x their tokens, large
    // strata share the rest at one common water level. The stratum token
    // counts are the corpus-sized work (one tokenize + reduce); the
    // waterfilling itself runs on the ~100-row stratum table.
    "q_sample10" -> ((s, d) => {
      val toks = Tables.load(s, d, "documents")
        .select(concat(col("source"), lit("|"), col("lang")).as("stratum"),
          size(TextOps.tokens(col("text"))).cast("long").as("__nt"))
      // budget = Σ stratum avails — derived from the per-stratum rollup,
      // NOT a second aggregation over the corpus-sized toks plan (Spark
      // has no cross-aggregate subplan reuse; the tokenize would run twice)
      val perStratum = toks.groupBy("stratum").agg(sum("__nt").as("avail"))
        .localCheckpoint()
      val total = perStratum.agg(sum("avail").as("__total"))
      Curation.waterfillMixture(
          perStratum.crossJoin(broadcast(total)),
          "stratum", "avail", col("__total"), maxEpochs = 2)
        .orderBy("stratum")
    }),

    // Q-PIPE6: quality-gated mixture planning end-to-end — filter → count
    // → plan: docs below the composite quality score drop, the surviving
    // tokens are counted per stratum, and the waterfill runs at HALF the
    // gated total (so the level lands mid-distribution). The curation
    // pipeline's last mile: what the training job actually samples.
    "q_pipe6" -> ((s, d) => {
      val sc = Tables.load(s, d, "documents")
        .select(concat(col("source"), lit("|"), col("lang")).as("stratum"),
          size(TextOps.tokens(col("text"))).cast("long").as("__nt"),
          TextOps.compositeQualityMicro(col("text")).as("__score"))
      val gated = sc.where(col("__score").isNotNull && col("__score") >= 450000L)
      // as in q_sample10: the budget folds the per-stratum rollup (exact
      // integer re-association), never a second corpus-sized aggregation
      val perStratum = gated.groupBy("stratum").agg(sum("__nt").as("avail"))
        .localCheckpoint()
      val budget = perStratum.agg(
        floor(sum("avail").cast("double") * lit(0.5)).cast("long").as("__budget"))
      Curation.waterfillMixture(
          perStratum.crossJoin(broadcast(budget)),
          "stratum", "avail", col("__budget"), maxEpochs = 2)
        .orderBy("stratum")
    }),

    // Q-PIPE9 (round 9): temperature-flattened mixture — the OTHER
    // standard data-mixture rule next to the q_pipe5/6 waterfill: budget
    // share ∝ avail^(1/2) (temperature T = 2, the mT5/XLM-R language-
    // balancing flattening), exact-integer via isqrt weights +
    // largest-remainder apportionment, so Σ alloc == budget exactly and
    // no libm pow() ever runs. Same sufficient-statistic shape as
    // q_sample10: the corpus reduces to per-source token counts first.
    "q_pipe9" -> ((s, d) => {
      val toks = Tables.load(s, d, "documents")
        .select(col("source"),
          size(TextOps.tokens(col("text"))).cast("long").as("__nt"))
      val perSource = toks.groupBy("source").agg(sum("__nt").as("avail"))
        .localCheckpoint()
      val budget = perSource.agg(expr("sum(avail) div 2").as("__budget"))
      Curation.temperatureMixture(
          perSource.crossJoin(broadcast(budget)),
          "source", "avail", col("__budget"))
        .orderBy("source")
    }),

    // Q-CORR1: pairwise correlation matrix of per-supplier daily revenue
    // WITHOUT a cartesian: the self-join keys on day (both sides already
    // aggregated to supplier x day), pairs form per-day only, and the
    // correlation comes from exact BIGINT sufficient statistics. The merge
    // hints force SMJ over broadcast so BOTH sides want the same day-hash
    // Exchange — ReuseExchange then computes the daily aggregate (and the
    // fact scan under it) ONCE (PlanShapeSpec-asserted).
    "q_corr1" -> ((s, d) => {
      val daily = Tables.load(s, d, "lineitem")
        .where(col("l_suppkey") <= 20)
        .groupBy(col("l_suppkey").as("k"),
          col("l_shipdate").cast("date").as("day"))
        .agg(sum(round(col("l_extendedprice") * lit(100.0)).cast("long")).as("cents"))
      val a = daily.select(col("k").as("ka"), col("day"), col("cents").as("xa"))
      val b = daily.select(col("k").as("kb"), col("day"), col("cents").as("xb"))
      val stats = a.hint("merge").join(b.hint("merge"), "day")
        .where(col("ka") < col("kb"))
        .groupBy("ka", "kb")
        .agg(count(lit(1)).as("n"),
          sum("xa").as("sx"), sum("xb").as("sy"),
          sum(col("xa") * col("xb")).as("sxy"),
          sum(col("xa") * col("xa")).as("sxx"),
          sum(col("xb") * col("xb")).as("syy"))
      val (corr, vx, vy) = corrFromSums(col("n"), col("sx"), col("sy"),
        col("sxy"), col("sxx"), col("syy"))
      stats.where(vx > lit(0.0) && vy > lit(0.0))
        .select(col("ka"), col("kb"), col("n"), corr.as("corr_rev"))
        .orderBy("ka", "kb")
    }),

    // Q-CORR2 (round 9): lead-lag cross-correlation — does a supplier's
    // return series LEAD or FOLLOW the market? Pearson corr of
    // (supplier_t, market_{t+k}) for k in [-2, +2] calendar days, per
    // supplier <= 20. Returns are the shared exact clipped-micro series
    // (Shared.supplierReturns / marketReturns); the five sufficient
    // statistics are exact BIGINT group sums (bounded by the ±1e7 clip:
    // n·C² ≤ 2500·1e14 = 2.5e17 < 2^63) and the corr is the q_corr1
    // corrFromSums double tree. Market is one row per day — the shifted
    // join is broadcast, the group-by is tiny (≤ 100 groups).
    "q_corr2" -> ((s, d) => {
      val sup = Shared.supplierReturns(s, d).where(col("l_suppkey") <= 20)
      val mkt = Shared.marketReturns(s, d)
      val lagged = sup.select(col("l_suppkey"), col("day_ord"), col("x"),
        explode(array((-2 to 2).map(k => lit(k.toLong)): _*)).as("lead_days"))
      val stats = lagged
        .join(broadcast(mkt.select((col("day_ord") as "m_ord"), col("y"))),
          col("day_ord") + col("lead_days") === col("m_ord"))
        .groupBy("l_suppkey", "lead_days")
        .agg(count(lit(1)).as("n"),
          sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
      val (corr, vx, vy) = corrFromSums(col("n"), col("sx"), col("sy"),
        col("sxy"), col("sxx"), col("syy"))
      stats.where(vx > lit(0.0) && vy > lit(0.0))
        .select(col("l_suppkey"), col("lead_days"), col("n"),
          corr.as("xcorr"))
        .orderBy("l_suppkey", "lead_days")
    }),

    // Q-SAMPLE11 (round 9): k-fold cross-validation assignment — the
    // split operator generalized from one holdout to the full CV
    // expansion: every key appears once per round, as 'test' in exactly
    // its fold and 'train' elsewhere. Fold membership is the
    // SQL-replicable Knuth bucket mod k (deterministic, uniform over
    // residues); the expansion is a k-row explode — no shuffle at all
    // beyond the final presentation sort.
    "q_sample11" -> ((s, d) => {
      val k = 5
      Tables.load(s, d, "customer")
        .select(col("c_custkey"),
          pmod(DataSplit.knuthBucket(col("c_custkey")), lit(k.toLong)).as("fold"))
        .select(col("c_custkey"), col("fold"),
          explode(sequence(lit(0L), lit(k - 1L))).as("cv_round"))
        .withColumn("role",
          when(col("fold") === col("cv_round"), lit("test")).otherwise(lit("train")))
        .select("cv_round", "c_custkey", "fold", "role")
        .orderBy("cv_round", "c_custkey")
    }),

    // Q-FEAT1 (round 9): leave-one-out target encoding — the
    // leakage-safe categorical feature: each order's priority is encoded
    // as the mean target (total price) of all OTHER orders in that
    // priority, (Σ−x)/(n−1) from exact integer cents with ONE raw double
    // division (never round after dividing). Per-category stats are a
    // 5-row aggregate broadcast back — the scale-right plan (a window
    // over 5 nation-sized partitions would serialize; the broadcast join
    // keeps the encode map-side at any corpus size).
    "q_feat1" -> ((s, d) => {
      val o = Tables.load(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          round(col("o_totalprice") * lit(100.0)).cast("long").as("cents"))
      val stats = o.groupBy("o_orderpriority")
        .agg(sum("cents").as("s"), count(lit(1)).as("n"))
      o.join(broadcast(stats), "o_orderpriority")
        .withColumn("loo_cents",
          when(col("n") > 1,
            (col("s") - col("cents")).cast("double") /
              (col("n") - lit(1L)).cast("double")))
        .select("o_orderkey", "o_orderpriority", "cents", "loo_cents")
        .orderBy("o_orderkey")
    }),

    // Q-SAMPLE12 (round 9): embargoed walk-forward CV — the time-series
    // CV that never trains on the future (the López-de-Prado purged
    // walk-forward): the day range splits into 5 equal segments; round r
    // trains on segments 0..r and tests on segment r+1, with the first 5
    // days of each test block EMBARGOED (the adjacent-boundary leakage
    // guard: features built from trailing windows still overlap the
    // train tail there). All boundaries are exact integer floor/ceil
    // arithmetic on the epoch-day ordinal; the range bounds are a
    // one-row aggregate broadcast — never a global sort.
    "q_sample12" -> ((s, d) => {
      val base = Shared.supplierDailyCents(s, d).select("l_suppkey", "day_ord")
      val bounds = base.agg(min("day_ord").as("lo"),
        (max("day_ord") - min("day_ord") + lit(1L)).as("w"))
      base.crossJoin(broadcast(bounds))
        .withColumn("seg", expr("((day_ord - lo) * 5) div w"))
        .withColumn("cv_round", explode(sequence(lit(0L), lit(3L))))
        .withColumn("role",
          when(col("seg") <= col("cv_round"), lit("train"))
            .when(col("seg") === col("cv_round") + lit(1L),
              when(col("day_ord") - col("lo") <
                  expr("(seg * w + 4) div 5") + lit(5L), lit("embargo"))
                .otherwise(lit("test"))))
        .where(col("role").isNotNull)
        .select("cv_round", "l_suppkey", "day_ord", "seg", "role")
        .orderBy("cv_round", "l_suppkey", "day_ord")
    }),

    // Q-FEAT4 (round 9): leakage-safe train-fitted scaling — the
    // standardization a model pipeline must fit on the TRAIN split only
    // and apply everywhere (fitting on the full series leaks test-set
    // moments into training features). Split at the 80% point of the day
    // range (exact integer arithmetic); per-key train moments are exact
    // BIGINT sums (x clipped at ±1e7 bounds n·x² < 2^63); z is the fixed
    // double tree mu = sx/n, var = (n·sxx − sx²)/(n·(n−1)),
    // z = (x − mu)/sqrt(var) — raw IEEE, never rounded after dividing.
    // Degenerate train slices (n < 2 or zero variance) emit null z. The
    // stats join broadcasts here (#suppliers rows); with a huge key
    // space the same equi-join shuffles — drop the hint, nothing else
    // changes.
    "q_feat4" -> ((s, d) => {
      def dd(c: Column) = c.cast("double")
      val base = Shared.supplierReturns(s, d)
      val bounds = base.agg(min("day_ord").as("lo"), max("day_ord").as("hi"))
      val withSplit = base.crossJoin(broadcast(bounds))
        .withColumn("split",
          when(col("day_ord") <= col("lo") + expr("((hi - lo) * 4) div 5"),
            lit("train")).otherwise(lit("test")))
      val stats = withSplit.where(col("split") === "train")
        .groupBy("l_suppkey")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"),
          sum(col("x") * col("x")).as("sxx"))
      val vr = (dd(col("n")) * dd(col("sxx")) - dd(col("sx")) * dd(col("sx"))) /
        (dd(col("n")) * dd(col("n") - lit(1L)))
      withSplit.join(broadcast(stats), Seq("l_suppkey"), "left")
        .withColumn("z",
          when(col("n") >= 2 && vr > 0.0,
            (dd(col("x")) - dd(col("sx")) / dd(col("n"))) / sqrt(vr)))
        .select(col("l_suppkey"), col("day_ord"), col("split"),
          col("x").as("r_micro"), col("z"))
        .orderBy("l_suppkey", "day_ord")
    }),

    // Q-IJOIN1: interval-overlap join — user sessions x 2-hour incident
    // windows sharing a cohort key. Bucketized equi-join (6 h buckets) with
    // exactly-once canonical-bucket emission: no BroadcastNestedLoop, no
    // distinct. The oracle states the same join as plain inequalities.
    "q_ijoin1" -> ((s, d) => {
      val events = Tables.load(s, d, "events")
      val sess = Shared.sessionStats(s, d)
        .select(col("user_id"), col("session_seq"),
          unix_micros(col("session_start")).as("s_us"),
          unix_micros(col("session_end")).as("e_us"),
          pmod(col("user_id"), lit(25)).as("k"))
      val incidents = events
        .where(pmod(col("event_id"), lit(211)) === 0)
        .select(col("event_id"),
          unix_micros(col("ts")).as("a_us"),
          (unix_micros(col("ts")) + lit(7200000000L)).as("a_end"),
          pmod(col("user_id"), lit(25)).as("k"))
      IntervalJoin.overlapJoin(sess, incidents, "k",
          "s_us", "e_us", "a_us", "a_end", bucketWidth = 21600000000L)
        .select("k", "user_id", "session_seq", "event_id", "overlap_us")
        .orderBy("k", "user_id", "session_seq", "event_id")
    }),

    // Q-DIFF2 (round 5): PSI drift gate between the q_diff1 snapshots —
    // prev's sampled equi-depth buckets, both snapshots bucket-counted,
    // add-one-smoothed (p−q)·ln(p/q) terms in exact micro-nats. The
    // production numeric-drift check (PSI < 0.1 stable).
    "q_diff2" -> ((s, d) => {
      val (prev, next) = snapshots(s, d)
      Binning.psiReport(prev, next, "o_totalprice", "o_orderkey",
          fraction = 0.05, n = 8)
        .orderBy("bucket")
    }),

    // Q-ANOM1: per-group z-score outlier flags over supplier daily revenue
    // — exact integer sufficient statistics in ONE group window (single
    // shuffle), raw-IEEE z. Dollar-scale stats keep SUM(v*v) far from
    // BIGINT range at any plausible SF.
    "q_anom1" -> ((s, d) => {
      val daily = Tables.load(s, d, "lineitem")
        .groupBy(col("l_suppkey"), col("l_shipdate").cast("date").as("day"))
        .agg(graft.util.Det.fixedSum(col("l_extendedprice"), 2).as("revenue"))
      Anomaly.zScores(daily, "l_suppkey", "revenue", scale = 0, threshold = 2.0)
        .select("l_suppkey", "day", "revenue", "z", "is_outlier")
        .orderBy("l_suppkey", "day")
    }),

    // Q-ANOM2 (round 5): winsorization — order values clipped into the
    // sampled [p5, p95]: percentile bounds from the row-capped 5% hash
    // sample (one bounded single-task ntile), broadcast as ONE row, clip
    // at scan speed with comparisons only => hash-exact.
    "q_anom2" -> ((s, d) =>
      Binning.winsorize(Tables.load(s, d, "orders")
          .select("o_orderkey", "o_totalprice"),
          "o_totalprice", "o_orderkey", loPct = 5, hiPct = 95, fraction = 0.05)
        .orderBy("o_orderkey")),

    // Q-ANOM3 (round 5): median/MAD robust outliers over the same daily
    // supplier revenue as q_anom1 — the gate that still fires when a heavy
    // outlier has inflated the group sigma past the z-threshold. Two
    // entire-partition windows on ONE partitioning (single shuffle);
    // integer-dollar values keep every median/deviation exact in doubles.
    "q_anom3" -> ((s, d) => {
      val daily = Tables.load(s, d, "lineitem")
        .groupBy(col("l_suppkey"), col("l_shipdate").cast("date").as("day"))
        .agg(graft.util.Det.fixedSum(col("l_extendedprice"), 2).as("revenue"))
      Anomaly.robustOutliers(daily, "l_suppkey", "revenue", scale = 0, k = 3.0)
        .select("l_suppkey", "day", "revenue", "med", "mad", "robust_z",
          "is_outlier")
        .orderBy("l_suppkey", "day")
    }),

    // Q-NORM1 (round 5): per-supplier feature scaling of daily revenue —
    // min-max to [0,1] (null for constant groups) + outlier-robust
    // percent_rank under a total order. Both windows share the supplier
    // partitioning: ONE shuffle for the pair. Cents-exact inputs make the
    // min-max quotient a single IEEE division of exact integers.
    "q_norm1" -> ((s, d) => {
      val daily = Tables.load(s, d, "lineitem")
        .groupBy(col("l_suppkey"), col("l_shipdate").cast("date").as("day"))
        .agg(graft.util.Det.fixedSum(col("l_extendedprice"), 2).as("revenue"))
      Normalize.percentRank(
          Normalize.minMax(daily, "l_suppkey", "revenue", scale = 2, "rev_mm"),
          "l_suppkey", Seq(col("revenue"), col("day")), "rev_pr")
        .select("l_suppkey", "day", "revenue", "rev_mm", "rev_pr")
        .orderBy("l_suppkey", "day")
    }),

    // Q-MODE1: most frequent quantity per (returnflag, linestatus) with a
    // deterministic smallest-value tie-break — two aggregations, the
    // second pre-pruned map-side by WindowGroupLimit.
    "q_mode1" -> ((s, d) => {
      val counts = Tables.load(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"), col("l_quantity"))
        .agg(count(lit(1)).as("n"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("l_returnflag", "l_linestatus")
        .orderBy(col("n").desc, col("l_quantity").asc)
      counts.withColumn("__rn", row_number().over(w))
        .where(col("__rn") === 1).drop("__rn")
        .withColumnRenamed("l_quantity", "mode_qty")
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // Q-PRIV1 (round 5): k-anonymity suppression — customers whose
    // (nation, segment) cohort has fewer than 8 members are suppressed
    // before release; survivors carry their cohort size for release
    // auditing. One window count on the quasi-identifier key => hash-exact.
    "q_priv1" -> ((s, d) =>
      Privacy.kAnonymize(Tables.load(s, d, "customer")
          .select("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal"),
          Seq("c_nationkey", "c_mktsegment"), k = 8, cohortSizeAs = "cohort_size")
        .orderBy("c_custkey")),

    // Q-PRIV2 (round 7): l-diversity audit — k-anonymity's mandatory
    // companion (a large cohort still exposes everyone if the sensitive
    // value is uniform inside it): per (nation) cohort, size + distinct
    // market segments + the l>=5 flag. One aggregation => hash-exact.
    "q_priv2" -> ((s, d) =>
      Privacy.lDiversityAudit(Tables.load(s, d, "customer"),
          Seq("c_nationkey"), "c_mktsegment", l = 5)
        .orderBy("c_nationkey")),

    // Q-GRAPH1 (round 5): integer-arithmetic PageRank over the bipartite
    // customer→supplier purchase graph (the authority / quality-prior
    // scoring leg of a web-curation pipeline, run on fixture data). All
    // arithmetic is BIGINT (micro-unit ranks, truncating division) =>
    // hash-exact against the unrolled-iteration SQL twin. Keys are
    // disjoint-encoded (cust·2 / supp·2+1) so the two id spaces never
    // collide in one vertex set.
    "q_graph1" -> ((s, d) => {
      val edges = Tables.load(s, d, "orders")
        .join(Tables.load(s, d, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      GraphOps.pageRank(edges, "src", "dst", PrIters, dampingPct = 85)
        .orderBy("vertex")
    }),
    // Q-GRAPH2 (round 5): personalized PageRank — teleport pinned to the
    // BUILDING-segment customers (the curated seed set); scores rank every
    // vertex by graph proximity to the seeds ("expand this trusted set").
    // Same integer arithmetic as q_graph1 => hash-exact.
    "q_graph2" -> ((s, d) => {
      val edges = Tables.load(s, d, "orders")
        .join(Tables.load(s, d, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      val seeds = Tables.load(s, d, "customer")
        .where(col("c_mktsegment") === "BUILDING")
        .select((col("c_custkey") * 2).as("vertex"))
      GraphOps.personalizedPageRank(edges, "src", "dst", seeds, "vertex",
          PprIters, dampingPct = 85)
        .orderBy("vertex")
    }),

    // Q-GRAPH3 (round 7): per-vertex triangle counts over the co-purchase
    // graph (q_agg17's support>=2 basket pairs as undirected edges) — the
    // cohesion signal under community quality and spam-farm detection.
    // Engine enumerates wedges under DEGREE orientation (O(m^1.5) work,
    // hub-proof); the oracle's id-oriented three-way join is the simple
    // quadratic-in-degree form — same triangles, hash-exact (all integer).
    "q_graph3" -> ((s, d) =>
      GraphOps.triangleCounts(coPurchaseEdges(s, d), "src", "dst")
        .orderBy("vertex")),

    // Q-GRAPH4 (round 7): local clustering coefficient in exact micro
    // units — 2·tri·1e6 div (deg·(deg-1)) — over the same graph. Integer
    // division on non-negative operands => hash-exact.
    "q_graph4" -> ((s, d) =>
      GraphOps.clusteringCoefficients(coPurchaseEdges(s, d), "src", "dst")
        .orderBy("vertex")),

    // Q-GRAPH5 (round 7): 3-core of the co-purchase graph by iterative
    // peeling. Engine and oracle share the SAME round budget
    // (KCoreUnroll): the engine early-stops at fixpoint (11 rounds at
    // sf0.01) and extra unrolled rounds are no-ops once converged, while
    // on a hypothetical deeper-than-budget graph BOTH sides emit the
    // identical KCoreUnroll-round partial peel — the twins can never
    // diverge on ANY input, converged or not.
    "q_graph5" -> ((s, d) =>
      GraphOps.kCore(coPurchaseEdges(s, d), "src", "dst", k = KCoreK,
          maxRounds = KCoreUnroll, requireConverged = false)
        .orderBy("vertex")),

    // Q-GRAPH6 (round 7): synchronous label-propagation communities,
    // LpRounds fixed rounds, min-label tie-break — deterministic, integer,
    // unrolled-CTE oracle like q_graph1.
    "q_graph6" -> ((s, d) =>
      GraphOps.labelPropagation(coPurchaseEdges(s, d), "src", "dst",
          rounds = LpRounds)
        .orderBy("vertex")),

    // Q-GRAPH7 (round 7): link prediction — top-20 non-adjacent pairs by
    // (common neighbors, preferential attachment), the "suggest an edge"
    // primitive over the co-purchase graph. All integer => hash-exact.
    "q_graph7" -> ((s, d) =>
      GraphOps.linkPrediction(coPurchaseEdges(s, d), "src", "dst", k = 20)),

    // Q-GRAPH8 (round 7): per-vertex mean neighbor degree in micro units
    // — connected-to-hubs vs connected-to-periphery, the local
    // assortativity profile. All integer => hash-exact.
    "q_graph8" -> ((s, d) =>
      GraphOps.avgNeighborDegree(coPurchaseEdges(s, d), "src", "dst")
        .orderBy("vertex")),

    // Q-GRAPH9 (round 7): degree assortativity — one Pearson correlation
    // of endpoint degrees over both edge orientations, 6dp (the q_agg9
    // correlation convention).
    "q_graph9" -> ((s, d) =>
      GraphOps.degreeAssortativity(coPurchaseEdges(s, d), "src", "dst")),
  )

  private val PrIters = 5
  private val PprIters = 4
  private val KCoreK = 3
  private val KCoreUnroll = 16
  private val LpRounds = 4

  /** The q_agg17 support>=2 basket-pair table as an edge list — the
    * co-purchase graph every q_graph3–7 metric runs over (memoized: one
    * mining pass serves the whole family, the persisted-table shape). */
  private def coPurchaseEdges(s: SparkSession, d: String): DataFrame =
    Shared.pairSupports(s, d)
      .select(col("pk_a").as("src"), col("pk_b").as("dst"))

  /** Shared CTE text: the co-purchase edge list (lo < hi, canonical) in
    * the q_agg17 basket SQL convention, plus the vertex set and degrees. */
  private val graphCtes =
    """items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
      |          FROM lineitem),
      |capped AS (SELECT ok, pk FROM (
      |    SELECT ok, pk, COUNT(*) OVER (PARTITION BY ok) AS bsz FROM items)
      |  WHERE bsz <= 50),
      |e0 AS (SELECT a.pk AS lo, b.pk AS hi
      |  FROM capped a JOIN capped b ON a.ok = b.ok AND a.pk < b.pk
      |  GROUP BY a.pk, b.pk HAVING COUNT(*) >= 2),
      |v AS (SELECT DISTINCT vtx FROM
      |  (SELECT lo AS vtx FROM e0 UNION ALL SELECT hi FROM e0))""".stripMargin

  private def triangleSql: String =
    s"""WITH $graphCtes,
       |tri AS (SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c
       |  FROM e0 e1
       |  JOIN e0 e2 ON e2.lo = e1.lo AND e2.hi > e1.hi
       |  JOIN e0 e3 ON e3.lo = e1.hi AND e3.hi = e2.hi),
       |pv AS (SELECT vtx, CAST(COUNT(*) AS BIGINT) AS t FROM
       |  (SELECT a AS vtx FROM tri UNION ALL SELECT b FROM tri
       |   UNION ALL SELECT c FROM tri) GROUP BY vtx)
       |SELECT v.vtx AS vertex, coalesce(pv.t, 0) AS triangles
       |FROM v LEFT JOIN pv ON pv.vtx = v.vtx
       |ORDER BY vertex""".stripMargin

  private def lccSql: String =
    s"""WITH $graphCtes,
       |deg AS (SELECT vtx, CAST(COUNT(*) AS BIGINT) AS dg FROM
       |  (SELECT lo AS vtx FROM e0 UNION ALL SELECT hi FROM e0) GROUP BY vtx),
       |tri AS (SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c
       |  FROM e0 e1
       |  JOIN e0 e2 ON e2.lo = e1.lo AND e2.hi > e1.hi
       |  JOIN e0 e3 ON e3.lo = e1.hi AND e3.hi = e2.hi),
       |pv AS (SELECT vtx, CAST(COUNT(*) AS BIGINT) AS t FROM
       |  (SELECT a AS vtx FROM tri UNION ALL SELECT b FROM tri
       |   UNION ALL SELECT c FROM tri) GROUP BY vtx)
       |SELECT deg.vtx AS vertex, deg.dg AS degree,
       |  coalesce(pv.t, 0) AS triangles,
       |  CASE WHEN deg.dg >= 2
       |    THEN (2 * coalesce(pv.t, 0) * 1000000) // (deg.dg * (deg.dg - 1))
       |    ELSE 0 END AS lcc_micro
       |FROM deg LEFT JOIN pv ON pv.vtx = deg.vtx
       |ORDER BY vertex""".stripMargin

  // k-core oracle: peel rounds unrolled as chained CTEs (the engine runs
  // to fixpoint; once converged, every further unrolled round is a no-op,
  // so KCoreUnroll only has to be >= the true peel depth — 11 at sf0.01).
  // Every e_i/k_i is MATERIALIZED: DuckDB inlines plain CTEs at each
  // reference site, and e_i is referenced 3x per round — un-materialized,
  // the expansion is 3^rounds and exhausts file handles on the base scan.
  private def kCoreSql: String = {
    val rounds = (1 to KCoreUnroll).map { i =>
      s"""d$i AS (SELECT vtx, COUNT(*) AS dg FROM
         |  (SELECT lo AS vtx FROM e${i - 1} UNION ALL SELECT hi FROM e${i - 1})
         |  GROUP BY vtx),
         |k$i AS MATERIALIZED (SELECT vtx FROM d$i WHERE dg >= $KCoreK),
         |e$i AS MATERIALIZED (SELECT lo, hi FROM e${i - 1}
         |  WHERE lo IN (SELECT vtx FROM k$i) AND hi IN (SELECT vtx FROM k$i))""".stripMargin
    }.mkString(",\n")
    s"""WITH ${graphCtes.replace("e0 AS (", "e0 AS MATERIALIZED (")},
       |$rounds
       |SELECT vtx AS vertex, CAST(dg AS BIGINT) AS core_degree FROM
       |  (SELECT vtx, COUNT(*) AS dg FROM
       |    (SELECT lo AS vtx FROM e$KCoreUnroll UNION ALL SELECT hi FROM e$KCoreUnroll)
       |   GROUP BY vtx)
       |WHERE dg >= $KCoreK
       |ORDER BY vertex""".stripMargin
  }

  private def linkPredSql: String =
    s"""WITH $graphCtes,
       |deg AS (SELECT vtx, CAST(COUNT(*) AS BIGINT) AS dg FROM
       |  (SELECT lo AS vtx FROM e0 UNION ALL SELECT hi FROM e0) GROUP BY vtx),
       |nbr AS (SELECT lo AS c, hi AS v FROM e0
       |        UNION ALL SELECT hi, lo FROM e0),
       |cn AS (SELECT n1.v AS a, n2.v AS b, CAST(COUNT(*) AS BIGINT) AS common_neighbors
       |  FROM nbr n1 JOIN nbr n2 ON n1.c = n2.c AND n1.v < n2.v
       |  GROUP BY 1, 2),
       |cand AS (SELECT a, b, common_neighbors FROM cn
       |  WHERE NOT EXISTS (SELECT 1 FROM e0 WHERE e0.lo = cn.a AND e0.hi = cn.b))
       |SELECT cand.a, cand.b, cand.common_neighbors,
       |  da.dg * db.dg AS pref_attachment
       |FROM cand JOIN deg da ON da.vtx = cand.a JOIN deg db ON db.vtx = cand.b
       |ORDER BY common_neighbors DESC, pref_attachment DESC, a, b
       |LIMIT 20""".stripMargin

  private def avgNbrDegSql: String =
    s"""WITH $graphCtes,
       |deg AS (SELECT vtx, CAST(COUNT(*) AS BIGINT) AS dg FROM
       |  (SELECT lo AS vtx FROM e0 UNION ALL SELECT hi FROM e0) GROUP BY vtx),
       |nbr AS (SELECT lo AS vtx, hi AS nb FROM e0
       |        UNION ALL SELECT hi, lo FROM e0)
       |SELECT nbr.vtx AS vertex, CAST(COUNT(*) AS BIGINT) AS degree,
       |  CAST((1000000 * SUM(deg.dg)) // COUNT(*) AS BIGINT) AS annd_micro
       |FROM nbr JOIN deg ON deg.vtx = nbr.nb
       |GROUP BY nbr.vtx ORDER BY vertex""".stripMargin

  private def assortativitySql: String =
    s"""WITH $graphCtes,
       |deg AS (SELECT vtx, CAST(COUNT(*) AS BIGINT) AS dg FROM
       |  (SELECT lo AS vtx FROM e0 UNION ALL SELECT hi FROM e0) GROUP BY vtx),
       |bth AS (SELECT lo AS a, hi AS b FROM e0 UNION ALL SELECT hi, lo FROM e0)
       |SELECT round(corr(CAST(da.dg AS DOUBLE), CAST(db.dg AS DOUBLE)), 6)
       |    AS assortativity,
       |  CAST(COUNT(*) AS BIGINT) AS n_endpoints
       |FROM bth JOIN deg da ON da.vtx = bth.a JOIN deg db ON db.vtx = bth.b""".stripMargin

  // Label-propagation oracle: LpRounds synchronous rounds unrolled, each
  // one neighbor-join + per-vertex arg-max (count desc, label asc).
  private def labelPropSql: String = {
    val rounds = (1 to LpRounds).map { i =>
      s"""l$i AS (SELECT vtx, label FROM (
         |  SELECT n.vtx, p.label,
         |    row_number() OVER (PARTITION BY n.vtx
         |      ORDER BY COUNT(*) DESC, p.label ASC) AS rn
         |  FROM nbr n JOIN l${i - 1} p ON p.vtx = n.nb
         |  GROUP BY n.vtx, p.label)
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH $graphCtes,
       |nbr AS (SELECT lo AS vtx, hi AS nb FROM e0
       |        UNION ALL SELECT hi, lo FROM e0),
       |l0 AS (SELECT vtx, vtx AS label FROM v),
       |$rounds
       |SELECT vtx AS vertex, label FROM l$LpRounds ORDER BY vertex""".stripMargin
  }

  private val sessWin = "(PARTITION BY user_id ORDER BY ts, event_id)"
  private val gapUs = GapSeconds * 1000000L

  // PageRank oracle: the fixed iteration count unrolls into chained CTEs
  // (recursive CTEs can't aggregate over their own recursive reference),
  // each mirroring the engine's integer update rule textually.
  private def pageRankSql: String = {
    val its = (1 to PrIters).map { i =>
      s"""it$i AS (SELECT v.vertex,
         |    CAST(150000 + (85 * COALESCE(SUM(p.pr // od.outdeg), 0)) // 100 AS BIGINT) AS pr
         |  FROM v LEFT JOIN e ON e.dst = v.vertex
         |    LEFT JOIN it${i - 1} p ON p.vertex = e.src
         |    LEFT JOIN od ON od.src = e.src
         |  GROUP BY v.vertex)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |v AS (SELECT DISTINCT vertex FROM
       |  (SELECT src AS vertex FROM e UNION ALL SELECT dst FROM e)),
       |od AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY 1),
       |it0 AS (SELECT vertex, CAST(1000000 AS BIGINT) AS pr FROM v),
       |$its
       |SELECT vertex, pr AS pr_micro FROM it$PrIters ORDER BY vertex""".stripMargin
  }

  private def personalizedPageRankSql: String = {
    val its = (1 to PprIters).map { i =>
      s"""it$i AS (SELECT t.vertex,
         |    CAST(t.base + (85 * COALESCE(SUM(p.pr // od.outdeg), 0)) // 100 AS BIGINT) AS pr
         |  FROM t LEFT JOIN e ON e.dst = t.vertex
         |    LEFT JOIN it${i - 1} p ON p.vertex = e.src
         |    LEFT JOIN od ON od.src = e.src
         |  GROUP BY t.vertex, t.base)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |s AS (SELECT DISTINCT c_custkey * 2 AS vertex FROM customer
       |  WHERE c_mktsegment = 'BUILDING'),
       |v AS (SELECT DISTINCT vertex FROM
       |  (SELECT src AS vertex FROM e UNION ALL SELECT dst FROM e
       |   UNION ALL SELECT vertex FROM s)),
       |od AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY 1),
       |t AS (SELECT v.vertex,
       |    CASE WHEN s.vertex IS NOT NULL
       |      THEN ((100 - 85) * 10000 * (SELECT COUNT(*) FROM v)) // (SELECT COUNT(*) FROM s)
       |      ELSE 0 END AS base
       |  FROM v LEFT JOIN s ON s.vertex = v.vertex),
       |it0 AS (SELECT vertex, CAST(base AS BIGINT) AS pr FROM t),
       |$its
       |SELECT vertex, pr AS pr_micro FROM it$PprIters ORDER BY vertex""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(
    "q_graph1" -> pageRankSql,
    "q_graph2" -> personalizedPageRankSql,
    "q_graph3" -> triangleSql,
    "q_graph4" -> lccSql,
    "q_graph5" -> kCoreSql,
    "q_graph6" -> labelPropSql,
    "q_graph7" -> linkPredSql,
    "q_graph8" -> avgNbrDegSql,
    "q_graph9" -> assortativitySql,
    "q_priv1" ->
      """SELECT c_custkey, c_nationkey, c_mktsegment, c_acctbal,
        |  CAST(gc AS BIGINT) AS cohort_size
        |FROM (SELECT c_custkey, c_nationkey, c_mktsegment, c_acctbal,
        |        COUNT(*) OVER (PARTITION BY c_nationkey, c_mktsegment) AS gc
        |      FROM customer)
        |WHERE gc >= 8 ORDER BY c_custkey""".stripMargin,
    "q_sess1" ->
      s"""WITH e AS (
         |  SELECT user_id, event_id, ts,
         |    epoch_us(ts) - lag(epoch_us(ts)) OVER $sessWin AS gap
         |  FROM events),
         |s AS (
         |  SELECT user_id, event_id, ts,
         |    (gap IS NULL OR gap > $gapUs) AS is_session_start
         |  FROM e)
         |SELECT user_id, event_id, ts, is_session_start,
         |  CAST(SUM(CASE WHEN is_session_start THEN 1 ELSE 0 END)
         |    OVER $sessWin AS BIGINT) AS session_seq
         |FROM s ORDER BY user_id, ts, event_id""".stripMargin,

    "q_sess3" ->
      """WITH e AS (SELECT user_id,
        |    CAST(floor(CAST(epoch_us(ts) // 1000000 AS DOUBLE) / 604800.0)
        |      AS BIGINT) AS wk
        |  FROM events),
        |c AS (SELECT user_id, MIN(wk) AS cwk FROM e GROUP BY user_id)
        |SELECT c.cwk AS cohort_week, e.wk - c.cwk AS offset_weeks,
        |  CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
        |FROM e JOIN c ON e.user_id = c.user_id
        |GROUP BY cohort_week, offset_weeks
        |ORDER BY cohort_week, offset_weeks""".stripMargin,

    "q_priv2" ->
      """SELECT c_nationkey,
        |  CAST(COUNT(*) AS BIGINT) AS cohort_size,
        |  CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS distinct_sensitive,
        |  COUNT(DISTINCT c_mktsegment) >= 5 AS diverse
        |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_sess5" ->
      """WITH st AS (SELECT event_type AS to_type,
        |    lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS from_type
        |  FROM events),
        |c AS (SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM st WHERE from_type IS NOT NULL GROUP BY 1, 2),
        |ft AS (SELECT from_type, SUM(n) AS ft FROM c GROUP BY 1)
        |SELECT c.from_type, c.to_type, c.n,
        |  CAST(c.n AS DOUBLE) / CAST(ft.ft AS DOUBLE) AS p
        |FROM c JOIN ft USING (from_type)
        |ORDER BY n DESC, from_type, to_type LIMIT 20""".stripMargin,

    "q_sess7" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        |dau AS (SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active_users
        |  FROM ev GROUP BY 1),
        |ne AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS n_events FROM ev GROUP BY 1),
        |fs AS (SELECT user_id, MIN(day) AS day FROM ev GROUP BY 1),
        |nu AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS new_users FROM fs GROUP BY 1)
        |SELECT ne.day, ne.n_events, dau.active_users,
        |  coalesce(nu.new_users, 0) AS new_users,
        |  dau.active_users - coalesce(nu.new_users, 0) AS returning_users,
        |  CAST(SUM(coalesce(nu.new_users, 0)) OVER (ORDER BY ne.day
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumulative_users
        |FROM ne JOIN dau USING (day) LEFT JOIN nu USING (day)
        |ORDER BY ne.day""".stripMargin,

    "q_sess6" ->
      """WITH st AS (SELECT event_type AS e3,
        |    lag(event_type, 1) OVER w AS e2,
        |    lag(event_type, 2) OVER w AS e1
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT e1, e2, e3, CAST(COUNT(*) AS BIGINT) AS n
        |FROM st WHERE e1 IS NOT NULL
        |GROUP BY 1, 2, 3
        |ORDER BY n DESC, e1, e2, e3 LIMIT 20""".stripMargin,

    "q_dq4" ->
      """WITH pk AS (SELECT l_partkey, COUNT(*) AS c FROM lineitem GROUP BY 1),
        |pp AS (SELECT l_partkey, CAST(c * (c - 1) // 2 AS BIGINT) AS pairs FROM pk),
        |t AS (SELECT SUM(pairs) AS tot FROM pp)
        |SELECT l_partkey, pairs, CAST(t.tot AS BIGINT) AS total_pairs,
        |  CAST(pairs AS DOUBLE) / CAST(t.tot AS DOUBLE) AS share
        |FROM pp, t ORDER BY pairs DESC, l_partkey LIMIT 10""".stripMargin,

    "q_sess4" ->
      """WITH uw AS (SELECT DISTINCT user_id,
        |    CAST(floor(CAST(epoch_us(ts) // 1000000 AS DOUBLE) / 604800.0)
        |      AS BIGINT) AS wk
        |  FROM events),
        |wks AS (SELECT DISTINCT wk AS week FROM uw),
        |wau AS (SELECT wk AS week, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
        |  FROM uw GROUP BY 1),
        |mau AS (SELECT w.week, CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS mau
        |  FROM wks w JOIN uw u ON u.wk BETWEEN w.week - 3 AND w.week
        |  GROUP BY 1)
        |SELECT wau.week AS week, wau.wau, mau.mau,
        |  CAST(wau.wau AS DOUBLE) / CAST(mau.mau AS DOUBLE) AS stickiness
        |FROM wau JOIN mau ON mau.week = wau.week
        |ORDER BY wau.week""".stripMargin,

    "q_sess2" ->
      s"""WITH e AS (
         |  SELECT user_id, event_id, ts, value,
         |    epoch_us(ts) - lag(epoch_us(ts)) OVER $sessWin AS gap
         |  FROM events),
         |s AS (
         |  SELECT user_id, ts, value,
         |    CAST(SUM(CASE WHEN gap IS NULL OR gap > $gapUs THEN 1 ELSE 0 END)
         |      OVER $sessWin AS BIGINT) AS session_seq
         |  FROM e)
         |SELECT user_id, session_seq,
         |  min(ts) AS session_start, max(ts) AS session_end,
         |  COUNT(*) AS n_events,
         |  ${sqlFixedSum("value", 2)} AS value_sum
         |FROM s GROUP BY user_id, session_seq
         |ORDER BY user_id, session_seq""".stripMargin,

    "q_diff2" ->
      """WITH prev AS (
        |  SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 97 <> 0),
        |next AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice
        |  FROM orders WHERE o_orderkey % 89 <> 3),
        |s AS (SELECT o_totalprice, o_orderkey FROM prev
        |  WHERE ((o_orderkey % 1000000) * 2654435761) % 1000000 < 50000),
        |t AS (SELECT o_totalprice,
        |    ntile(8) OVER (ORDER BY o_totalprice, o_orderkey) AS b FROM s),
        |bounds AS (SELECT b, max(o_totalprice) AS hi FROM t WHERE b < 8 GROUP BY b),
        |pa AS (SELECT 1 + (SELECT COUNT(*) FROM bounds WHERE hi < p.o_totalprice) AS bucket,
        |    COUNT(*) AS n_prev FROM prev p GROUP BY 1),
        |pb AS (SELECT 1 + (SELECT COUNT(*) FROM bounds WHERE hi < q.o_totalprice) AS bucket,
        |    COUNT(*) AS n_next FROM next q GROUP BY 1),
        |na AS (SELECT COUNT(*) AS na FROM prev),
        |nb AS (SELECT COUNT(*) AS nb FROM next),
        |bk AS (SELECT unnest(range(1, 9)) AS bucket),
        |w AS (SELECT bk.bucket,
        |    COALESCE(n_prev, 0) AS n_prev, COALESCE(n_next, 0) AS n_next,
        |    CAST(round((CAST(COALESCE(n_next, 0) + 1 AS DOUBLE) / CAST(nb + 8 AS DOUBLE)
        |        - CAST(COALESCE(n_prev, 0) + 1 AS DOUBLE) / CAST(na + 8 AS DOUBLE))
        |      * ln((CAST(COALESCE(n_next, 0) + 1 AS DOUBLE) / CAST(nb + 8 AS DOUBLE))
        |          / (CAST(COALESCE(n_prev, 0) + 1 AS DOUBLE) / CAST(na + 8 AS DOUBLE)))
        |      * 1e6, 0) AS BIGINT) AS term_micro
        |  FROM bk LEFT JOIN pa USING (bucket) LEFT JOIN pb USING (bucket)
        |    CROSS JOIN na CROSS JOIN nb)
        |SELECT CAST(bucket AS BIGINT) AS bucket, CAST(n_prev AS BIGINT) AS n_prev,
        |  CAST(n_next AS BIGINT) AS n_next, term_micro,
        |  CAST((SELECT SUM(term_micro) FROM w) AS DOUBLE) / 1e6 AS psi
        |FROM w ORDER BY bucket""".stripMargin,
    "q_diff1" ->
      """WITH prev AS (
        |  SELECT o_orderkey, o_orderstatus AS old_o_orderstatus,
        |    o_totalprice AS old_o_totalprice
        |  FROM orders WHERE o_orderkey % 97 <> 0),
        |next AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 11 = 0 THEN 'X' ELSE o_orderstatus END AS new_o_orderstatus,
        |    CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1.0 ELSE o_totalprice END AS new_o_totalprice
        |  FROM orders WHERE o_orderkey % 89 <> 3),
        |j AS (
        |  SELECT coalesce(p.o_orderkey, n.o_orderkey) AS o_orderkey,
        |    old_o_orderstatus, old_o_totalprice,
        |    new_o_orderstatus, new_o_totalprice,
        |    p.o_orderkey IS NOT NULL AS in_prev,
        |    n.o_orderkey IS NOT NULL AS in_next
        |  FROM prev p FULL OUTER JOIN next n ON p.o_orderkey = n.o_orderkey)
        |SELECT o_orderkey, old_o_orderstatus, old_o_totalprice,
        |  new_o_orderstatus, new_o_totalprice,
        |  CASE WHEN NOT in_prev THEN 'added'
        |       WHEN NOT in_next THEN 'removed'
        |       ELSE 'changed' END AS change_type
        |FROM j
        |WHERE NOT in_prev OR NOT in_next
        |   OR NOT (old_o_orderstatus IS NOT DISTINCT FROM new_o_orderstatus
        |       AND old_o_totalprice IS NOT DISTINCT FROM new_o_totalprice)
        |ORDER BY o_orderkey""".stripMargin,

    "q_hist1" ->
      (Binning.sqlFixedWidthHistogram("orders", "o_totalprice",
        lo = 0.0, width = 25000.0, nBins = 24) + "\nORDER BY bin"),

    "q_bin1" ->
      """SELECT c_custkey, c_acctbal,
        |  ntile(8) OVER (ORDER BY c_acctbal, c_custkey) AS bucket
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_bin2" ->
      """WITH s AS (
        |  SELECT o_totalprice, o_orderkey FROM orders
        |  WHERE ((o_orderkey % 1000000) * 2654435761) % 1000000 < 50000),
        |t AS (
        |  SELECT o_totalprice,
        |    ntile(8) OVER (ORDER BY o_totalprice, o_orderkey) AS b
        |  FROM s),
        |bounds AS (
        |  SELECT b, max(o_totalprice) AS hi FROM t WHERE b < 8 GROUP BY b)
        |SELECT o.o_orderkey, o.o_totalprice,
        |  1 + (SELECT COUNT(*) FROM bounds WHERE hi < o.o_totalprice) AS bucket
        |FROM orders o ORDER BY o_orderkey""".stripMargin,

    "q_sample10" ->
      s"""WITH toks AS (SELECT source || '|' || lang AS stratum,
        |    CAST(len(${TextDedupQueries.tokSql}) AS BIGINT) AS nt FROM documents),
        |per AS (SELECT stratum, CAST(SUM(nt) AS BIGINT) AS avail
        |        FROM toks GROUP BY stratum),
        |tot AS (SELECT CAST(SUM(nt) AS BIGINT) AS budget FROM toks),
        |${Shared.waterfillSqlTail(2)}""".stripMargin,

    // q_pipe9: the temperature rule replayed in the same integer terms —
    // isqrt weights (floor-of-correctly-rounded-sqrt is exact isqrt at
    // these magnitudes on both engines), integer base/remainder
    // apportionment, windows CAST back to BIGINT (SUM OVER widens to
    // HUGEINT — the r9 representation class).
    "q_pipe9" ->
      s"""WITH toks AS (SELECT source,
        |    CAST(len(${TextDedupQueries.tokSql}) AS BIGINT) AS nt FROM documents),
        |per AS (SELECT source, CAST(SUM(nt) AS BIGINT) AS avail
        |        FROM toks GROUP BY source),
        |b AS (SELECT CAST(SUM(nt) AS BIGINT) // 2 AS budget FROM toks),
        |w AS (SELECT source, avail,
        |        CAST(floor(sqrt(CAST(greatest(avail, 0) AS DOUBLE))) AS BIGINT) AS weight,
        |        budget
        |      FROM per, b),
        |t AS (SELECT *, CAST(SUM(weight) OVER () AS BIGINT) AS tw FROM w),
        |a AS (SELECT source, avail, weight, budget, tw,
        |        CASE WHEN tw > 0 THEN (budget * weight) // tw ELSE 0 END AS base,
        |        CASE WHEN tw > 0 THEN (budget * weight) % tw ELSE 0 END AS rem
        |      FROM t),
        |l AS (SELECT *, budget - CAST(SUM(base) OVER () AS BIGINT) AS leftv,
        |        CAST(row_number() OVER (ORDER BY rem DESC, source) AS BIGINT) AS rk
        |      FROM a),
        |f AS (SELECT source, avail, weight,
        |        CAST(CASE WHEN tw > 0
        |             THEN base + CASE WHEN rk <= leftv THEN 1 ELSE 0 END
        |             ELSE 0 END AS BIGINT) AS alloc
        |      FROM l)
        |SELECT source, avail, weight, alloc,
        |  CAST(alloc AS DOUBLE) / CAST(nullif(avail, 0) AS DOUBLE) AS epochs
        |FROM f ORDER BY source""".stripMargin,

    // q_pipe6: the quality gate changes WHICH tokens are available; the
    // same waterfill chain then plans over the gated counts at half the
    // gated total.
    "q_pipe6" ->
      s"""WITH sc AS (SELECT source || '|' || lang AS stratum,
        |    CAST(len(${TextDedupQueries.tokSql}) AS BIGINT) AS nt,
        |    ${Shared.qualityScoreMicroSql} AS score
        |  FROM documents),
        |gated AS (SELECT stratum, nt FROM sc
        |          WHERE score IS NOT NULL AND score >= 450000),
        |per AS (SELECT stratum, CAST(SUM(nt) AS BIGINT) AS avail
        |        FROM gated GROUP BY stratum),
        |tot AS (SELECT CAST(floor(CAST(SUM(nt) AS DOUBLE) * 0.5) AS BIGINT)
        |          AS budget FROM gated),
        |${Shared.waterfillSqlTail(2)}""".stripMargin,

    "q_sample5" ->
      """WITH h AS (
        |  SELECT doc_id, lang, source,
        |    ((doc_id % 1000000) * 2654435761) % 1000000 AS hk
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, lang, source,
        |    row_number() OVER (PARTITION BY lang ORDER BY hk, doc_id) AS rk,
        |    COUNT(*) OVER (PARTITION BY lang) AS n
        |  FROM h)
        |SELECT doc_id, lang, source FROM r
        |WHERE rk <= ceil(0.2 * n) ORDER BY doc_id""".stripMargin,

    "q_ijoin1" ->
      s"""WITH e AS (
         |  SELECT user_id, event_id, ts, value,
         |    epoch_us(ts) - lag(epoch_us(ts)) OVER $sessWin AS gap
         |  FROM events),
         |s AS (
         |  SELECT user_id, ts,
         |    CAST(SUM(CASE WHEN gap IS NULL OR gap > $gapUs THEN 1 ELSE 0 END)
         |      OVER $sessWin AS BIGINT) AS session_seq
         |  FROM e),
         |sess AS (
         |  SELECT user_id, session_seq,
         |    min(epoch_us(ts)) AS s_us, max(epoch_us(ts)) AS e_us,
         |    user_id % 25 AS k
         |  FROM s GROUP BY user_id, session_seq),
         |anch AS (
         |  SELECT event_id, epoch_us(ts) AS a_us,
         |    epoch_us(ts) + 7200000000 AS a_end, user_id % 25 AS k
         |  FROM events WHERE event_id % 211 = 0)
         |SELECT sess.k, user_id, session_seq, event_id,
         |  least(e_us, a_end) - greatest(s_us, a_us) AS overlap_us
         |FROM sess JOIN anch ON sess.k = anch.k
         |  AND s_us <= a_end AND a_us <= e_us
         |ORDER BY 1, 2, 3, 4""".stripMargin,

    "q_anom1" -> {
      val (z, outlier) = Anomaly.sqlZScores("revenue", scale = 0,
        threshold = 2.0, w = "(PARTITION BY l_suppkey)")
      s"""WITH daily AS (
         |  SELECT l_suppkey, CAST(l_shipdate AS DATE) AS day,
         |    ${sqlFixedSum("l_extendedprice", 2)} AS revenue
         |  FROM lineitem GROUP BY 1, 2)
         |SELECT l_suppkey, day, revenue,
         |  $z AS z,
         |  $outlier AS is_outlier
         |FROM daily ORDER BY l_suppkey, day""".stripMargin
    },

    "q_norm1" ->
      s"""WITH daily AS (
         |  SELECT l_suppkey, CAST(l_shipdate AS DATE) AS day,
         |    ${sqlFixedSum("l_extendedprice", 2)} AS revenue
         |  FROM lineitem GROUP BY 1, 2),
         |v AS (
         |  SELECT l_suppkey, day, revenue,
         |    CAST(round(revenue*100.0, 0) AS BIGINT) AS cents
         |  FROM daily),
         |w AS (
         |  SELECT l_suppkey, day, revenue,
         |    CAST(cents AS DOUBLE) AS cd,
         |    CAST(min(cents) OVER (PARTITION BY l_suppkey) AS DOUBLE) AS mn,
         |    CAST(max(cents) OVER (PARTITION BY l_suppkey) AS DOUBLE) AS mx,
         |    percent_rank() OVER (PARTITION BY l_suppkey ORDER BY revenue, day) AS rev_pr
         |  FROM v)
         |SELECT l_suppkey, day, revenue,
         |  CASE WHEN mx > mn THEN (cd - mn) / (mx - mn) END AS rev_mm,
         |  rev_pr
         |FROM w ORDER BY l_suppkey, day""".stripMargin,

    "q_anom3" ->
      s"""WITH daily AS (
         |  SELECT l_suppkey, CAST(l_shipdate AS DATE) AS day,
         |    ${sqlFixedSum("l_extendedprice", 2)} AS revenue
         |  FROM lineitem GROUP BY 1, 2),
         |a AS (
         |  SELECT l_suppkey, day, revenue,
         |    quantile_cont(CAST(round(revenue*1.0, 0) AS BIGINT), 0.5)
         |      OVER (PARTITION BY l_suppkey) AS med
         |  FROM daily),
         |b AS (
         |  SELECT *, abs(CAST(CAST(round(revenue*1.0, 0) AS BIGINT) AS DOUBLE) - med) AS dev,
         |    quantile_cont(abs(CAST(CAST(round(revenue*1.0, 0) AS BIGINT) AS DOUBLE) - med), 0.5)
         |      OVER (PARTITION BY l_suppkey) AS mad
         |  FROM a)
         |SELECT l_suppkey, day, revenue, med, mad,
         |  CASE WHEN mad > 0.0 THEN dev / mad END AS robust_z,
         |  coalesce(CASE WHEN mad > 0.0 THEN dev > 3.0*mad END, false) AS is_outlier
         |FROM b ORDER BY l_suppkey, day""".stripMargin,

    "q_anom2" ->
      """WITH s AS (
        |  SELECT o_totalprice, o_orderkey FROM orders
        |  WHERE ((o_orderkey % 1000000) * 2654435761) % 1000000 < 50000),
        |t AS (
        |  SELECT o_totalprice,
        |    ntile(100) OVER (ORDER BY o_totalprice, o_orderkey) AS b
        |  FROM s),
        |bounds AS (SELECT b, max(o_totalprice) AS hi FROM t WHERE b < 100 GROUP BY b)
        |SELECT o.o_orderkey, o.o_totalprice,
        |  least(greatest(o.o_totalprice, (SELECT hi FROM bounds WHERE b = 5)),
        |        (SELECT hi FROM bounds WHERE b = 95)) AS o_totalprice_w
        |FROM orders o ORDER BY o_orderkey""".stripMargin,

    "q_mode1" ->
      """WITH c AS (
        |  SELECT l_returnflag, l_linestatus, l_quantity, COUNT(*) AS n
        |  FROM lineitem GROUP BY 1, 2, 3)
        |SELECT l_returnflag, l_linestatus, l_quantity AS mode_qty, n FROM (
        |  SELECT *, row_number() OVER (PARTITION BY l_returnflag, l_linestatus
        |    ORDER BY n DESC, l_quantity) AS rn
        |  FROM c)
        |WHERE rn = 1 ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_corr1" ->
      """WITH daily AS (
        |  SELECT l_suppkey AS k, CAST(l_shipdate AS DATE) AS day,
        |    SUM(CAST(round(l_extendedprice*100.0, 0) AS BIGINT)) AS cents
        |  FROM lineitem WHERE l_suppkey <= 20 GROUP BY 1, 2),
        |p AS (
        |  SELECT a.k AS ka, b.k AS kb, COUNT(*) AS n,
        |    SUM(a.cents) AS sx, SUM(b.cents) AS sy,
        |    SUM(a.cents*b.cents) AS sxy,
        |    SUM(a.cents*a.cents) AS sxx,
        |    SUM(b.cents*b.cents) AS syy
        |  FROM daily a JOIN daily b ON a.day = b.day AND a.k < b.k
        |  GROUP BY 1, 2)
        |SELECT ka, kb, n,
        |  (CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE)) /
        |  (sqrt(CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) *
        |   sqrt(CAST(n AS DOUBLE)*CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))) AS corr_rev
        |FROM p
        |WHERE CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE) > 0.0
        |  AND CAST(n AS DOUBLE)*CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE) > 0.0
        |ORDER BY ka, kb""".stripMargin,
    // lead-lag corr: the shared exact-return CTEs, a generate_series
    // shift join against the one-row-per-day market, then the identical
    // corrFromSums double tree.
    "q_corr2" ->
      s"""WITH ${Shared.supplierMarketReturnsSql},
         |lagged AS (
         |  SELECT s.l_suppkey, s.day_ord, s.x, k.lead_days
         |  FROM sx s, (SELECT CAST(unnest(generate_series(-2, 2)) AS BIGINT) AS lead_days) k
         |  WHERE s.l_suppkey <= 20),
         |p AS (
         |  SELECT l.l_suppkey, l.lead_days, COUNT(*) AS n,
         |    CAST(SUM(l.x) AS BIGINT) AS sx_, CAST(SUM(m.y) AS BIGINT) AS sy_,
         |    CAST(SUM(l.x*m.y) AS BIGINT) AS sxy,
         |    CAST(SUM(l.x*l.x) AS BIGINT) AS sxx,
         |    CAST(SUM(m.y*m.y) AS BIGINT) AS syy
         |  FROM lagged l JOIN my m ON l.day_ord + l.lead_days = m.day_ord
         |  GROUP BY 1, 2)
         |SELECT l_suppkey, lead_days, n,
         |  (CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx_ AS DOUBLE)*CAST(sy_ AS DOUBLE)) /
         |  (sqrt(CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx_ AS DOUBLE)*CAST(sx_ AS DOUBLE)) *
         |   sqrt(CAST(n AS DOUBLE)*CAST(syy AS DOUBLE) - CAST(sy_ AS DOUBLE)*CAST(sy_ AS DOUBLE))) AS xcorr
         |FROM p
         |WHERE CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx_ AS DOUBLE)*CAST(sx_ AS DOUBLE) > 0.0
         |  AND CAST(n AS DOUBLE)*CAST(syy AS DOUBLE) - CAST(sy_ AS DOUBLE)*CAST(sy_ AS DOUBLE) > 0.0
         |ORDER BY l_suppkey, lead_days""".stripMargin,
    // k-fold CV: the q_sample1 Knuth-bucket ladder reduced mod 5, crossed
    // with the round index.
    "q_sample11" ->
      """SELECT r.cv_round, c.c_custkey,
        |  ((c.c_custkey % 1000000) * 2654435761) % 1000000 % 5 AS fold,
        |  CASE WHEN ((c.c_custkey % 1000000) * 2654435761) % 1000000 % 5 = r.cv_round
        |       THEN 'test' ELSE 'train' END AS role
        |FROM customer c,
        |  (SELECT CAST(unnest(generate_series(0, 4)) AS BIGINT) AS cv_round) r
        |ORDER BY r.cv_round, c.c_custkey""".stripMargin,
    // embargoed walk-forward CV: identical integer segment/boundary
    // arithmetic ((d−lo)·5 // w; block start ceil(s·w/5) = (s·w+4)//5).
    "q_sample12" ->
      s"""WITH ${Shared.supplierMarketReturnsSql},
        |b AS (SELECT MIN(day_ord) AS lo,
        |        MAX(day_ord) - MIN(day_ord) + 1 AS w FROM dd),
        |e AS (
        |  SELECT dd.l_suppkey, dd.day_ord, b.lo, b.w,
        |    ((dd.day_ord - b.lo) * 5) // b.w AS seg, r.cv_round
        |  FROM dd, b,
        |    (SELECT CAST(unnest(generate_series(0, 3)) AS BIGINT) AS cv_round) r),
        |f AS (
        |  SELECT l_suppkey, day_ord, CAST(seg AS BIGINT) AS seg, cv_round,
        |    CASE WHEN seg <= cv_round THEN 'train'
        |         WHEN seg = cv_round + 1 THEN
        |           CASE WHEN day_ord - lo < (seg * w + 4) // 5 + 5
        |                THEN 'embargo' ELSE 'test' END
        |    END AS role
        |  FROM e)
        |SELECT cv_round, l_suppkey, day_ord, seg, role
        |FROM f WHERE role IS NOT NULL
        |ORDER BY cv_round, l_suppkey, day_ord""".stripMargin,
    // train-fitted scaling: the shared exact-return CTE, integer 80% cut,
    // exact BIGINT train moments, the identical raw double z tree.
    "q_feat4" ->
      s"""WITH ${Shared.supplierMarketReturnsSql},
         |b AS (SELECT MIN(day_ord) AS lo, MAX(day_ord) AS hi FROM sx),
         |sp AS (
         |  SELECT l_suppkey, day_ord, x,
         |    CASE WHEN day_ord <= lo + ((hi - lo) * 4) // 5
         |         THEN 'train' ELSE 'test' END AS split
         |  FROM sx, b),
         |st AS (
         |  SELECT l_suppkey, COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS sx_,
         |    CAST(SUM(x*x) AS BIGINT) AS sxx
         |  FROM sp WHERE split = 'train' GROUP BY 1)
         |SELECT sp.l_suppkey, sp.day_ord, sp.split, sp.x AS r_micro,
         |  CASE WHEN n >= 2
         |        AND (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
         |             - CAST(sx_ AS DOUBLE)*CAST(sx_ AS DOUBLE))
         |            / (CAST(n AS DOUBLE)*CAST(n - 1 AS DOUBLE)) > 0.0
         |    THEN (CAST(sp.x AS DOUBLE) - CAST(sx_ AS DOUBLE) / CAST(n AS DOUBLE))
         |       / sqrt((CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
         |               - CAST(sx_ AS DOUBLE)*CAST(sx_ AS DOUBLE))
         |              / (CAST(n AS DOUBLE)*CAST(n - 1 AS DOUBLE)))
         |  END AS z
         |FROM sp LEFT JOIN st USING (l_suppkey)
         |ORDER BY sp.l_suppkey, sp.day_ord""".stripMargin,
    // LOO target encoding: exact integer (Σ−x), one raw double division.
    "q_feat1" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_orderpriority,
        |    CAST(round(o_totalprice*100.0, 0) AS BIGINT) AS cents
        |  FROM orders),
        |st AS (
        |  SELECT o_orderpriority, CAST(SUM(cents) AS BIGINT) AS s, COUNT(*) AS n
        |  FROM o GROUP BY 1)
        |SELECT o_orderkey, o.o_orderpriority, cents,
        |  CASE WHEN n > 1
        |    THEN CAST(s - cents AS DOUBLE) / CAST(n - 1 AS DOUBLE) END AS loo_cents
        |FROM o JOIN st USING (o_orderpriority)
        |ORDER BY o_orderkey""".stripMargin,
  )
}
