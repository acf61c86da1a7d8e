package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Corpus-curation selection operators: per-domain caps (anti-spam — no
  * single crawl domain may dominate the corpus) and global token-budget
  * selection (take the best documents until the training budget is full).
  * Both are deterministic given a total order, so they are reproducible
  * across runs and oracle-checkable.
  */
object Curation {

  /** Keep at most `cap` rows per domain — the best by `order` (pass a
    * fully tie-broken ordering for determinism). The `row_number <= cap`
    * shape compiles to WindowGroupLimit: each map task pre-prunes to its
    * local top-`cap` per domain BEFORE the shuffle, so a hot domain ships
    * ~cap rows per input partition, not its whole row set. */
  def capPerDomain(df: DataFrame, domainCol: Column, cap: Int,
                   order: Column*): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    df.withColumn("__rn",
        row_number().over(Window.partitionBy(domainCol).orderBy(order: _*)))
      .where(col("__rn") <= cap)
      .drop("__rn")
  }

  /** Deterministic weighted sample of `min(k, #rows with weight > 0)`
    * rows, probability proportional to `weightCol` — the quality-weighted
    * corpus cut
    * ("sample 1M documents, preferring high quality scores"). The A-ES
    * scheme (Efraimidis–Spirakis) made key-stable: each row's uniform
    * draw is its key hash, score = ln(u)/w, global top-k by score. Same
    * keys + same weights => same sample, regardless of partitioning or
    * cluster size.
    *
    * Scale shape: scan-speed scoring + a global top-k
    * (TakeOrderedAndProject: each task keeps k rows, the driver merges
    * task heads — no global sort, no single-partition shuffle). `k` must
    * be driver-bounded (it is the output size).
    *
    * Rows with weight <= 0 are EXCLUDED by construction (ln(u)/w is
    * undefined at 0 and order-inverting for negatives — A-ES is defined
    * over positive weights), so when fewer than `k` positive-weight rows
    * exist the sample is SHORT, by the count of eligible rows — callers
    * holding an exact-k contract must check `count` (one cheap aggregate
    * over the k-bounded output) rather than assume it; asserting
    * eligible >= k here would force an extra full-scan action on every
    * call. Rows-only vs the oracle:
    * ln() is transcendental, so cross-engine bit-equality is not
    * guaranteed — property-tested instead (determinism, exact-k, weight
    * monotonicity). */
  def weightedSample(df: DataFrame, keyCol: Column, weightCol: Column,
                     k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val u = (pmod(xxhash64(keyCol), lit(1000000L)).cast("double") + lit(0.5)) / 1e6
    val score = log(u) / weightCol // ln(u)/w: monotone twin of u^(1/w)
    df.where(weightCol > 0)
      .withColumn("__score", score)
      .orderBy(col("__score").desc, keyCol.asc)
      .limit(k)
      .drop("__score")
  }

  /** The maximal prefix of `df` under `order` whose running `weightCol`
    * total stays within `budget` (e.g. pick highest-quality documents
    * until the token budget is spent).
    *
    * Scale shape: a single-partition window over the whole corpus would
    * serialize on one task; instead this is the two-pass global-prefix
    * pattern (same as `Batching.batchByRange`): range-repartition by the
    * order key, per-partition weight totals -> per-partition starting
    * offsets (a `numPartitions`-sized driver array, never data rows),
    * then one partition-local cumulative pass with the offset added.
    * Rows after the budget point are dropped in the same pass. */
  def selectUnderBudget(df: DataFrame, weightCol: String, budget: Long,
                        order: Column*): DataFrame = {
    require(budget >= 0, s"budget must be non-negative, got $budget")
    val spark = df.sparkSession
    val n = spark.sessionState.conf.numShufflePartitions
    // Normalize the weight column to LongType up front: the RDD passes
    // read it via getLong, which throws on a physically-Integer column.
    // Validity (non-null, non-negative) is checked in pass 1, BEFORE any
    // weight is summed into an offset.
    val normalized =
      if (df.schema(weightCol).dataType == LongType) df
      else df.withColumn(weightCol, col(weightCol).cast(LongType))
    val ranged = normalized.repartitionByRange(n, order: _*).sortWithinPartitions(order: _*)
    val wIdx = ranged.schema.fieldIndex(weightCol)
    def weightAt(row: Row): Long = {
      require(!row.isNullAt(wIdx), s"null $weightCol breaks monotone budget cut")
      val w = row.getLong(wIdx)
      require(w >= 0, s"negative weight $w breaks monotone budget cut")
      w
    }
    // pass 1: per-partition totals (tiny: one long per partition)
    val totals = ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
      Iterator.single(pid -> it.map(weightAt).sum)
    }.collect().sortBy(_._1).map(_._2)
    val offsets = totals.scanLeft(0L)(_ + _)
    // pass 2 (reuses pass 1's shuffle files — same lineage): running
    // total + offset, cut at the budget point. Weights are required
    // non-negative, so the running total is monotone and takeWhile is
    // exact; partitions that start past the budget emit nothing.
    val schema = StructType(ranged.schema.fields :+
      StructField("running_total", LongType, nullable = false))
    val rows = ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
      var acc = offsets(pid)
      if (acc >= budget) Iterator.empty
      else it.map { row =>
        acc += weightAt(row)
        (acc, row)
      }.takeWhile(_._1 <= budget)
        .map { case (a, row) => Row.fromSeq(row.toSeq :+ a) }
    }
    spark.createDataFrame(rows, schema)
  }

  /** Token-budget waterfilling over sources — the data-mixture planner:
    * given per-source available token counts and a total training budget,
    * allocate each source min(cap, θ) tokens, where cap = avail ×
    * `maxEpochs` (the repetition ceiling — no source may be epoch'd past
    * it) and the water level θ is chosen so the allocations fill the
    * budget. Small sources saturate at their cap; the rest share the
    * remaining budget equally. This is the allocation rule behind
    * "sample low-resource sources at higher epochs, cap the rest".
    *
    * Exact integer construction (oracle-replicable): sources sorted by
    * cap ascending (ties on `sourceCol`), prefix sums decide the first
    * rank k whose equal share floor((budget − prefix)/(n − k + 1)) fits
    * under its own cap; ranks before k saturate, ranks ≥ k all get that
    * share. Σalloc ≤ budget with deficit < n (floor slack); when budget ≥
    * Σcap every source gets exactly its cap. The division is double
    * floor-division (exact below 2^53 — 9e15 tokens, well past any real
    * budget) because BIGINT `/` means float division in DuckDB too.
    *
    * `budget` must resolve against `perSource` — a literal, or a
    * broadcast one-row total attached by the caller (budgets derived from
    * the corpus itself, e.g. 60% of total tokens).
    *
    * Scale shape: `perSource` is a per-source aggregate — sources-sized
    * BY DEFINITION (tens to thousands of rows), so the entire-frame
    * windows here are a deliberate single-partition pass over a tiny
    * table, after the real work (the corpus-sized token count) reduced
    * upstream.
    *
    * Output: sourceCol, avail, cap, alloc, epochs (alloc/avail, null for
    * empty sources). */
  def waterfillMixture(perSource: DataFrame, sourceCol: String,
                       availCol: String, budget: Column,
                       maxEpochs: Int): DataFrame = {
    require(maxEpochs > 0, s"maxEpochs must be positive, got $maxEpochs")
    val ord = Window.orderBy(col("cap").asc, col(sourceCol).asc)
    val all = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val ranked = perSource
      .select(col(sourceCol), col(availCol).cast("long").as("avail"),
        (col(availCol).cast("long") * lit(maxEpochs.toLong)).as("cap"),
        budget.cast("long").as("__budget"))
      .withColumn("__rn", row_number().over(ord).cast("long"))
      .withColumn("__prefix", coalesce(
        sum(col("cap")).over(ord.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("__n", count(lit(1)).over(all))
      .withColumn("__share", greatest(lit(0L),
        floor((col("__budget") - col("__prefix")).cast("double") /
          (col("__n") - col("__rn") + lit(1L)).cast("double")).cast("long")))
    ranked
      .withColumn("__k",
        min(when(col("__share") <= col("cap"), col("__rn"))).over(all))
      .withColumn("__theta",
        max(when(col("__rn") === col("__k"), col("__share"))).over(all))
      // BOUND (runtime-enforced, r10): perSource is sources-sized by
      // contract; the guard rides the same global window and fails fast
      // if a refactor ever feeds row-scale data through this one task.
      .withColumn("alloc", graft.util.RowBound.guarded(
        when(col("__k").isNull || col("__rn") < col("__k"), col("cap"))
          .otherwise(col("__theta")),
        all, graft.util.RowBound.DimensionScaleRows,
        "Curation.waterfillMixture"))
      .withColumn("epochs",
        col("alloc").cast("double") / nullif(col("avail"), lit(0L)).cast("double"))
      .select(sourceCol, "avail", "cap", "alloc", "epochs")
  }

  /** Temperature-flattened mixture allocation — the OTHER standard
    * data-mixture rule next to [[waterfillMixture]]'s epoch-capped
    * waterfill: source s gets budget share ∝ avail_s^α, the flattening
    * that up-weights low-resource sources (the mT5/XLM-R language-
    * balancing rule). α is pinned to 1/2 (temperature T = 2, the classic
    * operating point) because avail^(1/2) has an EXACT integer form —
    * isqrt — so the whole allocation is engine-exact integer arithmetic
    * (the q_ta3/q_sample6 discipline: no pow(), no double division,
    * nothing for a libm build to flip). `floor(sqrt(toDouble(n)))` IS
    * exact isqrt for n < 2^50: IEEE sqrt is correctly rounded, a
    * non-square's root is irrational and far (≫1 ulp) from the nearest
    * integer at this magnitude, and a perfect square's root is exactly
    * representable.
    *
    * The integer shares use largest-remainder apportionment:
    * base_s = budget·w_s div W, then the leftover budget − Σ base
    * (< #sources when W > 0) goes +1 each to the largest remainders
    * budget·w_s mod W (ties → source name), so Σ alloc == budget
    * exactly. W = 0 (no positive-weight source) allocates nothing.
    * Unlike the waterfill there is deliberately no epoch cap — pure
    * temperature sampling repeats small sources freely; `epochs` is
    * emitted so callers can SEE the repetition rate and cap with
    * [[waterfillMixture]] when that matters.
    *
    * Scale shape: one aggregation reduces the corpus to per-source
    * counts upstream (the sufficient statistic); everything here runs on
    * the dimension-sized source table (two windows + a rank).
    * Overflow bound: budget·w_s must stay < 2^63 — budget 10^12 tokens ×
    * isqrt(10^12) = 10^18 fits. */
  def temperatureMixture(perSource: DataFrame, sourceCol: String,
                         availCol: String, budget: Column): DataFrame = {
    val all = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val remOrd = Window.orderBy(col("__rem").desc, col(sourceCol).asc)
    perSource
      .select(col(sourceCol), col(availCol).cast("long").as("avail"),
        budget.cast("long").as("__budget"))
      .withColumn("weight",
        floor(sqrt(greatest(col("avail"), lit(0L)).cast("double"))).cast("long"))
      .withColumn("__w", sum(col("weight")).over(all))
      .withColumn("__base", when(col("__w") > 0,
        expr("__budget * weight div __w")).otherwise(lit(0L)))
      .withColumn("__rem", when(col("__w") > 0,
        expr("__budget * weight % __w")).otherwise(lit(0L)))
      .withColumn("__left", col("__budget") - sum(col("__base")).over(all))
      .withColumn("__rk", row_number().over(remOrd).cast("long"))
      // BOUND (runtime-enforced, r10): same sources-sized contract as
      // waterfillMixture — guarded on the shared global window.
      .withColumn("alloc", graft.util.RowBound.guarded(
        when(col("__w") > 0,
          col("__base") + when(col("__rk") <= col("__left"), 1L).otherwise(0L))
          .otherwise(lit(0L)),
        all, graft.util.RowBound.DimensionScaleRows,
        "Curation.temperatureMixture"))
      .withColumn("epochs",
        col("alloc").cast("double") / nullif(col("avail"), lit(0L)).cast("double"))
      .select(sourceCol, "avail", "weight", "alloc", "epochs")
  }
}
