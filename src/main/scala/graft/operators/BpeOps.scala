package graft.operators

import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer induction — learning the merge table a
  * subword tokenizer ships with (Sennrich et al.; the training-data
  * pipeline step that turns a corpus into a vocabulary). The reference
  * computes no tokenizer statistics; this is the scale-path extension.
  *
  * Scale shape — the part that matters at 100 TB: the corpus is scanned
  * ONCE into a (word, freq) vocabulary table; after that the corpus is
  * never touched again. When the symbolized vocabulary fits a declared
  * driver budget (it almost always does — production trainers hold the
  * whole word-count table in memory), the merge loop folds DRIVER-SIDE
  * over the collected vocabulary with incrementally-maintained pair
  * counts: any number of merges costs TWO Spark jobs total (the size
  * probe and the collect), not one job per merge. Only an oversized
  * vocabulary falls back to the distributed per-merge loop, whose
  * per-iteration argmax collects ONE scalar decision row. Encoding
  * afterwards is one broadcast join against the corpus: corpus rows never
  * pay the per-word merge loop twice for the same word.
  */
object BpeOps {

  /** How a word becomes its initial symbol sequence. */
  sealed trait Split
  /** UTF-16 code units (Spark's native string unit). An astral-plane
    * character does NOT survive this mode: Spark's `split` on a
    * lookahead regex replaces each surrogate half with `?`, so two
    * distinct emoji can alias. Kept as the default for ASCII-ish
    * corpora and backward compatibility; use [[Utf8Byte]] for
    * multilingual text. */
  case object CodeUnit extends Split
  /** UTF-8 bytes, each rendered as its two-uppercase-hex-digit token
    * ("E2", "82", ...). Lossless for every code point (astral planes
    * included): `unhex(concat(symbols))` decoded as UTF-8 restores the
    * word exactly. This is the byte-level BPE layout (GPT-2 style,
    * modulo the printable-alphabet choice) — merged symbols are just
    * longer hex strings. */
  case object Utf8Byte extends Split

  /** One corpus scan into the (word, freq) vocabulary table. */
  def wordFreq(docs: DataFrame, text: Column): DataFrame =
    docs.select(explode(TextOps.tokens(text)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  // Spark split runs with limit -1, which KEEPS the trailing "" the
  // end-of-string split position produces — filter it, or it becomes a
  // phantom symbol the pair statistics merge against.
  private def initialSymbolsCodeUnit(word: Column) =
    filter(split(word, "(?!^)"), x => x =!= "")

  // hex() of the UTF-8 encoding gives two uppercase hex chars per byte;
  // chunk it. sequence(1, 0) DESCENDS (the IntervalJoin/bigrams pitfall),
  // so the empty word is guarded even though tokens() never emits one.
  private def initialSymbolsUtf8(word: Column) = {
    val h = hex(encode(word, "UTF-8"))
    when(octet_length(word) >= 1,
      transform(sequence(lit(1), octet_length(word)), i => h.substr(i * 2 - 1, lit(2))))
      .otherwise(array().cast("array<string>"))
  }

  /** The initial symbol sequence of a word under `mode`. */
  def initialSymbols(word: Column, mode: Split): Column = mode match {
    case CodeUnit => initialSymbolsCodeUnit(word)
    case Utf8Byte => initialSymbolsUtf8(word)
  }

  // sequence(1, 0) DESCENDS: a fully merged single-symbol word must yield
  // no pairs, not a reversed probe.
  private def adjacentPairs(syms: Column) =
    when(size(syms) >= 2,
      transform(sequence(lit(1), size(syms) - 1), i =>
        struct(element_at(syms, i).as("left"), element_at(syms, i + 1).as("right"))))
      .otherwise(array().cast("array<struct<left:string,right:string>>"))

  /** Greedy leftmost-first merge of one (left, right) pair inside a symbol
    * array — the classic BPE apply step ("aaa" under (a,a) → [aa, a]). */
  private def mergeOnce(syms: Column, left: String, right: String) =
    aggregate(syms, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 && element_at(acc, -1) === lit(left) && x === lit(right),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(left + right))))
        .otherwise(concat(acc, array(x))))

  /** Default driver budget for the in-memory merge fold (estimated JVM
    * footprint of the collected vocabulary, not raw text bytes). */
  val DefaultDriverFoldMaxBytes: Long = 256L << 20

  /** Learn `numMerges` BPE merges from the corpus. Returns the merge table
    * (rank, left, right, pair_count) — deterministic under the
    * (count desc, pair asc) tie-break — and the final symbolized
    * vocabulary (word, freq, symbols). Stops early if no pair occurs
    * twice.
    *
    * When the vocabulary's estimated driver footprint is at most
    * `driverFoldMaxBytes`, the merge loop runs driver-side over the
    * collected (Spark-computed) symbol arrays — bitwise-identical merges
    * (same greedy apply, same tie-break in UTF-8 binary order, which is
    * how Spark orders strings) at 2 Spark jobs total. Above the budget,
    * the distributed loop runs one vocabulary-sized job per merge with a
    * `localCheckpoint` each round (O(1) plan size per iteration) and a
    * single argmax row collected per merge. */
  def learnMerges(docs: DataFrame, text: Column, numMerges: Int,
                  mode: Split = CodeUnit,
                  driverFoldMaxBytes: Long = DefaultDriverFoldMaxBytes)
      : (Seq[(Int, String, String, Long)], DataFrame) = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    val vocab0 = wordFreq(docs, text)
      .withColumn("symbols", initialSymbols(col("word"), mode))
    if (numMerges == 0) return (Seq.empty, vocab0)
    // Size probe: one vocabulary-sized agg. The constants approximate JVM
    // object overhead of (String word, Long, Array[String] symbols) rows;
    // hex mode doubles symbol text, hence the byte-count multiplier.
    val est = vocab0.agg(
      count(lit(1)).as("n"),
      coalesce(sum(octet_length(col("word"))), lit(0L)).as("b")).head()
    val footprint = est.getLong(0) * 96L + est.getLong(1) * 96L
    if (footprint <= driverFoldMaxBytes) learnMergesDriverSide(docs.sparkSession, vocab0, numMerges)
    else learnMergesDistributed(vocab0, numMerges)
  }

  /** Most merges applied per distributed round — bounds the depth of the
    * chained `mergeOnce` aggregates in one projection (analysis stays
    * sane; HOF aggregates are interpreted, so depth is linear eval cost,
    * not codegen blowup) while amortizing a vocabulary-sized job over
    * many merges. */
  private val MaxMergeBatch = 64
  /** Candidate rows collected per round: the decision prefix, not the
    * data (16 KB-ish of driver traffic at typical symbol lengths). */
  private val TopCandidates = 256

  /** The oversized-vocabulary fallback, BATCHED (round 7): instead of one
    * vocabulary-sized job per merge, each round collects the top candidate
    * pairs and applies a PREFIX of symbol-disjoint ones in a single pass —
    * bit-identical to the sequential greedy loop, by construction:
    *
    *  - merging (a,b) only changes counts of pairs sharing a or b, so a
    *    batched pair disjoint from every earlier batched pair keeps its
    *    exact count through the batch;
    *  - a pair newly created by merging (a,b) is count-bounded by an
    *    ORIGINAL pair sharing a symbol with it (every (ab,x) occurrence
    *    was a (b,x) occurrence), and every pair sharing a symbol with the
    *    batch ranks after the batch's stopping point;
    *  - the batch is therefore trimmed to pairs whose count STRICTLY
    *    exceeds the first non-batched count — no interfering pair, old or
    *    new, can reach any batched pair's count, so the sequential argmax
    *    at each step is exactly the next batched pair (same
    *    (count desc, pair asc UTF-8) tie-break Spark's orderBy applies).
    *
    * A tie at the top (trim leaves nothing) falls back to the classic
    * single-argmax step, which is always exact. Worst case (all ties,
    * adversarial) degrades to one merge per round — never wrong, just
    * slower; typical text batches 10+ merges per vocabulary-sized job. */
  private def learnMergesDistributed(vocab0: DataFrame, numMerges: Int)
      : (Seq[(Int, String, String, Long)], DataFrame) = {
    var vocab = vocab0.localCheckpoint()
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 0
    var done = false
    while (!done) {
      val top = vocab
        .select(col("freq"), explode(adjacentPairs(col("symbols"))).as("p"))
        .groupBy(col("p.left"), col("p.right"))
        .agg(sum(col("freq")).as("n"))
        .orderBy(col("n").desc, col("left").asc, col("right").asc)
        .limit(TopCandidates).collect()
      val eligible = top.filter(_.getLong(2) >= 2L)
      if (eligible.isEmpty) done = true // no pair left that occurs twice
      else {
        // greedy prefix of symbol-disjoint pairs, stopping AT the first
        // conflict (skip-and-continue would break the exactness argument)
        val used = mutable.HashSet.empty[String]
        val batch = mutable.ArrayBuffer.empty[(String, String, Long)]
        val cap = math.min(MaxMergeBatch, numMerges - rank)
        var i = 0
        var conflictCount = -1L
        while (conflictCount < 0L && i < eligible.length && batch.length < cap) {
          val r = eligible(i)
          val (l, rt, n) = (r.getString(0), r.getString(1), r.getLong(2))
          if (used.contains(l) || used.contains(rt)) conflictCount = n
          else { batch += ((l, rt, n)); used += l; used += rt; i += 1 }
        }
        // the exactness floor: the count of the first pair NOT in the
        // batch. List exhausted below TopCandidates means every remaining
        // pair counts < 2 (can never win); a full candidate page means
        // unseen pairs may tie its last row.
        val floor =
          if (conflictCount >= 0L) conflictCount
          else if (i < eligible.length) eligible(i).getLong(2)
          else if (eligible.length < top.length || top.length < TopCandidates) 1L
          else top.last.getLong(2)
        var exact = batch.takeWhile(_._3 > floor).toSeq
        if (exact.isEmpty) exact = batch.take(1).toSeq // single argmax: always exact
        exact.foreach { case (l, rt, n) => merges += ((rank, l, rt, n)); rank += 1 }
        vocab = vocab.withColumn("symbols",
          exact.foldLeft(col("symbols")) { case (c, (l, rt, _)) => mergeOnce(c, l, rt) })
          .localCheckpoint()
        done = rank >= numMerges
      }
    }
    (merges.result(), vocab)
  }

  // Spark compares strings as unsigned UTF-8 bytes (UTF8String.compareTo);
  // the driver-side tie-break must match it exactly or the two paths could
  // pick different same-count pairs. java.lang.String.compareTo (UTF-16
  // units) differs above the BMP, so compare encoded bytes.
  private[operators] val utf8BinaryOrder: Ordering[String] = (a: String, b: String) => {
    val x = a.getBytes(UTF_8); val y = b.getBytes(UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    var c = 0
    while (c == 0 && i < n) { c = (x(i) & 0xff) - (y(i) & 0xff); i += 1 }
    if (c != 0) c else x.length - y.length
  }

  /** The in-memory merge fold: pair counts maintained incrementally (only
    * words containing the merged pair are re-scanned), the standard
    * production-trainer shape. Symbols arrive ALREADY split by the Spark
    * expression, so splitter semantics cannot diverge between paths. */
  private def learnMergesDriverSide(spark: SparkSession, vocab0: DataFrame, numMerges: Int)
      : (Seq[(Int, String, String, Long)], DataFrame) = {
    val rows = vocab0.select("word", "freq", "symbols").collect()
    val words = rows.map(_.getString(0))
    val freqs = rows.map(_.getLong(1))
    val syms = rows.map(_.getSeq[String](2).toArray)

    val counts = mutable.HashMap.empty[(String, String), Long]
    val occurs = mutable.HashMap.empty[(String, String), mutable.BitSet]
    def addWord(wi: Int, sign: Long): Unit = {
      val s = syms(wi)
      var i = 0
      while (i < s.length - 1) {
        val p = (s(i), s(i + 1))
        val c = counts.getOrElse(p, 0L) + sign * freqs(wi)
        if (c == 0L) { counts.remove(p); occurs.get(p).foreach(_.remove(wi)) }
        else {
          counts(p) = c
          if (sign > 0) occurs.getOrElseUpdate(p, mutable.BitSet.empty).add(wi)
        }
        i += 1
      }
      // a pair can vanish from this word but survive in others; prune the
      // occurrence index lazily when the merge actually visits it
      if (sign < 0) {
        var j = 0
        while (j < s.length - 1) { occurs.get((s(j), s(j + 1))).foreach(_.remove(wi)); j += 1 }
      }
    }
    syms.indices.foreach(addWord(_, 1L))

    // Greedy leftmost-first apply — must mirror mergeOnce (the Spark
    // aggregate) exactly: merge when the last accepted symbol is `left`
    // and the incoming one is `right`, so "aaaa" under (a,a) → [aa, aa].
    def applyMerge(s: Array[String], l: String, r: String): Array[String] = {
      val out = mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < s.length) {
        if (out.nonEmpty && out.last == l && s(i) == r) out(out.length - 1) = l + r
        else out += s(i)
        i += 1
      }
      out.toArray
    }

    val pairOrder = Ordering.Tuple2(utf8BinaryOrder, utf8BinaryOrder)
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 0
    var done = false
    while (!done && rank < numMerges) {
      // argmax under (count desc, pair asc in UTF-8 binary order) — the
      // exact ordering of the distributed orderBy
      var best: (String, String) = null
      var bestN = 1L // require >= 2: strictly beat 1
      counts.foreach { case (p, n) =>
        if (n > bestN || (n == bestN && best != null && pairOrder.lt(p, best))) {
          best = p; bestN = n
        }
      }
      if (best == null) done = true
      else {
        merges += ((rank, best._1, best._2, bestN))
        val touched = occurs.getOrElse(best, mutable.BitSet.empty).toArray
        touched.foreach { wi =>
          // lazily-pruned index can hold stale entries; re-check adjacency
          val s = syms(wi)
          var has = false
          var i = 0
          while (!has && i < s.length - 1) { has = s(i) == best._1 && s(i + 1) == best._2; i += 1 }
          if (has) {
            addWord(wi, -1L)
            syms(wi) = applyMerge(s, best._1, best._2)
            addWord(wi, 1L)
          }
        }
        rank += 1
      }
    }

    import spark.implicits._
    val vocabOut = words.indices
      .map(i => (words(i), freqs(i), syms(i).toSeq)).toSeq
      .toDF("word", "freq", "symbols")
    (merges.result(), vocabOut)
  }

  /** A learned merge list as a DataFrame (rank, left, right, pair_count). */
  def mergeTable(spark: SparkSession,
                 merges: Seq[(Int, String, String, Long)]): DataFrame = {
    import spark.implicits._
    merges.toDF("rank", "left", "right", "pair_count")
  }

  /** Encode the corpus under a learned tokenizer: per-doc BPE token count
    * (the number a sequence-packing / token-budget step consumes).
    * `symbolizedVocab` is [[learnMerges]]' second result — the final
    * (word, freq, symbols) table, which maps word → token count; corpus
    * words hit it via ONE broadcast join, so the fold over merges never
    * runs at corpus scale. */
  def encodedTokenCounts(docs: DataFrame, idCol: String,
                         text: Column,
                         symbolizedVocab: DataFrame): DataFrame = {
    val lens = symbolizedVocab
      .select(col("word"), size(col("symbols")).cast("long").as("__wtoks"))
    docs.select(col(idCol), explode(TextOps.tokens(text)).as("word"))
      .join(broadcast(lens), Seq("word"))
      .groupBy(idCol)
      .agg(count(lit(1)).cast("long").as("n_words"),
        sum(col("__wtoks")).cast("long").as("n_bpe_tokens"))
  }
}
