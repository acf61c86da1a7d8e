package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer induction — learning the merge table a
  * subword tokenizer ships with (Sennrich et al.; the training-data
  * pipeline step that turns a corpus into a vocabulary). The reference
  * computes no tokenizer statistics; this is the scale-path extension.
  *
  * Scale shape — the part that matters at 100 TB: the corpus is scanned
  * ONCE into a (word, freq) vocabulary table; every merge iteration runs
  * on that vocabulary-sized table only (exactly how production BPE
  * trainers work). The per-iteration argmax collects ONE row to the
  * driver — a scalar decision, like an iterative solver's convergence
  * check — never the data. Encoding afterwards is a vocabulary-sized fold
  * plus one broadcast join against the corpus: corpus rows never pay the
  * per-word merge loop twice for the same word.
  */
object BpeOps {

  /** One corpus scan into the (word, freq) vocabulary table. */
  def wordFreq(docs: DataFrame, text: org.apache.spark.sql.Column): DataFrame =
    docs.select(explode(TextOps.tokens(text)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  // Spark split runs with limit -1, which KEEPS the trailing "" the
  // end-of-string split position produces — filter it, or it becomes a
  // phantom symbol the pair statistics merge against.
  // Unit is the UTF-16 code unit, NOT the code point: an astral-plane
  // character (emoji, rare CJK) splits into its two surrogate halves,
  // which then merge back like any other pair — consistent (encode uses
  // the same split) but not byte-level BPE; swap in a codepoint or UTF-8
  // byte splitter for multilingual corpora.
  private def initialSymbols(word: org.apache.spark.sql.Column) =
    filter(split(word, "(?!^)"), x => x =!= "")

  // sequence(1, 0) DESCENDS (the IntervalJoin/bigrams pitfall): a fully
  // merged single-symbol word must yield no pairs, not a reversed probe.
  private def adjacentPairs(syms: org.apache.spark.sql.Column) =
    when(size(syms) >= 2,
      transform(sequence(lit(1), size(syms) - 1), i =>
        struct(element_at(syms, i).as("left"), element_at(syms, i + 1).as("right"))))
      .otherwise(array().cast("array<struct<left:string,right:string>>"))

  /** Greedy leftmost-first merge of one (left, right) pair inside a symbol
    * array — the classic BPE apply step ("aaa" under (a,a) → [aa, a]). */
  private def mergeOnce(syms: org.apache.spark.sql.Column, left: String, right: String) =
    aggregate(syms, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 && element_at(acc, -1) === lit(left) && x === lit(right),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(left + right))))
        .otherwise(concat(acc, array(x))))

  /** Learn `numMerges` BPE merges from the corpus. Returns the merge table
    * (rank, left, right, pair_count) — deterministic under the
    * (count desc, pair asc) tie-break — and the final symbolized
    * vocabulary (word, freq, symbols). Stops early if no pair occurs
    * twice. The iteration state (the symbolized vocab) is
    * `localCheckpoint`ed each round: O(1) plan size per iteration. */
  def learnMerges(docs: DataFrame, text: org.apache.spark.sql.Column,
                  numMerges: Int): (Seq[(Int, String, String, Long)], DataFrame) = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    var vocab = wordFreq(docs, text)
      .withColumn("symbols", initialSymbols(col("word")))
      .localCheckpoint()
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 0
    var done = numMerges == 0
    while (!done) {
      val top = vocab
        .select(col("freq"), explode(adjacentPairs(col("symbols"))).as("p"))
        .groupBy(col("p.left"), col("p.right"))
        .agg(sum(col("freq")).as("n"))
        .orderBy(col("n").desc, col("left").asc, col("right").asc)
        .limit(1).collect() // ONE row: the argmax decision, not the data
      top.headOption.filter(_.getLong(2) >= 2L) match {
        case Some(r) =>
          val (l, rt, n) = (r.getString(0), r.getString(1), r.getLong(2))
          merges += ((rank, l, rt, n))
          vocab = vocab.withColumn("symbols", mergeOnce(col("symbols"), l, rt))
            .localCheckpoint()
          rank += 1
          done = rank >= numMerges
        case None => done = true // no pair left that occurs twice
      }
    }
    (merges.result(), vocab)
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
                         text: org.apache.spark.sql.Column,
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
