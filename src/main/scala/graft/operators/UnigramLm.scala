package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer induction (Kudo 2018 — the SentencePiece-unigram
  * algorithm), the OTHER standard subword trainer next to [[BpeOps]]:
  * where BPE grows a vocabulary bottom-up by merging, unigram starts from
  * a large seed vocabulary and PRUNES top-down under an EM-estimated
  * piece language model. Half of modern pipelines tokenize this way.
  *
  * This implementation is the standard hard-EM (Viterbi-EM)
  * simplification: the E-step uses each word's single best segmentation
  * (max-sum Viterbi over the piece log-probabilities) rather than
  * forward–backward expectations, and pruning drops the multi-character
  * pieces with the lowest Viterbi-count contribution (single characters
  * are never pruned, so coverage is total by construction). Every
  * tie-break is pinned (equal Viterbi score → longer last piece, then
  * lexicographic; equal prune rank → lexicographic), so the learned
  * vocabulary is deterministic for a given corpus.
  *
  * Scale shape (the [[BpeOps]] discipline): the corpus is scanned ONCE
  * into the (word, freq) vocabulary; seeding, EM and pruning then fold
  * DRIVER-SIDE over that vocabulary under the same declared byte budget
  * ([[BpeOps.DefaultDriverFoldMaxBytes]]) — production trainers hold the
  * word-count table in memory, and even a 100 TB corpus's distinct-word
  * table is vocabulary-sized, not corpus-sized. Encoding afterwards never
  * re-runs Viterbi on the corpus: the per-WORD segmentation is computed
  * once on the vocabulary and broadcast-joined onto the docs (unseen
  * words would need an executor-side Viterbi over the broadcast piece
  * table — the same map-side shape, not needed for corpus-closed
  * encoding).
  *
  * No SQL oracle is possible for the LEARNED artifact (the Q-BPE1
  * impossibility class): every EM iteration's segmentation depends on the
  * previous iteration's data-dependent probability estimates, and the
  * prune argmin feeds back into the next E-step — no fixed SQL text can
  * express the loop. The classic-corpus behavior is spec-asserted instead
  * (UnigramLmSpec), and the registered queries are rows-only by design.
  */
object UnigramLm {

  /** A learned piece: its corpus Viterbi count and log-probability under
    * the final EM estimate. */
  final case class Piece(piece: String, count: Long, logp: Double)

  /** Learn a unigram-LM vocabulary of (at most) `targetVocab` pieces.
    *
    * @param seedMultiplier seed vocabulary size as a multiple of the
    *        target (Kudo's "make seed much bigger than final")
    * @param maxPieceLen    longest candidate piece in characters
    * @param emIters        hard-EM iterations per prune round
    * @param pruneFraction  fraction of (prunable) pieces dropped per round
    * @return (pieces sorted by count desc then piece, per-word Viterbi
    *         segmentation of the corpus vocabulary under the final model)
    */
  def learn(docs: DataFrame, text: Column, targetVocab: Int,
            seedMultiplier: Int = 4, maxPieceLen: Int = 8,
            emIters: Int = 2, pruneFraction: Double = 0.25,
            driverFoldMaxBytes: Long = BpeOps.DefaultDriverFoldMaxBytes)
      : (Seq[Piece], Seq[(String, Long, Seq[String])]) = {
    require(targetVocab > 0, s"targetVocab must be positive, got $targetVocab")
    require(maxPieceLen >= 1 && emIters >= 1)
    require(pruneFraction > 0 && pruneFraction < 1)

    val vocabDf = BpeOps.wordFreq(docs, text)
    // budget probe: one vocabulary-sized aggregate, same estimate family
    // as BpeOps (word chars ~2B + ~64B object overhead per row)
    val est = vocabDf.agg(count(lit(1)).as("n"),
      coalesce(sum(length(col("word"))), lit(0L)).as("chars")).head()
    val estBytes = est.getLong(0) * 64L + est.getLong(1) * 2L
    require(estBytes <= driverFoldMaxBytes,
      s"UnigramLm.learn: vocabulary estimate $estBytes B exceeds the " +
        s"driver fold budget $driverFoldMaxBytes B — pre-aggregate or raise it")
    val vocab: Seq[(String, Long)] = vocabDf
      .select(col("word"), col("freq").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      .sortBy(_._1)

    // ---- seed: frequency-weighted substring counts ----------------------
    val subCount = mutable.HashMap.empty[String, Long]
    vocab.foreach { case (w, f) =>
      val n = w.length
      var i = 0
      while (i < n) {
        var len = 1
        while (len <= maxPieceLen && i + len <= n) {
          val p = w.substring(i, i + len)
          subCount(p) = subCount.getOrElse(p, 0L) + f
          len += 1
        }
        i += 1
      }
    }
    val singles = subCount.keysIterator.filter(_.length == 1).toSeq.sorted
    val seedMulti = subCount.iterator.filter(_._1.length > 1).toSeq
      .sortBy { case (p, c) => (-c, p) }
      .take(math.max(0, targetVocab * seedMultiplier - singles.size))
      .map(_._1)
    var pieces: Map[String, Double] = {
      val init = (singles ++ seedMulti).map(p => p -> subCount(p).toDouble)
      val tot = init.map(_._2).sum
      init.map { case (p, c) => p -> math.log(c / tot) }.toMap
    }

    // ---- Viterbi over the current piece model ---------------------------
    def viterbi(w: String): Seq[String] = {
      val n = w.length
      // best(i): (score, lastPieceStart) for prefix of length i
      val score = Array.fill(n + 1)(Double.NegativeInfinity)
      val back = Array.fill(n + 1)(-1)
      score(0) = 0.0
      var i = 1
      while (i <= n) {
        // j ascends from the LONGEST candidate last piece; strict > keeps
        // the first maximizer, which pins the tie-break to "longer last
        // piece wins"
        var j = math.max(0, i - maxPieceLen)
        while (j < i) {
          val p = w.substring(j, i)
          pieces.get(p) match {
            case Some(lp) if score(j) > Double.NegativeInfinity =>
              val s = score(j) + lp
              if (s > score(i)) { score(i) = s; back(i) = j }
            case _ =>
          }
          j += 1
        }
        i += 1
      }
      // singles are always present, so back-tracking always succeeds
      val out = mutable.ListBuffer.empty[String]
      var k = n
      while (k > 0) { val j = back(k); out.prepend(w.substring(j, k)); k = j }
      out.toSeq
    }

    def emCounts(): mutable.HashMap[String, Long] = {
      val c = mutable.HashMap.empty[String, Long]
      vocab.foreach { case (w, f) =>
        viterbi(w).foreach(p => c(p) = c.getOrElse(p, 0L) + f)
      }
      c
    }

    def reestimate(counts: mutable.HashMap[String, Long]): Unit = {
      // zero-count multi-char pieces are unreachable -> drop; singles are
      // floored at count 1 (coverage must survive any estimate)
      val kept = pieces.keysIterator.flatMap { p =>
        val c = counts.getOrElse(p, 0L)
        if (c > 0) Some(p -> c)
        else if (p.length == 1) Some(p -> 1L)
        else None
      }.toSeq
      val tot = kept.map(_._2).sum.toDouble
      pieces = kept.map { case (p, c) => p -> math.log(c / tot) }.toMap
    }

    // ---- EM + prune rounds ----------------------------------------------
    var rounds = 0
    while (pieces.size > targetVocab && rounds < 100) {
      var it = 0
      while (it < emIters) { reestimate(emCounts()); it += 1 }
      val counts = emCounts()
      val multi = pieces.keysIterator.filter(_.length > 1).toSeq
      val overshoot = pieces.size - targetVocab
      if (multi.isEmpty || overshoot <= 0) { rounds = 100 }
      else {
        // per round: a pruneFraction slice of the prunable pieces, never
        // past the overshoot (so the final size lands ON target)
        val k = math.min(overshoot,
          math.max(1, math.ceil(multi.size * pruneFraction).toInt))
          .min(multi.size)
        val drop = multi
          .sortBy(p => (counts.getOrElse(p, 0L), p))
          .take(k).toSet
        pieces = pieces.filterNot { case (p, _) => drop.contains(p) }
      }
      rounds += 1
    }
    // final estimate so emitted logp matches the emitted segmentations
    reestimate(emCounts())
    val finalCounts = emCounts()
    val table = pieces.keysIterator.map { p =>
      Piece(p, finalCounts.getOrElse(p, 0L), pieces(p))
    }.toSeq.sortBy(t => (-t.count, t.piece))
    val seg = vocab.map { case (w, f) => (w, f, viterbi(w)) }
    (table, seg)
  }

  /** The learned piece table as a DataFrame:
    * (rank, piece, vit_count, logp). Rows-only by design (see the
    * impossibility note in the object scaladoc). */
  def pieceTable(spark: SparkSession, pieces: Seq[Piece]): DataFrame = {
    import spark.implicits._
    pieces.zipWithIndex
      .map { case (p, i) => ((i + 1).toLong, p.piece, p.count, p.logp) }
      .toDF("rank", "piece", "vit_count", "logp")
  }

  /** Per-doc token counts under the learned segmentation — the q_bpe2
    * twin: the vocabulary-sized word→n_pieces table broadcast-joins onto
    * the corpus; Viterbi never runs at corpus scale. */
  def encodedTokenCounts(docs: DataFrame, idCol: String, text: Column,
                         spark: SparkSession,
                         seg: Seq[(String, Long, Seq[String])]): DataFrame = {
    import spark.implicits._
    val lens = seg.map { case (w, _, ps) => (w, ps.length.toLong) }
      .toDF("word", "__np")
    docs.select(col(idCol), explode(TextOps.tokens(text)).as("word"))
      .join(broadcast(lens), Seq("word"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("__np")).as("n_unigram_tokens"))
  }
}
