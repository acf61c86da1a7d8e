package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact duplicated-span detection — the exact-substring complement to
  * whole-document MinHash/SimHash (the dedup-LM observation: training
  * corpora are full of long verbatim spans inside otherwise-distinct
  * documents, which document-level similarity never flags).
  *
  * Shape: positional shingle hashes (one row per token position), ONE
  * equality join on the shingle hash (never doc x doc — same
  * distinct-shingle join as decontamination), then consecutive matches
  * collapse into maximal runs with gaps-and-islands over the match
  * DIAGONAL (pos_a - pos_b): a shared span of L tokens is exactly a run
  * of L - n + 1 consecutive shingle matches on one diagonal. Everything
  * after the join is proportional to |matching shingle pairs|, which the
  * shingle width keeps near the true duplicated volume (an n-gram of 8
  * random words is effectively a content fingerprint).
  */
object SpanDedup {

  /** All maximal cross-document duplicated spans of >= `minSpanTokens`
    * tokens: (id_a, id_b, start_a, start_b, span_tokens) with id_a < id_b
    * and 1-based token start positions.
    *
    * `maxShingleDf`: shingles occurring more than this many times are
    * dropped before the join (`NearDup.dropCrowdedBuckets` — a
    * boilerplate n-gram shared by 100k docs would join quadratically).
    * Dropping a shingle INSIDE a long run splits that run, so the default
    * sits far above any fixture frequency; at corpus scale the cap is the
    * standard exactness-for-boundedness trade. */
  def duplicatedSpans(docs: DataFrame, idCol: String, text: Column,
                      shingleN: Int = 8, minSpanTokens: Int = 16,
                      maxShingleDf: Int = NearDup.DefaultMaxBucketSize,
                      capObs: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    require(shingleN >= 2 && minSpanTokens >= shingleN,
      s"need minSpanTokens ($minSpanTokens) >= shingleN ($shingleN) >= 2")
    // Positional shingle hashes (1-based). __toks is materialized as an
    // attribute first so the 8 element_at references per shingle don't
    // re-tokenize (the Column-tree duplication trap, see NearDup).
    val toks = docs.select(col(idCol).as("__id"), TextOps.tokens(text).as("__toks"))
      .where(size(col("__toks")) >= shingleN)
    val sh = NearDup.dropCrowdedBuckets(
      toks.select(col("__id"),
          posexplode(transform(sequence(lit(1), size(col("__toks")) - (shingleN - 1)),
            i => xxhash64(concat_ws(" ",
              (0 until shingleN).map(o => element_at(col("__toks"), i + o)): _*)))))
        .select(col("__id"), (col("pos") + 1).cast("long").as("__pos"), col("col").as("__h"))
        .localCheckpoint(), // feeds the df-cap count and both join sides
      Seq("__h"), maxShingleDf, capObs)
    val a = sh.select(col("__h"), col("__id").as("id_a"), col("__pos").as("__pa"))
    val b = sh.select(col("__h"), col("__id").as("id_b"), col("__pos").as("__pb"))
    // one hash-partitioned join; collisions on the 64-bit shingle hash are
    // negligible, so runs equal the string formulation the oracle uses
    val matches = a.join(b, Seq("__h"))
      .where(col("id_a") < col("id_b"))
      .withColumn("__diag", col("__pa") - col("__pb"))
    val w = Window.partitionBy("id_a", "id_b", "__diag").orderBy("__pa")
    matches.withColumn("__isl", col("__pa") - row_number().over(w))
      .groupBy("id_a", "id_b", "__diag", "__isl")
      .agg(min("__pa").as("start_a"), min("__pb").as("start_b"),
        (count(lit(1)) + lit(shingleN - 1)).cast("long").as("span_tokens"))
      .where(col("span_tokens") >= minSpanTokens)
      .select("id_a", "id_b", "start_a", "start_b", "span_tokens")
  }

  /** DuckDB CTE stages shared by the span oracles: `spans` holds one row
    * per maximal duplicated span — same shingle strings, same diagonal
    * gaps-and-islands as the operator (no df cap: the operator's default
    * never triggers on the fixtures). `tokSql` must be the SQL twin of
    * `TextOps.tokens`. */
  def spanCtes(tokSql: String, shingleN: Int, minSpanTokens: Int): String = {
    val lastStart = s"len(toks) - ${shingleN - 2}" // range() excludes the bound
    val gram = s"array_to_string(toks[i:i+${shingleN - 1}], ' ')"
    s"""t AS (SELECT doc_id, $tokSql AS toks FROM documents),
       |p AS (SELECT doc_id,
       |        unnest(range(1, $lastStart)) AS pos,
       |        unnest(list_transform(range(1, $lastStart), i -> $gram)) AS g
       |      FROM t WHERE len(toks) >= $shingleN),
       |m AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.pos AS pa, b.pos AS pb
       |      FROM p a JOIN p b ON a.g = b.g AND a.doc_id < b.doc_id),
       |isl AS (SELECT id_a, id_b, pa - pb AS diag, pa, pb,
       |          pa - row_number() OVER (PARTITION BY id_a, id_b, pa - pb ORDER BY pa) AS isl
       |        FROM m),
       |spans AS (SELECT id_a, id_b, CAST(min(pa) AS BIGINT) AS start_a,
       |    CAST(min(pb) AS BIGINT) AS start_b,
       |    CAST(COUNT(*) + ${shingleN - 1} AS BIGINT) AS span_tokens
       |  FROM isl GROUP BY id_a, id_b, diag, isl
       |  HAVING COUNT(*) + ${shingleN - 1} >= $minSpanTokens)""".stripMargin
  }

  /** DuckDB twin of [[duplicatedSpans]] over `documents`. */
  def duplicatedSpansSql(tokSql: String, shingleN: Int, minSpanTokens: Int): String =
    s"""WITH ${spanCtes(tokSql, shingleN, minSpanTokens)}
       |SELECT id_a, id_b, start_a, start_b, span_tokens FROM spans
       |ORDER BY id_a, id_b, start_a, start_b""".stripMargin
}
