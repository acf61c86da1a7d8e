package graft.queries

/** Spark's `xxhash64` re-derived as DuckDB SQL (round 8) — the artifact
  * that flips the MinHash/SimHash dedup family from rows-only to
  * oracle-checked: q_dedup2/3/5/8/12's "engine-specific hash" exclusion
  * was never about secrecy, only about effort — XXH64 is a public
  * algorithm (public-domain reference; Spark pins seed 42 over UTF-8
  * bytes for strings, an 8-byte closed form for longs, a 4-byte form for
  * ints, and a running-seed fold over array elements / multiple args),
  * so the oracle can genuinely recompute every signature, band bucket
  * and SimHash bit from the fixture text.
  *
  * Implementation notes, learned the hard way in the prototype:
  *   - all u64 arithmetic rides HUGEINT mod 2^64; 64×64-bit products
  *     would overflow the signed 128-bit HUGEINT, so multiplication
  *     splits the left operand at 2^32 (two ≤2^96 partials);
  *   - XOR drops to BIGINT bit patterns (sign-adjusted round trip);
  *   - DuckDB expands lateral column aliases TEXTUALLY, so a chained
  *     closed form explodes the planner exponentially — every operation
  *     is staged as its own nested-subquery layer whose expressions
  *     reference only columns of the previous layer ([[Chain]]);
  *   - plain CTEs are inlined at every reference site, so each stage is
  *     declared `AS MATERIALIZED`.
  * Validated byte-for-byte against Spark on strings of every length
  * class (empty / <8 / <32 / stripe multiples / off-by-one / multibyte
  * UTF-8) and on the full five-query chain at sf0.01.
  */
private[queries] object XxhashSql {

  private val MOD = BigInt(1) << 64
  private val HALF = BigInt(1) << 63
  private val P1 = BigInt("9E3779B185EBCA87", 16)
  private val P2 = BigInt("C2B2AE3D27D4EB4F", 16)
  private val P3 = BigInt("165667B19E3779F9", 16)
  private val P4 = BigInt("85EBCA77C2B2AE63", 16)
  private val P5 = BigInt("27D4EB2F165667C5", 16)
  private val Seed = BigInt(42)

  // ---- u64-expression helpers (args must be COLUMN REFS or constants —
  // each is referenced up to 3x in the emitted text)

  private def u2s(x: String): String =
    s"CAST(CASE WHEN ($x) >= $HALF THEN ($x) - $MOD ELSE ($x) END AS BIGINT)"

  private def s2u(x: String): String =
    s"(CASE WHEN ($x) < 0 THEN CAST(($x) AS HUGEINT) + $MOD " +
      s"ELSE CAST(($x) AS HUGEINT) END)"

  private def xoru(a: String, b: String): String =
    s2u(s"xor(${u2s(a)}, ${u2s(b)})")

  private def addu(a: String, b: Any): String = s"((($a) + ($b)) % $MOD)"

  private def mulc(a: String, c: BigInt): String =
    s"(((((($a) // 4294967296) * $c) % 4294967296) * 4294967296" +
      s" + (($a) % 4294967296) * $c) % $MOD)"

  private def rotl(x: String, r: Int): String = {
    val lo = BigInt(1) << (64 - r)
    s"(((($x) % $lo) * ${BigInt(1) << r} + ($x) // $lo) % $MOD)"
  }

  private def shr(x: String, r: Int): String = s"(($x) // ${BigInt(1) << r})"

  /** Nested-subquery staging: each layer's expressions may reference only
    * columns of the previous layer (see the object scaladoc for why). */
  private final class Chain(base: String) {
    var sql: String = s"($base)"
    private var n = 0
    def fresh(pfx: String): String = { n += 1; s"$pfx$n" }
    def layer(defs: (String, String)*): Unit = {
      val cols = defs.map { case (name, e) => s"$e AS $name" }.mkString(", ")
      sql = s"(SELECT *, $cols FROM ${this.sql})"
    }
  }

  /** acc' = rotl31(acc + inp·P2) · P1 — the XXH64 round. */
  private def addRound1(ch: Chain, pfx: String, acc: String, inp: String,
                        out: String): Unit = {
    val t1 = ch.fresh(pfx); ch.layer(t1 -> addu(acc, mulc(inp, P2)))
    val t2 = ch.fresh(pfx); ch.layer(t2 -> rotl(t1, 31))
    ch.layer(out -> mulc(t2, P1))
  }

  /** h' = rotl27(h ⊕ round1(0, lane)) · P1 + P4 — the post-merge lane step. */
  private def addTail8(ch: Chain, pfx: String, h: String, lane: String,
                       out: String): Unit = {
    val k = ch.fresh(pfx); addRound1(ch, pfx, "CAST(0 AS HUGEINT)", lane, k)
    val x = ch.fresh(pfx); ch.layer(x -> xoru(h, k))
    val r = ch.fresh(pfx); ch.layer(r -> rotl(x, 27))
    ch.layer(out -> addu(mulc(r, P1), P4))
  }

  private def addFmix(ch: Chain, pfx: String, h: String, out: String): Unit = {
    val a = ch.fresh(pfx); ch.layer(a -> xoru(h, shr(h, 33)))
    val b = ch.fresh(pfx); ch.layer(b -> mulc(a, P2))
    val c = ch.fresh(pfx); ch.layer(c -> xoru(b, shr(b, 29)))
    val d = ch.fresh(pfx); ch.layer(d -> mulc(c, P3))
    ch.layer(out -> xoru(d, shr(d, 32)))
  }

  /** out = XXH64.hashLong(val, seed) — the closed form Spark uses for
    * LongType children; both args u64 column refs. */
  private def addHashLong(ch: Chain, pfx: String, value: String, seed: String,
                          out: String): Unit = {
    val h0 = ch.fresh(pfx); ch.layer(h0 -> addu(seed, ((P5 + 8) % MOD).toString))
    val k = ch.fresh(pfx); addRound1(ch, pfx, "CAST(0 AS HUGEINT)", value, k)
    val x = ch.fresh(pfx); ch.layer(x -> xoru(h0, k))
    val r = ch.fresh(pfx); ch.layer(r -> rotl(x, 27))
    val hh = ch.fresh(pfx); ch.layer(hh -> addu(mulc(r, P1), P4))
    addFmix(ch, pfx, hh, out)
  }

  /** out = XXH64.hashInt(val, seed) — IntegerType children (band index,
    * permutation index); `value` a nonnegative <2^32 column/const. */
  private def addHashInt(ch: Chain, pfx: String, value: String, seed: String,
                         out: String): Unit = {
    val h0 = ch.fresh(pfx); ch.layer(h0 -> addu(seed, ((P5 + 4) % MOD).toString))
    val m = ch.fresh(pfx)
    ch.layer(m -> s"((CAST($value AS HUGEINT) % 4294967296) * $P1 % $MOD)")
    val x = ch.fresh(pfx); ch.layer(x -> xoru(h0, m))
    val r = ch.fresh(pfx); ch.layer(r -> rotl(x, 23))
    val hh = ch.fresh(pfx); ch.layer(hh -> addu(mulc(r, P2), P3))
    addFmix(ch, pfx, hh, out)
  }

  /** The recursive stripe member: 4 accumulators × one round each. */
  private def stripeStepSql: String = {
    val ch = new Chain(
      "SELECT rstripe.s, rstripe.n, rstripe.si, sl.l0, sl.l1, sl.l2, sl.l3, " +
        "rstripe.v1 AS v1, rstripe.v2 AS v2, rstripe.v3 AS v3, rstripe.v4 AS v4 " +
        "FROM rstripe JOIN slane sl ON sl.s = rstripe.s AND sl.si = rstripe.si")
    for (i <- 0 until 4) addRound1(ch, s"sv${i}_", s"v${i + 1}", s"l$i", s"w${i + 1}")
    s"SELECT s, n, si + 1, w1, w2, w3, w4 FROM ${ch.sql}"
  }

  private def laneStepSql: String = {
    val ch = new Chain(
      "SELECT rlane.s, rlane.n, rlane.li, rlane.h AS h, ln.lv AS lv " +
        "FROM rlane JOIN lane ln ON ln.s = rlane.s AND ln.li = rlane.li " +
        "WHERE rlane.li < rlane.n // 8")
    addTail8(ch, "ls_", "h", "lv", "hn")
    s"SELECT s, n, li + 1, hn FROM ${ch.sql}"
  }

  /** Stripe merge: h = Σ rotl_r(v_i), then 4× h = (h ⊕ round1(0,v))·P1+P4. */
  private def mergedSql: String = {
    val ch = new Chain("SELECT s, n, v1, v2, v3, v4 FROM rstripe WHERE si = n // 32")
    ch.layer("mr1" -> rotl("v1", 1), "mr7" -> rotl("v2", 7),
      "mr12" -> rotl("v3", 12), "mr18" -> rotl("v4", 18))
    ch.layer("mm0" -> s"((mr1 + mr7 + mr12 + mr18) % $MOD)")
    var prev = "mm0"
    for ((v, i) <- Seq("v1", "v2", "v3", "v4").zipWithIndex) {
      val k = ch.fresh("mk_"); addRound1(ch, s"mg${i}_", "CAST(0 AS HUGEINT)", v, k)
      val x = ch.fresh("mx_"); ch.layer(x -> xoru(prev, k))
      val nxt = s"mm${i + 1}"; ch.layer(nxt -> addu(mulc(x, P1), P4))
      prev = nxt
    }
    s"SELECT s, n, $prev AS mh FROM ${ch.sql}"
  }

  /** 4-byte chunk + ≤3 tail bytes + fmix, from t0(s, n, h, o4). */
  private def tailsSql: String = {
    val w4 =
      "COALESCE((SELECT SUM(CAST(v AS HUGEINT) * (CASE pos - t.o4 WHEN 0 THEN 1 " +
        "WHEN 1 THEN 256 WHEN 2 THEN 65536 WHEN 3 THEN 16777216 END)) " +
        "FROM byt WHERE byt.s = t.s AND pos >= t.o4 AND pos < t.o4 + 4), 0)"
    def bat(off: String) =
      "COALESCE((SELECT CAST(v AS HUGEINT) FROM byt " +
        s"WHERE byt.s = t.s AND pos = t.ob$off), 0)"
    val ch = new Chain(
      s"SELECT t.s, t.n, t.h, t.o4, $w4 AS w4v, " +
        "(CASE WHEN t.n % 8 >= 4 THEN t.o4 + 4 ELSE t.o4 END) AS ob FROM t0 t")
    ch.sql = s"(SELECT t.*, ${bat("")} AS b0, ${bat(" + 1")} AS b1, " +
      s"${bat(" + 2")} AS b2 FROM ${ch.sql} t)"
    val m = ch.fresh("t4_"); ch.layer(m -> mulc("w4v", P1))
    val x = ch.fresh("t4_"); ch.layer(x -> xoru("h", m))
    val r = ch.fresh("t4_"); ch.layer(r -> rotl(x, 23))
    ch.layer("h4" ->
      s"(CASE WHEN n % 8 >= 4 THEN ${addu(mulc(r, P2), P3)} ELSE h END)")
    var prev = "h4"
    for (i <- 0 until 3) {
      val m2 = ch.fresh("tb_"); ch.layer(m2 -> mulc(s"b$i", P5))
      val x2 = ch.fresh("tb_"); ch.layer(x2 -> xoru(prev, m2))
      val r2 = ch.fresh("tb_"); ch.layer(r2 -> rotl(x2, 11))
      val nxt = s"ht$i"
      ch.layer(nxt -> s"(CASE WHEN ob + $i < n THEN ${mulc(r2, P1)} ELSE $prev END)")
      prev = nxt
    }
    addFmix(ch, "tf_", prev, "hf")
    s"SELECT s, ${u2s("hf")} AS h FROM ${ch.sql}"
  }

  /** The string-hash CTE block: from `srcCte(s)` to `xxh(s, h)` with
    * h = signed xxhash64(s) — byte table from hex(encode(s)),
    * little-endian 8-byte lanes, the ≥32-byte 4-accumulator stripe
    * recursion, the lane recursion, then chunk/byte tails + fmix.
    * Must sit inside a WITH RECURSIVE. */
  /** Nested-select expression computing Spark's `xxhash64(longCol)`
    * (XXH64.hashLong, seed 42) for every row of `srcSql`, emitted as
    * SIGNED BIGINT column `outCol` alongside the source columns. Wrap in
    * `name AS MATERIALIZED (SELECT * FROM <this>)`. Powers the q_sample6
    * A-ES weighted-sample oracle (key-stable uniform draw = key hash). */
  def hashLongCte(srcSql: String, keyCol: String, outCol: String): String = {
    val ch = new Chain(srcSql)
    ch.layer("hl_k" -> s2u(keyCol))
    addHashLong(ch, "hl_", "hl_k", s"CAST($Seed AS HUGEINT)", "hl_out")
    ch.layer(outCol -> u2s("hl_out"))
    ch.sql
  }

  /** `outCol` = Spark's `xxhash64(k1, k2)` over two BIGINT columns —
    * the multi-child running-seed fold: hashLong(k2, hashLong(k1, 42)).
    * Used by the q_dq7 reconciliation checksums (round 10). */
  def hashLong2Cte(srcSql: String, k1: String, k2: String, outCol: String): String = {
    val ch = new Chain(srcSql)
    ch.layer("h2a_k" -> s2u(k1))
    addHashLong(ch, "h2a_", "h2a_k", s"CAST($Seed AS HUGEINT)", "h2a_out")
    ch.layer("h2b_k" -> s2u(k2))
    addHashLong(ch, "h2b_", "h2b_k", "h2a_out", "h2b_out")
    ch.layer(outCol -> u2s("h2b_out"))
    ch.sql
  }

  def hashStringCtes(srcCte: String): String =
    s"""sb AS MATERIALIZED (SELECT s, octet_length(encode(s)) AS n,
       |  hex(encode(s)) AS hx FROM $srcCte),
       |byt AS MATERIALIZED (
       |  SELECT s, n, pos,
       |    16 * strpos('0123456789ABCDEF', substring(hx, 2 * pos + 1, 1))
       |      + strpos('0123456789ABCDEF', substring(hx, 2 * pos + 2, 1))
       |      - 17 AS v
       |  FROM (SELECT s, n, hx,
       |          CAST(unnest(generate_series(0, CAST(n AS BIGINT) - 1)) AS INTEGER) AS pos
       |        FROM sb WHERE n > 0)),
       |lane AS MATERIALIZED (
       |  SELECT s, n, pos // 8 AS li,
       |    SUM(CAST(v AS HUGEINT) * (CASE pos % 8
       |      WHEN 0 THEN CAST(1 AS HUGEINT) WHEN 1 THEN 256 WHEN 2 THEN 65536
       |      WHEN 3 THEN 16777216 WHEN 4 THEN 4294967296 WHEN 5 THEN 1099511627776
       |      WHEN 6 THEN 281474976710656 WHEN 7 THEN 72057594037927936 END)) AS lv
       |  FROM byt WHERE pos < (n // 8) * 8
       |  GROUP BY s, n, pos // 8),
       |slane AS MATERIALIZED (
       |  SELECT s, n, li // 4 AS si,
       |    MAX(CASE li % 4 WHEN 0 THEN lv END) AS l0,
       |    MAX(CASE li % 4 WHEN 1 THEN lv END) AS l1,
       |    MAX(CASE li % 4 WHEN 2 THEN lv END) AS l2,
       |    MAX(CASE li % 4 WHEN 3 THEN lv END) AS l3
       |  FROM lane WHERE li < (n // 32) * 4
       |  GROUP BY s, n, li // 4),
       |rstripe AS (
       |  SELECT s, n, 0 AS si,
       |    CAST(${(Seed + P1 + P2) % MOD} AS HUGEINT) AS v1,
       |    CAST(${(Seed + P2) % MOD} AS HUGEINT) AS v2,
       |    CAST($Seed AS HUGEINT) AS v3,
       |    CAST(${(Seed - P1 + MOD) % MOD} AS HUGEINT) AS v4
       |  FROM sb WHERE n >= 32
       |  UNION ALL
       |  $stripeStepSql),
       |merged AS MATERIALIZED ($mergedSql),
       |hinit AS MATERIALIZED (
       |  SELECT sb.s, sb.n, (sb.n // 32) * 4 AS li0,
       |    ((CASE WHEN sb.n >= 32 THEN m.mh
       |      ELSE CAST(${(Seed + P5) % MOD} AS HUGEINT) END) + sb.n) % $MOD AS h0
       |  FROM sb LEFT JOIN merged m ON m.s = sb.s),
       |rlane AS (
       |  SELECT s, n, li0 AS li, h0 AS h FROM hinit
       |  UNION ALL
       |  $laneStepSql),
       |t0 AS MATERIALIZED (
       |  SELECT s, n, h, (n // 8) * 8 AS o4 FROM rlane WHERE li = n // 8),
       |xxh AS MATERIALIZED ($tailsSql)""".stripMargin

  // ---- the dedup-family chains ----------------------------------------

  /** CTE block from `documents` to `bandt(doc_id, band, bucket)` and
    * `cpairs(id_a, id_b)` — the exact MinHash-LSH chain of
    * `NearDup.lshCandidatePairs` (3-gram shingles, 32 permutation
    * hashes derived from the shingle's 8-byte base via
    * hashInt(k, hashLong(base, 42)), 8 bands of 4 rows folded through
    * the array-hash running seed, then the (band, bucket) self-join).
    * The crowded-bucket cap is a no-op at fixture scale (≤5k docs vs
    * cap 10000) — asserted by the pair counts matching. */
  def minhashLshCtes(tokSql: String): String = {
    // per distinct shingle: b2 = hashLong(u64(stringHash), 42)
    val chB2 = new Chain(s"SELECT s, ${s2u("h")} AS hu FROM xxh")
    chB2.layer("sd" -> "CAST(42 AS HUGEINT)")
    addHashLong(chB2, "b2_", "hu", "sd", "b2")
    // per (b2, k): the k-th permutation hash, signed
    val chHk = new Chain(
      "SELECT b2, CAST(r.range AS HUGEINT) AS k FROM b2t, range(0, 32) r")
    addHashInt(chHk, "hk_", "k", "b2", "hku")
    // band fold: seed 42 → hashLong over the band's 4 signature values
    // (Spark's array hashing folds elements with the running seed) → the
    // band index as the final IntegerType child
    val chBd = new Chain("SELECT doc_id, band, " +
      (0 until 4).map(j => s"${s2u(s"m$j")} AS u$j").mkString(", ") +
      " FROM sigw")
    chBd.layer("h0" -> "CAST(42 AS HUGEINT)")
    var prev = "h0"
    for (j <- 0 until 4) {
      val out = s"hh$j"; addHashLong(chBd, s"bf${j}_", s"u$j", prev, out)
      prev = out
    }
    addHashInt(chBd, "bi_", "band", prev, "bu")
    s"""doc AS MATERIALIZED (SELECT doc_id, $tokSql AS toks FROM documents),
       |sh0 AS MATERIALIZED (
       |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 1),
       |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS s
       |  FROM doc WHERE len(toks) >= 3),
       |str AS MATERIALIZED (SELECT DISTINCT s FROM sh0),
       |${hashStringCtes("str")},
       |b2t AS MATERIALIZED (SELECT s, b2 FROM ${chB2.sql}),
       |hkt AS MATERIALIZED (
       |  SELECT b2, CAST(k AS INTEGER) AS k, ${u2s("hku")} AS hk FROM ${chHk.sql}),
       |sig AS MATERIALIZED (
       |  SELECT sh0.doc_id, hkt.k, MIN(hkt.hk) AS m
       |  FROM sh0 JOIN b2t ON b2t.s = sh0.s JOIN hkt ON hkt.b2 = b2t.b2
       |  GROUP BY sh0.doc_id, hkt.k),
       |sigw AS MATERIALIZED (
       |  SELECT doc_id, k // 4 AS band,
       |    MAX(CASE k % 4 WHEN 0 THEN m END) AS m0,
       |    MAX(CASE k % 4 WHEN 1 THEN m END) AS m1,
       |    MAX(CASE k % 4 WHEN 2 THEN m END) AS m2,
       |    MAX(CASE k % 4 WHEN 3 THEN m END) AS m3
       |  FROM sig GROUP BY doc_id, k // 4),
       |bandt AS MATERIALIZED (
       |  SELECT doc_id, band, ${u2s("bu")} AS bucket FROM ${chBd.sql}),
       |cpairs AS MATERIALIZED (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bandt a JOIN bandt b
       |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id)""".stripMargin
  }

  /** CTE block from `documents` to `sh(doc_id, simhash, shu)` — the exact
    * SimHash chain of `NearDup.simhash`: token OCCURRENCES, per-token
    * xxhash64, ±1 per-bit sums, bit set where the sum is positive. */
  def simhashCtes(tokSql: String): String = {
    val bitSums = (0 until 64).map(b =>
      s"SUM(CASE WHEN (hu // ${BigInt(1) << b}) % 2 = 1 THEN 1 ELSE -1 END) AS b$b")
      .mkString(",\n    ")
    val shBuild = (0 until 64).map(b =>
      s"(CASE WHEN b$b > 0 THEN CAST(${BigInt(1) << b} AS HUGEINT) ELSE 0 END)")
      .mkString(" + ")
    s"""occ AS MATERIALIZED (
       |  SELECT doc_id, unnest(toks) AS s
       |  FROM (SELECT doc_id, $tokSql AS toks FROM documents)),
       |str AS MATERIALIZED (SELECT DISTINCT s FROM occ),
       |${hashStringCtes("str")},
       |hx2 AS MATERIALIZED (SELECT s, ${s2u("h")} AS hu FROM xxh),
       |sums AS MATERIALIZED (
       |  SELECT occ.doc_id,
       |    $bitSums
       |  FROM occ JOIN hx2 ON hx2.s = occ.s
       |  GROUP BY occ.doc_id),
       |sh AS MATERIALIZED (
       |  SELECT doc_id, ${u2s(s"($shBuild)")} AS simhash, ($shBuild) AS shu
       |  FROM sums)""".stripMargin
  }
}
