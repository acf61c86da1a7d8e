package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank: hub of a star out-ranks its spokes, ranks are exact integers") {
    // star: 1..4 all point at 0; 0 points back at 1 (so 0 is not dangling
    // for mass purposes on the return path)
    val edges = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L), (0L, 1L))
      .toDF("src", "dst")
    val pr = GraphOps.pageRank(edges, "src", "dst", iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr.keySet === Set(0L, 1L, 2L, 3L, 4L))
    assert(pr(0L) > pr(1L), s"hub must out-rank the returned-to spoke: $pr")
    assert(pr(1L) > pr(2L), s"spoke with an in-edge out-ranks pure sources: $pr")
    assert(pr(2L) === pr(3L) && pr(3L) === pr(4L),
      "symmetric pure-source spokes must tie exactly")
    // pure sources receive nothing after iteration 1: exactly the base mass
    assert(pr(2L) === 150000L)
  }

  test("pageRank: a symmetric cycle fixes every vertex at the initial mass") {
    // 3-cycle, outdeg 1 everywhere: pr'(v) = 150000 + 85*pr(u)/100 keeps
    // 1e6 a fixed point (150000 + 850000) — exact under integer division
    val cyc = Seq((0L, 1L), (1L, 2L), (2L, 0L)).toDF("src", "dst")
    val pr = GraphOps.pageRank(cyc, "src", "dst", iterations = 7)
      .collect().map(r => r.getLong(1))
    assert(pr.toSeq === Seq(1000000L, 1000000L, 1000000L))
  }

  test("personalizedPageRank: mass decays with distance from the seed; isolated seeds keep base") {
    // chain 0 -> 1 -> 2 -> 3, seed {0}: proximity must order 1 > 2 > 3;
    // vertex 9 is an isolated seed (no edges) and must still emit its base
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("src", "dst")
    val seeds = Seq(0L, 9L).toDF("v")
    val pr = GraphOps.personalizedPageRank(edges, "src", "dst", seeds, "v",
        iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr.keySet === Set(0L, 1L, 2L, 3L, 9L), "isolated seed present")
    assert(pr(1L) > pr(2L) && pr(2L) > pr(3L),
      s"rank must decay along the chain: $pr")
    // base = 15 * 10000 * 5 vertices / 2 seeds = 375000; non-seeds get 0 base
    assert(pr(0L) === 375000L && pr(9L) === 375000L)
    assert(pr(3L) > 0L, "reachable vertex accumulates seed mass")
  }

  test("pageRank: zero iterations returns the uniform init; determinism across runs") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)).toDF("src", "dst")
    val init = GraphOps.pageRank(edges, "src", "dst", iterations = 0)
      .collect().map(_.getLong(1)).toSet
    assert(init === Set(1000000L))
    val a = GraphOps.pageRank(edges, "src", "dst", iterations = 6)
      .orderBy("vertex").collect().toSeq
    val b = GraphOps.pageRank(edges, "src", "dst", iterations = 6)
      .orderBy("vertex").collect().toSeq
    assert(a === b, "integer arithmetic must be bitwise repeatable")
  }
}
