package graft.operators

import scala.util.Random
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Seeded-random cross-checks: every round-7 graph metric against a
  * brute-force in-memory model on Erdős–Rényi-ish graphs. Fixture specs
  * pin hand-derivable cases; these sweep irregular shapes (odd components,
  * isolated-ish vertices, degree ties) the crafted graphs can't.
  */
class GraphRandomSpec extends SparkSpec {
  import spark.implicits._

  private def randomGraph(seed: Long, nV: Int, nE: Int): Seq[(Long, Long)] = {
    val r = new Random(seed)
    // raw directed pairs with self-loops/dups — canonicalization is part
    // of what's under test
    Seq.fill(nE)((r.nextInt(nV).toLong, r.nextInt(nV).toLong))
  }

  private def canon(es: Seq[(Long, Long)]): Set[(Long, Long)] =
    es.collect { case (a, b) if a != b => (math.min(a, b), math.max(a, b)) }.toSet

  private def nbrs(c: Set[(Long, Long)]): Map[Long, Set[Long]] =
    (c.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) })
      .groupBy(_._1).map { case (v, e) => v -> e.map(_._2).toSet }

  private val graphs = Seq(
    randomGraph(1L, 30, 120), randomGraph(2L, 12, 20), randomGraph(3L, 50, 400))

  test("triangleCounts equals the brute-force count on random graphs") {
    graphs.foreach { es =>
      val c = canon(es); val n = nbrs(c)
      val brute = n.map { case (v, nv) =>
        v -> nv.toSeq.combinations(2).count {
          case Seq(a, b) => c((math.min(a, b), math.max(a, b)))
          case _ => false
        }.toLong
      }
      val got = GraphOps.triangleCounts(es.toDF("src", "dst"), "src", "dst")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === brute)
    }
  }

  test("kCore: survivors have >= k in-core neighbors and equal the brute peel") {
    graphs.foreach { es =>
      val c = canon(es)
      for (k <- Seq(2, 3, 5)) {
        var cur = c
        var changed = true
        while (changed) {
          val deg = nbrs(cur).map { case (v, nv) => v -> nv.size }
          val keep = deg.filter(_._2 >= k).keySet
          val next = cur.filter { case (a, b) => keep(a) && keep(b) }
          changed = next != cur
          cur = next
        }
        val brute = nbrs(cur).map { case (v, nv) => v -> nv.size.toLong }
        val got = GraphOps.kCore(es.toDF("src", "dst"), "src", "dst", k)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got === brute, s"k=$k")
        got.foreach { case (_, d) => assert(d >= k) }
      }
    }
  }

  test("labelPropagation equals the synchronous brute simulation on random graphs") {
    graphs.foreach { es =>
      val n = nbrs(canon(es))
      var lab = n.keys.map(v => v -> v).toMap
      for (_ <- 1 to 3)
        lab = n.map { case (v, nv) =>
          val counts = nv.toSeq.map(lab).groupBy(identity)
            .map { case (l, g) => (l, g.size) }
          v -> counts.toSeq.minBy { case (l, cnt) => (-cnt, l) }._1
        }
      val got = GraphOps.labelPropagation(es.toDF("src", "dst"), "src", "dst", 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === lab)
    }
  }

  test("linkPrediction candidates are exactly the brute non-adjacent cn>0 pairs") {
    graphs.foreach { es =>
      val c = canon(es); val n = nbrs(c)
      val deg = n.map { case (v, nv) => v -> nv.size.toLong }
      val brute = (for {
        a <- n.keys.toSeq; b <- n.keys.toSeq
        if a < b && !c((a, b))
        cn = (n(a) & n(b)).size.toLong if cn > 0
      } yield (a, b, cn, deg(a) * deg(b)))
        .sortBy { case (a, b, cn, pa) => (-cn, -pa, a, b) }
      val got = GraphOps.linkPrediction(es.toDF("src", "dst"), "src", "dst",
          k = brute.length.max(1))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(got.toSeq === brute)
    }
  }

  test("local evaluation equals the distributed loop for every iterative op (r16 law)") {
    // r16: broadcast-sized graphs run the iterative ops on a collected
    // edge array (the connectedComponents local path, extended). Forcing
    // autoBroadcastJoinThreshold=-1 disables the local path AND the
    // in-loop broadcasts — the distributed shuffle loop — so comparing
    // the two pins bit-identity of the integer recurrences.
    def dist[A](body: => A): A = {
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        body
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
    graphs.foreach { es =>
      val df = es.toDF("src", "dst")
      def m(d: org.apache.spark.sql.DataFrame): Map[Long, Long] =
        d.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val prL = m(GraphOps.pageRank(df, "src", "dst", 5))
      val prD = dist(m(GraphOps.pageRank(df, "src", "dst", 5)))
      assert(prL === prD, "pageRank")
      val seeds = Seq(0L, 3L).toDF("v")
      val pprL = m(GraphOps.personalizedPageRank(df, "src", "dst", seeds, "v", 5))
      val pprD = dist(m(GraphOps.personalizedPageRank(df, "src", "dst", seeds, "v", 5)))
      assert(pprL === pprD, "personalizedPageRank")
      val lpL = m(GraphOps.labelPropagation(df, "src", "dst", 3))
      val lpD = dist(m(GraphOps.labelPropagation(df, "src", "dst", 3)))
      assert(lpL === lpD, "labelPropagation")
      val kcL = m(GraphOps.kCore(df, "src", "dst", 2))
      val kcD = dist(m(GraphOps.kCore(df, "src", "dst", 2)))
      assert(kcL === kcD, "kCore")
    }
  }

  test("avgNeighborDegree equals the brute integer mean on random graphs") {
    graphs.foreach { es =>
      val n = nbrs(canon(es))
      val deg = n.map { case (v, nv) => v -> nv.size.toLong }
      val brute = n.map { case (v, nv) =>
        v -> ((deg(v), (1000000L * nv.toSeq.map(deg).sum) / deg(v)))
      }
      val got = GraphOps.avgNeighborDegree(es.toDF("src", "dst"), "src", "dst")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(got === brute)
    }
  }
}
