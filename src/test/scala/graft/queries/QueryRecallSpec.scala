package graft.queries

import graft.SparkSpec

/** The ANN queries emit recall-vs-ground-truth as a data column
  * (Similarity.withRecallAgainst) — assert the emitted values, not a
  * test-local recomputation, so the floors hold for exactly what the
  * verify/bench artifacts record. */
class QueryRecallSpec extends SparkSpec {
  import spark.implicits._

  private def emitted(name: String): Double = {
    val vals = graft.SparkEntry.queries(name)(spark, sf)
      .select("recall").distinct().as[Double].collect()
    assert(vals.length === 1, s"$name recall must be one constant column, got ${vals.toSeq}")
    vals.head
  }

  test("ANN queries emit constant recall columns above their floors") {
    val r3 = emitted("q_sim3")
    val r6 = emitted("q_sim6")
    val r9 = emitted("q_sim9")
    val r10 = emitted("q_sim10")
    info(f"recall: q_sim3=$r3%.2f q_sim6=$r6%.2f q_sim9=$r9%.2f q_sim10=$r10%.2f")
    Seq(r3, r6, r9, r10).foreach(r => assert(r >= 0.0 && r <= 1.0))
    assert(r6 >= r3, "multi-probe recall must be at least single-probe's")
    // floors sit just under the deterministic fixture values (0.18 /
    // 0.36 / 0.18 at sf0.001 — random vectors have weak neighbors, so
    // absolute recall is structurally low here; the guard is against a
    // regression that silently zeroes the probe)
    assert(r6 >= 0.15, f"multi-probe recall $r6%.2f below floor")
    assert(r9 >= 0.3, f"PQ/ADC recall $r9%.2f below floor")
    assert(r10 >= 0.15, f"IVF-PQ recall $r10%.2f below floor")
  }
}
