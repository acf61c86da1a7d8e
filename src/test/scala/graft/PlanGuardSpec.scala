package graft

/** Global plan guard: NO registered query may plan a CartesianProduct —
  * the one join shape that is never right at 100 TB (the engine's
  * broadcast-scalar crossJoins plan as BroadcastNestedLoopJoin over a
  * 1-row build side, which is bounded and allowed; an actual cartesian is
  * a quadratic accident). Sweeping every SparkEntry entry catches a
  * future query or operator edit that silently loses its equi-join keys
  * (e.g. a renamed column turning a hash join into a cross product).
  */
class PlanGuardSpec extends SparkSpec {

  test("no registered query plans a CartesianProduct") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        // building the frame is enough: executedPlan is the physical plan
        // before any job runs (memoized shared builds do execute — tiny
        // at sf0.001)
        val plan = fn(spark, sf).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"queries planning a CartesianProduct: ${offenders.mkString(", ")}")
  }
}
