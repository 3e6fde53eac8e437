package graft

/** Fleet-wide plan regression net: EVERY registered query must plan
  * without a CartesianProduct. Runs at planning time only (no query
  * execution beyond the handful of driver-side index lookups some
  * queries do at construction), so a refactor that silently turns an
  * equi-join into a cross product fails here — not in a 100 TB run.
  *
  * Single-row scalar broadcasts (head-count joins like type_share's
  * total) plan as BroadcastNestedLoopJoin — a broadcast-class cost —
  * and stay allowed; CartesianProduct never is.
  */
class PlanAuditSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("no registered query plans a CartesianProduct") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian plans: ${offenders.mkString(", ")}")
  }
}
