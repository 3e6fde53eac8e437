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

  test("index probes plan zero raw-corpus scans (build once, probe many)") {
    // (pq_rerank_topk is absent by design: the FLAT PQ form reranks
    // against the raw corpus table — ivf_pq_topk is the composition
    // whose rerank reads the index's cell-partitioned vectors instead)
    Seq("ivf_probe", "ivf_probe2", "bm25_topk", "ivf_pq_topk",
      "ivf_pq_residual", "pq_adc_topk").foreach { name =>
      val scans = SparkEntry.queries(name)(spark, sf).queryExecution.sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.rootPaths.map(_.toString)
      }.flatten
      assert(scans.nonEmpty, s"$name: no file scans found")
      assert(!scans.exists(_.contains("testdata")),
        s"$name probe scans the raw corpus: $scans")
    }
  }

  test("rank-heavy queries plan no unpartitioned Window stage") {
    // vocab_zipf ranks via range-partition + offset; inverted_index caps
    // postings via a bounded map-side aggregate — neither may regress to
    // a Window (global or token-partitioned single-task sorts)
    Seq("vocab_zipf", "inverted_index").foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("Window"), s"$name plans a Window stage")
    }
  }
}
