package graft.query

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

import graft.SparkSpec

/** Plan-shape regression guards: the properties that make the headline
  * queries scale (predicate pushdown to parquet, pruned read schemas)
  * asserted on the executed plans, so a refactor that silently drops
  * them fails here instead of at 100 TB.
  */
class PushdownSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Execute (finalizing AQE) and collect scans through adaptive/stage
    * wrappers, which `collect` does not descend into.
    */
  private def scans(df: org.apache.spark.sql.DataFrame): Seq[FileSourceScanExec] = {
    df.count()
    def go(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
      case f: FileSourceScanExec => Seq(f)
      case a: AdaptiveSparkPlanExec => go(a.executedPlan)
      case q: QueryStageExec => go(q.plan)
    }.flatten
    go(df.queryExecution.executedPlan)
  }

  test("replay_scan: cursor predicate reaches the parquet scan on the raw ts column") {
    val scan = scans(EventQueries.replayScan(spark, sf)).head
    val pushed = scan.metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("GreaterThanOrEqual(ts"), s"got: $pushed")
  }

  test("subscribe_filter: all three conjuncts pushed") {
    val scan = scans(EventQueries.subscribeFilter(spark, sf)).head
    val pushed = scan.metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("In(event_type") && pushed.contains("In(user_id") &&
      pushed.contains("GreaterThanOrEqual(ts"), s"got: $pushed")
  }

  test("eventsRange pushes the range on the legacy Long-ns generation too") {
    // The other fixture generation: ts visible as LongType nanoseconds
    // (TIMESTAMP(NANOS) under the nanosAsLong conf reads the same way).
    import org.apache.spark.sql.functions.{col, expr}
    val dir = java.nio.file.Files.createTempDirectory("graft-legacy-gen").toString
    spark.range(0, 1000)
      .selectExpr("id as event_id", "(1704067200000000 + id * 1000000) * 1000 as ts",
        "id % 7 as user_id", "'click' as event_type", "cast(id as double) as value",
        "'{}' as props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val fromUs = 1704067200000000L + 500L * 1000000
    val df = graft.Tables.eventsRange(spark, dir, fromUs = Some(fromUs))
    assert(df.count() === 500)
    val scan = scans(graft.Tables.eventsRange(spark, dir, fromUs = Some(fromUs))).head
    val pushed = scan.metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("GreaterThanOrEqual(ts"), s"got: $pushed")
    // and the returned domain is identical to the current generation's
    assert(df.agg(expr("min(ts)")).head.getLong(0) === fromUs * 1000L)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("q1: scan reads only the columns the aggregation needs") {
    val scan = scans(RelationalQueries.q1PricingSummary(spark, sf)).head
    val schema = scan.metadata.getOrElse("ReadSchema", "")
    assert(!schema.contains("l_comment") && !schema.contains("l_orderkey"),
      s"column pruning lost: $schema")
    assert(schema.contains("l_returnflag") && schema.contains("l_quantity"))
  }

  test("topk_parts plans as TakeOrderedAndProject (no global sort materialization)") {
    val plan = RelationalQueries.topkParts(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"got:\n$plan")
  }

  test("q6: every conjunct reaches the parquet scan; no row-data shuffle") {
    val scan = scans(RelationalQueries.q6ForecastRevenue(spark, sf)).head
    val pushed = scan.metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("GreaterThanOrEqual(l_shipdate") &&
      pushed.contains("LessThan(l_shipdate") &&
      pushed.contains("GreaterThanOrEqual(l_discount") &&
      pushed.contains("LessThan(l_quantity,24.0)"), s"got: $pushed")
  }

  test("q19: per-side residuals of the disjunction push below the join") {
    val df = RelationalQueries.q19Disjunctive(spark, sf)
    val ss = scans(df)
    // lineitem side: the quantity-range hull of the three OR branches
    val liPushed = ss.map(_.metadata.getOrElse("PushedFilters", ""))
      .find(_.contains("l_quantity")).getOrElse("")
    assert(liPushed.contains("Or(") && liPushed.contains("l_quantity"), s"got: $liPushed")
    // part side: the brand/size residual, and the dim broadcasts
    val pPushed = ss.map(_.metadata.getOrElse("PushedFilters", ""))
      .find(_.contains("p_brand")).getOrElse("")
    assert(pPushed.contains("EqualTo(p_brand,Brand#1)"), s"got: $pPushed")
    assert(df.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }

  test("above_avg_orders: correlated scalar subquery decorrelates to agg+join") {
    val df = RelationalQueries.aboveAvgOrders(spark, sf)
    df.count() // finalize AQE
    val plan = df.queryExecution.executedPlan.toString
    // Catalyst must rewrite the per-row subquery into a join against a
    // pre-aggregated per-customer average — no nested-loop re-execution
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"got:\n$plan")
    assert(Seq("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin")
      .exists(plan.contains), s"no equi-join in:\n$plan")
    assert(plan.contains("HashAggregate"), s"no aggregate in:\n$plan")
  }

  test("quality_lang_gate: per-stratum thresholds broadcast to the gate join") {
    val df = graft.ext.ExtQueries.qualityLangGate(spark, sf)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"got:\n$plan")
  }

  test("q3: filtered customer dim broadcasts; lineitem never broadcasts") {
    val df = RelationalQueries.q3TopRevenue(spark, sf)
    df.count() // finalize AQE
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"got:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }
}
