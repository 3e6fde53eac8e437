package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: audit every registered query's physical plan for scale red
  * flags — cartesian products, non-broadcast nested-loop joins over
  * non-trivial inputs, missing whole-stage codegen.
  *
  * Usage: runMain graft.PlanAudit <sfDir>
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.plans.HourBounds
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val qe = fn(spark, sfDir).queryExecution
        qe.toRdd.count() // execute THIS plan so AQE finalizes its stages
        val plan = qe.executedPlan.toString
        val joins = Seq(
          "BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
          "BroadcastNestedLoopJoin", "CartesianProduct")
          .filter(plan.contains)
        val flags = Seq(
          if (plan.contains("CartesianProduct")) Some("CARTESIAN") else None,
          if (!plan.contains("*(")) Some("NO_CODEGEN") else None,
          // the co-location claim: the bucketed join must stay shuffle-free
          if (name == "bucketed_join" && plan.contains("Exchange"))
            Some("BUCKETED_SHUFFLE") else None).flatten
        println(s"[audit] $name joins=${joins.mkString("+")} " +
          (if (flags.nonEmpty) s"FLAGS=${flags.mkString(",")}" else "ok"))
      } catch {
        case e: Throwable => println(s"[audit] $name ERROR ${e.getMessage.take(100)}")
      }
    }
    spark.stop()
  }
}
