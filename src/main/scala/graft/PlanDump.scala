package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan and warm/cold timings for
  * one or more registered queries, with a per-job trace (job id, duration,
  * description/call site) so a query's Spark-job budget is readable
  * without the UI.
  *
  * Usage: runMain graft.PlanDump <sfDir> <queryName> [queryName...]
  * Env:   SPARK_GRAFT_PLAN_OUT=<dir>  also write each query's formatted
  *        plan to <dir>/<query>.txt (the plans/r18 deliverable).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.plans.HourBounds
    spark.sparkContext.setLogLevel("WARN")
    // per-run index root, same as Bench: probe queries build here once
    System.setProperty("graft.index.dir",
      sys.env.getOrElse("SPARK_GRAFT_PLAN_INDEX",
        java.nio.file.Files.createTempDirectory("graft-plan-index").toString))

    // job trace: id → (start ns, description)
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    @volatile var trace = List.empty[String]
    @volatile var tracing = false
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(js.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("")
        starts.put(js.jobId, (System.nanoTime(), desc)); ()
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val s = starts.remove(je.jobId)
        if (tracing && s != null) {
          val dt = (System.nanoTime() - s._1) / 1e6
          trace ::= f"    job ${je.jobId}%4d  $dt%8.1f ms  ${s._2}"
        }
      }
      // stage-level: tasks, wall, summed executor run time — tells a
      // serial stage (1 task / compile-bound) from a wide one at a glance
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        if (tracing) {
          val si = sc.stageInfo
          val wall = (for {s <- si.submissionTime; c <- si.completionTime}
            yield c - s).getOrElse(-1L)
          val run = si.taskMetrics.executorRunTime
          trace ::= f"      stage ${si.stageId}%4d  ${si.numTasks}%4d tasks  " +
            f"wall $wall%6d ms  exec $run%6d ms  ${si.name.takeWhile(_ != '(')}"
        }
      }
    })

    val planOut = sys.env.get("SPARK_GRAFT_PLAN_OUT")
    planOut.foreach(d => new java.io.File(d).mkdirs())
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      println(s"===== $name =====")
      val df = fn(spark, sfDir)
      df.explain("formatted")
      planOut.foreach { d =>
        val qe = df.queryExecution
        java.nio.file.Files.write(
          java.nio.file.Paths.get(d, s"$name.txt"),
          qe.explainString(org.apache.spark.sql.execution.FormattedMode)
            .getBytes("UTF-8"))
      }
      for (i <- 1 to 3) {
        spark.catalog.clearCache(); System.gc()
        trace = Nil; tracing = i == 3
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        if (tracing) {
          tracing = false
          // brief settle so async listener events drain
          Thread.sleep(200)
          println(s"  jobs of run$i:")
          trace.reverse.foreach(println)
        }
        println(f"[$name] run$i: $dt%.2fs rows=$n")
      }
    }
    spark.stop()
  }
}
