package graft

import org.apache.spark.sql.SparkSession

/** Bench-inflation diagnostic (VERDICT r12 #1): the r12 driver run timed
  * the untouched shared query set ~1.3× slower raw than r11 while the
  * run's own noise_factor read 1.09 — and the per-query pattern was
  * BURSTY (adjacent heavy queries at 1.01× and 1.55×), not uniform.
  * This main separates the two candidate explanations:
  *
  *   (a) external load bursts landing between the per-segment probe
  *       points (probes sample at segment START, every 8 queries; a
  *       burst arriving mid-segment inflates queries but not the
  *       already-taken probe), vs
  *   (b) real cumulative overhead that grows with the number of
  *       registered queries (codegen/code-cache churn, class loading,
  *       GC pressure at 119 queries).
  *
  * Protocol: the full registered set runs TWICE in one JVM — pass A in
  * registry order, pass B in seeded-shuffled order — one timed rep per
  * query under the bench's clean-slate protocol, per-segment λ/mini
  * probes exactly like Bench, and JVM counters (GC time, JIT time,
  * classes loaded, CodeHeap + Metaspace usage) snapshotted at pass
  * boundaries. If (b) is real, pass B (running after ~119 queries of
  * accumulated codegen) is systematically slower than pass A and the
  * counters show a mechanism (e.g. code-cache exhaustion). If (a), the
  * passes agree in total while individual queries jitter, and the A/B
  * per-query disagreement distribution IS the machine's single-rep
  * jitter floor — the number PERF.md needs to interpret round-over-round
  * raw deltas.
  */
object BenchDoctor {

  private def jvmCounters(): Map[String, Double] = {
    import java.lang.management.ManagementFactory
    import scala.jdk.CollectionConverters._
    val gc = ManagementFactory.getGarbageCollectorMXBeans.asScala
    val pools = ManagementFactory.getMemoryPoolMXBeans.asScala
    def poolUsed(fragment: String): Double =
      pools.filter(_.getName.contains(fragment)).map(_.getUsage.getUsed.toDouble).sum / 1048576.0
    Map(
      "gc_count" -> gc.map(_.getCollectionCount).sum.toDouble,
      "gc_ms" -> gc.map(_.getCollectionTime).sum.toDouble,
      "jit_ms" -> ManagementFactory.getCompilationMXBean.getTotalCompilationTime.toDouble,
      "classes_loaded" -> ManagementFactory.getClassLoadingMXBean.getTotalLoadedClassCount.toDouble,
      "classes_unloaded" -> ManagementFactory.getClassLoadingMXBean.getUnloadedClassCount.toDouble,
      "codeheap_mb" -> poolUsed("CodeHeap"),
      "metaspace_mb" -> poolUsed("Metaspace"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.plans.HourBounds
    spark.sparkContext.setLogLevel("WARN")
    System.setProperty("graft.index.dir",
      java.nio.file.Files.createTempDirectory("graft-doctor-index").toString)

    // same warmup + prebuild posture as Bench.main
    val warmDir = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, warmDir).count() catch { case _: Throwable => () }
    }
    try SparkEntry.queries("bucketed_join")(spark, sfDir).count()
    catch { case _: Throwable => () }
    System.setProperty("graft.index.dir",
      java.nio.file.Files.createTempDirectory("graft-doctor-index").toString)
    Seq("bm25_topk", "ivf_probe", "ivf_probe2", "ivf_probe_kmeans").foreach { n =>
      SparkEntry.queries.get(n).foreach(fn =>
        try fn(spark, sfDir).count() catch { case _: Throwable => () })
    }

    def cleanSlate(): Unit = { spark.catalog.clearCache(); System.gc() }

    /** One pass over `names`: per-query single timed rep + the bench's
      * per-segment probes. Returns (times, segFactors, segLambdas,
      * perQuerySegIdx).
      */
    def pass(names: Seq[String]): (Map[String, Double], Seq[Double], Seq[Double], Map[String, Int]) = {
      val times = scala.collection.mutable.LinkedHashMap.empty[String, Double]
      val segF = scala.collection.mutable.ListBuffer.empty[Double]
      val segL = scala.collection.mutable.ListBuffer.empty[Double]
      val segOf = scala.collection.mutable.Map.empty[String, Int]
      names.zipWithIndex.foreach { case (name, i) =>
        if (i % Bench.CalibEveryQueries == 0) {
          segL += math.max(Bench.median(Bench.jobLatencySamples(spark, 4)), 1e-4)
          segF += Bench.miniCalibrationSec(spark) / Bench.MiniCalibRefSec
        }
        segOf(name) = segF.length - 1
        val fn = SparkEntry.queries(name)
        cleanSlate()
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); () } catch { case _: Throwable => () }
        times(name) = (System.nanoTime() - t0) / 1e9
      }
      (times.toMap, segF.toSeq, segL.toSeq, segOf.toMap)
    }

    // FOCUS mode (`runMain graft.BenchDoctor focus <reps> <name...>`):
    // the per-query churn-vs-regression adjudicator — N interleaved
    // single reps of just the named queries in one warmed JVM. The MIN
    // is the churn-free estimate (JIT storms and GC pauses only ever
    // ADD time); a min matching the historical clean reading says the
    // bench's higher number was churn, a min at the elevated reading
    // says the constant is real.
    if (args.headOption.contains("focus")) {
      val reps = args.lift(1).map(_.toInt).getOrElse(7)
      val names = args.drop(2).toSeq
      require(names.nonEmpty && names.forall(SparkEntry.queries.contains),
        s"focus mode needs registered query names, got: ${names.mkString(",")}")
      val samples = names.map(_ -> scala.collection.mutable.ListBuffer.empty[Double]).toMap
      (1 to reps).foreach { rep =>
        names.foreach { n =>
          cleanSlate()
          val t0 = System.nanoTime()
          SparkEntry.queries(n)(spark, sfDir).count()
          val sec = (System.nanoTime() - t0) / 1e9
          samples(n) += sec
          println(f"[doctor] rep $rep $n%-24s $sec%.2fs")
        }
      }
      val cEnd = jvmCounters()
      names.foreach { n =>
        val xs = samples(n).sorted
        println(f"[doctor] FOCUS $n%-24s min=${xs.head}%.2f " +
          f"med=${xs(xs.size / 2)}%.2f max=${xs.last}%.2f over $reps reps")
      }
      println(s"[doctor] counters end: " +
        cEnd.toSeq.sortBy(_._1).map { case (k, v) => f"$k=$v%.0f" }.mkString(" "))
      spark.stop()
      return
    }

    val order = SparkEntry.queries.keys.toSeq
    val shuffled = new scala.util.Random(13).shuffle(order)

    val c0 = jvmCounters()
    val (ta, fa, la, sa) = pass(order)
    val c1 = jvmCounters()
    val (tb, fb, lb, sb) = pass(shuffled)
    val c2 = jvmCounters()

    def j(m: Map[String, Double]): String =
      m.toSeq.sortBy(_._1).map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    def jarr(xs: Seq[Double]): String = xs.map(x => f"$x%.3f").mkString("[", ",", "]")
    def jint(m: Map[String, Int]): String =
      m.toSeq.sortBy(_._1).map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val out =
      s"""{"sf":"$sfDir","n_queries":${order.size},
         |"pass_a_total":${ta.values.sum},"pass_b_total":${tb.values.sum},
         |"pass_a":${j(ta)},"pass_b":${j(tb)},
         |"seg_factors_a":${jarr(fa)},"seg_factors_b":${jarr(fb)},
         |"seg_lambda_a":${jarr(la)},"seg_lambda_b":${jarr(lb)},
         |"seg_of_a":${jint(sa)},"seg_of_b":${jint(sb)},
         |"counters_start":${j(c0)},"counters_mid":${j(c1)},"counters_end":${j(c2)}}""".stripMargin.replace("\n", "")
    val path = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_DOCTOR_OUT", "/tmp/bench_doctor.json"))
    java.nio.file.Files.write(path, (out + "\n").getBytes("UTF-8"))
    println(s"[doctor] wrote $path  passA=${ta.values.sum}  passB=${tb.values.sum}")
    spark.stop()
  }
}
