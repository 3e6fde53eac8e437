package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints all three of the bench's machine-speed references on this
  * machine — run it on a quiet VM to (re)derive `Bench.CalibRefSec`,
  * `Bench.JobLatRefSec` and `Bench.MiniCalibRefSec` whenever the bench
  * moves to new hardware. Each reading uses the same estimator the
  * bench itself uses (min of 3 for the full calibration; median for
  * the per-job latency; the mini's min-of-2, medianed over 5 probes).
  */
object CalibProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // discard a JIT-warmup reading first, then report the measurements
    graft.Bench.calibrationSec(spark)
    println(f"calib_sec=${graft.Bench.calibrationSec(spark)}%.3f (Bench.CalibRefSec)")
    println(f"job_lat_sec=${graft.Bench.median(graft.Bench.jobLatencySamples(spark))}%.4f " +
      "(Bench.JobLatRefSec)")
    println(f"mini_calib_sec=${graft.Bench.median(
      (1 to 5).map(_ => graft.Bench.miniCalibrationSec(spark)))}%.3f " +
      "(Bench.MiniCalibRefSec)")
    spark.stop()
  }
}
