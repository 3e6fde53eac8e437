package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints [[graft.Bench.calibrationSec]] on this machine — run it on a
  * quiet VM to (re)derive `Bench.CalibRefSec` whenever the bench moves
  * to new hardware. The reading is the min of three runs of the fixed
  * workload, the same estimator the bench itself uses.
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
    // discard a JIT-warmup reading first, then report the measurement
    graft.Bench.calibrationSec(spark)
    println(f"calib_sec=${graft.Bench.calibrationSec(spark)}%.3f")
    spark.stop()
  }
}
