package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Single deployment entry point for everything the engine injects into
  * a Spark session: the [[graft.plans.HourBounds]] optimizer rule
  * (event-table partition-bound derivation) and the native function
  * registry ([[graft.functions.GraftFunctions]]: nsid_valid, did_valid,
  * vec_dot, vec_norm).
  *
  * Cluster-wide:
  *   `--conf spark.sql.extensions=graft.GraftSessionExtensions`
  * Live session (idempotent):
  *   `Graft.install(spark)`
  *
  * The per-concern classes (`graft.plans.GraftExtensions`,
  * `graft.functions.GraftExtensions`) remain for installs that want
  * only one of the two.
  */
class GraftSessionExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    new graft.plans.GraftExtensions()(ext)
    new graft.functions.GraftExtensions()(ext)
  }
}

object Graft {
  /** Install the optimizer rule + planner strategy + function
    * registry on a live session.
    */
  def install(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(graft.plans.HourBounds))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.HourBounds
    if (!spark.experimental.extraStrategies.contains(graft.plans.FenceStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.FenceStrategy
    graft.functions.GraftFunctions.register(spark)
  }
}
