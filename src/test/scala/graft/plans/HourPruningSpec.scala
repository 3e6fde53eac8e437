package graft.plans

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.store.EventsTable

/** The HourBounds optimizer rule: raw time_us predicates gain
  * event_hour partition bounds — partition pruning without the caller
  * spelling the layout invariant out.
  */
class HourPruningSpec extends SparkSpec {
  import spark.implicits._

  private def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec =
    df.queryExecution.executedPlan.collect { case f: FileSourceScanExec => f }.head

  test("time_us range filter partition-prunes once the rule is installed") {
    val path = tmpDir("hour-prune")
    EventsTable.append(
      (0L until 6L).map(h => (h * EventsTable.HourUs + 1, s"did$h", "c"))
        .toDF("time_us", "did", "collection"),
      path)

    val cursor = 4 * EventsTable.HourUs
    def query = spark.read.parquet(path).filter(col("time_us") >= cursor)

    // own the precondition: another suite (e.g. ServiceSpec via
    // Graft.install) may have left the rule on the shared session
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == HourBounds)

    // without the rule: the raw predicate reaches the scan as a data
    // filter only — every hour partition is listed
    val before = scanOf(query)
    assert(before.partitionFilters.isEmpty)

    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ HourBounds
    try {
      val after = scanOf(query)
      assert(after.partitionFilters.nonEmpty, "derived event_hour bound must reach the scan")
      val filesRead = after.relation.location
        .listFiles(after.partitionFilters, after.dataFilters).map(_.files.size).sum
      assert(filesRead == 2, s"hours 4,5 only — read $filesRead files")
      // rewrite must not change the answer
      assert(query.select("time_us").as[Long].collect().sorted.toSeq ==
        Seq(4L, 5L).map(_ * EventsTable.HourUs + 1))

      // idempotent: EventsTable.replay already carries its own hour
      // bound; the rule leaves it alone and the plan stays correct
      val replayed = EventsTable.replay(spark, path, cursor)
      assert(replayed.select("time_us").as[Long].collect().sorted.length == 2)

      // upper bounds prune the tail too
      val ranged = spark.read.parquet(path)
        .filter(col("time_us") >= EventsTable.HourUs && col("time_us") < 3 * EventsTable.HourUs)
      val rScan = scanOf(ranged)
      val rFiles = rScan.relation.location
        .listFiles(rScan.partitionFilters, rScan.dataFilters).map(_.files.size).sum
      assert(rFiles == 2, s"hours 1,2 only — read $rFiles files")
      assert(ranged.count() == 2)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == HourBounds)
    }
  }

  test("rule does not pair time_us/event_hour from different relations") {
    // A dimension table that HAPPENS to carry a column named event_hour
    // (value unrelated to the fact table's time domain), joined ahead of
    // a fact table carrying time_us. A name-matched rewrite would derive
    // `dim.event_hour >= time_us/HourUs` — dropping every row here,
    // since the dim values are small grouping codes, not hours.
    val fact = Seq((4L * EventsTable.HourUs + 1, 1), (5L * EventsTable.HourUs + 7, 2))
      .toDF("time_us", "k")
    val dim = Seq((1, 10L), (2, 20L)).toDF("k", "event_hour")
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ HourBounds
    try {
      val q = fact.join(dim, "k").filter(col("time_us") >= 4 * EventsTable.HourUs)
      assert(q.count() == 2, "cross-relation bound must not be derived")

      // sanity: the same filter over ONE relation carrying both columns
      // still gets the derived conjunct (the rule is not disabled outright)
      val path = tmpDir("hour-prune-same-leaf")
      EventsTable.append(
        (0L until 4L).map(h => (h * EventsTable.HourUs + 1, s"did$h", "c"))
          .toDF("time_us", "did", "collection"),
        path)
      val scan = scanOf(spark.read.parquet(path).filter(col("time_us") >= 2 * EventsTable.HourUs))
      assert(scan.partitionFilters.nonEmpty, "same-leaf derivation must still fire")
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == HourBounds)
    }
  }
}
