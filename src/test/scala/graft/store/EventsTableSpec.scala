package graft.store

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EventsTableSpec extends SparkSpec {
  import spark.implicits._

  private val HourUs = 3600000000L

  private def sampleEvents = (0L until 1000L)
    .map(i => (i * HourUs / 100, s"did${i % 7}", s"app.c${i % 3}"))
    .toDF("time_us", "did", "collection")

  test("append + replay returns ordered range from cursor") {
    val path = tmpDir("events-table")
    EventsTable.append(sampleEvents, path)
    val cursor = 5 * HourUs
    val out = EventsTable.replay(spark, path, cursor).select("time_us").as[Long].collect()
    assert(out.nonEmpty)
    assert(out.head >= cursor)
    assert(out.toSeq == out.toSeq.sorted)
    assert(out.length == sampleEvents.filter(col("time_us") >= cursor).count())
  }

  test("replay plan prunes partitions (PartitionFilters present)") {
    val path = tmpDir("events-prune")
    EventsTable.append(sampleEvents, path)
    val plan = EventsTable.replay(spark, path, 5 * HourUs)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"))
    assert(plan.contains(s"${EventsTable.PartitionCol}"))
    // the µs residual predicate reaches parquet as a pushed filter
    assert(plan.contains("PushedFilters") && plan.contains("time_us"))
  }

  test("appends accumulate (at-least-once append contract)") {
    val path = tmpDir("events-append")
    EventsTable.append(sampleEvents.limit(10), path)
    EventsTable.append(sampleEvents.limit(10), path)
    assert(EventsTable.read(spark, path).count() == 20)
  }
}
