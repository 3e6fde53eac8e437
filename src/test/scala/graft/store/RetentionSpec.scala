package graft.store

import graft.SparkSpec

class RetentionSpec extends SparkSpec {
  import spark.implicits._

  private val HourUs = 3600000000L

  test("trim drops only partitions wholly older than cutoff (persist.go:120-137)") {
    val path = tmpDir("retention")
    // events in hours 0..9
    val events = (0L until 10L).map(h => (h * HourUs + 1, s"did$h", "c")).toDF("time_us", "did", "collection")
    EventsTable.append(events, path)
    // now = hour 9, TTL = 3h → cutoff hour 6 → hours 0..5 dropped
    val now = 9 * HourUs
    val dropped = Retention.trim(spark, path, ttlUs = 3 * HourUs, nowUs = () => now)
    assert(dropped == 6)
    val rest = EventsTable.read(spark, path).select("time_us").as[Long].collect().sorted
    assert(rest.forall(_ >= 6 * HourUs))
    assert(rest.length == 4)
    // idempotent
    assert(Retention.trim(spark, path, 3 * HourUs, () => now) == 0)
  }

  test("trim on missing table is a no-op") {
    assert(Retention.trim(spark, "/tmp/does/not/exist-graft", 1L) == 0)
  }

  test("trim ages out compaction generations with their hour") {
    val path = tmpDir("retention-gens")
    val events = (0L until 4L).map(h => (h * HourUs + 1, s"did$h", "c"))
      .toDF("time_us", "did", "collection")
    EventsTable.append(events, path)
    EventsTable.append(events, path) // two files per hour → compactable
    // hours 0 and 1 get committed generations (their live dirs remain
    // until vacuum — retention must drop BOTH copies when the hour ages)
    Compaction.compactHour(spark, path, 0, force = true)
    Compaction.compactHour(spark, path, 1, force = true)
    val now = 3 * HourUs
    // TTL 1h → cutoff hour 2 → hours 0,1 dropped: 2 live dirs + 2 gen dirs
    val dropped = Retention.trim(spark, path, ttlUs = 1 * HourUs, nowUs = () => now)
    assert(dropped == 4)
    val rest = EventsTable.read(spark, path).select("time_us").as[Long].collect().sorted
    assert(rest.forall(_ >= 2 * HourUs) && rest.length == 4)
    assert(Compaction.committedGens(spark, path).isEmpty)
    assert(Retention.trim(spark, path, 1 * HourUs, () => now) == 0)
  }
}
