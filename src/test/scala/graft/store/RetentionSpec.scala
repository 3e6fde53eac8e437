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
}
