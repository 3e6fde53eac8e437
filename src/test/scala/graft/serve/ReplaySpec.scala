package graft.serve

import graft.SparkSpec
import graft.store.EventsTable

/** Replay→live cutover semantics (server.go:100-103,283-286,305-337). */
class ReplaySpec extends SparkSpec {
  import spark.implicits._

  test("cutover threshold matches reference: within 500ms of head (server.go:322)") {
    val head = 10000000L
    assert(Replay.caughtUp(head - 400000L, head))
    assert(!Replay.caughtUp(head - 600000L, head))
  }

  test("future cursor goes straight to live (server.go:283-286)") {
    val p = Replay.plan(cursorUs = 2000, liveHeadUs = 1000)
    assert(p.replayFromUs > p.replayUntilUs) // empty replay range
    assert(p.liveFromUs == 1000)
  }

  test("replay∪live delivers each event exactly once, in order") {
    val path = tmpDir("replay-union")
    val events = (1L to 1000L).map(t => (t * 1000, s"did${t % 5}", "c"))
      .toDF("time_us", "did", "collection")
    EventsTable.append(events, path)
    val out = Replay.replayUnionLive(spark, path, cursorUs = 300000, liveFromUs = 600000)
      .select("time_us").as[Long].collect()
    // overlap region [600000+, ...] appears once; full range covered
    assert(out.toSeq == out.toSeq.sorted)
    assert(out.length == out.toSet.size)
    assert(out.length == 701) // time_us 300000..1000000 step 1000
    assert(out.head == 300000 && out.last == 1000000)
  }
}
