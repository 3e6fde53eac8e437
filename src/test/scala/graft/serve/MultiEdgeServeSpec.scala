package graft.serve

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.Socket

import graft.SparkSpec
import graft.store.EventsTable

/** The horizontal-scale story for the serving edge, EXERCISED: N
  * `SocketServe` processes share one events table (the table, not the
  * server, is the scale axis — SocketServe.scala's header), each edge
  * with its own streaming tail + checkpoint and its own subscriber
  * set. The reference's multi-instance posture is the same shape: any
  * number of jetstream processes tail one upstream and serve disjoint
  * client populations.
  *
  * Asserted here, with ingest running concurrently under both edges:
  *   - every cursored subscriber on EITHER edge replays the shared
  *     table and cuts over to live exactly-once, in order;
  *   - live-only subscribers see exactly the post-attach window;
  *   - a subscriber drop on one edge is INVISIBLE to the other edge
  *     (and to the dropped subscriber's neighbors on the same edge);
  *   - per-edge session state (replaying counts, hwm) is independent.
  */
class MultiEdgeServeSpec extends SparkSpec {
  import spark.implicits._

  private def rows(ids: Range) =
    ids.map(i => (i * 1000L, s"did:plc:u${i % 5}", "app.graft.doc"))

  private final class Client(port: Int, request: String) {
    private val sock = new Socket("localhost", port)
    new PrintWriter(sock.getOutputStream, true).println(request)
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    private val reader = new Thread(() => {
      try {
        val in = new BufferedReader(new InputStreamReader(sock.getInputStream, "UTF-8"))
        var l = in.readLine()
        while (l != null) { lines.add(l); l = in.readLine() }
      } catch { case _: Throwable => () }
    })
    reader.setDaemon(true)
    reader.start()
    def timesUs: Seq[Long] = {
      import scala.jdk.CollectionConverters._
      val re = """"time_us":(\d+)""".r
      lines.asScala.toSeq.map(l => re.findFirstMatchIn(l).get.group(1).toLong)
    }
    def close(): Unit = sock.close()
  }

  test("two serving edges on one table: independent exactly-once delivery and drop isolation") {
    val table = tmpDir("multi-edge-table")
    EventsTable.append(rows(1 to 20).toDF("time_us", "did", "collection"), table)

    def edge(name: String) = SocketServe.start(
      spark.readStream.format("graft-replay")
        .option("path", table).option("cursor", "21000").load(),
      table, tmpDir(s"multi-edge-ckpt-$name"))

    val edgeA = edge("a")
    val edgeB = edge("b")
    try {
      // disjoint subscriber sets: 2 cursored + 1 live-only per edge
      val a1 = new Client(edgeA.port, "subscribe?cursor=0")
      val a2 = new Client(edgeA.port, "subscribe?cursor=0")
      val aLive = new Client(edgeA.port, "subscribe?")
      val b1 = new Client(edgeB.port, "subscribe?cursor=0")
      val bLive = new Client(edgeB.port, "subscribe?")
      eventually(30000)(edgeA.subscriberCount == 3 && edgeB.subscriberCount == 2)

      // both edges' replay pumps serve their backlogs independently
      eventually(60000)(a1.lines.size >= 20 && a2.lines.size >= 20 && b1.lines.size >= 20)
      assert(aLive.lines.isEmpty && bLive.lines.isEmpty)

      // concurrent ingest: appends land while BOTH edges are serving;
      // each edge's own micro-batch loop fans them out
      (21 to 26).grouped(2).foreach { g =>
        EventsTable.append(rows(g.head to g.last).toDF("time_us", "did", "collection"), table)
      }
      eventually(90000)(
        a1.lines.size >= 26 && a2.lines.size >= 26 && b1.lines.size >= 26 &&
          aLive.lines.size >= 6 && bLive.lines.size >= 6)

      val full = (1 to 26).map(_ * 1000L)
      for ((c, who) <- Seq((a1, "a1"), (a2, "a2"), (b1, "b1"))) {
        val ts = c.timesUs
        assert(ts == ts.sorted, s"$who in order")
        assert(ts.distinct.size == ts.size, s"$who exactly once")
        assert(ts.toSet == full.toSet, s"$who sees the whole table across replay→live")
      }
      for ((c, who) <- Seq((aLive, "aLive"), (bLive, "bLive"))) {
        val ts = c.timesUs
        assert(ts == ts.sorted && ts.distinct.size == ts.size, s"$who ordered, exactly once")
        assert(ts.toSet == (21 to 26).map(_ * 1000L).toSet, s"$who sees only post-attach")
      }
      // cutover isolation: every session on both edges reached live
      assert(edgeA.replayingCount == 0 && edgeB.replayingCount == 0)

      // drop isolation: killing a2 (edge A) must not disturb a1, aLive
      // or anything on edge B — keep traffic flowing until the dead
      // pipe is detected, then assert only edge A's count moved
      a2.close()
      var next = 27
      eventually(90000) {
        if (next <= 60) {
          EventsTable.append(rows(next to next).toDF("time_us", "did", "collection"), table)
          next += 1
        }
        edgeA.subscriberCount == 2
      }
      assert(edgeB.subscriberCount == 2, "a drop on edge A must be invisible to edge B")
      val last = next - 1
      eventually(90000)(
        a1.timesUs.toSet == (1 to last).map(_ * 1000L).toSet &&
          b1.timesUs.toSet == (1 to last).map(_ * 1000L).toSet)
      for ((c, who) <- Seq((a1, "a1"), (b1, "b1"), (aLive, "aLive"), (bLive, "bLive"))) {
        val ts = c.timesUs
        assert(ts == ts.sorted && ts.distinct.size == ts.size,
          s"$who still ordered, exactly once after the drop")
      }
    } finally { edgeA.close(); edgeB.close() }
  }
}
