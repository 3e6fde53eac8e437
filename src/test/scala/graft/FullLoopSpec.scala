package graft

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.{ServerSocket, Socket}

import org.apache.spark.sql.functions._

import graft.serve.SocketServe
import graft.sources.SocketIngress
import graft.store.EventsTable

/** The reference's ACTUAL topology, end to end over real TCP: one
  * process ingesting live frames from an upstream socket
  * (cmd/jetstream/main.go:299-317) WHILE cursored subscribers replay
  * the same growing table, cut over, and tail live through the serve
  * socket (cmd/jetstream/server.go:244-356) — both halves running
  * concurrently against one events table. SocketIngressSpec and
  * SocketServeSpec each pin one boundary; this spec pins the loop:
  * upstream → ingest → table → serve → subscriber, with ingestion
  * continuing throughout, and the mid-stream-cursor subscriber
  * receiving every event ≥ its cursor exactly once, in order, across
  * the replay→live cutover.
  */
class FullLoopSpec extends SparkSpec {
  import spark.implicits._

  /** Wire frame with a deterministic event time (minute `i`). */
  private def frame(i: Int): String = {
    val iso = f"2024-09-05T06:$i%02d:00.000Z"
    s"""{"t":"#commit","did":"did:plc:u$i","rev":"r$i","seq":$i,"time":"$iso","tooBig":false,""" +
      s""""ops":[{"action":"create","path":"app.bsky.feed.post/k$i","cid":"c$i","recordCid":"c$i","record":{"text":"m$i"}}]}"""
  }

  /** Toy upstream: CONTINUOUSLY streams appended log entries to every
    * connection (the live firehose — frames keep arriving while the
    * serving half is mid-replay downstream).
    */
  private class LineServer {
    val server = new ServerSocket(0)
    def port: Int = server.getLocalPort
    @volatile var log: Vector[String] = Vector.empty
    @volatile private var closed = false
    private val acceptor = new Thread(() => {
      try while (!closed) {
        val sock = server.accept()
        new Thread(() => {
          try {
            val out = new PrintWriter(sock.getOutputStream, true)
            var sent = 0
            while (!closed) {
              val snapshot = log
              while (sent < snapshot.size) { out.println(snapshot(sent)); sent += 1 }
              Thread.sleep(20)
            }
          } catch { case _: Throwable => () }
          finally sock.close()
        }).start()
      } catch { case _: Throwable => () }
    })
    acceptor.setDaemon(true)
    acceptor.start()
    def close(): Unit = { closed = true; server.close() }
  }

  /** A test subscriber: sends `request`, accumulates received lines. */
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

  test("ingest and serve run concurrently; mid-stream cursor is exactly-once across cutover") {
    val table = tmpDir("full-loop-table")
    val srv = new LineServer
    var ingest: org.apache.spark.sql.streaming.StreamingQuery = null
    var server: SocketServe.Server = null
    try {
      // --- phase 1: the upstream has history; ingest persists it
      srv.log = (1 to 6).map(frame).toVector
      ingest = SocketIngress.start(spark, "localhost", srv.port,
        table, tmpDir("full-loop-ickpt"))
      eventually(90000)(EventsTable.read(spark, table).count() >= 6)

      // --- phase 2: start the serving half against the SAME table
      // while ingestion keeps running; a subscriber presents a
      // MID-STREAM cursor (the 4th stamp: events 1-3 are its past)
      val stamps = EventsTable.read(spark, table)
        .select("time_us").as[Long].collect().sorted
      val cursor = stamps(3)
      val tail = spark.readStream.format("graft-replay")
        .option("path", table)
        .option("cursor", (stamps.max + 1).toString) // live head: history is the session's job
        .load()
      server = SocketServe.start(tail, table, tmpDir("full-loop-sckpt"))
      val client = new Client(server.port, s"subscribe?cursor=$cursor")
      eventually(30000)(server.subscriberCount == 1)

      // --- phase 3: frames keep arriving WHILE the subscriber replays
      // and cuts over — the concurrent window this spec exists for
      srv.log = (1 to 12).map(frame).toVector
      eventually(120000)(client.lines.size >= 9) // 4..12 delivered
      // ...and again after cutover: pure live tail now
      srv.log = (1 to 16).map(frame).toVector
      eventually(120000)(client.lines.size >= 13) // 4..16 delivered

      // --- the table ingested everything exactly once...
      eventually(90000)(EventsTable.read(spark, table).count() == 16)
      val all = EventsTable.read(spark, table)
        .select("time_us").as[Long].collect().sorted.toSeq
      assert(all.distinct.size == 16, "ingest wrote each frame once")

      // ...and the subscriber got every event ≥ cursor exactly once,
      // in order, spanning replay (4..6), gap-fill, and live (7..16)
      val got = client.timesUs
      assert(got == got.sorted, "in time_us order across the cutover")
      assert(got.distinct.size == got.size, "exactly once")
      assert(got.toSet == all.filter(_ >= cursor).toSet,
        "every event at-or-after the cursor, none before")

      // both halves are still standing — the loop is a steady state,
      // not a drained pipeline
      assert(ingest.isActive, "ingest query still running")
      assert(server.query.isActive, "serve query still running")
      client.close()
    } finally {
      if (server != null) server.close()
      if (ingest != null) { ingest.stop(); ingest.awaitTermination(30000) }
      srv.close()
    }
  }
}
