package graft.sources

import java.io.PrintWriter
import java.net.ServerSocket

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.store.EventsTable

/** The standing-service posture across a REAL process boundary: a toy
  * line-delimited frame server (the websocket-upstream stand-in — it
  * replays its log strictly after the cursor the client holds, exactly
  * the reference's `?cursor=` contract, server.go:274-287) feeds
  * SocketIngress over TCP: decode → sequence → events table, and a
  * reconnect with the table-recovered cursor picks up without loss or
  * duplication.
  */
class SocketIngressSpec extends SparkSpec {
  import spark.implicits._

  /** Wire frame with a deterministic event time (minute `i`). */
  private def frame(i: Int): (Long, String) = {
    val iso = f"2024-09-05T06:$i%02d:00.000Z"
    val us = java.time.Instant.parse(iso).toEpochMilli * 1000L
    us -> (s"""{"t":"#commit","did":"did:plc:u$i","rev":"r$i","seq":$i,"time":"$iso","tooBig":false,""" +
      s""""ops":[{"action":"create","path":"app.bsky.feed.post/k$i","cid":"c$i","recordCid":"c$i","record":{"text":"m$i"}}]}""")
  }

  /** Toy upstream: replays `log` entries with time > `cursorUs` to every
    * new connection, then holds the connection open (the live tail).
    */
  private class LineServer {
    val server = new ServerSocket(0)
    def port: Int = server.getLocalPort
    @volatile var log: Vector[(Long, String)] = Vector.empty
    @volatile var cursorUs: Long = 0L
    @volatile private var closed = false
    private val acceptor = new Thread(() => {
      try while (!closed) {
        val sock = server.accept()
        new Thread(() => {
          try {
            val out = new PrintWriter(sock.getOutputStream, true)
            log.filter(_._1 > cursorUs).foreach { case (_, line) => out.println(line) }
            while (!closed) Thread.sleep(50) // live tail: keep the pipe open
          } catch { case _: Throwable => () }
          finally sock.close()
        }).start()
      } catch { case _: Throwable => () }
    })
    acceptor.setDaemon(true)
    acceptor.start()
    def close(): Unit = { closed = true; server.close() }
  }

  private def eventually[A](timeoutMs: Long)(probe: => Option[A]): A = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var last: Option[A] = None
    while (last.isEmpty && System.nanoTime() < deadline) {
      last = try probe catch { case _: Throwable => None }
      if (last.isEmpty) Thread.sleep(200)
    }
    last.getOrElse(fail(s"condition not met within ${timeoutMs}ms"))
  }

  test("socket frames → decode → sequence → table; cursor-resumed reconnect adds only new events") {
    val table = tmpDir("socket-ingest")
    val srv = new LineServer
    try {
      srv.log = (1 to 3).map(frame).toVector

      // --- first connection: three frames arrive over TCP
      val q1 = SocketIngress.start(spark, "localhost", srv.port,
        table, tmpDir("socket-ckpt1"))
      eventually(90000) {
        val n = EventsTable.read(spark, table).count()
        if (n >= 3) Some(n) else None
      }
      q1.stop(); q1.awaitTermination(30000)

      val rows1 = EventsTable.read(spark, table)
        .select("event_time_us", "time_us").as[(Long, Long)].collect().sortBy(_._1)
      assert(rows1.map(_._1).toSeq == (1 to 3).map(frame(_)._1))
      assert(rows1.map(_._2).distinct.length == 3, "sequencer stamps must be unique")

      // --- the client's resume cursor is the table's newest event time
      val cursor = SocketIngress.resumeCursorUs(spark, table)
      assert(cursor == frame(3)._1)

      // --- upstream moved on; reconnect presents the cursor and the
      // server replays strictly after it (reference ?cursor= semantics)
      srv.log = (1 to 5).map(frame).toVector
      srv.cursorUs = cursor
      val q2 = SocketIngress.start(spark, "localhost", srv.port,
        table, tmpDir("socket-ckpt2"))
      eventually(90000) {
        val n = EventsTable.read(spark, table).count()
        if (n >= 5) Some(n) else None
      }
      q2.stop(); q2.awaitTermination(30000)

      val rows2 = EventsTable.read(spark, table)
        .select("event_time_us", "time_us").as[(Long, Long)].collect().sortBy(_._2)
      assert(rows2.map(_._1).toSeq == (1 to 5).map(frame(_)._1),
        "no loss, no duplication across the reconnect")
      // sequencing stayed monotonic across the restart (hwm recovered
      // from the table, never regressed)
      assert(rows2.map(_._2).toSeq == rows2.map(_._2).sorted.toSeq)
      assert(rows2.map(_._2).distinct.length == 5)
    } finally srv.close()
  }
}
