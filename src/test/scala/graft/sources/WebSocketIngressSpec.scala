package graft.sources

import java.io.OutputStream
import java.net.ServerSocket

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.store.EventsTable

/** The reference's actual dial, end to end: a minimal RFC 6455
  * WebSocket server (HTTP Upgrade handshake + unmasked server frames —
  * the public protocol, nothing more) replays its log strictly after
  * the `?cursor=` on the dial URL and then live-streams appends, and
  * `graft-websocket` → decode → sequence → events table lands every
  * frame exactly once, with a cursor-resumed re-dial picking up where
  * the table left off (cmd/jetstream/main.go:299-317 +
  * server.go:274-287 semantics).
  */
class WebSocketIngressSpec extends SparkSpec {
  import spark.implicits._

  /** Wire frame with a deterministic event time (minute `i`). */
  private def frame(i: Int): (Long, String) = {
    val iso = f"2024-09-05T07:$i%02d:00.000Z"
    val us = java.time.Instant.parse(iso).toEpochMilli * 1000L
    us -> (s"""{"t":"#commit","did":"did:plc:w$i","rev":"r$i","seq":$i,"time":"$iso","tooBig":false,""" +
      s""""ops":[{"action":"create","path":"app.bsky.feed.post/k$i","cid":"c$i","recordCid":"c$i","record":{"text":"m$i"}}]}""")
  }

  /** Minimal RFC 6455 server: performs the Upgrade handshake, parses
    * the request path's `cursor` parameter, then streams one TEXT frame
    * per log entry with time > cursor — continuing as the log grows
    * (the live firehose). Client (masked) frames are drained and
    * ignored; server frames are unmasked per the RFC.
    */
  private class WsServer {
    val server = new ServerSocket(0)
    def port: Int = server.getLocalPort
    @volatile var log: Vector[(Long, String)] = Vector.empty
    @volatile private var closed = false

    private def sendText(out: OutputStream, s: String): Unit = {
      val p = s.getBytes("UTF-8")
      out.write(0x81) // FIN + text opcode
      if (p.length < 126) out.write(p.length)
      else if (p.length < 65536) {
        out.write(126); out.write(p.length >> 8); out.write(p.length & 0xff)
      } else {
        out.write(127)
        (7 to 0 by -1).foreach(i => out.write(((p.length.toLong >> (8 * i)) & 0xff).toInt))
      }
      out.write(p); out.flush()
    }

    private val acceptor = new Thread(() => {
      try while (!closed) {
        val sock = server.accept()
        new Thread(() => {
          try {
            val in = sock.getInputStream
            val out = sock.getOutputStream
            // --- HTTP Upgrade handshake ---
            val req = new StringBuilder
            def handshakeDone = req.length >= 4 &&
              req.substring(req.length - 4) == "\r\n\r\n"
            // Append BEFORE re-checking: the request's final byte IS the
            // terminator, and the client sends nothing more until our 101.
            var eof = false
            while (!eof && !handshakeDone) {
              val b = in.read()
              if (b == -1) eof = true else req.append(b.toChar)
            }
            val lines = req.toString.split("\r\n")
            val cursor = """cursor=(\d+)""".r.findFirstMatchIn(lines.head)
              .map(_.group(1).toLong).getOrElse(0L)
            val key = lines.find(_.toLowerCase.startsWith("sec-websocket-key:"))
              .map(_.split(":", 2)(1).trim).getOrElse(fail("no Sec-WebSocket-Key"))
            val accept = java.util.Base64.getEncoder.encodeToString(
              java.security.MessageDigest.getInstance("SHA-1").digest(
                (key + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11").getBytes("US-ASCII")))
            out.write(("HTTP/1.1 101 Switching Protocols\r\n" +
              "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
              s"Sec-WebSocket-Accept: $accept\r\n\r\n").getBytes("US-ASCII"))
            out.flush()
            // drain client frames (masked pings/close) in the background
            val drainer = new Thread(() => try { while (in.read() != -1) () } catch { case _: Throwable => () })
            drainer.setDaemon(true); drainer.start()
            // --- stream the log: replay after cursor, then live tail ---
            var sent = 0
            while (!closed) {
              val snapshot = log
              while (sent < snapshot.size) {
                val (t, line) = snapshot(sent)
                if (t > cursor) sendText(out, line)
                sent += 1
              }
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

  private def eventually[A](timeoutMs: Long)(probe: => Option[A]): A = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var last: Option[A] = None
    while (last.isEmpty && System.nanoTime() < deadline) {
      last = try probe catch { case _: Throwable => None }
      if (last.isEmpty) Thread.sleep(200)
    }
    last.getOrElse(fail(s"condition not met within ${timeoutMs}ms"))
  }

  test("websocket dial → decode → sequence → table; cursor-resumed re-dial adds only new events") {
    val table = tmpDir("ws-ingest")
    val srv = new WsServer
    try {
      srv.log = (1 to 3).map(frame).toVector

      // --- first dial: three frames arrive over the WebSocket
      val q1 = WebSocketIngress.start(spark,
        s"ws://localhost:${srv.port}/subscribe", table, tmpDir("ws-ckpt1"))
      eventually(90000) {
        val n = EventsTable.read(spark, table).count()
        if (n >= 3) Some(n) else None
      }
      q1.stop(); q1.awaitTermination(30000)

      val rows1 = EventsTable.read(spark, table)
        .select("event_time_us", "time_us").as[(Long, Long)].collect().sortBy(_._1)
      assert(rows1.map(_._1).toSeq == (1 to 3).map(frame(_)._1))
      assert(rows1.map(_._2).distinct.length == 3, "sequencer stamps must be unique")

      // --- upstream moved on; the re-dial presents the table-recovered
      // cursor on the URL and the server replays strictly after it
      srv.log = (1 to 5).map(frame).toVector
      val q2 = WebSocketIngress.start(spark,
        s"ws://localhost:${srv.port}/subscribe", table, tmpDir("ws-ckpt2"))
      eventually(90000) {
        val n = EventsTable.read(spark, table).count()
        if (n >= 5) Some(n) else None
      }
      q2.stop(); q2.awaitTermination(30000)

      val rows2 = EventsTable.read(spark, table)
        .select("event_time_us", "time_us").as[(Long, Long)].collect().sortBy(_._2)
      assert(rows2.map(_._1).toSeq == (1 to 5).map(frame(_)._1),
        "no loss, no duplication across the re-dial")
      assert(rows2.map(_._2).toSeq == rows2.map(_._2).sorted.toSeq)
      assert(rows2.map(_._2).distinct.length == 5)
    } finally srv.close()
  }

  test("restart with the SAME checkpoint dir: recovered offsets don't trim fresh messages") {
    // the previous incarnation's committed offsets are in ITS numbering;
    // without the rebase, commit(<recovered>) silently discards the
    // post-reconnect buffer — exactly the events the upstream re-sent
    // after the persisted cursor (at-least-once violated)
    val table = tmpDir("ws-samechkpt")
    val ckpt = tmpDir("ws-samechkpt-ckpt")
    val srv = new WsServer
    try {
      srv.log = (1 to 3).map(frame).toVector
      val q1 = WebSocketIngress.start(spark,
        s"ws://localhost:${srv.port}/subscribe", table, ckpt)
      eventually(90000) {
        val n = EventsTable.read(spark, table).count()
        if (n >= 3) Some(n) else None
      }
      q1.stop(); q1.awaitTermination(30000)

      srv.log = (1 to 6).map(frame).toVector
      val q2 = WebSocketIngress.start(spark,
        s"ws://localhost:${srv.port}/subscribe", table, ckpt)
      eventually(90000) {
        val n = EventsTable.read(spark, table).count()
        if (n >= 6) Some(n) else None
      }
      q2.stop(); q2.awaitTermination(30000)

      val rows = EventsTable.read(spark, table)
        .select("event_time_us").as[Long].collect().sorted.toSeq
      assert(rows == (1 to 6).map(frame(_)._1),
        "every upstream event exactly once across the same-checkpoint restart")
    } finally srv.close()
  }

  test("large frames fragment-safe: a >64KiB message is one row") {
    val table = tmpDir("ws-big")
    val srv = new WsServer
    try {
      val iso = "2024-09-05T07:30:00.000Z"
      val us = java.time.Instant.parse(iso).toEpochMilli * 1000L
      val bigText = "x" * 70000 // drives the 8-byte extended length path
      srv.log = Vector(us ->
        (s"""{"t":"#commit","did":"did:plc:big","rev":"r1","seq":1,"time":"$iso","tooBig":false,""" +
          s""""ops":[{"action":"create","path":"app.bsky.feed.post/kb","cid":"cb","recordCid":"cb","record":{"text":"$bigText"}}]}"""))
      val q = WebSocketIngress.start(spark,
        s"ws://localhost:${srv.port}/subscribe", table, tmpDir("ws-big-ckpt"))
      eventually(90000) {
        val n = EventsTable.read(spark, table).count()
        if (n >= 1) Some(n) else None
      }
      q.stop(); q.awaitTermination(30000)
      val rec = EventsTable.read(spark, table)
        .select(get_json_object(col("commit.record"), "$.text")).as[String].head()
      assert(rec == bigText, "payload survives the extended-length frame intact")
    } finally srv.close()
  }
}
