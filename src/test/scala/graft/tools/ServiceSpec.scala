package graft.tools

import java.io.OutputStream
import java.net.{HttpURLConnection, ServerSocket, URI, URL}
import java.net.http.{HttpClient, WebSocket}
import java.util.concurrent.CompletionStage

import graft.SparkSpec
import graft.serve.Metrics
import graft.store.EventsTable

/** The composed single-binary shape end to end: a fake upstream
  * WebSocket firehose feeds [[Service]]'s ingest; a standard WebSocket
  * client subscribes to its serve port and receives replay + live;
  * the `/metrics` endpoint exposes both consumer- and serve-side
  * series; the staleness hook fires when the upstream goes quiet
  * (cmd/jetstream/main.go:107-368's lifecycle).
  */
class ServiceSpec extends SparkSpec {
  import spark.implicits._

  private def frame(i: Int): String = {
    val iso = f"2024-09-05T08:$i%02d:00.000Z"
    s"""{"t":"#commit","did":"did:plc:w$i","rev":"r$i","seq":$i,"time":"$iso","tooBig":false,""" +
      s""""ops":[{"action":"create","path":"app.graft.doc/k$i","cid":"c$i","recordCid":"c$i","record":{"v":$i}}]}"""
  }

  /** Minimal RFC 6455 upstream: replays its log after the dialed
    * cursor, then live-streams appends (the WebSocketIngressSpec
    * server, trimmed).
    */
  private class Upstream {
    val server = new ServerSocket(0)
    def port: Int = server.getLocalPort
    @volatile var log: Vector[(Long, String)] = Vector.empty
    @volatile private var closed = false
    private def sendText(out: OutputStream, s: String): Unit = {
      val p = s.getBytes("UTF-8")
      out.write(0x81)
      if (p.length < 126) out.write(p.length)
      else { out.write(126); out.write(p.length >> 8); out.write(p.length & 0xff) }
      out.write(p); out.flush()
    }
    private val acceptor = new Thread(() => {
      try while (!closed) {
        val sock = server.accept()
        new Thread(() => {
          try {
            val in = sock.getInputStream
            val out = sock.getOutputStream
            val req = new StringBuilder
            def done = req.length >= 4 && req.substring(req.length - 4) == "\r\n\r\n"
            var eof = false
            while (!eof && !done) {
              val b = in.read(); if (b == -1) eof = true else req.append(b.toChar)
            }
            val lines = req.toString.split("\r\n")
            val cursor = """cursor=(\d+)""".r.findFirstMatchIn(lines.head)
              .map(_.group(1).toLong).getOrElse(0L)
            val key = lines.find(_.toLowerCase.startsWith("sec-websocket-key:"))
              .map(_.split(":", 2)(1).trim).getOrElse(fail("no key"))
            val accept = java.util.Base64.getEncoder.encodeToString(
              java.security.MessageDigest.getInstance("SHA-1").digest(
                (key + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11").getBytes("US-ASCII")))
            out.write(("HTTP/1.1 101 Switching Protocols\r\n" +
              "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
              s"Sec-WebSocket-Accept: $accept\r\n\r\n").getBytes("US-ASCII"))
            out.flush()
            val drainer = new Thread(() => try { while (in.read() != -1) () } catch { case _: Throwable => () })
            drainer.setDaemon(true); drainer.start()
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
    acceptor.setDaemon(true); acceptor.start()
    def close(): Unit = { closed = true; server.close() }
  }

  private final class WsClient(url: String) {
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    private val partial = new StringBuilder
    val ws: WebSocket = HttpClient.newHttpClient().newWebSocketBuilder()
      .buildAsync(URI.create(url), new WebSocket.Listener {
        override def onText(w: WebSocket, data: CharSequence, last: Boolean)
            : CompletionStage[_] = {
          partial.append(data)
          if (last) { lines.add(partial.toString); partial.setLength(0) }
          w.request(1)
          null
        }
      }).join()
  }

  private def eventually(timeoutMs: Long)(cond: => Boolean): Unit = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var ok = try cond catch { case _: Throwable => false }
    while (!ok && System.nanoTime() < deadline) {
      Thread.sleep(200)
      ok = try cond catch { case _: Throwable => false }
    }
    assert(ok, s"condition not met within ${timeoutMs}ms")
  }

  test("the composed service: upstream → ingest → table → serve → client, with metrics and staleness") {
    val upstream = new Upstream
    val dataDir = tmpDir("service-data")
    val reg = new Metrics.Registry
    val staleFired = new java.util.concurrent.atomic.AtomicInteger
    var running: Service.Running = null
    try {
      def us(i: Int) =
        java.time.Instant.parse(f"2024-09-05T08:$i%02d:00.000Z").toEpochMilli * 1000L
      upstream.log = (1 to 4).map(i => us(i) -> frame(i)).toVector

      running = Service.start(spark,
        Service.Config(
          wsUrl = s"ws://localhost:${upstream.port}/subscribe",
          dataDir = dataDir,
          maintenanceIntervalMs = 2000L,
          staleAfterMs = 4000L),
        registry = reg,
        onStale = _ => staleFired.incrementAndGet())

      // ingest lands the upstream history
      eventually(90000)(EventsTable.read(spark, s"$dataDir/events").count() >= 4)

      // a standard WebSocket client subscribes with a full-replay cursor
      val client = new WsClient(
        s"ws://localhost:${running.servePort}/subscribe?cursor=0")
      eventually(30000)(running.server.subscriberCount == 1)

      // live events flow upstream → ingest → serve → client; the client
      // also receives the replayed history
      upstream.log = (1 to 6).map(i => us(i) -> frame(i)).toVector
      eventually(120000)(client.lines.size >= 6)
      val got = client.lines.toArray(Array.empty[String]).toSeq
      assert(got.count(_.contains("did:plc:w1")) == 1, "history replayed exactly once")
      assert(got.count(_.contains("did:plc:w6")) == 1, "live event delivered")

      // the metrics endpoint serves both halves' series
      val conn = new URL(s"http://localhost:${running.metricsPort}/metrics")
        .openConnection().asInstanceOf[HttpURLConnection]
      assert(conn.getResponseCode == 200)
      val body = scala.io.Source.fromInputStream(conn.getInputStream, "UTF-8").mkString
      assert(body.contains("graft_consumer_events_persisted_total"), body.take(500))
      assert(body.contains("graft_events_delivered_total"), body.take(500))
      assert(body.contains("graft_subscribers_connected"), body.take(500))

      // upstream quiet → the staleness hook fires (self-kill decision
      // is the caller's; main() exits, this test counts)
      eventually(60000)(staleFired.get() >= 1)

      client.ws.abort()
    } finally {
      if (running != null) running.close()
      upstream.close()
    }
  }
}
