package graft.serve

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.{HttpURLConnection, Socket, URL}

import graft.SparkSpec
import graft.store.EventsTable

/** The metrics surface: Prometheus text-format exposition over HTTP
  * (the reference's /metrics listener, cmd/jetstream/main.go:217-221),
  * and the five serve-boundary series moving with real traffic through
  * [[SocketServe]] (cmd/jetstream/metrics.go:7-31, server.go:71-80,
  * 151-152, 217, 235).
  */
class MetricsSpec extends SparkSpec {
  import spark.implicits._

  private def scrape(port: Int): (Int, String, String) = {
    val conn = new URL(s"http://localhost:$port/metrics")
      .openConnection().asInstanceOf[HttpURLConnection]
    val code = conn.getResponseCode
    val body = scala.io.Source.fromInputStream(conn.getInputStream, "UTF-8").mkString
    (code, conn.getContentType, body)
  }

  test("registry renders Prometheus text format: HELP/TYPE, labels, escaping, determinism") {
    val reg = new Metrics.Registry
    reg.counter("g_events_total", "Total events").add(41)
    reg.counter("g_events_total", "Total events").inc() // same series, same adder
    reg.counter("g_delivered_total", "Per remote", "remote" -> "10.0.0.1").add(7)
    reg.counter("g_delivered_total", "Per remote", "remote" -> "10.0.0.2").add(3)
    val g = reg.gauge("g_conn", "Weird \"label\"\\chars", "who" -> "a\"b\\c\nd")
    g.inc(); g.inc(); g.dec()
    val out = reg.render
    assert(out.contains("# HELP g_events_total Total events\n"))
    assert(out.contains("# TYPE g_events_total counter\n"))
    assert(out.contains("g_events_total 42\n"), s"integer formatting, got:\n$out")
    assert(out.contains("""g_delivered_total{remote="10.0.0.1"} 7"""))
    assert(out.contains("""g_delivered_total{remote="10.0.0.2"} 3"""))
    assert(out.contains("# TYPE g_conn gauge"))
    assert(out.contains("""g_conn{who="a\"b\\c\nd"} 1"""), "label escaping")
    // families sorted by name; deterministic across renders
    val fams = out.linesIterator.filter(_.startsWith("# HELP")).toSeq
    assert(fams == fams.sorted)
    assert(out == reg.render)
  }

  test("HTTP endpoint serves the registry at /metrics") {
    val reg = new Metrics.Registry
    reg.counter("g_http_total", "hits").add(5)
    val ep = Metrics.serve(reg)
    try {
      val (code, ctype, body) = scrape(ep.port)
      assert(code == 200)
      assert(ctype.startsWith("text/plain"))
      assert(body.contains("g_http_total 5"))
      reg.counter("g_http_total", "hits").inc()
      assert(scrape(ep.port)._3.contains("g_http_total 6"), "live on each scrape")
    } finally ep.close()
  }

  test("serve-boundary series move with real TCP traffic and settle on close") {
    val table = tmpDir("metrics-serve-table")
    EventsTable.append((1 to 20).map(i => (i * 1000L, s"did:plc:u$i", "app.graft.doc"))
      .toDF("time_us", "did", "collection"), table)

    val reg = new Metrics.Registry
    val tail = spark.readStream.format("graft-replay")
      .option("path", table).option("cursor", "21000").load()
    val server = SocketServe.start(tail, table, tmpDir("metrics-serve-ckpt"),
      metrics = reg)
    try {
      val sock = new Socket("localhost", server.port)
      new PrintWriter(sock.getOutputStream, true).println("subscribe?cursor=0")
      val got = new java.util.concurrent.atomic.AtomicInteger
      val reader = new Thread(() => {
        try {
          val in = new BufferedReader(new InputStreamReader(sock.getInputStream, "UTF-8"))
          while (in.readLine() != null) got.incrementAndGet()
        } catch { case _: Throwable => () }
      })
      reader.setDaemon(true); reader.start()

      def eventually(timeoutMs: Long)(cond: => Boolean): Unit = {
        val deadline = System.nanoTime() + timeoutMs * 1000000L
        while (!cond && System.nanoTime() < deadline) Thread.sleep(200)
        assert(cond, s"condition not met within ${timeoutMs}ms; metrics:\n${reg.render}")
      }
      eventually(30000)(server.subscriberCount == 1)
      assert(reg.gauge("graft_subscribers_connected", "",
        "remote" -> "127.0.0.1").value == 1d)

      // drive the loop: new appends emit to the tail, the subscriber
      // replays the 20-row table then receives the live rows
      EventsTable.append(Seq((21000L, "did:plc:u21", "app.graft.doc"))
        .toDF("time_us", "did", "collection"), table)
      eventually(90000)(got.get() >= 21)

      val out = reg.render
      def series(name: String): Double =
        ("""(?m)^""" + name + """(\{[^}]*\})? (\S+)$""").r
          .findAllMatchIn(out).map(_.group(2).toDouble).sum
      assert(series("graft_events_emitted_total") >= 1d, s"emitted in:\n$out")
      assert(series("graft_bytes_emitted_total") > 0d)
      assert(series("graft_events_delivered_total") >= 21d, s"delivered in:\n$out")
      assert(series("graft_bytes_delivered_total") > 0d)

      server.close()
      assert(reg.gauge("graft_subscribers_connected", "",
        "remote" -> "127.0.0.1").value == 0d, "gauge settles on close")
    } finally server.close()
  }
}
