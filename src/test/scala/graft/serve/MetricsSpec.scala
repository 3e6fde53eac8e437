package graft.serve

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.{HttpURLConnection, Socket, URL}

import org.apache.spark.sql.functions.{lit, struct}

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

  test("histogram renders cumulative buckets, sum and count") {
    val reg = new Metrics.Registry
    val h = reg.histogram("g_dur_seconds", "durations",
      Array(0.1, 1.0, 10.0), "query" -> "q1")
    h.observe(0.05); h.observe(0.5); h.observe(0.5); h.observe(99.0)
    val out = reg.render
    assert(out.contains("# TYPE g_dur_seconds histogram"))
    assert(out.contains("""g_dur_seconds_bucket{query="q1",le="0.1"} 1"""))
    assert(out.contains("""g_dur_seconds_bucket{query="q1",le="1"} 3"""), out)
    assert(out.contains("""g_dur_seconds_bucket{query="q1",le="10"} 3"""))
    assert(out.contains("""g_dur_seconds_bucket{query="q1",le="+Inf"} 4"""))
    assert(out.contains("""g_dur_seconds_sum{query="q1"} 100.05"""))
    assert(out.contains("""g_dur_seconds_count{query="q1"} 4"""))
    // the reference's bucket layout: 18 exponential buckets from 1e-4
    assert(graft.streaming.IngestMetrics.DurationBuckets.length == 18)
    assert(math.abs(graft.streaming.IngestMetrics.DurationBuckets.last - 13.1072) < 1e-9)
  }

  test("ingest listener folds micro-batch progress into consumer_* series") {
    val reg = new Metrics.Registry
    val listener = graft.streaming.IngestMetrics.listener(reg)
    spark.streams.addListener(listener)
    val table = tmpDir("ingest-metrics-table")
    try {
      // a small real ingest: the listener sees its progress events
      val src = tmpDir("ingest-metrics-src")
      EventsTable.append((1 to 10).map(i => (i * 1000L, s"did:plc:u$i", "app.graft.doc"))
        .toDF("time_us", "did", "collection")
        .withColumn("type", lit("com"))
        .withColumn("commit", struct(lit("c").as("type"))), src)
      val tail = graft.streaming.LiveTail.withTailObservation(
        spark.readStream.format("graft-replay")
          .option("path", src).option("cursor", "0").load())
      val q = graft.ingest.IngestJob.start(tail,
        orderCols = Seq("time_us", "did"),
        tablePath = table, checkpointDir = tmpDir("ingest-metrics-ckpt"),
        metrics = reg)
      val qid = q.id.toString
      q.awaitTermination(120000)
      // listener events are delivered async, and other suites' queries
      // may also report into the session's listener bus: wait for and
      // assert THIS query's series (labeled by its id)
      val deadline = System.nanoTime() + 30L * 1000000000L
      def mine(name: String) = reg.render.contains(s"""$name{query="$qid"}""")
      while (!mine("graft_consumer_last_seq") && System.nanoTime() < deadline)
        Thread.sleep(200)
      val out = reg.render
      assert((s"""graft_consumer_events_processed_total\\{query="$qid"\\} [1-9]""").r
        .findFirstIn(out).isDefined, s"events_processed series missing:\n$out")
      assert(mine("graft_consumer_last_seq"), out)
      assert(mine("graft_consumer_last_evt_created_at"), out)
      assert(mine("graft_consumer_last_evt_created_evt_processed_gap"), out)
      assert(out.contains("graft_consumer_event_processing_duration_seconds_count"), out)
      assert(("""graft_consumer_events_persisted_total\{table="[^"]*"\} 10""").r
        .findFirstIn(out).isDefined, s"persisted counter:\n$out")
      // sequenced counts every stamped batch, including hwm-skipped
      // replays, so it is ≥ persisted
      val sequenced = ("""graft_consumer_events_sequenced_total\{table="[^"]*"\} (\d+)""").r
        .findFirstMatchIn(out).map(_.group(1).toLong)
      assert(sequenced.exists(_ >= 10L), s"sequenced counter:\n$out")
      // last_seq carries the observed max event time of the tail
      val seq = (s"""graft_consumer_last_seq\\{query="$qid"\\} (\\d+)""").r
        .findFirstMatchIn(out).map(_.group(1).toLong)
      assert(seq.exists(_ >= 10000L), s"last_seq from observe(): $seq\n$out")
      // per-type count: the fixture is all commit envelopes
      assert((s"""graft_consumer_events_by_type_total\\{event_type="com",query="$qid"\\} [1-9]""").r
        .findFirstIn(out).isDefined, s"typed counts from observe():\n$out")
    } finally spark.streams.removeListener(listener)
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

      def series(out: String, name: String): Double =
        ("""(?m)^""" + name + """(\{[^}]*\})? (\S+)$""").r
          .findAllMatchIn(out).map(_.group(2).toDouble).sum
      // the replay pump can deliver the whole backlog before the live
      // micro-batch lands; the emit-loop counters move when it does —
      // wait for them rather than assuming delivery implies a batch
      eventually(90000) {
        val out = reg.render
        series(out, "graft_events_emitted_total") >= 1d &&
        series(out, "graft_bytes_emitted_total") > 0d &&
        series(out, "graft_events_delivered_total") >= 21d &&
        series(out, "graft_bytes_delivered_total") > 0d
      }

      server.close()
      assert(reg.gauge("graft_subscribers_connected", "",
        "remote" -> "127.0.0.1").value == 0d, "gauge settles on close")
    } finally server.close()
  }
}
