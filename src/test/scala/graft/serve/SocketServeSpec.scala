package graft.serve

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.Socket

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.store.EventsTable

/** The serving boundary end-to-end over real TCP: subscribers connect
  * with the reference's query-string surface (filters + cursor),
  * cursored subscribers replay the table then cut over to live,
  * cursorless subscribers live-tail from attach, every delivery is
  * wire JSON, in order, exactly once.
  */
class SocketServeSpec extends SparkSpec {
  import spark.implicits._

  private def rows(ids: Range, collection: String = "app.graft.doc") =
    ids.map(i => (i * 1000L, s"did:plc:u${i % 5}", collection))

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

  test("parseRequest: repeated params accumulate (the reference's wire form); cursor takes the first") {
    // Go's URL.Query()["k"] hands the reference EVERY occurrence
    // (server.go:251,263) — a client sending the repeated form must get
    // the union, not the last value; the comma form stays as this
    // engine's extension and both compose
    val (spec, cursor) = SocketServe.parseRequest(
      "subscribe?wantedCollections=app.a&wantedCollections=app.b,app.c" +
        "&wantedDids=did:plc:x&wantedDids=did:plc:y&cursor=5&cursor=9", nowUs = 111L)
    assert(spec.wantedCollections == Seq("app.a", "app.b", "app.c"))
    assert(spec.wantedDids == Seq("did:plc:x", "did:plc:y"))
    assert(cursor == 5L) // Query().Get takes the first (server.go:275)
    // no cursor → future cursor → live-only (server.go:283-286)
    assert(SocketServe.parseRequest("subscribe?", 42L)._2 == 42L)
  }

  test("invalid subscribe params are rejected at the handshake (server.go:253-271)") {
    val table = tmpDir("socket-serve-reject-table")
    EventsTable.append(rows(1 to 3).toDF("time_us", "did", "collection"), table)
    val tail = spark.readStream.format("graft-replay")
      .option("path", table).option("cursor", "4000").load()
    val server = SocketServe.start(tail, table, tmpDir("socket-serve-reject-ckpt"))
    try {
      new Client(server.port, "subscribe?wantedCollections=not-an-nsid&cursor=0")
      new Client(server.port, "subscribe?wantedDids=plc:no-did-prefix&cursor=0")
      new Client(server.port, "subscribe?cursor=notanumber")
      val good = new Client(server.port,
        "subscribe?cursor=0&wantedCollections=app.graft.doc")
      eventually(30000)(server.subscriberCount == 1)
      eventually(60000)(good.lines.size >= 3)
      assert(server.subscriberCount == 1,
        "only the valid subscription registers; malformed ones are rejected")
    } finally server.close()
  }

  test("TCP subscribers: cursored replay→live and filtered live tail, wire JSON in order") {
    val table = tmpDir("socket-serve-table")
    EventsTable.append(rows(1 to 30).toDF("time_us", "did", "collection"), table)
    EventsTable.append(rows(31 to 40, "app.graft.other").toDF("time_us", "did", "collection"), table)

    val tail = spark.readStream.format("graft-replay")
      .option("path", table)
      // the serving tail starts at the head; history is the sessions' job
      .option("cursor", "41000")
      .load()
    val server = SocketServe.start(tail, table, tmpDir("socket-serve-ckpt"))
    try {
      // A: cursor=0 → full replay of the table, then live
      val a = new Client(server.port, "subscribe?cursor=0")
      // B: filtered live-only (no cursor = future cursor, server.go:283-286)
      val b = new Client(server.port, "subscribe?wantedCollections=app.graft.doc")
      eventually(30000)(server.subscriberCount == 2)
      // the replay pump serves A's backlog immediately, before any live
      // micro-batch (server.go:305-337's independent replay goroutine);
      // live-only B has nothing to receive yet
      eventually(60000)(a.lines.size >= 40)
      assert(b.lines.isEmpty)

      // live events arrive and drive the serving loop: A replays the
      // whole table then cuts over within the same session; B receives
      // only post-attach events of its collection
      EventsTable.append(rows(41 to 44).toDF("time_us", "did", "collection"), table)
      EventsTable.append(rows(45 to 46, "app.graft.other").toDF("time_us", "did", "collection"), table)
      eventually(90000)(a.lines.size >= 46 && b.lines.size >= 4)

      val aTimes = a.timesUs
      assert(aTimes == aTimes.sorted, "in order")
      assert(aTimes.distinct.size == aTimes.size, "exactly once")
      assert(aTimes.toSet == (1 to 46).map(_ * 1000L).toSet,
        "cursored subscriber sees every event across replay→live")

      val bTimes = b.timesUs
      assert(bTimes.toSet == (41 to 44).map(_ * 1000L).toSet,
        "live-only subscriber sees only post-attach events of its collection")

      // every line is a parseable wire frame carrying the envelope fields
      val sample = a.lines.peek()
      assert(sample.contains("\"did\":") && sample.contains("\"time_us\":"))

      // disconnect drops the subscriber (slow-consumer close analog).
      // TCP buffers the first post-close write before the RST lands, so
      // keep traffic flowing until the dead pipe is detected.
      b.close()
      var next = 47
      eventually(90000) {
        if (next <= 80) {
          EventsTable.append(rows(next to next).toDF("time_us", "did", "collection"), table)
          next += 1
        }
        server.subscriberCount == 1
      }
    } finally server.close()
  }

  test("non-IO live write failure: re-armed replay redelivers the window (no loss, no drop)") {
    // a pluggable Transport that throws NON-IO after liveEmitFrames
    // computed wires: keep-attached alone would lose that window (a
    // live session never re-reads the table and the next delivered()
    // advances the hwm past the gap) — the loop must re-arm the
    // session into replay so the window is re-read, and must NOT drop
    // a healthy subscriber for what is a server-side bug
    val table = tmpDir("socket-serve-rearm-table")
    EventsTable.append(rows(1 to 10).toDF("time_us", "did", "collection"), table)
    val failed = new java.util.concurrent.atomic.AtomicBoolean(false)
    val faulty = new SocketServe.Transport {
      def open(sock: Socket): Option[(String, SocketServe.WireWriter)] =
        SocketServe.LineTransport.open(sock).map { case (req, w) =>
          (req, new SocketServe.WireWriter {
            def writeFrames(frames: Array[String]): Long = {
              if (frames.exists(_.contains("\"time_us\":15000")) &&
                  failed.compareAndSet(false, true))
                throw new RuntimeException("injected non-IO emit failure")
              w.writeFrames(frames)
            }
          })
        }
    }
    val tail = spark.readStream.format("graft-replay")
      .option("path", table).option("cursor", "11000").load()
    val server = SocketServe.start(tail, table,
      tmpDir("socket-serve-rearm-ckpt"), transport = faulty)
    try {
      val c = new Client(server.port, "subscribe?cursor=0")
      eventually(60000)(c.lines.size >= 10)
      // live: the batch carrying 15000 fails non-IO exactly once
      EventsTable.append(rows(11 to 15).toDF("time_us", "did", "collection"), table)
      eventually(60000)(failed.get)
      // keep live flowing; the re-replay pulls the failed window back
      // out of the table and cuts over again
      EventsTable.append(rows(16 to 18).toDF("time_us", "did", "collection"), table)
      eventually(90000)(c.timesUs.toSet == (1 to 18).map(_ * 1000L).toSet)
      val ts = c.timesUs
      assert(ts == ts.sorted, "in order")
      assert(ts.distinct.size == ts.size, "exactly once")
      assert(server.subscriberCount == 1, "a non-IO bug must not drop the subscriber")
    } finally server.close()
  }

  test("idle stream: a cursored subscriber replays without any live traffic (server.go:305-337)") {
    // the reference's replay goroutine runs independently of Emit; a
    // subscriber attaching to a QUIET stream must still receive its
    // backlog — no micro-batch ever fires here
    val table = tmpDir("socket-serve-idle-table")
    EventsTable.append(rows(1 to 25).toDF("time_us", "did", "collection"), table)
    val tail = spark.readStream.format("graft-replay")
      .option("path", table)
      .option("cursor", "26000")
      .load()
    val server = SocketServe.start(tail, table, tmpDir("socket-serve-idle-ckpt"))
    try {
      val a = new Client(server.port, "subscribe?cursor=0")
      val b = new Client(server.port, "subscribe?cursor=0&wantedCollections=app.graft.doc")
      eventually(60000)(a.lines.size >= 25 && b.lines.size >= 25)
      val ts = a.timesUs
      assert(ts == ts.sorted && ts.toSet == (1 to 25).map(_ * 1000L).toSet,
        "full in-order replay with zero live events")
    } finally server.close()
  }

  test("100 subscribers: the one-job-per-batch live fan-out delivers every spec shape") {
    val table = tmpDir("socket-serve-100-table")
    EventsTable.append(rows(1 to 20).toDF("time_us", "did", "collection"), table)

    val tail = spark.readStream.format("graft-replay")
      .option("path", table)
      .option("cursor", "21000") // serve the post-attach tail; history via cursors
      .load()
    val server = SocketServe.start(tail, table, tmpDir("socket-serve-100-ckpt"))
    val clients = scala.collection.mutable.ArrayBuffer.empty[Client]
    try {
      // three spec shapes at once: collection-filtered live, did-filtered
      // live, and cursored full-replay — the mix a real serving edge holds
      val collClients = (1 to 45).map { _ =>
        val c = new Client(server.port, "subscribe?wantedCollections=app.graft.doc")
        clients += c; c
      }
      val didClients = (0 until 45).map { i =>
        val c = new Client(server.port, s"subscribe?wantedDids=did:plc:u${i % 5}")
        clients += c; c
      }
      val cursored = (1 to 10).map { _ =>
        val c = new Client(server.port, "subscribe?cursor=0")
        clients += c; c
      }
      eventually(60000)(server.subscriberCount == 100)

      EventsTable.append(rows(21 to 30).toDF("time_us", "did", "collection"), table)
      EventsTable.append(rows(31 to 35, "app.graft.other").toDF("time_us", "did", "collection"), table)

      val docSet = (21 to 30).map(_ * 1000L).toSet
      def didSet(k: Int) = (21 to 35).filter(_ % 5 == k).map(_ * 1000L).toSet
      val allSet = (1 to 35).map(_ * 1000L).toSet
      eventually(120000) {
        collClients.forall(_.lines.size >= docSet.size) &&
        didClients.zipWithIndex.forall { case (c, i) => c.lines.size >= didSet(i % 5).size } &&
        cursored.forall(_.lines.size >= allSet.size)
      }
      collClients.foreach(c => assert(c.timesUs.toSet == docSet))
      didClients.zipWithIndex.foreach { case (c, i) =>
        assert(c.timesUs.toSet == didSet(i % 5), s"did client $i")
      }
      cursored.foreach { c =>
        val ts = c.timesUs
        assert(ts.toSet == allSet, "full replay→live across 100-way fan-out")
        assert(ts == ts.sorted && ts.distinct.size == ts.size, "in order, exactly once")
      }
    } finally {
      clients.foreach(c => scala.util.Try(c.close()))
      server.close()
    }
  }
}
