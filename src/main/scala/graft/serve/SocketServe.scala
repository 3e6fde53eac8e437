package graft.serve

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.{ServerSocket, Socket}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ingest.Decode

/** The serving half of the standing-service posture across a REAL
  * process boundary: a TCP line server whose subscribers receive wire
  * JSON frames (the reference's websocket subscribe endpoint,
  * cmd/jetstream/server.go:244-356 — handshake swapped for a
  * line-protocol request, everything behind it the same shape).
  *
  * Protocol: a subscriber connects and sends ONE request line of query
  * parameters — `wantedCollections=a,b&wantedDids=…&cursor=<µs>` (the
  * reference's query-string surface, server.go:244-287) — then reads
  * wire JSON lines until it disconnects. No `cursor` means live-only:
  * implemented as a FUTURE cursor, which cuts over immediately — the
  * exact "future cursor → live" rule of server.go:283-286.
  *
  * Serving loop (modeled on [[ServeJob.startSessions]], which pins the
  * semantics intra-JVM): one streaming query tails the events table;
  * each micro-batch snapshots the CURRENT subscriber registry — new
  * connections join at the next batch, the reference's dynamic attach —
  * and every subscriber runs its [[CutoverSession]] lifecycle (cursor
  * replay chunks, gap-fill, live emit with the replay-lag gate) on the
  * bounded fan-out pool, its view serialized through the shared
  * serialize-once wire cache. A write failure (disconnect, dead pipe)
  * drops the subscriber exactly like the reference's slow-consumer
  * close (server.go:168-175).
  *
  * Scale posture: the LIVE path costs ONE Spark job per micro-batch at
  * any subscriber count — the batch is wire-serialized distributed,
  * collected once with its routing columns, and fanned out by the
  * in-process emit loop ([[CutoverSession.liveEmitFrames]]), the same
  * shape as the reference's single-marshal + per-subscriber-predicate
  * loop (server.go:73,87-134). REPLAY views stay distributed — pruned,
  * chunk-bounded table scans per session. The driver is the egress
  * edge, exactly as the reference's process is: its ceiling (measured
  * in ScaleSmoke, documented in PERF.md) is wire-bytes × subscribers
  * through one process's sockets; a multi-node serving tier runs one of
  * these per edge node against the shared table (sessions hold two
  * longs of state each) — the table, not the server, is the scale axis.
  */
object SocketServe extends org.apache.spark.internal.Logging {

  /** Throttled warning: at most one log line per (context, exception
    * class) per interval. The serve loops run at 40 Hz / per-batch —
    * a persistent failure (schema drift, corrupted table) must surface
    * in the log without flooding it, and a transient one (file listing
    * racing a concurrent append/compaction) must not spam at all.
    */
  private val lastWarnMs =
    scala.collection.concurrent.TrieMap.empty[String, Long]
  private def warnThrottled(context: String, e: Throwable,
      intervalMs: Long = 5000L): Unit = {
    val key = context + ":" + e.getClass.getName
    val now = System.currentTimeMillis()
    val prev = lastWarnMs.getOrElse(key, 0L)
    if (now - prev >= intervalMs && lastWarnMs.replace(key, prev, now) ||
        lastWarnMs.putIfAbsent(key, now).isEmpty)
      // the full throwable, not just class+message: the non-IO emit path
      // classifies its catch as "a bug, not a broken pipe" — the stack
      // trace IS the diagnostic there (one per throttle window)
      logWarning(s"$context: ${e.getClass.getName}: ${e.getMessage} " +
        "(retrying; this warning is throttled)", e)
  }

  /** Per-connection wire protocol: how a subscriber's request arrives
    * and how wire JSON frames go back. One implementation per
    * transport; the serving loop (sessions, cutover, fan-out, metrics,
    * drops) is transport-agnostic.
    */
  private[serve] trait Transport {
    /** Handshake a fresh connection: the request query string
      * (`subscribe?cursor=…&wantedCollections=…`) and the frame
      * writer, or None to reject (the socket is closed by the caller).
      */
    def open(sock: Socket): Option[(String, WireWriter)]
  }

  /** Writes one batch of wire frames; returns bytes put on the wire.
    * MUST throw [[java.io.IOException]] on a dead or stalled pipe —
    * that is the drop signal (server.go:168-175).
    *
    * Failure contract: a NON-IO throw means NO frame of this batch
    * reached the wire — the serving loop then re-arms the session into
    * replay and the whole window is re-read exactly-once. An
    * implementation that may have flushed part of the batch before
    * failing must surface that as IOException (the drop signal; the
    * client's cursor-resume dedups), or the re-replay would deliver
    * the flushed prefix twice. The built-in transports satisfy this:
    * they buffer and report flush failures as IOException.
    */
  private[serve] trait WireWriter {
    def writeFrames(frames: Array[String]): Long
  }

  /** The line protocol: one request line in, one JSON line per frame
    * out (the round-6 serve surface, kept as the plain-TCP transport).
    */
  private[serve] object LineTransport extends Transport {
    def open(sock: Socket): Option[(String, WireWriter)] = {
      val line = new BufferedReader(
        new InputStreamReader(sock.getInputStream, "UTF-8")).readLine()
      Option(line).map { l =>
        // explicit UTF-8: the wire contract (and every reader) is
        // UTF-8, not the platform default; byte accounting likewise
        // counts encoded bytes, not UTF-16 chars
        val out = new PrintWriter(new java.io.OutputStreamWriter(
          sock.getOutputStream, java.nio.charset.StandardCharsets.UTF_8), false)
        (l, new WireWriter {
          def writeFrames(frames: Array[String]): Long = {
            var bytes = 0L
            frames.foreach { f =>
              out.println(f)
              bytes += f.getBytes(java.nio.charset.StandardCharsets.UTF_8).length + 1L
            }
            out.flush()
            if (out.checkError())
              throw new java.io.IOException("dead or stalled pipe")
            bytes
          }
        })
      }
    }
  }

  private final case class Conn(
      name: String,
      session: CutoverSession,
      writer: WireWriter,
      socket: Socket,
      remote: String,
      delivered: Metrics.Series,
      bytesDelivered: Metrics.Series)

  /** Parse the request line's query parameters. REPEATED occurrences
    * accumulate — `wantedCollections=a&wantedCollections=b` is the
    * reference's actual wire form (Go's `URL.Query()["k"]` slice,
    * server.go:251,263); the comma-separated form inside one value is
    * kept as this engine's extension. `cursor` takes the FIRST
    * occurrence (Go's `Query().Get`, server.go:275).
    */
  private[serve] def parseRequest(line: String, nowUs: Long)
      : (Subscribe.SubscriberSpec, Long) = {
    val pairs = line.trim.stripPrefix("subscribe?").split("&").toSeq
      .map(_.split("=", 2)).collect {
        case Array(k, v) if v.nonEmpty => k -> v
      }
    def vals(k: String) = pairs.collect { case (`k`, v) => v }
    def csv(k: String) = vals(k).flatMap(_.split(",")).filter(_.nonEmpty)
    val cursor = vals("cursor").headOption.map(_.toLong)
      .getOrElse(nowUs) // no cursor = future cursor = live-only
    (Subscribe.SubscriberSpec(csv("wantedCollections"), csv("wantedDids")), cursor)
  }

  /** A running server: `close()` stops accepting, disconnects
    * subscribers and stops the streaming query.
    */
  final class Server private[SocketServe] (
      val port: Int,
      serverSocket: ServerSocket,
      queryOf: () => StreamingQuery,
      conns: scala.collection.concurrent.TrieMap[String, Conn],
      drop: Conn => Unit,
      closing: java.util.concurrent.atomic.AtomicBoolean,
      onClose: () => Unit) {
    lazy val query: StreamingQuery = queryOf()
    def subscriberCount: Int = conns.size
    /** Sessions still in replay mode — cursors not yet cut over. */
    def replayingCount: Int = conns.values.count(_.session.replaying)
    /** Per-session lifecycle view: (name, replaying, hwmUs). */
    def sessionStates: Seq[(String, Boolean, Long)] =
      conns.values.toSeq.sortBy(_.name)
        .map(c => (c.name, c.session.replaying, c.session.seqUs))
    /** Per-session transition breadcrumbs (diagnostics). */
    def sessionTraces: Map[String, Seq[String]] = {
      import scala.jdk.CollectionConverters._
      conns.values.toSeq.sortBy(_.name)
        .map(c => c.name -> c.session.trace.asScala.toSeq).toMap
    }
    def close(): Unit = {
      closing.set(true) // before the sweep: in-flight handshakes self-drop
      try query.stop() catch { case _: Throwable => () }
      serverSocket.close()
      conns.values.foreach(drop) // closes sockets + settles the gauge
      onClose()
    }
  }

  /** Start serving `events` (a streaming tail of the events table at
    * `tablePath` — e.g. the graft-replay source) on an ephemeral port.
    */
  def start(
      events: DataFrame,
      tablePath: String,
      checkpointDir: String,
      fanOutWidth: Int = ServeJob.DefaultFanOutWidth,
      trigger: Trigger = Trigger.ProcessingTime(0L),
      nowUs: () => Long = () => System.currentTimeMillis() * 1000L,
      writeTimeoutMs: Long = 30000L,
      metrics: Metrics.Registry = Metrics.default,
      transport: Transport = LineTransport,
      maxSubRate: Option[Double] = None,
      port: Int = 0,
      replayChunkSize: Int = 10000,
      replayThrottle: Option[ReplayThrottle] = None): Server = {
    val serverSocket = new ServerSocket(port)
    val conns = scala.collection.concurrent.TrieMap.empty[String, Conn]
    val counter = new java.util.concurrent.atomic.AtomicInteger
    // set before close() sweeps conns: a handshake completing AFTER the
    // sweep would otherwise register a conn nobody ever drops (open
    // socket + connected gauge stuck at 1)
    val closing = new java.util.concurrent.atomic.AtomicBoolean(false)
    // the reference's serve-side series (metrics.go:7-31), incremented
    // at the same boundaries: emit loop, delivery, connect/disconnect
    val eventsEmitted = metrics.counter("graft_events_emitted_total",
      "Total events emitted by the serving loop")
    val bytesEmitted = metrics.counter("graft_bytes_emitted_total",
      "Total wire bytes serialized by the serving loop")
    def connectedGauge(remote: String) = metrics.gauge(
      "graft_subscribers_connected",
      "Subscribers currently connected", "remote" -> remote)
    def dropConn(conn: Conn): Unit =
      if (conns.remove(conn.name).isDefined) {
        conn.socket.close()
        connectedGauge(conn.remote).dec()
      }
    // slow-consumer watchdog: a subscriber that stops READING (pipe
    // alive, kernel send buffer full) blocks the write forever —
    // checkError only sees closed pipes. The watchdog closes the socket
    // if a view's write exceeds the budget, which surfaces as the same
    // dead-pipe IOException and drops the subscriber (the reference's
    // slow-consumer close, server.go:168-175).
    val watchdog = new java.util.concurrent.ScheduledThreadPoolExecutor(1,
      (r: Runnable) => { val t = new Thread(r, "socket-serve-watchdog"); t.setDaemon(true); t })
    // cancelled kill tasks leave the queue immediately — one is
    // scheduled per view write, and at ProcessingTime(0) batch rates
    // they would otherwise pile up for their full timeout
    watchdog.setRemoveOnCancelPolicy(true)

    // acceptor: one transport handshake → a registered CutoverSession;
    // the subscriber starts receiving at the next micro-batch
    val acceptor = new Thread(() => {
      try while (true) {
        val sock = serverSocket.accept()
        new Thread(() => {
          try {
            transport.open(sock) match {
              case Some((line, writer)) =>
                val (spec, cursor) = parseRequest(line, nowUs())
                // invalid filter params REJECT the subscription — the
                // reference's ParseNSID/ParseDID error returns
                // (server.go:253-271); a malformed cursor already
                // rejects via the toLong throw → outer close
                if (!spec.wantedCollections.forall(
                      graft.functions.SyntaxCheck.isNsidStr) ||
                    !spec.wantedDids.forall(
                      graft.functions.SyntaxCheck.isDidStr))
                  throw new IllegalArgumentException("invalid subscribe params")
                val name = s"sub-${counter.incrementAndGet()}"
                val remote = sock.getInetAddress.getHostAddress
                // per-subscriber replay pacing at 10× the live cap
                // (main.go:79-84 default, server.go:307)
                val pacer = maxSubRate.map(r => TokenBucket.playback(liveRate = r))
                val conn = Conn(name,
                  new CutoverSession(spec, cursor, chunkSize = replayChunkSize,
                    playback = pacer),
                  writer, sock, remote,
                  metrics.counter("graft_events_delivered_total",
                    "Total events delivered to subscribers", "remote" -> remote),
                  metrics.counter("graft_bytes_delivered_total",
                    "Total wire bytes delivered to subscribers", "remote" -> remote))
                conns.put(name, conn)
                connectedGauge(remote).inc()
                if (closing.get()) dropConn(conn) // lost the race with close()
              case None => sock.close()
            }
          } catch { case _: Throwable => sock.close() }
        }).start()
      } catch { case _: Throwable => () } // server closed
    })
    acceptor.setDaemon(true)
    acceptor.start()

    def writeWire(conn: Conn, wires: Array[String]): Unit = {
      // a terminated watchdog pool means close() already ran: this conn
      // can never emit again — surface the drop signal (IOException),
      // not a retryable bug, so shutdown races drop the conn cleanly
      // instead of leaving it attached with its frames unwritten
      val kill =
        try watchdog.schedule(
          new Runnable { def run(): Unit = conn.socket.close() },
          writeTimeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS)
        catch {
          case e: java.util.concurrent.RejectedExecutionException =>
            throw new java.io.IOException("server closing", e)
        }
      val bytes =
        try conn.writer.writeFrames(wires)
        finally kill.cancel(false)
      // past writeFrames: count only deliveries that reached the pipe
      // (server.go:151-152 counts after a successful write). This
      // bookkeeping must be exception-free by construction: the frames
      // are already flushed, so a throwable escaping here would reach
      // the live-emit rearm handler and re-deliver the window just
      // written (ADVICE r11). Metrics failures log; they never propagate.
      if (wires.nonEmpty) {
        try {
          conn.delivered.add(wires.length.toDouble)
          conn.bytesDelivered.add(bytes.toDouble)
        } catch {
          // NonFatal only: an OOM/StackOverflow here must still crash
          // the session, not vanish into a throttled warn (ADVICE r12)
          case scala.util.control.NonFatal(e) => warnThrottled("delivery metrics", e)
        }
      }
    }
    // replay views come off per-subscriber PRUNED table scans (the
    // distributed half of the session) and serialize + collect here —
    // chunk-bounded and playback-paced, so each collect is ≤ chunkSize
    // admitted rows. Flush per view so replay chunks stream promptly.
    def writeView(conn: Conn, view: DataFrame): Unit = {
      val wired =
        if (view.columns.contains("wire")) view else Decode.toWire(view)
      writeWire(conn, wired.select("wire").collect().map(_.getString(0)))
    }

    // the live head starts at the TABLE's current tail, not 0: a no-data
    // first micro-batch must not hand replayStep serverSeqUs=0, which
    // would declare any cursor caught-up and silently truncate a
    // multi-chunk replay backlog
    val initialHeadUs = scala.util.Try {
      val row = graft.store.EventsTable.read(events.sparkSession, tablePath)
        .agg(max(col("time_us"))).head()
      if (row.isNullAt(0)) 0L else row.getLong(0)
    }.getOrElse(0L)
    val lastHeadUs = new java.util.concurrent.atomic.AtomicLong(initialHeadUs)

    // AQE-off session clone for the session replay scans: the pump and
    // the batch loop run these small chunk scans concurrently with the
    // engine's own queries, and AQE's final-plan wait has a lost-wakeup
    // race under exactly that concurrency (see ReplayTailSource's
    // probeSession note); adaptive planning buys nothing on a pruned
    // ≤chunkSize scan.
    val replaySession = {
      val s = events.sparkSession.newSession()
      s.conf.set("spark.sql.adaptive.enabled", "false")
      s.experimental.extraOptimizations =
        events.sparkSession.experimental.extraOptimizations
      s
    }

    // replay pump: the reference serves a cursored subscriber's replay
    // from its own goroutine, INDEPENDENT of live traffic
    // (server.go:305-337). Micro-batches only fire when new events
    // arrive, so without this thread a subscriber attaching to an idle
    // stream would wait for the next live event before its replay even
    // starts — and starve forever on a quiet one. Per-conn work is
    // `conn.synchronized` here and in the batch loop, so a session's
    // replay chunks and its live emission never interleave; delivery
    // order and exactly-once still come from the session's gate + hwm.
    val pump = new Thread(() => {
      try while (!closing.get()) {
        try {
          val replaying =
            conns.readOnlySnapshot().values.filter(_.session.replaying).toSeq.sortBy(_.name)
          // adaptive share (VERDICT r16 #2): when live delivery lag is
          // over target, the throttle admits only a fraction of pump
          // ticks — replay degrades to slow catch-up instead of
          // saturating the box until S21 drops a compliant client
          if (replaying.nonEmpty && replayThrottle.forall(_.stepAllowed())) {
            ServeJob.onPool(replaying, fanOutWidth) { conn =>
              try conn.synchronized {
                // the head is read INSIDE the lock, right before the
                // step: a pre-read value can go stale while this worker
                // waits behind a micro-batch that suppressed newer live
                // frames for this session — a stale head then lets the
                // cutover barrier pass and the suppressed window is lost
                if (conn.session.replaying)
                  conn.session.replayStep(replaySession, tablePath, lastHeadUs.get())(
                    view => writeView(conn, view))
              } catch { case _: java.io.IOException => dropConn(conn) }
            }
          }
        } catch {
          case e: InterruptedException => throw e
          // a transient table-read race (file listing during a
          // concurrent append/compaction) must not kill the pump —
          // the streaming side gets the same retry from Spark itself.
          // But a PERSISTENT failure (schema drift, corrupted table)
          // would otherwise spin at 40 Hz with cursored subscribers
          // starved and zero diagnostics — surface it, throttled.
          case e: Throwable => warnThrottled("replay pump", e)
        }
        Thread.sleep(25) // also bounds the paced-out (budget 0) spin
      } catch { case _: InterruptedException => () }
    }, "socket-serve-replay-pump")
    pump.setDaemon(true)
    pump.start()
    val query = events.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val active = conns.readOnlySnapshot().values.toSeq.sortBy(_.name)
        if (active.nonEmpty) {
          // ONE Spark job per micro-batch, at ANY subscriber count:
          // serialize once distributed (the single marshal of
          // server.go:73) and collect the wire frames WITH their routing
          // columns to the serving edge; everything below is the
          // in-process emit loop (server.go:87-134) — per-subscriber
          // predicate + hwm over the shared frame array, zero further
          // jobs. The earlier shape (a filtered view + collect per
          // subscriber) was 2·S jobs per batch; at S=100 the job-
          // scheduling overhead alone dominated the batch. Driver memory
          // holds one live micro-batch of wire bytes — bounded by the
          // trigger interval, and the same window the reference keeps in
          // process for its emit loop.
          val wiredBatch = Decode.toWire(batch)
          val frames = wiredBatch
            .select(col("time_us"),
              Subscribe.resolvedCollection(wiredBatch).as("collection"),
              col("did"), col("wire"))
            .collect()
            .map(r => Subscribe.WireFrame(r.getLong(0),
              if (r.isNullAt(1)) null else r.getString(1),
              if (r.isNullAt(2)) null else r.getString(2),
              r.getString(3)))
            .sortBy(_.timeUs)
          if (frames.nonEmpty) {
            // live head + the emit-loop counters (server.go:71,80 counts
            // each serialized event and its bytes once, before fan-out)
            lastHeadUs.getAndAccumulate(frames.last.timeUs, math.max)
            // live delivery lag at the serving edge: emit wall-clock −
            // the batch's newest event time (its time_us is the ingest
            // sequencer's wall-clock stamp) — the signal the adaptive
            // replay share governs on
            replayThrottle.foreach(_.observeLive(nowUs() - frames.last.timeUs))
            eventsEmitted.add(frames.length.toDouble)
            bytesEmitted.add(frames.iterator.map(f =>
              f.wire.getBytes(java.nio.charset.StandardCharsets.UTF_8).length.toLong)
              .sum.toDouble)
          }
          // one throttle decision per micro-batch covers every
          // replaying conn this batch would step (same admission
          // granularity as the pump's per-tick decision). The credit
          // draw is LAZY — a batch with no replaying conn must not
          // consume an admission the pump was owed (ADVICE r17 #4: the
          // unconditional draw drifted the effective replay rate below
          // the intended share under throttling). The pump and batch
          // loop deliberately share ONE accumulator: both step the same
          // sessions, and the share governs the TOTAL replay tick rate,
          // whichever site fires it.
          val batchStepAllowed = active.exists(_.session.replaying) &&
            replayThrottle.forall(_.stepAllowed())
          ServeJob.onPool(active, fanOutWidth) { conn =>
            try conn.synchronized { // excludes the replay pump per conn
              // head read inside the lock — see the pump's note
              if (conn.session.replaying && batchStepAllowed)
                try conn.session.replayStep(replaySession, tablePath, lastHeadUs.get())(
                  view => writeView(conn, view))
                catch {
                  // write-path failure: the drop signal — rethrow to the
                  // outer handler
                  case e: java.io.IOException => throw e
                  // the same transient table-read race the pump tolerates
                  // (file listing during a concurrent append/compaction)
                  // can land here instead; a healthy subscriber must not
                  // be dropped for it. Leave the conn attached — the next
                  // tick (pump or batch) retries; the session stays in
                  // replay so the live gate below keeps suppressing.
                  case e: Throwable => warnThrottled("batch-loop replay", e)
                }
              val (wires, tailUs) = conn.session.liveEmitFrames(frames)
              // The rearm try covers ONLY the wire write: writeWire's
              // post-flush bookkeeping is exception-free by construction,
              // so a non-IO escaping it means frames did NOT all reach
              // the pipe — the one case where a rearm is lossless. The
              // hwm advance runs OUTSIDE the try: after a successful
              // flush a failure there must surface, never re-arm (a
              // rearm would re-read and re-deliver the window just
              // written — duplicates, ADVICE r11).
              val flushed =
                try { writeWire(conn, wires); true }
                catch {
                  case e: java.io.IOException => throw e // → outer drop
                  case e: Throwable if wires.nonEmpty =>
                    // non-IO with frames IN FLIGHT: keep-attached would
                    // LOSE this batch's window for the subscriber — a live
                    // session never re-reads the table, the next batch
                    // carries only newer events, and its delivered() would
                    // advance the hwm past the gap. Re-arm the session into
                    // replay at the current hwm instead: the skipped window
                    // is re-read from the table, the hwm dedup skips
                    // anything already written, and the normal gap-fill
                    // cutover returns it to live exactly-once.
                    conn.session.rearmReplay()
                    warnThrottled(s"live emit for ${conn.name} (re-armed replay)", e)
                    false
                }
              if (flushed)
                conn.session.delivered(tailUs) // hwm past the SUCCESSFUL write
            } catch {
              case _: java.io.IOException => // slow consumer / disconnect:
                dropConn(conn) // server.go:168-175
              case e: Throwable =>
                // non-IO BEFORE anything was emitted (the in-memory emit
                // half failed) — a bug, not a broken pipe. Dropping would
                // hide it behind a clean disconnect; keep the conn
                // attached (its gate/hwm are untouched, so nothing is
                // lost) and surface the error, throttled, while the next
                // batch retries.
                warnThrottled(s"live emit for ${conn.name}", e)
            }
          }
        }
      }
      .start()

    new Server(serverSocket.getLocalPort, serverSocket, () => query, conns,
      dropConn, closing, () => { pump.interrupt(); watchdog.shutdownNow() })
  }
}
