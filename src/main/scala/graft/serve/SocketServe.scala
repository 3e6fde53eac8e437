package graft.serve

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.{ServerSocket, Socket}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.storage.StorageLevel

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
  * Scale posture: per-subscriber views are computed distributed (the
  * same pruned scans CutoverSessionSpec pins) and only each
  * subscriber's ADMITTED lines are collected to the serving edge — the
  * single-node fan-out edge the reference also is. A multi-node serving
  * tier runs one of these per edge node against the shared table (the
  * sessions hold two longs of state each); the table, not the server,
  * is the scale axis.
  */
object SocketServe {

  private final case class Conn(
      name: String,
      session: CutoverSession,
      out: PrintWriter,
      socket: Socket)

  /** Parse the request line's query parameters. */
  private[serve] def parseRequest(line: String, nowUs: Long)
      : (Subscribe.SubscriberSpec, Long) = {
    val params = line.trim.stripPrefix("subscribe?").split("&").toSeq
      .map(_.split("=", 2)).collect {
        case Array(k, v) if v.nonEmpty => k -> v
      }.toMap
    def csv(k: String) =
      params.get(k).map(_.split(",").toSeq.filter(_.nonEmpty)).getOrElse(Nil)
    val cursor = params.get("cursor").map(_.toLong)
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
      onClose: () => Unit) {
    lazy val query: StreamingQuery = queryOf()
    def subscriberCount: Int = conns.size
    def close(): Unit = {
      try query.stop() catch { case _: Throwable => () }
      serverSocket.close()
      conns.values.foreach(c => c.socket.close())
      conns.clear()
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
      writeTimeoutMs: Long = 30000L): Server = {
    val serverSocket = new ServerSocket(0)
    val conns = scala.collection.concurrent.TrieMap.empty[String, Conn]
    val counter = new java.util.concurrent.atomic.AtomicInteger
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

    // acceptor: one request line → a registered CutoverSession; the
    // subscriber starts receiving at the next micro-batch
    val acceptor = new Thread(() => {
      try while (true) {
        val sock = serverSocket.accept()
        new Thread(() => {
          try {
            val line = new BufferedReader(
              new InputStreamReader(sock.getInputStream, "UTF-8")).readLine()
            if (line != null) {
              val (spec, cursor) = parseRequest(line, nowUs())
              val name = s"sub-${counter.incrementAndGet()}"
              conns.put(name, Conn(name, new CutoverSession(spec, cursor),
                new PrintWriter(sock.getOutputStream, false), sock))
            } else sock.close()
          } catch { case _: Throwable => sock.close() }
        }).start()
      } catch { case _: Throwable => () } // server closed
    })
    acceptor.setDaemon(true)
    acceptor.start()

    def writeView(conn: Conn, view: DataFrame): Unit = {
      // live views arrive pre-serialized (the shared wire cache below —
      // the single marshal of server.go:73); replay views come off
      // per-subscriber table scans and serialize here. Flush per view
      // so replay chunks stream promptly.
      val wired =
        if (view.columns.contains("wire")) view else Decode.toWire(view)
      val rows = wired.select("wire").collect()
      val kill = watchdog.schedule(
        new Runnable { def run(): Unit = conn.socket.close() },
        writeTimeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS)
      try {
        rows.foreach(r => conn.out.println(r.getString(0)))
        conn.out.flush()
      } finally kill.cancel(false)
      if (conn.out.checkError())
        throw new java.io.IOException(s"${conn.name}: dead or stalled pipe")
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
    val query = events.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val active = conns.readOnlySnapshot().values.toSeq.sortBy(_.name)
        if (active.nonEmpty) {
          // serialize ONCE per micro-batch; every subscriber's live view
          // filters the cached wired batch and ships the wire column
          val cached = Decode.toWire(batch).persist(StorageLevel.MEMORY_AND_DISK)
          try {
            val headRow = cached.agg(max(col("time_us"))).head()
            if (!headRow.isNullAt(0))
              lastHeadUs.getAndAccumulate(headRow.getLong(0), math.max)
            val serverSeqUs = lastHeadUs.get()
            ServeJob.onPool(active, fanOutWidth) { conn =>
              try {
                if (conn.session.replaying)
                  conn.session.replayStep(spark, tablePath, serverSeqUs)(
                    view => writeView(conn, view))
                writeView(conn, conn.session.liveEmit(cached))
              } catch { case _: java.io.IOException => // slow consumer /
                conns.remove(conn.name) // disconnect: server.go:168-175
                conn.socket.close()
              }
            }
          } finally cached.unpersist()
        }
      }
      .start()

    new Server(serverSocket.getLocalPort, serverSocket, () => query, conns,
      () => watchdog.shutdownNow())
  }
}
