package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery

import graft.serve.{Metrics, SocketServe, WebSocketServe}
import graft.sources.WebSocketIngress
import graft.store.{Compaction, Retention}
import graft.streaming.{IngestMetrics, Watchdog}

/** The standalone service: every piece of the engine composed into the
  * reference's single-binary shape (cmd/jetstream/main.go:107-368) —
  * upstream WebSocket ingest with cursor resume, the WebSocket
  * subscribe server against the same events table, the Prometheus
  * `/metrics` endpoint, TTL retention + compaction on a maintenance
  * ticker (the reference's pebble TTL, persist.go:120-137), and the
  * staleness self-check (main.go:184-214: no new sequence for 15 s →
  * exit so the orchestrator restarts).
  *
  * Flags mirror the reference's (main.go:36-92), spelled `--k=v`:
  *
  * {{{
  * runMain graft.tools.Service \
  *   --ws-url=ws://upstream:6008/subscribe \
  *   --listen-port=6008 --metrics-listen-port=6009 \
  *   --data-dir=./data --event-ttl-hours=24 \
  *   --max-sub-rate=5000 --override-relay-cursor=-1
  * }}}
  *
  * `worker-count`/`max-queue-size` have no analog: Spark's scheduler
  * owns parallelism (`local[N]` / executor count), and backpressure is
  * the micro-batch boundary rather than a bounded channel.
  */
object Service {

  /** A derived index the maintenance ticker keeps fresh (VERDICT r13
    * #6: retention + compaction ran on the ticker but a standing
    * service's indexes silently aged). `refresh` is expected to be one
    * of the `ensureIncremental*` family ([[graft.ext.IndexStore]]):
    * idempotent, fingerprint-keyed, and metadata-cheap when nothing
    * changed — appending an hour to the corpus builds exactly that
    * hour's part index on the next tick, any other tick is a cache
    * hit. Returns the committed index path so probes always read a
    * complete snapshot.
    */
  final case class IndexRefresh(name: String,
      refresh: SparkSession => String)

  final case class Config(
      wsUrl: String,
      wsFormat: String = "text", // "cbor" = binary DAG-CBOR wire frames
      listenPort: Int = 0, // 0 = ephemeral
      metricsPort: Int = 0,
      dataDir: String = "./data",
      eventTtlHours: Double = 24.0,
      maxSubRate: Double = 5000.0,
      overrideCursorUs: Long = -1L,
      maintenanceIntervalMs: Long = 5L * 60 * 1000,
      staleAfterMs: Long = 15000L,
      compactionGraceMs: Long = 15L * 60 * 1000,
      // composed-binary batching posture, both soak-derived (PERF.md
      // round 11): a 0 ms ingest trigger writes hundreds of tiny
      // parquet files per minute, and every file inflates the listing
      // cost EVERY chunked replay scan and live-tail batch pays — at a
      // sustained 10k ev/s a replaying subscriber fell below the live
      // rate and could never cut over. One-second batches cut the file
      // count 10× and larger replay chunks amortize each scan.
      ingestTriggerMs: Long = 1000L,
      serveChunkSize: Int = 50000,
      // object-store-safe appends (EventsTable.appendManifested):
      // visibility moves off the dir-listing rename order onto gapless
      // numbered manifest commits — the mode to run when dataDir is an
      // object store, where rename-order prefix closure degrades
      // silently. Reads auto-detect, so serve/replay/retention/
      // compaction compose unchanged. A table must stay in one mode.
      manifestCommits: Boolean = false,
      // derived indexes the ticker keeps fresh alongside retention +
      // compaction (programmatic-composition only — no CLI flag: a
      // refresher is a closure over its corpus and build parameters)
      indexRefreshers: Seq[IndexRefresh] = Nil,
      // opt-in index-store janitor (VERDICT r16 #4): each maintenance
      // tick also sweeps IndexStore.root for debris the lag-one GC
      // cannot reach — superseded-epoch trees with live successors,
      // indexes of deleted corpora, crash-orphaned staging past the
      // lock budget. Off by default: a shared root serving OTHER
      // services' corpora should be swept by one designated owner.
      indexJanitor: Boolean = false,
      // adaptive replay share (VERDICT r16 #2): replay steps back off
      // when live delivery lag exceeds this target, so a late joiner
      // near the box's saturation point degrades to slow catch-up
      // instead of tipping live delivery into the slow-consumer drop.
      // ≤0 disables (the fixed FAIR share only).
      replayTargetLagUs: Long = 2000000L)

  /** A running service; `close()` tears everything down in reverse
    * start order.
    */
  final class Running private[Service] (
      val ingest: StreamingQuery,
      val server: SocketServe.Server,
      val metricsEndpoint: Metrics.Endpoint,
      val watchdog: Watchdog,
      spark: SparkSession,
      listeners: Seq[org.apache.spark.sql.streaming.StreamingQueryListener],
      maintenance: java.util.concurrent.ScheduledExecutorService) {
    def servePort: Int = server.port
    def metricsPort: Int = metricsEndpoint.port
    def close(): Unit = {
      maintenance.shutdownNow()
      server.close()
      try { ingest.stop(); ingest.awaitTermination(30000) }
      catch { case _: Throwable => () }
      listeners.foreach(l =>
        try spark.streams.removeListener(l) catch { case _: Throwable => () })
      metricsEndpoint.close()
    }
  }

  /** Compose and start everything. `onStale` is the self-kill hook:
    * called with the stalled query ids when the ingest stops advancing
    * past `staleAfterMs` (the default in [[main]] exits the process,
    * the reference's restart-by-orchestrator contract).
    */
  def start(spark: SparkSession, config: Config,
      registry: Metrics.Registry = Metrics.default,
      onStale: Seq[java.util.UUID] => Unit = _ => ()): Running = {
    graft.Graft.install(spark)
    val tablePath = s"${config.dataDir}/events"

    // observability first, so the ingest's very first progress lands
    val ingestListener = IngestMetrics.listener(registry)
    val watchdog = new Watchdog()
    spark.streams.addListener(ingestListener)
    spark.streams.addListener(watchdog)
    val metricsEndpoint = Metrics.serve(registry, config.metricsPort)

    // ingest: dial upstream with the resolved cursor (override > stored
    // > live), decode, sequence, persist
    val ingest = WebSocketIngress.start(spark, config.wsUrl,
      tablePath, s"${config.dataDir}/checkpoints/ingest",
      trigger = org.apache.spark.sql.streaming.Trigger
        .ProcessingTime(config.ingestTriggerMs),
      cursorOverrideUs = config.overrideCursorUs, format = config.wsFormat,
      metrics = registry, manifestCommits = config.manifestCommits)

    // serve: WebSocket subscribers against the same table; the serving
    // tail starts at the table's current head — history is the
    // sessions' replay job
    // same fresh-boot-vs-breakage discipline as the ingest side: a
    // broken table fails the start instead of serving from head 0
    val headUs = graft.sources.SocketIngress.resumeState(spark, tablePath)._2
    // resumed-over-history restart: the reference's liveness check
    // reads the cursor back and kills on a hung upstream even before
    // this incarnation's first event — arm the stall clock to match
    if (headUs > 0) watchdog.arm(ingest.id)
    val tail = spark.readStream.format("graft-replay")
      .option("path", tablePath)
      .option("cursor", (headUs + 1).toString)
      .load()
    val server = WebSocketServe.start(tail, tablePath,
      s"${config.dataDir}/checkpoints/serve",
      metrics = registry, maxSubRate = Some(config.maxSubRate),
      port = config.listenPort, replayChunkSize = config.serveChunkSize,
      replayThrottle = if (config.replayTargetLagUs > 0)
        Some(new graft.serve.ReplayThrottle(config.replayTargetLagUs))
      else None)

    // maintenance ticker: TTL trim + closed-hour compaction on one
    // thread, the staleness check on ANOTHER — a multi-minute
    // compaction pass must not delay stall detection past the 15 s
    // contract (the reference runs independent goroutine tickers,
    // main.go:152-214)
    val maintenance = new java.util.concurrent.ScheduledThreadPoolExecutor(2,
      (r: Runnable) => { val t = new Thread(r, "graft-service-maintenance"); t.setDaemon(true); t })
    val ttlUs = (config.eventTtlHours * 3600e6).toLong
    maintenance.scheduleWithFixedDelay(() => {
      try {
        Retention.trim(spark, tablePath, ttlUs)
        val hwmHour = System.currentTimeMillis() / 3600000L
        Compaction.compactClosed(spark, tablePath, hwmHour,
          graceMs = config.compactionGraceMs)
      } catch { case e: Throwable =>
        org.slf4j.LoggerFactory.getLogger(getClass)
          .warn(s"maintenance pass failed: ${e.getMessage}")
      }
      if (config.indexJanitor)
        try {
          val swept = graft.ext.IndexStore.janitor(spark, dryRun = false)
          if (swept.nonEmpty)
            org.slf4j.LoggerFactory.getLogger(getClass).info(
              s"index janitor reclaimed ${swept.size}: " +
                swept.map { case (p, why) => s"$p ($why)" }.mkString("; "))
        } catch { case e: Throwable =>
          org.slf4j.LoggerFactory.getLogger(getClass)
            .warn(s"index janitor failed: ${e.getMessage}")
        }
      // registered index refresh, isolated per index: one corpus whose
      // refresh throws (mid-append listing race, a TTL'd source) must
      // not starve the others or the next retention pass
      config.indexRefreshers.foreach { r =>
        try r.refresh(spark)
        catch { case e: Throwable =>
          org.slf4j.LoggerFactory.getLogger(getClass)
            .warn(s"index refresh '${r.name}' failed: ${e.getMessage}")
        }
      }
    }, config.maintenanceIntervalMs, config.maintenanceIntervalMs,
      java.util.concurrent.TimeUnit.MILLISECONDS)
    maintenance.scheduleWithFixedDelay(() => {
      val stalled = watchdog.stalled(config.staleAfterMs)
      if (stalled.contains(ingest.id)) onStale(stalled)
    }, config.staleAfterMs, config.staleAfterMs / 3,
      java.util.concurrent.TimeUnit.MILLISECONDS)

    new Running(ingest, server, metricsEndpoint, watchdog, spark,
      Seq(ingestListener, watchdog), maintenance)
  }

  private def parseArgs(args: Array[String]): Config =
    args.foldLeft(Config(wsUrl = "")) { (c, arg) =>
      arg.split("=", 2) match {
        case Array("--ws-url", v)                => c.copy(wsUrl = v)
        case Array("--ws-format", v)             => c.copy(wsFormat = v)
        case Array("--listen-port", v)           => c.copy(listenPort = v.toInt)
        case Array("--metrics-listen-port", v)   => c.copy(metricsPort = v.toInt)
        case Array("--data-dir", v)              => c.copy(dataDir = v)
        case Array("--event-ttl-hours", v)       => c.copy(eventTtlHours = v.toDouble)
        case Array("--max-sub-rate", v)          => c.copy(maxSubRate = v.toDouble)
        case Array("--override-relay-cursor", v) => c.copy(overrideCursorUs = v.toLong)
        case Array("--maintenance-interval-ms", v) =>
          c.copy(maintenanceIntervalMs = v.toLong)
        case Array("--ingest-trigger-ms", v)     => c.copy(ingestTriggerMs = v.toLong)
        case Array("--serve-chunk-size", v)      => c.copy(serveChunkSize = v.toInt)
        case Array("--manifest-commits", v)      => c.copy(manifestCommits = v.toBoolean)
        case Array("--replay-target-lag-us", v)  => c.copy(replayTargetLagUs = v.toLong)
        case Array("--index-janitor", v)         => c.copy(indexJanitor = v.toBoolean)
        case other => sys.error(s"unknown flag: ${other.mkString("=")}")
      }
    }

  def main(args: Array[String]): Unit = {
    val config = parseArgs(args)
    require(config.wsUrl.nonEmpty, "--ws-url is required")
    val spark = SparkSession.builder()
      .appName("graft-service")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      // FAIR scheduling: replay-pump jobs (pool "graft-replay", set
      // per-step in Cutover.replayStep) share task slots with the live
      // micro-batch instead of queuing behind it — a late joiner
      // catches up DURING generation (VERDICT r15 #6)
      .config("spark.scheduler.mode", "FAIR")
      .getOrCreate()
    val running = start(spark, config, onStale = { stalled =>
      // the reference's self-kill: exit nonzero, the orchestrator
      // restarts with the stored cursor (main.go:184-214)
      System.err.println(s"ingest stalled (${stalled.mkString(",")}); exiting for restart")
      System.exit(1)
    })
    println(s"graft service up: serve=ws://localhost:${running.servePort}/subscribe " +
      s"metrics=http://localhost:${running.metricsPort}/metrics")
    running.ingest.awaitTermination()
  }
}
