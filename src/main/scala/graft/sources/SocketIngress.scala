package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ingest.{Decode, IngestJob}
import graft.store.EventsTable

/** S1 — network ingress for the live tail: a standing TCP connection
  * delivering line-delimited frame JSON (the reference dials a
  * WebSocket and consumes frames until shutdown,
  * cmd/jetstream/main.go:299-317; the framing here is the same wire
  * JSON, one frame per line). The transport is Spark's built-in
  * `socket` source — a real process-boundary ingress for demos and
  * integration specs; a production deployment swaps in a durable bus
  * or a DSv2 WebSocket source with IDENTICAL downstream plumbing,
  * because everything after `load()` — the single-pass mixed decode,
  * monotonic sequencing, hour-partitioned persist — is the same code
  * path every other source feeds.
  *
  * Resume contract (the reference's cursor dance,
  * cmd/jetstream/server.go:274-287 + pkg/consumer/persist.go:41-87):
  * the CLIENT owns the cursor. [[resumeCursorUs]] recovers
  * `max(event_time_us)` from the persisted table; the caller presents
  * it to the upstream server on (re)connect and the upstream replays
  * strictly after it — so a crash between micro-batches costs
  * re-delivery, never loss (at-least-once, the same dedup surface S16
  * already applies to replayed frames).
  */
object SocketIngress {

  /** Decoded envelope events streaming off the socket: one JSON frame
    * per line → the single-pass mixed decode (commit op-explode +
    * identity/account envelopes, malformed frames dropped).
    */
  def events(spark: SparkSession, host: String, port: Int): DataFrame =
    Decode.decodeFrames(Decode.parseMixedFrames(
      spark.readStream.format("socket")
        .option("host", host).option("port", port).load()))

  /** The persisted table, or None while it is still empty/absent (a
    * fresh ingest has nothing to recover from). Only fresh-boot
    * analysis failures map to None — a BROKEN table must fail the
    * start, not silently resume with cursor 0 and re-ingest the whole
    * upstream history as duplicates.
    */
  private def tableIfAny(spark: SparkSession, tablePath: String)
      : Option[DataFrame] = {
    val p = new Path(tablePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else try Some(EventsTable.read(spark, tablePath))
    catch { case e: org.apache.spark.sql.AnalysisException
        if ReplayTailSource.isFreshBoot(e) => None }
  }

  /** The cursor to present upstream on (re)connect: the newest
    * upstream event time already persisted (0 on a fresh table).
    */
  def resumeCursorUs(spark: SparkSession, tablePath: String): Long =
    resumeState(spark, tablePath)._1

  /** Both recovery marks — the upstream resume cursor
    * (max event_time_us) and the sequencer high-water mark
    * (max time_us) — in ONE aggregate pass over the table, so a
    * restart scans the log once, not once per mark. (0, 0) on a fresh
    * table.
    */
  def resumeState(spark: SparkSession, tablePath: String): (Long, Long) =
    tableIfAny(spark, tablePath).map { t =>
      val row = t.agg(max(col("event_time_us")), max(col("time_us"))).head()
      (if (row.isNullAt(0)) 0L else row.getLong(0),
        if (row.isNullAt(1)) 0L else row.getLong(1))
    }.getOrElse((0L, 0L))

  /** Start the standing ingest: socket frames → decode → sequence →
    * events table. The sequencer high-water mark is recovered from the
    * table itself (the reference's cursor read-back on startup,
    * cmd/jetstream/main.go:280-297), so restarts never re-issue or
    * regress `time_us`.
    */
  def start(spark: SparkSession, host: String, port: Int,
      tablePath: String, checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery = {
    val prevMax = resumeState(spark, tablePath)._2
    IngestJob.start(events(spark, host, port),
      orderCols = Seq("event_time_us", "did", "type"),
      tablePath = tablePath, checkpointDir = checkpointDir,
      prevMaxUs = prevMax, trigger = trigger)
  }
}
