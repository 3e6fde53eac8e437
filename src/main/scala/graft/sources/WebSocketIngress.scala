package graft.sources

import java.net.URI
import java.net.http.{HttpClient, WebSocket}
import java.util.concurrent.CompletionStage

import org.apache.spark.internal.Logging
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.ingest.{Decode, IngestJob}
import graft.store.EventsTable

/** S1 — the reference's ACTUAL transport: a WebSocket dial
  * (`wss://…/subscribe?cursor=…`, cmd/jetstream/main.go:299-317)
  * as a first-class Structured Streaming source,
  * `spark.readStream.format("graft-websocket")`. One WebSocket text
  * message = one wire frame JSON = one `value` row — everything after
  * `load()` (single-pass mixed decode, sequencing, hour-partitioned
  * persist) is the same plumbing every other ingress feeds.
  *
  * Design follows Spark's own socket source (TextSocketMicroBatchStream,
  * public Spark source): the driver holds the connection, messages
  * buffer on the driver, offsets are message counts, and committed
  * prefixes are trimmed. Like that source, the transport itself is
  * non-replayable — durability comes from the UPSTREAM cursor contract
  * (the reference's own model, server.go:274-287): on (re)start the
  * caller dials with `?cursor=<last persisted µs>` ([[WebSocketIngress
  * .start]] does this), and the upstream replays strictly after it, so
  * a crash costs re-delivery, never loss (at-least-once; S16 dedup
  * covers the overlap).
  *
  * Options: `url` (required, `ws://` or `wss://`). The client is JDK
  * `java.net.http.WebSocket` — RFC 6455 handshake, masking, and
  * fragmentation handled by the platform; partial messages (`last =
  * false`) are reassembled before buffering.
  */
class WebSocketFrameProvider extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "graft-websocket"

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), schema.getOrElse(WebSocketFrameSource.FrameSchema))

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source =
    new WebSocketFrameSource(sqlContext, parameters)
}

object WebSocketFrameSource {
  val FrameSchema: StructType = StructType(Seq(StructField("value", StringType)))
}

class WebSocketFrameSource(sqlContext: SQLContext, params: Map[String, String])
    extends Source with Logging {

  override val schema: StructType = WebSocketFrameSource.FrameSchema

  private val url = params.getOrElse("url", throw new IllegalArgumentException(
    "graft-websocket source requires a 'url' option (ws://host:port/path)"))

  // Driver-side message buffer: `base` counts messages already trimmed
  // by commit(), so offset N is always message N since connect — offsets
  // stay stable across trims. All access under `this` lock.
  private val buffer = scala.collection.mutable.ArrayBuffer.empty[String]
  private var base = 0L
  private val partial = new StringBuilder

  private val ws: WebSocket = HttpClient.newHttpClient().newWebSocketBuilder()
    .buildAsync(URI.create(url), new WebSocket.Listener {
      override def onText(w: WebSocket, data: CharSequence, last: Boolean)
          : CompletionStage[_] = {
        WebSocketFrameSource.this.synchronized {
          partial.append(data)
          if (last) { buffer += partial.toString; partial.clear() }
        }
        w.request(1)
        null
      }
      override def onError(w: WebSocket, error: Throwable): Unit =
        logWarning(s"graft-websocket $url: ${error.getMessage}")
    }).join()

  private def toLong(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other => other.json.toLong
  }

  override def getOffset: Option[Offset] = synchronized {
    val head = base + buffer.size
    if (head == 0) None else Some(LongOffset(head))
  }

  /** Deliver messages `(start, end]`. A range at or below the trimmed
    * base (a checkpoint recovery against this non-replayable transport)
    * yields empty — the cursor re-dial, not the buffer, is the recovery
    * path.
    */
  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val rows = synchronized {
      val lo = math.max(start.map(toLong).getOrElse(0L), base)
      val hi = math.max(math.min(toLong(end), base + buffer.size), lo)
      buffer.slice((lo - base).toInt, (hi - base).toInt).toSeq
    }
    val spark = sqlContext.sparkSession
    import spark.implicits._
    org.apache.spark.sql.graft.Bridge.asStreaming(rows.toDF("value"))
  }

  /** Trim the committed prefix (the socket-source memory contract). */
  override def commit(end: Offset): Unit = synchronized {
    val n = math.min(math.max(toLong(end) - base, 0L), buffer.size.toLong).toInt
    if (n > 0) { buffer.remove(0, n); base += n }
  }

  override def stop(): Unit =
    try {
      ws.sendClose(WebSocket.NORMAL_CLOSURE, "stop")
      ws.abort()
    } catch { case _: Throwable => () }
}

/** The WebSocket twin of [[SocketIngress]]: dial → decode → sequence →
  * events table, presenting the table-recovered cursor on the dial URL
  * exactly like the reference's connect loop (main.go:299-317 dials
  * `…/subscribe?cursor=N` and the server replays strictly after N).
  */
object WebSocketIngress {

  /** Decoded envelope events streaming off the WebSocket. */
  def events(spark: SparkSession, url: String): DataFrame =
    Decode.decodeFrames(Decode.parseMixedFrames(
      spark.readStream.format("graft-websocket").option("url", url).load()))

  /** Start the standing ingest: `baseUrl` is dialed with the resume
    * cursor appended (`?cursor=<newest persisted event µs>`, 0 on a
    * fresh table), so restarts re-deliver instead of losing.
    * `cursorOverrideUs ≥ 0` takes precedence over the stored cursor —
    * S29's resolution order (cmd/jetstream/main.go:280-297).
    */
  def start(spark: SparkSession, baseUrl: String,
      tablePath: String, checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime(0L),
      cursorOverrideUs: Long = -1L,
      metrics: graft.serve.Metrics.Registry = graft.serve.Metrics.default): StreamingQuery = {
    val cursor = IngestJob.resolveStartCursor(
      Some(cursorOverrideUs).filter(_ >= 0),
      Some(SocketIngress.resumeCursorUs(spark, tablePath)))
      .getOrElse(0L)
    val sep = if (baseUrl.contains("?")) "&" else "?"
    val prevMax = scala.util.Try(
      IngestJob.recoverMaxTimeUs(EventsTable.read(spark, tablePath))).getOrElse(0L)
    IngestJob.start(events(spark, s"$baseUrl${sep}cursor=$cursor"),
      orderCols = Seq("event_time_us", "did", "type"),
      tablePath = tablePath, checkpointDir = checkpointDir,
      prevMaxUs = prevMax, trigger = trigger, metrics = metrics)
  }
}
