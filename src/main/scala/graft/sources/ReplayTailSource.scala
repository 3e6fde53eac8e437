package graft.sources

import org.apache.spark.internal.Logging
import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** S1/S13/S19 — the jetstream subscription as a first-class Structured
  * Streaming source (`spark.readStream.format("graft-replay")`): a
  * cursor-offset tail over the events table.
  *
  * Offset domain = `time_us` (exactly the reference's cursor domain,
  * cmd/jetstream/server.go:274-287): each micro-batch delivers
  * `(prevOffset, head]` in sequence order. Starting from a historical
  * `cursor` option IS replay; once caught up the same query is the live
  * tail — the replay→live cutover (server.go:305-337) falls out of the
  * micro-batch loop instead of being a hand-written state machine, and
  * the offset checkpoint gives cursor-resume across restarts
  * (reference: persist.go:41-87 cursor read-back).
  *
  * Options:
  *   - `path`   (required): events table location (EventsTable layout)
  *   - `cursor` (optional µs, default 0): first event delivered is the
  *     earliest with `time_us >= cursor`; a future cursor waits for live
  *     events — "future cursor → live" (server.go:283-286) for free
  *   - `maxEventsPerBatch` (optional): ingest-rate cap per micro-batch
  *     (S20 twin of `maxOffsetsPerTrigger`)
  *
  * Scale notes: `getOffset` is one driver-side max() over the table's
  * fresh tail (same cost class as FileStreamSource's directory listing);
  * `getBatch` plans a pruned range scan — partition + row-group
  * skipping via the EventsTable layout, so a batch touches only the
  * hours it covers.
  */
class ReplayTailProvider extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "graft-replay"

  private def tableSchema(sqlContext: SQLContext, params: Map[String, String]): StructType =
    sqlContext.sparkSession.read.parquet(ReplayTailSource.path(params)).schema

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), schema.getOrElse(tableSchema(sqlContext, parameters)))

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source =
    new ReplayTailSource(sqlContext,
      schema.getOrElse(tableSchema(sqlContext, parameters)), parameters)
}

object ReplayTailSource {
  def path(params: Map[String, String]): String =
    params.getOrElse("path", throw new IllegalArgumentException(
      "graft-replay source requires a 'path' option (events table location)"))
}

class ReplayTailSource(
    sqlContext: SQLContext,
    override val schema: StructType,
    params: Map[String, String]) extends Source with Logging {

  private val tablePath = ReplayTailSource.path(params)
  private val cursorUs = params.get("cursor").map(_.toLong).getOrElse(0L)
  private val maxPerBatch = params.get("maxEventsPerBatch").map(_.toLong)

  private def toLong(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other => other.json.toLong
  }

  private def table: DataFrame = sqlContext.sparkSession.read.parquet(tablePath)

  /** Head of the log (None until an event at/after the cursor exists). */
  override def getOffset: Option[Offset] = {
    val row = table.filter(col("time_us") >= cursorUs)
      .agg(max(col("time_us"))).head()
    if (row.isNullAt(0)) None
    else {
      val head = row.getLong(0)
      val capped = maxPerBatch match {
        case Some(cap) =>
          // rate cap: advance the offset only to the cap-th event of the range
          val prev = delivered.getOrElse(cursorUs - 1)
          val chunk = table
            .filter(col("time_us") > prev && col("time_us") <= head)
            .orderBy(col("time_us")).limit(cap.toInt)
            .agg(max(col("time_us"))).head()
          if (chunk.isNullAt(0)) head else chunk.getLong(0)
        case None => head
      }
      Some(LongOffset(capped))
    }
  }

  /** Tail of the last planned batch — the rate-cap cursor. Tracked at
    * getBatch time (the engine's commit callback arrives on the
    * connector-level overload, which is unreliable to intercept from a
    * DSv1 source).
    */
  @volatile private var delivered: Option[Long] = None

  /** Deliver `(start, end]` in sequence order, pruned at the scan. */
  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val lower = start.map(toLong).getOrElse(cursorUs - 1)
    val upper = toLong(end)
    logInfo(s"graft-replay batch ($lower, $upper]")
    delivered = Some(upper)
    org.apache.spark.sql.graft.Bridge.asStreaming(
      table.filter(col("time_us") > lower && col("time_us") <= upper))
  }

  override def stop(): Unit = ()
}
