package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.ingest.Decode
import graft.model.Event
import graft.store.EventsTable

/** Wire-format file interchange: the reference's websocket frame JSON
  * (README.md:60-129), one event per line — the export/import format a
  * jetstream user already has on disk from `websocat … > events.jsonl`.
  *
  * `write` serializes through the same [[Decode.toWire]] path the
  * serving layer uses (omitted nulls, re-inlined raw record JSON) and
  * partitions by `event_hour`, so an exported directory supports the
  * same partition-pruned time-range reads as the parquet log. `read`
  * parses lines against the wire schema — the same `from_json` surface
  * as the S24 client source — returning envelope rows that feed every
  * query in this library.
  *
  * Wire text is write-once canonical: `read(write(events))` re-emits
  * byte-identical lines (WireFilesSpec), so export→import→export is
  * lossless.
  */
object WireFiles {

  /** Export events as hour-partitioned wire JSON lines. */
  def write(events: DataFrame, path: String): Unit = {
    val hour = (col("time_us") / EventsTable.HourUs).cast("long")
    Decode.toWire(events)
      .select(col("wire"), hour.as(EventsTable.PartitionCol))
      .write.mode(SaveMode.Append)
      .partitionBy(EventsTable.PartitionCol)
      .text(path)
  }

  /** Import wire JSON lines back into envelope rows. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.textFile(path).toDF("value")
      .select(from_json(col("value"), Event.wireSchema).as("e"))
      .select(col("e.*"))
}
