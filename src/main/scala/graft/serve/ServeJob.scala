package graft.serve

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.storage.StorageLevel

import graft.ingest.Decode

/** S17 streaming — the fan-out serving job: ONE streaming query over the
  * event tail, N subscriber sinks per micro-batch.
  *
  * Reference: `Server.Emit` (cmd/jetstream/server.go:62-116) marshals
  * each event to JSON once (:73) and then fans the bytes out to every
  * subscriber under a concurrency semaphore (:89-111), each subscriber
  * applying its own filters. The Spark twin: inside `foreachBatch` the
  * batch is wire-serialized once and `persist()`ed, then every
  * subscriber sink runs its predicate + write against the cached batch —
  * serialize-once, filter-per-subscriber, no recomputation per sink
  * (SURVEY §4 "common-subplan reuse: deliberate, not automatic").
  */
object ServeJob {

  /** Start the fan-out: `events` is the streaming event tail (e.g. the
    * graft-replay source); each spec gets `sink(name, filteredWireDf)`
    * invoked per micro-batch with only its events.
    */
  def start(
      events: DataFrame,
      specs: Map[String, Subscribe.SubscriberSpec],
      checkpointDir: String,
      sink: (String, DataFrame) => Unit,
      collectionCol: String = "collection",
      didCol: String = "did"): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val wire = Decode.toWire(batch).persist(StorageLevel.MEMORY_AND_DISK)
        try {
          wire.count() // materialize once (the single marshal at server.go:73)
          specs.foreach { case (name, spec) =>
            sink(name, wire
              .filter(Subscribe.filterFor(spec, collectionCol, didCol))
              .select("wire"))
          }
        } finally wire.unpersist()
      }
      .start()
}
