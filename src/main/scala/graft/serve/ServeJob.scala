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
    *
    * S20/S21 — `pacing` attaches a per-subscriber token bucket (the
    * reference's `sub.rl`, server.go:211): a micro-batch whose
    * subscriber view exceeds the accumulated budget is the batch twin of
    * the 10k-event buffer overflowing, and the subscriber is dropped
    * (`onDrop`) exactly like the slow-consumer close at
    * server.go:168-175. Unpaced subscribers are unaffected.
    */
  def start(
      events: DataFrame,
      specs: Map[String, Subscribe.SubscriberSpec],
      checkpointDir: String,
      sink: (String, DataFrame) => Unit,
      collectionCol: String = "collection",
      didCol: String = "did",
      pacing: Map[String, TokenBucket] = Map.empty,
      onDrop: String => Unit = _ => ()): StreamingQuery = {
    val dropped = scala.collection.concurrent.TrieMap.empty[String, Unit]
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val wire = Decode.toWire(batch).persist(StorageLevel.MEMORY_AND_DISK)
        try {
          wire.count() // materialize once (the single marshal at server.go:73)
          specs.foreach { case (name, spec) =>
            if (!dropped.contains(name)) {
              val view = wire
                .filter(Subscribe.filterFor(spec, collectionCol, didCol))
                .select("wire")
              val admitted = pacing.get(name) match {
                case Some(bucket) => bucket.tryAcquire(view.count())
                case None => true
              }
              if (admitted) sink(name, view)
              else { dropped.put(name, ()); onDrop(name) } // server.go:168-175
            }
          }
        } finally wire.unpersist()
      }
      .start()
  }
}
