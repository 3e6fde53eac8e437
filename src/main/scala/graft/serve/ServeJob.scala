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

  /** The full subscribe surface in one streaming query: cursored
    * subscribers replay from the events table (one paced
    * [[CutoverSession.replayStep]] per micro-batch — the reference's
    * replay goroutine interleaving with `Emit`, server.go:305-337)
    * while the replay-lag gate suppresses their live view; cursorless
    * subscribers live-tail immediately. After cutover everyone is
    * served from the shared micro-batch. `sink` receives in-order
    * event frames per subscriber; delivery is exactly-once per
    * subscriber across the replay→live boundary (CutoverSession's
    * gap-fill).
    *
    * `events` must carry `time_us`/`did`/`collection` (the EventsTable
    * shape — e.g. the graft-replay source over `tablePath`).
    */
  def startSessions(
      events: DataFrame,
      sessions: Map[String, CutoverSession],
      tablePath: String,
      checkpointDir: String,
      sink: (String, DataFrame) => Unit): StreamingQuery = {
    // live head across batches (s.seq, server.go:114) — an idle/empty
    // micro-batch must keep the last head, not reset it (a MinValue
    // head would underflow the cutover margin and stall replay)
    val lastHeadUs = new java.util.concurrent.atomic.AtomicLong(0L)
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val cached = batch.persist(StorageLevel.MEMORY_AND_DISK)
        try {
          val headRow = cached.agg(org.apache.spark.sql.functions.max(
            org.apache.spark.sql.functions.col("time_us"))).head()
          if (!headRow.isNullAt(0))
            lastHeadUs.getAndAccumulate(headRow.getLong(0), math.max)
          val serverSeqUs = lastHeadUs.get()
          sessions.foreach { case (name, s) =>
            if (s.replaying)
              s.replayStep(spark, tablePath, serverSeqUs)(df => sink(name, df))
            sink(name, s.liveEmit(cached))
          }
        } finally cached.unpersist()
      }
      .start()
  }
}
