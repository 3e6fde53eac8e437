package graft.serve

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{broadcast, col, count, lit, when}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.storage.StorageLevel

import graft.ingest.Decode

/** S17 streaming — the fan-out serving job: ONE streaming query over the
  * event tail, N subscriber sinks per micro-batch.
  *
  * Reference: `Server.Emit` (cmd/jetstream/server.go:62-116) marshals
  * each event to JSON once (:73) and then fans the bytes out to every
  * subscriber under a 100-wide concurrency semaphore (:89-111), each
  * subscriber applying its own filters. The Spark twin: inside
  * `foreachBatch` the batch is wire-serialized once and `persist()`ed,
  * then every subscriber sink runs its predicate + write against the
  * cached batch — serialize-once, filter-per-subscriber, no
  * recomputation per sink (SURVEY §4 "common-subplan reuse: deliberate,
  * not automatic").
  *
  * Scale posture of the admission path: every subscriber's batch count
  * comes from [[admissionCounts]] — the wanted-sets become a tiny
  * BROADCAST spec table, one hash-join pass per key shape tags matching
  * events, and `groupBy(subscriber)` counts them (≤4 Spark jobs at ANY
  * subscriber count); sinks then dispatch on a bounded thread pool —
  * the reference's semaphore. The earlier shapes both fail at scale: a
  * `view.count()` job per paced subscriber is O(N) serial driver
  * submissions, and N conditional-count aggregate expressions in one
  * agg defeat codegen (measured 21 s/batch at N=1000 over 1M rows vs
  * ~1 s for the broadcast probe — ScaleSmoke's admission section).
  */
object ServeJob {

  /** Reference fan-out concurrency (server.go:89 `sem := make(chan
    * struct{}, 100)`).
    */
  val DefaultFanOutWidth = 100

  /** A spec whose wanted-set combination explodes past this many rows
    * falls back to the conditional-count path (the broadcast table must
    * stay broadcast-sized).
    */
  val MaxComboRowsPerSpec = 4096

  /** Every subscriber's admission count over the cached wire batch in a
    * CONSTANT number of Spark jobs (≤6), independent of subscriber
    * count. Specs with explicit wanted-sets become rows of a tiny
    * broadcast table — (sub, collection, did, hwm) combos, or the
    * single-key variants — and ONE hash-join pass per key shape tags
    * matching events, `groupBy(sub)` counts them. Pass-all specs (no
    * wanted-sets) reduce to `count(when(time_us > hwm))` conditional
    * counts in one aggregation. A 1,000-conditional-count agg measured
    * 21 s over a 1M-row batch (the expression count defeats codegen);
    * the broadcast probe form is one hash lookup per event per shape.
    */
  private[graft] def admissionCounts(
      wire: DataFrame,
      specs: Map[String, Subscribe.SubscriberSpec],
      collectionCol: String, didCol: String): Map[String, Long] = {
    import org.apache.spark.sql.Row
    val spark = wire.sparkSession
    import spark.implicits._

    def grouped(tagged: DataFrame): Map[String, Long] =
      tagged.filter(col("time_us") > col("__hwm"))
        .groupBy(col("__sub")).agg(count(lit(1)))
        .collect().map { case Row(n: String, c: Long) => n -> c }.toMap

    val (both, rest0) = specs.partition { case (_, s) =>
      s.wantedCollections.nonEmpty && s.wantedDids.nonEmpty &&
        s.wantedCollections.size.toLong * s.wantedDids.size <= MaxComboRowsPerSpec
    }
    val (didOnly, rest1) = rest0.partition { case (_, s) =>
      s.wantedCollections.isEmpty && s.wantedDids.nonEmpty &&
        s.wantedDids.size <= MaxComboRowsPerSpec
    }
    val (collOnly, scanned) = rest1.partition { case (_, s) =>
      s.wantedDids.isEmpty && s.wantedCollections.nonEmpty &&
        s.wantedCollections.size <= MaxComboRowsPerSpec
    }

    // rows with no collection (identity/account events) pass the
    // collection half of every spec (server.go:119's `collection != ""`
    // guard) — counted separately below, per shape
    val noColl = col(collectionCol).isNull || col(collectionCol) === ""

    // every broadcast spec table dedupes its wanted values: a
    // user-supplied duplicate (wantedDids=a,a) would otherwise produce
    // duplicate join rows and double-count admitted events — inflating
    // the counts that drive pacing/overflow drops (the Column path's
    // isin() is naturally set-semantic; the probe tables must agree)
    val bothCounts = if (both.isEmpty) Map.empty[String, Long] else grouped {
      val combos = both.toSeq.flatMap { case (n, s) =>
        for (c <- s.wantedCollections.distinct; d <- s.wantedDids.distinct)
          yield (n, c, d, s.hwmUs)
      }.toDF("__sub", "__coll", "__did", "__hwm")
      wire.join(broadcast(combos),
        col(collectionCol) === col("__coll") && col(didCol) === col("__did"))
    }
    // non-commit rows reaching a coll+did spec: did must still match
    val bothNullCounts = if (both.isEmpty) Map.empty[String, Long] else grouped {
      val dids = both.toSeq.flatMap { case (n, s) =>
        s.wantedDids.distinct.map(d => (n, d, s.hwmUs))
      }.toDF("__sub", "__did", "__hwm")
      wire.filter(noColl).join(broadcast(dids), col(didCol) === col("__did"))
    }
    val didCounts = if (didOnly.isEmpty) Map.empty[String, Long] else grouped {
      val dids = didOnly.toSeq.flatMap { case (n, s) =>
        s.wantedDids.distinct.map(d => (n, d, s.hwmUs))
      }.toDF("__sub", "__did", "__hwm")
      wire.join(broadcast(dids), col(didCol) === col("__did"))
    }
    val collCounts = if (collOnly.isEmpty) Map.empty[String, Long] else grouped {
      val colls = collOnly.toSeq.flatMap { case (n, s) =>
        s.wantedCollections.distinct.map(c => (n, c, s.hwmUs))
      }.toDF("__sub", "__coll", "__hwm")
      wire.join(broadcast(colls), col(collectionCol) === col("__coll"))
    }
    // non-commit rows pass a collection-only spec outright; only the
    // hwm differs per spec, and distinct hwms are few — one aggregation
    val collNullByHwm: Map[Long, Long] = if (collOnly.isEmpty) Map.empty else {
      val hwms = collOnly.values.map(_.hwmUs).toSeq.distinct
      val aggs = hwms.map(hv => count(when(col("time_us") > hv, true)).as(s"h$hv"))
      val row = wire.filter(noColl).agg(aggs.head, aggs.tail: _*).head()
      hwms.zipWithIndex.map { case (hv, i) => hv -> row.getLong(i) }.toMap
    }
    // pass-all specs (and oversized wanted-sets): one aggregation of
    // per-spec conditional counts — cheap predicates, and typically few
    val scanCounts = if (scanned.isEmpty) Map.empty[String, Long] else {
      val names = scanned.keys.toSeq.sorted
      val cols = names.map { n =>
        count(when(Subscribe.filterFor(scanned(n), collectionCol, didCol), true)).as(n)
      }
      val row = wire.agg(cols.head, cols.tail: _*).head()
      names.zipWithIndex.map { case (n, i) => n -> row.getLong(i) }.toMap
    }
    specs.keys.map { n =>
      val base = bothCounts.orElse(didCounts).orElse(collCounts).orElse(scanCounts)
        .applyOrElse(n, (_: String) => 0L)
      val nullPart =
        if (both.contains(n)) bothNullCounts.getOrElse(n, 0L)
        else if (collOnly.contains(n)) collNullByHwm.getOrElse(collOnly(n).hwmUs, 0L)
        else 0L
      n -> (base + nullPart)
    }.toMap
  }

  /** Run `f` over `items` on a bounded pool, rethrowing the first
    * failure. Pool width is the reference's fan-out semaphore.
    */
  private[graft] def onPool[A](items: Seq[A], width: Int)(f: A => Unit): Unit = {
    if (items.isEmpty) return
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(width, items.size))
    try {
      val futures = items.map { i =>
        pool.submit(new Runnable { def run(): Unit = f(i) })
      }
      futures.foreach { fut =>
        try fut.get()
        catch { case e: java.util.concurrent.ExecutionException => throw e.getCause }
      }
    } finally pool.shutdown()
  }

  /** Start the fan-out: `events` is the streaming event tail (e.g. the
    * graft-replay source); each spec gets `sink(name, filteredWireDf)`
    * invoked per micro-batch with only its events. Sinks run
    * concurrently (width `fanOutWidth`) — a sink must be thread-safe
    * across subscriber names, exactly like the reference's per-
    * subscriber goroutines.
    *
    * S20/S21 — `pacing` attaches a per-subscriber token bucket (the
    * reference's `sub.rl`, server.go:211): a micro-batch whose
    * subscriber view exceeds the accumulated budget is the batch twin of
    * the 10k-event buffer overflowing, and the subscriber is dropped
    * (`onDrop`) exactly like the slow-consumer close at
    * server.go:168-175. Unpaced subscribers are unaffected.
    *
    * `trigger` defaults to AvailableNow (drain-and-stop — the test and
    * backfill form); pass `Trigger.ProcessingTime(...)` for the standing
    * live tail (the reference's subscription is a server.go:340-356
    * write loop that runs until disconnect).
    */
  def start(
      events: DataFrame,
      specs: Map[String, Subscribe.SubscriberSpec],
      checkpointDir: String,
      sink: (String, DataFrame) => Unit,
      collectionCol: String = "collection",
      didCol: String = "did",
      pacing: Map[String, TokenBucket] = Map.empty,
      onDrop: String => Unit = _ => (),
      fanOutWidth: Int = DefaultFanOutWidth,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val dropped = scala.collection.concurrent.TrieMap.empty[String, Unit]
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val active = specs.keys.filterNot(dropped.contains).toSeq.sorted
        if (active.nonEmpty) {
          val wire = Decode.toWire(batch).persist(StorageLevel.MEMORY_AND_DISK)
          try {
            // ≤4 jobs total (the first also materializes the cache —
            // the single marshal at server.go:73): every subscriber's
            // admission count via the broadcast-tag probe, however many
            // subscribers exist
            val counts = admissionCounts(
              wire, active.map(n => n -> specs(n)).toMap, collectionCol, didCol)
            val admitted = active.filter { name =>
              pacing.get(name).forall(_.tryAcquire(counts(name))) || {
                dropped.put(name, ()); onDrop(name); false // server.go:168-175
              }
            }
            onPool(admitted, fanOutWidth) { name =>
              val view = wire
                .filter(Subscribe.filterFor(specs(name), collectionCol, didCol))
                .select("wire")
              sink(name, view)
            }
          } finally wire.unpersist()
        }
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
    * Sessions dispatch on the bounded pool — each session's
    * replay-then-live sequence stays ordered WITHIN its pooled task
    * (the per-subscriber goroutine), while independent subscribers
    * progress concurrently. `sink` must be thread-safe across names.
    *
    * `events` must carry `time_us`/`did`/`collection` (the EventsTable
    * shape — e.g. the graft-replay source over `tablePath`).
    */
  def startSessions(
      events: DataFrame,
      sessions: Map[String, CutoverSession],
      tablePath: String,
      checkpointDir: String,
      sink: (String, DataFrame) => Unit,
      fanOutWidth: Int = DefaultFanOutWidth,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    // live head across batches (s.seq, server.go:114) — an idle/empty
    // micro-batch must keep the last head, not reset it (a MinValue
    // head would underflow the cutover margin and stall replay)
    val lastHeadUs = new java.util.concurrent.atomic.AtomicLong(0L)
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val cached = batch.persist(StorageLevel.MEMORY_AND_DISK)
        try {
          val headRow = cached.agg(org.apache.spark.sql.functions.max(col("time_us"))).head()
          if (!headRow.isNullAt(0))
            lastHeadUs.getAndAccumulate(headRow.getLong(0), math.max)
          val serverSeqUs = lastHeadUs.get()
          onPool(sessions.toSeq.sortBy(_._1), fanOutWidth) { case (name, s) =>
            if (s.replaying)
              s.replayStep(spark, tablePath, serverSeqUs)(df => sink(name, df))
            sink(name, s.liveEmit(cached))
          }
        } finally cached.unpersist()
      }
      .start()
  }
}
