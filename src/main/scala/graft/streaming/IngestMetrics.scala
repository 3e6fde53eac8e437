package graft.streaming

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener.{
  QueryIdleEvent, QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}

import graft.serve.Metrics

/** Consumer-side metric parity (pkg/consumer/metrics.go:8-58) as a
  * [[StreamingQueryListener]]: the reference counts per event inside
  * its handler; the Spark-native equivalent reads each micro-batch's
  * progress — row counts from the source, event-time positions from
  * the `observe()` aggregates [[LiveTail.withTailObservation]] already
  * piggybacks on the plan — and folds them into a [[Metrics.Registry]]
  * the `/metrics` endpoint serves. No extra jobs, no second
  * aggregation: everything here is read off work the stream already
  * did.
  *
  * Series (consumer_* → graft_consumer_*, label `socket_url` → the
  * query name, which for graft ingests carries the source identity):
  *   - `graft_consumer_events_processed_total{query}`   (metrics.go:8-11)
  *   - `graft_consumer_event_processing_duration_seconds{query}`
  *     histogram of per-batch trigger execution, the reference's
  *     exponential buckets (metrics.go:18-22)
  *   - `graft_consumer_last_seq{query}`                 (metrics.go:24-27)
  *   - `graft_consumer_last_evt_processed_at{query}`    (metrics.go:29-32)
  *   - `graft_consumer_last_evt_created_at{query}`      (metrics.go:34-37)
  *   - `graft_consumer_last_evt_created_evt_processed_gap{query}`
  *     seconds, end-to-end freshness (metrics.go:39-42)
  * Timestamps are µs-since-epoch (the engine's event-time unit; the
  * reference publishes ns — unit is a label-free scale choice, the
  * shape is what transfers).
  */
object IngestMetrics {

  /** The reference's histogram buckets: ExponentialBuckets(0.0001, 2, 18). */
  val DurationBuckets: Array[Double] = Metrics.exponentialBuckets(0.0001, 2, 18)

  /** Build the listener. Attach with
    * `spark.streams.addListener(IngestMetrics.listener(registry))`;
    * detach with `removeListener` when done (tests; standing jobs keep
    * it for the process lifetime, like the reference's promauto
    * globals).
    */
  def listener(registry: Metrics.Registry = Metrics.default,
      observationName: String = "graft_tail"): StreamingQueryListener =
    new StreamingQueryListener {
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryIdle(e: QueryIdleEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        val q = Option(p.name).getOrElse(p.id.toString)
        if (p.numInputRows > 0)
          registry.counter("graft_consumer_events_processed_total",
            "Total events processed by the ingest stream", "query" -> q)
            .add(p.numInputRows.toDouble)
        val trigMs = p.durationMs.getOrDefault("triggerExecution", 0L)
        if (trigMs > 0L)
          registry.histogram("graft_consumer_event_processing_duration_seconds",
            "Micro-batch processing duration", DurationBuckets, "query" -> q)
            .observe(trigMs / 1000.0)
        val nowUs = java.time.Instant.parse(p.timestamp).toEpochMilli * 1000L
        registry.gauge("graft_consumer_last_evt_processed_at",
          "Batch timestamp of the last progress, us", "query" -> q)
          .set(nowUs.toDouble)
        Option(p.observedMetrics.get(observationName)).foreach { row =>
          // per-type / per-op-kind counts (events_processed{event_type},
          // ops_processed{kind} — metrics.go:8-16; op_path is omitted:
          // an unbounded-cardinality label doesn't fit a fixed
          // observation row, the per-collection view is a query)
          def counted(field: String, family: String, help: String,
              label: (String, String)): Unit =
            if (row.schema.fieldNames.contains(field) &&
                !row.isNullAt(row.schema.fieldIndex(field))) {
              val n = row.getLong(row.schema.fieldIndex(field))
              if (n > 0)
                registry.counter(family, help, "query" -> q, label).add(n.toDouble)
            }
          Seq("n_commit" -> graft.model.Event.TypeCommit,
            "n_identity" -> graft.model.Event.TypeIdentity,
            "n_account" -> graft.model.Event.TypeAccount).foreach { case (f, t) =>
            counted(f, "graft_consumer_events_by_type_total",
              "Events processed by envelope type", "event_type" -> t)
          }
          Seq("n_op_create" -> graft.model.Event.CommitCreate,
            "n_op_update" -> graft.model.Event.CommitUpdate,
            "n_op_delete" -> graft.model.Event.CommitDelete).foreach { case (f, k) =>
            counted(f, "graft_consumer_ops_processed_total",
              "Repo operations processed by kind", "kind" -> k)
          }
          val i = row.schema.fieldIndex("max_time_us")
          if (!row.isNullAt(i)) {
            val maxUs = row.getLong(i)
            registry.gauge("graft_consumer_last_seq",
              "Sequence (time_us) of the last event processed", "query" -> q)
              .set(maxUs.toDouble)
            registry.gauge("graft_consumer_last_evt_created_at",
              "Event time of the last event processed, us", "query" -> q)
              .set(maxUs.toDouble)
            registry.gauge("graft_consumer_last_evt_created_evt_processed_gap",
              "Seconds between last event's event time and its processing",
              "query" -> q)
              .set((nowUs - maxUs) / 1e6)
          }
        }
      }
    }
}
