package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** S22 — keyed ordered parallelism (reference:
  * pkg/client/schedulers/parallel/parallel.go:92-152 — events for the
  * same repo DID process sequentially, different DIDs concurrently, with
  * a per-key FIFO).
  *
  * Spark-native form: `groupByKey(did)` hash-partitions the stream
  * (different keys run on different tasks = the worker pool) and
  * `flatMapGroupsWithState` holds the per-key high-water mark, emitting
  * events in per-key order and flagging regressions — per-key FIFO with
  * cross-key parallelism, state bounded at one long per live key.
  */
object KeyedOrder {

  final case class KeyedEvent(did: String, time_us: Long, payload: String)
  final case class OrderedEvent(did: String, time_us: Long, payload: String, inOrder: Boolean)
  final case class KeyState(maxTimeUs: Long)

  /** S23 — sequential scheduler: the degenerate 1-worker variant with a
    * strict TOTAL order (reference:
    * pkg/client/schedulers/sequential/sequential.go:49-55) — one
    * partition, sorted; the deliberate single-task trade for global
    * ordering, same as the reference's single goroutine.
    */
  def sequential(events: Dataset[KeyedEvent]): Dataset[KeyedEvent] = {
    import events.sparkSession.implicits._
    events.coalesce(1).sortWithinPartitions($"time_us")
  }

  /** transformWithState form of the per-key hwm processor (Spark 4's
    * successor API to flatMapGroupsWithState — typed ValueState, state
    * TTL support, RocksDB-backed). Same semantics as [[process]].
    */
  class PerKeyHwmProcessor extends StatefulProcessor[String, KeyedEvent, OrderedEvent] {
    @transient private var hwm: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      hwm = getHandle.getValueState[Long]("hwm", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[KeyedEvent],
        timers: TimerValues): Iterator[OrderedEvent] = {
      var cur = if (hwm.exists()) hwm.get() else Long.MinValue
      val out = rows.toSeq.sortBy(_.time_us).map { e =>
        val ok = e.time_us > cur
        if (ok) cur = e.time_us
        OrderedEvent(e.did, e.time_us, e.payload, ok)
      }
      hwm.update(cur)
      out.iterator
    }
  }

  /** [[process]] via transformWithState (requires the RocksDB state
    * store provider, which transformWithState mandates).
    */
  def processTws(events: Dataset[KeyedEvent]): Dataset[OrderedEvent] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.did)
      .transformWithState(new PerKeyHwmProcessor, TimeMode.None(), OutputMode.Append())
  }

  def process(events: Dataset[KeyedEvent]): Dataset[OrderedEvent] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.did)
      .flatMapGroupsWithState[KeyState, OrderedEvent](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (did: String, batch: Iterator[KeyedEvent], state: GroupState[KeyState]) =>
          val prev = state.getOption.map(_.maxTimeUs).getOrElse(Long.MinValue)
          // per-key order within the batch; state carries order across batches
          val sorted = batch.toSeq.sortBy(_.time_us)
          var hwm = prev
          val out = sorted.map { e =>
            val ok = e.time_us > hwm
            if (ok) hwm = e.time_us
            OrderedEvent(e.did, e.time_us, e.payload, ok)
          }
          state.update(KeyState(hwm))
          out.iterator
      }
  }
}
