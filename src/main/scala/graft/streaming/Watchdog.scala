package graft.streaming

import java.util.concurrent.atomic.{AtomicLong, AtomicReference}

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener.{QueryIdleEvent, QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}

/** S28 — liveness/staleness monitor (reference:
  * cmd/jetstream/main.go:184-214 — every 15 s compare the consumer's
  * last_seq to the previous reading; if unchanged while nonzero, the
  * process self-kills and the orchestrator restarts it).
  *
  * Spark-native form: a StreamingQueryListener tracking rows-processed
  * progress per query. `stalled(staleAfterMs)` reports queries whose
  * input has been zero for longer than the threshold while having
  * processed data before — the restart decision stays with the caller
  * (orchestrator), exactly as in the reference (docker restart policy).
  */
final class Watchdog(nowMs: () => Long = () => System.currentTimeMillis())
    extends StreamingQueryListener {

  final case class State(totalRows: Long, lastProgressMs: Long, everProgressed: Boolean)

  private val states = new AtomicReference[Map[java.util.UUID, State]](Map.empty)

  // CAS loop, not get-then-set: `arm()` is called off the listener-bus
  // thread (Service.start), and a lost update there would silently
  // erase the arm — the resumed-over-history self-kill would never fire
  private def update(id: java.util.UUID)(f: Option[State] => State): Unit =
    states.updateAndGet(cur => cur + (id -> f(cur.get(id))))

  override def onQueryStarted(event: QueryStartedEvent): Unit =
    update(event.id)(_ => State(0L, nowMs(), everProgressed = false))

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val rows = event.progress.numInputRows
    update(event.progress.id) {
      case Some(s) if rows > 0 =>
        State(s.totalRows + rows, nowMs(), everProgressed = true)
      case Some(s) => s // zero-row batch: progress clock does NOT advance
      case None => State(rows, nowMs(), everProgressed = rows > 0)
    }
  }

  override def onQueryIdle(event: QueryIdleEvent): Unit = ()

  /** Arm the stall clock for a query that RESUMES over existing
    * history: the reference recovers `seq` from its cursor file, so a
    * restarted consumer with a hung upstream trips the nonzero-seq
    * check even though THIS process never saw an event
    * (main.go:199-203 with the read-back cursor). Without arming, a
    * freshly restarted query keeps everProgressed=false and a dead
    * upstream never triggers the self-kill. No-op for queries that
    * already progressed.
    */
  def arm(id: java.util.UUID): Unit =
    update(id) {
      case Some(s) => s.copy(everProgressed = true)
      case None => State(0L, nowMs(), everProgressed = true)
    }

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit =
    states.updateAndGet(_ - event.id)

  /** Queries that processed data before but have seen no input rows for
    * more than `staleAfterMs` (reference: 15 s, main.go:188).
    */
  def stalled(staleAfterMs: Long): Seq[java.util.UUID] = {
    val now = nowMs()
    states.get().collect {
      case (id, s) if s.everProgressed && now - s.lastProgressMs > staleAfterMs => id
    }.toSeq
  }

  /** Total rows seen per live query (the last_seq analog). */
  def progress: Map[java.util.UUID, Long] =
    states.get().map { case (id, s) => id -> s.totalRows }
}
