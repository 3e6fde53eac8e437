package graft.serve

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.store.EventsTable

/** Replay→live cutover (reference: cmd/jetstream/server.go:305-337 +
  * the replay-lag gate at :60,100-103 — SURVEY §3.3, §7.4.2).
  *
  * The reference loop: replay from cursor in chunks; while replaying,
  * live events are suppressed for this subscriber; when the replay tail
  * is within `CutoverThresholdUs/2` of the live head, clear the cursor
  * and let the live tail take over; the per-subscriber high-water mark
  * dedups the overlap window.
  *
  * Spark translation (kappa backfill): a batch query over the events
  * table up to a boundary, then the streaming tail starting from that
  * boundary, `union`-ed with hwm-dedup semantics. `replayUnionLive`
  * is the batch twin used by the correctness harness; IngestJob +
  * LiveTail provide the streaming half.
  */
object Replay {

  /** 1 s — replay considered "caught up" within half this (server.go:60,322). */
  val CutoverThresholdUs: Long = 1000000L

  final case class CutoverPlan(replayFromUs: Long, replayUntilUs: Long, liveFromUs: Long)

  /** Decide the backfill/live boundary given the live head position:
    * replay covers [cursor, head]; live takes over for (head, ∞); the
    * subscriber's hwm advances to the replay tail so overlap dedups
    * (server.go:131-134). Future cursor ⇒ no replay, straight to live
    * (server.go:283-286).
    */
  def plan(cursorUs: Long, liveHeadUs: Long): CutoverPlan =
    if (cursorUs > liveHeadUs) CutoverPlan(liveHeadUs + 1, liveHeadUs, liveHeadUs)
    else CutoverPlan(cursorUs, liveHeadUs, liveHeadUs)

  /** Has replay caught up enough to cut over? (server.go:322) */
  def caughtUp(replayTailUs: Long, liveHeadUs: Long): Boolean =
    replayTailUs > liveHeadUs - CutoverThresholdUs / 2

  /** S20 — rate-limited replay chunk: at most `maxEvents` events from
    * the cursor, in order (reference: playback limiter at 10× the
    * 5,000 ev/s sub rate, persist.go:147-149 + server.go:307; the
    * reference's replay loop is exactly repeated calls of this with the
    * returned next-cursor, server.go:305-337). Ingest-side caps are the
    * streaming source options (`maxFilesPerTrigger` /
    * `maxOffsetsPerTrigger`) set by the IngestJob caller; per-consumer
    * egress pacing beyond this stays in the serving layer (SURVEY §4:
    * not a Catalyst concept).
    */
  def replayChunk(spark: SparkSession, path: String, cursorUs: Long,
      maxEvents: Int): DataFrame =
    graft.store.EventsTable.replay(spark, path, cursorUs).limit(maxEvents)

  /** Next cursor after a replay chunk: max(time_us)+1, or the original
    * cursor when the chunk was empty (persist.go:199-203).
    */
  def nextCursor(chunk: DataFrame, cursorUs: Long): Long = {
    val row = chunk.agg(org.apache.spark.sql.functions.max(
      org.apache.spark.sql.functions.col("time_us"))).head()
    if (row.isNullAt(0)) cursorUs else row.getLong(0) + 1
  }

  /** Batch twin of the full replay∪live subscription: cursor range scan
    * unioned with the live slice, deduped by event identity via the hwm
    * rule — every event delivered exactly once, in time_us order.
    */
  def replayUnionLive(
      spark: SparkSession,
      path: String,
      cursorUs: Long,
      liveFromUs: Long): DataFrame = {
    val replay = EventsTable.read(spark, path).filter(col("time_us") >= cursorUs)
    val live = EventsTable.read(spark, path).filter(col("time_us") > liveFromUs)
    replay.union(live)
      .dropDuplicates("time_us") // hwm semantics: same event seen twice → once
      .orderBy(col("time_us"))
  }
}
