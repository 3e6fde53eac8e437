package graft.serve

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.store.EventsTable

/** End-to-end replay-lag-gate lifecycle: a subscriber starting from a
  * historical cursor replays in chunks with live suppressed, cuts over
  * within CutoverThresholdUs/2 of the head, and the overlap dedups —
  * server.go:60,100-103,305-337 driven as one interleaved session.
  */
class CutoverSpec extends SparkSpec {
  import spark.implicits._

  private val Step = 100000L // 100ms in µs; CutoverThresholdUs = 1s = 10 steps

  private def append(path: String, ids: Range): Unit =
    EventsTable.append(
      ids.map(i => (i * Step, s"did${i % 3}", if (i % 2 == 0) "post" else "like"))
        .toDF("time_us", "did", "collection"),
      path)

  private def collectUs(df: DataFrame): Seq[Long] =
    df.select("time_us").as[Long].collect().toSeq

  test("replay→live cutover: gate suppresses far live, exactly-once, in-order") {
    val path = tmpDir("cutover-e2e")
    append(path, 1 to 60) // historical backlog: 0.1s..6s
    var serverSeq = 60 * Step
    val session = new CutoverSession(
      Subscribe.SubscriberSpec(), startCursorUs = 1 * Step, chunkSize = 10)

    val delivered = ArrayBuffer.empty[Long] // in delivery order
    var liveSuppressedWhileReplaying = false
    var liveNext = 61

    // interleave: one replay chunk per tick, then 3 new live events arrive
    // and are offered through the Emit gate
    var ticks = 0
    while (session.replaying && ticks < 100) {
      ticks += 1
      session.replayStep(spark, path, serverSeq)(df => delivered ++= collectUs(df))
      if (session.replaying) { // live keeps flowing during replay
        val batch = (liveNext until liveNext + 3)
        append(path, batch)
        serverSeq = (batch.last) * Step
        val liveView = session.liveEmit(
          batch.map(i => (i * Step, s"did${i % 3}", if (i % 2 == 0) "post" else "like"))
            .toDF("time_us", "did", "collection"))
        val got = collectUs(liveView)
        if (got.isEmpty) liveSuppressedWhileReplaying = true
        delivered ++= got
        liveNext += 3
      }
    }
    assert(!session.replaying, s"never cut over after $ticks ticks")
    // replay gains 10/tick, live 3/tick: the gate must have suppressed during replay
    assert(liveSuppressedWhileReplaying, "live was never suppressed while replaying")

    // after cutover: pure live tail, gate off, hwm keeps deduping
    (0 until 3).foreach { _ =>
      val batch = (liveNext until liveNext + 3)
      append(path, batch)
      delivered ++= collectUs(session.liveEmit(
        batch.map(i => (i * Step, s"did${i % 3}", if (i % 2 == 0) "post" else "like"))
          .toDF("time_us", "did", "collection")))
      liveNext += 3
    }

    val expected = (1L until liveNext).map(_ * Step)
    assert(delivered.toSet == expected.toSet,
      s"lost=${(expected.toSet -- delivered.toSet).toSeq.sorted.take(5)} " +
        s"extra=${(delivered.toSet -- expected.toSet).toSeq.sorted.take(5)}")
    assert(delivered.size == delivered.toSet.size, "an event was delivered twice")
    assert(delivered.toSeq == delivered.toSeq.sorted, "delivery order not monotonic")
  }

  test("adaptive chunk: a producer that starves the fixed chunk still cuts over") {
    // chunk 4 vs 6 live events per tick: a FIXED chunk loses 2 events of
    // ground per step and replays forever; the adaptive session doubles
    // its effective chunk while the lag isn't shrinking (4→8>6) and
    // catches up. Exactly-once must survive the growth.
    val path = tmpDir("cutover-adapt")
    append(path, 1 to 60)
    var serverSeq = 60 * Step
    val session = new CutoverSession(
      Subscribe.SubscriberSpec(), startCursorUs = 1 * Step, chunkSize = 4)

    val delivered = ArrayBuffer.empty[Long]
    var liveNext = 61
    var ticks = 0
    while (session.replaying && ticks < 120) {
      ticks += 1
      session.replayStep(spark, path, serverSeq)(df => delivered ++= collectUs(df))
      if (session.replaying) {
        val batch = liveNext until liveNext + 6
        append(path, batch)
        serverSeq = batch.last * Step
        delivered ++= collectUs(session.liveEmit(
          batch.map(i => (i * Step, s"did${i % 3}", if (i % 2 == 0) "post" else "like"))
            .toDF("time_us", "did", "collection")))
        liveNext += 6
      }
    }
    assert(!session.replaying,
      s"adaptive session never cut over in $ticks ticks (effChunk=${session.effectiveChunk})")
    assert(session.effectiveChunk > 4, "the chunk must have grown to catch up")
    assert(session.effectiveChunk <= 4 * 16, "growth is capped at 16x the configured size")

    val expected = (1L until liveNext).map(_ * Step)
    assert(delivered.toSet == expected.toSet,
      s"lost=${(expected.toSet -- delivered.toSet).toSeq.sorted.take(5)} " +
        s"extra=${(delivered.toSet -- expected.toSet).toSeq.sorted.take(5)}")
    assert(delivered.size == delivered.toSet.size, "an event was delivered twice")
    assert(delivered.toSeq == delivered.toSeq.sorted, "delivery order not monotonic")
  }

  test("adaptive chunk: a failing snapshot halves the chunk instead of retrying forever") {
    // the 16k-soak stall: a grown chunk's TakeOrdered collect blew
    // spark.driver.maxResultSize, every retry failed identically at the
    // same size, and the session sat at one cursor for the rest of the
    // run — the underfull-decay only ever sees chunks that SUCCEED.
    // A failed snapshot must shrink the appetite toward the configured
    // size, and at the floor surface the error instead of looping.
    val path = tmpDir("cutover-faildecay")
    append(path, 1 to 60)
    var serverSeq = 60 * Step
    val session = new CutoverSession(
      Subscribe.SubscriberSpec(), startCursorUs = 1 * Step, chunkSize = 4)
    val delivered = ArrayBuffer.empty[Long]
    // a few starved ticks grow the chunk (same shape as the growth test)
    var liveNext = 61
    while (session.effectiveChunk < 16 && session.replaying) {
      session.replayStep(spark, path, serverSeq)(df => delivered ++= collectUs(df))
      // 12 new events per tick: faster than chunk 4 and 8, so growth
      // reaches 16 before the session can cut over
      val batch = liveNext until liveNext + 12
      append(path, batch)
      serverSeq = batch.last * Step
      liveNext += 12
    }
    assert(session.effectiveChunk >= 16, "fixture failed to grow the chunk")
    // a path whose read/scan throws: snapshot fails, chunk halves, the
    // step reports "still replaying" and the cursor does not move
    val bad = java.nio.file.Files.createTempFile("graft-bad-table", ".bin")
    java.nio.file.Files.write(bad, Array.fill[Byte](64)(7))
    val grown = session.effectiveChunk
    assert(session.replayStep(spark, bad.toString, serverSeq)(_ => ()))
    assert(session.effectiveChunk == grown / 2,
      s"expected ${grown / 2} after one failure, got ${session.effectiveChunk}")
    // repeated failures walk down to the configured floor...
    while (session.effectiveChunk > 4)
      assert(session.replayStep(spark, bad.toString, serverSeq)(_ => ()))
    // ...and AT the floor the failure propagates (persistent breakage is
    // the caller's transient/drop decision, not an infinite silent loop)
    intercept[Throwable] {
      session.replayStep(spark, bad.toString, serverSeq)(_ => ())
    }
    // recovery: against the real table the session still finishes its
    // replay exactly-once (the failed steps consumed nothing)
    var ticks = 0
    while (session.replaying && ticks < 200) {
      ticks += 1
      session.replayStep(spark, path, serverSeq)(df => delivered ++= collectUs(df))
    }
    assert(!session.replaying, "session never cut over after recovery")
    val expected = (1L until liveNext).map(_ * Step)
    assert(delivered.toSet == expected.toSet && delivered.size == delivered.toSet.size,
      s"lost=${(expected.toSet -- delivered.toSet).size} " +
        s"dup=${delivered.size - delivered.toSet.size}")
  }

  test("adaptive chunk: a shrinking lag never triggers growth") {
    // static backlog, no live producer: lag shrinks every step, so the
    // session must drain at exactly the configured chunk size
    val path = tmpDir("cutover-noadapt")
    append(path, 1 to 40)
    val session = new CutoverSession(
      Subscribe.SubscriberSpec(), startCursorUs = 1 * Step, chunkSize = 5)
    var steps = 0
    while (session.replaying && steps < 30) {
      steps += 1
      session.replayStep(spark, path, 40 * Step)(_ => ())
    }
    assert(!session.replaying)
    assert(session.effectiveChunk == 5, "no growth on a shrinking lag")
  }

  test("adaptive chunk: a grown chunk decays on underfull scans and resets on rearm") {
    // Phase 1: starve a chunk-4 paced session (full token grants) until
    // the chunk grows. Phase 2: clamp the pacing clock — grants (and so
    // scans) fall below half the chunk; two consecutive underfull steps
    // must halve it, repeatedly, back to the configured size. A
    // lag-shrink decay rule was REJECTED here: it oscillates 4↔8 on
    // this very fixture (grown chunk outpaces producer → lag shrinks →
    // decay → starves again → regrow, never converging). Phase 3: full
    // tokens again — drain, cut over, then rearmReplay() must reset a
    // regrown chunk outright.
    val path = tmpDir("cutover-decay")
    append(path, 1 to 400)
    var serverSeq = 400 * Step
    var nowUs = 0L
    val bucket = new TokenBucket(1e6, 64, () => nowUs)
    val session = new CutoverSession(
      Subscribe.SubscriberSpec(), startCursorUs = 1 * Step, chunkSize = 4,
      playback = Some(bucket))
    var liveNext = 401
    var ticks = 0
    // 20 live events/tick: growth must pass 8 and 16 to outpace it
    while (session.effectiveChunk < 32 && ticks < 40) {
      ticks += 1
      nowUs += 1000000L // refill to burst: full un-paced grants
      session.replayStep(spark, path, serverSeq)(_ => ())
      val batch = liveNext until liveNext + 20
      append(path, batch)
      serverSeq = batch.last * Step
      liveNext += 20
    }
    val grown = session.effectiveChunk
    assert(grown >= 32,
      s"setup: chunk should have grown, got $grown; trace=${session.trace.toArray.mkString(" | ")}")
    // phase 2: trickle tokens — budget ≈ 3 per step, scans underfull
    var steps = 0
    while (session.effectiveChunk > 4 && steps < 60) {
      steps += 1
      nowUs += 3
      session.replayStep(spark, path, serverSeq)(_ => ())
    }
    assert(session.effectiveChunk == 4,
      s"chunk never decayed back from $grown (at ${session.effectiveChunk}); " +
        s"trace=${session.trace.toArray.mkString(" | ")}")
    // phase 3: full speed, drain to cutover
    steps = 0
    while (session.replaying && steps < 400) {
      steps += 1
      nowUs += 1000000L
      session.replayStep(spark, path, serverSeq)(_ => ())
    }
    assert(!session.replaying, "session must still cut over after decay")
    // regrow by hand, then rearm must reset
    session.rearmReplay()
    assert(session.replaying && session.effectiveChunk == 4,
      "rearm must re-enter replay at the configured chunk size")
  }

  test("snapshot budget: concurrent sessions share the pool; peak stays bounded; floor keeps them live") {
    // 50 sessions × chunk 2000 against a 20k-row pool: unbounded, the
    // aggregate appetite would be 100k rows in flight; the pool must cap
    // the PEAK at totalRows + FloorRows × sessions while every session
    // still drains its backlog to cutover (the floor guarantees
    // progress when the pool is exhausted).
    val path = tmpDir("cutover-budget")
    append(path, 1 to 300)
    // own pool: shrinking the SHARED default would clamp unrelated
    // suites' sessions running concurrently in this JVM
    val testPool = new CutoverSession.SnapshotPool(20000L)
    try {
      val sessions = (1 to 50).map(_ =>
        new CutoverSession(Subscribe.SubscriberSpec(), startCursorUs = 1 * Step,
          chunkSize = 2000, pool = testPool))
      val pool = java.util.concurrent.Executors.newFixedThreadPool(16)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
      val counts = new java.util.concurrent.atomic.AtomicLongArray(50)
      sessions.zipWithIndex.foreach { case (s, i) =>
        pool.submit(new Runnable {
          def run(): Unit =
            try {
              var steps = 0
              while (s.replaying && steps < 100) {
                steps += 1
                s.replayStep(spark, path, 300 * Step)(df =>
                  counts.addAndGet(i, df.count()))
              }
            } catch { case t: Throwable => errs.add(t); () }
        })
      }
      pool.shutdown()
      assert(pool.awaitTermination(300, java.util.concurrent.TimeUnit.SECONDS))
      assert(errs.isEmpty, s"session error: ${errs.peek()}")
      sessions.foreach(s => assert(!s.replaying, "a session never finished"))
      // replay is cursor-INCLUSIVE: events 1..300
      (0 until 50).foreach(i => assert(counts.get(i) == 300L,
        s"session $i delivered ${counts.get(i)} of 300"))
      val peak = testPool.peak
      val cap = 20000L + testPool.floorRows * 50
      assert(peak <= cap, s"snapshot peak $peak exceeded pool+floor cap $cap")
      assert(testPool.inFlight == 0L, "leaked reservation")
    } finally ()
  }

  test("cutover happens within CutoverThresholdUs/2 of the live head (server.go:322)") {
    val path = tmpDir("cutover-margin")
    append(path, 1 to 50)
    val serverSeq = 50 * Step
    val session = new CutoverSession(
      Subscribe.SubscriberSpec(), startCursorUs = 1 * Step, chunkSize = 20)
    val delivered = ArrayBuffer.empty[Long]
    var steps = 0
    while (session.replaying && steps < 20) {
      steps += 1
      session.replayStep(spark, path, serverSeq)(df => delivered ++= collectUs(df))
    }
    assert(!session.replaying)
    // hwm at cutover is within threshold/2 of the head
    assert(session.seqUs > serverSeq - Replay.CutoverThresholdUs / 2)
    assert(delivered.toSeq == (1L to 50L).map(_ * Step))
  }

  test("subscriber predicate applies during replay and live; hwm dedups overlap") {
    val path = tmpDir("cutover-filtered")
    append(path, 1 to 40)
    var serverSeq = 40 * Step
    val session = new CutoverSession(
      Subscribe.SubscriberSpec(wantedCollections = Seq("post")), // even ids only
      startCursorUs = 1 * Step, chunkSize = 15)
    val delivered = ArrayBuffer.empty[Long]
    var ticks = 0
    while (session.replaying && ticks < 50) {
      ticks += 1
      session.replayStep(spark, path, serverSeq)(df => delivered ++= collectUs(df))
      // offer an overlapping "live" view of already-replayed data: hwm must drop it all
      delivered ++= collectUs(session.liveEmit(
        (1 to 40).map(i => (i * Step, s"did${i % 3}", if (i % 2 == 0) "post" else "like"))
          .toDF("time_us", "did", "collection")))
    }
    assert(!session.replaying)
    val expected = (2 to 40 by 2).map(_ * Step.toLong)
    assert(delivered.toSeq == expected, "filtered replay+overlap must be evens, once, in order")
  }

  test("paced replay: a drained playback bucket stalls the cursor, refill resumes it") {
    val path = tmpDir("cutover-paced")
    append(path, 1 to 30)
    var clock = 0L
    val bucket = new TokenBucket(ratePerSec = 10.0, burst = 10, nowUs = () => clock)
    val session = new CutoverSession(
      Subscribe.SubscriberSpec(), startCursorUs = 1 * Step, chunkSize = 10,
      playback = Some(bucket))
    val delivered = ArrayBuffer.empty[Long]

    // burst of 10 admits the first chunk; bucket now empty
    assert(session.replayStep(spark, path, 30 * Step)(df => delivered ++= collectUs(df)))
    assert(delivered.size == 10)
    // no tokens: step is a no-op but the session stays alive
    assert(session.replayStep(spark, path, 30 * Step)(df => delivered ++= collectUs(df)))
    assert(delivered.size == 10)
    // +1s of clock = +10 tokens → next chunk flows
    clock += 1000000L
    assert(session.replayStep(spark, path, 30 * Step)(df => delivered ++= collectUs(df)))
    assert(delivered.size == 20)
    clock += 1000000L
    session.replayStep(spark, path, 30 * Step)(df => delivered ++= collectUs(df))
    assert(!session.replaying && delivered.toSeq == (1L to 30L).map(_ * Step))
  }

  test("short chunk refunds its unused playback budget (tail of the backlog)") {
    val path = tmpDir("cutover-refund")
    append(path, 1 to 5) // only 5 events exist
    val clock = 0L
    val bucket = new TokenBucket(ratePerSec = 1.0, burst = 100, nowUs = () => clock)
    // chunkSize 50 ≫ backlog: the step debits 50 up front, scans 5 —
    // without the refund the bucket would sit at 50 and pace the NEXT
    // subscriber action at a tenth of the configured rate
    val session = new CutoverSession(
      Subscribe.SubscriberSpec(), startCursorUs = 1 * Step, chunkSize = 50,
      playback = Some(bucket))
    val delivered = ArrayBuffer.empty[Long]
    session.replayStep(spark, path, 1000 * Step)(df => delivered ++= collectUs(df))
    assert(delivered.size == 5)
    assert(bucket.available == 95, s"only the 5 scanned events consume budget, saw ${bucket.available}")
  }

  test("cutover visibility barrier: a gap scan that can't see the live head keeps replaying") {
    // the serving loop observed an event at serverSeq that the table
    // listing doesn't show yet (append file-commit race): certifying
    // the gap off that stale read would lose the suppressed window —
    // the session must hold its cursor and retry, then cut over once
    // the table catches up
    val path = tmpDir("cutover-barrier")
    append(path, 1 to 10)
    val session = new CutoverSession(Subscribe.SubscriberSpec(), startCursorUs = 1 * Step)
    val delivered = ArrayBuffer.empty[Long]
    val laggingHead = 12 * Step // a live head the table does NOT contain yet
    assert(session.replayStep(spark, path, laggingHead)(df => delivered ++= collectUs(df)),
      "must stay replaying: the head event is not visible in the table")
    assert(session.replaying)
    assert(delivered == (1 to 10).map(_ * Step), "the visible backlog still flows")

    // table catches up (the racing commit lands): next tick cuts over
    // and the gap rows arrive exactly once, in order
    append(path, 11 to 12)
    assert(!session.replayStep(spark, path, laggingHead)(df => delivered ++= collectUs(df)))
    assert(!session.replaying)
    assert(delivered == (1 to 12).map(_ * Step), "gap delivered exactly once, in order")
  }

  test("liveEmitFrames ≡ liveEmit: gate, predicate, nulls, hwm advance") {
    import graft.ingest.Decode

    // a mixed batch incl. a null collection (non-commit event) and a
    // timestamp below the hwm once one round has been delivered
    def batch = Seq(
      (1 * Step, "did0", "post"),
      (2 * Step, "did1", "like"),
      (3 * Step, "did0", null: String),
      (4 * Step, "did2", "post"))
      .toDF("time_us", "did", "collection")
    def frames(df: DataFrame) = Decode.toWire(df)
      .select("time_us", "collection", "did", "wire").collect()
      .map(r => Subscribe.WireFrame(r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) null else r.getString(2), r.getString(3)))
      .sortBy(_.timeUs)
    def wiresOf(df: DataFrame) = {
      val wired = if (df.columns.contains("wire")) df else Decode.toWire(df)
      wired.select("wire").collect().map(_.getString(0)).toSeq
    }

    for (spec <- Seq(
        Subscribe.SubscriberSpec(), // pass-all
        Subscribe.SubscriberSpec(wantedCollections = Seq("post")),
        Subscribe.SubscriberSpec(wantedDids = Seq("did0", "did2")),
        Subscribe.SubscriberSpec(Seq("post", "like"), Seq("did1")))) {
      // a replaying session suppresses live on both paths
      val replayingDf = new CutoverSession(spec, startCursorUs = 0L)
      val replayingRow = new CutoverSession(spec, startCursorUs = 0L)
      assert(wiresOf(replayingDf.liveEmit(batch)).isEmpty)
      assert(replayingRow.liveEmitFrames(frames(batch))._1.isEmpty)

      // live (cursor at the one-event head, first step cuts over):
      // identical wires and identical hwm; a second identical batch
      // dedups fully on both paths
      val path = tmpDir(s"cutover-parity")
      append(path, 1 to 1)
      val dfSess = new CutoverSession(spec, startCursorUs = 1 * Step)
      val rowSess = new CutoverSession(spec, startCursorUs = 1 * Step)
      dfSess.replayStep(spark, path, 1 * Step)(_ => ())
      rowSess.replayStep(spark, path, 1 * Step)(_ => ())
      assert(!dfSess.replaying && !rowSess.replaying)
      val viaDf = wiresOf(dfSess.liveEmit(batch))
      val (viaRowsArr, tailUs) = rowSess.liveEmitFrames(frames(batch))
      rowSess.delivered(tailUs) // the caller's post-write confirmation
      val viaRows = viaRowsArr.toSeq
      assert(viaRows == viaDf, s"parity for $spec")
      if (spec.wantedCollections.isEmpty && spec.wantedDids.isEmpty)
        assert(viaRows.nonEmpty, "pass-all parity must not be vacuous")
      assert(rowSess.seqUs == dfSess.seqUs, s"hwm parity for $spec")
      assert(rowSess.liveEmitFrames(frames(batch))._1.isEmpty, "hwm dedups the overlap")
      assert(wiresOf(dfSess.liveEmit(batch)).isEmpty)
    }
  }

  test("barrier abandon: a retention-removed head hour cannot hold replay forever") {
    // the observed live head sits in hour 1; mid-replay that hour is
    // REMOVED (retention/compaction) so the visibility barrier can
    // never be satisfied. After barrierRecoverHolds consecutive holds
    // the session must abandon the barrier and cut over, delivering
    // every SURVIVING event exactly once — not replay forever.
    val path = tmpDir("cutover-abandon")
    append(path, 35990 to 35998) // hour 0 tail: 3599.0s..3599.8s
    append(path, 36001 to 36001) // hour 1: 3600.1s — the observed head
    val headUs = 36001 * Step
    // retention removes the head hour while the session replays
    def rmHour1(): Unit = {
      val dir = new java.io.File(path, s"${EventsTable.PartitionCol}=1")
      assert(dir.isDirectory, s"fixture must have written $dir")
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
    val session = new CutoverSession(Subscribe.SubscriberSpec(),
      startCursorUs = 35990 * Step, barrierRecoverHolds = 3)
    val delivered = ArrayBuffer.empty[Long]
    rmHour1()
    var ticks = 0
    while (session.replaying && ticks < 10) {
      ticks += 1
      session.replayStep(spark, path, headUs)(df => delivered ++= collectUs(df))
    }
    assert(!session.replaying, s"still replaying after $ticks ticks — barrier never abandoned")
    assert(ticks > 1, "the barrier must hold at least once before abandoning")
    assert(delivered.toSeq == (35990 to 35998).map(_ * Step),
      "surviving events delivered exactly once, in order")
    // post-recovery the session is live: new events flow, hwm dedups
    val fresh = session.liveEmit(
      Seq((36002 * Step, "did0", "post")).toDF("time_us", "did", "collection"))
    assert(collectUs(fresh) == Seq(36002 * Step))
  }

  test("rearmReplay: a failed live write's window is re-read from the table") {
    import graft.ingest.Decode
    def frames(ids: Range) = Decode.toWire(
        ids.map(i => (i * Step, s"did${i % 3}", if (i % 2 == 0) "post" else "like"))
          .toDF("time_us", "did", "collection"))
      .select("time_us", "collection", "did", "wire").collect()
      .map(r => Subscribe.WireFrame(r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) null else r.getString(2), r.getString(3)))
      .sortBy(_.timeUs)

    val path = tmpDir("cutover-rearm")
    append(path, 1 to 5)
    val session = new CutoverSession(Subscribe.SubscriberSpec(), startCursorUs = 1 * Step)
    val delivered = ArrayBuffer.empty[Long]
    var ticks = 0
    while (session.replaying && ticks < 20) {
      ticks += 1
      session.replayStep(spark, path, 5 * Step)(df => delivered ++= collectUs(df))
    }
    assert(!session.replaying)
    assert(delivered.toSeq == (1 to 5).map(_ * Step))

    // batch A: live delivery succeeds, hwm confirmed
    append(path, 6 to 8)
    val (wiresA, tailA) = session.liveEmitFrames(frames(6 to 8))
    assert(wiresA.length == 3)
    delivered ++= (6 to 8).map(_ * Step)
    session.delivered(tailA)

    // batch B: frames computed but the WRITE fails (non-IO) — the
    // caller must NOT confirm; re-arm pulls the session back into
    // replay at the hwm so the window is re-read from the table
    append(path, 9 to 11)
    val (wiresB, _) = session.liveEmitFrames(frames(9 to 11))
    assert(wiresB.length == 3) // frames were in flight when the write failed
    session.rearmReplay()
    assert(session.replaying, "re-arm must put the session back into replay")

    // batch C arrives during the re-replay: the gate suppresses it live
    append(path, 12 to 13)
    assert(session.liveEmitFrames(frames(12 to 13))._1.isEmpty)

    // replay re-reads the failed window (9..11) AND the suppressed
    // batch C from the table, then cuts over — nothing lost, nothing
    // doubled
    ticks = 0
    while (session.replaying && ticks < 20) {
      ticks += 1
      session.replayStep(spark, path, 13 * Step)(df => delivered ++= collectUs(df))
    }
    assert(!session.replaying)

    // batch D: live again
    append(path, 14 to 14)
    val (wiresD, tailD) = session.liveEmitFrames(frames(14 to 14))
    assert(wiresD.length == 1)
    delivered ++= Seq(14 * Step)
    session.delivered(tailD)

    assert(delivered.toSeq == (1 to 14).map(_ * Step),
      s"exactly-once in order; got ${delivered.toSeq}")
  }
}
