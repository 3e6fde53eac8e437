package graft.sources

import graft.SparkSpec
import graft.store.EventsTable

/** The graft-replay streaming source: cursor replay, live tailing of new
  * appends, rate caps, and checkpoint cursor-resume — jetstream's
  * subscription semantics (§3.2/§3.3) as one `readStream`.
  */
class ReplayTailSourceSpec extends SparkSpec {
  import spark.implicits._

  private def writeEvents(path: String, range: Range): Unit =
    EventsTable.append(
      range.map(t => (t.toLong * 1000, s"did${t % 3}", "c"))
        .toDF("time_us", "did", "collection"),
      path)

  private def readTail(path: String, cursorUs: Long, extra: Map[String, String] = Map.empty) = {
    var r = spark.readStream.format("graft-replay")
      .option("path", path).option("cursor", cursorUs)
    extra.foreach { case (k, v) => r = r.option(k, v) }
    r.load()
  }

  test("only fresh-boot analysis errors read as an empty table; breakage propagates") {
    // fresh boot: dir absent → PATH_NOT_FOUND classifies as boot
    val missing = intercept[org.apache.spark.sql.AnalysisException] {
      spark.read.parquet(tmpDir("no-such-table") + "/gone").collect()
    }
    assert(ReplayTailSource.isFreshBoot(missing))
    // created-but-empty dir → UNABLE_TO_INFER_SCHEMA classifies as boot
    val emptyDir = tmpDir("empty-table")
    val inferFail = intercept[org.apache.spark.sql.AnalysisException] {
      spark.read.parquet(emptyDir).collect()
    }
    assert(ReplayTailSource.isFreshBoot(inferFail))
    // genuine breakage (unresolvable column) must NOT classify as boot —
    // mapping it to an empty stream would tail forever delivering zero
    // rows with no error surfaced
    val broken = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1L).toDF("a").select(org.apache.spark.sql.functions.col("nope"))
    }
    assert(!ReplayTailSource.isFreshBoot(broken))
  }

  test("missing path option fails fast with a clear message") {
    val ex = intercept[Exception] {
      spark.readStream.format("graft-replay").load()
        .writeStream.format("memory").queryName("no_path").start()
    }
    assert(ex.getMessage.contains("path"))
  }

  test("replay from cursor, then live-tail new appends, in order, exactly once") {
    val path = tmpDir("replay-src")
    writeEvents(path, 1 to 100)
    val q = readTail(path, cursorUs = 50 * 1000)
      .writeStream.format("memory").queryName("tail_out").outputMode("append").start()
    q.processAllAvailable()
    val afterReplay = spark.table("tail_out").select("time_us").as[Long].collect().sorted
    assert(afterReplay.toSeq == (50 to 100).map(_.toLong * 1000)) // replay half

    writeEvents(path, 101 to 130) // live appends
    q.processAllAvailable()
    q.stop()
    val all = spark.table("tail_out").select("time_us").as[Long].collect().sorted
    assert(all.toSeq == (50 to 130).map(_.toLong * 1000)) // cutover seamless, no dupes
  }

  test("future cursor waits for live events (server.go:283-286)") {
    val path = tmpDir("replay-future")
    writeEvents(path, 1 to 10)
    val q = readTail(path, cursorUs = 1000 * 1000)
      .writeStream.format("memory").queryName("future_out").outputMode("append").start()
    q.processAllAvailable()
    assert(spark.table("future_out").count() == 0) // nothing yet
    writeEvents(path, 2000 to 2004)
    q.processAllAvailable()
    q.stop()
    assert(spark.table("future_out").select("time_us").as[Long].collect().sorted.toSeq ==
      (2000 to 2004).map(_.toLong * 1000))
  }

  test("maxEventsPerBatch caps each micro-batch (S20 rate limit)") {
    val path = tmpDir("replay-capped")
    writeEvents(path, 1 to 90)
    val q = readTail(path, 0, Map("maxEventsPerBatch" -> "40"))
      .writeStream.format("memory").queryName("capped_out").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    // all delivered, but across ≥3 batches of ≤40
    assert(spark.table("capped_out").count() == 90)
    val batches = q.recentProgress.map(_.numInputRows).filter(_ > 0)
    assert(batches.forall(_ <= 40))
    assert(batches.length >= 3)
  }

  test("subscriber options push the filter into the source scan") {
    val path = tmpDir("replay-sub-push")
    EventsTable.append(
      (1 to 90).map(t => (t.toLong * 1000,
        s"did${t % 3}",
        if (t % 2 == 0) "app.bsky.feed.post" else "app.bsky.feed.like"))
        .toDF("time_us", "did", "collection"),
      path)
    val q = readTail(path, 0, Map(
      "wantedCollections" -> "app.bsky.feed.post",
      "wantedDids" -> "did0,did1"))
      .writeStream.format("memory").queryName("sub_push_out").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sub_push_out")
      .select("time_us", "did", "collection")
      .as[(Long, String, String)].collect().sortBy(_._1)
    val expected = (1 to 90)
      .filter(t => t % 2 == 0 && (t % 3 == 0 || t % 3 == 1))
      .map(_.toLong * 1000)
    assert(got.map(_._1).toSeq == expected)
    assert(got.forall { case (_, d, c) =>
      (d == "did0" || d == "did1") && c == "app.bsky.feed.post" })
  }

  test("range scans prune hour partitions, not just row groups") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val path = tmpDir("replay-prune")
    // span 3 distinct event_hour partitions
    EventsTable.append(
      Seq(1L, 3600000001L, 7200000001L, 10800000001L)
        .map(t => (t, "did0", "c")).toDF("time_us", "did", "collection"),
      path)
    val src = new ReplayTailSource(
      spark.sqlContext, spark.read.parquet(path).schema, Map("path" -> path))
    val df = src.rangeScan(3600000001L, Some(7199999999L))
    val scan = df.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }.head
    assert(scan.partitionFilters.nonEmpty,
      "hour bounds must reach the scan as PartitionFilters")
    // only the one hour partition inside the bounds is read
    assert(scan.relation.location.listFiles(scan.partitionFilters, scan.dataFilters)
      .map(_.files.size).sum == 1)
    assert(df.select("time_us").as[Long].collect().toSeq == Seq(3600000001L))
  }

  test("maxEventsPerBatch cursor survives restart: no offset regression, no dupes") {
    val path = tmpDir("replay-cap-resume")
    val ckpt = tmpDir("replay-cap-resume-ckpt")
    val out = tmpDir("replay-cap-resume-out")
    writeEvents(path, 1 to 90)
    val q1 = readTail(path, 0, Map("maxEventsPerBatch" -> "40"))
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    q1.processAllAvailable()
    q1.stop()

    writeEvents(path, 91 to 120)
    // a fresh source instance: the rate-cap cursor must be re-seeded from the
    // checkpointed offset, not reset to `cursor` (which would re-plan events
    // 1..40 below the committed offset and deliver 41..90 twice)
    val q2 = readTail(path, 0, Map("maxEventsPerBatch" -> "40"))
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    q2.processAllAvailable()
    q2.stop()
    val all = spark.read.parquet(out).select("time_us").as[Long].collect().sorted
    assert(all.toSeq == (1 to 120).map(_.toLong * 1000)) // exactly once across restart
  }

  test("checkpoint resume continues from the committed cursor (persist.go:41-87)") {
    val path = tmpDir("replay-resume")
    val ckpt = tmpDir("replay-resume-ckpt")
    val out = tmpDir("replay-resume-out")
    writeEvents(path, 1 to 50)
    val q1 = readTail(path, 0)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    q1.processAllAvailable()
    q1.stop()
    assert(spark.read.parquet(out).count() == 50)

    writeEvents(path, 51 to 80)
    val q2 = readTail(path, 0)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    q2.processAllAvailable()
    q2.stop()
    // exactly once across the restart — the offset log carried the cursor
    assert(spark.read.parquet(out).select("time_us").as[Long].collect().sorted.toSeq ==
      (1 to 80).map(_.toLong * 1000))
  }

  test("tail query survives retention deletes racing its probes; the tail loses nothing") {
    // the round-12 soak failure as a suite tripwire: a standing tail
    // probes the table at a fast trigger while old hour partitions are
    // deleted file-by-file underneath it (retention's shape). Without
    // the transient-listing retry the query occasionally dies on the
    // schema-footer FNF race; with it the stream must survive every
    // pass and deliver the complete live tail.
    val path = tmpDir("tail-retention-race")
    val HourUs = 3600000000L
    def appendAt(hour: Long, ids: Range): Unit =
      EventsTable.append(
        ids.map(i => (hour * HourUs + i.toLong, s"did${i % 3}", "c"))
          .toDF("time_us", "did", "collection"), path)
    (0 until 12).foreach(h => appendAt(h.toLong, 0 until 50))
    val liveHour = 100L
    appendAt(liveHour, 0 until 1) // head at the live hour before the tail starts
    val out = tmpDir("tail-race-out")
    val ckpt = tmpDir("tail-race-ckpt")
    val q = readTail(path, liveHour * HourUs)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(50L))
      .start()
    try {
      var next = 1
      (0 until 12).foreach { k =>
        appendAt(liveHour, next until next + 100)
        next += 100
        val dir = new java.io.File(path, s"${EventsTable.PartitionCol}=$k")
        Option(dir.listFiles()).foreach(_.foreach { f => f.delete(); () })
        dir.delete()
        Thread.sleep(30)
      }
      q.processAllAvailable()
      assert(q.exception.isEmpty,
        s"tail query died during the retention storm: ${q.exception}")
      val got = spark.read.parquet(out).select("time_us").as[Long].collect().sorted
      assert(got.length == next,
        s"tail lost ${next - got.length} of $next live events")
      assert(got.toSeq == (0 until next).map(liveHour * HourUs + _))
    } finally q.stop()
  }

  test("isTransientListing: FNF anywhere in the cause chain, nothing else") {
    // the retention-vs-schema-footer race surfaces as a SparkException
    // wrapping (sometimes several levels deep) a FileNotFoundException;
    // the tail source must retry those and ONLY those (round-12
    // multi-edge soak postmortem)
    val fnf = new java.io.FileNotFoundException("part-00000 does not exist")
    assert(ReplayTailSource.isTransientListing(fnf))
    assert(ReplayTailSource.isTransientListing(
      new org.apache.spark.SparkException("awaitResult",
        new RuntimeException("mid", fnf))))
    assert(!ReplayTailSource.isTransientListing(new RuntimeException("boom")))
    assert(!ReplayTailSource.isTransientListing(
      new org.apache.spark.SparkException("x", new IllegalStateException())))
    // self-referential cause chains terminate
    val loop = new RuntimeException("loop")
    assert(!ReplayTailSource.isTransientListing(loop))
  }
}
