package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ingest.{Decode, Sequencer}
import graft.serve.{Replay, Subscribe}
import graft.store.{EventsTable, Retention}

/** End-to-end assembly of the jetstream pipeline (SURVEY §3.1-§3.3) as a
  * runnable demo: raw commit frames → decode/explode → monotonic
  * sequencing → partitioned events table → TTL trim → cursor replay →
  * per-subscriber filtered wire output.
  *
  * Usage: runMain graft.Pipeline [frameJsonPath] — with no args it feeds
  * the golden fixture frames inline.
  */
object Pipeline {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.plans.HourBounds
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val frames =
      if (args.nonEmpty) spark.read.text(args(0)).toDF("value")
      else Seq(
        """{"t":"#commit","did":"did:plc:alice","rev":"r1","seq":1,"time":"2024-09-05T06:11:04.870Z","tooBig":false,"ops":[{"action":"create","path":"app.bsky.feed.post/k1","cid":"c1","recordCid":"c1","record":{"text":"hello"}},{"action":"create","path":"app.bsky.feed.like/k2","cid":"c2","recordCid":"c2","record":{"subject":"at://x"}}]}""",
        """{"t":"#commit","did":"did:plc:bob","rev":"r2","seq":2,"time":"2024-09-05T06:11:05.000Z","tooBig":false,"ops":[{"action":"delete","path":"app.bsky.graph.follow/k3"}]}""",
        """{"t":"#commit","did":"did:plc:carol","rev":"r3","seq":3,"time":"2024-09-05T06:11:06.000Z","tooBig":true,"ops":[{"action":"create","path":"app.bsky.feed.post/k4","cid":"c4","recordCid":"c4","record":{}}]}""",
        """{"t":"#identity","did":"did:plc:dan","seq":4,"time":"2024-09-05T06:11:07.000Z","handle":"dan.example.com"}""",
        """{"t":"#account","did":"did:plc:erin","seq":5,"time":"2024-09-05T06:11:08.000Z","active":true}"""
      ).toDF("value")

    val table = java.nio.file.Files.createTempDirectory("graft-pipeline").toString

    // ingest: mixed-frame decode (commit + identity + account) →
    // sequence → persist
    val events = Decode.decodeFrames(Decode.parseMixedFrames(frames))
    val seq = Sequencer.stamp(events, Seq("event_time_us", "did", "commit.rkey"), prevMaxUs = 0L)
    EventsTable.append(
      seq.df.select(col("did"), col("time_us"), col("type"),
        col("commit"), col("account"), col("identity")), table)
    println(s"[pipeline] ingested ${seq.df.count()} events, head=${seq.maxTimeUs}, table=$table")

    // retention trim (no-op here: everything is fresh)
    val dropped = Retention.trim(spark, table, ttlUs = 24L * 3600 * 1000000)
    println(s"[pipeline] retention dropped $dropped partitions")

    // replay from cursor 0 with a subscriber filter, wire-serialized
    val sub = Subscribe.SubscriberSpec(
      wantedCollections = Seq("app.bsky.feed.post", "app.bsky.graph.follow"))
    Subscribe.validate(sub).left.foreach(err => sys.error(err))
    val replayed = EventsTable.replay(spark, table, cursorUs = 0L)
      .filter(Subscribe.filterFor(sub, collectionCol = "commit.collection"))
    val wire = Decode.toWire(replayed).select("wire").as[String].collect()
    println(s"[pipeline] subscriber received ${wire.length} events:")
    wire.foreach(w => println(s"[pipeline]   $w"))

    // replay∪live exactly-once check
    val union = Replay.replayUnionLive(spark, table, cursorUs = 0L, liveFromUs = seq.maxTimeUs - 1)
    println(s"[pipeline] replay∪live rows=${union.count()} (exactly-once over overlap)")

    // the same subscription as a live streaming query via the custom source
    val q = spark.readStream.format("graft-replay")
      .option("path", table).option("cursor", 0L)
      .load()
      .writeStream.format("memory").queryName("pipeline_tail")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    println(s"[pipeline] graft-replay streaming tail delivered " +
      s"${spark.table("pipeline_tail").count()} events")
    spark.stop()
  }
}
