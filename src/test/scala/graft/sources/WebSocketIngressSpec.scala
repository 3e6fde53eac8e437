package graft.sources

import org.apache.spark.sql.functions._

import graft.{SparkSpec, WsTestKit}
import graft.store.EventsTable

/** The reference's actual dial, end to end: a minimal RFC 6455
  * WebSocket server ([[WsTestKit.ReplayServer]]) replays its log
  * strictly after the `?cursor=` on the dial URL and then live-streams
  * appends, and `graft-websocket` → decode → sequence → events table
  * lands every frame exactly once, with a cursor-resumed re-dial
  * picking up where the table left off (cmd/jetstream/main.go:299-317
  * + server.go:274-287 semantics).
  */
class WebSocketIngressSpec extends SparkSpec {
  import spark.implicits._

  /** Wire frame with a deterministic event time (minute `i`). */
  private def frame(i: Int): (Long, String) = {
    val iso = f"2024-09-05T07:$i%02d:00.000Z"
    val us = java.time.Instant.parse(iso).toEpochMilli * 1000L
    us -> (s"""{"t":"#commit","did":"did:plc:w$i","rev":"r$i","seq":$i,"time":"$iso","tooBig":false,""" +
      s""""ops":[{"action":"create","path":"app.bsky.feed.post/k$i","cid":"c$i","recordCid":"c$i","record":{"text":"m$i"}}]}""")
  }

  test("websocket dial → decode → sequence → table; cursor-resumed re-dial adds only new events") {
    val table = tmpDir("ws-ingest")
    val srv = new WsTestKit.ReplayServer
    try {
      srv.log = (1 to 3).map(frame).toVector

      // --- first dial: three frames arrive over the WebSocket
      val q1 = WebSocketIngress.start(spark,
        s"ws://localhost:${srv.port}/subscribe", table, tmpDir("ws-ckpt1"))
      eventually(90000)(EventsTable.read(spark, table).count() >= 3)
      q1.stop(); q1.awaitTermination(30000)

      val rows1 = EventsTable.read(spark, table)
        .select("event_time_us", "time_us").as[(Long, Long)].collect().sortBy(_._1)
      assert(rows1.map(_._1).toSeq == (1 to 3).map(frame(_)._1))
      assert(rows1.map(_._2).distinct.length == 3, "sequencer stamps must be unique")

      // --- upstream moved on; the re-dial presents the table-recovered
      // cursor on the URL and the server replays strictly after it
      srv.log = (1 to 5).map(frame).toVector
      val q2 = WebSocketIngress.start(spark,
        s"ws://localhost:${srv.port}/subscribe", table, tmpDir("ws-ckpt2"))
      eventually(90000)(EventsTable.read(spark, table).count() >= 5)
      q2.stop(); q2.awaitTermination(30000)

      val rows2 = EventsTable.read(spark, table)
        .select("event_time_us", "time_us").as[(Long, Long)].collect().sortBy(_._2)
      assert(rows2.map(_._1).toSeq == (1 to 5).map(frame(_)._1),
        "no loss, no duplication across the re-dial")
      assert(rows2.map(_._2).toSeq == rows2.map(_._2).sorted.toSeq)
      assert(rows2.map(_._2).distinct.length == 5)
    } finally srv.close()
  }

  test("restart with the SAME checkpoint dir: recovered offsets don't trim fresh messages") {
    // the previous incarnation's committed offsets are in ITS numbering;
    // without the persisted-head rebase, commit(<recovered>) silently
    // discards the post-reconnect buffer — exactly the events the
    // upstream re-sent after the persisted cursor (at-least-once violated)
    val table = tmpDir("ws-samechkpt")
    val ckpt = tmpDir("ws-samechkpt-ckpt")
    val srv = new WsTestKit.ReplayServer
    try {
      srv.log = (1 to 3).map(frame).toVector
      val q1 = WebSocketIngress.start(spark,
        s"ws://localhost:${srv.port}/subscribe", table, ckpt)
      eventually(90000)(EventsTable.read(spark, table).count() >= 3)
      q1.stop(); q1.awaitTermination(30000)

      srv.log = (1 to 6).map(frame).toVector
      val q2 = WebSocketIngress.start(spark,
        s"ws://localhost:${srv.port}/subscribe", table, ckpt)
      eventually(90000)(EventsTable.read(spark, table).count() >= 6)
      q2.stop(); q2.awaitTermination(30000)

      val rows = EventsTable.read(spark, table)
        .select("event_time_us").as[Long].collect().sorted.toSeq
      assert(rows == (1 to 6).map(frame(_)._1),
        "every upstream event exactly once across the same-checkpoint restart")
    } finally srv.close()
  }

  test("binary DAG-CBOR frames: dial with format=cbor decodes in-plan and cursor-resumes") {
    // the binary twin of the JSON wire: one BINARY message = one
    // self-contained CBOR frame; the server encodes each fixture line with
    // the codec (codec correctness is pinned separately in CborSpec),
    // and the plan-side cbor_to_json must reproduce the JSON the text
    // path would have carried — same table contents, same resume
    val table = tmpDir("ws-cbor")
    val srv = new WsTestKit.ReplayServer(
      Some(graft.functions.CborCodec.fromJson _))
    try {
      srv.log = (1 to 3).map(frame).toVector
      val q1 = WebSocketIngress.start(spark,
        s"ws://localhost:${srv.port}/subscribe", table, tmpDir("ws-cbor-ckpt1"),
        format = "cbor")
      eventually(90000)(EventsTable.read(spark, table).count() >= 3)
      q1.stop(); q1.awaitTermination(30000)

      val rows1 = EventsTable.read(spark, table)
        .select(col("event_time_us"),
          get_json_object(col("commit.record"), "$.text").as("txt"))
        .as[(Long, String)].collect().sortBy(_._1)
      assert(rows1.map(_._1).toSeq == (1 to 3).map(frame(_)._1))
      assert(rows1.map(_._2).toSeq == (1 to 3).map(i => s"m$i"),
        "record payloads survive the CBOR round trip")

      // cursor-resumed re-dial over the binary transport
      srv.log = (1 to 5).map(frame).toVector
      val q2 = WebSocketIngress.start(spark,
        s"ws://localhost:${srv.port}/subscribe", table, tmpDir("ws-cbor-ckpt2"),
        format = "cbor")
      eventually(90000)(EventsTable.read(spark, table).count() >= 5)
      q2.stop(); q2.awaitTermination(30000)
      val times = EventsTable.read(spark, table)
        .select("event_time_us").as[Long].collect().sorted.toSeq
      assert(times == (1 to 5).map(frame(_)._1),
        "no loss, no duplication across the binary re-dial")
    } finally srv.close()
  }

  /** Re-encode a fixture wire line as a RAW relay message: records →
    * CAR blocks → MST → commit object → two-item XRPC framing — the
    * true upstream bytes (what `events.HandleRepoStream` consumes,
    * main.go:317), built by [[graft.functions.Car.buildCommitFrame]].
    */
  private def firehoseEncode(line: String): Array[Byte] = {
    val j = new com.fasterxml.jackson.databind.ObjectMapper().readTree(line)
    val ops = {
      val it = j.get("ops").elements()
      val b = Seq.newBuilder[graft.functions.Car.WireOp]
      while (it.hasNext) {
        val op = it.next()
        b += graft.functions.Car.WireOp(op.get("action").asText(),
          op.get("path").asText(),
          Option(op.get("record")).map(_.toString))
      }
      b.result()
    }
    graft.functions.Car.buildCommitFrame(j.get("did").asText(),
      j.get("seq").asLong(), j.get("time").asText(), j.get("rev").asText(), ops)
  }

  test("raw relay frames: format=firehose decodes CAR/MST/CID in-plan and cursor-resumes") {
    // the S5 boundary live: one BINARY message = header+body CBOR items
    // with the records inside a CARv1 archive; the plan-side
    // xrpc_frame_to_json walks CAR sections, verifies hashes, resolves
    // each op through the MST, and re-emits the wire JSON — same table
    // contents, same resume, as the decoded-event transports
    val table = tmpDir("ws-firehose")
    val srv = new WsTestKit.ReplayServer(Some(firehoseEncode _))
    try {
      srv.log = (1 to 3).map(frame).toVector
      val q1 = WebSocketIngress.start(spark,
        s"ws://localhost:${srv.port}/subscribe", table, tmpDir("ws-fh-ckpt1"),
        format = "firehose")
      eventually(90000)(EventsTable.read(spark, table).count() >= 3)
      q1.stop(); q1.awaitTermination(30000)

      val rows1 = EventsTable.read(spark, table)
        .select(col("event_time_us"),
          get_json_object(col("commit.record"), "$.text").as("txt"),
          col("commit.cid").as("cid"))
        .as[(Long, String, String)].collect().sortBy(_._1)
      assert(rows1.map(_._1).toSeq == (1 to 3).map(frame(_)._1))
      assert(rows1.map(_._2).toSeq == (1 to 3).map(i => s"m$i"),
        "record payloads survive the CAR extraction")
      assert(rows1.forall(_._3.startsWith("b")),
        "cids are the hash-verified CIDv1 strings, not the fixture placeholders")

      // cursor-resumed re-dial over the raw relay transport
      srv.log = (1 to 5).map(frame).toVector
      val q2 = WebSocketIngress.start(spark,
        s"ws://localhost:${srv.port}/subscribe", table, tmpDir("ws-fh-ckpt2"),
        format = "firehose")
      eventually(90000)(EventsTable.read(spark, table).count() >= 5)
      q2.stop(); q2.awaitTermination(30000)
      val times = EventsTable.read(spark, table)
        .select("event_time_us").as[Long].collect().sorted.toSeq
      assert(times == (1 to 5).map(frame(_)._1),
        "no loss, no duplication across the firehose re-dial")
    } finally srv.close()
  }

  test("bounded buffer: a tiny maxBufferedFrames pauses and resumes without losing frames") {
    // high-water 2 on a 25-frame burst: the listener must stop
    // requesting at the mark and commit() must resume it — every frame
    // still arrives, just paced by the micro-batch loop instead of
    // accumulating on the driver
    val srv = new WsTestKit.ReplayServer
    try {
      srv.log = (1 to 25).map(i => (i.toLong, s"""{"n":$i}""")).toVector
      val q = spark.readStream.format("graft-websocket")
        .option("url", s"ws://localhost:${srv.port}/subscribe")
        .option("maxBufferedFrames", "2")
        .load()
        .writeStream.format("memory").queryName("ws_bounded")
        .option("checkpointLocation", tmpDir("ws-bounded-ckpt")).start()
      try eventually(90000)(
        spark.sql("SELECT count(*) FROM ws_bounded").head().getLong(0) >= 25)
      finally { q.stop(); q.awaitTermination(30000) }
      val vals = spark.sql("SELECT value FROM ws_bounded").collect()
        .map(_.getString(0)).toSeq
      assert(vals.distinct.size == 25, "no frame lost or duplicated across pauses")
    } finally srv.close()
  }

  test("large frames fragment-safe: a >64KiB message is one row") {
    val table = tmpDir("ws-big")
    val srv = new WsTestKit.ReplayServer
    try {
      val iso = "2024-09-05T07:30:00.000Z"
      val us = java.time.Instant.parse(iso).toEpochMilli * 1000L
      val bigText = "x" * 70000 // drives the 8-byte extended length path
      srv.log = Vector(us ->
        (s"""{"t":"#commit","did":"did:plc:big","rev":"r1","seq":1,"time":"$iso","tooBig":false,""" +
          s""""ops":[{"action":"create","path":"app.bsky.feed.post/kb","cid":"cb","recordCid":"cb","record":{"text":"$bigText"}}]}"""))
      val q = WebSocketIngress.start(spark,
        s"ws://localhost:${srv.port}/subscribe", table, tmpDir("ws-big-ckpt"))
      eventually(90000)(EventsTable.read(spark, table).count() >= 1)
      q.stop(); q.awaitTermination(30000)
      val rec = EventsTable.read(spark, table)
        .select(get_json_object(col("commit.record"), "$.text")).as[String].head()
      assert(rec == bigText, "payload survives the extended-length frame intact")
    } finally srv.close()
  }
}
