package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.functions.Car._

/** The raw relay wire (S5): varint framing, CARv1 read/write round-trip,
  * CID hash verification, canonical MST build + walk (multi-level trees,
  * prefix compression, absent keys), XRPC frame decode to wire JSON
  * (commit / identity / account / error), the op-level failure modes the
  * reference logs-and-drops (missing record, CID mismatch via the
  * downstream filter), and the codegen'd `xrpc_frame_to_json` expression
  * feeding the standard decode chain in-plan.
  */
class CarSpec extends SparkSpec {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  // ------------------------------------------------------------- varint

  test("varint: round-trip across widths") {
    val out = new java.io.ByteArrayOutputStream()
    val vals = Seq(0L, 1L, 127L, 128L, 300L, 16384L, Int.MaxValue.toLong, Long.MaxValue)
    vals.foreach(Car.writeVarint(out, _))
    val buf = out.toByteArray
    var pos = 0
    vals.foreach { v =>
      val (got, next) = Car.readVarint(buf, pos)
      assert(got == v)
      pos = next
    }
    assert(pos == buf.length)
  }

  test("varint: truncated and oversized rejected") {
    intercept[CborCodec.CborError](Car.readVarint(Array(0x80.toByte), 0))
    intercept[CborCodec.CborError](
      Car.readVarint(Array.fill(10)(0x80.toByte) :+ 1.toByte, 0))
  }

  // ------------------------------------------------------------ CAR/CID

  test("CAR: write → read round-trips blocks, root, and verifies hashes") {
    val b1 = CborCodec.fromJson("""{"a":1}""")
    val b2 = CborCodec.fromJson("""{"b":[1,2,3]}""")
    val c1 = Car.cidForBlock(b1)
    val c2 = Car.cidForBlock(b2)
    val car = Car.writeCar(c1, Seq((c1, b1), (c2, b2)))
    val read = Car.readCar(car)
    assert(read.roots.map(Car.cidString) == Vector(Car.cidString(c1)))
    assert(read.size == 2)
    assert(read.block(c1).map(_.toSeq) == Some(b1.toSeq))
    assert(read.block(c2).map(_.toSeq) == Some(b2.toSeq))
  }

  test("CAR: a block whose bytes do not match its CID is dropped") {
    val b1 = CborCodec.fromJson("""{"a":1}""")
    val c1 = Car.cidForBlock(b1)
    val forged = CborCodec.fromJson("""{"a":2}""") // different bytes, same declared CID
    val car = Car.writeCar(c1, Seq((c1, forged)))
    val read = Car.readCar(car)
    assert(read.size == 0)
    assert(read.block(c1).isEmpty)
  }

  test("CAR: truncated header/section rejected") {
    val b1 = CborCodec.fromJson("""{"a":1}""")
    val c1 = Car.cidForBlock(b1)
    val car = Car.writeCar(c1, Seq((c1, b1)))
    intercept[CborCodec.CborError](Car.readCar(car.take(3)))
    intercept[CborCodec.CborError](Car.readCar(car.dropRight(1)))
  }

  // ---------------------------------------------------------------- MST

  test("MST: canonical multi-level tree finds every key; absent keys None") {
    // 200 keys spread over layers by the sha-256 layer function — a real
    // multi-level tree (collection/rkey shaped paths)
    val keys = (0 until 200).map(i => s"app.graft.doc/rk$i")
    val layers = keys.map(Mst.keyLayer)
    assert(layers.max >= 1, "fixture too small to force a multi-level tree")
    val blocks = scala.collection.mutable.ArrayBuffer.empty[(Array[Byte], Array[Byte])]
    val vals = keys.map { k =>
      val rec = CborCodec.fromJson(s"""{"k":"$k"}""")
      blocks += ((Car.cidForBlock(rec), rec))
      k -> Car.cidForBlock(rec)
    }
    val root = Mst.build(vals, blocks)
    val car = Car.readCar(Car.writeCar(root, blocks.toSeq))
    keys.foreach { k =>
      val found = Mst.lookup(car, root, k)
      assert(found.isDefined, s"key $k not found")
      assert(Car.cidString(found.get) == Car.cidString(vals.toMap.apply(k)))
    }
    assert(Mst.lookup(car, root, "app.graft.doc/nope").isEmpty)
    assert(Mst.lookup(car, root, "aaa/zzz").isEmpty)
    assert(Mst.lookup(car, root, "zzz/zzz").isEmpty)
  }

  test("MST: empty tree resolves nothing") {
    val blocks = scala.collection.mutable.ArrayBuffer.empty[(Array[Byte], Array[Byte])]
    val root = Mst.build(Seq.empty, blocks)
    val car = Car.readCar(Car.writeCar(root, blocks.toSeq))
    assert(Mst.lookup(car, root, "a/b").isEmpty)
  }

  test("MST: node blocks use prefix compression (p > 0 for shared prefixes)") {
    // all keys share "app.graft.doc/rk" — at least one emitted node must
    // carry a nonzero p (otherwise the writer is emitting full keys and
    // the walker's prefix reconstruction is untested)
    val keys = (0 until 50).map(i => f"app.graft.doc/rk$i%03d")
    val blocks = scala.collection.mutable.ArrayBuffer.empty[(Array[Byte], Array[Byte])]
    val vals = keys.map { k =>
      val rec = CborCodec.fromJson(s"""{"k":"$k"}""")
      blocks += ((Car.cidForBlock(rec), rec))
      k -> Car.cidForBlock(rec)
    }
    Mst.build(vals, blocks)
    // scan node blocks' JSON (via the strict codec: writer emits
    // canonical DAG-CBOR) for an entry with p > 0
    val anyCompressed = blocks.exists { case (_, block) =>
      try {
        val j = mapper.readTree(CborCodec.toJson(block))
        j.has("e") && {
          val it = j.get("e").elements()
          var found = false
          while (it.hasNext && !found) found = it.next().get("p").asInt() > 0
          found
        }
      } catch { case _: Exception => false }
    }
    assert(anyCompressed)
  }

  // ------------------------------------------------------- frame decode

  test("frame: commit round-trips records through CAR+MST+CID to wire JSON") {
    val frame = Car.buildCommitFrame(
      did = "did:plc:alice", seq = 42L, time = "2024-01-02T03:04:05Z", rev = "rev1",
      ops = Seq(
        WireOp("create", "app.bsky.feed.post/3k1", Some("""{"text":"hi","n":7}""")),
        WireOp("update", "app.bsky.actor.profile/self", Some("""{"bio":"x"}""")),
        WireOp("delete", "app.bsky.feed.like/3k2", None)))
    val j = mapper.readTree(Car.frameToJson(frame))
    assert(j.get("t").asText() == "#commit")
    assert(j.get("did").asText() == "did:plc:alice")
    assert(j.get("seq").asLong() == 42L)
    assert(j.get("rev").asText() == "rev1")
    assert(!j.get("tooBig").asBoolean())
    val ops = j.get("ops")
    assert(ops.size() == 3)
    val create = ops.get(0)
    assert(create.get("action").asText() == "create")
    assert(create.get("path").asText() == "app.bsky.feed.post/3k1")
    assert(create.get("record").get("text").asText() == "hi")
    assert(create.get("record").get("n").asLong() == 7L)
    // the op-declared cid and the hash-verified recordCid agree on an
    // unforged frame — the downstream equality filter keeps the op
    assert(create.get("cid").asText() == create.get("recordCid").asText())
    assert(create.get("cid").asText().startsWith("b"))
    val update = ops.get(1)
    assert(update.get("cid").asText() == update.get("recordCid").asText())
    val delete = ops.get(2)
    assert(delete.get("action").asText() == "delete")
    assert(!delete.has("record") && !delete.has("recordCid"))
  }

  test("frame: op CID mismatch surfaces as cid != recordCid (downstream drop)") {
    val other = Car.cidForBlock(CborCodec.fromJson("""{"x":1}"""))
    val frame = Car.buildCommitFrame(
      did = "did:plc:bob", seq = 1L, time = "2024-01-01T00:00:00Z", rev = "r",
      ops = Seq(WireOp("create", "c.d/e", Some("""{"v":9}"""), cidOverride = Some(other))))
    val op = mapper.readTree(Car.frameToJson(frame)).get("ops").get(0)
    assert(op.get("cid").asText() != op.get("recordCid").asText())
  }

  test("frame: op whose record is missing from the CAR carries no record") {
    // build a frame, then strip the record block out of the CAR by
    // rebuilding with an op path the MST does not contain
    val frame = Car.buildCommitFrame(
      did = "did:plc:carol", seq = 2L, time = "2024-01-01T00:00:00Z", rev = "r",
      ops = Seq(
        WireOp("create", "a.b/present", Some("""{"v":1}""")),
        WireOp("create", "a.b/absent", None))) // no record block, no MST entry
    val ops = mapper.readTree(Car.frameToJson(frame)).get("ops")
    assert(ops.get(0).has("record"))
    assert(!ops.get(1).has("record") && !ops.get(1).has("recordCid"))
  }

  test("frame: tooBig commit keeps envelope, drops ops") {
    val frame = Car.buildCommitFrame(
      did = "did:plc:dan", seq = 3L, time = "2024-01-01T00:00:00Z", rev = "r",
      ops = Seq(WireOp("create", "a.b/c", Some("""{"v":1}"""))), tooBig = true)
    val j = mapper.readTree(Car.frameToJson(frame))
    assert(j.get("tooBig").asBoolean())
    assert(j.get("ops").size() == 0)
  }

  test("frame: identity and account pass through") {
    val id = mapper.readTree(Car.frameToJson(
      Car.buildIdentityFrame("did:plc:eve", 7L, "2024-02-02T00:00:00Z", Some("eve.test"))))
    assert(id.get("t").asText() == "#identity")
    assert(id.get("did").asText() == "did:plc:eve")
    assert(id.get("handle").asText() == "eve.test")
    val acc = mapper.readTree(Car.frameToJson(
      Car.buildAccountFrame("did:plc:frank", 8L, "2024-02-03T00:00:00Z", false, Some("takendown"))))
    assert(acc.get("t").asText() == "#account")
    assert(!acc.get("active").asBoolean())
    assert(acc.get("status").asText() == "takendown")
  }

  test("frame: error / unknown / malformed frames throw (expression → null)") {
    // op = -1 error frame
    val err = Car.encode(CMap(Map("op" -> CInt(-1L), "t" -> CText("#x")))) ++
      Car.encode(CMap(Map("error" -> CText("FutureCursor"))))
    intercept[CborCodec.CborError](Car.frameToJson(err))
    // unknown frame type
    val unk = Car.encode(CMap(Map("op" -> CInt(1L), "t" -> CText("#mystery")))) ++
      Car.encode(CMap(Map.empty[String, CVal]))
    intercept[CborCodec.CborError](Car.frameToJson(unk))
    // truncated / trailing garbage
    val good = Car.buildIdentityFrame("did:plc:x", 1L, "2024-01-01T00:00:00Z", None)
    intercept[CborCodec.CborError](Car.frameToJson(good.dropRight(1)))
    intercept[CborCodec.CborError](Car.frameToJson(good :+ 0x00.toByte))
    assert(Car.frameToJsonU(good.dropRight(1)) == null)
  }

  test("frame: lenient envelope accepts cborgen-style unsorted keys") {
    // real producers emit struct-declaration order; hand-encode a header
    // with keys in NON-canonical order ("t" before "op" is canonical —
    // emit "op" after "t" reversed: write t then op, i.e. order that the
    // strict codec would reject either way because 'op' < 't' length-first)
    val out = new java.io.ByteArrayOutputStream()
    CborCodec.writeHead(out, 5, 2) // map(2) with keys t, op — NOT canonical (op sorts first)
    CborCodec.writeHead(out, 3, 1); out.write('t')
    CborCodec.writeHead(out, 3, 9); out.write("#identity".getBytes("UTF-8"))
    CborCodec.writeHead(out, 3, 2); out.write("op".getBytes("UTF-8"))
    CborCodec.writeHead(out, 0, 1)
    val header = out.toByteArray
    val body = Car.encode(CMap(Map(
      "seq" -> CInt(5L), "did" -> CText("did:plc:g"), "time" -> CText("2024-01-01T00:00:00Z"))))
    val j = mapper.readTree(Car.frameToJson(header ++ body))
    assert(j.get("t").asText() == "#identity")
    assert(j.get("seq").asLong() == 5L)
  }

  // -------------------------------------------- in-plan expression decode

  test("xrpc_frame_to_json feeds the standard decode chain in-plan") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val frames: Seq[Array[Byte]] = Seq(
      Car.buildCommitFrame("did:plc:p1", 10L, "2024-03-01T00:00:00Z", "r10",
        Seq(WireOp("create", "app.bsky.feed.post/a", Some("""{"text":"one"}""")))),
      Car.buildIdentityFrame("did:plc:p2", 11L, "2024-03-01T00:00:01Z", Some("p2.test")),
      Car.buildAccountFrame("did:plc:p3", 12L, "2024-03-01T00:00:02Z", true, None),
      Array[Byte](1, 2, 3)) // malformed → null → dropped by parse
    val raw = frames.toDF("value")
      .select(graft.functions.GraftFunctions.xrpc_frame_to_json(col("value")).as("value"))
    val events = graft.ingest.Decode.decodeFrames(
      graft.ingest.Decode.parseMixedFrames(raw))
      .orderBy("did")
      .collect()
    assert(events.length == 3)
    assert(events(0).getAs[String]("did") == "did:plc:p1")
    assert(events(0).getAs[String]("type") == "com")
    val commit = events(0).getAs[org.apache.spark.sql.Row]("commit")
    assert(commit.getAs[String]("collection") == "app.bsky.feed.post")
    assert(commit.getAs[String]("rkey") == "a")
    assert(mapper.readTree(commit.getAs[String]("record")).get("text").asText() == "one")
    assert(events(1).getAs[String]("type") == "id")
    assert(events(2).getAs[String]("type") == "acc")
  }

  test("in-plan: a forged op CID is dropped by the decode chain's filter") {
    import spark.implicits._
    val other = Car.cidForBlock(CborCodec.fromJson("""{"x":1}"""))
    val frames: Seq[Array[Byte]] = Seq(
      Car.buildCommitFrame("did:plc:ok", 1L, "2024-03-01T00:00:00Z", "r",
        Seq(WireOp("create", "a.b/good", Some("""{"v":1}""")))),
      Car.buildCommitFrame("did:plc:bad", 2L, "2024-03-01T00:00:01Z", "r",
        Seq(WireOp("create", "a.b/forged", Some("""{"v":2}"""), cidOverride = Some(other)))))
    val raw = frames.toDF("value")
      .select(graft.functions.GraftFunctions.xrpc_frame_to_json(col("value")).as("value"))
    val events = graft.ingest.Decode.decodeFrames(
      graft.ingest.Decode.parseMixedFrames(raw)).collect()
    assert(events.map(_.getAs[String]("did")).toSet == Set("did:plc:ok"))
  }
}
