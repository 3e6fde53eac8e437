package graft.functions

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import com.fasterxml.jackson.databind.util.RawValue

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The raw relay wire, S5 — the one boundary the repo previously left
  * outside: an XRPC event-stream message is TWO concatenated CBOR items
  * (header `{t, op}` + body), and a `#commit` body carries a CARv1
  * archive (`blocks`) holding the commit object, the repo's MST nodes,
  * and the op records as content-addressed blocks. The reference decodes
  * this inside indigo's `events.HandleRepoStream`
  * (cmd/jetstream/main.go:317) and then walks the CAR per op —
  * `repo.ReadRepoFromCar` + `rr.GetRecordBytes(path)` + CID equality
  * check (pkg/consumer/consumer.go:177-181,215-233).
  *
  * Everything here is implemented from public specs alone: RFC 8949
  * (CBOR), the CARv1 layout (varint-framed sections of CID+block), CIDv1
  * (multicodec varints + multihash), and the atproto repository MST
  * (prefix-compressed keys, layer = leading 2-bit zero chunks of
  * sha-256(key)).
  *
  * Two dialects on purpose:
  *   - the ENVELOPE (header, commit body, commit object, MST nodes) is
  *     parsed with a LENIENT structural reader — real producers emit
  *     struct-declaration field order (Go cborgen), not canonical order,
  *     so a canonical-only reader would reject the actual wire;
  *   - the RECORDS are decoded with the STRICT canonical [[CborCodec]] —
  *     atproto record blocks are canonical DAG-CBOR by spec, and
  *     strictness is what makes the CID check meaningful (two encodings
  *     of one document must not both pass).
  *
  * Scale posture: one frame decodes with row-local byte work — no
  * shuffle, no driver involvement — exposed as a codegen'd
  * `xrpc_frame_to_json` expression so a 1000-executor ingest decodes
  * frames inside the scan's WholeStageCodegen span, exactly like
  * [[CborToJson]]. Malformed frames evaluate to null (audit-bucket
  * convention), never throw.
  */
object Car {

  import CborCodec.CborError

  private def fail(msg: String): Nothing = throw new CborError(msg)

  // ------------------------------------------------------------- varint
  // Unsigned LEB128, the multiformats varint: ≤ 9 bytes, fits a Long.

  private[functions] def readVarint(buf: Array[Byte], pos: Int): (Long, Int) = {
    var v = 0L
    var shift = 0
    var p = pos
    while (true) {
      if (p >= buf.length) fail("truncated varint")
      if (shift > 56) fail("varint too long")
      val b = buf(p) & 0xff
      v |= (b & 0x7fL) << shift
      p += 1
      if ((b & 0x80) == 0) return (v, p)
      shift += 7
    }
    throw new IllegalStateException("unreachable")
  }

  private[functions] def writeVarint(out: ByteArrayOutputStream, value: Long): Unit = {
    var v = value
    require(v >= 0, "varint must be non-negative")
    while (v >= 0x80) { out.write(((v & 0x7f) | 0x80).toInt); v >>= 7 }
    out.write(v.toInt)
  }

  // ------------------------------------------- lenient structural CBOR
  // The envelope dialect: definite lengths only (the atproto stream
  // never uses indefinite), but ANY field order and ANY integer head
  // width — Go cborgen emits struct order, and a reader that demanded
  // canonical order would reject the real relay wire.

  sealed trait CVal
  final case class CInt(v: Long) extends CVal
  final case class CFloat(v: Double) extends CVal
  final case class CText(s: String) extends CVal
  final case class CBytes(b: Array[Byte]) extends CVal
  final case class CBool(v: Boolean) extends CVal
  case object CNull extends CVal
  final case class CArr(items: Vector[CVal]) extends CVal
  final case class CMap(entries: Map[String, CVal]) extends CVal
  /** Tag 42 — the raw CID bytes WITHOUT the identity-multibase 0x00. */
  final case class CLink(cid: Array[Byte]) extends CVal

  private final class Reader(val buf: Array[Byte]) {
    var pos = 0
    def u8(): Int = {
      if (pos >= buf.length) fail("truncated")
      val v = buf(pos) & 0xff; pos += 1; v
    }
    def take(n: Int): Array[Byte] = {
      if (n < 0 || n > buf.length - pos) fail("truncated")
      val out = java.util.Arrays.copyOfRange(buf, pos, pos + n); pos += n; out
    }
    def done: Boolean = pos == buf.length
  }

  private def lenientHead(r: Reader): (Int, Int, Long) = {
    val b = r.u8()
    val major = b >> 5
    val info = b & 0x1f
    val arg = info match {
      case n if n < 24 => n.toLong
      case 24 => r.u8().toLong
      case 25 => (r.u8().toLong << 8) | r.u8()
      case 26 => (r.u8().toLong << 24) | (r.u8().toLong << 16) | (r.u8().toLong << 8) | r.u8()
      case 27 =>
        var v = 0L; var i = 0
        while (i < 8) { v = (v << 8) | r.u8(); i += 1 }
        v
      case _ => fail(s"indefinite/reserved length info $info")
    }
    (major, info, arg)
  }

  private def len32(arg: Long): Int = {
    if (arg < 0 || arg > Int.MaxValue) fail("length exceeds i32")
    arg.toInt
  }

  private def readItem(r: Reader, depth: Int): CVal = {
    if (depth > 64) fail("nesting too deep")
    val (major, info, arg) = lenientHead(r)
    major match {
      case 0 => if (arg < 0) fail("uint exceeds i64") else CInt(arg)
      case 1 => if (arg < 0) fail("negint exceeds i64") else CInt(-1L - arg)
      case 2 => CBytes(r.take(len32(arg)))
      case 3 => CText(new String(r.take(len32(arg)), UTF_8))
      case 4 =>
        val b = Vector.newBuilder[CVal]
        var i = 0L
        while (i < arg) { b += readItem(r, depth + 1); i += 1 }
        CArr(b.result())
      case 5 =>
        var m = Map.empty[String, CVal]
        var i = 0L
        while (i < arg) {
          readItem(r, depth + 1) match {
            case CText(k) => m = m.updated(k, readItem(r, depth + 1))
            case _ => fail("non-text map key")
          }
          i += 1
        }
        CMap(m)
      case 6 =>
        if (arg != 42L) fail(s"tag $arg not allowed")
        readItem(r, depth + 1) match {
          case CBytes(b) =>
            if (b.length < 2 || b(0) != 0) fail("CID missing identity multibase prefix")
            CLink(java.util.Arrays.copyOfRange(b, 1, b.length))
          case _ => fail("tag 42 content must be bytes")
        }
      case 7 =>
        if (info == 27) CFloat(java.lang.Double.longBitsToDouble(arg))
        else if (info == 26) CFloat(java.lang.Float.intBitsToFloat(arg.toInt).toDouble)
        else if (info < 24 && arg == 20L) CBool(false)
        else if (info < 24 && arg == 21L) CBool(true)
        else if (info < 24 && arg == 22L) CNull
        else fail(s"simple/float form (info $info) not allowed")
    }
  }

  /** Read one CBOR item starting at `r.pos`, leniently. Advances pos. */
  private def readOne(r: Reader): CVal = readItem(r, 0)

  /** Canonical structural encode (the fixture/serving direction; the
    * lenient reader above accepts it, as does any spec-conforming peer).
    */
  private[functions] def encode(v: CVal): Array[Byte] = {
    val out = new ByteArrayOutputStream(64)
    writeVal(v, out, 0)
    out.toByteArray
  }

  private def writeVal(v: CVal, out: ByteArrayOutputStream, depth: Int): Unit = {
    if (depth > 64) fail("nesting too deep")
    v match {
      case CInt(n) =>
        if (n >= 0) CborCodec.writeHead(out, 0, n) else CborCodec.writeHead(out, 1, -1L - n)
      case CFloat(d) =>
        out.write(0xfb)
        val bits = java.lang.Double.doubleToLongBits(d)
        var i = 7
        while (i >= 0) { out.write(((bits >> (8 * i)) & 0xff).toInt); i -= 1 }
      case CText(s) =>
        val b = s.getBytes(UTF_8)
        CborCodec.writeHead(out, 3, b.length.toLong); out.write(b, 0, b.length)
      case CBytes(b) =>
        CborCodec.writeHead(out, 2, b.length.toLong); out.write(b, 0, b.length)
      case CBool(x) => out.write(if (x) 0xf5 else 0xf4)
      case CNull => out.write(0xf6)
      case CArr(items) =>
        CborCodec.writeHead(out, 4, items.size.toLong)
        items.foreach(writeVal(_, out, depth + 1))
      case CMap(entries) =>
        // canonical DAG-CBOR order: length first, then bytewise
        val sorted = entries.toSeq.map { case (k, x) => (k.getBytes(UTF_8), x) }
          .sortWith { case ((a, _), (b, _)) =>
            if (a.length != b.length) a.length < b.length
            else java.util.Arrays.compareUnsigned(a, b) < 0
          }
        CborCodec.writeHead(out, 5, sorted.size.toLong)
        sorted.foreach { case (k, x) =>
          CborCodec.writeHead(out, 3, k.length.toLong); out.write(k, 0, k.length)
          writeVal(x, out, depth + 1)
        }
      case CLink(cid) =>
        CborCodec.writeHead(out, 6, 42L)
        CborCodec.writeHead(out, 2, (cid.length + 1).toLong)
        out.write(0)
        out.write(cid, 0, cid.length)
    }
  }

  // ----------------------------------------------------------------- CID

  private def sha256(b: Array[Byte]): Array[Byte] =
    MessageDigest.getInstance("SHA-256").digest(b)

  /** CIDv1 for a dag-cbor block: version 1, codec 0x71, sha2-256
    * multihash (0x12, 32 bytes).
    */
  def cidForBlock(block: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(36)
    out.write(0x01); out.write(0x71); out.write(0x12); out.write(0x20)
    val d = sha256(block)
    out.write(d, 0, d.length)
    out.toByteArray
  }

  /** "b" + base32-lower — the string form the reference compares and
    * serves (consumer.go:224, `rcid.String()`).
    */
  private[functions] def cidString(cid: Array[Byte]): String =
    "b" + CborCodec.base32Lower(cid, 0)

  /** Verify a CAR section's CID against its block bytes: parse the
    * multicodec/multihash varints, require sha2-256/32, compare digests.
    * Returns false for any CID we cannot verify (unknown hash function —
    * an unverifiable block must not be trusted).
    */
  private[functions] def cidMatches(cid: Array[Byte], block: Array[Byte]): Boolean =
    try {
      val (version, p1) = readVarint(cid, 0)
      if (version != 1L) return false // CIDv0 (0x12 0x20…) parses as version 0x12
      val (_, p2) = readVarint(cid, p1) // content codec (0x71 dag-cbor / 0x55 raw)
      val (hashFn, p3) = readVarint(cid, p2)
      val (hashLen, p4) = readVarint(cid, p3)
      if (hashFn != 0x12L || hashLen != 32L || cid.length - p4 != 32) return false
      java.util.Arrays.equals(java.util.Arrays.copyOfRange(cid, p4, cid.length), sha256(block))
    } catch { case _: CborError => false }

  // ----------------------------------------------------------------- CAR

  /** A parsed CARv1: root CID + content-addressed block store. Blocks
    * whose CID does not verify against their bytes are DROPPED at parse
    * time, so every lookup result is hash-authenticated — the property
    * the reference gets from go-car + go-cid.
    */
  final class CarArchive(val roots: Vector[Array[Byte]],
      blocks: java.util.HashMap[String, Array[Byte]]) {
    def block(cid: Array[Byte]): Option[Array[Byte]] = Option(blocks.get(cidString(cid)))
    def size: Int = blocks.size
  }

  /** Parse a CARv1 archive: varint-framed header block (dag-cbor
    * `{roots, version}`), then varint-framed sections of `CID ++ block`.
    * Throws [[CborError]] on structural corruption; silently drops
    * hash-mismatched blocks (one bad block must not poison the frame's
    * other ops).
    */
  def readCar(bytes: Array[Byte]): CarArchive = {
    val (hlen, hstart) = readVarint(bytes, 0)
    val hend = hstart + len32(hlen)
    if (hlen <= 0 || hend > bytes.length) fail("truncated CAR header")
    val header = readOne(new Reader(java.util.Arrays.copyOfRange(bytes, hstart, hend)))
    val roots = header match {
      case CMap(m) =>
        m.get("version") match {
          case Some(CInt(1L)) => ()
          case _ => fail("unsupported CAR version")
        }
        m.get("roots") match {
          case Some(CArr(items)) => items.collect { case CLink(c) => c }.toVector
          case _ => fail("CAR header missing roots")
        }
      case _ => fail("CAR header not a map")
    }
    val blocks = new java.util.HashMap[String, Array[Byte]]()
    var pos = hend
    while (pos < bytes.length) {
      val (slen, sstart) = readVarint(bytes, pos)
      val send = sstart + len32(slen)
      if (slen <= 0 || send > bytes.length) fail("truncated CAR section")
      // section = CID ++ block; find the CID end by parsing its varints
      val (version, p1) = readVarint(bytes, sstart)
      if (version != 1L) fail("only CIDv1 sections supported")
      val (_, p2) = readVarint(bytes, p1)
      val (_, p3) = readVarint(bytes, p2)
      val (hashLen, p4) = readVarint(bytes, p3)
      val cidEnd = p4 + len32(hashLen)
      if (cidEnd > send) fail("CID overruns section")
      val cid = java.util.Arrays.copyOfRange(bytes, sstart, cidEnd)
      val block = java.util.Arrays.copyOfRange(bytes, cidEnd, send)
      if (cidMatches(cid, block)) blocks.put(cidString(cid), block)
      pos = send
    }
    new CarArchive(roots, blocks)
  }

  /** Serialize a CARv1 archive (fixture/serving direction). */
  def writeCar(root: Array[Byte], blocks: Seq[(Array[Byte], Array[Byte])]): Array[Byte] = {
    val out = new ByteArrayOutputStream(1024)
    val header = encode(CMap(Map(
      "roots" -> CArr(Vector(CLink(root))), "version" -> CInt(1L))))
    writeVarint(out, header.length.toLong)
    out.write(header, 0, header.length)
    blocks.foreach { case (cid, block) =>
      writeVarint(out, (cid.length + block.length).toLong)
      out.write(cid, 0, cid.length)
      out.write(block, 0, block.length)
    }
    out.toByteArray
  }

  // ----------------------------------------------------------------- MST

  /** The atproto repository Merkle Search Tree: nodes are dag-cbor
    * `{l: link|null, e: [{p: int, k: bytes, v: link, t: link|null}]}`
    * with prefix-compressed keys (`p` = bytes shared with the previous
    * key in the SAME node), entries sorted, `l`/`t` pointing at
    * lower-layer subtrees. A key's layer is the count of leading 2-bit
    * zero chunks of sha-256(key) — that is what makes the tree shape a
    * pure function of its contents.
    */
  object Mst {

    private[functions] def keyLayer(key: String): Int = {
      val h = sha256(key.getBytes(UTF_8))
      var layer = 0
      var i = 0
      while (i < h.length) {
        val b = h(i) & 0xff
        var shift = 6
        while (shift >= 0) {
          if (((b >> shift) & 0x3) != 0) return layer
          layer += 1
          shift -= 2
        }
        i += 1
      }
      layer
    }

    /** Build the canonical MST for `entries` (key → value CID), emitting
      * every node block into `sink` (cid, block) and returning the root
      * CID. Empty input yields the canonical empty node.
      */
    def build(entries: Seq[(String, Array[Byte])],
        sink: scala.collection.mutable.Buffer[(Array[Byte], Array[Byte])]): Array[Byte] = {
      val sorted = entries.sortBy(_._1).toVector
      require(sorted.map(_._1).distinct.size == sorted.size, "duplicate MST keys")
      buildNode(sorted, sink)
    }

    private def buildNode(sorted: Vector[(String, Array[Byte])],
        sink: scala.collection.mutable.Buffer[(Array[Byte], Array[Byte])]): Array[Byte] = {
      if (sorted.isEmpty) return emit(None, Vector.empty, sink)
      val top = sorted.map { case (k, _) => keyLayer(k) }.max
      // split around the top-layer keys; gaps become lower subtrees
      val here = Vector.newBuilder[(String, Array[Byte])]
      val gaps = Vector.newBuilder[Vector[(String, Array[Byte])]]
      var gap = Vector.newBuilder[(String, Array[Byte])]
      sorted.foreach { case e @ (k, _) =>
        if (keyLayer(k) == top) { gaps += gap.result(); gap = Vector.newBuilder; here += e }
        else gap += e
      }
      gaps += gap.result()
      val hereV = here.result()
      val gapsV = gaps.result() // hereV.size + 1 of them
      val left = gapsV.head match {
        case v if v.isEmpty => None
        case v => Some(buildNode(v, sink))
      }
      val es = hereV.zipWithIndex.map { case ((k, vcid), i) =>
        val sub = gapsV(i + 1) match {
          case v if v.isEmpty => None
          case v => Some(buildNode(v, sink))
        }
        (k, vcid, sub)
      }
      emit(left, es, sink)
    }

    private def emit(left: Option[Array[Byte]],
        entries: Vector[(String, Array[Byte], Option[Array[Byte]])],
        sink: scala.collection.mutable.Buffer[(Array[Byte], Array[Byte])]): Array[Byte] = {
      var prev = ""
      val es = entries.map { case (k, v, t) =>
        val p = commonPrefix(prev, k)
        val e = CMap(Map(
          "p" -> CInt(p.toLong),
          "k" -> CBytes(k.substring(p).getBytes(UTF_8)),
          "v" -> CLink(v),
          "t" -> t.map(CLink(_): CVal).getOrElse(CNull)))
        prev = k
        e: CVal
      }
      val block = encode(CMap(Map(
        "l" -> left.map(CLink(_): CVal).getOrElse(CNull),
        "e" -> CArr(es))))
      val cid = cidForBlock(block)
      sink += ((cid, block))
      cid
    }

    private def commonPrefix(a: String, b: String): Int = {
      val ab = a.getBytes(UTF_8); val bb = b.getBytes(UTF_8)
      var i = 0
      val n = math.min(ab.length, bb.length)
      while (i < n && ab(i) == bb(i)) i += 1
      i
    }

    /** Walk the tree from `rootCid` to `path`; returns the record's
      * value CID if present. Depth-bounded (a crafted cyclic graph must
      * not spin the executor — sha-256 layers cap real trees far below
      * 128).
      */
    def lookup(car: CarArchive, rootCid: Array[Byte], path: String): Option[Array[Byte]] =
      lookupIn(car, rootCid, path, 0)

    private def lookupIn(car: CarArchive, nodeCid: Array[Byte], path: String,
        depth: Int): Option[Array[Byte]] = {
      if (depth > 128) fail("MST too deep")
      val block = car.block(nodeCid).getOrElse(return None)
      val node = readOne(new Reader(block)) match {
        case m: CMap => m
        case _ => fail("MST node not a map")
      }
      val left = node.entries.get("l") match {
        case Some(CLink(c)) => Some(c)
        case _ => None
      }
      val rawEntries = node.entries.get("e") match {
        case Some(CArr(items)) => items
        case _ => fail("MST node missing entries")
      }
      var prev = ""
      var descend: Option[Array[Byte]] = left
      var i = 0
      while (i < rawEntries.length) {
        val e = rawEntries(i) match {
          case m: CMap => m.entries
          case _ => fail("MST entry not a map")
        }
        val p = e.get("p") match { case Some(CInt(v)) => len32(v); case _ => fail("entry missing p") }
        val suffix = e.get("k") match {
          case Some(CBytes(b)) => new String(b, UTF_8)
          case _ => fail("entry missing k")
        }
        if (p > prev.length) fail("prefix overruns previous key")
        val key = prev.substring(0, p) + suffix
        if (key == path) return e.get("v") match {
          case Some(CLink(c)) => Some(c)
          case _ => fail("entry missing v")
        }
        // ordering is bytewise; repo paths are ASCII (atproto path
        // grammar), where String comparison coincides with byte order
        if (path > key) descend = e.get("t") match {
          case Some(CLink(c)) => Some(c)
          case _ => None
        }
        else {
          // path falls in the gap before this key: descend into the
          // subtree chosen so far (left-of-first or previous entry's t)
          return descend match {
            case Some(c) => lookupIn(car, c, path, depth + 1)
            case None => None
          }
        }
        prev = key
        i += 1
      }
      descend match {
        case Some(c) => lookupIn(car, c, path, depth + 1)
        case None => None
      }
    }
  }

  // ------------------------------------------------------ frame decode

  private val mapper = new ObjectMapper()

  private def textOf(m: Map[String, CVal], k: String): Option[String] =
    m.get(k) match { case Some(CText(s)) => Some(s); case _ => None }
  private def intOf(m: Map[String, CVal], k: String): Option[Long] =
    m.get(k) match { case Some(CInt(v)) => Some(v); case _ => None }
  private def boolOf(m: Map[String, CVal], k: String): Option[Boolean] =
    m.get(k) match { case Some(CBool(v)) => Some(v); case _ => None }

  /** Decode one raw XRPC relay message (header + body CBOR items, CAR
    * blocks inside a `#commit` body) into the repo's wire frame JSON —
    * the exact shape [[graft.model.Event.rawFrameSchema]] parses, so
    * everything downstream of [[graft.ingest.Decode.parseMixedFrames]]
    * is unchanged. This is `HandleRepoStream` + `HandleRepoCommit`
    * (consumer.go:99-305) as one pure function:
    *   - `#commit`: read the CAR, walk the MST per op, decode the record
    *     through the STRICT canonical codec, and attach `recordCid` (the
    *     hash-verified CID the block store authenticated) — the
    *     downstream `cid == recordCid` filter is the reference's
    *     mismatch drop (consumer.go:227-231);
    *   - ops whose record cannot be fetched/decoded carry no
    *     record/recordCid and fall to the same filter — the reference's
    *     log-and-break (consumer.go:221-224);
    *   - `#identity` / `#account`: field passthrough;
    *   - error frames (`op = -1`) and unknown `t` values fail → null.
    * Throws [[CborCodec.CborError]] on malformed frames; the expression
    * bridge maps that to null.
    */
  def frameToJson(bytes: Array[Byte]): String = {
    val r = new Reader(bytes)
    val header = readOne(r) match {
      case m: CMap => m.entries
      case _ => fail("frame header not a map")
    }
    val op = intOf(header, "op").getOrElse(fail("header missing op"))
    if (op == -1L) fail("error frame") // reference: return error (consumer.go:157-159)
    if (op != 1L) fail(s"unknown frame op $op")
    val t = textOf(header, "t").getOrElse(fail("header missing t"))
    val body = readOne(r) match {
      case m: CMap => m.entries
      case _ => fail("frame body not a map")
    }
    if (!r.done) fail("trailing bytes after body")
    val out = mapper.createObjectNode()
    out.put("t", t)
    t match {
      case "#commit" => decodeCommit(body, out)
      case "#identity" =>
        out.put("did", textOf(body, "did").getOrElse(fail("identity missing did")))
        intOf(body, "seq").foreach(out.put("seq", _))
        textOf(body, "time").foreach(out.put("time", _))
        textOf(body, "handle").foreach(out.put("handle", _))
      case "#account" =>
        out.put("did", textOf(body, "did").getOrElse(fail("account missing did")))
        intOf(body, "seq").foreach(out.put("seq", _))
        textOf(body, "time").foreach(out.put("time", _))
        boolOf(body, "active").foreach(out.put("active", _))
        textOf(body, "status").foreach(out.put("status", _))
      case other => fail(s"unknown frame type $other")
    }
    out.toString
  }

  private def decodeCommit(body: Map[String, CVal], out: ObjectNode): Unit = {
    out.put("did", textOf(body, "repo").getOrElse(fail("commit missing repo")))
    intOf(body, "seq").foreach(out.put("seq", _))
    textOf(body, "time").foreach(out.put("time", _))
    textOf(body, "rev").foreach(out.put("rev", _))
    val tooBig = boolOf(body, "tooBig").getOrElse(false)
    out.put("tooBig", tooBig)
    val opsOut = out.putArray("ops")
    if (tooBig) return // reference drops the frame before touching blocks (consumer.go:106-109)
    val ops = body.get("ops") match {
      case Some(CArr(items)) => items
      case _ => Vector.empty[CVal]
    }
    if (ops.isEmpty) return
    val carBytes = body.get("blocks") match {
      case Some(CBytes(b)) => b
      case _ => fail("commit missing blocks")
    }
    val car = readCar(carBytes)
    val root = car.roots.headOption.getOrElse(fail("CAR has no roots"))
    // commit object: {did, rev, sig, data -> MST root, prev, version: 3}
    val commitBlock = car.block(root).getOrElse(fail("root block missing"))
    val commit = readOne(new Reader(commitBlock)) match {
      case m: CMap => m.entries
      case _ => fail("commit block not a map")
    }
    intOf(commit, "version") match {
      case Some(3L) => ()
      case _ => fail("unsupported repo version")
    }
    val mstRoot = commit.get("data") match {
      case Some(CLink(c)) => c
      case _ => fail("commit missing data link")
    }
    ops.foreach {
      case m: CMap =>
        val e = m.entries
        val action = textOf(e, "action").getOrElse(fail("op missing action"))
        val path = textOf(e, "path").getOrElse(fail("op missing path"))
        val opNode = opsOut.addObject()
        opNode.put("action", action)
        opNode.put("path", path)
        e.get("cid") match {
          case Some(CLink(c)) => opNode.put("cid", cidString(c))
          case _ => ()
        }
        if (action == "create" || action == "update") {
          // GetRecordBytes: MST walk + hash-verified block fetch
          // (consumer.go:221-226); failures leave record/recordCid
          // absent and the downstream CID filter drops the op
          for {
            rcid <- Mst.lookup(car, mstRoot, path)
            rec <- car.block(rcid)
            json <- try Some(CborCodec.toJson(rec)) catch { case _: CborError => None }
          } {
            opNode.put("recordCid", cidString(rcid))
            opNode.putRawValue("record", new RawValue(json))
          }
        }
      case _ => fail("op not a map")
    }
  }

  // ------------------------------------------------------- frame build
  // The serving/fixture direction: synthesize a REAL relay message —
  // records encoded canonical, MST built by the layer function, commit
  // block linking the tree, CARv1 framing, cborgen-shaped body, header —
  // so the decode path above is exercised against the true wire layout.

  final case class WireOp(action: String, path: String, recordJson: Option[String],
      /** Overrides the op-declared CID (None = the true record CID);
        * used to synthesize the reference's mismatch-drop case. */
      cidOverride: Option[Array[Byte]] = None)

  def buildCommitFrame(did: String, seq: Long, time: String, rev: String,
      ops: Seq[WireOp], tooBig: Boolean = false): Array[Byte] = {
    val blocks = scala.collection.mutable.ArrayBuffer.empty[(Array[Byte], Array[Byte])]
    val records = ops.flatMap { op =>
      op.recordJson.map { json =>
        val rec = CborCodec.fromJson(json)
        val cid = cidForBlock(rec)
        blocks += ((cid, rec))
        op.path -> cid
      }
    }
    val mstRoot = Mst.build(records, blocks)
    val commitBlock = encode(CMap(Map(
      "did" -> CText(did),
      "rev" -> CText(rev),
      "sig" -> CBytes(sha256(did.getBytes(UTF_8))), // deterministic placeholder signature
      "data" -> CLink(mstRoot),
      "prev" -> CNull,
      "version" -> CInt(3L))))
    val commitCid = cidForBlock(commitBlock)
    blocks += ((commitCid, commitBlock))
    val car = writeCar(commitCid, blocks.toSeq)
    val recordCids = records.toMap
    val bodyOps = ops.map { op =>
      val declared = op.cidOverride.orElse(recordCids.get(op.path))
      CMap(Map(
        "action" -> CText(op.action),
        "path" -> CText(op.path),
        "cid" -> declared.map(CLink(_): CVal).getOrElse(CNull)): Map[String, CVal])
    }
    val body = CMap(Map(
      "seq" -> CInt(seq),
      "rebase" -> CBool(false),
      "tooBig" -> CBool(tooBig),
      "repo" -> CText(did),
      "commit" -> CLink(commitCid),
      "rev" -> CText(rev),
      "since" -> CNull,
      "blocks" -> CBytes(car),
      "ops" -> CArr(bodyOps.toVector),
      "blobs" -> CArr(Vector.empty),
      "time" -> CText(time)))
    concatFrames(CMap(Map("op" -> CInt(1L), "t" -> CText("#commit"))), body)
  }

  def buildIdentityFrame(did: String, seq: Long, time: String,
      handle: Option[String]): Array[Byte] =
    concatFrames(
      CMap(Map("op" -> CInt(1L), "t" -> CText("#identity"))),
      CMap(Map("seq" -> CInt(seq), "did" -> CText(did), "time" -> CText(time)) ++
        handle.map(h => "handle" -> (CText(h): CVal))))

  def buildAccountFrame(did: String, seq: Long, time: String, active: Boolean,
      status: Option[String]): Array[Byte] =
    concatFrames(
      CMap(Map("op" -> CInt(1L), "t" -> CText("#account"))),
      CMap(Map("seq" -> CInt(seq), "did" -> CText(did), "time" -> CText(time),
        "active" -> CBool(active)) ++ status.map(s => "status" -> (CText(s): CVal))))

  private def concatFrames(header: CVal, body: CVal): Array[Byte] = {
    val h = encode(header); val b = encode(body)
    val out = new ByteArrayOutputStream(h.length + b.length)
    out.write(h, 0, h.length); out.write(b, 0, b.length)
    out.toByteArray
  }

  // ------------------------------------------------ null-on-failure bridge

  /** Codegen entry: decode or null (never throws). */
  def frameToJsonU(bytes: Array[Byte]): UTF8String =
    try UTF8String.fromString(frameToJson(bytes))
    catch { case _: Exception => null }
}

/** `xrpc_frame_to_json(binary)` — one raw relay message (header+body CBOR,
  * CAR blocks) → the jetstream wire frame JSON; null on malformed input.
  * Native codegen'd expression so the full S5 decode (CAR + MST + CID
  * verify + record CBOR) runs inside the scan's WholeStageCodegen span.
  */
case class XrpcFrameToJson(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "xrpc_frame_to_json"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary argument, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    Car.frameToJsonU(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.Car.frameToJsonU($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
