package graft.functions

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DAG-CBOR ⇄ JSON, the record codec the reference runs on every
  * create/update op (`pkg/consumer/consumer.go:234,271` —
  * `data.UnmarshalCBOR(recordBytes)` then `json.Marshal`), implemented
  * from the public specs alone: RFC 8949 (CBOR) restricted to the
  * DAG-CBOR profile (definite lengths only, text map keys sorted
  * length-first-then-bytewise, 64-bit floats only, tag 42 the only
  * tag), with the atproto data-model JSON mapping (`bytes` →
  * `{"$bytes": base64-no-pad}`, CID links → `{"$link":
  * "b<base32-lower>"}`).
  *
  * Exposed as native Catalyst expressions (`cbor_to_json`,
  * `json_to_cbor`) rather than UDFs for the same reason as
  * [[SyntaxCheck]]: this sits on the ingest hot path (one decode per
  * record op), and a native `UnaryExpression` with `doGenCode` stays
  * inside WholeStageCodegen — the generated code calls one static
  * method, no boxing wrapper per row. Malformed input evaluates to
  * null (the `from_json` convention), so one corrupt frame never
  * fails a 100 TB scan; strictness belongs in a `WHERE decoded IS
  * NULL` audit query, not an executor exception.
  *
  * Scale posture: both directions are row-local byte work — no
  * shuffle, no driver involvement, output size ~input size. The
  * encoder is used by fixtures/serving, the decoder by ingest; both
  * are exact inverses on canonical data (spec-pinned), so a
  * CBOR-framed wire round-trips bit-for-bit.
  */
object CborCodec {

  final class CborError(msg: String) extends RuntimeException(msg)

  private def fail(msg: String): Nothing = throw new CborError(msg)

  // ---------------------------------------------------------------- decode

  private final class Reader(buf: Array[Byte]) {
    var pos = 0
    def u8(): Int = {
      if (pos >= buf.length) fail("truncated")
      val v = buf(pos) & 0xff; pos += 1; v
    }
    def take(n: Int): Array[Byte] = {
      // overflow-safe: `pos + n` can wrap negative for a forged 2^31-ish
      // length and slip past the bound into a VM-limit OutOfMemoryError
      // (an Error, which the null-on-failure bridges do NOT swallow)
      if (n < 0 || n > buf.length - pos) fail("truncated")
      val out = java.util.Arrays.copyOfRange(buf, pos, pos + n); pos += n; out
    }
    def done: Boolean = pos == buf.length
  }

  /** Reads one head, returns (major, info, argument). Indefinite
    * lengths, reserved infos, and NON-MINIMAL integer widths are
    * DAG-CBOR violations (canonical form requires the shortest head;
    * accepting `18 00` for `00` would let two byte strings decode to
    * the same JSON, breaking the decode-side canonicity the scaladoc
    * promises). The width check does not apply to major 7, where info
    * 27 means float64, not a widened integer.
    */
  private def head(r: Reader): (Int, Int, Long) = {
    val b = r.u8()
    val major = b >> 5
    val info = b & 0x1f
    val arg = info match {
      case n if n < 24 => n.toLong
      case 24 => r.u8().toLong
      case 25 => (r.u8().toLong << 8) | r.u8()
      case 26 => (r.u8().toLong << 24) | (r.u8().toLong << 16) | (r.u8().toLong << 8) | r.u8()
      case 27 =>
        var v = 0L
        var i = 0
        while (i < 8) { v = (v << 8) | r.u8(); i += 1 }
        v
      case _ => fail(s"indefinite/reserved length info $info")
    }
    if (major != 7) {
      val minimal = info match {
        case 24 => arg >= 24
        case 25 => arg >= (1 << 8)
        case 26 => arg >= (1 << 16)
        case 27 => arg < 0 || arg >= (1L << 32) // <0 = wrapped u64 ≥ 2^63
        case _ => true
      }
      if (!minimal) fail(s"non-minimal head (info $info for value $arg)")
    }
    (major, info, arg)
  }

  private def appendJsonString(sb: java.lang.StringBuilder, s: String): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.append('"')
  }

  private def decodeItem(r: Reader, sb: java.lang.StringBuilder, depth: Int): Unit = {
    if (depth > 128) fail("nesting too deep")
    val (major, info, arg) = head(r)
    major match {
      case 0 => // uint
        if (arg < 0) fail("uint exceeds i64") // 2^63..2^64-1 wrapped negative
        sb.append(arg)
      case 1 => // negint: -1 - arg
        if (arg < 0) fail("negint exceeds i64")
        sb.append(-1L - arg)
      case 2 => // bytes → {"$bytes": base64-no-pad}
        val b = r.take(lengthArg(arg))
        sb.append("{\"$bytes\":\"")
          .append(java.util.Base64.getEncoder.withoutPadding.encodeToString(b))
          .append("\"}")
      case 3 =>
        appendJsonString(sb, utf8Strict(r.take(lengthArg(arg))))
      case 4 =>
        sb.append('[')
        var i = 0L
        while (i < arg) {
          if (i > 0) sb.append(',')
          decodeItem(r, sb, depth + 1)
          i += 1
        }
        sb.append(']')
      case 5 =>
        sb.append('{')
        var i = 0L
        var prevKey: Array[Byte] = null
        while (i < arg) {
          if (i > 0) sb.append(',')
          val (km, _, ka) = head(r)
          if (km != 3) fail(s"non-text map key (major $km)")
          val key = r.take(lengthArg(ka))
          // canonical order is STRICTLY increasing (length, then
          // bytewise) — this also rejects duplicate keys, which would
          // otherwise decode to duplicate-key JSON that downstream
          // parsers resolve last-wins, a consumer-dependent value
          if (prevKey != null && !keyLess(prevKey, key))
            fail("map keys not in canonical order (or duplicated)")
          prevKey = key
          appendJsonString(sb, utf8Strict(key))
          sb.append(':')
          decodeItem(r, sb, depth + 1)
          i += 1
        }
        sb.append('}')
      case 6 => // tag — DAG-CBOR allows only 42 (CID link)
        if (arg != 42L) fail(s"tag $arg not allowed")
        val (im, _, ia) = head(r)
        if (im != 2) fail("tag 42 content must be bytes")
        val cid = r.take(lengthArg(ia))
        if (cid.length < 2 || cid(0) != 0) fail("CID missing identity multibase prefix")
        sb.append("{\"$link\":\"b")
          .append(base32Lower(cid, 1))
          .append("\"}")
      case 7 =>
        if (info == 27) { // float64 — the only float width DAG-CBOR allows
          val d = java.lang.Double.longBitsToDouble(arg)
          if (d.isNaN || d.isInfinite) fail("non-finite float")
          sb.append(java.lang.Double.toString(d))
        } else if (info < 24 && arg == 20L) sb.append("false")
        else if (info < 24 && arg == 21L) sb.append("true")
        else if (info < 24 && arg == 22L) sb.append("null")
        else fail(s"simple/float form (info $info, arg $arg) not allowed")
    }
  }

  private def lengthArg(arg: Long): Int = {
    if (arg < 0 || arg > Int.MaxValue) fail("length exceeds i32")
    arg.toInt
  }

  /** Canonical DAG-CBOR key order: length first, then bytewise. */
  private def keyLess(a: Array[Byte], b: Array[Byte]): Boolean =
    if (a.length != b.length) a.length < b.length
    else java.util.Arrays.compareUnsigned(a, b) < 0

  /** Strict UTF-8 decode — malformed sequences are a profile violation,
    * not U+FFFD: a corrupt record must land in the NULL audit bucket,
    * not silently serve replacement-character garbage that hashes as
    * genuine.
    */
  private def utf8Strict(bytes: Array[Byte]): String = {
    val dec = UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
    catch { case _: java.nio.charset.CharacterCodingException => fail("invalid UTF-8") }
  }

  /** Decode one DAG-CBOR item to its atproto JSON form. Throws
    * [[CborError]] on malformed or non-DAG-CBOR input, including
    * trailing bytes after the item.
    */
  def toJson(bytes: Array[Byte]): String = {
    val r = new Reader(bytes)
    val sb = new java.lang.StringBuilder(bytes.length * 2)
    decodeItem(r, sb, 0)
    if (!r.done) fail("trailing bytes after item")
    sb.toString
  }

  // ---------------------------------------------------------------- encode

  // trailing tokens are a parse error: "{"a":1} {"b":2}" must be null,
  // not a silently truncated encode of the first document
  private val mapper = new ObjectMapper()
    .enable(com.fasterxml.jackson.databind.DeserializationFeature.FAIL_ON_TRAILING_TOKENS)

  private[functions] def writeHead(out: ByteArrayOutputStream, major: Int, value: Long): Unit = {
    val m = major << 5
    if (value < 24) out.write(m | value.toInt)
    else if (value < (1 << 8)) { out.write(m | 24); out.write(value.toInt) }
    else if (value < (1 << 16)) {
      out.write(m | 25); out.write((value >> 8).toInt); out.write(value.toInt)
    } else if (value < (1L << 32)) {
      out.write(m | 26)
      out.write((value >> 24).toInt); out.write((value >> 16).toInt)
      out.write((value >> 8).toInt); out.write(value.toInt)
    } else {
      out.write(m | 27)
      var i = 7
      while (i >= 0) { out.write(((value >> (8 * i)) & 0xff).toInt); i -= 1 }
    }
  }

  private def writeNode(node: JsonNode, out: ByteArrayOutputStream, depth: Int): Unit = {
    if (depth > 128) fail("nesting too deep")
    if (node.isNull) out.write(0xf6)
    else if (node.isBoolean) out.write(if (node.booleanValue) 0xf5 else 0xf4)
    else if (node.isIntegralNumber) {
      if (!node.canConvertToLong) fail("integer exceeds i64")
      val v = node.longValue
      if (v >= 0) writeHead(out, 0, v) else writeHead(out, 1, -1L - v)
    } else if (node.isNumber) {
      val d = node.doubleValue
      if (d.isNaN || d.isInfinite) fail("non-finite float")
      out.write(0xfb)
      val bits = java.lang.Double.doubleToLongBits(d)
      var i = 7
      while (i >= 0) { out.write(((bits >> (8 * i)) & 0xff).toInt); i -= 1 }
    } else if (node.isTextual) {
      val b = node.textValue.getBytes(UTF_8)
      writeHead(out, 3, b.length.toLong)
      out.write(b, 0, b.length)
    } else if (node.isArray) {
      writeHead(out, 4, node.size.toLong)
      val it = node.elements()
      while (it.hasNext) writeNode(it.next(), out, depth + 1)
    } else if (node.isObject) {
      if (node.size == 1 && node.has("$bytes") && node.get("$bytes").isTextual) {
        val b = java.util.Base64.getDecoder.decode(node.get("$bytes").textValue)
        writeHead(out, 2, b.length.toLong)
        out.write(b, 0, b.length)
      } else if (node.size == 1 && node.has("$link") && node.get("$link").isTextual) {
        val s = node.get("$link").textValue
        if (s.isEmpty || s.charAt(0) != 'b') fail("$link must be base32-lower (b...)")
        val cid = base32DecodeLower(s, 1)
        if (cid.isEmpty) fail("$link carries no CID bytes") // keep encode/decode symmetric
        writeHead(out, 6, 42L)
        writeHead(out, 2, (cid.length + 1).toLong)
        out.write(0) // identity multibase prefix
        out.write(cid, 0, cid.length)
      } else {
        // canonical DAG-CBOR key order: length first, then bytewise
        val fields = new scala.collection.mutable.ArrayBuffer[(Array[Byte], JsonNode)](node.size)
        val it = node.fields()
        while (it.hasNext) {
          val e = it.next()
          fields += ((e.getKey.getBytes(UTF_8), e.getValue))
        }
        val sorted = fields.sortWith { case ((a, _), (b, _)) =>
          if (a.length != b.length) a.length < b.length
          else java.util.Arrays.compareUnsigned(a, b) < 0
        }
        writeHead(out, 5, sorted.size.toLong)
        sorted.foreach { case (k, v) =>
          writeHead(out, 3, k.length.toLong)
          out.write(k, 0, k.length)
          writeNode(v, out, depth + 1)
        }
      }
    } else fail(s"unsupported JSON node ${node.getNodeType}")
  }

  /** Encode a JSON document as canonical DAG-CBOR. Throws [[CborError]]
    * on values outside the data model (i64 overflow, non-finite floats,
    * malformed $bytes/$link envelopes) and propagates Jackson's parse
    * exceptions on invalid JSON.
    */
  def fromJson(json: String): Array[Byte] = {
    val node = mapper.readTree(json)
    if (node == null) fail("empty input")
    val out = new ByteArrayOutputStream(json.length)
    writeNode(node, out, 0)
    out.toByteArray
  }

  // ------------------------------------------------------- base32 (RFC 4648)

  private val B32 = "abcdefghijklmnopqrstuvwxyz234567"

  private[functions] def base32Lower(bytes: Array[Byte], from: Int): String = {
    val sb = new java.lang.StringBuilder(((bytes.length - from) * 8 + 4) / 5)
    var buffer = 0L
    var bits = 0
    var i = from
    while (i < bytes.length) {
      buffer = (buffer << 8) | (bytes(i) & 0xff)
      bits += 8
      while (bits >= 5) {
        bits -= 5
        sb.append(B32.charAt(((buffer >> bits) & 31).toInt))
      }
      i += 1
    }
    if (bits > 0) sb.append(B32.charAt(((buffer << (5 - bits)) & 31).toInt))
    sb.toString
  }

  private[functions] def base32DecodeLower(s: String, from: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream((s.length - from) * 5 / 8)
    var buffer = 0L
    var bits = 0
    var i = from
    while (i < s.length) {
      val v = B32.indexOf(s.charAt(i))
      if (v < 0) fail(s"invalid base32 char '${s.charAt(i)}'")
      buffer = (buffer << 5) | v
      bits += 5
      if (bits >= 8) {
        bits -= 8
        out.write(((buffer >> bits) & 0xff).toInt)
      }
      i += 1
    }
    // nonzero leftover padding bits mean a non-canonical string: "bmz"
    // and "bmy" would otherwise alias to the same byte and re-encode
    // differently than the input — reject instead of silently rewriting
    if (bits > 0 && (buffer & ((1L << bits) - 1)) != 0) fail("non-canonical base32 padding")
    out.toByteArray
  }

  // ------------------------------------------------- null-on-failure bridges

  /** Codegen entry: decode or null (never throws). */
  def toJsonU(bytes: Array[Byte]): UTF8String =
    try UTF8String.fromString(toJson(bytes))
    catch { case _: Exception => null }

  /** Codegen entry: encode or null (never throws). */
  def fromJsonU(s: UTF8String): Array[Byte] =
    try fromJson(s.toString)
    catch { case _: Exception => null }
}

/** `cbor_to_json(binary)` — DAG-CBOR item → atproto JSON string; null on
  * malformed input (the `from_json` convention).
  */
case class CborToJson(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "cbor_to_json"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary argument, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    CborCodec.toJsonU(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.CborCodec.toJsonU($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `json_to_cbor(string)` — JSON document → canonical DAG-CBOR bytes;
  * null on invalid JSON or out-of-data-model values.
  */
case class JsonToCbor(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "json_to_cbor"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    CborCodec.fromJsonU(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.CborCodec.fromJsonU($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
