package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** DAG-CBOR codec: fixed vectors from the public RFC 8949 examples
  * (appendix A) restricted to the DAG-CBOR profile, the atproto JSON
  * mapping for bytes/links, canonical map-key ordering, strictness on
  * profile violations, and both round-trip directions. The expression
  * tests pin codegen and null-on-malformed semantics inside a plan.
  */
class CborSpec extends AnyFunSuite {

  private def hex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def toHex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  // ---- fixed decode vectors (RFC 8949 appendix A values, DAG-CBOR subset)

  test("decode: integers across head widths") {
    assert(CborCodec.toJson(hex("00")) == "0")
    assert(CborCodec.toJson(hex("0a")) == "10")
    assert(CborCodec.toJson(hex("17")) == "23")
    assert(CborCodec.toJson(hex("1818")) == "24")
    assert(CborCodec.toJson(hex("1903e8")) == "1000")
    assert(CborCodec.toJson(hex("1a000f4240")) == "1000000")
    assert(CborCodec.toJson(hex("1b000000e8d4a51000")) == "1000000000000")
    assert(CborCodec.toJson(hex("1b7fffffffffffffff")) == Long.MaxValue.toString)
    assert(CborCodec.toJson(hex("20")) == "-1")
    assert(CborCodec.toJson(hex("29")) == "-10")
    assert(CborCodec.toJson(hex("3903e7")) == "-1000")
    assert(CborCodec.toJson(hex("3b7fffffffffffffff")) == Long.MinValue.toString)
  }

  test("decode: u64 beyond i64 rejected (atproto data model)") {
    intercept[CborCodec.CborError](CborCodec.toJson(hex("1b8000000000000000")))
    intercept[CborCodec.CborError](CborCodec.toJson(hex("3b8000000000000000")))
  }

  test("decode: simple values, floats, strings") {
    assert(CborCodec.toJson(hex("f4")) == "false")
    assert(CborCodec.toJson(hex("f5")) == "true")
    assert(CborCodec.toJson(hex("f6")) == "null")
    // 1.1 as float64: fb3ff199999999999a (RFC 8949 A)
    assert(CborCodec.toJson(hex("fb3ff199999999999a")) == "1.1")
    assert(CborCodec.toJson(hex("fb7e37e43c8800759c")) == "1.0E300")
    assert(CborCodec.toJson(hex("60")) == "\"\"")
    assert(CborCodec.toJson(hex("6161")) == "\"a\"")
    assert(CborCodec.toJson(hex("6449455446")) == "\"IETF\"")
    // "\"\\" escaping
    assert(CborCodec.toJson(hex("62225c")) == "\"\\\"\\\\\"")
    // "水" (UTF-8 e6b0b4)
    assert(CborCodec.toJson(hex("63e6b0b4")) == "\"水\"")
  }

  test("decode: DAG-CBOR profile violations rejected") {
    intercept[CborCodec.CborError](CborCodec.toJson(hex("f97e00"))) // float16 NaN
    intercept[CborCodec.CborError](CborCodec.toJson(hex("f93c00"))) // float16 1.0
    intercept[CborCodec.CborError](CborCodec.toJson(hex("fa47c35000"))) // float32
    intercept[CborCodec.CborError](CborCodec.toJson(hex("fb7ff0000000000000"))) // +Inf
    intercept[CborCodec.CborError](CborCodec.toJson(hex("5f42010243030405ff"))) // indef bytes
    intercept[CborCodec.CborError](CborCodec.toJson(hex("9fff"))) // indef array
    intercept[CborCodec.CborError](CborCodec.toJson(hex("bfff"))) // indef map
    intercept[CborCodec.CborError](CborCodec.toJson(hex("c11a514b67b0"))) // tag 1
    intercept[CborCodec.CborError](CborCodec.toJson(hex("a10102"))) // int map key
    intercept[CborCodec.CborError](CborCodec.toJson(hex("0000"))) // trailing bytes
    intercept[CborCodec.CborError](CborCodec.toJson(hex("62e6"))) // truncated
  }

  test("decode: canonical-form violations rejected (review findings, execution-confirmed)") {
    // forged 2^31-ish byte length must be 'truncated', not an int-overflow
    // OutOfMemoryError escaping the null bridges
    intercept[CborCodec.CborError](CborCodec.toJson(hex("5a7fffffff01")))
    assert(CborCodec.toJsonU(hex("5a7fffffff01")) == null)
    // duplicate map keys (a2 "a":1 "a":2) — consumer-dependent JSON otherwise
    intercept[CborCodec.CborError](CborCodec.toJson(hex("a2616101616102")))
    // unsorted map keys (b before a)
    intercept[CborCodec.CborError](CborCodec.toJson(hex("a2616201616102")))
    // non-minimal integer head (18 00 for 00)
    intercept[CborCodec.CborError](CborCodec.toJson(hex("1800")))
    intercept[CborCodec.CborError](CborCodec.toJson(hex("190017"))) // 19 for value 23
    // invalid UTF-8 in a text string — must land in the null audit
    // bucket, not silently become U+FFFD garbage that hashes as genuine
    intercept[CborCodec.CborError](CborCodec.toJson(hex("61e6")))
  }

  test("encode: trailing JSON tokens and non-canonical $link rejected") {
    intercept[Exception](CborCodec.fromJson("""{"a":1} {"b":2}"""))
    intercept[Exception](CborCodec.fromJson("123 456"))
    assert(CborCodec.fromJsonU(
      org.apache.spark.unsafe.types.UTF8String.fromString("""{"a":1} {"b":2}""")) == null)
    // "bmz" has nonzero leftover padding bits — it would alias with "bmy"
    intercept[CborCodec.CborError](CborCodec.fromJson("""{"$link":"bmz"}"""))
    assert(CborCodec.toJson(CborCodec.fromJson("""{"$link":"bmy"}""")) == """{"$link":"bmy"}""")
  }

  test("decode: arrays and maps") {
    assert(CborCodec.toJson(hex("80")) == "[]")
    assert(CborCodec.toJson(hex("83010203")) == "[1,2,3]")
    assert(CborCodec.toJson(hex("8301820203820405")) == "[1,[2,3],[4,5]]")
    assert(CborCodec.toJson(hex("a0")) == "{}")
    assert(CborCodec.toJson(hex("a26161016162820203")) == "{\"a\":1,\"b\":[2,3]}")
  }

  test("decode: bytes → $bytes (base64 no pad), tag 42 → $link (base32 lower)") {
    // h'01020304' → base64 "AQIDBA"
    assert(CborCodec.toJson(hex("4401020304")) == "{\"$bytes\":\"AQIDBA\"}")
    // tag 42 over 0x00-prefixed CID bytes; base32("0102") = "aeba" + "g"?
    // compute via the codec's own encoder-independent property below; here
    // pin a tiny vector by hand: bytes 01 02 03 04 05 →
    // 00000 00100 00001 00000 11000 10000 01010 (b32 of 0102030405)
    val j = CborCodec.toJson(hex("d82a4600" + "0102030405"))
    assert(j == "{\"$link\":\"b" + CborCodec.base32Lower(hex("0102030405"), 0) + "\"}")
  }

  test("base32: RFC 4648 vectors (lowercase, no pad)") {
    def enc(s: String) = CborCodec.base32Lower(s.getBytes("US-ASCII"), 0)
    assert(enc("") == "")
    assert(enc("f") == "my")
    assert(enc("fo") == "mzxq")
    assert(enc("foo") == "mzxw6")
    assert(enc("foob") == "mzxw6yq")
    assert(enc("fooba") == "mzxw6ytb")
    assert(enc("foobar") == "mzxw6ytboi")
    val round = CborCodec.base32DecodeLower(enc("foobar"), 0)
    assert(new String(round, "US-ASCII") == "foobar")
  }

  // ---- encode

  test("encode: canonical map-key order is length-first then bytewise") {
    // input JSON deliberately unsorted; "zz" (len 2) must sort before
    // "aaa" (len 3); "a" before "b" at equal length
    val cbor = CborCodec.fromJson("""{"aaa":3,"b":2,"zz":1,"a":0}""")
    assert(CborCodec.toJson(cbor) == """{"a":0,"b":2,"zz":1,"aaa":3}""")
  }

  test("encode: minimal-width integer heads") {
    assert(toHex(CborCodec.fromJson("23")) == "17")
    assert(toHex(CborCodec.fromJson("24")) == "1818")
    assert(toHex(CborCodec.fromJson("255")) == "18ff")
    assert(toHex(CborCodec.fromJson("256")) == "190100")
    assert(toHex(CborCodec.fromJson("65536")) == "1a00010000")
    assert(toHex(CborCodec.fromJson("4294967296")) == "1b0000000100000000")
    assert(toHex(CborCodec.fromJson("-1000")) == "3903e7")
    assert(toHex(CborCodec.fromJson("1.1")) == "fb3ff199999999999a")
    assert(toHex(CborCodec.fromJson("true")) == "f5")
    assert(toHex(CborCodec.fromJson("null")) == "f6")
  }

  test("encode: $bytes and $link envelopes re-emit binary forms") {
    assert(toHex(CborCodec.fromJson("""{"$bytes":"AQIDBA"}""")) == "4401020304")
    val link = "{\"$link\":\"b" + CborCodec.base32Lower(hex("0102030405"), 0) + "\"}"
    assert(toHex(CborCodec.fromJson(link)) == "d82a46000102030405")
    // a $bytes key among others is a plain map, not an envelope
    val plain = CborCodec.fromJson("""{"$bytes":"AQIDBA","x":1}""")
    assert(CborCodec.toJson(plain).contains("\"$bytes\":\"AQIDBA\""))
  }

  test("round-trip: json→cbor→json identity on nested docs") {
    val docs = Seq(
      """{"a":1,"b":[true,null,2.5],"c":{"d":"x","e":[-7,"y"]}}""",
      """{"$bytes":"AQIDBA"}""",
      """[1,-2,3.5,"s",null,{"k":[{"kk":false}]}]""",
      """{"text":"line1\nline2\t\"quoted\"","n":9007199254740993}""",
      "\"水 unicode é\"",
      "[]", "{}", "0", "-1", "false")
    docs.foreach { d =>
      val c1 = CborCodec.fromJson(d)
      val j = CborCodec.toJson(c1)
      val c2 = CborCodec.fromJson(j)
      assert(toHex(c1) == toHex(c2), s"cbor→json→cbor not stable for $d")
    }
  }

  test("round-trip: cbor→json→cbor identity on canonical inputs") {
    val vectors = Seq("00", "3903e7", "fb3ff199999999999a", "6449455446",
      "83010203", "a26161016162820203", "4401020304", "d82a46000102030405",
      "f4", "f6")
    vectors.foreach { v =>
      val j = CborCodec.toJson(hex(v))
      assert(toHex(CborCodec.fromJson(j)) == v, s"json→cbor not inverse for $v ($j)")
    }
  }
}

/** The Catalyst expressions inside real plans: codegen, null semantics,
  * and the SQL registration.
  */
class CborExpressionSpec extends SparkSpec {

  test("cbor_to_json/json_to_cbor round-trip inside a codegen'd plan") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq(
      (1L, """{"b":2,"a":[1,null,true],"t":"x\ny"}"""),
      (2L, """{"$bytes":"AQIDBA"}"""),
      (3L, "not json at all"))
      .toDF("id", "j")
      .selectExpr("id", "cbor_to_json(json_to_cbor(j)) AS rt")
    val rows = df.orderBy("id").collect()
    assert(rows(0).getString(1) == """{"a":[1,null,true],"b":2,"t":"x\ny"}""")
    assert(rows(1).getString(1) == """{"$bytes":"AQIDBA"}""")
    assert(rows(2).isNullAt(1)) // invalid JSON → null, not an exception
  }

  test("malformed CBOR bytes evaluate to null in a plan") {
    import spark.implicits._
    val df = Seq(
      (1L, Array[Byte](0x62.toByte, 0xe6.toByte)), // truncated text
      (2L, CborCodec.fromJson("""{"ok":true}""")))
      .toDF("id", "b")
      .select($"id", GraftFunctions.cbor_to_json($"b").as("j"))
    val rows = df.orderBy("id").collect()
    assert(rows(0).isNullAt(1))
    assert(rows(1).getString(1) == """{"ok":true}""")
  }
}
