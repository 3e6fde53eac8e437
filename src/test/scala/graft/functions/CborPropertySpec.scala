package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties for the DAG-CBOR codec: over arbitrary
  * data-model trees (i64s, finite doubles, unicode strings, bools,
  * null, $bytes/$link envelopes, nested arrays/maps with unsorted
  * keys), encode is total and `fromJson ∘ toJson` is a FIXPOINT after
  * one canonicalization — cbor₁ = fromJson(json), toJson(cbor₁) = j₂,
  * fromJson(j₂) == cbor₁ bit-for-bit. That pins canonical key order,
  * minimal integer heads, float64 stability (shortest-repr printing
  * reparses to the same bits), UTF-8 handling, and envelope symmetry
  * in one property instead of a vector list.
  */
class CborPropertySpec extends AnyFunSuite {

  private val genScalar: Gen[String] = Gen.oneOf(
    Gen.choose(Long.MinValue, Long.MaxValue).map(_.toString),
    Gen.choose(-1e9, 1e9).map(d => java.lang.Double.toString(d)),
    Gen.const("true"), Gen.const("false"), Gen.const("null"),
    // unicode strings incl. quotes/escapes/astral chars
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('"', '\\', '\n', '\t', '水', 'é', '‰')))
      .map(cs => jsonString(cs.mkString)),
    Gen.listOfN(8, Gen.choose(0, 255)).map(bs =>
      s"""{"$$bytes":"${java.util.Base64.getEncoder.withoutPadding
        .encodeToString(bs.map(_.toByte).toArray)}"}"""),
    Gen.listOfN(6, Gen.choose(0, 255)).map(bs =>
      s"""{"$$link":"b${CborCodec.base32Lower(bs.map(_.toByte).toArray, 0)}"}"""))

  private def jsonString(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def genTree(depth: Int): Gen[String] =
    if (depth <= 0) genScalar
    else Gen.frequency(
      3 -> genScalar,
      1 -> Gen.listOfN(3, genTree(depth - 1)).map(_.mkString("[", ",", "]")),
      1 -> (for {
        n <- Gen.choose(0, 4)
        keys <- Gen.listOfN(n, Gen.oneOf("z", "ab", "a", "k1", "longerkey", "水名"))
        vals <- Gen.listOfN(n, genTree(depth - 1))
      } yield keys.distinct.zip(vals)
        .map { case (k, v) => s"${jsonString(k)}:$v" }.mkString("{", ",", "}")))

  test("∀ data-model trees: encode total, decode(encode(x)) a one-step fixpoint") {
    val prop = Prop.forAllNoShrink(genTree(3)) { json =>
      val c1 = CborCodec.fromJson(json)
      val j2 = CborCodec.toJson(c1)
      val c2 = CborCodec.fromJson(j2)
      java.util.Arrays.equals(c1, c2) && CborCodec.toJson(c2) == j2
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }
}
