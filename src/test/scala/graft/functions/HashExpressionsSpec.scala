package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Md5Prefix]] must be VALUE-IDENTICAL to the hex round-trip it
  * replaced — `conv(substring(md5(c), 1, n), 16, 10).cast("long")` —
  * for every input the dedup/simhash/classifier pipelines feed it
  * (h32 = 8 nibbles, h60 = 15): the hashes are oracle contract, only
  * the hex-text intermediate was overhead.
  */
class HashExpressionsSpec extends SparkSpec {
  import spark.implicits._
  import GraftFunctions.md5_prefix

  private def convRef(c: org.apache.spark.sql.Column, n: Int) =
    conv(substring(md5(c), 1, n), 16, 10).cast("long")

  test("md5_prefix == conv(substring(md5)) for 8 and 15 nibbles") {
    // unicode incl. astral plane, empties, whitespace-significant
    // shingles, long strings, digits — the shapes the shingle/word/id
    // pipelines produce
    val fixtures = Seq(
      "", " ", "a", "the quick brown fox", "a b c", "a  b",
      "héllo wörld", "日本語 テスト", "emoji 😀 tail",
      "x" * 10000, "123456789", "doc_42", "q w e r t y u i o p") ++
      (0 until 500).map(i => s"shingle $i word ${i * 31}")
    val df = fixtures.toDF("s")
    val out = df.select(
      md5_prefix(col("s"), 8).as("p8"), convRef(col("s"), 8).as("r8"),
      md5_prefix(col("s"), 15).as("p15"), convRef(col("s"), 15).as("r15"))
      .collect()
    out.foreach { r =>
      assert(r.getLong(0) == r.getLong(1), s"h32 mismatch on $r")
      assert(r.getLong(2) == r.getLong(3), s"h60 mismatch on $r")
    }
    // range contracts the callers rely on
    assert(out.forall(r => r.getLong(0) >= 0L && r.getLong(0) < (1L << 32)))
    assert(out.forall(r => r.getLong(2) >= 0L && r.getLong(2) < (1L << 60)))
  }

  test("null propagation and interpreted/codegen agreement") {
    val df = Seq(Some("abc"), None, Some("")).toDF("s")
    val rows = df.select(md5_prefix(col("s"), 15).as("p"),
      convRef(col("s"), 15).as("r")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getLong(0) == r.getLong(1))
    }
    // interpreted path (direct eval, no codegen) matches the conv form
    val e = Md5Prefix(
      org.apache.spark.sql.catalyst.expressions.Literal.create("abc",
        org.apache.spark.sql.types.StringType), 15)
    val expect = rows.head.getLong(0)
    assert(e.eval(null) == expect)
    assert(Md5Prefix(org.apache.spark.sql.catalyst.expressions.Literal.create(
      null, org.apache.spark.sql.types.StringType), 15).eval(null) == null)
  }

  test("binary input hashes the raw bytes (string implicit-cast twin)") {
    val df = Seq(("abc", "abc".getBytes("UTF-8"))).toDF("s", "b")
    val r = df.select(md5_prefix(col("s"), 15), md5_prefix(col("b"), 15)).head()
    assert(r.getLong(0) == r.getLong(1))
  }

  test("sql registration: md5_prefix callable from SQL") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT md5_prefix('abc', 15) = CAST(conv(substring(md5('abc'), 1, 15), 16, 10) AS LONG)")
      .head()
    assert(r.getBoolean(0))
  }
}
