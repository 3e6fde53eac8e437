package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SyntaxExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("nsid_valid/did_valid via SQL registration + codegen") {
    GraftFunctions.register(spark)
    val df = Seq(
      ("app.bsky.feed.post", "did:plc:q6gjnaw2blty4crticxkmujt"),
      ("not a nsid", "bogus"),
      ("nodots", "did:plc:ok"),
      ("app.bsky.graph.follow", "did:web:example.com")).toDF("nsid", "did")
    df.createOrReplaceTempView("syntax_in")
    val out = spark.sql(
      "SELECT nsid_valid(nsid) AS nv, did_valid(did) AS dv FROM syntax_in")
      .as[(Boolean, Boolean)].collect().toSeq
    assert(out == Seq((true, true), (false, false), (false, true), (true, true)))
  }

  test("Column API wrappers agree with interpreted eval") {
    val df = Seq("app.bsky.feed.like", "x.y", "a.b.c").toDF("s")
    val got = df.select(GraftFunctions.nsid_valid(col("s"))).as[Boolean].collect().toSeq
    assert(got == Seq(true, false, true))
    // null-safe
    val nulls = Seq[Option[String]](None).toDF("s")
      .select(GraftFunctions.did_valid(col("s"))).collect()
    assert(nulls.head.isNullAt(0))
  }

  test("expression survives whole-stage codegen in a filter pipeline") {
    GraftFunctions.register(spark)
    // spark.range (a real source) so the filter isn't constant-folded away
    val df = spark.range(1, 1001).selectExpr(
      "CASE WHEN id % 3 = 0 THEN concat('app.bsky.c', id, '.rec') ELSE concat('junk ', id) END AS s")
    val filtered = df.filter(expr("nsid_valid(s)"))
    assert(filtered.count() == 333)
    val plan = filtered.queryExecution.executedPlan.toString
    // "*(n)" marks a WholeStageCodegen stage; the filter must be inside one
    assert(plan.contains("*(1) Filter nsid_valid"))
  }
}
