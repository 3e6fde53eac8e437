package graft

/** The one-call deployment path: Graft.install puts the optimizer rule
  * and the SQL function registry on a live session, idempotently.
  */
class GraftInstallSpec extends SparkSpec {

  test("install registers functions and the hour-bounds rule, idempotently") {
    val saved = spark.experimental.extraOptimizations
    try {
      Graft.install(spark)
      Graft.install(spark) // second call must not duplicate the rule
      assert(spark.experimental.extraOptimizations
        .count(_ == graft.plans.HourBounds) == 1)
      val r = spark.sql(
        "SELECT vec_norm(array(cast(3.0 AS float), cast(4.0 AS float))) AS n," +
          " nsid_valid('app.bsky.feed.post') AS v")
        .head()
      assert(r.getDouble(0) == 5.0 && r.getBoolean(1))
    } finally {
      // the session is shared across specs; HourPruningSpec asserts the
      // BEFORE-install plan shape, so leave the session as found
      spark.experimental.extraOptimizations = saved
    }
  }
}
