package graft.query

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Scalar-function surface (SURVEY §2.2 rows "Scalar funcs:
  * string/date/json/array") — each family exercised in an oracle-gated
  * query, plus the sketch aggregates (HLL) that ship without an oracle
  * (approximate results are engine-specific; the driver records the
  * rows-only check, and the exact twins in RelationalQueries gate
  * correctness).
  */
object ScalarQueries {

  /** Date/time functions: truncation, field extraction, interval
    * arithmetic (reference time handling: RFC3339 parse at
    * consumer.go:115,138,184; µs epoch math §S27; TTL cutoff
    * persist.go:126).
    */
  def dateFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(
        date_trunc("month", col("o_orderdate")).as("order_month"),
        year(col("o_orderdate")).cast("long").as("order_year"))
      .agg(
        count(lit(1)).as("n_orders"),
        min(col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("min_due"))

  /** String functions over part names/types. */
  def stringFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(
        col("p_partkey"),
        upper(substring(col("p_name"), 1, 5)).as("head"),
        length(col("p_name")).cast("long").as("name_len"),
        concat(col("p_brand"), lit("/"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_name"), "a", "@").as("masked"))

  /** Array functions over tokenized documents. */
  def arrayFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(
        col("doc_id"),
        array_contains(col("w"), "spark").as("has_spark"),
        array_join(slice(col("w"), 1, 3), " ").as("first3"),
        element_at(sort_array(col("w")), 1).as("first_sorted"),
        size(array_distinct(col("w"))).cast("long").as("n_distinct"))

  /** Explicit GROUPING SETS through the SQL entry point — each margin
    * separately (no cross product), exercising `spark.sql` as a
    * first-class surface of the engine.
    */
  def groupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem_gs")
    spark.sql(
      """SELECT l_returnflag, l_linestatus, count(*) AS n_items
        |FROM lineitem_gs
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""".stripMargin)
  }

  /** CUBE grouping sets (both dims + each margin + grand total). */
  def cubePricing(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_items"))

  /** Statistical aggregates: sample stddev/variance and Pearson
    * correlation (value vs a time-derived regressor) per group.
    */
  def statsAgg(spark: SparkSession, dir: String): DataFrame = {
    import graft.util.Portable.pround
    Tables.events(spark, dir)
      .select(col("event_type"), col("value"),
        (expr("ts div 1000") % 1000000L).cast("double").as("t"))
      .groupBy(col("event_type"))
      .agg(
        pround(stddev_samp(col("value")), 4).as("sd_value"),
        pround(var_samp(col("value")), 4).as("var_value"),
        pround(corr(col("value"), col("t")), 6).as("corr_vt"))
  }

  /** Regex scalar family over the raw JSON payload: group-capturing
    * extract, extract-all cardinality, and a pattern predicate — the
    * regex-on-payload triad of log pipelines. All three are codegen'd
    * Spark built-ins over one scan; the cast keeps INT/BIGINT parity
    * with the oracle.
    */
  def regexpFuncs(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.events(spark, dir)
      .select(
        col("event_id"),
        regexp_extract(col("props"), "\"k\": ([0-9]+)", 1).as("k_str"),
        size(expr("regexp_extract_all(props, '[0-9]+', 0)")).cast("long")
          .as("n_digit_runs"),
        col("props").rlike("\"k\": [0-9]{2}").as("two_digit_k"))

  /** HLL sketch, ORACLE-BOUNDED: the sketch's register contents are
    * engine-specific (DuckDB cannot reproduce Spark's estimate), so the
    * gate is an in-query error-bound check instead of a value compare:
    * the query computes BOTH the HLL estimate and the exact distinct
    * count per group and emits `within_bound` — true iff the estimate
    * is within 5 standard errors (rsd 0.05 default ⇒ 25 % relative,
    * plus an absolute floor of 16 for tiny groups where HLL is exact by
    * its sparse representation). The oracle asserts `TRUE`, so a broken
    * sketch (estimate drifts past 5σ) hash-mismatches and fails the
    * gate — a real oracle, not a rows-only check. The exact twin rides
    * along only for the gate; at 100 TB callers use the sketch alone
    * (constant memory per group vs the full distinct shuffle).
    */
  def hllDistinctUsers(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id")).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"))
      .select(
        col("event_type"), col("exact_users"),
        (abs(col("approx_users") - col("exact_users")).cast("double") <=
          greatest(lit(16.0), col("exact_users") * lit(0.25))).as("within_bound"))

  /** DAG-CBOR codec end-to-end (reference record codec,
    * pkg/consumer/consumer.go:234 `data.UnmarshalCBOR` → `json.Marshal`):
    * each document row is serialized to JSON, encoded to canonical
    * DAG-CBOR ([[graft.functions.JsonToCbor]]), decoded back
    * ([[graft.functions.CborToJson]]), and the fields are extracted
    * from the round-tripped JSON — so the oracle's direct projection
    * hash-mismatches on any codec defect (wrong int width, bad UTF-8,
    * broken escaping, key-order instability). Both directions are
    * native codegen expressions; the whole query is one narrow
    * projection, no shuffle.
    */
  def cborRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.GraftFunctions.{cbor_to_json, json_to_cbor}
    val j = to_json(struct(col("doc_id"), col("lang"), col("n_chars"), col("text")))
    // both projections FENCED (graft.plans.Fence): without it,
    // CollapseProject would inline the encode→decode chain (and then
    // the from_json) into every extracted column — the codec would run
    // per-FIELD, not per-row. Struct field extraction above the fence
    // is free.
    val rt = graft.plans.Fence.wrap(
      Tables.documents(spark, dir)
        .select(col("doc_id"), cbor_to_json(json_to_cbor(j)).as("rt")))
    val parsed = graft.plans.Fence.wrap(
      rt.select(col("doc_id"), from_json(col("rt"),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("lang", org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("n_chars", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType))))
        .as("d")))
    parsed.select(col("doc_id"), col("d.lang").as("lang"),
      col("d.n_chars").as("n_chars"), md5(col("d.text")).as("text_md5"))
  }

  /** Approximate percentiles (KLL-style sketch), ORACLE-BOUNDED by rank
    * error: `approx_percentile` guarantees the returned value's rank is
    * within ε·n of the target (ε = 1/accuracy = 1e-4 at the default
    * 10 000). The query joins the per-group sketch output back to the
    * values and verifies the guarantee directly — for each quantile q,
    * count(value ≤ p_q) ≥ q·n − slack and count(value < p_q) ≤ q·n +
    * slack, with slack = max(1, 0.005·n) (50× the nominal ε, so VM-
    * independent). The oracle asserts the three booleans TRUE; a broken
    * sketch (wrong merge, rank drift) flips one and hash-mismatches.
    * The sketch side is one partial-aggregated pass; the rank audit is
    * a broadcast join of a |event_type|-row table — gate-only cost.
    */
  def approxQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("event_type"), col("value"))
    val sk = ev.groupBy(col("event_type"))
      .agg(expr("approx_percentile(value, array(0.5, 0.95, 0.99))").as("p"))
      .select(col("event_type").as("et"),
        col("p").getItem(0).as("p50"),
        col("p").getItem(1).as("p95"),
        col("p").getItem(2).as("p99"))
    def rankOk(p: Column, q: Double): Column = {
      val n = count(lit(1)).cast("double")
      val slack = greatest(lit(1.0), n * lit(0.005))
      (sum(when(col("value") <= p, 1L).otherwise(0L)).cast("double") >= n * q - slack) &&
        (sum(when(col("value") < p, 1L).otherwise(0L)).cast("double") <= n * q + slack)
    }
    ev.join(broadcast(sk), col("event_type") === col("et"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        rankOk(col("p50"), 0.50).as("p50_ok"),
        rankOk(col("p95"), 0.95).as("p95_ok"),
        rankOk(col("p99"), 0.99).as("p99_ok"))
  }
}
