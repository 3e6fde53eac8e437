package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, timestamp_micros, unix_micros}
import org.apache.spark.sql.types.{DataType, TimestampNTZType, TimestampType}

/** Loaders for the shared parquet fixture tables (TESTDATA.md).
  *
  * All queries take the scale-factor directory as a parameter so the same
  * code runs at sf0.001 (smoke), sf0.01 (oracle) and sf0.1 (bench) — and,
  * by extension, against any parquet layout of the same schema at cluster
  * scale. Loading goes through `spark.read.parquet` so Catalyst sees a
  * relation it can push filters / prune columns into.
  */
object Tables {

  /** The `events` fixture has stored ts two ways across driver fixture
    * generations: parquet TIMESTAMP(NANOS) (readable only via the legacy
    * conf, as LongType nanoseconds) and TIMESTAMP(MICROS) without UTC
    * adjustment (read as TIMESTAMP_NTZ). The engine's internal contract is
    * LongType *nanoseconds* — the firehose wire domain — so we normalize at
    * the boundary. Sessions must run in UTC for the NTZ→epoch conversion to
    * be exact and identical to DuckDB's epoch_us(ts) on the same file, so
    * load() pins the conf itself rather than trusting every entrypoint.
    */
  /** Inferred schema per fixture path, memoized for the life of the JVM
    * (guide §1.2 — job count): `spark.read.parquet` without a schema
    * runs a footer-inference Spark job at EVERY read, so each of the
    * 146 bench queries paid 1-2 ~40-80 ms driver jobs just to re-learn
    * the schema of an immutable fixture file. The memo holds exactly
    * what inference returned on the first read (same session confs), so
    * `read.schema(...)` is byte-identical to the inferred path with
    * zero jobs. Fixture paths are immutable for a JVM's lifetime —
    * this caches METADATA of the input, never results.
    */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  private def loadRaw(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val path = s"$dir/$name.parquet"
    val cached = schemaCache.get(path)
    if (cached != null) spark.read.schema(cached).parquet(path)
    else {
      val df = spark.read.parquet(path)
      schemaCache.putIfAbsent(path, df.schema)
      df
    }
  }

  private def tsType(df: DataFrame): Option[DataType] =
    df.schema.find(_.name == "ts").map(_.dataType)

  /** Rewrite a timestamp-typed ts into the Long-ns engine domain. Queries
    * derive `time_us = ts div 1000` (µs domain, lossless here). Range
    * predicates must NOT be written against this derived column — parquet
    * would receive only IsNotNull — use [[eventsRange]] instead, which
    * filters in the storage domain below this projection.
    */
  private def normalizeTs(df: DataFrame): DataFrame = tsType(df) match {
    case Some(TimestampNTZType) | Some(TimestampType) =>
      df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * 1000L)
    case _ => df
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    normalizeTs(loadRaw(spark, dir, name))

  /** `events` restricted to the µs-domain range [fromUs, untilUs), with the
    * predicates applied in the STORAGE domain — compared against a literal
    * of the raw column's own type, below the ns normalization — so parquet
    * receives a real range filter (`GreaterThanOrEqual(ts, …)`) and prunes
    * row groups / partitions, whichever fixture generation is on disk.
    * This is the batch analog of the reference's cursor seek
    * (pkg/consumer/persist.go:152-155, LSM LowerBound): a scan that starts
    * at the cursor instead of reading the whole log and filtering after.
    * The returned frame has ts already normalized to Long ns, like load().
    */
  def eventsRange(spark: SparkSession, dir: String,
                  fromUs: Option[Long] = None,
                  untilUs: Option[Long] = None): DataFrame = {
    val raw = loadRaw(spark, dir, "events")
    // Literal built in the column's exact storage type: the comparison then
    // needs no cast on the column side (casts on the literal fold away),
    // which is what keeps it translatable to a parquet filter.
    val storageLit: Long => Column = tsType(raw) match {
      case Some(t @ (TimestampNTZType | TimestampType)) =>
        us => timestamp_micros(lit(us)).cast(t) // exact: session is UTC
      case _ =>
        us => lit(us * 1000L) // legacy generation: LongType nanoseconds
    }
    val conds = fromUs.map(us => col("ts") >= storageLit(us)) ++
      untilUs.map(us => col("ts") < storageLit(us))
    normalizeTs(conds.foldLeft(raw)(_.filter(_)))
  }

  def events(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "events")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
