package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the shared parquet fixture tables (TESTDATA.md).
  *
  * All queries take the scale-factor directory as a parameter so the same
  * code runs at sf0.001 (smoke), sf0.01 (oracle) and sf0.1 (bench) — and,
  * by extension, against any parquet layout of the same schema at cluster
  * scale. Loading goes through `spark.read.parquet` so Catalyst sees a
  * relation it can push filters / prune columns into.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // The `events` fixture has stored ts two ways across driver fixture
    // generations: parquet TIMESTAMP(NANOS) (readable only via this legacy
    // conf, as LongType nanoseconds) and TIMESTAMP(MICROS) without UTC
    // adjustment (read as TIMESTAMP_NTZ). The engine's internal contract is
    // LongType *nanoseconds* — the firehose wire domain — so normalize at
    // the boundary: sessions run in UTC, making the NTZ→epoch conversion
    // exact and identical to DuckDB's epoch_us(ts) on the same file.
    // Queries derive `time_us = ts div 1000` (µs domain, lossless here).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(TimestampNTZType) | Some(TimestampType) =>
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case _ => df
    }
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
