package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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
    // The `events` fixture stores ts as parquet TIMESTAMP(NANOS), which
    // Spark only reads via this legacy conf — as LongType nanoseconds.
    // Queries derive `time_us = ts div 1000` (µs domain, lossless here).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
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
