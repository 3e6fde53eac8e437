package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed table layout — pay a recurring join's shuffle ONCE at
  * write time. Two tables bucketed (and sorted) on the same key with
  * the same bucket count join with NO Exchange on either side: Spark
  * plans a SortMergeJoin whose children are bare bucketed scans. For a
  * 100 TB fact table joined every run against the same dimension key,
  * this converts the dominant shuffle into a write-time one-off — the
  * Spark expression of the reference's LSM key co-location
  * (pkg/consumer/persist.go:101-108: records adjacent by key prefix, so
  * a keyed read never re-sorts).
  *
  * (Spark's bucketing rides the session catalog — `saveAsTable`, not a
  * bare path — because bucket metadata lives in the table definition.)
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted catalog table on `key`.
    * Re-registration is idempotent across JVMs: the catalog entry is
    * dropped AND the managed location cleared first, because a fresh
    * session's in-memory catalog does not know about a previous run's
    * warehouse directory and `saveAsTable` refuses to create over it.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val wh = new Path(
      new Path(spark.conf.get("spark.sql.warehouse.dir")), table.toLowerCase)
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(wh, true)
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket key — shuffle-free
    * when bucket counts match (verify: the executed plan has no
    * ShuffleExchange below the join).
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
