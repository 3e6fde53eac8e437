package graft.store

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed table layout — pay a recurring join's shuffle ONCE at
  * write time. Two tables bucketed (and sorted) on the same key with
  * the same bucket count join with NO Exchange on either side: Spark
  * plans a SortMergeJoin whose children are bare bucketed scans. For a
  * 100 TB fact table joined every run against the same dimension key,
  * this converts the dominant shuffle into a write-time one-off.
  *
  * (Spark's bucketing rides the session catalog — `saveAsTable`, not a
  * bare path — because bucket metadata lives in the table definition.)
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted catalog table on `key`. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — shuffle-free
    * when bucket counts match (verify: the executed plan has no
    * ShuffleExchange below the join).
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
