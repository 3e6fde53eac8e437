package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** S12 — TTL retention trim (reference: pkg/consumer/persist.go:120-137,
  * a range-delete of every key older than `now - EventTTL`; default TTL
  * 24 h, cmd/jetstream/main.go:73-78).
  *
  * On the hour-partitioned events table this is a **partition drop**: any
  * `event_hour` partition strictly older than the cutoff hour is removed
  * as a directory delete — O(#partitions) metadata work, zero data
  * rewrite, the exact analog of pebble's `DeleteRange` being O(1) in
  * tombstones rather than O(n) in keys. Events inside the boundary hour
  * are retained until the whole hour ages out (the reference trims at key
  * granularity; hour-granularity trim is the deliberate large-scale
  * trade: a retention boundary fuzzy by <1 h buys rewrite-free deletes).
  */
object Retention {

  /** Drop all partitions wholly older than `nowUs - ttlUs`.
    * Returns the number of partitions dropped.
    */
  def trim(spark: SparkSession, path: String, ttlUs: Long,
      nowUs: () => Long = () => System.currentTimeMillis() * 1000L): Int = {
    val cutoffHour = (nowUs() - ttlUs) / 3600000000L
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return 0
    val dropped = fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .flatMap { st =>
        val name = st.getPath.getName
        // live hour partitions AND their compaction generations
        // (Compaction `_gen_<hour>_<g>` dirs) age out together
        val hour =
          if (name.startsWith(s"${EventsTable.PartitionCol}="))
            Some(name.stripPrefix(s"${EventsTable.PartitionCol}=").toLong)
          else if (name.startsWith("_gen_"))
            scala.util.Try(name.stripPrefix("_gen_").split("_")(0).toLong).toOption
          else None
        hour.collect { case h if h < cutoffHour => st.getPath }
      }
    dropped.foreach(p => fs.delete(p, true))
    dropped.size
  }
}
