package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction for the events log. Streaming ingest appends
  * one parquet file per micro-batch per hour (EventsTable.append), so a
  * day of 1 s triggers leaves ~86k tiny files per hour-partition — at
  * 100 TB that is scan-planning death (file listing + footer reads
  * dominate). Compaction rewrites a CLOSED hour into
  * ceil(bytes/target) time-sorted files.
  *
  * Safety model (mirrors the append-only contract the reference gets
  * from its LSM: pkg/consumer/persist.go — old data is never mutated):
  * only hours strictly below the ingest high-water mark are compacted,
  * so compaction never races the writer. The rewrite goes to a temp
  * dir then swaps in — on a production deployment this directory swap
  * is where a table format's atomic commit slots in; the layout,
  * sorting and sizing logic stay identical.
  *
  * Sorting within the rewritten files restores tight parquet row-group
  * min/max on `time_us` (the property EventsTable relies on for
  * row-group skipping), which interleaved micro-batch appends erode.
  */
object Compaction {

  /** Files currently making up one hour partition. */
  def partitionFiles(spark: SparkSession, tablePath: String, hour: Long): Seq[(String, Long)] = {
    val dir = new Path(s"$tablePath/${EventsTable.PartitionCol}=$hour")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
      .map(f => (f.getPath.toString, f.getLen))
  }

  /** Compact one closed hour to ~`targetBytes` files. Returns
    * (filesBefore, filesAfter); no-op when already compact.
    */
  def compactHour(spark: SparkSession, tablePath: String, hour: Long,
      targetBytes: Long = 1L << 30): (Int, Int) = {
    val files = partitionFiles(spark, tablePath, hour)
    val totalBytes = files.map(_._2).sum
    val want = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    if (files.size <= want) return (files.size, files.size)

    val dir = new Path(s"$tablePath/${EventsTable.PartitionCol}=$hour")
    val tmp = new Path(s"$tablePath/_compact_tmp_$hour")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    spark.read.parquet(dir.toString)
      .repartitionByRange(want, col("time_us")) // contiguous time slices per file
      .sortWithinPartitions(col("time_us"))
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    // swap via backup (never a window with NO copy of the hour on disk;
    // a table format makes this an atomic commit)
    val backup = new Path(s"$tablePath/_compact_old_$hour")
    fs.delete(backup, true)
    if (!fs.rename(dir, backup))
      throw new java.io.IOException(s"compaction: could not move $dir aside")
    if (!fs.rename(tmp, dir)) { // restore and give up
      fs.rename(backup, dir)
      throw new java.io.IOException(s"compaction: could not install $tmp")
    }
    fs.delete(backup, true)
    (files.size, partitionFiles(spark, tablePath, hour).size)
  }

  /** Compact every hour strictly below `hwmHour` (the open hour and
    * anything after it are left to the writer).
    */
  def compactClosed(spark: SparkSession, tablePath: String, hwmHour: Long,
      targetBytes: Long = 1L << 30): Map[Long, (Int, Int)] = {
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Map.empty
    fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.startsWith(s"${EventsTable.PartitionCol}="))
      .map(_.split("=")(1).toLong)
      .filter(_ < hwmHour)
      .map(h => h -> compactHour(spark, tablePath, h, targetBytes))
      .toMap
  }
}
