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
    *
    * Commit protocol (crash-recoverable at every step — [[repair]] is
    * the inverse): the rewrite lands in `_compact_tmp_<hour>` with its
    * `_SUCCESS` marker (the manifest: a tmp WITHOUT it is an aborted
    * write and never installed), then dir→backup, tmp→dir, drop
    * backup. A crash between the two renames leaves the hour absent
    * but BOTH copies on disk; repair rolls forward (tmp complete) or
    * back (tmp incomplete) — so no reader-visible data loss survives a
    * restart. The remaining caveat is honest: between the two renames a
    * CONCURRENT reader sees the hour missing, so compaction must not
    * run concurrently with serving reads of that hour (run it from the
    * maintenance path, not the serving path) — on HDFS each rename is
    * atomic; on an S3-class store "rename" is copy+delete and the same
    * repair contract covers the longer window. A table format (Delta/
    * Iceberg) slots in here to make the swap a metadata commit; layout,
    * sorting and sizing stay identical.
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
    // the job-committer's _SUCCESS is the manifest: repair only ever
    // installs a tmp that carries it
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

  /** Recover from a compaction crash: for every `_compact_old_<hour>` /
    * `_compact_tmp_<hour>` leftover, restore the invariant "the hour
    * partition exists exactly once". Roll FORWARD when the tmp rewrite
    * completed (its `_SUCCESS` manifest exists — the data is the same
    * rows, compacted), roll BACK to the backup otherwise, and drop
    * whichever leftover remains. Idempotent; run it at table-open /
    * maintenance startup (compactClosed runs it automatically).
    * Returns the hours it repaired.
    */
  def repair(spark: SparkSession, tablePath: String): Seq[Long] = {
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    val names = fs.listStatus(root).toSeq.filter(_.isDirectory).map(_.getPath.getName)
    val leftovers = names.collect {
      case n if n.startsWith("_compact_old_") => n.stripPrefix("_compact_old_").toLong
      case n if n.startsWith("_compact_tmp_") => n.stripPrefix("_compact_tmp_").toLong
    }.distinct.sorted
    leftovers.flatMap { hour =>
      val dir = new Path(s"$tablePath/${EventsTable.PartitionCol}=$hour")
      val tmp = new Path(s"$tablePath/_compact_tmp_$hour")
      val backup = new Path(s"$tablePath/_compact_old_$hour")
      val tmpComplete = fs.exists(new Path(tmp, "_SUCCESS"))
      if (!fs.exists(dir)) {
        if (tmpComplete) { // crash between the renames: install the rewrite
          if (!fs.rename(tmp, dir))
            throw new java.io.IOException(s"repair: could not install $tmp")
          fs.delete(backup, true)
        } else { // rewrite incomplete: the backup is the only good copy
          if (fs.exists(backup) && !fs.rename(backup, dir))
            throw new java.io.IOException(s"repair: could not restore $backup")
          fs.delete(tmp, true)
        }
        Some(hour)
      } else { // hour intact: drop leftovers (post-install crash, or an
               // aborted rewrite that never touched the live dir)
        fs.delete(backup, true)
        fs.delete(tmp, true)
        None
      }
    }
  }

  /** Compact every hour strictly below `hwmHour` (the open hour and
    * anything after it are left to the writer). Runs [[repair]] first —
    * a crashed previous run must not leave an hour invisible.
    */
  def compactClosed(spark: SparkSession, tablePath: String, hwmHour: Long,
      targetBytes: Long = 1L << 30): Map[Long, (Int, Int)] = {
    repair(spark, tablePath)
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
