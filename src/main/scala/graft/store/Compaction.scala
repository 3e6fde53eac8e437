package graft.store

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction for the events log. Streaming ingest appends
  * one parquet file per micro-batch per hour (EventsTable.append), so a
  * day of 1 s triggers leaves ~86k tiny files per hour-partition — at
  * 100 TB that is scan-planning death (file listing + footer reads
  * dominate). Compaction rewrites a CLOSED hour into
  * ceil(bytes/target) time-sorted files.
  *
  * Commit protocol — GENERATIONS, never an in-place swap (the analog of
  * the reference's atomic LSM swap, pkg/consumer/persist.go:90-117,
  * where old data is never mutated): the rewrite of hour H lands in
  * `_gen_H_<g>` (g monotonically increasing; the uncompacted ingest dir
  * is generation 0) and is COMMITTED solely by its `_SUCCESS` marker —
  * the live hour dir is never renamed, moved, or touched. Readers
  * ([[EventsTable.read]]) resolve every hour to its highest committed
  * generation, falling back to the live dir, so at every instant —
  * mid-rewrite, post-commit, post-crash — a complete copy of the hour
  * is visible. There is no repair step because there is no state to
  * repair: an uncommitted generation is invisible and gets vacuumed.
  *
  * Superseded copies (the live dir and older generations) are removed
  * by [[vacuum]] only after the superseding commit is older than a
  * grace period — the standard snapshot-retention contract (a reader
  * plans its file listing once; grace must exceed the longest query,
  * exactly like a table format's VACUUM retention). Until vacuumed,
  * every generation is a complete, independently consistent copy.
  *
  * Only hours strictly below the ingest high-water mark are compacted
  * ([[compactClosed]]), so compaction never races the writer, and a
  * closed hour receives no late appends (the sequencer's monotonic
  * time_us is what closes it).
  *
  * Sorting within the rewritten files restores tight parquet row-group
  * min/max on `time_us` (the property EventsTable relies on for
  * row-group skipping), which interleaved micro-batch appends erode.
  * Generation files carry `event_hour` as a DATA column (constant per
  * file, dictionary-encoded ≈ free) so one multi-path read serves all
  * compacted hours and hour predicates skip whole files via footer
  * stats — the moral equivalent of the live side's partition pruning.
  */
object Compaction {

  /** Generation dir name: `_gen_<hour>_<g>`. The `_` prefix keeps the
    * dirs invisible to plain `spark.read.parquet(table)` listings.
    */
  def genDirName(hour: Long, gen: Int): String = s"_gen_${hour}_$gen"

  private def parseGen(name: String): Option[(Long, Int)] =
    if (!name.startsWith("_gen_")) None
    else name.stripPrefix("_gen_").split("_") match {
      case Array(h, g) => scala.util.Try((h.toLong, g.toInt)).toOption
      case _ => None
    }

  private def fsOf(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def rootEntries(spark: SparkSession, tablePath: String): Seq[FileStatus] = {
    val root = new Path(tablePath)
    val fs = fsOf(spark, tablePath)
    if (fs.exists(root)) fs.listStatus(root).toSeq.filter(_.isDirectory) else Seq.empty
  }

  /** All generation dirs: (hour, gen) → (path, committed). */
  private def genDirs(spark: SparkSession, tablePath: String)
      : Map[(Long, Int), (Path, Boolean)] = {
    val fs = fsOf(spark, tablePath)
    rootEntries(spark, tablePath).flatMap { st =>
      parseGen(st.getPath.getName).map { hg =>
        hg -> (st.getPath, fs.exists(new Path(st.getPath, "_SUCCESS")))
      }
    }.toMap
  }

  /** Highest COMMITTED generation per hour: hour → (gen, path). The
    * resolution [[EventsTable.read]] serves from; empty for a table
    * that has never been compacted (the plain-parquet fast path).
    */
  def committedGens(spark: SparkSession, tablePath: String): Map[Long, (Int, Path)] =
    genDirs(spark, tablePath)
      .collect { case ((h, g), (p, true)) => (h, g, p) }
      .groupBy(_._1)
      .map { case (h, gens) => val (_, g, p) = gens.maxBy(_._2); h -> (g, p) }

  /** Live (uncompacted ingest) hour dirs: hour → path. */
  def liveHourDirs(spark: SparkSession, tablePath: String): Map[Long, Path] =
    rootEntries(spark, tablePath).flatMap { st =>
      val name = st.getPath.getName
      if (name.startsWith(s"${EventsTable.PartitionCol}="))
        scala.util.Try(name.stripPrefix(s"${EventsTable.PartitionCol}=").toLong)
          .toOption.map(_ -> st.getPath)
      else None
    }.toMap

  /** The dir currently serving `hour` and its generation (0 = live). */
  def currentCopy(spark: SparkSession, tablePath: String, hour: Long)
      : Option[(Path, Int)] =
    committedGens(spark, tablePath).get(hour).map { case (g, p) => (p, g) }
      .orElse(liveHourDirs(spark, tablePath).get(hour).map(_ -> 0))

  /** Files currently making up one hour (its resolved current copy).
    * On a MANIFEST table ([[EventsTable.appendManifested]]) a LIVE
    * hour's files come from the committed manifest prefix, never the
    * dir listing — a listing would count (and [[compactHour]] would
    * RESURRECT into a generation) crash orphans no manifest names.
    * Generations are their own commit scope and list as before.
    */
  def partitionFiles(spark: SparkSession, tablePath: String, hour: Long): Seq[(String, Long)] =
    currentCopy(spark, tablePath, hour) match {
      case None => Seq.empty
      case Some((dir, gen)) =>
        val fs = fsOf(spark, tablePath)
        val listed =
          try fs.listStatus(dir).toSeq.filter(_.isFile)
          catch { case _: java.io.FileNotFoundException => Seq.empty }
        manifestLiveFiles(spark, tablePath, hour, gen) match {
          case Some(files) =>
            // one listing, intersected by NAME (ADVICE r14: the per-file
            // getFileStatus was N+1 RPCs on an object store and threw on
            // any manually-removed manifest entry where the listing path
            // degraded gracefully) — a named-but-missing entry is skipped
            // with a warning, matching the listing path's posture
            val byName = listed.map(f => f.getPath.getName -> f.getLen).toMap
            files.flatMap { f =>
              val name = f.substring(f.lastIndexOf('/') + 1)
              byName.get(name) match {
                case Some(len) => Some((f, len))
                case None =>
                  org.slf4j.LoggerFactory.getLogger(getClass).warn(
                    s"manifest names $f but the hour dir no longer holds it; skipping")
                  None
              }
            }
          case None =>
            listed.filter(f => !f.getPath.getName.startsWith("_"))
              .map(f => (f.getPath.toString, f.getLen))
        }
    }

  /** The manifest-visible file set for a LIVE hour of a manifest-mode
    * table; None for plain tables or generation-served hours.
    */
  private def manifestLiveFiles(spark: SparkSession, tablePath: String,
      hour: Long, gen: Int): Option[Seq[String]] =
    if (gen != 0) None
    else EventsTable.manifestFiles(spark, tablePath).map(
      _.filter(_.startsWith(s"${EventsTable.PartitionCol}=$hour/"))
        .map(rel => s"$tablePath/$rel"))

  /** Compact one closed hour to ~`targetBytes` files as a NEW committed
    * generation. Returns (filesBefore, filesAfter); no-op when already
    * compact unless `force` (re-layout to a new target size). The
    * superseded copy stays on disk, still serving in-flight readers,
    * until [[vacuum]] ages it out.
    */
  def compactHour(spark: SparkSession, tablePath: String, hour: Long,
      targetBytes: Long = 1L << 30, force: Boolean = false): (Int, Int) = {
    val files = partitionFiles(spark, tablePath, hour)
    if (files.isEmpty) return (0, 0)
    val totalBytes = files.map(_._2).sum
    val want = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    if (!force && files.size <= want) return (files.size, files.size)

    val Some((srcDir, srcGen)) = currentCopy(spark, tablePath, hour)
    val fs = fsOf(spark, tablePath)
    // claim the generation number by exclusive file create before any
    // write: two concurrent compactions of the same hour (overlapping
    // maintenance runs) get DISTINCT generations instead of clobbering
    // one dir with SaveMode.Overwrite while readers resolve it. A
    // crashed claimant's number stays burned (vacuum sweeps the claim
    // and any partial dir); later attempts just take the next number.
    var nextGen = (genDirs(spark, tablePath).keys.collect { case (h, g) if h == hour => g }
      ++ Seq(srcGen)).max + 1
    while (!tryClaim(fs, new Path(s"$tablePath/${claimName(hour, nextGen)}")))
      nextGen += 1
    val dest = new Path(s"$tablePath/${genDirName(hour, nextGen)}")
    // manifest-mode live hour: compact the VISIBLE file set by name
    // (see partitionFiles) — never the dir listing
    val src = manifestLiveFiles(spark, tablePath, hour, srcGen) match {
      case Some(visible) => spark.read.parquet(visible: _*)
      case None => spark.read.parquet(srcDir.toString)
    }
    val withHour = // live files don't carry the partition column; gens do
      if (src.columns.contains(EventsTable.PartitionCol)) src
      else src.withColumn(EventsTable.PartitionCol, lit(hour))
    try {
      withHour
        .repartitionByRange(want, col("time_us")) // contiguous time slices per file
        .sortWithinPartitions(col("time_us"))
        .write.mode(SaveMode.Overwrite).parquet(dest.toString)
      // the job committer's _SUCCESS (written last) IS the commit: readers
      // resolving this hour switch to the new generation atomically
    } finally fs.delete(new Path(s"$tablePath/${claimName(hour, nextGen)}"), false)
    (files.size, partitionFiles(spark, tablePath, hour).size)
  }

  private def claimName(hour: Long, gen: Int): String = s"_gen_claim_${hour}_$gen"

  private def tryClaim(fs: FileSystem, claim: Path): Boolean =
    graft.util.FsMutex.tryAcquire(fs, claim)

  /** Remove copies superseded by a commit older than `graceMs` (live
    * dir + older generations), and aborted builds (uncommitted gen dirs
    * idle longer than the grace). Returns the deleted dir names. The
    * grace is the reader-snapshot retention: any query that planned its
    * file listing within the last `graceMs` still reads its copy
    * untouched — size it above the longest-running query, the same
    * contract as a table format's VACUUM retention.
    */
  def vacuum(spark: SparkSession, tablePath: String,
      graceMs: Long = 15L * 60 * 1000): Seq[String] = {
    migrateLegacy(spark, tablePath)
    val fs = fsOf(spark, tablePath)
    val now = System.currentTimeMillis()
    val gens = genDirs(spark, tablePath)
    val live = liveHourDirs(spark, tablePath)
    val current = committedGens(spark, tablePath)
    val doomed = scala.collection.mutable.ListBuffer.empty[Path]
    current.foreach { case (hour, (gen, genPath)) =>
      val commitAge = now -
        fs.getFileStatus(new Path(genPath, "_SUCCESS")).getModificationTime
      if (commitAge > graceMs) {
        live.get(hour).foreach(doomed += _)
        gens.collect { case ((h, g), (p, _)) if h == hour && g < gen => p }
          .foreach(doomed += _)
      }
    }
    // aborted builds: uncommitted gens (any hour) IDLE past the grace.
    // Idleness is the newest mtime INSIDE the dir (graft.util.FsIdle
    // has the full why). The residual contract: graceMs must exceed
    // the longest gap between visible write activity, same as any
    // lease-based liveness check.
    gens.collect {
      case ((h, g), (p, false))
          if current.get(h).forall(_._1 != g)
            && now - graft.util.FsIdle.newestMtime(fs, p, now) > graceMs => p
    }.foreach(doomed += _)
    // stale generation claims (crashed claimants): tiny root files,
    // swept once idle past the grace — their numbers stay burned
    val staleClaims = {
      val root = new Path(tablePath)
      if (!fs.exists(root)) Seq.empty
      else fs.listStatus(root).toSeq.filter { st =>
        st.isFile && st.getPath.getName.startsWith("_gen_claim_") &&
          now - st.getModificationTime > graceMs
      }.map(_.getPath)
    }
    staleClaims.foreach(doomed += _)
    doomed.toSeq.map { p => fs.delete(p, true); p.getName }
  }

  /** Migrate crash leftovers of the PRE-generation protocol (the
    * rename-swap that parked the live dir in `_compact_old_<h>` while
    * installing `_compact_tmp_<h>`): a table that crashed between that
    * protocol's two renames has its hour ONLY in those dirs, which the
    * generation resolution ignores — silent reader-visible loss after
    * an upgrade. Rolls a COMPLETE tmp forward as generation 1 (its
    * `_SUCCESS` is already the commit marker), restores the backup as
    * the live dir otherwise, and sweeps whatever remains. Idempotent;
    * a no-op on tables the old protocol never touched. Runs at the
    * head of every [[vacuum]] (and so every [[compactClosed]]).
    */
  def migrateLegacy(spark: SparkSession, tablePath: String): Seq[Long] = {
    val fs = fsOf(spark, tablePath)
    val names = rootEntries(spark, tablePath).map(_.getPath.getName)
    val hours = names.collect {
      case n if n.startsWith("_compact_old_") => n.stripPrefix("_compact_old_").toLong
      case n if n.startsWith("_compact_tmp_") => n.stripPrefix("_compact_tmp_").toLong
    }.distinct.sorted
    hours.flatMap { hour =>
      val tmp = new Path(s"$tablePath/_compact_tmp_$hour")
      val backup = new Path(s"$tablePath/_compact_old_$hour")
      // Same per-(hour, gen) claim as compactHour: the roll-forward is
      // a Spark OVERWRITE write (not an atomic rename), so two
      // concurrent maintenance runs interleaving on the gen-1 dir
      // could each delete the other's in-flight files and then BOTH
      // delete the tmp — destroying the only good copy behind a
      // corrupt promoted generation. The loser skips the hour (and
      // must NOT delete tmp/backup while the winner may still be
      // reading them); a crashed winner's claim goes stale and the
      // next vacuum retries.
      val claim = new Path(s"$tablePath/${claimName(hour, 1)}")
      if (!tryClaim(fs, claim)) None
      else try {
        val served = currentCopy(spark, tablePath, hour).isDefined
        val migrated = if (!served) {
          if (fs.exists(new Path(tmp, "_SUCCESS"))) { // roll FORWARD: tmp is complete
            // Legacy tmps were written FROM the leaf hour dir, so they
            // carry no event_hour column — but the generation read branch
            // (EventsTable.read) requires it; a bare rename would make the
            // whole table unreadable (AnalysisException on the cast) or
            // silently null the hour under schema merging. Rewrite the tmp
            // into generation 1 with the constant hour added; the job
            // committer's _SUCCESS (written last) keeps the commit atomic.
            val src = spark.read.parquet(tmp.toString)
            val withHour =
              if (src.columns.contains(EventsTable.PartitionCol)) src
              else src.withColumn(EventsTable.PartitionCol, lit(hour))
            withHour.sortWithinPartitions(col("time_us"))
              .write.mode(SaveMode.Overwrite)
              .parquet(s"$tablePath/${genDirName(hour, 1)}")
            true
          } else if (fs.exists(backup)) { // roll BACK: the backup is the only good copy
            if (!fs.rename(backup, new Path(s"$tablePath/${EventsTable.PartitionCol}=$hour")))
              throw new java.io.IOException(s"legacy migration: could not restore $backup")
            true
          } else false
        } else false
        fs.delete(tmp, true)
        fs.delete(backup, true)
        if (migrated) Some(hour) else None
      } finally fs.delete(claim, false)
    }
  }

  /** Compact every hour strictly below `hwmHour` (the open hour and
    * anything after it are left to the writer), vacuuming aged-out
    * superseded copies first.
    */
  def compactClosed(spark: SparkSession, tablePath: String, hwmHour: Long,
      targetBytes: Long = 1L << 30, graceMs: Long = 15L * 60 * 1000): Map[Long, (Int, Int)] = {
    vacuum(spark, tablePath, graceMs)
    val hours = (liveHourDirs(spark, tablePath).keySet
      ++ committedGens(spark, tablePath).keySet).filter(_ < hwmHour)
    hours.toSeq.sorted
      .map(h => h -> compactHour(spark, tablePath, h, targetBytes))
      .toMap
  }
}
