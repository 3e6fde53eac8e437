package graft.ext

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Build-once / probe-many lifecycle for the persisted retrieval and
  * ANN index tables ([[Similarity.buildIvf]], [[Retrieval.buildTextIndex]]).
  *
  * The reference's core storage posture is "pay the layout cost at
  * write time, serve cheap reads forever" — its LSM key
  * `{time_us}_{did}_{collection}` is built once by the persist path so
  * every replay is a pruned scan (reference pkg/consumer/persist.go:
  * 101-108, 152-155). This store applies the same posture to the
  * derived index tables: an index is a directory of parquet tables
  * keyed by (kind, source-fingerprint), built exactly once per source
  * snapshot and reused by every subsequent probe — in THIS process,
  * the next JVM, or (with a shared `GRAFT_INDEX_DIR` on a cluster
  * store) every executor fleet that follows.
  *
  * Staleness: the key fingerprints the source parquet directory's file
  * listing (names, sizes, mtimes), so a rewritten source snapshot gets
  * a fresh index and a stale one is never served. Concurrency: builds
  * are serialized per-path in-process, and committed by writing a
  * `_READY` marker into the build-temp dir THEN renaming it into place
  * — a reader either sees a complete committed index or none at all,
  * and a lost cross-process race falls back to the winner's copy.
  */
object IndexStore {

  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Index store root; override with GRAFT_INDEX_DIR (on a cluster: a
    * shared filesystem path, so the build is paid once per corpus, not
    * once per job).
    */
  def root: String = sys.env.getOrElse("GRAFT_INDEX_DIR",
    s"${System.getProperty("java.io.tmpdir")}/graft-index")

  /** md5 over the source dirs' file listings — the index cache key. */
  def fingerprint(spark: SparkSession, sources: Seq[String]): String = {
    val conf = spark.sparkContext.hadoopConfiguration
    val md = java.security.MessageDigest.getInstance("MD5")
    sources.sorted.foreach { s =>
      md.update(s.getBytes("UTF-8"))
      val p = new Path(s)
      val fs = p.getFileSystem(conf)
      if (fs.exists(p)) fs.listStatus(p).sortBy(_.getPath.getName).foreach { st =>
        md.update(s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}"
          .getBytes("UTF-8"))
      }
    }
    md.digest().map(b => f"$b%02x").mkString
  }

  /** Return the committed index path for (kind, sources), running
    * `build(tmpPath)` first if no committed index exists. `build` must
    * write all its tables UNDER the path it is given; commit (the
    * `_READY` marker + rename) happens here.
    */
  def ensure(kind: String, spark: SparkSession, sources: Seq[String])
      (build: String => Unit): String = {
    val path = s"$root/$kind-${fingerprint(spark, sources)}"
    val lock = locks.computeIfAbsent(path, _ => new Object)
    lock.synchronized {
      val p = new Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(new Path(p, "_READY"))) {
        val tmp = new Path(s"$path.build-${java.util.UUID.randomUUID().toString.take(8)}")
        build(tmp.toString)
        fs.create(new Path(tmp, "_READY"), true).close()
        fs.delete(p, true) // an uncommitted leftover never carries _READY
        if (!fs.rename(tmp, p)) {
          // lost a cross-process race: the winner's committed copy serves
          if (!fs.exists(new Path(p, "_READY")))
            throw new java.io.IOException(s"index commit failed for $path")
          fs.delete(tmp, true)
        }
      }
      path
    }
  }
}
