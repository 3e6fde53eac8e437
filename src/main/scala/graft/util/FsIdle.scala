package graft.util

import org.apache.hadoop.fs.{FileSystem, Path}

/** Liveness judgment for rename-committed write protocols: is a
  * directory still being written, or abandoned?
  *
  * The dir's own mtime is the WRONG signal — FileOutputCommitter
  * creates the destination at job start and task commits land under
  * `_temporary/...`, so a long rewrite's top-level mtime never moves
  * while it is very much alive; its children's mtimes do. Both
  * compaction vacuum and index GC judge idleness by the newest mtime
  * anywhere INSIDE the dir (depth-bounded to reach the committer's
  * task-attempt files), and treat a path vanishing mid-walk as "active
  * right now" (task-commit churn), reporting `now` rather than judging
  * a moving target.
  */
object FsIdle {

  /** Newest modification time at or under `p` (depth-limited; default 5
    * reaches `_temporary/<appAttempt>/_temporary/<attempt>/part-*`).
    * Returns `now` if any path vanishes mid-walk.
    */
  def newestMtime(fs: FileSystem, p: Path, now: Long, depth: Int = 5): Long =
    try {
      val own = fs.getFileStatus(p).getModificationTime
      if (depth == 0) own
      else (own +: fs.listStatus(p).map { st =>
        if (st.isDirectory) newestMtime(fs, st.getPath, now, depth - 1)
        else st.getModificationTime
      }.toSeq).max
    } catch { case _: java.io.FileNotFoundException => now }
}
