package graft.util

import org.apache.hadoop.fs.Path

import graft.SparkSpec

/** The exclusive-create mutex both the index store and compaction
  * claims stand on: acquisition is exclusive, and release is
  * OWNER-ONLY — a holder whose lock was broken and re-acquired by
  * someone else cannot free the new holder's lock.
  */
class FsMutexSpec extends SparkSpec {

  private def fs(path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("acquire is exclusive; release only by the owner") {
    val dir = tmpDir("fsmutex")
    val lock = new Path(s"$dir/x.lock")
    val f = fs(dir)

    assert(FsMutex.tryAcquire(f, lock, "A"))
    assert(!FsMutex.tryAcquire(f, lock, "B"), "second acquire must lose")

    // B (who broke A's lock out-of-band and re-acquired) owns it now;
    // A's release must refuse to delete B's lock
    f.delete(lock, false) // the out-of-band break
    assert(FsMutex.tryAcquire(f, lock, "B"))
    assert(!FsMutex.releaseIfOwner(f, lock, "A"), "non-owner release must refuse")
    assert(f.exists(lock), "B's lock survives A's release attempt")
    assert(FsMutex.releaseIfOwner(f, lock, "B"))
    assert(!f.exists(lock))

    // releasing a lock that no longer exists is a safe no-op
    assert(!FsMutex.releaseIfOwner(f, lock, "B"))
  }
}
