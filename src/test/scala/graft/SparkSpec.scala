package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Poll `cond` until true or `timeoutMs` — the one wait loop every
    * cross-process spec needs (exceptions from a probe mid-setup count
    * as not-yet).
    */
  def eventually(timeoutMs: Long)(cond: => Boolean): Unit = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    def probe = try cond catch { case _: Throwable => false }
    var ok = probe
    while (!ok && System.nanoTime() < deadline) { Thread.sleep(200); ok = probe }
    assert(ok, s"condition not met within ${timeoutMs}ms")
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    // every spec's IndexStore traffic goes to an isolated per-run root,
    // never the machine-global default (which real deployments share)
    System.setProperty("graft.index.dir",
      java.nio.file.Files.createTempDirectory("graft-index-test").toString)
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
