package graft.ingest

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Monotonic sequencer properties (reference pkg/monotonic/clock.go:34-56):
  * strictly increasing, gap-free within a batch, never regresses across
  * batches, and tracks wall-clock when it can (max(prev+1, now)).
  */
class SequencerSpec extends SparkSpec {
  import spark.implicits._

  test("stamp assigns strictly increasing gap-free time_us in order-col order") {
    // property-style over seeded shuffles
    for (seed <- 1 to 5) {
      val rnd = new Random(seed)
      val rows = rnd.shuffle((1L to 500L).toList).map(i => (i, s"did$i"))
      val df = rows.toDF("arrival", "did").repartition(4)
      val seq = Sequencer.stamp(df, Seq("arrival"), prevMaxUs = 1000L, nowUs = () => 5000L)
      val stamped = seq.df.orderBy("arrival").select("time_us").as[Long].collect()
      assert(stamped.head == 5000L) // base = max(1000+1, 5000)
      assert(stamped.toSeq == (5000L until 5000L + 500L)) // gap-free, ordered by arrival
      assert(seq.maxTimeUs == 5499L)
    }
  }

  test("clock regression: base falls back to prevMax+1 (clock.go:45-53)") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("arrival", "did")
    val seq = Sequencer.stamp(df, Seq("arrival"), prevMaxUs = 9999L, nowUs = () => 100L)
    val stamped = seq.df.orderBy("arrival").select("time_us").as[Long].collect()
    assert(stamped.toSeq == Seq(10000L, 10001L))
    assert(seq.maxTimeUs == 10001L)
  }

  test("monotonic across consecutive batches") {
    var hwm = 0L
    val all = scala.collection.mutable.ArrayBuffer[Long]()
    for (b <- 0 until 4) {
      val df = (1 to 100).map(i => (i.toLong, b)).toDF("arrival", "batch")
      val seq = Sequencer.stamp(df, Seq("arrival"), hwm, nowUs = () => 42L) // stuck clock
      all ++= seq.df.select("time_us").as[Long].collect().sorted
      hwm = seq.maxTimeUs
    }
    assert(all.toSeq == all.toSeq.sorted && all.toSet.size == all.size)
  }

  test("stampScalable assigns the identical sequence with no single-task stage") {
    for (seed <- 1 to 3) {
      val rnd = new Random(seed * 31)
      val rows = rnd.shuffle((1L to 2000L).toList).map(i => (i, s"did${i % 13}"))
      val df = rows.toDF("arrival", "did").repartition(8)
      val viaWindow = Sequencer.stamp(df, Seq("arrival"), 100L, () => 777L)
      val viaRange = Sequencer.stampScalable(df, Seq("arrival"), 100L, () => 777L, partitions = 6)
      val a = viaWindow.df.select("arrival", "time_us").as[(Long, Long)].collect().toMap
      val b = viaRange.df.select("arrival", "time_us").as[(Long, Long)].collect().toMap
      assert(a == b, s"seed=$seed")
      assert(viaRange.maxTimeUs == viaWindow.maxTimeUs)
    }
  }

  test("empty batch leaves hwm unchanged") {
    val df = Seq.empty[(Long, String)].toDF("arrival", "did")
    val seq = Sequencer.stamp(df, Seq("arrival"), prevMaxUs = 7L)
    assert(seq.maxTimeUs == 7L)
  }
}
