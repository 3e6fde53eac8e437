package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Monotonic sequencer — the reference's single hard invariant (SURVEY
  * §7.4.1): every persisted event gets a strictly-increasing `time_us`
  * that doubles as the global sort key and the subscriber cursor domain.
  *
  * Reference: pkg/monotonic/clock.go:34-56 (wall-clock µs, bumped +1 on
  * collision) funneled through ONE goroutine (consumer.go:76,304,311-342)
  * — i.e. the reference also serializes all parallelism at this stage.
  *
  * Spark translation: per micro-batch, order the batch deterministically,
  * stamp `time_us = base + row_number - 1` where
  * `base = max(prevMax + 1, wallClockUs)` — the same
  * max(last+1, now) rule as clock.go:45-53, applied batch-wise. The
  * unpartitioned row_number is a deliberate single-task stage, exactly
  * the bottleneck the reference accepted; everything before and after it
  * is fully parallel. `prevMax` is carried across batches by the caller
  * (checkpointed in streaming, see IngestJob).
  */
object Sequencer {

  final case class Sequenced(df: DataFrame, maxTimeUs: Long)

  /** Stamp a batch. `orderCols` defines the intra-batch total order
    * (arrival order proxy — must be deterministic and unique).
    * `nowUs` is injectable for tests.
    */
  def stamp(
      batch: DataFrame,
      orderCols: Seq[String],
      prevMaxUs: Long,
      nowUs: () => Long = () => System.currentTimeMillis() * 1000L,
      rows: Long = -1L): Sequenced = {
    val n = if (rows >= 0) rows else batch.count()
    if (n == 0) return Sequenced(batch.sparkSession.emptyDataFrame, prevMaxUs)
    val base = math.max(prevMaxUs + 1, nowUs())
    val w = Window.orderBy(orderCols.map(col): _*)
    val stamped = batch.withColumn("time_us",
      lit(base) + row_number().over(w).cast("long") - 1L)
    Sequenced(stamped, base + n - 1)
  }

  /** Distributed variant for very large batches: the unpartitioned
    * window in [[stamp]] funnels the whole batch through one task
    * (acceptable at micro-batch sizes — the reference makes the same
    * trade with its single goroutine, consumer.go:304). This version
    * assigns the SAME gap-free sequence without any single-task stage:
    * range-partition by the order columns (so partition k holds a
    * contiguous, sorted slice of the total order), sort within
    * partitions, then offset each row by its partition-local index plus
    * the cumulative size of earlier partitions. Two light jobs (range
    * sampling + zipWithIndex's count) instead of one full-data
    * single-task sort.
    */
  def stampScalable(
      batch: DataFrame,
      orderCols: Seq[String],
      prevMaxUs: Long,
      nowUs: () => Long = () => System.currentTimeMillis() * 1000L,
      partitions: Int = 0,
      rows: Long = -1L): Sequenced = {
    val spark = batch.sparkSession
    val n = if (rows >= 0) rows else batch.count()
    if (n == 0) return Sequenced(spark.emptyDataFrame, prevMaxUs)
    val base = math.max(prevMaxUs + 1, nowUs())
    val parts = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val cols = orderCols.map(col)
    val ranged = batch
      .repartitionByRange(parts, cols: _*)
      .sortWithinPartitions(cols: _*)
    val schema = org.apache.spark.sql.types.StructType(
      ranged.schema.fields :+
        org.apache.spark.sql.types.StructField("time_us", org.apache.spark.sql.types.LongType, nullable = false))
    val stamped = ranged.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (base + i))
    }
    Sequenced(spark.createDataFrame(stamped, schema), base + n - 1)
  }
}
