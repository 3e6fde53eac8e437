package graft.util

import org.apache.spark.sql.{Column, DataFrame}

/** Scan-width helpers (guide §2.5 "input skew: one huge unsplittable
  * file"). The bench fixtures are single-row-group parquet files, so a
  * scan can never split past ONE task no matter the split-size settings
  * — and every expensive row-local stage fused above such a scan
  * (shingle explode + md5, JSON synth/parse, chunk explode) runs
  * serially on a 32-core executor.
  */
object Scans {

  /** Hash-repartition `df` to executor width ahead of an expensive
    * row-local stage — with TWO scale guards:
    *
    *   - the width is EXPLICIT (`defaultParallelism`), because a
    *     keyless-count `repartition(col)` is an AQE rebalance target
    *     and gets coalesced right back to ~one partition at small
    *     volumes (measured: the spread was a no-op under AQE);
    *   - it is SKIPPED when the input is already at least that wide —
    *     at corpus scale a scan is thousands of partitions and the
    *     helper degenerates to the identity, so no production plan
    *     pays an extra exchange (the [[graft.ext.Similarity]]
    *     spreadForScore contract).
    *
    * Use ONLY ahead of stages with a SINGLE consumer: a spread stacked
    * under a multi-consumer subtree defeats AQE's exchange-stage reuse
    * and re-executes the stage per consumer (measured on the shingle
    * pipeline: dedup_verified 2.7 s → 8.3 s).
    */
  def spread(df: DataFrame, key: Column): DataFrame = {
    val width = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= width) df
    else df.repartition(width, key)
  }
}
