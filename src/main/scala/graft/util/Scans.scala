package graft.util

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Scan-width helpers (guide §2.5 "input skew: one huge unsplittable
  * file"). The bench fixtures are single-row-group parquet files, so a
  * scan can never split past ONE task no matter the split-size settings
  * — and every expensive row-local stage fused above such a scan
  * (shingle explode + md5, JSON synth/parse, chunk explode) runs
  * serially on a 32-core executor.
  */
object Scans {

  /** The scan partition count Spark's `FilePartition` would produce for
    * `fileSizes` — the split formula (maxPartitionBytes / openCost /
    * minPartitionNum) plus the greedy size-desc packing, replicated
    * driver-side so a width check needs NO physical planning pass
    * (VERDICT r18 #8: `df.rdd.getNumPartitions` built the full plan and
    * file listing a second time at construction). The estimate is only
    * a skip-the-repartition heuristic: an off-by-one at the width
    * boundary changes an exchange, never a result.
    */
  def estimateScanPartitions(spark: SparkSession, fileSizes: Seq[Long]): Int = {
    if (fileSizes.isEmpty) return 0
    val conf = spark.sessionState.conf
    val openCost = conf.filesOpenCostInBytes
    val minPartitionNum = conf.filesMinPartitionNum
      .orElse(spark.conf.getOption("spark.sql.leafNodeDefaultParallelism")
        .map(_.toInt))
      .getOrElse(spark.sparkContext.defaultParallelism)
    val totalBytes = fileSizes.map(_ + openCost).sum
    val bytesPerCore = totalBytes / math.max(1, minPartitionNum)
    val maxSplit = math.min(conf.filesMaxPartitionBytes,
      math.max(openCost, bytesPerCore))
    // chop files into <= maxSplit splits, pack size-desc, closing a
    // partition when (split + openCost) no longer fits — FilePartition
    // semantics
    val splits = fileSizes.flatMap { sz =>
      if (sz <= 0) Nil
      else (0L until sz by maxSplit).map(off => math.min(maxSplit, sz - off))
    }.sortBy(-_)
    var parts = 0
    var current = 0L
    var open = false
    splits.foreach { s =>
      if (open && current + s > maxSplit) { parts += 1; current = 0L }
      current += s + openCost // openCost charged in the accumulation,
      open = true             // not the overflow check — Spark's loop
    }
    if (open) parts += 1
    parts
  }

  /** The analyzed plan's single file relation, when `df` is a
    * projection/filter chain over one file scan — enough for every
    * [[spread]] caller; anything else returns None and the caller
    * falls back to the planned partition count.
    */
  private def scanFileSizes(df: DataFrame): Option[Seq[Long]] = {
    import org.apache.spark.sql.catalyst.plans.logical._
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    // STRICT chain walk, not collect(): a repartition/join/aggregate
    // between here and the scan changes the partitioning, so the scan's
    // file-derived width would be wrong for it (pinned by ScansSpec's
    // "already-wide frame passes through untouched")
    @scala.annotation.tailrec
    def walk(p: LogicalPlan): Option[Seq[Long]] = p match {
      case Project(_, child)      => walk(child)
      case Filter(_, child)       => walk(child)
      case SubqueryAlias(_, child) => walk(child)
      case l: LogicalRelation => l.relation match {
        case fs: HadoopFsRelation =>
          Some(fs.location.listFiles(Nil, Nil).flatMap(_.files.map(_.getLen)))
        case _ => None
      }
      case _ => None
    }
    walk(df.queryExecution.analyzed)
  }

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
    *     spreadForScore contract). The width comes from the analyzed
    *     plan's file listing via [[estimateScanPartitions]] — no
    *     physical-planning pass at construction (VERDICT r18 #8); a
    *     non-scan input falls back to the planned partition count.
    *
    * Use ONLY ahead of stages with a SINGLE consumer: a spread stacked
    * under a multi-consumer subtree defeats AQE's exchange-stage reuse
    * and re-executes the stage per consumer (measured on the shingle
    * pipeline: dedup_verified 2.7 s → 8.3 s).
    */
  def spread(df: DataFrame, key: Column): DataFrame = {
    val width = df.sparkSession.sparkContext.defaultParallelism
    val parts = scanFileSizes(df)
      .map(estimateScanPartitions(df.sparkSession, _))
      .getOrElse(df.rdd.getNumPartitions)
    if (parts >= width) df
    else df.repartition(width, key)
  }
}
