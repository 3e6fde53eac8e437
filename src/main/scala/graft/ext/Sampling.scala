package graft.ext

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling — the mixture-control step of a
  * training-data pipeline (downsample over-represented sources before
  * mixing). Hash-based, not random: the same row set is kept on every
  * run, every engine, every cluster size — which is what makes sampled
  * corpora reproducible and incremental re-runs idempotent. The hash is
  * the shared md5-derived h32 (ExtQueries scaladoc), so the oracle
  * reproduces the exact row set.
  *
  * Scale: the predicate is a narrow filter on a hash of the id — pushes
  * past nothing but costs one md5 per row, no shuffle; stratified
  * accounting is one partial-aggregated groupBy.
  */
object Sampling {

  /** Keep rows whose id-hash lands under `permille`/1000 — an exact,
    * deterministic ~permille/1000 sample.
    */
  def hashSample(df: DataFrame, idCol: String, permille: Int): DataFrame = {
    require(permille >= 0 && permille <= 1000)
    df.filter(Dedup.h32(col(idCol).cast("string")) % 1000 < permille)
  }

  /** Per-stratum sample accounting: rows kept and id checksum per
    * stratum (the verification view of a stratified downsample).
    */
  def stratifiedCounts(df: DataFrame, strataCol: String, idCol: String,
      permille: Int): DataFrame =
    hashSample(df, idCol, permille)
      .groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_sampled"), sum(col(idCol)).as(s"sum_$idCol"))

  /** Per-stratum cap: keep each stratum's top `n` rows under `order`
    * (e.g. 15 best-quality docs per source) — the mixture-control step
    * that stops one over-crawled source from dominating a training mix.
    * One shuffle on the stratum; the window's rank filter bounds every
    * stratum's survivors regardless of its raw size.
    */
  def capPerStratum(df: DataFrame, strataCol: String,
      order: Seq[org.apache.spark.sql.Column], n: Int): DataFrame = {
    require(n > 0)
    import org.apache.spark.sql.expressions.Window
    df.withColumn("rank",
        row_number().over(Window.partitionBy(col(strataCol)).orderBy(order: _*))
          .cast("long"))
      .filter(col("rank") <= n)
  }

  /** Token-budget mixture construction — the mixing step that turns
    * per-source weights into an actual training corpus (the
    * Dolma/RedPajama recipe: "take N_s tokens from source s"): each
    * stratum keeps its docs in deterministic id-hash order until the
    * stratum's token budget is exhausted — a doc is kept iff the
    * running token total THROUGH it stays ≤ `budget` (a per-row
    * expression, so budgets can differ per stratum). Integer arithmetic
    * end to end; one shuffle on the stratum, and the window never
    * crosses strata, so the plan scales with the largest source, not
    * the corpus.
    */
  def mixtureByBudget(df: DataFrame, strataCol: String, idCol: String,
      tokensCol: org.apache.spark.sql.Column,
      budget: org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(strataCol))
      .orderBy(Dedup.h32(col(idCol).cast("string")), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("n_tokens", tokensCol.cast("long"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budget)
  }

  /** Deterministic shard assignment for training-data export: shard =
    * id-hash mod `nShards`, with per-shard accounting (docs, summed
    * weight, id checksum). Hash sharding is what makes the export
    * embarrassingly parallel at 100 TB — every writer owns a shard,
    * placement is a pure row-local function (no coordination, no
    * shuffle beyond the final per-shard aggregate), and re-runs place
    * every row identically. The accounting row set IS the shard
    * manifest: balanced shards show near-equal n_docs/weight.
    */
  def shardStats(df: DataFrame, idCol: String, weightCol: String,
      nShards: Int = 16): DataFrame = {
    require(nShards > 0)
    df.select(
        (Dedup.h32(col(idCol).cast("string")) % nShards).as("shard"),
        col(idCol), col(weightCol))
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(weightCol)).cast("long").as(s"sum_${weightCol}"),
        sum(col(idCol)).cast("long").as(s"sum_$idCol"))
  }
}
