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
    * end to end.
    *
    * Scale shape — two-phase prefix sum, NOT one per-stratum running
    * window (which would sort the whole of a stratum through ONE task;
    * the dominant source of a real pretraining mix is most of the
    * corpus). The id-hash h is uniform on [0, 2^32), so
    * `chunk = ⌊h·C / 2^32⌋` splits every stratum into C contiguous,
    * near-equal slices of its hash order — deterministically, row-
    * locally, with no range sampling and no partition-id coupling:
    *   1. per-(stratum, chunk) token subtotals — one map-side-combined
    *      aggregation, output ≤ strata·C rows;
    *   2. exclusive-prefix offsets over that TINY table (a window over
    *      ≤ C rows per stratum — the only stratum-wide window left, and
    *      it never sees corpus rows);
    *   3. offsets broadcast-joined back; the corpus-side running sum is
    *      a window keyed by (stratum, chunk), so no task ever sorts
    *      more than ~1/C of a stratum.
    * Long addition is associative, so cum_tokens is bit-identical to
    * the single-window form at any C — pick C ≈ stratum_bytes / 256 MB
    * for the target scale (the offsets table stays ≤ strata·C rows,
    * a few MB even at C = 64k).
    */
  def mixtureByBudget(df: DataFrame, strataCol: String, idCol: String,
      tokensCol: org.apache.spark.sql.Column,
      budget: org.apache.spark.sql.Column,
      chunks: Int = 1024): DataFrame = {
    require(chunks > 0 && chunks <= (1 << 20), s"chunks in [1, 2^20], got $chunks")
    import org.apache.spark.sql.expressions.Window
    // h < 2^32 and C ≤ 2^20, so h·C < 2^52: exact in a double, and the
    // divisor is a power of two — the floor is exact.
    val keyed = df
      .withColumn("n_tokens", tokensCol.cast("long"))
      .withColumn("__mix_h", Dedup.h32(col(idCol).cast("string")))
      .withColumn("__mix_c",
        floor(col("__mix_h") * lit(chunks.toLong) / lit(4294967296.0)).cast("int"))
    val subs = keyed.groupBy(col(strataCol), col("__mix_c"))
      .agg(sum(col("n_tokens")).as("__mix_t"))
    val wOff = Window.partitionBy(col(strataCol)).orderBy(col("__mix_c"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = subs
      .withColumn("__mix_off", coalesce(sum(col("__mix_t")).over(wOff), lit(0L)))
      .drop("__mix_t")
    val wLoc = Window.partitionBy(col(strataCol), col("__mix_c"))
      .orderBy(col("__mix_h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the offsets table is strata·C rows: broadcast it at the default
    // chunk counts (a few MB), but past 8k chunks a large-strata mix
    // could push it into driver-memory territory — fall back to a plain
    // join on (stratum, chunk), a balanced shuffle (the same size gate
    // discipline as the batch ANN probes)
    val offsJoin = if (chunks <= 8192) broadcast(offs) else offs
    keyed
      .join(offsJoin, Seq(strataCol, "__mix_c"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(wLoc) + col("__mix_off"))
      .filter(col("cum_tokens") <= budget)
      .drop("__mix_h", "__mix_c", "__mix_off")
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
