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
}
