package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.util.Portable.{dsum, pround}

/** DSIR — Data Selection via Importance Resampling (Xie et al.,
  * NeurIPS 2023): score every raw-corpus document by how much more
  * likely its hashed-unigram bag is under a TARGET distribution than
  * under the RAW distribution,
  *
  *   w(doc) = Σ_tokens [ log p̂_target(h(t)) − log p̂_raw(h(t)) ],
  *
  * with add-one smoothing over `buckets` hash buckets, then resample by
  * Gumbel-perturbed weight — the standard pretraining-data selection
  * recipe for "make the crawl look like the curated corpus".
  *
  * Scale shape: one explode over the corpus (the token fan-out), two
  * bucket-count aggregations whose results are ≤ `buckets` rows —
  * BROADCAST joined back, so the per-occurrence scoring pass is
  * map-side — and one doc-keyed aggregation. No shuffle wider than the
  * doc key; the bucket tables stay a few MB even at 2^20 buckets, so
  * the same plan runs at 100 TB. Determinism: the md5-derived portable
  * hash (repo portability rules), per-term [[pround]](9), and the
  * order-deterministic [[dsum]] make the weights exact across engines
  * and partitionings — the oracle twin hash-matches by construction.
  */
object Dsir {

  /** One row per feature occurrence, hashed into [0, buckets). With
    * `bigrams`, features are unigrams ∪ word bigrams ("a b" tokens) in
    * the SAME bucket space — Xie et al.'s hashed n-gram form, via one
    * `zip_with` over the split array (the
    * [[Classifier.hashedNgramFeatures]] precedent; occurrences keep
    * MULTIPLICITY here — DSIR counts, a classifier's bag doesn't).
    * Word order enters through the bigrams: templated text whose
    * unigram bags are identical to the target's separates only there.
    */
  private def occurrences(df: DataFrame, textCol: String,
      buckets: Int, bigrams: Boolean, keep: Column*): DataFrame = {
    val toks =
      if (!bigrams) explode(split(col(textCol), " "))
      else {
        val w = split(col(textCol), " ")
        val tail = greatest(size(w) - 1, lit(0))
        explode(concat(w, zip_with(slice(w, lit(1), tail), slice(w, lit(2), tail),
          (a, b) => concat(a, lit(" "), b))))
      }
    df.select(keep :+ toks.as("tok"): _*)
      .select(keep :+ pmod(Dedup.h32(col("tok")), lit(buckets.toLong)).as("b"): _*)
  }

  /** Per-document DSIR importance weight of every doc in `docs` against
    * the target slice `docs.filter(targetPred)` (e.g. the curated
    * sources). Output: (idCol, n_tokens, dsir_w). `bigrams` switches
    * the feature space to hashed unigrams ∪ bigrams (see
    * [[occurrences]]); n_tokens then counts features, not words.
    */
  def weights(docs: DataFrame, targetPred: Column, idCol: String,
      textCol: String, buckets: Int = 4096,
      bigrams: Boolean = false): DataFrame = {
    val occ = occurrences(docs, textCol, buckets, bigrams, col(idCol))
    val tgt = occurrences(docs.filter(targetPred), textCol, buckets, bigrams)
    val tgtCts = tgt.groupBy("b").agg(count(lit(1)).as("ct_t"))
    val rawCts = occ.groupBy("b").agg(count(lit(1)).as("ct_r"))
    // corpus totals: two single-row aggregates, broadcast scalar joins
    val totals = broadcast(tgt.agg(count(lit(1)).as("n_t")))
      .crossJoin(broadcast(occ.agg(count(lit(1)).as("n_r"))))
    val term = pround(
      log(col("ct_t") + lit(1.0)) - log(col("ct_r") + lit(1.0)) +
        log(col("n_r") + lit(buckets.toDouble)) -
        log(col("n_t") + lit(buckets.toDouble)), 9)
    occ
      .join(broadcast(rawCts), "b") // every occurrence's bucket is counted
      .join(broadcast(tgtCts), Seq("b"), "left")
      .na.fill(0L, Seq("ct_t"))
      .crossJoin(broadcast(totals))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        pround(dsum(term), 6).as("dsir_w"))
  }

  /** The RESAMPLING half of DSIR: draw `k` docs without replacement
    * with probability ∝ exp(w) via the Gumbel-top-k trick — rank by
    * w + Gumbel(u), u a deterministic id-hash uniform, so the "random"
    * draw is reproducible across runs, engines, and cluster sizes (the
    * same property every sampler in [[Sampling]] has).
    */
  def sampleTopK(weights: DataFrame, idCol: String, wCol: String,
      k: Int): DataFrame =
    weights.select(col(idCol), col(wCol), gumbelKey(idCol, wCol).as("gumbel_key"))
      .orderBy(col("gumbel_key").desc, col(idCol))
      .limit(k)

  /** The Gumbel-perturbed ranking key: w + Gumbel(u), u a deterministic
    * id-hash uniform in (0, 1) — (h32 + 0.5) / 2^32; g = −ln(−ln u).
    */
  def gumbelKey(idCol: String, wCol: String): Column = {
    val u = (Dedup.h32(col(idCol).cast("string")).cast("double") + lit(0.5)) /
      lit(4294967296.0)
    pround(col(wCol) + -log(-log(u)), 6)
  }

  /** Share-based resampling — keep the top `keep` fraction by
    * Gumbel-perturbed weight. The scale twin of [[sampleTopK]]: a
    * `limit(0.8·N)` is a driver-side TakeOrdered at corpus scale, so
    * this form gates on the exact (1−keep) percentile instead. The
    * gate's threshold is found by distributed order statistics over
    * the 1e-6-quantized key histogram ([[TextStats.percentileGate]]) —
    * even though this call has a single stratum, no task ever holds
    * more than the distinct-key count (grid-bounded), never a
    * value-per-row buffer.
    */
  def sampleByShare(weights: DataFrame, idCol: String, wCol: String,
      keep: Double): DataFrame = {
    require(keep > 0 && keep <= 1, s"keep must be in (0,1], got $keep")
    TextStats.percentileGate(
      weights.withColumn("gumbel_key", gumbelKey(idCol, wCol))
        .withColumn("__all", lit(0)),
      "__all", "gumbel_key", q = 1 - keep, thrDigits = Some(6))
      .drop("__all")
  }
}
