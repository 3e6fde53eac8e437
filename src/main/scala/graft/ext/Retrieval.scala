package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Portable.pround

/** Sparse text-retrieval operators over a (id, text) corpus: inverted
  * index build, BM25 ranked retrieval, and a corpus unigram language
  * model (the perplexity-proxy quality signal training-data pipelines
  * gate on). The reference engine has no retrieval surface — these are
  * extension operators (build brief: "operations a large-scale
  * training-data pipeline would need"), designed Spark-first:
  *
  *   - tokenization is `split` + `explode` (codegen'd, no UDF);
  *   - the index build is one shuffle on token; postings are bounded by
  *     a windowed top-N BEFORE any list materializes, so a stop-word's
  *     posting list cannot blow an executor at corpus scale;
  *   - BM25 score terms join on token against a term list that is tiny
  *     by construction (a user query), so the probe broadcasts;
  *   - the unigram model is a token-keyed aggregate joined back to the
  *     token stream — two shuffles total, both on the same key.
  */
object Retrieval {

  /** Tokens exploded one-per-row: (idCol, token). Whitespace split,
    * matching the corpus tokenization used by [[TextStats]].
    */
  private def tokens(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), explode(split(col(textCol), "\\s+")).as("token"))

  /** Inverted index: per token, document frequency `df`, total term
    * frequency `tf`, and a `postings` head capped at `maxPostings` doc
    * ids (ascending, comma-joined). The cap is applied with a windowed
    * row_number BEFORE collecting, so per-token state is O(maxPostings)
    * regardless of how common the token is — the degenerate stop-word
    * posting list never materializes.
    */
  def invertedIndex(df: DataFrame, idCol: String, textCol: String,
      maxPostings: Int = 10): DataFrame = {
    val tok = tokens(df, idCol, textCol)
    val stats = tok.groupBy(col("token"))
      .agg(count(lit(1)).as("tf"), countDistinct(col(idCol)).as("df"))
    val headIds = tok.distinct()
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("token")).orderBy(col(idCol))))
      .filter(col("__rn") <= maxPostings)
      .groupBy(col("token"))
      .agg(concat_ws(",", sort_array(collect_list(col(idCol)))).as("postings"))
    stats.join(headIds, "token")
      .select(col("token"), col("tf"), col("df"), col("postings"))
  }

  /** BM25 ranked retrieval: top-k documents for `terms` with the
    * standard Robertson/Sparck-Jones formulation —
    * idf = ln(1 + (N - df + ½)/(df + ½)), tf saturation k1, length
    * normalization b against the corpus mean document length.
    *
    * Plan shape: corpus stats (N, avgdl) reduce to one row; per-term df
    * is an aggregate over the term-filtered token stream (the filter is
    * an `isin` over a handful of literals, pushed to the scan); the
    * score join then runs only over rows containing a query term. The
    * final top-k is TakeOrderedAndProject — per-partition heaps, no
    * global sort.
    */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int = 20, k1: Double = 1.2, b: Double = 0.75,
      digits: Int = 4): DataFrame = {
    val docLen = df.select(col(idCol), size(split(col(textCol), "\\s+")).cast("long").as("dl"))
    val corpus = docLen.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
      .head()
    val nDocs = corpus.getLong(0)
    val avgdl = corpus.getDouble(1)

    val qTok = tokens(df, idCol, textCol).filter(col("token").isin(terms: _*))
    val dfPerTerm = qTok.select(col("token"), col(idCol)).distinct()
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
    val tfPerDoc = qTok.groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))

    val scored = tfPerDoc
      .join(broadcast(dfPerTerm), "token")
      .join(docLen, idCol)
      .withColumn("idf",
        log(lit(1.0) + (lit(nDocs.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("contrib",
        col("idf") * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(avgdl))))
      .groupBy(col(idCol))
      .agg(pround(sum(col("contrib")), digits).as("score"))
    scored.orderBy(col("score").desc, col(idCol)).limit(k)
  }

  /** Corpus unigram LM scored back over each document: per doc, the
    * token count and the mean negative log-likelihood under
    * p(w) = count(w)/total — the cheap perplexity proxy used as a
    * quality gate. Two shuffles, both keyed on token; the model join is
    * token→count (vocabulary-sized, typically far smaller than the
    * corpus — Spark picks broadcast vs shuffle by its size estimate).
    */
  def unigramLogProb(df: DataFrame, idCol: String, textCol: String,
      digits: Int = 4): DataFrame = {
    val tok = tokens(df, idCol, textCol)
    val counts = tok.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt"))).head().getLong(0)
    tok.join(counts, "token")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        pround(avg(-log(col("cnt").cast("double") / lit(total.toDouble))), digits)
          .as("mean_nll"))
  }
}
