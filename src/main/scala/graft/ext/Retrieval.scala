package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
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
    * ids (ascending, comma-joined). The cap is a bounded typed
    * aggregate ([[graft.functions.TopKIdsAgg]] — a
    * TypedImperativeAggregate under `udaf`), so it collapses MAP-SIDE:
    * per-token state is O(maxPostings) in every task and the shuffle
    * carries ≤ maxPostings ids per (task, token). A stop-word present
    * in 100 % of documents costs the same k-bounded merges as a rare
    * token — no single-task sort of the hot token's rows (the stall the
    * earlier token-partitioned `row_number` window had), and the whole
    * index is ONE aggregation: no distinct, no window, no re-join.
    */
  def invertedIndex(df: DataFrame, idCol: String, textCol: String,
      maxPostings: Int = 10): DataFrame = {
    val headIds = udaf(new graft.functions.TopKIdsAgg(maxPostings),
      org.apache.spark.sql.Encoders.scalaLong)
    tokens(df, idCol, textCol)
      .groupBy(col("token"))
      .agg(
        count(lit(1)).as("tf"),
        countDistinct(col(idCol)).as("df"),
        array_join(transform(headIds(col(idCol)), _.cast("string")), ",").as("postings"))
      .select(col("token"), col("tf"), col("df"), col("postings"))
  }

  /** Text-index build — pay the tokenize/aggregate cost ONCE, then
    * serve every [[bm25Probe]] from the persisted tables (the
    * reference's write-time-layout posture, persist.go:101-108):
    *
    *   - `$path/postings`: one row per (doc, term) — (token, idCol,
    *     tf, dl), range-partitioned and sorted by token so a probe's
    *     term filter prunes row groups via parquet min/max. `dl` is
    *     DENORMALIZED into the postings so a probe never joins the
    *     doc-count-sized length table.
    *   - `$path/termdf`: (token, df) — vocabulary-sized; a probe reads
    *     it term-filtered and broadcasts the handful of rows.
    *   - `$path/corpus`: one row — (n_docs, avgdl).
    *
    * Use [[IndexStore.ensure]] for the build-once lifecycle.
    */
  def buildTextIndex(df: DataFrame, idCol: String, textCol: String,
      path: String): Unit = {
    val spark = df.sparkSession
    val docLen = df.select(col(idCol), size(split(col(textCol), "\\s+")).cast("long").as("dl"))
    tokens(df, idCol, textCol)
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
      .join(docLen, idCol)
      .select(col("token"), col(idCol), col("tf"), col("dl"))
      .repartitionByRange(spark.sessionState.conf.numShufflePartitions, col("token"))
      .sortWithinPartitions(col("token"), col(idCol))
      .write.mode("overwrite").parquet(s"$path/postings")
    // derived from the WRITTEN postings (one row per (doc, term)) — the
    // corpus text is never tokenized a second time
    spark.read.parquet(s"$path/postings")
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
      .write.mode("overwrite").parquet(s"$path/termdf")
    docLen.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/corpus")
  }

  /** Per-partition text-index build — the incremental-refresh unit
    * ([[IndexStore.ensureIncremental]]): same postings layout as
    * [[buildTextIndex]] (token-range-sorted, dl denormalized) over ONE
    * source partition's documents, plus the partition's termdf and a
    * corpus row carrying (n_docs, sum_dl) — the EXACTLY mergeable form
    * of the corpus stats (sums, not the final average). Requires each
    * document to live in exactly one partition (hour-partitioned
    * corpora satisfy this by construction), so per-(doc, term) tf and
    * per-doc dl never need cross-partition reconciliation.
    */
  def buildTextIndexPart(df: DataFrame, idCol: String, textCol: String,
      path: String): Unit = {
    val spark = df.sparkSession
    val docLen = df.select(col(idCol), size(split(col(textCol), "\\s+")).cast("long").as("dl"))
    tokens(df, idCol, textCol)
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
      .join(docLen, idCol)
      .select(col("token"), col(idCol), col("tf"), col("dl"))
      .repartitionByRange(spark.sessionState.conf.numShufflePartitions, col("token"))
      .sortWithinPartitions(col("token"), col(idCol))
      .write.mode("overwrite").parquet(s"$path/postings")
    spark.read.parquet(s"$path/postings")
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
      .write.mode("overwrite").parquet(s"$path/termdf")
    docLen.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/corpus_partial")
  }

  /** Merge committed per-partition indexes into a probe-ready index
    * with the [[buildTextIndex]] layout. The corpus-proportional table
    * — postings — is merged by FILE COPY into `postings/part=N/`
    * subdirs: zero reads, zero shuffles, zero re-tokenization; each
    * file keeps its token-sorted row groups, so a probe's term filter
    * prunes inside every part exactly as in a monolithic index (the
    * `part` partition column rides along harmlessly). On a cluster
    * store the copy becomes a metadata move (manifest/rename) — the
    * layout is what matters. termdf and the corpus row re-aggregate
    * from the VOCABULARY-sized part tables: token-summed df and
    * sum(n_docs)/sum(sum_dl) → avgdl, which reproduces the monolithic
    * build's stats exactly (integral sums; same division).
    */
  def mergeTextIndex(spark: SparkSession, partPaths: Seq[String], path: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    partPaths.zipWithIndex.foreach { case (pp, i) =>
      val src = new org.apache.hadoop.fs.Path(s"$pp/postings")
      val dst = new org.apache.hadoop.fs.Path(s"$path/postings/part=$i")
      val fs = src.getFileSystem(conf)
      fs.mkdirs(dst.getParent)
      org.apache.hadoop.fs.FileUtil.copy(fs, src, fs, dst, false, conf)
    }
    spark.read.parquet(partPaths.map(_ + "/termdf"): _*)
      .groupBy(col("token")).agg(sum(col("df")).as("df"))
      .write.mode("overwrite").parquet(s"$path/termdf")
    val c = spark.read.parquet(partPaths.map(_ + "/corpus_partial"): _*)
      .agg(sum(col("n_docs")).as("n"), sum(col("sum_dl")).as("s")).head()
    val (nDocs, sumDl) = (c.getLong(0), c.getLong(1))
    val s = spark
    import s.implicits._
    Seq((nDocs, sumDl.toDouble / nDocs)).toDF("n_docs", "avgdl")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/corpus")
  }

  /** The incremental text index for an append-only partitioned corpus:
    * per-partition builds + the metadata-cheap merge, through
    * [[IndexStore.ensureIncremental]]. Appending an hour re-tokenizes
    * ONLY that hour; probes ([[bm25Probe]]) are layout-identical to a
    * monolithic [[buildTextIndex]].
    */
  def ensureIncrementalTextIndex(spark: SparkSession, kind: String,
      sourceDir: String, idCol: String, textCol: String): String =
    IndexStore.ensureIncremental(kind, spark, sourceDir) { (part, tmp) =>
      buildTextIndexPart(spark.read.parquet(part), idCol, textCol, tmp)
    } { (parts, tmp) => mergeTextIndex(spark, parts, tmp) }

  /** BM25 ranked retrieval against a [[buildTextIndex]] index: top-k
    * documents for `terms` with the standard Robertson/Sparck-Jones
    * formulation — idf = ln(1 + (N - df + ½)/(df + ½)), tf saturation
    * k1, length normalization b against the corpus mean document
    * length.
    *
    * Probe plan: ONE row read from the corpus table (driver-side index
    * lookup), a term-filtered read of termdf (broadcast), and a
    * term-filtered read of postings — the only corpus-proportional
    * table, pruned to rows containing a query term before anything
    * shuffles. No tokenization, no full-corpus scan, no doc-length
    * join (PlanAuditSpec pins this). The final top-k is
    * TakeOrderedAndProject — per-partition heaps, no global sort.
    */
  def bm25Probe(spark: SparkSession, indexPath: String, idCol: String,
      terms: Seq[String], k: Int = 20, k1: Double = 1.2, b: Double = 0.75,
      digits: Int = 4): DataFrame = {
    val corpus = spark.read.parquet(s"$indexPath/corpus").head()
    val nDocs = corpus.getLong(0)
    val avgdl = corpus.getDouble(1)
    val posts = spark.read.parquet(s"$indexPath/postings")
      .filter(col("token").isin(terms: _*))
    val dfPerTerm = spark.read.parquet(s"$indexPath/termdf")
      .filter(col("token").isin(terms: _*))
    posts
      .join(broadcast(dfPerTerm), "token")
      .withColumn("idf",
        log(lit(1.0) + (lit(nDocs.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("contrib",
        col("idf") * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(avgdl))))
      .groupBy(col(idCol))
      .agg(pround(sum(col("contrib")), digits).as("score"))
      .orderBy(col("score").desc, col(idCol)).limit(k)
  }

  /** One-shot BM25 (index build folded into the query) — the same
    * scores as [[bm25Probe]] over a [[buildTextIndex]] index, for a
    * single ad-hoc query where persisting the index has no second
    * probe to amortize against. Repeated probes should build once and
    * probe the persisted tables instead.
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

  /** Positional token stream: (idCol, pos, token) with 0-based word
    * offsets — single-space split so offsets agree with the substring
    * and packing operators' word positions.
    */
  private def positionalTokens(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), posexplode(split(col(textCol), " ")).as(Seq("pos", "token")))

  /** PHRASE search — exact consecutive-token match, the positional-
    * index join shape: for phrase w₀..w_k, term i's positions align on
    * the anchor key (doc, pos − i), so the plan is k equi-joins, each
    * linear in that term's postings, never a per-document scan of the
    * whole text. Self-overlapping occurrences count (standard postings
    * semantics: "a a a" contains "a a" twice). Returns
    * (idCol, n_occurrences) for documents with ≥1 occurrence.
    */
  def phraseSearch(df: DataFrame, idCol: String, textCol: String,
      phrase: Seq[String]): DataFrame =
    phraseFromPositions(positionalTokens(df, idCol, textCol), idCol, phrase)

  private[ext] def phraseFromPositions(pts: DataFrame, idCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    val anchor = pts.filter(col("token") === phrase.head)
      .select(col(idCol), col("pos").cast("long").as("p0"))
    val aligned = phrase.zipWithIndex.tail.foldLeft(anchor) { case (acc, (w, i)) =>
      acc.join(
        pts.filter(col("token") === w)
          .select(col(idCol), (col("pos").cast("long") - i).as("p0")),
        Seq(idCol, "p0"))
    }
    aligned.groupBy(col(idCol)).agg(count(lit(1)).as("n_occurrences"))
  }

  /** Positional index build — pay the tokenize/explode ONCE and serve
    * every [[phraseProbe]] from the persisted layout: (token, id, pos)
    * PARTITIONED BY a hash bucket of the token, so a probe's scan
    * prunes to the ≤|phrase| buckets its terms hash into instead of
    * re-reading the corpus. Bucketing (not token-partitioning) keeps
    * the directory count fixed at any vocabulary size.
    */
  def buildPositionalIndex(df: DataFrame, idCol: String, textCol: String,
      path: String, buckets: Int = 64): Unit =
    positionalTokens(df, idCol, textCol)
      .withColumn("tok_bucket", pmod(xxhash64(col("token")), lit(buckets.toLong)))
      .write.mode("overwrite").partitionBy("tok_bucket").parquet(path)

  /** Merge committed per-partition positional indexes ([[
    * buildPositionalIndex]] over one source partition each) into one
    * probe-ready layout: pure FILE COPY of each part under
    * `path/part=N/` — zero reads, zero re-tokenization; the per-part
    * `tok_bucket=` dirs ride along, so a probe's bucket filter prunes
    * inside every part exactly as in a monolithic build (Spark infers
    * the (part, tok_bucket) partition columns from the nested dirs).
    * Unlike the text index there are no corpus-level stats to
    * re-aggregate — positions are purely local facts.
    */
  def mergePositionalIndex(spark: SparkSession, partPaths: Seq[String],
      path: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    partPaths.zipWithIndex.foreach { case (pp, i) =>
      val src = new org.apache.hadoop.fs.Path(pp)
      val dst = new org.apache.hadoop.fs.Path(s"$path/part=$i")
      val fs = src.getFileSystem(conf)
      fs.mkdirs(dst.getParent)
      org.apache.hadoop.fs.FileUtil.copy(fs, src, fs, dst, false, conf)
      ()
    }
  }

  /** The incremental positional index for an append-only partitioned
    * corpus (VERDICT r12 #7 — the [[ensureIncrementalTextIndex]]
    * treatment for phrase search): appending an hour re-tokenizes ONLY
    * that hour, the merge is a metadata-cheap copy, and [[phraseProbe]]
    * over the merged layout is identical to a full rebuild
    * (IncrementalIndexSpec pins probe ≡ rebuild).
    */
  def ensureIncrementalPositionalIndex(spark: SparkSession, kind: String,
      sourceDir: String, idCol: String, textCol: String,
      buckets: Int = 64): String =
    IndexStore.ensureIncremental(kind, spark, sourceDir) { (part, tmp) =>
      buildPositionalIndex(spark.read.parquet(part), idCol, textCol, tmp, buckets)
    } { (parts, tmp) => mergePositionalIndex(spark, parts, tmp) }

  /** Phrase probe over a [[buildPositionalIndex]] layout: identical
    * results to the one-shot [[phraseSearch]] (IndexSpec-pinned), but
    * the scan reads only the phrase terms' bucket partitions. The
    * bucket values come from one 1-row Spark job so the driver-side
    * filter uses the SAME xxhash64 the build used.
    */
  def phraseProbe(spark: SparkSession, indexPath: String, idCol: String,
      phrase: Seq[String], buckets: Int = 64): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    val wanted = spark.range(1).select(
      phrase.distinct.map(w =>
        pmod(xxhash64(lit(w)), lit(buckets.toLong)).as(s"b_$w")): _*)
      .head().toSeq.map(_.asInstanceOf[Long]).distinct
    val pts = spark.read.parquet(indexPath)
      .filter(col("tok_bucket").isInCollection(wanted))
    phraseFromPositions(pts, idCol, phrase)
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

  /** Corpus BIGRAM LM scored back over each document: per doc, the mean
    * negative log-likelihood of each token given its predecessor under
    * the add-one-smoothed conditional
    *
    *   p(w₂|w₁) = (c(w₁,w₂) + 1) / (c(w₁) + V)
    *
    * — one notch up the n-gram ladder from [[unigramLogProb]]: the
    * quality signal that catches shuffled/templated text a unigram
    * model scores as natural (same word histogram, broken transitions).
    * Plan shape: the bigram stream is a map-side `zip_with` of two word
    * slices (no self-join to form pairs); the model is two token-keyed
    * aggregates (pair counts, left-word counts) joined back to the
    * stream — vocabulary-sized sides Spark broadcasts by estimate.
    * Docs with fewer than 2 words have no transitions and score null
    * NLL with n_bigrams = 0.
    */
  def bigramLogProb(df: DataFrame, idCol: String, textCol: String,
      digits: Int = 4): DataFrame = {
    val sp = split(col(textCol), " ")
    val pairs = df.select(col(idCol),
      explode(zip_with(
        slice(sp, lit(1), size(sp) - 1),
        slice(sp, lit(2), size(sp) - 1),
        (l, r) => struct(l.as("w1"), r.as("w2")))).as("p"))
      .select(col(idCol), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val pairCnt = pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cp"))
    val leftCnt = pairs.groupBy(col("w1")).agg(count(lit(1)).as("cl"))
    val vocab = df.select(explode(sp).as("w")).agg(countDistinct(col("w"))).head().getLong(0)
    val scored = pairs
      .join(pairCnt, Seq("w1", "w2"))
      .join(leftCnt, Seq("w1"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_bigrams"),
        pround(avg(-log((col("cp") + lit(1)).cast("double") /
          (col("cl") + lit(vocab)).cast("double"))), digits).as("mean_nll"))
    // docs without transitions (0 or 1 word) still get a row
    df.select(col(idCol)).join(scored, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("mean_nll"))
  }
}
