package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.util.Portable.pround

/** LLM-training-data pipeline operators (SURVEY.md §2.2 rows E1-E3 + the
  * build brief): deduplication (exact, MinHash-LSH, SimHash, n-gram
  * Jaccard), embedding similarity search, and text analysis over the
  * `documents` / `embeddings` fixture tables.
  *
  * Oracle portability: every hash used here is derived from `md5` hex
  * (identical output in Spark and DuckDB), then converted to an integer —
  * Spark `conv(substring(md5(s),1,8),16,10)` ≡ DuckDB
  * `('0x'||substr(md5(s),1,8))::BIGINT` — so even the sketch-based
  * operators (MinHash, SimHash) are exactly reproducible in ANSI-ish SQL.
  *
  * Scale notes:
  *   - Exact dedup / fingerprinting: one hash-shuffle on the digest —
  *     the digest (not the document body) is the shuffle key, so 100 TB
  *     of text shuffles only ids + 32-byte hashes after projection.
  *   - MinHash-LSH: the classic shingle→sign→band→bucket-join pipeline.
  *     Candidate generation joins on (band, signature) buckets — never
  *     all-pairs. The n-gram Jaccard verifier below is the *verification*
  *     step one runs on LSH candidates; the fixture-scale query verifies
  *     all colliding pairs directly.
  *   - Brute-force kNN broadcasts the query vector (one row) and scans
  *     once — embarrassingly parallel; the LSH-bucketed variant bounds
  *     each probe to one bucket.
  */
object ExtQueries {

  /** Portable 32-bit string hash: first 8 hex chars of md5 as a long. */
  private def h32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  // ---------------------------------------------------------------- text

  /** E3 — per-document text statistics: chars, words, average word
    * length. The `documents.n_chars` fixture column is recomputed (and
    * thereby cross-checked) rather than trusted.
    */
  def textStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        size(split(col("text"), " ")).cast("long").as("n_words"),
        pround(length(regexp_replace(col("text"), " ", "")).cast("double") /
          size(split(col("text"), " ")), 4).as("avg_word_len"))

  /** E3 — corpus token counts per source: total and distinct tokens.
    * Whitespace tokenizer; explode + two-level aggregate. At scale the
    * explode is map-local and the shuffle carries (source, token) pairs
    * pre-combined map-side.
    */
  def tokenCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"), explode(split(col("text"), "\\s+")).as("token"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_tokens"),
        countDistinct(col("token")).as("n_distinct_tokens"))

  /** E3 — heuristic language ID: stopword-ratio n-gram heuristic.
    * (The fixture corpus shares one vocabulary across its `lang` labels,
    * so the interesting output is the deterministic scoring pipeline, not
    * label recovery.)
    */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val words = split(col("text"), " ")
    val stops = filter(words, w => w.isin("the", "a", "of", "and", "is"))
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        pround(size(stops).cast("double") / size(words), 4).as("stop_ratio"))
      .withColumn("pred_lang",
        when(col("stop_ratio") >= 0.05, lit("en")).otherwise(lit("unknown")))
  }

  /** E3 — quality score: blended length / lexical-diversity / stopword
    * signals in [0,1] — the usual cheap pre-filter before expensive
    * pipeline stages.
    */
  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    val words = split(col("text"), " ")
    val nWords = size(words).cast("double")
    val distinctRatio = size(array_distinct(words)) / nWords
    val stopRatio = size(filter(words, w => w.isin("the", "a", "of", "and", "is"))) / nWords
    val lengthScore = least(lit(1.0), nWords / 100.0)
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        pround(lit(0.4) * lengthScore + lit(0.4) * distinctRatio + lit(0.2) * stopRatio, 4)
          .as("quality"))
  }

  /** E3 — document fingerprint: digest of whitespace-normalized, lowered
    * text — the cheap exact-dup key (and the md5s match DuckDB's).
    */
  def docFingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        md5(lower(regexp_replace(col("text"), "\\s+", " "))).as("fingerprint"))

  // --------------------------------------------------------------- dedup

  /** E1 — exact dedup: group on content digest, keep the lowest doc_id
    * as canonical, count copies. Shuffle key is the 32-char digest, not
    * the body.
    */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), md5(col("text")).as("fingerprint"))
      .groupBy(col("fingerprint"))
      .agg(
        min(col("doc_id")).as("canonical_doc_id"),
        count(lit(1)).as("n_copies"))
      .select(col("canonical_doc_id"), col("fingerprint"), col("n_copies"))

  /** Distinct word-trigram shingles per document: (doc_id, shingle). */
  private def shingles(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"),
        explode(expr("transform(sequence(0, size(w)-3), i -> concat_ws(' ', w[i], w[i+1], w[i+2]))"))
          .as("shingle"))
      .distinct()
  }

  /** E1 — n-gram Jaccard near-dup pairs: word-trigram shingle sets,
    * pairs with J ≥ 0.8. The pair-generation join is on the shingle
    * value — only documents sharing a shingle ever meet, so the
    * complexity is Σ_shingle df² over *colliding* shingles, not n².
    * At 100 TB this exact query is the verification stage fed by the
    * MinHash-LSH candidates below.
    */
  def dedupNgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingles(spark, dir).cache()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val common = sh.as("a")
      .join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "n_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "n_b"), "doc_b")
      .withColumn("jaccard",
        pround(col("n_common").cast("double") / (col("n_a") + col("n_b") - col("n_common")), 4))
      .filter(col("jaccard") >= 0.8)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Number of MinHash permutations / band layout: 16 hashes = 4 bands × 4. */
  val MinHashK = 16
  val MinHashBandRows = 4
  private val MersennePrime = 2147483647L // 2^31-1

  /** E1 — MinHash-LSH candidate pairs: 16-slot signature banded into
    * 4 bands of 4, bucket by (band, band-signature), emit distinct
    * colliding pairs. This is the scale path for near-dup detection:
    * the only join is on band buckets; no all-pairs comparison exists
    * anywhere in the plan. Expected to recover the J≥0.9 pair set
    * (16 hashes, b=4/r=4 ⇒ ~50% threshold).
    *
    * Shape: all 16 permutation mins — h_j(s) = (a_j·H(s)+b_j) mod p over
    * trigram shingles, H = portable md5-derived hash — are computed as 16
    * aggregates in ONE pass over the shingle rows (no 16× explode), then
    * banded with a 4-row `stack`. One shuffle on doc_id, one on the band
    * bucket.
    */
  def dedupMinhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val minCols = (0 until MinHashK).map { j =>
      min((col("h") * (2 * j + 1) + j * 7919 + 1) % MersennePrime).as(s"mh$j")
    }
    val sigs = shingles(spark, dir)
      .select(col("doc_id"), h32(col("shingle")).as("h"))
      .groupBy(col("doc_id"))
      .agg(minCols.head, minCols.tail: _*)
    val nBands = MinHashK / MinHashBandRows
    val stackArgs = (0 until nBands).map { b =>
      val slots = (0 until MinHashBandRows).map(r => s"mh${b * MinHashBandRows + r}")
      s"${b}L, concat_ws(',', ${slots.mkString(", ")})"
    }.mkString(", ")
    val bands = sigs.selectExpr("doc_id", s"stack($nBands, $stackArgs) as (band, sig)")
    bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** E1 — SimHash: 32-bit weighted sign-sum signature per document.
    * Token counts weight each md5-derived hash's bits; bit b of the
    * signature is set iff the weighted sign-sum at b is positive.
    * Near-dup detection at scale = grouping on signature bands /
    * low-Hamming neighbors; the signature computation is the operator.
    */
  def simhash(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("doc_id"), col("cnt"), h32(col("word")).as("h"),
        explode(expr("sequence(0, 31)")).as("b"))
      .select(col("doc_id"), col("b"),
        (col("cnt") * (expr("shiftright(h, b) % 2") * 2 - 1)).as("contrib"))
      .groupBy(col("doc_id"), col("b"))
      .agg(sum(col("contrib")).as("s"))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("s") > 0, expr("cast(pow(2, b) as long)")).otherwise(lit(0L)))
        .as("simhash"))

  // ---------------------------------------------------------- similarity

  private def toDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** E2 — brute-force cosine top-k: the 10 nearest neighbors of the
    * vec_id=0 embedding. The query vector is a broadcast single row;
    * the dot/norm folds run inside codegen via higher-order functions
    * (no UDF). This is the exact baseline an ANN variant is judged
    * against; it scans once and keeps a 10-element heap per partition
    * (TakeOrderedAndProject).
    */
  def knnBrute(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), toDouble(col("embedding")).as("e"))
    val query = emb.filter(col("vec_id") === 0).select(col("e").as("q"))
    emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(query))
      .withColumn("cos", pround(
        expr("aggregate(zip_with(e, q, (x, y) -> x * y), 0D, (acc, v) -> acc + v)") /
          (sqrt(expr("aggregate(e, 0D, (acc, v) -> acc + v * v)")) *
            sqrt(expr("aggregate(q, 0D, (acc, v) -> acc + v * v)"))), 6))
      .select(col("vec_id"), col("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(10)
  }

  /** E2 — embedding L2 norms (the projection an IVF/LSH index keeps). */
  def embedNorms(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"),
        pround(sqrt(expr("aggregate(transform(embedding, x -> cast(x as double)), 0D, (acc, v) -> acc + v * v)")), 6)
          .as("l2_norm"))

  /** E2 — random-hyperplane LSH bucketing: 8 deterministic pseudo-random
    * hyperplanes (coefficients derived from md5 of (plane, dim)), each
    * vector keyed by its 8-bit sign signature. Output is the bucket
    * histogram — the index structure an ANN probe searches within. A
    * probe then computes exact cosine only inside its bucket (see
    * `graft.ext.Similarity` for the search API).
    */
  /** md5-derived hyperplane coefficient for (plane, dim) — computed once
    * driver-side; bit-identical to the SQL oracle's
    * `('0x'||substr(md5(p||'_'||i),1,8))::BIGINT % 1000 - 500`.
    */
  private def planeCoef(p: Int, i: Int): Double = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${p}_$i".getBytes("UTF-8"))
    val hex8 = digest.take(4).map(b => f"$b%02x").mkString
    (java.lang.Long.parseLong(hex8, 16) % 1000 - 500).toDouble
  }

  def annLshBuckets(spark: SparkSession, dir: String): DataFrame = {
    val sig = (0 until 8).map { p =>
      // hyperplane as a literal coefficient array: zero per-row hashing,
      // the dot product stays a codegen'd fold over the vector column
      val coefs = array((0 until 64).map(i => lit(planeCoef(p, i))): _*)
      val dot = expr(
        s"aggregate(zip_with(embedding, plane_$p, (x, c) -> cast(x as double) * c), 0D, (acc, v) -> acc + v)")
      (coefs, dot, p)
    }
    val planes = sig.foldLeft(Tables.embeddings(spark, dir)) {
      case (df, (coefs, _, p)) => df.withColumn(s"plane_$p", coefs)
    }
    val bucket = sig.map { case (_, dot, p) =>
      when(dot > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
    planes
      .select(col("vec_id"), bucket.as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_vecs"))
  }

  /** E2 — per-label centroid norm: positional average over the vector
    * column (the reduce an IVF index build runs per cluster).
    */
  def embedCentroids(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("label"), posexplode(toDouble(col("embedding"))).as(Seq("i", "v")))
      .groupBy(col("label"), col("i"))
      .agg(avg(col("v")).as("c"))
      .groupBy(col("label"))
      .agg(pround(sqrt(sum(col("c") * col("c"))), 6).as("centroid_norm"))

  // ---------------------------------------------------------- multimodal

  /** Multimodal plumbing — the metadata/typed-binary side: documents as
    * opaque byte payloads with computed metadata (byte length, digest,
    * binary prefix). The real decode (image/audio) is stubbed behind
    * `graft.ext.Multimodal` (libs absent in this environment); the
    * Spark-side schema/partitioning/batching is exercised here and in
    * its spec.
    */
  def multimodalMeta(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        octet_length(col("text")).cast("long").as("n_bytes"),
        md5(col("text")).as("content_digest"),
        substring(col("text"), 1, 8).as("head"))
}
