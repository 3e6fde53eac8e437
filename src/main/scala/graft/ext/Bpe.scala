package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding merge learning and encoding (Sennrich
  * et al. 2016, "Neural Machine Translation of Rare Words with Subword
  * Units") — the real-tokenizer depth behind [[TextStats.bpeTokenVocab]]
  * (which stops at pre-tokenization + vocabulary counting).
  *
  * Reference: n/a — jetstream has no text stack; this is a north-star
  * (BASELINE.json) training-data-pipeline operator.
  *
  * == Algorithm, Spark-first ==
  *
  * Learning operates on the pre-tokenized WORD-FREQUENCY vocabulary,
  * never the raw corpus — the classical BPE trick that makes the loop
  * cheap: a 100 TB corpus folds to its distinct pre-tokens (sub-billion
  * rows) in one aggregation, and every merge round after that is
  *
  *   1. one partial-aggregated pair count over the vocab
  *      (explode adjacent symbol pairs weighted by word frequency), and
  *   2. a 1-row argmax collect (max count, ties to the lexicographically
  *      smallest pair — deterministic), the [[Similarity.kmeansCentroids]]
  *      driver-loop shape already adjudicated for K-row collects.
  *
  * Words are carried as SPACE-DELIMITED symbol strings with sentinel
  * spaces (`" l o w "`): symbols are pre-token substrings, so they can
  * never contain a space, making the encoding unambiguous, and a merge
  * (l, r) → lr is a plain string `replace(" l r ", " lr ")` — a
  * codegen'd built-in, no UDF.
  *
  * == Greedy application ==
  *
  * For a merge with `lhs != rhs`: one `replace` pass is greedy
  * left-to-right but misses an occurrence whose LEADING sentinel space
  * was consumed by the immediately preceding match. Such misses are
  * never adjacent to each other (a miss requires its left neighbor to
  * have MATCHED), so after one pass every miss has both its spaces
  * intact and a second pass catches them all: two passes are exact
  * greedy left-to-right application, the subword-nmt encode order.
  *
  * For a SELF-PAIR merge (`lhs == rhs`) the two-pass argument breaks:
  * in a run `" a a a a a "` pass 1's scan resumes past the consumed
  * sentinel space and pairs the wrong symbols (`[aa, a, aa]` instead of
  * greedy `[aa, aa, a]`), and no number of further passes can repair a
  * mispaired run. Self-pairs instead use ONE `regexp_replace` pass whose
  * pattern leaves the trailing sentinel space unconsumed via a
  * lookahead (`"\Q a a\E(?= )"` → `" aa"`): the scan resumes AT the
  * shared space, so runs pair strictly left-to-right — exact greedy.
  * The branch is taken at DRIVER time (merge pairs are driver values),
  * so each word still flows through one codegen'd projection.
  *
  * The DuckDB oracle cannot use the lookahead (RE2 dialect), so it
  * applies every round with an equivalent uniform formulation: a
  * `list_reduce` over the symbol list that appends symbol `x` to the
  * accumulator, fusing it into the trailing token when that token is
  * exactly `lhs` and `x = rhs`. A fused trailing token becomes
  * `lhs||rhs`, which can never equal `lhs` again (rhs is non-empty), so
  * a merged pair is never reused as the left element within a round —
  * the same non-overlapping left-to-right greedy order as the scan
  * form, for self-pairs and ordinary pairs alike (BpeSpec pins the
  * scan/reduce equivalence property and the run fixtures on both
  * sides).
  *
  * == Production k: checkpoint cadence + iterative encode ==
  *
  * The learning loop re-derives round r's tokenization by re-applying
  * the merges learned since the last MATERIALIZATION to the vocabulary.
  * Every [[CheckpointEveryMerges]] rounds the re-tokenized vocab is
  * localCheckpoint'ed (it is the DISTINCT-WORD table — small — never
  * the corpus) and the pending fold resets, so per-round cost is
  * bounded by O(cadence·|vocab|) and the codegen tree never exceeds
  * cadence depth: per-round time stays flat at k in the thousands
  * instead of the unbounded-fold O(k²·|vocab|) (ScaleSmoke `bpe`
  * measures this at k=500). At the oracle-gated k the cadence never
  * fires and the plan is the same single fold as before.
  *
  * Encoding with a production-sized merge table cannot be a k-deep
  * column fold (the expression tree grows with k and Catalyst's
  * project-collapse would re-inline any staged form): above
  * [[FoldEncodeMaxMerges]] merges, [[withEncoded]] switches to an
  * equivalent JVM encoder — per word, apply merges in rank order, each
  * one exact-greedy left-to-right (IDENTICAL semantics to the fold,
  * pinned by BpeSpec's cross-path equivalence test), with a
  * symbol-presence skip (a merge whose lhs or rhs is not among the
  * word's current symbols cannot apply) and a per-executor memo on
  * distinct words (the same distinct-word collapse the learner uses:
  * at 100 TB most words repeat, so the encoder is one narrow map-only
  * stage whose per-row cost is a hash probe). No shuffle on either
  * path.
  */
object Bpe {

  /** Pre-tokenization split — identical to [[TextStats.bpeTokenVocab]]
    * (letter runs, single digits, any other non-space symbol).
    */
  val PreTokenPattern = "([a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s])"

  /** One learned merge rule: at `rank`, symbols `lhs` + `rhs` fuse;
    * `pairCount` is the (word-frequency-weighted) adjacent-pair count
    * that won the round.
    */
  final case class Merge(rank: Int, lhs: String, rhs: String, pairCount: Long)

  /** Pre-tokenized word-frequency vocabulary: (word, freq). */
  def wordVocab(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(regexp_extract_all(col(textCol), lit(PreTokenPattern), lit(0)))
        .as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("freq"))

  /** `"low"` → `" l o w "` — sentinel-spaced initial character symbols. */
  private def spacedSyms(word: Column): Column =
    concat(lit(" "), array_join(split(word, ""), " "), lit(" "))

  /** The spaced `(s, freq)` vocabulary frame [[learnMerges]] loops over
    * — factored out for the spec's forced-path twins (driver vs
    * distributed equivalence pin).
    */
  private[ext] def spacedVocab(df: DataFrame, textCol: String): DataFrame =
    wordVocab(df, textCol).select(spacedSyms(col("word")).as("s"), col("freq"))

  /** Exact greedy left-to-right application of one merge (see the
    * two-pass and self-pair arguments in the object doc). `lhs`/`rhs`
    * are driver values, so the self-pair branch costs nothing at plan
    * time.
    */
  private def applyMerge(s: Column, lhs: String, rhs: String): Column =
    if (lhs == rhs) {
      val pat = java.util.regex.Pattern.quote(s" $lhs $rhs") + "(?= )"
      val rep = java.util.regex.Matcher.quoteReplacement(s" $lhs$rhs")
      regexp_replace(s, lit(pat), lit(rep))
    } else {
      val pat = lit(s" $lhs $rhs ")
      val rep = lit(s" $lhs$rhs ")
      replace(replace(s, pat, rep), pat, rep)
    }

  /** Adjacent symbol pairs of a spaced symbol string, as an array of
    * (l, r) structs — empty for single-symbol words.
    */
  private def adjacentPairs(s: Column): Column = {
    val sp = split(trim(s), " ")
    zip_with(
      slice(sp, lit(1), size(sp) - 1),
      slice(sp, lit(2), size(sp) - 1),
      (l, r) => struct(l.as("l"), r.as("r")))
  }

  /** Materialization cadence for [[learnMerges]]: after this many
    * pending merges the re-tokenized vocab is localCheckpoint'ed and
    * the fold resets (see the production-k section of the object doc).
    */
  val CheckpointEveryMerges = 50

  /** Fold-encode ceiling for [[withEncoded]]: at or below this many
    * merges the encode is the codegen'd column fold (the oracle-gated
    * plan); above it, the equivalent memoized JVM encoder (expression
    * depth would otherwise grow with k).
    */
  val FoldEncodeMaxMerges = 64

  /** Vocab-row gate for the DRIVER-side learn in [[learnMerges]]: a
    * pre-token vocabulary at or under this many distinct words is
    * collected once and the merge loop runs in-memory — the classical
    * BPE learner (Sennrich et al. 2016 learn over the word-frequency
    * table, with incremental pair-count maintenance), and the same
    * size-gated driver-path shape as [[Dedup.connectedComponents]]'
    * union-find (collect the provably SMALL product, never the corpus).
    * Why: each distributed round is one aggregate + argmax collect —
    * 2 Spark jobs + a fresh plan analysis/codegen per round, ~150-250 ms
    * of fixed cost per merge regardless of data size, k rounds deep and
    * inherently sequential. Driver-side the k=12 oracle-gated learn is
    * sub-millisecond per round. At ~1M rows the collect is ≤ ~150 MB;
    * above the gate the distributed loop below is unchanged (the path a
    * 100 TB corpus' sub-billion-row vocabulary takes). Both paths are
    * merge-for-merge identical (BpeSpec pins the equivalence, incl. the
    * self-pair run and astral-plane fixtures).
    */
  val DriverLearnMaxVocab = 1000000

  /** Learn up to `k` merges over `df.textCol`'s pre-token vocabulary.
    * Stops early if no adjacent pair remains (every word fused to one
    * symbol). Deterministic: ties break to the lexicographically
    * smallest (lhs, rhs) in UTF-8 byte order — Spark's string ordering,
    * reproduced exactly by the driver path. `checkpointEvery` bounds
    * both the per-round re-apply cost and the expression depth (object
    * doc); the result is identical at any cadence — materialization
    * only changes WHERE the already-applied fold is evaluated, never
    * its value (BpeSpec pins cadence-invariance).
    */
  def learnMerges(df: DataFrame, textCol: String, k: Int,
      checkpointEvery: Int = CheckpointEveryMerges,
      onRound: (Int, Double) => Unit = (_, _) => ()): Seq[Merge] = {
    require(k >= 1, "k must be positive")
    require(checkpointEvery >= 1, "checkpointEvery must be positive")
    // one capped action both sizes the vocab and, under the gate, IS the
    // full vocab (the connectedComponents probe shape): the driver path
    // then runs the whole loop with zero further Spark jobs
    val vocabDf = spacedVocab(df, textCol)
    val probe = vocabDf.limit(DriverLearnMaxVocab + 1).collect()
    if (probe.length <= DriverLearnMaxVocab)
      return learnMergesDriver(
        probe.map(r => (r.getString(0), r.getLong(1))), k, onRound)
    learnMergesDistributed(vocabDf, k, checkpointEvery, onRound)
  }

  /** The distributed merge loop — the above-the-gate path, and the
    * spec's forced-path twin for the driver/distributed equivalence pin.
    */
  private[ext] def learnMergesDistributed(vocabDf: DataFrame, k: Int,
      checkpointEvery: Int = CheckpointEveryMerges,
      onRound: (Int, Double) => Unit = (_, _) => ()): Seq[Merge] = {
    var vocab = vocabDf.cache()
    try {
      val out = scala.collection.mutable.ArrayBuffer.empty[Merge]
      var symExpr: Column = col("s")
      var pending = 0
      var exhausted = false
      while (out.length < k && !exhausted) {
        val tRound = System.nanoTime()
        // The pending-merge fold is FENCED behind its own projection:
        // [[adjacentPairs]] references its input four times (size ×2,
        // slice ×2 over the split), and CollapseProject would inline
        // the r-merge fold into every reference — a ~4-6× larger
        // expression tree for the round's analysis/codegen and up to
        // four fold evaluations per row. The fence pins "fold once,
        // then reference the attribute" (graft.plans.Fence doc).
        val top = graft.plans.Fence.wrap(
            vocab.select(symExpr.as("__sy"), col("freq")))
          .select(explode(adjacentPairs(col("__sy"))).as("p"), col("freq"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum(col("freq")).as("cnt"))
          .orderBy(col("cnt").desc, col("l"), col("r"))
          .limit(1)
          .collect()
        onRound(out.length + 1, (System.nanoTime() - tRound) / 1e9)
        if (top.isEmpty) exhausted = true
        else {
          val row = top(0)
          val m = Merge(out.length + 1, row.getString(0), row.getString(1), row.getLong(2))
          out += m
          symExpr = applyMerge(symExpr, m.lhs, m.rhs)
          pending += 1
          if (pending >= checkpointEvery && out.length < k) {
            // materialize the re-tokenized DISTINCT-WORD table (small)
            // and reset the fold: rounds after this re-apply at most
            // `checkpointEvery` merges instead of all of them
            val next = vocab.select(symExpr.as("s"), col("freq"))
              .localCheckpoint(true)
            vocab.unpersist()
            vocab = next
            symExpr = col("s")
            pending = 0
          }
        }
      }
      out.toSeq
    } finally { vocab.unpersist(); () }
  }

  /** Spark's string sort order is unsigned UTF-8 byte order
    * (UTF8String.compareTo), which differs from Java's UTF-16
    * `String.compareTo` for supplementary-plane symbols — the driver
    * learn's tiebreak must reproduce it exactly (BpeSpec's astral-plane
    * fixture covers the divergence).
    */
  private def utf8Less(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    x.length < y.length
  }

  /** Below-the-gate in-memory learn over the collected `(spaced syms,
    * freq)` vocabulary — the classical fast BPE learner: pair counts
    * maintained INCREMENTALLY (a merge re-indexes only the words the
    * winning pair occurs in, via the pair → word-index posting sets),
    * so k rounds cost O(k · affected words), not k full vocab scans.
    * Merge application is [[greedyPass]] — the exact same routine the
    * iterative encoder uses, already pinned equivalent to the column
    * fold (BpeSpec cross-path equivalence) — and the argmax breaks
    * count ties to the UTF-8-byte-smallest (lhs, rhs), Spark's string
    * order. Long counts are exact integers on both paths, so the merge
    * sequences are identical by induction: same tokenization → same
    * pair counts → same argmax → same greedy application.
    */
  private[ext] def learnMergesDriver(vocab: Array[(String, Long)], k: Int,
      onRound: (Int, Double) => Unit = (_, _) => ()): Seq[Merge] = {
    val words = vocab.map { case (s, _) =>
      val t = s.trim
      if (t.isEmpty) Array.empty[String] else t.split(" ")
    }
    val freqs = vocab.map(_._2)
    val counts = new java.util.HashMap[(String, String), Long]()
    // posting sets: pair -> indexes of words where it occurs adjacently
    // (kept as a superset — stale members no-op at apply time)
    val postings = new java.util.HashMap[(String, String), java.util.BitSet]()
    def reindex(i: Int, sign: Long): Unit = {
      val w = words(i)
      var j = 0
      while (j + 1 < w.length) {
        val p = (w(j), w(j + 1))
        val c = counts.getOrDefault(p, 0L) + sign * freqs(i)
        if (c == 0L) counts.remove(p) else counts.put(p, c)
        if (sign > 0)
          postings.computeIfAbsent(p, _ => new java.util.BitSet()).set(i)
        j += 1
      }
    }
    var i = 0
    while (i < words.length) { reindex(i, 1L); i += 1 }
    val out = scala.collection.mutable.ArrayBuffer.empty[Merge]
    while (out.length < k && !counts.isEmpty) {
      val tRound = System.nanoTime()
      var bestP: (String, String) = null
      var bestC = Long.MinValue
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c = e.getValue
        if (c > bestC || (c == bestC && {
          val p = e.getKey
          utf8Less(p._1, bestP._1) ||
            (p._1 == bestP._1 && utf8Less(p._2, bestP._2))
        })) { bestC = c; bestP = e.getKey }
      }
      val affected = postings.remove(bestP)
      if (affected != null) {
        var w = affected.nextSetBit(0)
        while (w >= 0) {
          // stale members (the pair no longer adjacent there) subtract
          // and re-add identical contributions — a no-op by arithmetic
          reindex(w, -1L)
          words(w) = greedyPass(words(w), bestP._1, bestP._2)
          reindex(w, 1L)
          w = affected.nextSetBit(w + 1)
        }
      }
      out += Merge(out.length + 1, bestP._1, bestP._2, bestC)
      onRound(out.length, (System.nanoTime() - tRound) / 1e9)
    }
    out.toSeq
  }

  /** The learned merge table as a DataFrame:
    * (merge_rank, lhs, rhs, pair_count).
    */
  def mergeTable(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.toDF()
      .select(col("rank").as("merge_rank"), col("lhs"), col("rhs"),
        col("pairCount").as("pair_count"))
  }

  /** Encode `textCol` with a learned merge table: pre-tokenize, apply
    * the merges to each word in rank order (each one exact-greedy), and
    * emit the space-joined token stream plus its token count. One
    * narrow codegen'd projection — the 100 TB path is a map-only stage.
    */
  def encode(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge]): DataFrame =
    withEncoded(df, textCol, merges).select(col(idCol), col("tokens"), col("n_tokens"))

  /** Per-executor memo for the iterative encoder: distinct word →
    * encoded symbol string, shared across the tasks of one encode call
    * (keyed by a driver-generated call id). Bounded two ways per call —
    * entry count AND approximate chars (long words can't outgrow the
    * count cap) — and the registry evicts least-recently-used CALLS
    * past 8 live memos, so a concurrent in-flight encode keeps its
    * memo while stale calls' memos go.
    */
  private object WordMemo {
    val MaxEntries = 2000000
    /** Approximate char budget per memo (~256 MB of String payload at 2
      * bytes/char) — the byte-aware bound ADVICE r13 asked for: entry
      * count alone lets 2M long words pressure executor heap.
      */
    val MaxChars = 128L * 1024 * 1024
    final class Memo {
      val map = new java.util.concurrent.ConcurrentHashMap[String, String]()
      val chars = new java.util.concurrent.atomic.AtomicLong
      def get(word: String): String = map.get(word)
      def put(word: String, enc: String): Unit =
        if (map.size < MaxEntries && chars.get() < MaxChars) {
          if (map.putIfAbsent(word, enc) == null) {
            chars.addAndGet(word.length.toLong + enc.length.toLong); ()
          }
        }
    }
    private val memos = new java.util.concurrent.ConcurrentHashMap[String, Memo]()
    private val lastUse = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
    private val lastUseMs = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
    private val tick = new java.util.concurrent.atomic.AtomicLong
    /** A call idle longer than this is presumed finished and evictable.
      * [[forCall]] runs per WORD, so an in-flight encode refreshes its
      * recency continuously — it can only look idle if a single word
      * takes multiple seconds to encode, which production-k skip-probing
      * makes implausible.
      */
    val IdleEvictMs = 10000L
    /** Fetch (or create) the memo for one encode call. Above 8 live
      * calls, evict the LEAST-RECENTLY-USED other calls' memos down to
      * the cap — never the whole registry (ADVICE r13: `clear()` wiped
      * concurrent in-flight encodes' memos, a thundering recompute) and
      * NEVER a call used within [[IdleEvictMs]] (ADVICE r14: with > 8
      * concurrent encodes, pure LRU let peers evict each other's LIVE
      * memos, a bounded recompute storm; the racily-read size also let
      * concurrent evictions overshoot — both now only ever hit idle
      * calls). The 8-cap is therefore soft: with more than 8 genuinely
      * concurrent encodes the registry holds one memo per LIVE call —
      * bounded by real concurrency, which is the correct bound.
      * Ordering among evictable (idle) calls is the monotonic counter,
      * not wall time, so two calls idle since the same millisecond
      * still order.
      */
    def forCall(id: String): Memo = {
      lastUse.put(id, java.lang.Long.valueOf(tick.incrementAndGet()))
      val nowMs = System.currentTimeMillis()
      val prevMs = lastUseMs.get(id)
      if (prevMs == null || nowMs - prevMs.longValue > 1000L)
        lastUseMs.put(id, java.lang.Long.valueOf(nowMs))
      if (memos.size > 8) {
        import scala.jdk.CollectionConverters._
        val horizon = nowMs - IdleEvictMs
        val excess = memos.size - 8
        memos.keySet.asScala.filter(_ != id).toSeq
          // evict only provably-idle calls; a missing ms entry is a
          // just-created peer mid-registration — keep it
          .filter(k => Option(lastUseMs.get(k)).exists(_.longValue < horizon))
          .sortBy(k => Option(lastUse.get(k)).map(_.longValue).getOrElse(0L))
          .take(excess)
          .foreach { k => memos.remove(k); lastUse.remove(k); lastUseMs.remove(k) }
      }
      memos.computeIfAbsent(id, _ => new Memo)
    }
  }

  /** Rank-order greedy JVM encoder — semantics identical to the column
    * fold (BpeSpec cross-path equivalence), for merge tables too large
    * to fold into an expression tree. Serializable; the memo is fetched
    * per-executor through [[WordMemo]] by `callId`.
    */
  /** One exact greedy left-to-right application of merge (l, r) over a
    * symbol array — shared by the iterative encoder AND the driver-side
    * learner (same routine, same pinned equivalence to the column fold).
    */
  private[ext] def greedyPass(syms: Array[String], l: String, r: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) { out += (l + r); i += 2 }
      else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  private final class IterativeEncoder(merges: Seq[Merge], callId: String)
      extends Serializable {
    private def encodeUncached(word: String): String = {
      // initial symbols: one per CODE POINT — Spark's split(w, "")
      // never splits inside a surrogate pair, while Java String.split
      // does (caught by BpeSpec's astral-plane fixture)
      var syms = word.codePoints().toArray
        .map(cp => new String(Character.toChars(cp)))
      val present = scala.collection.mutable.HashSet.empty[String]
      present ++= syms
      merges.foreach { m =>
        // a merge whose lhs or rhs is not a current symbol cannot form
        // an adjacent pair — the skip that makes production-k O(k) hash
        // probes per DISTINCT word, not k greedy passes
        if (present.contains(m.lhs) && present.contains(m.rhs)) {
          val merged = greedyPass(syms, m.lhs, m.rhs)
          if (merged.length != syms.length) {
            syms = merged
            present.clear(); present ++= syms
          }
        }
      }
      syms.mkString(" ")
    }
    def encodeWord(word: String): String = {
      val memo = WordMemo.forCall(callId)
      val hit = memo.get(word)
      if (hit != null) hit
      else {
        val enc = encodeUncached(word)
        memo.put(word, enc)
        enc
      }
    }
  }

  /** Passthrough form of [[encode]]: appends `tokens` and `n_tokens` to
    * the input's columns — the shape downstream stages (token-budget
    * packing, shard accounting) consume without a join back. At or
    * below [[FoldEncodeMaxMerges]] merges this is the codegen'd column
    * fold; above it, the memoized JVM encoder (object doc) — both one
    * narrow map-only projection, no shuffle.
    */
  def withEncoded(df: DataFrame, textCol: String, merges: Seq[Merge]): DataFrame =
    withEncodedPath(df, textCol, merges, merges.length > FoldEncodeMaxMerges)

  /** Path-forced twin of [[withEncoded]] — the spec's cross-path
    * equivalence hook.
    */
  private[ext] def withEncodedPath(df: DataFrame, textCol: String,
      merges: Seq[Merge], iterative: Boolean): DataFrame = {
    val ws = regexp_extract_all(col(textCol), lit(PreTokenPattern), lit(0))
    val tokensCol =
      if (!iterative) {
        val tokWords = transform(ws, w =>
          trim(merges.foldLeft(spacedSyms(w))((s, m) => applyMerge(s, m.lhs, m.rhs))))
        array_join(tokWords, " ")
      } else {
        val enc = new IterativeEncoder(merges, java.util.UUID.randomUUID().toString)
        val encodeWords = udf((words: Seq[String]) =>
          if (words == null) null else words.map(enc.encodeWord).mkString(" "))
        encodeWords(ws)
      }
    df.withColumn("__nw", size(ws))
      .withColumn("tokens", tokensCol)
      .withColumn("n_tokens",
        when(col("__nw") === 0, lit(0L))
          .otherwise(size(split(col("tokens"), " ")).cast("long")))
      .drop("__nw")
  }

  // ------------------------------------------------------------- oracle

  /** One oracle-side greedy application round: `list_reduce` over the
    * symbol list of `expr`, fusing symbol x into the trailing token when
    * that token is exactly `l` and x = `r` (see the reduce-greedy
    * argument in the object doc). NULL l/r (exhausted pair CTE) makes
    * the fuse condition NULL → every symbol appends → no-op, matching
    * learnMerges' early stop. RE2-safe: no lookahead, no regex at all.
    */
  private def reduceRound(expr: String, l: String, r: String): String =
    s"' ' || list_reduce(string_split(trim($expr), ' '), " +
      s"(acc, x) -> CASE WHEN x = $r AND ends_with(' ' || acc, ' ' || $l) " +
      s"THEN acc || $r ELSE acc || ' ' || x END) || ' '"

  /** The shared learning CTE chain for the DuckDB oracle — the same
    * algorithm unrolled: w0 is the spaced vocab, round i picks pair p_i
    * (argmax with the same tiebreak) and w_i applies it with the
    * uniform reduce-greedy round (exact for self-pairs, where the old
    * two-pass replace mispaired runs — ADVICE r12). CTEs are
    * MATERIALIZED: DuckDB inlines CTEs by default and each round
    * references its predecessor several times, so the default would
    * re-evaluate the chain exponentially.
    */
  private def learnCtes(k: Int): String = {
    val sb = new StringBuilder
    // nums spans the LONGEST word's symbol count (its char count bounds
    // every later round) — a fixed cap here would silently truncate
    // pair extraction for words longer than it, diverging from Spark
    sb ++= s"""vocab AS MATERIALIZED (SELECT token AS word, count(*)::BIGINT AS freq FROM (
      |  SELECT unnest(regexp_extract_all(text, '([a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s])')) AS token
      |  FROM documents) GROUP BY 1),
      |nums AS MATERIALIZED (SELECT CAST(u AS BIGINT)+1 AS n FROM (
      |  SELECT unnest(range(0, (SELECT coalesce(max(len(string_split(word, ''))), 1)
      |                          FROM vocab))) AS u)),
      |w0 AS MATERIALIZED (SELECT ' ' || array_to_string(string_split(word, ''), ' ') || ' ' AS s, freq FROM vocab)""".stripMargin
    for (i <- 1 to k) {
      // LEFT JOIN ON TRUE: an exhausted p_i (no pairs left) yields NULL
      // l/r, which makes the reduce round a no-op — learnMerges' stop
      val round = reduceRound("s", s"p$i.l", s"p$i.r")
      sb ++= s""",
        |p$i AS MATERIALIZED (SELECT sp[n] AS l, sp[n+1] AS r, sum(freq)::BIGINT AS cnt
        |  FROM (SELECT string_split(trim(s), ' ') AS sp, freq FROM w${i - 1}), nums
        |  WHERE n <= len(sp) - 1 GROUP BY 1, 2 ORDER BY cnt DESC, l, r LIMIT 1),
        |w$i AS MATERIALIZED (SELECT $round AS s, freq
        |  FROM w${i - 1} LEFT JOIN p$i ON TRUE)""".stripMargin
    }
    sb.result()
  }

  /** Oracle SQL equivalent of learnMerges(k) + [[mergeTable]]. */
  def mergesOracleSql(k: Int): String =
    "WITH " + learnCtes(k) + "\nSELECT * FROM (" +
      (1 to k).map(i =>
        s"SELECT $i AS merge_rank, l AS lhs, r AS rhs, cnt AS pair_count FROM p$i")
        .mkString(" UNION ALL ") +
      ") ORDER BY merge_rank"

  /** Oracle SQL equivalent of learnMerges(k) + [[encode]] over the
    * documents table.
    */
  def encodeOracleSql(k: Int): String = {
    val pats = (1 to k).map(i =>
      s"(SELECT l FROM p$i) AS l$i, (SELECT r FROM p$i) AS r$i").mkString(", ")
    var chain = "' ' || array_to_string(string_split(w, ''), ' ') || ' '"
    for (i <- 1 to k)
      chain = reduceRound(chain, s"l$i", s"r$i")
    s"""WITH ${learnCtes(k)},
       |pats AS MATERIALIZED (SELECT $pats),
       |docw AS (SELECT doc_id, regexp_extract_all(text, '([a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s])') AS ws FROM documents)
       |SELECT doc_id,
       |  array_to_string(list_transform(ws, w -> trim($chain)), ' ') AS tokens,
       |  (CASE WHEN len(ws)=0 THEN 0
       |        ELSE len(string_split(array_to_string(list_transform(ws, w -> trim($chain)), ' '), ' '))
       |   END)::BIGINT AS n_tokens
       |FROM docw, pats""".stripMargin
  }

  /** Oracle SQL for token-budget packing over REAL learned-BPE counts:
    * the same learn + encode chain, then the contiguous running-sum
    * pack assignment of `TextStats.sequencePackBy`.
    */
  def packOracleSql(k: Int, budget: Long): String = {
    val pats = (1 to k).map(i =>
      s"(SELECT l FROM p$i) AS l$i, (SELECT r FROM p$i) AS r$i").mkString(", ")
    var chain = "' ' || array_to_string(string_split(w, ''), ' ') || ' '"
    for (i <- 1 to k)
      chain = reduceRound(chain, s"l$i", s"r$i")
    s"""WITH ${learnCtes(k)},
       |pats AS MATERIALIZED (SELECT $pats),
       |docw AS (SELECT doc_id, source, regexp_extract_all(text, '([a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s])') AS ws FROM documents),
       |enc AS (SELECT doc_id, source,
       |  (CASE WHEN len(ws)=0 THEN 0
       |        ELSE len(string_split(array_to_string(list_transform(ws, w -> trim($chain)), ' '), ' '))
       |   END)::BIGINT AS n_tokens
       |  FROM docw, pats)
       |SELECT source, doc_id, n_tokens,
       |  ((sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |    - n_tokens) // $budget)::BIGINT AS pack_id
       |FROM enc""".stripMargin
  }
}
