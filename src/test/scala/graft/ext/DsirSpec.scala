package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** DSIR data selection (Xie 2023) + token-budget mixture construction:
  * the weights must actually rank target-like docs above raw-like ones,
  * both operators must be bit-deterministic under repartitioning (the
  * 100×-cluster property), and the mixture must keep exactly the
  * hash-order prefix that fits each stratum's budget.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  // target corpus speaks "alpha beta gamma"; raw background speaks
  // "noise junk spam"; two probe docs, one in each dialect
  private lazy val docs = {
    val target = (0 until 20).map(i => (i.toLong, "alpha beta gamma alpha beta", "tgt"))
    val bg = (100 until 160).map(i => (i.toLong, "noise junk spam noise junk", "web"))
    val probes = Seq(
      (900L, "alpha beta gamma beta", "web"),   // target-dialect doc in the crawl
      (901L, "noise spam junk spam", "web"))     // background-dialect doc
    (target ++ bg ++ probes).toDF("doc_id", "text", "source")
  }

  test("dsir weights rank target-dialect docs above background docs") {
    val w = Dsir.weights(docs, col("source") === "tgt", "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(w(900L) > 0, s"target-dialect doc should score positive, got ${w(900L)}")
    assert(w(901L) < 0, s"background doc should score negative, got ${w(901L)}")
    assert(w(900L) > w(901L) + 1.0)
  }

  test("weights and gumbel sample are bit-identical across partitionings") {
    def run(parts: Int): Seq[(Long, Long, Double)] =
      Dsir.weights(docs.repartition(parts), col("source") === "tgt",
        "doc_id", "text").as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val a = run(1)
    assert(a == run(7) && a == run(32))
    def sample(parts: Int): Seq[(Long, Double, Double)] =
      Dsir.sampleTopK(
        Dsir.weights(docs.repartition(parts), col("source") === "tgt", "doc_id", "text"),
        "doc_id", "dsir_w", k = 10)
        .as[(Long, Double, Double)].collect().toSeq
    val s = sample(1)
    assert(s.size == 10 && s == sample(13))
  }

  test("bigram features separate templated text where unigram bags are blind") {
    // target cycles "alpha beta gamma"; the background speaks the SAME
    // WORDS in reversed order ("gamma beta alpha") — identical unigram
    // bags, DISJOINT bigram sets (a 2-word alternation would put both
    // orders in every doc). Probe 900 uses target word order, probe
    // 901 background order: the unigram scorer must tie them (bag
    // equality), the bigram scorer must separate them.
    val tpl = {
      val t = (0 until 20).map(i => (i.toLong, "alpha beta gamma alpha beta gamma", "tgt"))
      val bg = (100 until 160).map(i => (i.toLong, "gamma beta alpha gamma beta alpha", "web"))
      val probes = Seq(
        (900L, "alpha beta gamma alpha beta gamma", "web"),
        (901L, "gamma beta alpha gamma beta alpha", "web"))
      (t ++ bg ++ probes).toDF("doc_id", "text", "source")
    }
    def score(bigrams: Boolean): Map[Long, Double] =
      Dsir.weights(tpl, col("source") === "tgt", "doc_id", "text",
        bigrams = bigrams)
        .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    val uni = score(bigrams = false)
    val bi = score(bigrams = true)
    assert(uni(900L) == uni(901L),
      s"unigram bags are identical by construction, got ${uni(900L)} vs ${uni(901L)}")
    assert(bi(900L) > bi(901L) + 1.0,
      s"bigram features must separate word order: ${bi(900L)} vs ${bi(901L)}")
    // and determinism under repartitioning holds for the bigram space
    val again = Dsir.weights(tpl.repartition(13), col("source") === "tgt",
      "doc_id", "text", bigrams = true)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(bi == again)
  }

  test("mixtureByBudget keeps exactly the id-hash-order prefix under each budget") {
    val df = docs.select(col("doc_id"), col("source"),
      size(split(col("text"), " ")).cast("long").as("toks"), col("text"))
    val out = Sampling.mixtureByBudget(df, "source", "doc_id", col("toks"),
      when(col("source") === "tgt", lit(23L)).otherwise(lit(12L)))
      .select("doc_id", "source", "n_tokens", "cum_tokens")
      .as[(Long, String, Long, Long)].collect().toSeq
    // budget respected: running total through every kept doc fits
    out.groupBy(_._2).foreach { case (src, rows) =>
      val budget = if (src == "tgt") 23L else 12L
      assert(rows.map(_._4).max <= budget, s"$src exceeded $budget")
    }
    // tgt docs are 5 tokens each → budget 23 keeps exactly 4 docs
    assert(out.count(_._2 == "tgt") == 4)
    // prefix property: the kept set IS the first-k of the hash order
    val tgtOrder = docs.filter(col("source") === "tgt")
      .select(col("doc_id"), Dedup.h32(col("doc_id").cast("string")).as("h"))
      .as[(Long, Long)].collect().sortBy(r => (r._2, r._1)).map(_._1).toSeq
    assert(out.filter(_._2 == "tgt").map(_._1).toSet == tgtOrder.take(4).toSet)
    // deterministic under repartitioning
    val again = Sampling.mixtureByBudget(df.repartition(17), "source", "doc_id",
      col("toks"), when(col("source") === "tgt", lit(23L)).otherwise(lit(12L)))
      .select("doc_id", "source", "n_tokens", "cum_tokens")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(out.sortBy(_._1) == again.sortBy(_._1))
  }

  test("mixture plan pin: no corpus-side window is keyed by the stratum alone") {
    // the 100 TB property: the running-sum window over corpus rows must
    // be keyed by (stratum, chunk) — a per-stratum-only window would
    // funnel the dominant source through ONE task. The only
    // stratum-only window allowed is the offsets prefix, which sits
    // ABOVE the (stratum, chunk) aggregate and never sees corpus rows.
    import org.apache.spark.sql.catalyst.plans.logical.Window
    val df = docs.select(col("doc_id"), col("source"),
      size(split(col("text"), " ")).cast("long").as("toks"))
    val out = Sampling.mixtureByBudget(df, "source", "doc_id", col("toks"), lit(12L))
    val wins = out.queryExecution.optimizedPlan.collect { case w: Window => w }
    assert(wins.size == 2, s"expected offsets + corpus windows, got ${wins.size}")
    wins.foreach { w =>
      val ordersOnChunk =
        w.orderSpec.map(_.child.references.map(_.name).toSet) == Seq(Set("__mix_c"))
      // the offsets prefix (orders by chunk id, sees ≤ strata·C agg
      // rows) may key on the stratum alone; the corpus-side running
      // sum (orders by hash, id) must carry the chunk in its key
      if (!ordersOnChunk)
        assert(w.partitionSpec.size >= 2,
          s"corpus-side window keyed by ${w.partitionSpec.map(_.sql).mkString(",")} — " +
            "single-stratum window back in the mixture path")
    }
    // and the chunked form still equals the logical single-window spec
    // at a chunk count that forces multi-chunk strata
    val fine = Sampling.mixtureByBudget(df, "source", "doc_id", col("toks"),
        lit(12L), chunks = 4)
      .select("doc_id", "cum_tokens").as[(Long, Long)].collect().sortBy(_._1).toSeq
    val coarse = Sampling.mixtureByBudget(df, "source", "doc_id", col("toks"),
        lit(12L), chunks = 1)
      .select("doc_id", "cum_tokens").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(fine == coarse, "chunked prefix sum diverged from the single-chunk form")
  }
}
