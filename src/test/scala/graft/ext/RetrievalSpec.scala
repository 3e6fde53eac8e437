package graft.ext

import graft.SparkSpec

/** Semantics tests for the retrieval operators on hand-checkable
  * corpora, plus the plan properties that make them scale (bounded
  * postings, top-k without a global sort).
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = Seq(
    (1L, "the cat sat"),
    (2L, "the the dog"),
    (3L, "a rare word"),
  ).toDF("doc_id", "text")

  test("bigramLogProb: add-one-smoothed transition NLL, hand-computed; short docs keep rows") {
    val docs = Seq((1L, "a b a b"), (2L, "a")).toDF("doc_id", "text")
    // bigrams: (a,b)x2 (b,a)x1; c(a)=2 c(b)=1; V = |{a,b}| = 2
    // doc1 NLL = mean(-ln(3/4), -ln(2/3), -ln(3/4))
    val exp = math.floor(
      ((-math.log(3.0 / 4) - math.log(2.0 / 3) - math.log(3.0 / 4)) / 3) * 1e4 + 0.5) / 1e4
    val out = Retrieval.bigramLogProb(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), Option(r.get(2))))).toMap
    assert(out(1L) == ((3L, Some(exp))))
    assert(out(2L) == ((0L, None)), "a 1-word doc has no transitions, keeps its row")
  }

  test("phraseSearch: exact consecutive match, overlaps counted, order matters") {
    val docs = Seq(
      (1L, "big data table scan"), // one occurrence
      (2L, "data table data table"), // two occurrences
      (3L, "table data"), // reversed: no match
      (4L, "data big table"), // not consecutive: no match
      (5L, "a a a")) // self-overlap fixture for ("a","a")
      .toDF("doc_id", "text")
    val hits = Retrieval.phraseSearch(docs, "doc_id", "text", Seq("data", "table"))
      .as[(Long, Long)].collect().toMap
    assert(hits == Map(1L -> 1L, 2L -> 2L))
    // self-overlapping occurrences count (postings semantics)
    val aa = Retrieval.phraseSearch(docs, "doc_id", "text", Seq("a", "a"))
      .as[(Long, Long)].collect().toMap
    assert(aa == Map(5L -> 2L))
    // 3-word phrase anchors align across two joins
    val tri = Retrieval.phraseSearch(docs, "doc_id", "text", Seq("big", "data", "table"))
      .as[(Long, Long)].collect().toMap
    assert(tri == Map(1L -> 1L))
    // single-word phrase degenerates to term occurrence counts
    val one = Retrieval.phraseSearch(docs, "doc_id", "text", Seq("data"))
      .as[(Long, Long)].collect().toMap
    assert(one == Map(1L -> 1L, 2L -> 2L, 3L -> 1L, 4L -> 1L))
  }

  test("invertedIndex: df, tf, and ordered postings") {
    val idx = Retrieval.invertedIndex(corpus, "doc_id", "text")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(idx("the") == ((3L, 2L, "1,2"))) // 3 occurrences across docs 1,2
    assert(idx("cat") == ((1L, 1L, "1")))
    assert(idx("rare") == ((1L, 1L, "3")))
    assert(idx.size == 7) // the cat sat dog a rare word
  }

  test("invertedIndex: postings cap bounds per-token state BEFORE collecting") {
    val many = (1L to 30L).map(i => (i, "tok")).toDF("doc_id", "text")
    val rows = Retrieval.invertedIndex(many, "doc_id", "text", maxPostings = 10).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("df") == 30L)
    assert(rows.head.getAs[String]("postings") == (1L to 10L).mkString(","))
  }

  test("bm25TopK: more query-term mass ranks higher; non-matching docs absent") {
    val top = Retrieval.bm25TopK(corpus, "doc_id", "text", terms = Seq("the"))
      .as[(Long, Double)].collect()
    // doc 3 contains no query term → absent; doc 2 has tf=2 vs doc 1 tf=1
    // at equal length → higher score
    assert(top.map(_._1).toSeq == Seq(2L, 1L))
    assert(top(0)._2 > top(1)._2)
  }

  test("bm25TopK plans as TakeOrderedAndProject (per-partition heaps)") {
    val df = Retrieval.bm25TopK(corpus, "doc_id", "text", terms = Seq("the"))
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"got:\n$plan")
  }

  test("unigramLogProb: all-rare docs carry higher mean NLL; uniform doc exact") {
    val out = Retrieval.unigramLogProb(corpus, "doc_id", "text")
      .as[(Long, Long, Double)].collect()
      .map { case (id, n, nll) => id -> ((n, nll)) }.toMap
    assert(out(1)._1 == 3L && out(3)._1 == 3L)
    // doc 3 is three singleton tokens over a 9-token corpus: NLL = ln 9
    val expected = math.floor(math.log(9.0) * 1e4 + 0.5) / 1e4
    assert(out(3)._2 == expected)
    // doc 1 contains 'the' (count 3) → strictly easier than doc 3
    assert(out(1)._2 < out(3)._2)
    assert(out(2)._2 < out(3)._2)
  }
}
