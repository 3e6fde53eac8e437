package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** VERDICT r14 #5 — the iterative learners are order-deterministic BY
  * CONSTRUCTION, not by noise margin: every gradient/centroid sum
  * accumulates in exact decimal arithmetic (Portable.dsum), so the
  * scheduler-owned partition and merge order cannot move a single bit
  * of the learned values. Each test trains over THREE different
  * physical layouts of the same corpus — one partition (pure
  * sequential), a hash repartition on the id, and a wide row-churning
  * repartition — and asserts bit-identical results (exact Double
  * equality, which for non-NaN values is bit equality).
  */
class DeterminismSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def layouts(df: DataFrame, idCol: String): Seq[DataFrame] = Seq(
    df.repartition(1),
    df.repartition(7, col(idCol)),
    df.repartition(32))

  test("k-means centroids are bit-identical under 3 repartitionings") {
    val emb = graft.Tables.embeddings(spark, sf).drop("label")
    val all = layouts(emb, "vec_id")
      .map(v => Similarity.kmeansCentroids(v, "vec_id", "embedding", 6, 3))
    assert(all(1) == all.head && all(2) == all.head,
      "learned coarse centroids moved under repartitioning")
  }

  test("PQ codebooks (L2 sub-quantizers) are bit-identical under 3 repartitionings") {
    val emb = graft.Tables.embeddings(spark, sf).drop("label")
    val all = layouts(emb, "vec_id")
      .map(v => Similarity.pqCodebooks(v, "vec_id", "embedding",
        dim = 64, m = 4, ksub = 8, iters = 2))
    assert(all(1) == all.head && all(2) == all.head,
      "learned PQ codebooks moved under repartitioning")
  }

  test("SQ8 params and BQ thresholds are bit-identical under 3 repartitionings") {
    val emb = graft.Tables.embeddings(spark, sf).drop("label")
    // sq8: min/max are order-free by algebra; bq: means go through dsum
    val sq8 = layouts(emb, "vec_id")
      .map(v => Similarity.sq8Params(v, "vec_id", "embedding", dim = 64))
    assert(sq8(1) == sq8.head && sq8(2) == sq8.head,
      "SQ8 affine params moved under repartitioning")
    val thr = layouts(emb, "vec_id")
      .map(v => Similarity.bqThresholds(v, "vec_id", "embedding", dim = 64))
    assert(thr(1) == thr.head && thr(2) == thr.head,
      "BQ mean thresholds moved under repartitioning")
  }

  test("LR weights (unigram and bigram) are bit-identical under 3 repartitionings") {
    val docs = graft.Tables.documents(spark, sf)
    for (bigrams <- Seq(false, true)) {
      val all = layouts(docs, "doc_id").map(v =>
        Classifier.train(v, "doc_id", "text", epochs = 2, bigrams = bigrams)
          .as[(Long, Double)].collect().sortBy(_._1).toSeq)
      assert(all(1) == all.head && all(2) == all.head,
        s"trained weights (bigrams=$bigrams) moved under repartitioning")
    }
  }
}
