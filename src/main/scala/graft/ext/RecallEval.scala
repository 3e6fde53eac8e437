package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** ANN quality evaluation: recall@k of the approximate probes (LSH
  * bucket probe at 1..p probes, IVF at nprobe 1..2, plus the learned
  * k-means quantizer) against the exact brute-force ranking, averaged
  * over a query sample — the standard accuracy/cost curve an ANN
  * deployment is tuned on. This is an eval TOOL (driver-side loop over
  * a small query sample, one small job per query), not a data-path
  * operator.
  *
  * Usage: runMain graft.ext.RecallEval [sfDir|clustered] [nQueries] [k]
  *
  * `clustered` swaps the corpus for the planted-cluster fixture
  * ([[ClusterFixture]], 2000 vecs / 32 dims / 16 clusters) — data with
  * actual neighbor structure, where absolute recall is meaningful; the
  * driver's near-uniform embeddings are the adversarial case (recall
  * capped ~0.5 by construction, knobs still monotone).
  */
object RecallEval {

  /** recall@k of `approx` vs `exact` id rankings. */
  def recall(exact: Seq[Long], approx: Seq[Long]): Double =
    if (exact.isEmpty) 1.0
    else approx.toSet.intersect(exact.toSet).size.toDouble / exact.size

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val nQueries = args.drop(1).headOption.map(_.toInt).getOrElse(20)
    val k = args.drop(2).headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = (if (dir == "clustered")
      ClusterFixture.clustered(spark, n = 2000, dims = 32, k = 16)
    else Tables.embeddings(spark, dir)).cache()
    val dims = emb.select(size(col("embedding"))).head().getInt(0)
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id"), Similarity.toDoubleArr(col("embedding")).as("q"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq)

    def ids(df: DataFrame): Seq[Long] = df.select(col("vec_id")).collect().map(_.getLong(0)).toSeq

    // LSH planes sized by the library's own rule: enough buckets that a
    // probe still yields ≳targetBucketSize candidates — a fixed plane
    // count would give ~corpus/2^8 per bucket and cap recall at
    // bucketSize/k regardless of data
    val nPlanes = Similarity.planesFor(emb.count(), targetBucketSize = 64)
    // the learned coarse quantizer, trained once on the whole corpus
    // (the build-time step); per-query assignment reuses its centroids
    val nCells = math.max(4, math.ceil(math.sqrt(emb.count().toDouble / 8)).toInt)
    val kmeans = Similarity.kmeansCentroids(emb, "vec_id", "embedding", nCells)
    val variants: Seq[(String, (DataFrame, Seq[Double]) => DataFrame)] = Seq(
      s"lsh($nPlanes) probes=1" -> ((d, q) => Similarity.annTopK(d, "vec_id", "embedding", q, dims, k, nPlanes, probes = 1)),
      s"lsh($nPlanes) probes=3" -> ((d, q) => Similarity.annTopK(d, "vec_id", "embedding", q, dims, k, nPlanes, probes = 3)),
      s"lsh($nPlanes) probes=5" -> ((d, q) => Similarity.annTopK(d, "vec_id", "embedding", q, dims, k, nPlanes, probes = 5)),
      "ivf nprobe=1" -> ((d, q) => Similarity.ivfTopK(d, "vec_id", "label", "embedding", q, k)),
      "ivf nprobe=2" -> ((d, q) => Similarity.ivfTopK(d, "vec_id", "label", "embedding", q, k, nprobe = 2)),
      s"ivf kmeans($nCells) np=2" -> ((d, q) => Similarity.ivfTopK(
        d.withColumn("kcell", Similarity.assignCell("embedding", kmeans)),
        "vec_id", "kcell", "embedding", q, k, nprobe = 2)))

    val sums = scala.collection.mutable.Map.empty[String, Double].withDefaultValue(0.0)
    queries.foreach { case (qid, q) =>
      val corpus = emb.filter(col("vec_id") =!= qid)
      val exact = ids(Similarity.cosineTopK(corpus, "vec_id", "embedding", q, k))
      variants.foreach { case (name, fn) =>
        sums(name) += recall(exact, ids(fn(corpus, q)))
      }
    }
    println(s"[recall] $dir, ${queries.length} queries, k=$k")
    variants.foreach { case (name, _) =>
      println(f"[recall] $name%-14s recall@$k = ${sums(name) / queries.length}%.3f")
    }
    spark.stop()
  }
}
