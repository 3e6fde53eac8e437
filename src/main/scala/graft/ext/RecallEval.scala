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

  /** Measured recall@k curve of the labeled IVF probe over nprobe =
    * 1..maxP: mean recall against the exact brute-force ranking over a
    * `nQueries` sample (rows with `idCol` below `nQueries` — the
    * sample must be non-empty or this throws). Per query the cell
    * ranking runs ONCE ([[Similarity.rankCells]]) and each probe depth
    * scans only its cell prefix — not one full centroid aggregate per
    * (query, nprobe). The input is cached for the sweep and
    * unpersisted on return. An eval loop, not a data-path operator.
    * Returns nprobe → mean recall.
    */
  def nprobeCurve(df: DataFrame, idCol: String, labelCol: String,
      vecCol: String, nQueries: Int = 20, k: Int = 10,
      maxP: Int = 8): Seq[(Int, Double)] = {
    val cached = df.cache()
    try {
      val queries = cached.filter(col(idCol) < nQueries)
        .select(col(idCol), Similarity.toDoubleArr(col(vecCol)).as("q"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq)
      require(queries.nonEmpty,
        s"no rows with $idCol < $nQueries — the query sample is empty")
      def ids(d: DataFrame): Seq[Long] =
        d.select(col(idCol)).collect().map(_.getLong(0)).toSeq
      val sums = Array.fill(maxP + 1)(0.0)
      queries.foreach { case (qid, q) =>
        val corpus = cached.filter(col(idCol) =!= qid)
        val exact = ids(Similarity.cosineTopK(corpus, idCol, vecCol, q, k))
        val ranked = Similarity.rankCells(corpus, labelCol, vecCol, q)
        (1 to maxP).foreach { p =>
          sums(p) += recall(exact, ids(Similarity.probeCells(
            corpus, idCol, labelCol, vecCol, q, k, ranked.take(p))))
        }
      }
      (1 to maxP).map(p => p -> sums(p) / queries.length)
    } finally cached.unpersist(false)
  }

  /** Auto-tune nprobe by measurement: the smallest nprobe (≤ maxP)
    * whose mean recall@k on `df` meets `targetRecall`, or None if no
    * depth in the sweep reaches the target (a plateaued curve — the
    * caller must widen maxP or lower the target, not silently deploy
    * maxP as if it had been measured to suffice). This is the
    * calibration loop behind [[Similarity.nprobeFor]]'s closed-form
    * default — run it when the corpus is at hand and the measured
    * answer is worth a few hundred small jobs; use the closed form
    * when it is not.
    */
  def tuneNprobe(df: DataFrame, idCol: String, labelCol: String,
      vecCol: String, targetRecall: Double = 0.9, nQueries: Int = 20,
      k: Int = 10, maxP: Int = 8): Option[Int] = {
    val curve = nprobeCurve(df, idCol, labelCol, vecCol, nQueries, k, maxP)
    curve.collectFirst { case (p, r) if r >= targetRecall => p }
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("curve")) { curveMain(args.drop(1)); return }
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

  /** `runMain graft.ext.RecallEval curve [n] [dims] [clusters]` — the
    * calibration sweep behind [[Similarity.nprobeFor]]: recall@10 vs
    * nprobe on the planted-cluster fixture, quantized by learned
    * k-means at a range of cell counts (below, at, and above the
    * natural cluster count — over-segmentation is the realistic regime:
    * a production quantizer has far more cells than the data has
    * modes). Prints one curve per cell count plus the closed form's
    * prediction at each target.
    */
  private def curveMain(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(2000)
    val dims = args.drop(1).headOption.map(_.toInt).getOrElse(32)
    val clusters = args.drop(2).headOption.map(_.toInt).getOrElse(16)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = ClusterFixture.clustered(spark, n, dims, clusters).cache()
    Seq(clusters / 2, clusters, clusters * 2, clusters * 4).foreach { nCells =>
      val cents = Similarity.kmeansCentroids(emb, "vec_id", "embedding", nCells)
      val labeled = Similarity.withCellLabels(
        emb, "vec_id", "embedding", cents, "kcell")
      val curve = nprobeCurve(labeled, "vec_id", "kcell", "embedding")
      println(s"[curve] nCells=$nCells: " + curve.map { case (p, r) =>
        f"p$p=$r%.3f" }.mkString(" "))
      Seq(0.8, 0.9, 0.95).foreach { t =>
        val measured = curve.collectFirst { case (p, r) if r >= t => p }
        println(f"[curve]   target $t%.2f: measured=${measured.getOrElse(-1)} " +
          f"closed-form=${Similarity.nprobeFor(nCells, t)}")
      }
    }
    spark.stop()
  }
}
