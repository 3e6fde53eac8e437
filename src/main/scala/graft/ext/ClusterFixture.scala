package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic planted-cluster embedding fixture — the eval/spec
  * counterpart of the driver's near-uniform embeddings table. Real
  * embedding corpora CLUSTER (that is why IVF/LSH work); the driver
  * fixture's vectors are near-uniform on the sphere, which caps ANN
  * recall at ~0.5 regardless of index quality and makes recall floors
  * untestable. This generator plants `k` unit-norm Gaussian centers
  * and scatters `n` points around them (σ `sigma`), seeded — so specs
  * can pin an absolute recall floor and RecallEval can report the
  * accuracy/cost curve on data with actual neighbor structure.
  *
  * Schema matches the embeddings table: (vec_id long, label long,
  * embedding array<float>) with `label` = the planted cluster — the
  * ground-truth coarse assignment a learned quantizer should recover.
  */
object ClusterFixture {

  def clustered(spark: SparkSession, n: Int, dims: Int, k: Int,
      sigma: Double = 0.12, seed: Long = 42L): DataFrame = {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(seed)
    def unit(): Array[Double] = {
      val v = Array.fill(dims)(rnd.nextGaussian())
      val nn = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / nn)
    }
    val centers = Array.fill(k)(unit())
    (0 until n).map { i =>
      val c = i % k
      val v = centers(c).map(x => (x + sigma * rnd.nextGaussian()).toFloat).toSeq
      (i.toLong, c.toLong, v)
    }.toDF("vec_id", "label", "embedding")
  }
}
