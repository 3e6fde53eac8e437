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

  /** Clustered fixture whose signal lives in a LOW-dimensional latent
    * space embedded by a seeded dense orthonormal basis — the
    * information straddles every PQ subspace boundary, the geometry
    * where plain PQ's independent per-subspace quantizers waste their
    * bit budget and a learned rotation provably helps (Ge et al. CVPR
    * 2013 §1's motivating case). `latent` ≪ `dims`; a small full-dim
    * noise floor keeps the off-manifold coordinates non-degenerate.
    */
  def correlated(spark: SparkSession, n: Int, dims: Int, k: Int,
      latent: Int = 4, sigma: Double = 0.08, noise: Double = 0.02,
      seed: Long = 43L): DataFrame = {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(seed)
    // orthonormal dims×latent basis: Gram-Schmidt over seeded Gaussians
    val basis = {
      val cols = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
      while (cols.size < latent) {
        val w = Array.fill(dims)(rnd.nextGaussian())
        cols.foreach { u =>
          val pr = u.zip(w).map { case (a, b) => a * b }.sum
          (0 until dims).foreach(i => w(i) -= pr * u(i))
        }
        val nn = math.sqrt(w.map(x => x * x).sum)
        if (nn > 1e-6) cols += w.map(_ / nn)
      }
      cols.toArray
    }
    val centers = Array.fill(k)(Array.fill(latent)(rnd.nextGaussian()))
    (0 until n).map { i =>
      val c = i % k
      val z = centers(c).map(x => x + sigma * rnd.nextGaussian())
      val x = Array.tabulate(dims)(d =>
        (0 until latent).map(l => basis(l)(d) * z(l)).sum +
          noise * rnd.nextGaussian())
      (i.toLong, c.toLong, x.map(_.toFloat).toSeq)
    }.toDF("vec_id", "label", "embedding")
  }
}
