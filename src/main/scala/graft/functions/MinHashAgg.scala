package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregate (SURVEY §7.3 "Aggregator for … minhash
  * sketch"): a k-slot MinHash signature computed in ONE pass over
  * pre-hashed shingle values — the typed-API twin of the k parallel
  * `min()` columns in `ext.Dedup.minhashLshPairs`, using the identical
  * permutation family h_j(x) = ((2j+1)·x + 7919j + 1) mod (2³¹−1).
  *
  * Usage:
  *   - Dataset API: `ds.groupByKey(_.docId).agg(new MinHashAgg(16).toColumn)`
  *   - SQL/DataFrame: `spark.udf.register("minhash_sig", functions.udaf(new MinHashAgg(16)))`
  *
  * The buffer is a fixed k-long array; merge is elementwise min — fully
  * commutative/associative, so partial aggregation applies map-side and
  * the shuffle carries one small array per group.
  */
class MinHashAgg(k: Int = 16) extends Aggregator[Long, Array[Long], Array[Long]] {
  private val P = 2147483647L

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    var j = 0
    while (j < k) {
      val hj = ((2L * j + 1) * h + 7919L * j + 1) % P
      if (hj < buf(j)) buf(j) = hj
      j += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < k) { if (b(j) < a(j)) a(j) = b(j); j += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
