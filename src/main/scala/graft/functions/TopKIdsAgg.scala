package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded "k smallest distinct ids" aggregate — the posting-list head
  * collector of `ext.Retrieval.invertedIndex`. Wrapped with
  * `functions.udaf` it compiles to a `ScalaAggregator` (Spark's
  * TypedImperativeAggregate), so partial aggregation applies MAP-SIDE:
  * every task contributes at most k ids per token and the shuffle
  * carries k-long arrays — a stop-word token costs the same k-bounded
  * merge as a rare one. This replaces the earlier token-partitioned
  * `row_number` window, whose sort funneled ALL rows of a hot token
  * through a single task before the head filter could drop any.
  *
  * The buffer is an ascending sorted array of ≤ k distinct values;
  * reduce is insert-if-smaller (dedup on insert), merge is a sorted
  * k-bounded merge — both commutative/associative, so the result is
  * order-independent.
  */
class TopKIdsAgg(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  require(k > 0)

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], id: Long): Array[Long] = {
    if (buf.length == k && id >= buf(k - 1)) return buf
    val pos = java.util.Arrays.binarySearch(buf, id)
    if (pos >= 0) return buf // already present
    val ins = -pos - 1
    val out = new Array[Long](math.min(buf.length + 1, k))
    System.arraycopy(buf, 0, out, 0, ins)
    out(ins) = id
    System.arraycopy(buf, ins, out, ins + 1, out.length - ins - 1)
    out
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val tmp = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var n = 0
    while (n < tmp.length && (i < a.length || j < b.length)) {
      val take =
        if (i >= a.length) { j += 1; b(j - 1) }
        else if (j >= b.length) { i += 1; a(i - 1) }
        else if (a(i) < b(j)) { i += 1; a(i - 1) }
        else if (b(j) < a(i)) { j += 1; b(j - 1) }
        else { i += 1; j += 1; a(i - 1) } // equal: dedup
      tmp(n) = take
      n += 1
    }
    if (n < tmp.length) java.util.Arrays.copyOf(tmp, n) else tmp
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
