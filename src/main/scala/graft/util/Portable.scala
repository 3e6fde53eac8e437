package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine numeric portability helpers.
  *
  * `round()` is NOT portable across engines: Spark rounds through an exact
  * BigDecimal (HALF_UP on the true decimal expansion of the double), while
  * DuckDB rounds by FP-scaling (`std::round(x * 10^n) / 10^n`). A value
  * whose scaled double lands exactly on .5 — common for ratios of small
  * integers — rounds differently (observed: quality ratio 0.43725 →
  * Spark 0.4372, DuckDB 0.4373).
  *
  * `pround` instead uses only IEEE-exact deterministic ops — multiply,
  * add, floor, divide — which produce bit-identical doubles in any
  * IEEE-754 engine given the same input, so the oracle comparison is
  * exact by construction. SQL twin: `floor(x * 1eN + 0.5) / 1eN`.
  * (Half-values round toward +∞; consistent in both engines, which is
  * what matters.)
  */
object Portable {
  def pround(c: Column, digits: Int): Column = {
    val s = math.pow(10, digits) // 1e2/1e4/1e6 — exactly representable
    floor(c * s + 0.5) / s
  }

  /** Driver-side twin of [[pround]] — the same IEEE-exact op sequence on
    * a plain Double, for index-lookup math (e.g. IVF cell ranking over a
    * collected centroid table) that must reproduce the Column form
    * bit-for-bit.
    */
  def proundD(x: Double, digits: Int): Double = {
    val s = math.pow(10, digits)
    math.floor(x * s + 0.5) / s
  }

  /** ORDER-DETERMINISTIC sum of a double column (VERDICT r14 #5 — the
    * iterative learners' remaining noise margin): FP addition is not
    * associative, and Spark's partition/merge order is scheduler-owned,
    * so `sum(double)` can differ run to run in the last ulps — which an
    * iterative learner then AMPLIFIES across epochs against its
    * quantization boundary. `dsum` casts each element to
    * DECIMAL(38, 18) (a deterministic per-value decimal rounding, error
    * ≤ 5e-19) and sums in exact integer arithmetic — associative AND
    * commutative, so ANY partitioning and ANY merge order yields the
    * bit-identical result — then casts back to double (one
    * deterministic rounding). Map-side combine is preserved (decimal
    * sum has a partial-merge form); 20 integral digits of headroom make
    * overflow unreachable (1e12 elements of |x| ≤ 1e3 reach 1e15).
    * Value differs from the FP left-fold by ≲ n·5e-19 + 1 ulp — far
    * below the learners' 0.5e-9 rounding margin, so oracle hashes are
    * unchanged while engine-side determinism becomes by construction.
    */
  def dsum(c: Column): Column =
    sum(c.cast(org.apache.spark.sql.types.DecimalType(38, 18))).cast("double")
}
