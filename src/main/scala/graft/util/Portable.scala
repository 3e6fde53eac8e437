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
}
