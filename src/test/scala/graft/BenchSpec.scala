package graft

import org.scalatest.funsuite.AnyFunSuite

/** The superlinearity tripwire: a planted quadratic plan must fail the
  * bench, honest (sub-~ratio^1.3) growth must pass.
  */
class BenchSpec extends AnyFunSuite {

  test("planted quadratic growth violates the budget; linear passes") {
    // 10× rows. Linear query: 0.5s → 5s (10×). Quadratic: 0.5s → 50s
    // (100×, the simhash_hamming byte-banding signature).
    val v = Bench.growthViolations(
      Map("linear" -> (0.5, 5.0), "quadratic" -> (0.5, 50.0)),
      rowsRatio = 10.0)
    assert(v.size == 1 && v.head.startsWith("quadratic:"), v.toString)
  }

  test("noise floor: a tiny small-SF time cannot produce an impossible budget") {
    // small time 0.01s is fixed overhead, not workload; the 0.2s floor
    // gives a ~4s budget at 10× — a 3s big time passes, 30s still fails
    assert(Bench.growthViolations(Map("q" -> (0.01, 3.0)), 10.0).isEmpty)
    assert(Bench.growthViolations(Map("q" -> (0.01, 30.0)), 10.0).nonEmpty)
  }

  test("growth-gated queries are all registered") {
    Bench.GrowthGated.foreach(q => assert(SparkEntry.queries.contains(q), q))
  }
}
