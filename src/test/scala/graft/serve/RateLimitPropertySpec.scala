package graft.serve

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties for the token bucket (server.go:211 rate
  * semantics): under ANY sequence of acquire attempts and clock
  * advances, total admitted work never exceeds rate × elapsed + burst,
  * and the playback form never goes negative or over-grants.
  */
class RateLimitPropertySpec extends AnyFunSuite {

  private def run(prop: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(r.passed, r.status.toString)
  }

  test("∀ schedules: admitted ≤ rate·elapsed + burst (live tryAcquire)") {
    val gen = for {
      rate <- Gen.choose(1, 10000)
      burst <- Gen.choose(1L, 10000L)
      steps <- Gen.listOfN(40, for {
        dtUs <- Gen.choose(0L, 2000000L)
        n <- Gen.choose(0L, 20000L)
      } yield (dtUs, n))
    } yield (rate.toDouble, burst, steps)

    run(Prop.forAllNoShrink(gen) { case (rate, burst, steps) =>
      var clock = 0L
      val tb = new TokenBucket(rate, burst, () => clock)
      var admitted = 0L
      steps.foreach { case (dtUs, n) =>
        clock += dtUs
        if (n > 0 && tb.tryAcquire(n)) admitted += n
      }
      val elapsedSec = clock / 1e6
      admitted <= rate * elapsedSec + burst + 1e-6
    })
  }

  test("∀ schedules: playback grants ≤ requested, ≤ budget, never negative") {
    val gen = for {
      rate <- Gen.choose(1, 10000)
      burst <- Gen.choose(1L, 10000L)
      steps <- Gen.listOfN(40, for {
        dtUs <- Gen.choose(0L, 2000000L)
        n <- Gen.choose(0L, 20000L)
      } yield (dtUs, n))
    } yield (rate.toDouble, burst, steps)

    run(Prop.forAllNoShrink(gen) { case (rate, burst, steps) =>
      var clock = 0L
      val tb = new TokenBucket(rate, burst, () => clock)
      var granted = 0L
      var ok = true
      steps.foreach { case (dtUs, n) =>
        clock += dtUs
        val g = tb.acquireUpTo(n)
        ok &&= g >= 0 && g <= n
        granted += g
      }
      ok && granted <= rate * (clock / 1e6) + burst + 1e-6
    })
  }

  test("burst alone is admitted at t=0; burst+1 is not") {
    val tb = new TokenBucket(100.0, 500L, () => 0L)
    assert(!tb.tryAcquire(501L))
    assert(tb.tryAcquire(500L))
    assert(!tb.tryAcquire(1L))
  }
}
