package graft.serve

import org.scalatest.funsuite.AnyFunSuite

/** Adaptive replay share semantics (VERDICT r16 #2): proportional
  * back-off above the live-lag target, a floor that guarantees
  * convergence, full-speed recovery when live goes quiet, and a
  * burst-free fractional step gate.
  */
class ReplayThrottleSpec extends AnyFunSuite {

  private def throttle(nowRef: () => Long) =
    new ReplayThrottle(targetLagUs = 1000000L, floorShare = 0.125,
      staleNanos = 5000000000L, alpha = 1.0, nowNanos = nowRef)

  test("share is 1 at/under target, proportional above, floored") {
    var now = 0L
    val t = throttle(() => now)
    assert(t.share == 1.0) // no observations yet: nothing to arbitrate
    t.observeLive(500000L)
    assert(t.share == 1.0)
    t.observeLive(1000000L)
    assert(t.share == 1.0)
    t.observeLive(2000000L) // 2× target → half the steps
    assert(t.share == 0.5)
    t.observeLive(4000000L)
    assert(t.share == 0.25)
    t.observeLive(100000000L) // 100× target → floor, never a stall
    assert(t.share == 0.125)
  }

  test("stale observations recover the share to 1 (quiet-stream drain)") {
    var now = 0L
    val t = throttle(() => now)
    t.observeLive(100000000L)
    assert(t.share == 0.125)
    now += 4999999999L // just inside the staleness window
    assert(t.share == 0.125)
    now += 2L // past it: live went quiet — replay at full speed
    assert(t.share == 1.0)
  }

  test("stepAllowed fires every tick at share 1, every Nth at 1/N, burst-free") {
    var now = 0L
    val t = throttle(() => now)
    // share 1: every candidate tick steps
    assert((1 to 10).forall(_ => t.stepAllowed()))
    // share 1/4: 1 in 4 ticks fires — plus the single capped credit
    // carried from the share-1 regime (≤1 step by design, not a burst)
    t.observeLive(4000000L)
    val fired = (1 to 41).count(_ => t.stepAllowed())
    assert(fired == 11, s"expected 10/40 + 1 carried credit at share 0.25, got $fired")
    // recovery must not bank idle credit into a burst: after the lag
    // clears, ticks fire 1:1, not in a catch-up volley
    t.observeLive(0L)
    assert((1 to 10).forall(_ => t.stepAllowed()))
  }

  test("EWMA smooths a single spike (alpha < 1)") {
    var now = 0L
    val t = new ReplayThrottle(targetLagUs = 1000000L, floorShare = 0.1,
      staleNanos = 5000000000L, alpha = 0.3, nowNanos = () => now)
    (1 to 50).foreach(_ => t.observeLive(500000L))
    t.observeLive(50000000L) // one outlier batch
    // ewma ≈ 0.3·50s + 0.7·0.5s ≈ 15.35s → throttled but not floored
    val s = t.share
    assert(s < 1.0 && s > 0.05, s"one spike should throttle smoothly, got $s")
    (1 to 50).foreach(_ => t.observeLive(500000L))
    assert(t.share == 1.0) // and steady-state recovers
  }

  test("negative lag (clock skew) clamps to 0, never inflates the share") {
    var now = 0L
    val t = throttle(() => now)
    t.observeLive(-5000000L)
    assert(t.share == 1.0)
    assert(t.state._1 == 0L)
  }
}
