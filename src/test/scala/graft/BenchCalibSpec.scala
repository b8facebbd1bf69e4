package graft

import org.scalatest.funsuite.AnyFunSuite

/** [[Bench.calibEstimate]] — the robust box-speed estimator (r15
  * verdict item 1). Contract under test: each side is the MEDIAN of
  * its samples, the estimate is the min of the two side medians, and
  * normalization is refused (stable = false) when the medians
  * disagree by more than 20%. The motivating regression is pinned
  * verbatim: round 15's shipped single-sample min() latched onto an
  * outlier-fast 1.122 s burst against 1.91–2.19 s steady-state and
  * published a 1.65×-wrong normalized total.
  */
class BenchCalibSpec extends AnyFunSuite {

  test("r15 regression: one outlier-fast sample cannot set the estimate") {
    // steady-state ~1.91 s; the before side carries the observed
    // 1.122 s burst. Single-sample min() returned 1.122; the median
    // estimator must land on steady state and stay stable.
    val (sec, spread, stable) =
      Bench.calibEstimate(Seq(1.91, 1.122, 1.93), Seq(2.187, 1.90, 1.95))
    assert(sec === 1.91)
    assert(spread < 0.05)
    assert(stable)
  }

  test("a stall inflating one whole side refuses normalization") {
    // every after-sample stalled ~2.5x: medians 1.9 vs 4.8 — no single
    // box speed describes this run, so stable must be false (the
    // artifact emits value_normalized: null + calib_unstable)
    val (sec, spread, stable) =
      Bench.calibEstimate(Seq(1.9, 1.92, 1.88), Seq(4.7, 4.8, 4.9))
    assert(sec === 1.9)
    assert(spread > 1.0)
    assert(!stable)
  }

  test("min across sides still defends against a one-sided stall") {
    // one side uniformly slower but within 20%: estimate is the FAST
    // side's median (a stall only inflates), and the run stays stable
    val (sec, _, stable) =
      Bench.calibEstimate(Seq(2.2, 2.21, 2.19), Seq(2.0, 2.02, 1.98))
    assert(sec === 2.0)
    assert(stable)
  }

  test("median of an even sample count averages the middle pair") {
    val (sec, _, _) = Bench.calibEstimate(Seq(1.0, 3.0), Seq(10.0))
    assert(sec === 2.0) // before median (1+3)/2, after 10 — min wins
  }

  test("the 20% gate sits exactly at spread 0.20") {
    val (_, s1, ok1) = Bench.calibEstimate(Seq(1.0), Seq(1.2))
    assert(math.abs(s1 - 0.2) < 1e-12 && ok1)
    val (_, s2, ok2) = Bench.calibEstimate(Seq(1.0), Seq(1.21))
    assert(s2 > 0.2 && !ok2)
  }

  test("empty side is a loud contract violation") {
    intercept[IllegalArgumentException] {
      Bench.calibEstimate(Nil, Seq(1.0))
    }
  }
}
