package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Frame, FrameEndpoint}
import graft.streaming.StreamingOps
import StreamingOps.StreamSupport.{NotStreamable, StatefulOnly}

/** The streaming degradation matrix (StreamingOps.supports) — one
  * assertion per row of the SURVEY §2.4 statement, so a change to the
  * matrix is a visible spec diff, not a silent doc drift. */
class StreamSupportSpec extends AnyFunSuite {

  private def verdict(f: Frame) = StreamingOps.supports(f)

  test("whole-partition and unbounded-following frames are not streamable") {
    assert(verdict(Frame.unbounded).isInstanceOf[NotStreamable])
    assert(verdict(Frame(FrameEndpoint.Rows(3), FrameEndpoint.Unbounded))
      .isInstanceOf[NotStreamable])
    assert(verdict(Frame(FrameEndpoint.Days(3), FrameEndpoint.Unbounded))
      .isInstanceOf[NotStreamable])
  }

  test("running/cumulative frames are stateful-only") {
    assert(verdict(Frame.cumulative).isInstanceOf[StatefulOnly])
    assert(verdict(Frame(FrameEndpoint.Unbounded, FrameEndpoint.Rows(-1)))
      .isInstanceOf[StatefulOnly])
    assert(verdict(Frame(FrameEndpoint.Unbounded, FrameEndpoint.Days(0)))
      .isInstanceOf[StatefulOnly])
  }

  test("trailing rows frames are stateful; positive row lookahead is not " +
      "streamable") {
    assert(verdict(Frame.rows(5, 0)).isInstanceOf[StatefulOnly])
    assert(verdict(Frame.rows(5, -2)).isInstanceOf[StatefulOnly])
    val la = verdict(Frame.rows(3, 3))
    assert(la.isInstanceOf[NotStreamable])
    assert(la.asInstanceOf[NotStreamable].why.contains("event time"))
    // (Unbounded, Rows(a>0)) shares the verdict AND the why — the old
    // catch-all mislabeled it a "mixed-unit frame" (ADVICE r07)
    val ula = verdict(Frame(FrameEndpoint.Unbounded, FrameEndpoint.Rows(2)))
    assert(ula.isInstanceOf[NotStreamable])
    assert(ula.asInstanceOf[NotStreamable].why.contains("lookahead"),
      s"wrong reason: ${ula.asInstanceOf[NotStreamable].why}")
    assert(!ula.asInstanceOf[NotStreamable].why.contains("mixed-unit"))
  }

  test("finite event-time Period frames are stateful (watermark-bounded), " +
      "all unit families") {
    assert(verdict(Frame.days(7, -1)).isInstanceOf[StatefulOnly])
    assert(verdict(Frame.seconds(3600, 0)).isInstanceOf[StatefulOnly])
    assert(verdict(Frame.hours(6, -1)).isInstanceOf[StatefulOnly])
    assert(verdict(Frame.months(1, 0)).isInstanceOf[StatefulOnly])
    assert(verdict(Frame.monthsDays(1, 3, 0, -2)).isInstanceOf[StatefulOnly])
    assert(verdict(Frame.monthsHours(1, 6, 0, -12))
      .isInstanceOf[StatefulOnly])
    // a finite positive TIME lookahead is watermark-releasable
    assert(verdict(Frame.days(7, 1)).isInstanceOf[StatefulOnly])
  }

  test("unitless numeric range frames are not streamable (no watermark " +
      "axis)") {
    val v = verdict(Frame.range(1000, -10))
    assert(v.isInstanceOf[NotStreamable])
    assert(v.asInstanceOf[NotStreamable].why.contains("watermark"))
  }
}
