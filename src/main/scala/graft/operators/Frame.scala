package graft.operators

/** Window-frame endpoint algebra for [[TidierOps.mutateW]].
  *
  * Mirrors the reference's `.frame = c(before, after)` contract
  * (reference: R/mutate.R:48-54,162-172,515-518): a length-2 pair where
  * `before` counts BACKWARD from the current row (positive = further back)
  * and `after` counts FORWARD (negative shrinks the frame past the current
  * row, e.g. `c(days(7), days(-1))` = [cur-7d, cur-1d] excluding the current
  * row, R/mutate.R:98-100). `Inf` endpoints (R/mutate.R:79,433) map to
  * [[FrameEndpoint.Unbounded]].
  *
  * Endpoints are either row counts ([[FrameEndpoint.Rows]]) — compiled to
  * `WindowSpec.rowsBetween` — or calendar units ([[FrameEndpoint.Days]] /
  * [[FrameEndpoint.Seconds]], the Spark rendering of the reference's
  * `lubridate::Period` frames, R/mutate.R:164-165) — compiled to
  * `WindowSpec.rangeBetween` over a numeric projection of the `.index`
  * column at the matching granularity.
  */
sealed trait FrameEndpoint
object FrameEndpoint {
  /** `Inf` endpoint: unbounded preceding/following. */
  case object Unbounded extends FrameEndpoint
  /** Row-count endpoint (ROWS frame). */
  final case class Rows(n: Long) extends FrameEndpoint
  /** Calendar-day endpoint (RANGE frame over a day-granular index). */
  final case class Days(n: Long) extends FrameEndpoint
  /** Second endpoint (RANGE frame over an epoch-second index). */
  final case class Seconds(n: Long) extends FrameEndpoint
}

final case class Frame(before: FrameEndpoint, after: FrameEndpoint) {
  import FrameEndpoint._
  /** True when either endpoint is value-based (Days/Seconds) — requires an
    * index column and compiles to `rangeBetween`. */
  def isRange: Boolean = Seq(before, after).exists {
    case Days(_) | Seconds(_) => true
    case _                    => false
  }
  /** Both endpoints finite — the only case `.complete` gating can truncate
    * (unbounded frames are always "complete" in slider's sense). */
  def isFinite: Boolean = before != Unbounded && after != Unbounded
}

object Frame {
  import FrameEndpoint._
  /** `c(before, after)` row frame. */
  def rows(before: Long, after: Long): Frame = Frame(Rows(before), Rows(after))
  /** `c(Inf, 0)` — cumulative / running frame (R/mutate.R:79,433). */
  val cumulative: Frame = Frame(Unbounded, Rows(0))
  /** Whole-partition frame. */
  val unbounded: Frame = Frame(Unbounded, Unbounded)
  /** `c(days(before), days(after))` Period frame (R/mutate.R:98-100). */
  def days(before: Long, after: Long): Frame = Frame(Days(before), Days(after))
  /** Second-granularity Period frame. */
  def seconds(before: Long, after: Long): Frame =
    Frame(Seconds(before), Seconds(after))
  /** Month Periods (`c(months(k), ...)`) have per-row clamped widths that
    * no constant-offset range frame can express — use
    * [[CalendarWindow.trailingMonths]], which renders them as prefix sums
    * + an as-of boundary lookup. This stub exists so the API surface
    * documents the routing instead of silently lacking the unit. */
  def months(before: Long, after: Long): Frame =
    throw new UnsupportedOperationException(
      "month Period frames are calendar-width (per-row clamped bounds); " +
        "use CalendarWindow.trailingMonths(df, by, index, valueCol, months)")
}
