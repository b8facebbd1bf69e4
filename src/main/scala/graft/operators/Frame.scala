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
  /** Unitless numeric endpoint (RANGE frame over ANY numeric index) —
    * the reference's `slide_index` accepts any numeric `.index`
    * (R/mutate.R:55-56 constrains the index only to "orderable"), so a
    * frame need not be a time Period at all: `c(500, 500)` over a price
    * index means [price−500, price+500]. Compiled to `rangeBetween`
    * over the index column verbatim (no granularity projection). */
  final case class Range(n: Long) extends FrameEndpoint
  /** Calendar-month endpoint (`months(k)` Period, R/mutate.R:164-165).
    * Month windows have per-row clamped widths that `rangeBetween`
    * cannot express; [[TidierOps.mutateW]] routes frames with Months
    * endpoints to [[CalendarWindow.monthsAgg]] (prefix sums + as-of
    * boundary lookups) instead of compiling a WindowSpec. */
  final case class Months(n: Long) extends FrameEndpoint
}

final case class Frame(before: FrameEndpoint, after: FrameEndpoint) {
  import FrameEndpoint._
  /** True when either endpoint is value-based (Days/Seconds) — requires an
    * index column and compiles to `rangeBetween`. */
  def isRange: Boolean = Seq(before, after).exists {
    case Days(_) | Seconds(_) | Range(_) => true
    case _                               => false
  }
  /** True when either endpoint is a calendar-month Period —
    * [[TidierOps.mutateW]] routes these to [[CalendarWindow.monthsAgg]]. */
  def isMonths: Boolean = Seq(before, after).exists(_.isInstanceOf[Months])
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
  /** Unitless numeric range frame over any numeric `.index`
    * (`slide_index` with a non-time index). */
  def range(before: Long, after: Long): Frame =
    Frame(Range(before), Range(after))
  /** `c(months(before), months(after))` calendar-month Period frame
    * (R/mutate.R:164-165; the month-granular analogue of the
    * `c(days(7), days(-1))` example at R/mutate.R:98-100 — negative
    * `after` shifts the window before the current row). Month windows
    * have per-row clamped widths, so [[TidierOps.mutateW]] routes these
    * to [[CalendarWindow.monthsAgg]] (prefix sums + as-of boundary
    * lookups — O(n log n)) instead of a `rangeBetween` WindowSpec. */
  def months(before: Long, after: Long): Frame =
    Frame(Months(before), Months(after))
}
