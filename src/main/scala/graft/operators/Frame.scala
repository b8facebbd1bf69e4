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
  /** Compound calendar Period endpoint (`months(m) + days(d)` — legal
    * lubridate, accepted by the reference's class check, R/mutate.R:164-165).
    * Endpoint algebra composes: the boundary is
    * `date_add(add_months(index, ±m), ±d)`, so [[CalendarWindow.monthsAgg]]
    * handles it on the same prefix+as-of path as pure month frames. */
  final case class MonthsDays(months: Long, days: Long) extends FrameEndpoint
  /** Compound calendar Period endpoint with a SUB-DAY component
    * (`months(m) + hours(h)` / `+ seconds(s)` — legal lubridate,
    * accepted by the reference's class check, R/mutate.R:164-165).
    * The boundary is `(ts - INTERVAL m MONTH) - INTERVAL s SECOND`
    * (month shift clamps preserving time-of-day, then exact second
    * shift — lubridate applies Period components months-first).
    * Routed to [[CalendarWindow.monthsSecondsAgg]], the
    * seconds-granularity expansion path (timestamps are not
    * day-partitionable, so the prefix+as-of date path can't carry
    * these). */
  final case class MonthsSeconds(months: Long, seconds: Long)
    extends FrameEndpoint
}

/** @param strict strict-lubridate month mode (reference semantic replay):
  *   lubridate Period arithmetic yields NA for nonexistent dates
  *   (`ymd("2023-03-31") - months(1)` = NA, because Feb 31 doesn't
  *   exist), making that row's window UNDEFINED in the reference
  *   (R/mutate.R:164-165 accepts the Period; slider sees the NA). The
  *   default (`strict = false`) uses warehouse `add_months` clamping
  *   (Mar 31 − 1mo = Feb 28, SURVEY.md §2.5 note); `strict = true`
  *   emits NULL for every output of a row whose boundary `add_months`
  *   landed on a clamped month-end — bit-faithful reference replay.
  *   Only meaningful on month-family frames (rejected otherwise). */
final case class Frame(before: FrameEndpoint, after: FrameEndpoint,
    strict: Boolean = false) {
  import FrameEndpoint._
  /** True when either endpoint is value-based (Days/Seconds) — requires an
    * index column and compiles to `rangeBetween`. */
  def isRange: Boolean = Seq(before, after).exists {
    case Days(_) | Seconds(_) | Range(_) => true
    case _                               => false
  }
  /** True when either endpoint is a calendar-month (or compound
    * months+days) Period — [[TidierOps.mutateW]] routes these to
    * [[CalendarWindow.monthsAgg]]. */
  def isMonths: Boolean = Seq(before, after).exists {
    case Months(_) | MonthsDays(_, _) | MonthsSeconds(_, _) => true
    case _                                                  => false
  }
  /** True when either endpoint carries a sub-day Period component —
    * routed to the seconds-granularity path. */
  def isMonthsSeconds: Boolean = Seq(before, after).exists {
    case MonthsSeconds(_, _) => true
    case _                   => false
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
  /** `c(hours(before), hours(after))` Period frame — an hour is exactly
    * 3600 seconds under lubridate Period arithmetic, so this is
    * constructor sugar over [[seconds]] (reference accepts ANY Period,
    * R/mutate.R:164-165). */
  def hours(before: Long, after: Long): Frame =
    seconds(3600 * before, 3600 * after)
  /** `c(minutes(before), minutes(after))` Period frame — 60 seconds per
    * minute, sugar over [[seconds]]. */
  def minutes(before: Long, after: Long): Frame =
    seconds(60 * before, 60 * after)
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
  /** Month frame in strict-lubridate mode: rows whose boundary
    * `add_months` clamped a nonexistent month-end yield NULL (the
    * reference's Period-arithmetic NA, see [[Frame.strict]]). */
  def monthsStrict(before: Long, after: Long): Frame =
    Frame(Months(before), Months(after), strict = true)
  /** `c(weeks(before), weeks(after))` Period frame — the reference
    * accepts ANY lubridate Period (R/mutate.R:164-165), and a week is
    * exactly 7 days under Period arithmetic, so this is constructor
    * sugar over [[days]]. */
  def weeks(before: Long, after: Long): Frame = days(7 * before, 7 * after)
  /** `c(years(before), years(after))` Period frame — a year is exactly
    * 12 months under lubridate Period arithmetic (clamping included:
    * `ymd("2024-02-29") - years(1)` and `- months(12)` agree), so this
    * is constructor sugar over [[months]]. */
  def years(before: Long, after: Long): Frame = months(12 * before, 12 * after)
  /** Compound `c(months(bm) + days(bd), months(am) + days(ad))` Period
    * frame (legal lubridate, R/mutate.R:164-165) — boundary algebra is
    * `date_add(add_months(d, ±m), ±k)`, evaluated by
    * [[CalendarWindow.monthsAgg]] on the prefix+as-of path. */
  def monthsDays(beforeMonths: Long, beforeDays: Long,
      afterMonths: Long, afterDays: Long): Frame =
    Frame(MonthsDays(beforeMonths, beforeDays),
      MonthsDays(afterMonths, afterDays))
  /** Compound `c(months(bm) + seconds(bs), months(am) + seconds(as))`
    * Period frame — the last Period shape the reference's class check
    * accepts (R/mutate.R:164-165) that needed a constructor: months
    * mixed with a SUB-DAY unit. Boundary algebra:
    * `(ts ∓ m months) ∓ s seconds` (month shift clamps preserving
    * time-of-day). Evaluated by [[CalendarWindow.monthsSecondsAgg]]
    * on a seconds-granularity expansion join. */
  def monthsSeconds(beforeMonths: Long, beforeSeconds: Long,
      afterMonths: Long, afterSeconds: Long): Frame =
    Frame(MonthsSeconds(beforeMonths, beforeSeconds),
      MonthsSeconds(afterMonths, afterSeconds))
  /** `c(months(bm) + hours(bh), months(am) + hours(ah))` sugar — an
    * hour is exactly 3600 seconds under Period arithmetic. */
  def monthsHours(beforeMonths: Long, beforeHours: Long,
      afterMonths: Long, afterHours: Long): Frame =
    monthsSeconds(beforeMonths, 3600 * beforeHours,
      afterMonths, 3600 * afterHours)
}
