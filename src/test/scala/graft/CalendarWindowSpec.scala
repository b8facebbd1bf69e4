package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.CalendarWindow

class CalendarWindowSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def d(s: String) = java.sql.Date.valueOf(s)

  test("trailingMonths equals the brute-force pair scan, incl. month-end clamp") {
    // Mar 31's 1-month window starts add_months(Mar 31, -1) = Feb 28
    // (clamped) — Feb 27 must fall OUT, Feb 28 IN.
    val rows = Seq(
      (1L, d("2023-02-27"), 1.0), (2L, d("2023-02-28"), 2.0),
      (3L, d("2023-03-15"), 4.0), (4L, d("2023-03-31"), 8.0),
      (5L, d("2023-01-31"), 16.0), (6L, d("2023-05-01"), 32.0))
      .toDF("event_id", "dt", "value").withColumn("user_id", lit(1L))
    val got = CalendarWindow.trailingMonths(rows, Seq("user_id"),
        col("dt"), "value", months = 1)
      .select($"event_id", $"win_cnt", $"win_sum").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val data = Seq((1L, "2023-02-27", 1.0), (2L, "2023-02-28", 2.0),
      (3L, "2023-03-15", 4.0), (4L, "2023-03-31", 8.0),
      (5L, "2023-01-31", 16.0), (6L, "2023-05-01", 32.0))
      .map { case (id, ds, v) => (id, java.time.LocalDate.parse(ds), v) }
    val want = data.map { case (id, day, _) =>
      val lo = day.minusMonths(1)
      val inWin = data.filter { case (_, b, _) => !b.isBefore(lo) && !b.isAfter(day) }
      id -> ((inWin.size.toLong, inWin.map(_._3).sum))
    }.toMap
    assert(got == want)
    // the clamp case explicitly: Mar 31 window = [Feb 28, Mar 31]
    assert(got(4L) == ((3L, 14.0)))
  }

  test("plan: no range self-join — as-of sweep + prefix windows only") {
    val rows = Seq((1L, d("2023-01-01"), 1.0))
      .toDF("event_id", "dt", "value").withColumn("user_id", lit(1L))
    val out = CalendarWindow.trailingMonths(rows, Seq("user_id"),
      col("dt"), "value", months = 1)
    val p = out.queryExecution.optimizedPlan.toString
    // a quadratic rendering would show a non-equi join condition on the
    // date bounds; every join here must be pure equi (keys + day)
    assert(!p.toLowerCase.contains("cartesian"), s"cartesian product:\n$p")
  }
}
