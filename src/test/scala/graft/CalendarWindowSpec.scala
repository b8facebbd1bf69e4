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

  test("property: random gapped dates across 1-3 users equal brute force") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.scalacheck.Prop.forAll
    val gen = for {
      n <- Gen.choose(0, 30)
      rows <- Gen.listOfN(n, for {
        u <- Gen.choose(0L, 2L)
        // days around year boundaries and month-length variety
        off <- Gen.choose(0, 430)
        v <- Gen.choose(-4, 9).map(_.toDouble)
      } yield (u, java.time.LocalDate.of(2023, 12, 15).plusDays(off), v))
      m <- Gen.choose(0, 3)
    } yield (rows, m)
    val prop = forAll(gen) { case (rows, m) =>
      val df = rows.zipWithIndex.map { case ((u, day, v), i) =>
        (i.toLong, u, java.sql.Date.valueOf(day), v)
      }.toDF("event_id", "user_id", "dt", "value")
      val got = CalendarWindow.trailingMonths(df, Seq("user_id"),
          col("dt"), "value", months = m)
        .select($"event_id", $"win_cnt", $"win_sum").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      val want = rows.zipWithIndex.map { case ((u, day, _), i) =>
        val lo = day.minusMonths(m)
        val inWin = rows.filter { case (u2, b, _) =>
          u2 == u && !b.isBefore(lo) && !b.isAfter(day) }
        i.toLong -> ((inWin.size.toLong, inWin.map(_._3).sum))
      }.toMap
      got == want
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }

  test("NULL group keys are real groups (null-safe join-back, no row loss)") {
    val rows = Seq(
      (1L, Option(7L), d("2023-01-01"), 1.0),
      (2L, Option(7L), d("2023-01-10"), 2.0),
      (3L, Option.empty[Long], d("2023-01-01"), 4.0),
      (4L, Option.empty[Long], d("2023-01-20"), 8.0))
      .toDF("event_id", "user_id", "dt", "value")
    val got = CalendarWindow.trailingMonths(rows, Seq("user_id"),
        col("dt"), "value", months = 1)
      .select($"event_id", $"win_sum").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(1L -> 1.0, 2L -> 3.0, 3L -> 4.0, 4L -> 12.0))
  }

  test("colliding output names are rejected, not silently duplicated") {
    val rows = Seq((1L, d("2023-01-01"), 1.0, 9.9))
      .toDF("event_id", "dt", "value", "win_sum")
      .withColumn("user_id", lit(1L))
    intercept[IllegalArgumentException] {
      CalendarWindow.trailingMonths(rows, Seq("user_id"), col("dt"),
        "value", months = 1)
    }
  }

  test("offset frame c(months(2), months(-1)) via mutateW equals brute force") {
    import graft.operators.TidierOps._
    import graft.operators.Frame
    // [add_months(d,-2), add_months(d,-1)] — the current month is EXCLUDED
    val rows = Seq(
      (1L, d("2023-01-15"), 1.0), (2L, d("2023-02-10"), 2.0),
      (3L, d("2023-03-15"), 4.0), (4L, d("2023-03-31"), 8.0),
      (5L, d("2023-04-30"), 16.0), (6L, d("2023-05-31"), 32.0))
      .toDF("event_id", "dt", "value").withColumn("user_id", lit(1L))
    val got = rows.mutateW(
        "win_sum" -> sum(col("value")), "win_cnt" -> count(col("value")),
        "win_min" -> min(col("value")), "win_max" -> max(col("value")),
        "win_all" -> count(lit(1)))(
        by = Seq(col("user_id")), frame = Some(Frame.months(2, -1)),
        index = Some(col("dt")))
      .select($"event_id", $"win_sum", $"win_cnt", $"win_min", $"win_max",
        $"win_all")
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), r.getLong(2), Option(r.get(3)), Option(r.get(4)),
          r.getLong(5)))).toMap
    val data = Seq((1L, "2023-01-15", 1.0), (2L, "2023-02-10", 2.0),
      (3L, "2023-03-15", 4.0), (4L, "2023-03-31", 8.0),
      (5L, "2023-04-30", 16.0), (6L, "2023-05-31", 32.0))
      .map { case (id, ds, v) => (id, java.time.LocalDate.parse(ds), v) }
    val want = data.map { case (id, day, _) =>
      val lo = day.minusMonths(2); val hi = day.minusMonths(1)
      val w = data.filter { case (_, b, _) => !b.isBefore(lo) && !b.isAfter(hi) }
        .map(_._3)
      id -> ((if (w.isEmpty) None else Some(w.sum), w.size.toLong,
        w.minOption, w.maxOption, w.size.toLong))
    }.toMap
    assert(got == want)
    // Mar 31: window = [Jan 31, Feb 28 (clamped)] — catches Feb 10 only
    assert(got(4L) == ((Some(2.0), 1L, Some(2.0), Some(2.0), 1L)))
    // Jan 15: empty window → NULL sum/min/max, 0 counts
    assert(got(1L) == ((None, 0L, None, None, 0L)))
  }

  test("property: offset/min/max/countAll on random gapped dates == brute force") {
    import graft.operators.TidierOps._
    import graft.operators.Frame
    import org.scalacheck.{Gen, Test => SCTest}
    import org.scalacheck.Prop.forAll
    val gen = for {
      n <- Gen.choose(0, 25)
      rows <- Gen.listOfN(n, for {
        u <- Gen.choose(0L, 2L)
        off <- Gen.choose(0, 430)
        v <- Gen.choose(-4, 9).map(_.toDouble)
      } yield (u, java.time.LocalDate.of(2023, 12, 15).plusDays(off), v))
      b <- Gen.choose(-2, 3)
      ext <- Gen.choose(0, 3)
    } yield (rows, b, -b + ext)
    val prop = forAll(gen) { case (rows, bMo, aMo) =>
      val df = rows.zipWithIndex.map { case ((u, day, v), i) =>
        (i.toLong, u, java.sql.Date.valueOf(day), v)
      }.toDF("event_id", "user_id", "dt", "value")
      val got = df.mutateW(
          "ws" -> sum(col("value")), "wc" -> count(col("value")),
          "wmn" -> min(col("value")), "wmx" -> max(col("value")))(
          by = Seq(col("user_id")),
          frame = Some(Frame.months(bMo, aMo)), index = Some(col("dt")))
        .select($"event_id", $"ws", $"wc", $"wmn", $"wmx").collect()
        .map(r => r.getLong(0) ->
          ((Option(r.get(1)), r.getLong(2), Option(r.get(3)),
            Option(r.get(4))))).toMap
      val want = rows.zipWithIndex.map { case ((u, day, _), i) =>
        val lo = day.minusMonths(bMo); val hi = day.plusMonths(aMo)
        val w = rows.filter { case (u2, b2, _) =>
          u2 == u && !b2.isBefore(lo) && !b2.isAfter(hi) }.map(_._3)
        i.toLong -> ((if (w.isEmpty) None else Some(w.sum), w.size.toLong,
          w.minOption, w.maxOption))
      }.toMap
      got == want
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }

  test(".complete gates edge-truncated month windows to NULL") {
    import graft.operators.TidierOps._
    import graft.operators.Frame
    val rows = Seq(
      (1L, d("2023-01-10"), 1.0), (2L, d("2023-02-15"), 2.0),
      (3L, d("2023-03-20"), 4.0), (4L, d("2023-04-25"), 8.0))
      .toDF("event_id", "dt", "value").withColumn("user_id", lit(1L))
    val got = rows.mutateW("wc" -> count(col("value")))(
        by = Seq(col("user_id")), frame = Some(Frame.months(1, 0)),
        index = Some(col("dt")), complete = true)
      .select($"event_id", $"wc").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    // group span = [Jan 10, Apr 25]; a window [d-1mo, d] is complete iff
    // d-1mo >= Jan 10 — so Jan 10 (lo = Dec 10) is truncated → NULL.
    // Rows sit > 1 month apart, so each complete window holds itself only.
    assert(got == Map(1L -> None, 2L -> Some(1L), 3L -> Some(1L),
      4L -> Some(1L)))
  }

  test("NULL values: skipped by sum/count/avg/min/max, all-null window = NULL") {
    import graft.operators.TidierOps._
    import graft.operators.Frame
    val rows = Seq(
      (1L, d("2023-01-10"), Option(2.0)), (2L, d("2023-01-15"), Option.empty[Double]),
      (3L, d("2023-01-20"), Option(6.0)), (4L, d("2023-03-10"), Option.empty[Double]))
      .toDF("event_id", "dt", "value").withColumn("user_id", lit(1L))
    val got = rows.mutateW("wc" -> count(col("value")), "ws" -> sum(col("value")),
        "wmn" -> min(col("value")), "wa" -> count(lit(1)))(
        by = Seq(col("user_id")), frame = Some(Frame.months(1, 0)),
        index = Some(col("dt")))
      .select($"event_id", $"wc", $"ws", $"wmn", $"wa").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), Option(r.get(2)), Option(r.get(3)), r.getLong(4)))).toMap
    // row 4's window [Feb 10, Mar 10] holds only itself (null value):
    // count 0, sum/min NULL, count(*) 1
    assert(got(4L) == ((0L, None, None, 1L)))
    // row 3's window catches rows 1-3; the null at Jan 15 is skipped
    assert(got(3L) == ((2L, Some(8.0), Some(2.0), 3L)))
  }

  test("mutateSE months frame: string keys + restored input order") {
    import graft.operators.TidierOps._
    import graft.operators.Frame
    // deliberately shuffled input order; mutateSE must restore it
    val rows = Seq(
      (3L, 1L, d("2023-03-15"), 4.0), (1L, 1L, d("2023-01-15"), 1.0),
      (2L, 1L, d("2023-02-10"), 2.0))
      .toDF("event_id", "user_id", "dt", "value")
    val out = rows.mutateSE("ws" -> sum(col("value")))(
      by = Seq("user_id"), frame = Some(Frame.months(1, 0)), index = Some("dt"))
    assert(out.select("event_id").collect().map(_.getLong(0)).toSeq ==
      Seq(3L, 1L, 2L))
    val m = out.select($"event_id", $"ws").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // Mar 15's window starts Feb 15 — Feb 10 falls OUTSIDE it
    assert(m == Map(1L -> 1.0, 2L -> 3.0, 3L -> 4.0))
  }

  test("no-by (global) month window works — empty key as-of sweep") {
    import graft.operators.TidierOps._
    import graft.operators.Frame
    val rows = Seq(
      (1L, d("2023-01-10"), 1.0), (2L, d("2023-01-25"), 2.0),
      (3L, d("2023-02-20"), 4.0), (4L, d("2023-03-05"), 8.0))
      .toDF("event_id", "dt", "value")
    val got = rows.mutateW("ws" -> sum(col("value")))(
        frame = Some(Frame.months(1, 0)), index = Some(col("dt")))
      .select($"event_id", $"ws").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // windows: Jan10→{1}, Jan25→{1,2}, Feb20→{2,4} (Jan25 ≥ Jan20),
    // Mar5→{3,4} (Feb20 ≥ Feb5)
    assert(got == Map(1L -> 1.0, 2L -> 3.0, 3L -> 6.0, 4L -> 12.0))
  }

  test("property: stddev/variance over month frames == brute force on gapped dates") {
    import graft.operators.TidierOps._
    import graft.operators.Frame
    import org.scalacheck.{Gen, Test => SCTest}
    import org.scalacheck.Prop.forAll
    val gen = for {
      n <- Gen.choose(0, 25)
      rows <- Gen.listOfN(n, for {
        u <- Gen.choose(0L, 2L)
        off <- Gen.choose(0, 430)
        v <- Gen.choose(-4, 9).map(_.toDouble)
      } yield (u, java.time.LocalDate.of(2023, 12, 15).plusDays(off), v))
      m <- Gen.choose(0, 2)
    } yield (rows, m)
    val prop = forAll(gen) { case (rows, m) =>
      val df = rows.zipWithIndex.map { case ((u, day, v), i) =>
        (i.toLong, u, java.sql.Date.valueOf(day), v)
      }.toDF("event_id", "user_id", "dt", "value")
      val got = df.mutateW(
          "wv" -> variance(col("value")), "wsd" -> stddev(col("value")))(
          by = Seq(col("user_id")),
          frame = Some(Frame.months(m, 0)), index = Some(col("dt")))
        .select($"event_id", $"wv", $"wsd").collect()
        .map(r => r.getLong(0) ->
          ((Option(r.get(1)).map(_.asInstanceOf[Double]),
            Option(r.get(2)).map(_.asInstanceOf[Double])))).toMap
      // brute-force sample variance per window (two-pass, no prefix
      // cancellation — the numerically independent formulation)
      val want = rows.zipWithIndex.map { case ((u, day, _), i) =>
        val lo = day.minusMonths(m)
        val w = rows.filter { case (u2, b, _) =>
          u2 == u && !b.isBefore(lo) && !b.isAfter(day) }.map(_._3)
        val v = if (w.size <= 1) None else {
          val mean = w.sum / w.size
          Some(w.map(x => (x - mean) * (x - mean)).sum / (w.size - 1))
        }
        i.toLong -> ((v, v.map(math.sqrt)))
      }.toMap
      got.keySet == want.keySet && got.forall { case (k, (gv, gs)) =>
        val (wv, ws) = want(k)
        def close(a: Option[Double], b: Option[Double]) = (a, b) match {
          case (None, None)       => true
          case (Some(x), Some(y)) => math.abs(x - y) <= 1e-9 * (1 + y.abs)
          case _                  => false
        }
        close(gv, wv) && close(gs, ws)
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: compound months+days frames == brute force on gapped dates") {
    import graft.operators.TidierOps._
    import graft.operators.Frame
    import org.scalacheck.{Gen, Test => SCTest}
    import org.scalacheck.Prop.forAll
    val gen = for {
      n <- Gen.choose(0, 25)
      rows <- Gen.listOfN(n, for {
        u <- Gen.choose(0L, 2L)
        off <- Gen.choose(0, 430)
        v <- Gen.choose(-4, 9).map(_.toDouble)
      } yield (u, java.time.LocalDate.of(2023, 12, 15).plusDays(off), v))
      bMo <- Gen.choose(0, 2)
      bD <- Gen.choose(2, 5)
      aD <- Gen.choose(-2, 3) // bD + aD >= 0 keeps the frame nonempty
    } yield (rows, bMo, bD, aD)
    val prop = forAll(gen) { case (rows, bMo, bD, aD) =>
      val df = rows.zipWithIndex.map { case ((u, day, v), i) =>
        (i.toLong, u, java.sql.Date.valueOf(day), v)
      }.toDF("event_id", "user_id", "dt", "value")
      val got = df.mutateW(
          "ws" -> sum(col("value")), "wc" -> count(col("value")),
          "wmx" -> max(col("value")))(
          by = Seq(col("user_id")),
          frame = Some(Frame.monthsDays(bMo, bD, 0, aD)),
          index = Some(col("dt")))
        .select($"event_id", $"ws", $"wc", $"wmx").collect()
        .map(r => r.getLong(0) ->
          ((Option(r.get(1)), r.getLong(2), Option(r.get(3))))).toMap
      // lubridate order: months applied first, then days —
      // date_add(add_months(d, ±m), ±k)
      val want = rows.zipWithIndex.map { case ((u, day, _), i) =>
        val lo = day.minusMonths(bMo).minusDays(bD)
        val hi = day.plusDays(aD)
        val w = rows.filter { case (u2, b, _) =>
          u2 == u && !b.isBefore(lo) && !b.isAfter(hi) }.map(_._3)
        i.toLong -> ((if (w.isEmpty) None else Some(w.sum), w.size.toLong,
          w.maxOption))
      }.toMap
      got == want
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: months+seconds frames == brute force on random " +
      "timestamps (incl. strict mode)") {
    import graft.operators.TidierOps._
    import graft.operators.Frame
    import org.scalacheck.{Gen, Test => SCTest}
    import org.scalacheck.Prop.forAll
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val base = java.time.LocalDateTime.of(2023, 12, 15, 0, 0, 0)
    val gen = for {
      n <- Gen.choose(0, 25)
      rows <- Gen.listOfN(n, for {
        u <- Gen.choose(0L, 2L)
        offMin <- Gen.choose(0L, 430L * 24 * 60) // minute grid, ~14 months
        v <- Gen.choose(-4, 9).map(_.toDouble)
      } yield (u, base.plusMinutes(offMin), v))
      bMo <- Gen.choose(0, 2)
      bH <- Gen.choose(1, 30)
      // keep the frame statically nonempty: monthsAgg's emptiness check
      // uses a 28-day bound for negative month spans, so with bMo >= 0
      // it requires bMo*31*24 + bH + aH >= 0 — generate aH above -bH
      // so the constraint holds for every bMo
      aH <- Gen.choose(-bH + 1, 10)
      strict <- Gen.oneOf(true, false)
    } yield (rows, bMo, bH, aH, strict)
    val prop = forAll(gen) { case (rows, bMo, bH, aH, strict) =>
      val df = rows.zipWithIndex.map { case ((u, t, v), i) =>
        (i.toLong, u, java.sql.Timestamp.valueOf(t), v)
      }.toDF("event_id", "user_id", "t", "value")
      val frame0 = Frame.monthsHours(bMo, bH, 0, aH)
      val frame = if (strict) frame0.copy(strict = true) else frame0
      val got = df.mutateW(
          "ws" -> sum(col("value")), "wc" -> count(col("value")))(
          by = Seq(col("user_id")), frame = Some(frame),
          index = Some(col("t")))
        .select($"event_id", $"ws", $"wc").collect()
        .map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2)))))
        .toMap
      // lubridate order: months first (NA/clamp on the date), then hours
      val want = rows.zipWithIndex.map { case ((u, t, _), i) =>
        val clamped = bMo != 0 &&
          t.minusMonths(bMo).getDayOfMonth != t.getDayOfMonth
        if (strict && clamped) i.toLong -> ((None, None))
        else {
          val lo = t.minusMonths(bMo).minusHours(bH)
          val hi = t.plusHours(aH)
          val w = rows.filter { case (u2, b, _) =>
            u2 == u && !b.isBefore(lo) && !b.isAfter(hi) }.map(_._3)
          i.toLong -> ((if (w.isEmpty) None else Some(w.sum),
            Some(w.size.toLong)))
        }
      }.toMap
      got == want
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }

  test("general expansion path: median/percentile route automatically, " +
      "empty windows yield NULL/0, padding rows not counted") {
    import graft.operators.TidierOps._
    import graft.operators.Frame
    // offset frame c(months(2), months(-1)) — the current month is
    // excluded, so isolated rows have EMPTY windows (the left-join
    // padding case: count must be 0, not the padding-row count)
    val rows = Seq(
      (1L, d("2023-01-15"), 1.0), (2L, d("2023-02-10"), 2.0),
      (3L, d("2023-02-20"), 6.0), (4L, d("2023-03-15"), 4.0),
      (5L, d("2023-08-01"), 9.0)) // isolated: empty window
      .toDF("event_id", "dt", "value").withColumn("user_id", lit(1L))
    val got = rows.mutateW(
        "med" -> expr("median(value)"), "n" -> count(lit(1)),
        "s" -> sum(col("value")))(
        by = Seq(col("user_id")), frame = Some(Frame.months(2, -1)),
        index = Some(col("dt")))
      .select($"event_id", $"med", $"n", $"s").collect()
      .map(r => r.getLong(0) ->
        ((Option(r.get(1)), r.getLong(2), Option(r.get(3))))).toMap
    // row 4 (Mar 15): window [Jan 15, Feb 15] catches rows 1, 2 →
    // median (1+2)/2 = 1.5; row 3 (Feb 20): window [Dec 20, Jan 20]
    // catches row 1 only; rows 1, 5: empty windows
    assert(got(4L) == ((Some(1.5), 2L, Some(3.0))))
    assert(got(3L) == ((Some(1.0), 1L, Some(1.0))))
    assert(got(1L) == ((None, 0L, None)))
    assert(got(5L) == ((None, 0L, None)))
  }

  test("grouped quantile sweep: BINARY group keys compare by value, " +
      "not reference") {
    import graft.operators.TidierOps._
    import graft.operators.Frame
    // BinaryType keys surface as Array[Byte] in the sweep's group-
    // boundary check; reference equality would fragment every row into
    // its own group and silently shrink each window to one day
    // (round-9 review finding — this pins the value-equality fix).
    val rows = Seq(
      (1L, d("2023-01-10"), 1.0, "k1"), (2L, d("2023-01-20"), 3.0, "k1"),
      (3L, d("2023-02-05"), 5.0, "k1"), (4L, d("2023-01-12"), 7.0, "k2"))
      .toDF("event_id", "dt", "value", "ks")
      .withColumn("k", col("ks").cast("binary")).drop("ks")
    val got = rows.mutateW("med" -> expr("median(value)"))(
        by = Seq(col("k")), frame = Some(Frame.months(1, 0)),
        index = Some(col("dt")))
      .select($"event_id", $"med").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // k1, Feb 5: [Jan 5, Feb 5] holds {1, 3, 5} → median 3; a
    // fragmented group would report 5 (its own day only)
    assert(got(3L) == 3.0)
    assert(got(2L) == 2.0) // k1, Jan 20: [Dec 20, Jan 20] = {1, 3}
    assert(got(1L) == 1.0)
    assert(got(4L) == 7.0)
    // ±0.0 double keys are ONE group in Spark groupBy semantics, but
    // boxed Double.equals(-0.0, 0.0) is false — the canonicalizer must
    // normalize the sign of zero too
    val zgot = Seq((1L, d("2023-01-10"), 1.0, 0.0),
        (2L, d("2023-01-20"), 3.0, -0.0))
      .toDF("event_id", "dt", "value", "k")
      .mutateW("med" -> expr("median(value)"))(
        by = Seq(col("k")), frame = Some(Frame.months(1, 0)),
        index = Some(col("dt")))
      .select($"event_id", $"med").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(zgot(2L) == 2.0, "±0.0 keys fragmented: " + zgot) // median(1,3)
  }

  test("quantile sweep: non-dyadic p is bit-identical to Spark's own " +
      "percentile (0-based position), multi-p shares one sorted array") {
    import graft.operators.CalendarWindow.{MonthsAggSpec, MonthsOp}
    // trailing-month window at the last row holds all four values;
    // p = 0.3 is NOT dyadic, so the 1-based 1+(n−1)p form would be an
    // ulp off Spark's percentile() — this pins the 0-based replay
    val rows = Seq(
      (1L, d("2023-01-10"), 10.0), (2L, d("2023-01-15"), 1.0),
      (3L, d("2023-01-20"), 7.0), (4L, d("2023-01-25"), 3.0))
      .toDF("event_id", "dt", "value").withColumn("user_id", lit(1L))
    val got = graft.operators.CalendarWindow.monthsAgg(rows,
        by = Seq("user_id"), index = col("dt"),
        specs = Seq(MonthsAggSpec("q30", MonthsOp.Quantile(0.3), "value"),
          MonthsAggSpec("q75", MonthsOp.Quantile(0.75), "value")),
        before = 1, after = 0)
      .filter($"event_id" === 4L)
      .select($"q30", $"q75").head
    val want = spark.sql(
      """SELECT percentile(v, 0.3), percentile(v, 0.75)
         FROM (VALUES (10.0), (1.0), (7.0), (3.0)) AS t(v)""").head
    assert(got.getDouble(0) == want.getDouble(0), "p=0.3 ulp divergence")
    assert(got.getDouble(1) == want.getDouble(1), "p=0.75 divergence")
  }

  test("general expansion path: .complete gate + NULL index day survives") {
    import graft.operators.TidierOps._
    import graft.operators.Frame
    val rows = Seq(
      (1L, Option(d("2023-01-10")), 1.0), (2L, Option(d("2023-02-15")), 2.0),
      (3L, Option(d("2023-03-20")), 4.0), (4L, Option.empty[java.sql.Date], 8.0))
      .toDF("event_id", "dt", "value").withColumn("user_id", lit(1L))
    val got = rows.mutateW("med" -> expr("median(value)"))(
        by = Seq(col("user_id")), frame = Some(Frame.months(1, 0)),
        index = Some(col("dt")), complete = true)
      .select($"event_id", $"med").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    // all 4 input rows survive (incl. the NULL index day, as a row with
    // NULL output); Jan 10's window is edge-truncated → NULL
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    assert(got(1L).isEmpty)
    assert(got(2L) == Some(2.0) && got(3L) == Some(4.0))
    assert(got(4L).isEmpty)
  }

  test("empty compound frames are rejected; clamping note case") {
    import graft.operators.TidierOps._
    import graft.operators.Frame
    val rows = Seq((1L, d("2023-03-31"), 1.0))
      .toDF("event_id", "dt", "value").withColumn("user_id", lit(1L))
    // [d + 2d, d - 2d] is empty for every date → rejected at build
    intercept[IllegalArgumentException] {
      rows.mutateW("ws" -> sum(col("value")))(
        by = Seq(col("user_id")),
        frame = Some(Frame.monthsDays(0, -2, 0, -2)),
        index = Some(col("dt"))).collect()
    }
    // month-end clamp composes with the day offset: Mar 31 − 1mo = Feb 28
    // (clamped), then −3d = Feb 25 — NOT Mar 31 − 34d = Feb 25... (equal
    // here) — use Jan 31: −1mo = Dec 31, −3d = Dec 28
    val r2 = Seq((1L, d("2023-01-31"), 1.0), (2L, d("2022-12-28"), 2.0),
      (3L, d("2022-12-27"), 4.0))
      .toDF("event_id", "dt", "value").withColumn("user_id", lit(1L))
    val got = r2.mutateW("ws" -> sum(col("value")))(
        by = Seq(col("user_id")),
        frame = Some(Frame.monthsDays(1, 3, 0, 0)),
        index = Some(col("dt")))
      .select($"event_id", $"ws").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // Jan 31 window = [Dec 28, Jan 31]: catches Dec 28 but not Dec 27
    assert(got(1L) == 3.0)
  }

  test("strict-lubridate mode: clamped month-end boundaries yield NULL " +
      "on both evaluation paths") {
    import graft.operators.{Frame, TidierOps}
    import TidierOps.TidierDF
    // Mar 29/30/31 clamp back to Feb 28 (lubridate NA); Mar 15 and
    // Feb 28 do not. May 31 clamps (Apr 31 missing); May 30 doesn't.
    val rows = Seq(
      (1L, d("2023-02-28"), 1.0), (2L, d("2023-03-15"), 2.0),
      (3L, d("2023-03-31"), 4.0), (4L, d("2023-05-30"), 8.0),
      (5L, d("2023-05-31"), 16.0), (6L, d("2023-03-30"), 32.0))
      .toDF("event_id", "dt", "value").withColumn("user_id", lit(1L))
    // prefix path (sum/count)
    val strictRes = rows.mutateW("c" -> count(col("value")),
        "s" -> sum(col("value")))(
        by = Seq(col("user_id")),
        frame = Some(Frame.monthsStrict(1, 0)),
        index = Some(col("dt")))
      .select($"event_id", $"c", $"s").collect()
      .map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2)))))
      .toMap
    assert(strictRes(3L) == ((None, None)), "Mar 31 must be lubridate-NA")
    assert(strictRes(5L) == ((None, None)), "May 31 must be lubridate-NA")
    assert(strictRes(6L) == ((None, None)), "Mar 30 must be lubridate-NA")
    assert(strictRes(1L)._1.contains(1L) && strictRes(2L)._1.contains(2L)
      && strictRes(4L)._1.contains(1L),
      s"unclamped rows keep their windows: $strictRes")
    // general expansion path (median routes through monthsAggGeneral)
    val strictMed = rows.mutateW("m" -> expr("median(value)"))(
        by = Seq(col("user_id")),
        frame = Some(Frame.monthsStrict(1, 0)),
        index = Some(col("dt")))
      .select($"event_id", $"m").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(strictMed(3L).isEmpty && strictMed(5L).isEmpty
      && strictMed(6L).isEmpty)
    assert(strictMed(2L).contains(1.5)) // median(1.0, 2.0) over [Feb 15, Mar 15]
    // default mode keeps warehouse clamping (no NULLs)
    val clamped = rows.mutateW("c" -> count(col("value")))(
        by = Seq(col("user_id")),
        frame = Some(Frame.months(1, 0)),
        index = Some(col("dt")))
      .select($"event_id", $"c").collect()
    assert(clamped.forall(r => !r.isNullAt(1)))
    // strict is month-frame-only
    val ex = intercept[IllegalArgumentException] {
      rows.mutateW("c" -> count(col("value")))(
        by = Seq(col("user_id")),
        frame = Some(Frame(graft.operators.FrameEndpoint.Days(3),
          graft.operators.FrameEndpoint.Days(0), strict = true)),
        index = Some(col("dt"))).collect()
    }
    assert(ex.getMessage.contains("month"))
  }

  test("months+hours compound frames == brute force (seconds path), " +
      "incl. clamp, strict NA and count(*)") {
    import graft.operators.{Frame, TidierOps}
    import TidierOps.TidierDF
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // wall times chosen so the ±hours endpoints decide membership and
    // Mar 31 18:00 exercises the month-end clamp (Feb 28 18:00)
    val data = Seq(
      (1L, "2023-02-28 17:00:00", 1.0),  // == Mar 31 lo - 1h → OUT of 4's window... depends
      (2L, "2023-02-28 19:00:00", 2.0),
      (3L, "2023-03-15 06:00:00", 4.0),
      (4L, "2023-03-31 18:00:00", 8.0),
      (5L, "2023-03-31 02:00:00", 16.0),
      (6L, "2023-01-31 23:00:00", 32.0))
    val rows = data.map { case (id, t, v) => (id, ts(t), v) }
      .toDF("event_id", "t", "value").withColumn("user_id", lit(1L))
    // frame c(months(1) + hours(6), hours(-12)):
    // window = [(t - 1mo) - 6h, t - 12h]
    val got = rows.mutateW("c" -> count(lit(1)), "s" -> sum(col("value")))(
        by = Seq(col("user_id")),
        frame = Some(Frame.monthsHours(1, 6, 0, -12)),
        index = Some(col("t")))
      .select($"event_id", $"c", $"s").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double]))))
      .toMap
    val parsed = data.map { case (id, t, v) =>
      (id, java.time.LocalDateTime.parse(t.replace(' ', 'T')), v) }
    val want = parsed.map { case (id, t, _) =>
      val lo = t.minusMonths(1).minusHours(6)
      val hi = t.minusHours(12)
      val in = parsed.filter { case (_, b, _) =>
        !b.isBefore(lo) && !b.isAfter(hi) }
      id -> ((in.size.toLong,
        if (in.isEmpty) None else Some(in.map(_._3).sum)))
    }.toMap
    assert(got == want)
    // clamp explicitly: row 4 (Mar 31 18:00) lo = Feb 28 12:00 → rows
    // 1 (17:00), 2 (19:00), 3 (Mar 15) IN; hi = Mar 31 06:00 → row 5 IN
    assert(got(4L)._1 == 4L)
    // strict mode: the two Mar 31 rows are lubridate-NA, others keep
    val strictGot = rows.mutateW("c" -> count(lit(1)))(
        by = Seq(col("user_id")),
        frame = Some(Frame(
          graft.operators.FrameEndpoint.MonthsSeconds(1, 21600),
          graft.operators.FrameEndpoint.MonthsSeconds(0, -43200),
          strict = true)),
        index = Some(col("t")))
      .select($"event_id", $"c").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(strictGot(4L).isEmpty && strictGot(5L).isEmpty)
    assert(strictGot(3L).contains(2L) || strictGot(3L).nonEmpty)
    // .complete gating on the seconds path: NULL exactly when the
    // window's value span [t-1mo-6h, t-12h] leaves the group's
    // observed [min ts, max ts]
    val completeGot = rows.mutateW("c" -> count(lit(1)))(
        by = Seq(col("user_id")),
        frame = Some(Frame.monthsHours(1, 6, 0, -12)),
        index = Some(col("t")), complete = true)
      .select($"event_id", $"c").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val tsMin = parsed.map(_._2).min
    val tsMax = parsed.map(_._2).max
    parsed.foreach { case (id, t, _) =>
      val lo = t.minusMonths(1).minusHours(6)
      val hi = t.minusHours(12)
      val inside = !lo.isBefore(tsMin) && !hi.isAfter(tsMax)
      assert(completeGot(id).isDefined == inside,
        s"row $id: complete gate expected inside=$inside, got " +
          s"${completeGot(id)}")
    }
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
