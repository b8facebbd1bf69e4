package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Frame, FrameEndpoint, TidierOps}
import TidierOps._

/** Unit spec for the core windowed-mutate operator, one test per
  * decision-tree path of the reference (SURVEY.md §2.1, R/mutate.R:574-664)
  * plus the behavioral sub-contracts (overwrite, multi-expr, complete,
  * restore-order, negative `after` endpoints).
  */
class MutateWSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  // (group, order, value) — small enough to verify by hand.
  private lazy val df = Seq(
    ("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 30.0), ("a", 4, 40.0),
    ("b", 1, 1.0), ("b", 2, 2.0), ("b", 3, 3.0)
  ).toDF("g", "o", "v")

  private def rowsFor(d: org.apache.spark.sql.DataFrame, cols: String*) =
    d.orderBy("g", "o").select(cols.head, cols.tail: _*).collect().toSeq

  test("path 1: plain mutate, no window") {
    val out = df.mutateW("v2" -> ($"v" * 2))()
    assert(rowsFor(out, "v2").map(_.getDouble(0)) ==
      Seq(20.0, 40.0, 60.0, 80.0, 2.0, 4.0, 6.0))
  }

  test("path 4: .by only gives group-constant aggregate") {
    val out = df.mutateW("m" -> avg($"v"))(by = Seq($"g"))
    assert(rowsFor(out, "m").map(_.getDouble(0)) ==
      Seq(25.0, 25.0, 25.0, 25.0, 2.0, 2.0, 2.0))
  }

  test(".by + .order_by without frame gives running (cumulative) semantics") {
    val out = df.mutateW("cs" -> sum($"v"))(by = Seq($"g"), orderBy = Seq($"o"))
    assert(rowsFor(out, "cs").map(_.getDouble(0)) ==
      Seq(10.0, 30.0, 60.0, 100.0, 1.0, 3.0, 6.0))
  }

  test("path 5: finite rows frame c(1,1)") {
    val out = df.mutateW("m" -> avg($"v"))(
      by = Seq($"g"), orderBy = Seq($"o"), frame = Some(Frame.rows(1, 1)))
    assert(rowsFor(out, "m").map(_.getDouble(0)) ==
      Seq(15.0, 20.0, 30.0, 35.0, 1.5, 2.0, 2.5))
  }

  test("negative after endpoint shrinks the frame past the current row") {
    // c(2, -1) = [cur-2, cur-1]: trailing two rows excluding current.
    val out = df.mutateW("m" -> sum($"v"))(
      by = Seq($"g"), orderBy = Seq($"o"), frame = Some(Frame.rows(2, -1)))
    assert(rowsFor(out, "m").map(r => Option(r.get(0))) ==
      Seq(None, Some(10.0), Some(30.0), Some(50.0), None, Some(1.0), Some(3.0)))
  }

  test("negative before endpoint starts the frame past the current row") {
    // c(-1, 2) = [cur+1, cur+2]: leading two rows excluding current
    // (mirror of the negative-after contract, R/mutate.R:98-100).
    val out = df.mutateW("m" -> sum($"v"))(
      by = Seq($"g"), orderBy = Seq($"o"), frame = Some(Frame.rows(-1, 2)))
    assert(rowsFor(out, "m").map(r => Option(r.get(0))) ==
      Seq(Some(50.0), Some(70.0), Some(40.0), None, Some(5.0), Some(3.0),
        None))
  }

  test("path 2: frame without .by slides over input row order") {
    val single = df.filter($"g" === "a") // avoid cross-group order dependence
    val out = single.mutateW("s" -> sum($"v"))(frame = Some(Frame.rows(1, 0)))
    assert(out.orderBy("o").select("s").collect().map(_.getDouble(0)).toSeq ==
      Seq(10.0, 30.0, 50.0, 70.0))
  }

  test("path 3: range frame over an index column honors value gaps") {
    // days 1,2,5 — the gap means day 5's [d-2,d-1] window is empty.
    val idx = Seq(("a", "2024-01-01", 1.0), ("a", "2024-01-02", 2.0),
      ("a", "2024-01-05", 4.0)).toDF("g", "d", "v")
      .withColumn("d", to_date($"d"))
    val out = idx.mutateW("s" -> sum($"v"))(
      by = Seq($"g"), frame = Some(Frame.days(2, -1)), index = Some($"d"))
    assert(out.orderBy("d").select("s").collect().map(r => Option(r.get(0))).toSeq ==
      Seq(None, Some(1.0), None))
  }

  test("unitless numeric range frame slides over the index VALUES") {
    // index = v (a price-like axis, not time): frame [v-15, v-5] catches
    // values 10..25 behind the current one
    val out = df.mutateW("s" -> sum(col("v")))(
      by = Seq(col("g")), frame = Some(Frame.range(15, -5)),
      index = Some(col("v")))
      .select("g", "o", "s").collect()
      .map(r => (r.getString(0), r.getInt(1)) -> Option(r.get(2))).toMap
    // a: v=10 → [-5,5] none; v=20 → [5,15]: 10; v=30 → [15,25]: 20;
    // v=40 → [25,35]: 30. b: v=1 → none; v=2 → none (range [-13,-3]);
    // v=3 → [-12,-2]: none
    assert(out == Map(("a", 1) -> None, ("a", 2) -> Some(10.0),
      ("a", 3) -> Some(20.0), ("a", 4) -> Some(30.0),
      ("b", 1) -> None, ("b", 2) -> None, ("b", 3) -> None))
  }

  test("mixed-unit range frames are rejected") {
    intercept[IllegalArgumentException] {
      df.mutateW("s" -> sum(col("v")))(
        frame = Some(Frame(FrameEndpoint.Days(1), FrameEndpoint.Range(1))),
        index = Some(col("o"))).collect()
    }
  }

  test("Rows+Period endpoint mixes are rejected, not reinterpreted") {
    // a hand-built Frame(Rows, Days) must fail like Days+Seconds — the
    // reference requires both .frame endpoints share one class
    // (R/mutate.R:165); silently reading Rows(2) as a 2-unit value
    // offset on the index axis would be wrong
    intercept[IllegalArgumentException] {
      df.mutateW("s" -> sum(col("v")))(
        frame = Some(Frame(FrameEndpoint.Rows(2), FrameEndpoint.Days(1))),
        index = Some(col("o"))).collect()
    }
    // SQL renderer: same contract
    intercept[IllegalArgumentException] {
      graft.sql.SqlMutate.render("t", Seq("s" -> "sum(v)"),
        frame = Some(Frame(FrameEndpoint.Rows(2), FrameEndpoint.Days(1))),
        index = Some("o"))
    }
  }

  test("weeks/years Period sugar routes to days/months frames") {
    // weeks = 7 days exactly; years = 12 months exactly (lubridate
    // Period arithmetic, clamping included)
    assert(Frame.weeks(1, 0) == Frame.days(7, 0))
    assert(Frame.weeks(2, -1) == Frame.days(14, -7))
    assert(Frame.years(1, 0) == Frame.months(12, 0))
    assert(Frame.years(0, 2) == Frame.months(0, 24))
    // and the weeks frame evaluates — equal to the equivalent days frame
    val idx = Seq(("a", "2024-01-01", 1.0), ("a", "2024-01-05", 2.0),
      ("a", "2024-01-09", 4.0), ("a", "2024-02-01", 8.0))
      .toDF("g", "d", "v").withColumn("d", to_date($"d"))
    val a = idx.mutateW("s" -> sum(col("v")))(
      by = Seq(col("g")), frame = Some(Frame.weeks(1, 0)),
      index = Some(col("d"))).orderBy("d").select("s")
      .collect().map(_.getDouble(0)).toSeq
    assert(a == Seq(1.0, 3.0, 6.0, 8.0))
  }

  test("hours/minutes Period sugar routes to seconds frames") {
    // hours = 3600 s, minutes = 60 s exactly (Period arithmetic)
    assert(Frame.hours(1, 0) == Frame.seconds(3600, 0))
    assert(Frame.hours(2, -1) == Frame.seconds(7200, -3600))
    assert(Frame.minutes(30, 0) == Frame.seconds(1800, 0))
    // and an hours frame evaluates — trailing 1h window over timestamps
    val idx = Seq(("a", "2024-01-01 00:00:00", 1.0),
      ("a", "2024-01-01 00:30:00", 2.0), ("a", "2024-01-01 01:15:00", 4.0),
      ("a", "2024-01-01 03:00:00", 8.0))
      .toDF("g", "t", "v").withColumn("t", to_timestamp($"t"))
    val a2 = idx.mutateW("s" -> sum(col("v")))(
      by = Seq(col("g")), frame = Some(Frame.hours(1, 0)),
      index = Some(col("t"))).orderBy("t").select("s")
      .collect().map(_.getDouble(0)).toSeq
    assert(a2 == Seq(1.0, 3.0, 6.0, 8.0))
  }

  test("Inf endpoints: c(Inf, Inf) equals whole-group aggregate") {
    val out = df.mutateW("m" -> avg($"v"))(
      by = Seq($"g"), orderBy = Seq($"o"), frame = Some(Frame.unbounded))
    assert(rowsFor(out, "m").map(_.getDouble(0)) ==
      Seq(25.0, 25.0, 25.0, 25.0, 2.0, 2.0, 2.0))
  }

  test("same-name assignment overwrites the column (NEWS.md:8 bugfix)") {
    val out = df.mutateW("v" -> avg($"v"))(by = Seq($"g"))
    assert(out.columns.count(_ == "v") == 1)
    assert(rowsFor(out, "v").map(_.getDouble(0)) ==
      Seq(25.0, 25.0, 25.0, 25.0, 2.0, 2.0, 2.0))
  }

  test("multiple expressions share one window spec and one WindowExec") {
    val out = df.mutateW("s" -> sum($"v"), "c" -> count(lit(1)))(
      by = Seq($"g"), orderBy = Seq($"o"), frame = Some(Frame.rows(1, 0)))
    assert(rowsFor(out, "s").map(_.getDouble(0)) ==
      Seq(10.0, 30.0, 50.0, 70.0, 1.0, 3.0, 5.0))
    assert(rowsFor(out, "c").map(_.getLong(0)) == Seq(1L, 2L, 2L, 2L, 1L, 2L, 2L))
    // CollapseWindow must merge both exprs into a single Window node.
    val nWindows = out.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }.size
    assert(nWindows == 1, "expected one collapsed Window node")
  }

  test(".complete=TRUE nulls edge-truncated rows frames (R/mutate.R:58-62)") {
    val out = df.mutateW("m" -> avg($"v"))(
      by = Seq($"g"), orderBy = Seq($"o"), frame = Some(Frame.rows(1, 1)),
      complete = true)
    assert(rowsFor(out, "m").map(r => Option(r.get(0))) ==
      Seq(None, Some(20.0), Some(30.0), None, None, Some(2.0), None))
  }

  test(".complete=TRUE nulls range frames truncated by the index span") {
    val idx = Seq(("a", "2024-01-01", 1.0), ("a", "2024-01-02", 2.0),
      ("a", "2024-01-03", 4.0)).toDF("g", "d", "v")
      .withColumn("d", to_date($"d"))
    val out = idx.mutateW("s" -> sum($"v"))(
      by = Seq($"g"), frame = Some(Frame.days(1, 1)), index = Some($"d"),
      complete = true)
    // day 1: [d-1,d+1] starts before min(index) → incomplete; same for day 3.
    assert(out.orderBy("d").select("s").collect().map(r => Option(r.get(0))).toSeq ==
      Seq(None, Some(7.0), None))
  }

  test("restoreOrder=true returns rows in original input order (R/mutate.R:291)") {
    val shuffled = Seq(("a", 3, 30.0), ("a", 1, 10.0), ("a", 2, 20.0))
      .toDF("g", "o", "v")
    val out = shuffled.mutateW("cs" -> sum($"v"))(
      by = Seq($"g"), orderBy = Seq($"o"), restoreOrder = true)
    assert(out.select("o").collect().map(_.getInt(0)).toSeq == Seq(3, 1, 2))
    assert(out.select("cs").collect().map(_.getDouble(0)).toSeq ==
      Seq(60.0, 10.0, 30.0))
    assert(!out.columns.exists(_.startsWith("__tidier")))
  }

  test("desc ordering via col.desc (mutate_'s .desc flag)") {
    val out = df.mutateW("rn" -> row_number())(
      by = Seq($"g"), orderBy = Seq($"v".desc))
    assert(rowsFor(out, "rn").map(_.getInt(0)) == Seq(4, 3, 2, 1, 3, 2, 1))
  }

  test("mutateSE: string keys, recycled single .desc flag, order restored") {
    val shuffled = Seq(("a", 2, 20.0), ("a", 1, 10.0), ("b", 1, 1.0))
      .toDF("g", "o", "v")
    val out = shuffled.mutateSE("rn" -> row_number())(
      by = Seq("g"), orderBy = Seq("o"), desc = Seq(true))
    // desc order: within a, o=2 ranks 1, o=1 ranks 2; input order restored
    assert(out.select("o", "rn").collect().map(r =>
      (r.getInt(0), r.getInt(1))).toSeq == Seq((2, 1), (1, 2), (1, 1)))
  }

  test(".order_by ≠ .index on a range frame: values are order_by-invariant " +
      "(reference README example, R/mutate.R:96-101)") {
    // SURVEY §7.4 risk 2 resolution: range windows order on the INDEX —
    // frame membership is a function of the index alone, so any
    // .order_by (none, asc other col, desc other col) yields identical
    // values; with restoreOrder the row order is the input order either
    // way. Pinned per r07 verdict item 3 (the oracle sibling is
    // window_orderby_neq_index).
    val d = Seq(("a", 1, 1, 10.0), ("a", 2, 3, 30.0), ("a", 3, 4, 20.0),
      ("a", 4, 10, 40.0), ("b", 5, 2, 5.0), ("b", 6, 3, 7.0))
      .toDF("g", "rid", "day", "v")
    def run(ord: Seq[org.apache.spark.sql.Column]) =
      d.mutateW("s" -> sum($"v"))(
          by = Seq($"g"), orderBy = ord,
          frame = Some(Frame.range(2, 0)), index = Some($"day"),
          restoreOrder = true)
        .select("rid", "s").collect().map(r =>
          (r.getInt(0), r.getDouble(1))).toSeq
    val byIndex = run(Nil)
    assert(run(Seq($"v")) == byIndex)
    assert(run(Seq($"v".desc, $"rid")) == byIndex)
    // and the values are the gap-honoring range results, in input order
    assert(byIndex == Seq((1, 10.0), (2, 40.0), (3, 50.0), (4, 40.0),
      (5, 5.0), (6, 12.0)))
  }

  test("mutateSE: per-key .desc vector, length must match") {
    val out = df.mutateSE("rn" -> row_number())(
      by = Seq("g"), orderBy = Seq("o", "v"), desc = Seq(false, true))
    assert(out.count() == 7)
    intercept[IllegalArgumentException] {
      df.mutateSE("rn" -> row_number())(
        by = Seq("g"), orderBy = Seq("o", "v"), desc = Seq(true, false, true))
    }
  }
}
