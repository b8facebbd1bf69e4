package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsofJoin._

class AsofJoinSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  import spark.implicits._

  // left: (k, t, tag) — right: (k, t, v)
  private lazy val left = Seq(
    ("a", 5L, "l1"), ("a", 10L, "l2"), ("a", 20L, "l3"),
    ("b", 7L, "l4"), ("c", 1L, "l5")).toDF("k", "lt", "tag")
  private lazy val right = Seq(
    ("a", 5L, 1.0), ("a", 15L, 2.0), ("b", 3L, 4.0)).toDF("k", "rt", "v")

  private def collectMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(2) ->
      (Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Double]))).toMap

  test("backward inclusive: right row at equal time matches") {
    val out = asofBackward(left, right, Seq("k"), "lt", "rt", Seq("v"))
      .select("k", "lt", "tag", "matched_time", "v")
    assert(collectMap(out) == Map(
      "l1" -> (Some(5L), Some(1.0)),   // equal time visible
      "l2" -> (Some(5L), Some(1.0)),
      "l3" -> (Some(15L), Some(2.0)),
      "l4" -> (Some(3L), Some(4.0)),
      "l5" -> (None, None)))           // no right rows for key c
  }

  test("backward strict: right row at equal time is invisible") {
    val out = asofBackward(left, right, Seq("k"), "lt", "rt", Seq("v"),
      strict = true)
      .select("k", "lt", "tag", "matched_time", "v")
    assert(collectMap(out) == Map(
      "l1" -> (None, None),            // rt=5 not < 5
      "l2" -> (Some(5L), Some(1.0)),
      "l3" -> (Some(15L), Some(2.0)),
      "l4" -> (Some(3L), Some(4.0)),
      "l5" -> (None, None)))
  }

  test("tolerance nulls matches farther back than the bound") {
    val out = asofBackward(left, right, Seq("k"), "lt", "rt", Seq("v"),
      tolerance = Some(lit(5L)))
      .select("k", "lt", "tag", "matched_time", "v")
    assert(collectMap(out) == Map(
      "l1" -> (Some(5L), Some(1.0)),   // gap 0 ≤ 5
      "l2" -> (Some(5L), Some(1.0)),   // gap 5 ≤ 5
      "l3" -> (Some(15L), Some(2.0)),  // gap 5 ≤ 5
      "l4" -> (Some(3L), Some(4.0)),   // gap 4 ≤ 5
      "l5" -> (None, None)))
  }

  test("forward inclusive: right row at equal time matches; else nearest after") {
    val out = asofForward(left, right, Seq("k"), "lt", "rt", Seq("v"))
      .select("k", "lt", "tag", "matched_time", "v")
    assert(collectMap(out) == Map(
      "l1" -> (Some(5L), Some(1.0)),   // equal time visible
      "l2" -> (Some(15L), Some(2.0)),  // next right at 15
      "l3" -> (None, None),            // nothing after 20
      "l4" -> (None, None),            // b's only right row is before 7
      "l5" -> (None, None)))
  }

  test("forward strict: right row at equal time is invisible") {
    val out = asofForward(left, right, Seq("k"), "lt", "rt", Seq("v"),
      strict = true)
      .select("k", "lt", "tag", "matched_time", "v")
    assert(collectMap(out) == Map(
      "l1" -> (Some(15L), Some(2.0)),  // rt=5 not > 5 → next one
      "l2" -> (Some(15L), Some(2.0)),
      "l3" -> (None, None),
      "l4" -> (None, None),
      "l5" -> (None, None)))
  }

  test("forward tolerance bounds rt - lt") {
    val out = asofForward(left, right, Seq("k"), "lt", "rt", Seq("v"),
      strict = true, tolerance = Some(lit(5L)))
      .select("k", "lt", "tag", "matched_time", "v")
    assert(collectMap(out) == Map(
      "l1" -> (None, None),            // gap 10 > 5
      "l2" -> (Some(15L), Some(2.0)),  // gap 5 ≤ 5
      "l3" -> (None, None),
      "l4" -> (None, None),
      "l5" -> (None, None)))
  }

  test("a matched right row with a NULL value yields NULL, not an older value") {
    // right: (a, t=1, v=5), (a, t=2, v=NULL); left at t=3 must match the
    // t=2 row — value NULL, matched_time 2 — not resurrect v=5 from t=1
    val l = Seq(("a", 3L, "x")).toDF("k", "lt", "tag")
    val r = Seq(("a", 1L, Some(5.0)), ("a", 2L, None)).toDF("k", "rt", "v")
    val out = asofBackward(l, r, Seq("k"), "lt", "rt", Seq("v"))
      .select("matched_time", "v").collect()(0)
    assert(out.getLong(0) == 2L)
    assert(out.isNullAt(1))
  }

  test("valueCols overlapping keys or left columns are rejected") {
    val l = Seq(("a", 3L, 1.0)).toDF("k", "lt", "v")
    val r = Seq(("a", 1L, 5.0)).toDF("k", "rt", "v")
    intercept[IllegalArgumentException] { // v exists on left
      asofBackward(l, r, Seq("k"), "lt", "rt", Seq("v"))
    }
    intercept[IllegalArgumentException] { // key as value col
      asofBackward(l.drop("v"), r, Seq("k"), "lt", "rt", Seq("k"))
    }
  }

  test("nearest: closer side wins, backward preferred on exact tie") {
    // l2 at t=10: backward (5, dist 5) ties forward (15, dist 5) -> bwd;
    // l3 at t=20: backward 15 (dist 5) is the only side; l1 at t=5
    // inclusive: backward at equal time (dist 0) beats forward 15
    val out = asofNearest(left, right, Seq("k"), "lt", "rt", Seq("v"))
      .select("k", "lt", "tag", "matched_time", "v")
    assert(collectMap(out) == Map(
      "l1" -> (Some(5L), Some(1.0)),   // dist 0 backward
      "l2" -> (Some(5L), Some(1.0)),   // 5-vs-5 tie -> backward
      "l3" -> (Some(15L), Some(2.0)),
      "l4" -> (Some(3L), Some(4.0)),
      "l5" -> (None, None)))
    // strict: l1's equal-time backward row is invisible -> forward 15
    val st = asofNearest(left, right, Seq("k"), "lt", "rt", Seq("v"),
      strict = true)
      .select("k", "lt", "tag", "matched_time", "v")
    assert(collectMap(st)("l1") == (Some(15L), Some(2.0)))
  }

  test("plan: one hash exchange, no broadcast, no range-probe join") {
    val out = asofBackward(left, right, Seq("k"), "lt", "rt", Seq("v"))
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      s"as-of degenerated into a range probe:\n$p")
    assert(p.split("Exchange hashpartitioning").length - 1 == 1,
      s"expected exactly one shuffle:\n$p")
  }
}
