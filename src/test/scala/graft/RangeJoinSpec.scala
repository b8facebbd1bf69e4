package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.forAll
import graft.operators.RangeJoin

class RangeJoinSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(12).withWorkers(1)
    val res = SCTest.check(params, p)
    assert(res.passed, res.status.toString)
  }

  test("binned interval join equals the naive non-equi join (random data)") {
    val gen = for {
      np <- Gen.choose(1, 20); ni <- Gen.choose(0, 10)
      ps <- Gen.listOfN(np, for {
        k <- Gen.oneOf("a", "b"); t <- Gen.choose(0L, 50L)
      } yield (k, t))
      is <- Gen.listOfN(ni, for {
        k <- Gen.oneOf("a", "b"); lo <- Gen.choose(0L, 50L)
        span <- Gen.choose(0L, 15L); id <- Gen.choose(0, 999)
      } yield (k, lo, lo + span, id.toLong))
    } yield (ps, is)
    check(forAll(gen) { case (ps, is) =>
      val points = ps.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
        .toDF("k", "t", "pid")
      val ivals = is.toDF("k", "lo", "hi", "iid")
      val got = RangeJoin.intervalJoin(points, ivals, Seq("k"), "t", "lo", "hi",
          binWidth = 7)
        .select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (for {
        (pk, t, pid) <- ps.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
        (ik, lo, hi, iid) <- is if ik == pk && t >= lo && t <= hi
      } yield (pid, iid)).toSet
      got == want
    })
  }

  test("plan is an equi join on (key, bin), not a nested loop") {
    val points = Seq(("a", 10L, 1L)).toDF("k", "t", "pid")
    val ivals = Seq(("a", 5L, 15L, 1L)).toDF("k", "lo", "hi", "iid")
    val out = RangeJoin.intervalJoin(points, ivals, Seq("k"), "t", "lo", "hi", 10)
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      s"range join degenerated:\n$p")
  }

  test("boundary inclusivity: both endpoints match") {
    val points = Seq(("a", 5L, 1L), ("a", 15L, 2L), ("a", 4L, 3L),
      ("a", 16L, 4L)).toDF("k", "t", "pid")
    val ivals = Seq(("a", 5L, 15L, 9L)).toDF("k", "lo", "hi", "iid")
    val got = RangeJoin.intervalJoin(points, ivals, Seq("k"), "t",
        "lo", "hi", 4)
      .select("pid").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L))
  }
}
