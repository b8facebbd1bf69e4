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

  test("interval-overlap join equals the naive pair scan, each pair ONCE") {
    val gen = for {
      na <- Gen.choose(0, 15); nb <- Gen.choose(0, 15)
      mk = for {
        k <- Gen.oneOf("a", "b"); lo <- Gen.choose(0L, 60L)
        span <- Gen.choose(0L, 20L)
      } yield (k, lo, lo + span)
      as <- Gen.listOfN(na, mk); bs <- Gen.listOfN(nb, mk)
      w <- Gen.choose(1L, 25L)
    } yield (as, bs, w)
    check(forAll(gen) { case (as, bs, w) =>
      val l = as.zipWithIndex.map { case ((k, lo, hi), i) =>
        (k, lo, hi, i.toLong) }.toDF("k", "lo", "hi", "aid")
      val r = bs.zipWithIndex.map { case ((k, lo, hi), i) =>
        (k, lo, hi, i.toLong) }.toDF("k", "lo", "hi", "bid")
      // collect as a LIST, not a set — duplicate emissions must fail
      val got = RangeJoin.intervalOverlapJoin(l, r, Seq("k"),
          "lo", "hi", "lo", "hi", binWidth = w)
        .select("aid_1", "bid_2").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSeq.sorted
      val want = (for {
        ((ak, alo, ahi), ai) <- as.zipWithIndex
        ((bk, blo, bhi), bi) <- bs.zipWithIndex
        if ak == bk && ahi >= blo && bhi >= alo
      } yield (ai.toLong, bi.toLong)).sorted
      got == want
    })
  }

  test("autoBinWidth: p75 of lengths, floored at 1, safe on empty input") {
    // lengths 1..100 uniformly -> p75 = 75
    val iv = spark.range(100).select(col("id").as("lo"),
      (col("id") + col("id") + 1).as("hi")) // hi - lo = id + 1 in 1..100
    val w = RangeJoin.autoBinWidth(iv, "lo", "hi")
    assert(w >= 70 && w <= 80, s"p75 of 1..100 should be ~75, got $w")
    // all-zero-length intervals floor at 1 (a 0 bin width would divide
    // by zero downstream)
    val zero = spark.range(5).select(col("id").as("lo"), col("id").as("hi"))
    assert(RangeJoin.autoBinWidth(zero, "lo", "hi") == 1L)
    // empty input floors at 1 as well (percentile of nothing is NULL)
    val empty = iv.filter(col("lo") < 0)
    assert(RangeJoin.autoBinWidth(empty, "lo", "hi") == 1L)
  }

  test("overlap join plan is an equi join, not a nested loop") {
    val l = Seq(("a", 0L, 9L, 1L)).toDF("k", "lo", "hi", "aid")
    val r = Seq(("a", 5L, 15L, 2L)).toDF("k", "lo", "hi", "bid")
    val out = RangeJoin.intervalOverlapJoin(l, r, Seq("k"),
      "lo", "hi", "lo", "hi", 8)
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      s"overlap join degenerated:\n$p")
  }
}
