package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.PlanAudit

/** PlanAudit fires on the shapes it names and stays quiet on the plans
  * the repo actually ships (spot-checked on live headline queries). */
class PlanAuditSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("flags a cartesian product as Error") {
    val a = Seq(1, 2, 3).toDF("x")
    val b = Seq(4, 5).toDF("y")
    val f = PlanAudit.audit(a.crossJoin(b))
    assert(f.exists(x => x.rule == "cartesian" || x.rule == "bnl_join"),
      f.toString)
    // and allow() suppresses it (the declared-baseline escape hatch)
    assert(PlanAudit.audit(a.crossJoin(b),
      allow = Set("cartesian", "bnl_join")).isEmpty)
  }

  test("flags an unpartitioned window as Warn") {
    val df = spark.range(100).toDF("id")
      .select(col("id"), sum(col("id")).over(
        Window.orderBy("id")
          .rowsBetween(Window.unboundedPreceding, 0)).as("cs"))
    val f = PlanAudit.audit(df)
    assert(f.exists(_.rule == "global_window"), f.toString)
  }

  test("a partitioned window raises no global_window finding") {
    val df = spark.range(100)
      .select(col("id"), pmod(col("id"), lit(7)).as("k"))
      .select(col("id"), sum(col("id")).over(
        Window.partitionBy("k").orderBy("id")
          .rowsBetween(Window.unboundedPreceding, 0)).as("cs"))
    assert(!PlanAudit.audit(df).exists(_.rule == "global_window"))
  }

  test("shipped headline queries audit clean of Error findings") {
    // the whole point: the repo's own plans pass their own linter.
    // ann_cosine_topk's capped brute-force baseline is the declared
    // broadcast-cross-join exception.
    val keys = Seq("window_rolling_corr", "asof_nearest_daily",
      "dedup_jaccard", "graph_triangles", "ts_interpolate", "dq_checks")
    keys.foreach { k =>
      val df = SparkEntry.queries(k)(spark, dir)
      assert(PlanAudit.clean(df), s"$k: ${PlanAudit.audit(df)}")
    }
  }
}
