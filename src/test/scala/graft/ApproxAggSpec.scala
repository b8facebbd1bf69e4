package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** agg_approx's oracle gate covers rows+schema+hash of (exact cardinality,
  * within-tolerance verdicts) — a hash can never compare the raw sketch
  * estimates themselves across engines. This spec pins the RAW estimates
  * to tighter error envelopes than the query's 10%/rank-decile verdicts. */
class ApproxAggSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get

  test("agg_approx verdicts all true; raw estimates within tight bounds") {
    val dir = "/root/testdata/sf0.01"
    val out = graft.queries.ExtendedQueries.queries("agg_approx")(spark, dir)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getBoolean(2) && r.getBoolean(3) && r.getBoolean(4),
        s"verdict false: $r")
    }
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val both = li.groupBy("l_returnflag").agg(
        countDistinct(col("l_partkey")).as("nd"),
        expr("percentile(l_extendedprice, 0.5)").as("p50"),
        approx_count_distinct(col("l_partkey")).as("acd"),
        expr("hll_sketch_estimate(hll_sketch_agg(l_partkey))").as("hll"),
        expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("ap50"))
      .collect()
    both.foreach { r =>
      val k = r.getString(0)
      val (nd, p50) = (r.getLong(1), r.getDouble(2))
      val (acd, hll, ap50) = (r.getLong(3), r.getLong(4), r.getDouble(5))
      // HLL++ default rsd = 5%; DataSketches HLL lgK=12 ⇒ ~1.6% rsd.
      // Allow 3 sigma.
      assert(math.abs(acd - nd).toDouble / nd <= 0.15, s"$k acd $acd vs $nd")
      assert(math.abs(hll - nd).toDouble / nd <= 0.05, s"$k hll $hll vs $nd")
      // approx_percentile(accuracy=1000): rank error ≤ 1/1000 of rows per
      // group (~20k) ⇒ ±20 ranks; prices are dense, give 2% value slack.
      assert(math.abs(ap50 - p50) / p50 <= 0.02, s"$k p50 $ap50 vs $p50")
    }
  }
}
