package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** agg_approx has no DuckDB oracle (sketch estimates are engine-specific)
  * — this spec is its correctness gate: every estimate must land within
  * the family's documented error envelope of the EXACT answer computed on
  * the same data. */
class ApproxAggSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get

  test("approximate aggregates land within error bounds of exact answers") {
    val dir = "/root/testdata/sf0.01"
    val approx = graft.queries.ExtendedQueries.queries("agg_approx")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val exact = li.groupBy("l_returnflag").agg(
        countDistinct(col("l_partkey")).as("nd"),
        expr("percentile(l_extendedprice, 0.5)").as("p50"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, (nd, p50)) =>
      val (acd, hll, ap50) = approx(k)
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
