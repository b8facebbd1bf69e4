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

  test("cms_estimate: one-sided on every key, string path, SQL-callable") {
    import spark.implicits._
    val df = (1 to 2000).map(i => (s"k${i % 37}", (i % 11).toLong))
      .toDF("sk", "lk")
    val skS = df.agg(expr("count_min_sketch(sk, 0.01d, 0.99d, 7)"))
      .head.getAs[Array[Byte]](0)
    val skL = df.agg(expr("count_min_sketch(lk, 0.01d, 0.99d, 7)"))
      .head.getAs[Array[Byte]](0)
    val n = 2000L
    // estimate >= exact ALWAYS (deterministic CMS property), overshoot
    // bounded by eps*N on this fixed data+seed — both key types
    val sRows = df.groupBy("sk").agg(count(lit(1)).as("x"))
      .withColumn("e",
        graft.functions.CmsProbe.cmsEstimate(lit(skS), col("sk")))
      .collect()
    sRows.foreach { r =>
      val (x, e) = (r.getLong(1), r.getLong(2))
      assert(e >= x && e <= x + math.ceil(0.01 * n).toLong, s"$r")
    }
    val lRows = df.groupBy("lk").agg(count(lit(1)).as("x"))
      .withColumn("e",
        graft.functions.CmsProbe.cmsEstimate(lit(skL), col("lk")))
      .collect()
    lRows.foreach { r =>
      val (x, e) = (r.getLong(1), r.getLong(2))
      assert(e >= x && e <= x + math.ceil(0.01 * n).toLong, s"$r")
    }
    // SQL registration path agrees with the Column API
    GraftExtensions.register(spark)
    df.groupBy("sk").agg(count(lit(1)).as("x"))
      .createOrReplaceTempView("cms_probe_t")
    spark.sql("SELECT sk, x FROM cms_probe_t").collect() // view sanity
    val viaSql = spark.sql(
      s"SELECT sk, cms_estimate(X'${skS.map("%02x".format(_)).mkString}', sk) AS e " +
        "FROM cms_probe_t").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaApi = sRows.map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(viaSql == viaApi)
  }
}
