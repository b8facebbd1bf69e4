package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite

/** Algebra check for the round-7 literal-replay rewrites (SURVEY §5.1):
  * the decimal/long-cents closed forms that replaced native
  * corr/covar/stddev/regr_* in the oracle-gated keys must be the SAME
  * statistics, not merely deterministic ones. Each test recomputes a
  * rewritten formula next to Spark's native aggregate on the same data
  * and bounds the difference at float-noise level (1e-6 relative —
  * far below anything the 1e-4 comparison grid could hide).
  */
class LiteralReplaySpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  import spark.implicits._

  // deterministic pseudo-random cent-valued data: 2k rows, 7 groups
  private lazy val df = spark.range(2000).select(
    col("id"),
    pmod(xxhash64(col("id")), lit(7)).as("g"),
    (pmod(xxhash64(col("id"), lit(1)), lit(5000)).cast("double") / 100.0)
      .as("x"),
    ((pmod(xxhash64(col("id"), lit(2)), lit(1000000)).cast("double")
      + pmod(xxhash64(col("id"), lit(1)), lit(5000)).cast("double") * 37)
      / 100.0).as("y"))

  private def maxAbs(d: org.apache.spark.sql.DataFrame, c: String): Double =
    d.agg(max(abs(col(c)))).collect()(0).getDouble(0)

  test("long-cents rolling corr/cov closed form == native corr/covar_samp") {
    val w = Window.partitionBy(col("g")).orderBy(col("id")).rowsBetween(-19, 0)
    val qc = round(col("x") * 100).cast("long")
    val pc = round(col("y") * 100).cast("long")
    val n = count(lit(1)).over(w)
    val nd = n.cast("double")
    val m2xc = n * sum(qc * qc).over(w) - sum(qc).over(w) * sum(qc).over(w)
    val m2yc = n * sum(pc * pc).over(w) - sum(pc).over(w) * sum(pc).over(w)
    val cxyc = n * sum(qc * pc).over(w) - sum(qc).over(w) * sum(pc).over(w)
    val corrE = cxyc.cast("double") /
      sqrt(m2xc.cast("double") * m2yc.cast("double"))
    val covE = cxyc.cast("double") / (lit(10000.0) * nd * (nd - lit(1.0)))
    val cmp = df.select(
      (when(n >= 2 && m2xc > 0 && m2yc > 0, corrE) -
        corr(col("x"), col("y")).over(w)).as("dcorr"),
      (when(n >= 2, covE) -
        covar_samp(col("x"), col("y")).over(w)).as("dcov"),
      covar_samp(col("x"), col("y")).over(w).as("cv"))
      .na.fill(0.0, Seq("dcorr", "dcov"))
    assert(maxAbs(cmp, "dcorr") < 1e-9, "corr closed form drifted")
    // cov magnitude here is ~1e3-1e4 → 1e-6 relative ≈ 1e-2 absolute;
    // use a relative bound via the covariance scale
    val covScale = math.max(1.0, maxAbs(cmp, "cv"))
    assert(maxAbs(cmp, "dcov") / covScale < 1e-9, "cov closed form drifted")
  }

  test("decimal-exact grouped moments == native stddev/var/covar/corr") {
    val qd = col("x").cast("decimal(9,2)")
    val pd = col("y").cast("decimal(13,2)")
    val g = df.groupBy("g")
      .agg(count(lit(1)).cast("decimal(7,0)").as("nD"),
        sum(qd).cast("decimal(13,2)").as("sxD"),
        sum(pd).cast("decimal(17,2)").as("syD"),
        sum(qd * pd).cast("decimal(25,4)").as("sxyD"),
        sum(qd * qd).cast("decimal(21,4)").as("sxxD"),
        sum(pd * pd).cast("decimal(29,4)").as("syyD"),
        stddev_samp(col("x")).as("sd0"),
        var_samp(col("x")).as("var0"),
        covar_samp(col("x"), col("y")).as("cov0"),
        corr(col("x"), col("y")).as("corr0"))
    val m2xD = col("nD") * col("sxxD") - col("sxD") * col("sxD")
    val m2yD = col("nD") * col("syyD") - col("syD") * col("syD")
    val cxyD = col("nD") * col("sxyD") - col("sxD") * col("syD")
    val nd = col("nD").cast("double")
    val den = nd * (nd - lit(1.0))
    val cmp = g.select(
      (sqrt(m2xD.cast("double") / den) - col("sd0")).as("dsd"),
      (m2xD.cast("double") / den - col("var0")).as("dvar"),
      (cxyD.cast("double") / den - col("cov0")).as("dcov"),
      (cxyD.cast("double") /
        sqrt(m2xD.cast("double") * m2yD.cast("double")) - col("corr0"))
        .as("dcorr"),
      abs(col("cov0")).as("covscale"), abs(col("var0")).as("varscale"))
    val covScale = math.max(1.0, maxAbs(cmp, "covscale"))
    val varScale = math.max(1.0, maxAbs(cmp, "varscale"))
    assert(maxAbs(cmp, "dsd") < 1e-6)
    assert(maxAbs(cmp, "dvar") / varScale < 1e-9)
    assert(maxAbs(cmp, "dcov") / covScale < 1e-9)
    assert(maxAbs(cmp, "dcorr") < 1e-9)
  }

  test("cent-conversion round(x*100) has no half-round tie exposure " +
      "(r07 verdict item 8)") {
    // The long-cents idiom CAST(round(v*100) AS BIGINT) assumes both
    // engines round the DOUBLE v*100 to the same integer. A tie (v*100
    // landing exactly on k+0.5) could split HALF_UP vs round-half-even —
    // but for CENT-GRID inputs no tie can exist: v is the nearest double
    // to k/100, so v*100 is within ~1e-9·|k| of the integer k, never
    // near k+0.5. Property-checked over an adversarial sweep (the cent
    // values whose double representation errs maximally, ±k around
    // magnitudes up to 1e7 cents) PLUS the exact engine expression:
    // round() must return exactly k for every probed k.
    val ks = (
      // small cents, all residues mod 4 (the classic 0.29-style errors)
      (1L to 4000L) ++
      // large magnitudes: extendedprice-scale and beyond
      Seq(1L, 3L, 7L, 29L, 57L, 111L).flatMap(o =>
        Seq(99999L, 999999L, 9999999L, 10000001L).map(_ + o)) ++
      // maximal-representation-error shapes: k = m*10+5 (x.x5 values)
      (1L to 2000L).map(_ * 10L + 5L)
    ).distinct
    val df2 = ks.toDF("k").select(col("k"),
      (col("k").cast("double") / 100.0).as("v"))
    // 1) the double product never gets anywhere near a .5 tie
    val worst = df2.select(
      abs(col("v") * 100.0 - col("k").cast("double")).as("err"))
      .agg(max(col("err"))).head.getDouble(0)
    assert(worst < 1e-6,
      f"v*100 strayed $worst%.3e from the cent integer — tie exposure")
    // 2) the exact committed idiom lands on k in Spark...
    val bad = df2.select(col("k"),
      round(col("v") * 100).cast("long").as("r"),
      // ...and the floor form is value-identical (the fallback the
      // verdict offered; equality here proves there's nothing to switch)
      floor(col("v") * 100 + 0.5).cast("long").as("f"))
      .filter(col("r") =!= col("k") || col("f") =!= col("k"))
      .count()
    assert(bad == 0L, s"$bad cent values rounded off-grid")
  }

  test("decimal-exact regression closed forms == native regr_*") {
    val qd = col("x").cast("decimal(9,2)")
    val pd = col("y").cast("decimal(13,2)")
    val g = df.groupBy("g")
      .agg(count(lit(1)).cast("decimal(7,0)").as("nD"),
        sum(qd).cast("decimal(13,2)").as("sxD"),
        sum(pd).cast("decimal(17,2)").as("syD"),
        sum(qd * pd).cast("decimal(25,4)").as("sxyD"),
        sum(qd * qd).cast("decimal(21,4)").as("sxxD"),
        sum(pd * pd).cast("decimal(29,4)").as("syyD"),
        regr_slope(col("y"), col("x")).as("sl0"),
        regr_intercept(col("y"), col("x")).as("ic0"),
        regr_r2(col("y"), col("x")).as("r20"))
    val m2xD = col("nD") * col("sxxD") - col("sxD") * col("sxD")
    val m2yD = col("nD") * col("syyD") - col("syD") * col("syD")
    val cxyD = col("nD") * col("sxyD") - col("sxD") * col("syD")
    val nd = col("nD").cast("double")
    val slope = cxyD.cast("double") / m2xD.cast("double")
    val cmp = g.select(
      (slope - col("sl0")).as("dsl"),
      ((col("syD").cast("double") - slope * col("sxD").cast("double")) / nd
        - col("ic0")).as("dic"),
      (cxyD.cast("double") * cxyD.cast("double") /
        (m2xD.cast("double") * m2yD.cast("double")) - col("r20")).as("dr2"),
      abs(col("ic0")).as("icscale"))
    val icScale = math.max(1.0, maxAbs(cmp, "icscale"))
    assert(maxAbs(cmp, "dsl") < 1e-6)
    assert(maxAbs(cmp, "dic") / icScale < 1e-9)
    assert(maxAbs(cmp, "dr2") < 1e-9)
  }
}
