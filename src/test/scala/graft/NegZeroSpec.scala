package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.QueryUtil

/** Negative-zero normalization (r07 verdict item 1): DuckDB's round()
  * preserves the IEEE sign bit on small negative inputs (-3e-5 → -0.0)
  * where Spark's BigDecimal HALF_UP round yields +0.0; the driver hashes
  * raw bits, so the two zeros diverge the gate. The fix is `+ 0.0` AFTER
  * rounding on both sides — QueryUtil.r4 (Spark) and
  * QueryUtil.negZeroSafeOracle (applied centrally over every oracle SQL
  * in SparkEntry.oracleSql). This suite pins:
  *   1. r4 never emits a signbit-set zero, on exactly the adversarial
  *      band (-1e-4, 0) that produced the r07 red;
  *   2. every shipped oracle SQL has EVERY `round(1e-9 …` template
  *      occurrence wrapped as `(round(…) + 0.0)` — balanced-paren
  *      verified, so a new key can't forget the normalization;
  *   3. the signed-output keys from the verdict's hazard list emit zero
  *      signbit-set zeros end-to-end at sf0.001.
  */
class NegZeroSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("r4 maps the entire adversarial negative band to +0.0 bits") {
    // values that round (with the 1e-9 bias) to zero from below, plus
    // exact -0.0 itself and boundary neighbors
    val xs = Seq(-0.0, -1e-18, -1e-12, -1e-9, -3e-5, -4.9e-5, -0.00004999,
      0.0, 1e-12, 3e-5)
    val out = xs.toDF("x").select(QueryUtil.r4(col("x")).as("r")).collect()
      .map(_.getDouble(0))
    out.foreach { v =>
      assert(!(v == 0.0 && (java.lang.Double.doubleToRawLongBits(v) != 0L)),
        s"r4 emitted signbit-set zero for an input in the adversarial band")
    }
    // and r4 is still the identity-after-round it was: a nonzero survives
    assert(out.last == 0.0 || out.last == 1e-4 || out.last == 0.0001)
  }

  test("every oracle round(1e-9 template is wrapped with + 0.0") {
    val marker = "round(1e-9"
    val all = SparkEntry.oracleSql
    assert(all.nonEmpty)
    var occurrences = 0
    all.foreach { case (key, sql) =>
      var i = sql.indexOf(marker)
      while (i >= 0) {
        occurrences += 1
        assert(i > 0 && sql.charAt(i - 1) == '(',
          s"$key: round(1e-9 at $i not preceded by the wrap paren")
        // balanced scan from round's '(' to its matching ')'
        var j = i + "round".length
        var depth = 0
        var done = false
        while (!done) {
          sql.charAt(j) match {
            case '(' => depth += 1
            case ')' => depth -= 1; if (depth == 0) done = true
            case _ =>
          }
          j += 1
        }
        assert(sql.regionMatches(j, " + 0.0)", 0, 7),
          s"$key: round(1e-9 …) at $i not followed by ' + 0.0)': " +
            sql.substring(i, math.min(sql.length, j + 10)))
        i = sql.indexOf(marker, j)
      }
    }
    // the template is widespread — an accidentally-skipped transform
    // would show up as a large drop here
    assert(occurrences > 100,
      s"only $occurrences round(1e-9 occurrences — transform skipped?")
  }

  test("signed-output keys emit no signbit-set zeros at sf0.001") {
    // the verdict's hazard list: every r4'd column that can be negative
    val keys = Seq("window_rolling_corr", "window_zscore_anomaly",
      "agg_moments", "agg_regression", "text_source_kl", "window_ewma",
      // round-8 signed additions: skewness/kurtosis straddle zero on
      // near-symmetric frames (|A3| ≥ 1 over √A2³ ≤ 1e9 can land in the
      // sub-1e-4 band), and interpolated fills inherit value's sign
      "window_rolling_skew", "ts_interpolate")
    keys.foreach { k =>
      val df = SparkEntry.queries(k)(spark, sfDir)
      val doubleCols = df.schema.fields.collect {
        case f if f.dataType == org.apache.spark.sql.types.DoubleType => f.name
      }
      assert(doubleCols.nonEmpty, s"$k: expected at least one double column")
      // distributed scan: count rows whose bits are exactly -0.0 —
      // signbit via string render (ANSI forbids the 1/x probe): Spark
      // casts the double -0.0 to the string "-0.0"
      val conds = doubleCols.map(c =>
        sum(when(col(c) === 0.0 &&
          col(c).cast("string").startsWith("-"), 1).otherwise(0)).as(c))
      val row = df.agg(conds.head, conds.tail: _*).collect()(0)
      doubleCols.zipWithIndex.foreach { case (c, i) =>
        assert(row.getLong(i) == 0L,
          s"$k.$c: ${row.getLong(i)} signbit-set zeros")
      }
    }
  }
}
