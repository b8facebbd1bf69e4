package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.SumL128.sumL128

/** [[graft.functions.SumL128Expr]] — exact 124-bit long-path sum (r07
  * verdict item 7). The contract under test: for any longs with
  * |v| ≤ 2^61, grouped/global sums equal the exact BigInt sum, across
  * partial→merge boundaries (multi-partition input forces real
  * mergeExpressions traffic), with nulls skipped and empty → 0.
  */
class SumL128Spec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def exact(vs: Seq[java.lang.Long]): BigInt =
    vs.filter(_ ne null).map(v => BigInt(v.longValue)).sum

  private def run(vs: Seq[java.lang.Long], parts: Int): BigInt = {
    val got = vs.toDF("v").repartition(parts)
      .agg(sumL128(col("v")).as("s"))
      .head.getDecimal(0)
    BigInt(got.toBigInteger)
  }

  test("property: random signed mixes at every magnitude == BigInt sum") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 20) {
      // magnitudes from tiny to the 2^61 input bound, signs mixed —
      // forces carries and borrows through both update and merge
      val bound = 1L << (3 + rnd.nextInt(59)) // 2^3 .. 2^61
      val vs: Seq[java.lang.Long] = Seq.fill(200) {
        val v = (rnd.nextLong() % bound).abs
        java.lang.Long.valueOf(if (rnd.nextBoolean()) v else -v)
      }
      assert(run(vs, parts = 7) === exact(vs), s"trial $trial bound=$bound")
    }
  }

  test("carry boundary: many max-magnitude terms overflow a plain long sum") {
    val big = java.lang.Long.valueOf((1L << 61) - 1)
    val vs = Seq.fill(64)(big) // Σ = 64·(2^61−1) ≈ 2^67 — wraps int64
    assert(run(vs, parts = 5) === exact(vs))
    assert(exact(vs) > BigInt(Long.MaxValue)) // the test is non-vacuous
  }

  test("borrow boundary: alternating ±(2^61−1) cancels exactly to a residue") {
    val a = java.lang.Long.valueOf((1L << 61) - 1)
    val b = java.lang.Long.valueOf(-((1L << 61) - 1))
    val vs: Seq[java.lang.Long] = (Seq.fill(33)(a) ++ Seq.fill(32)(b))
    assert(run(scala.util.Random.shuffle(vs), parts = 6) === exact(vs))
  }

  test("negative total: hi goes negative, decimal assembly stays exact") {
    val vs: Seq[java.lang.Long] =
      Seq.fill(100)(java.lang.Long.valueOf(-(1L << 55)))
    assert(run(vs, parts = 4) === exact(vs))
  }

  test("nulls are skipped; all-null and empty groups evaluate to 0") {
    val vs: Seq[java.lang.Long] =
      Seq(java.lang.Long.valueOf(5L), null, java.lang.Long.valueOf(-2L), null)
    assert(run(vs, parts = 2) === BigInt(3))
    assert(run(Seq[java.lang.Long](null, null), parts = 2) === BigInt(0))
    assert(run(Seq.empty[java.lang.Long], parts = 1) === BigInt(0))
  }

  test("grouped: per-group sums independent and exact") {
    val df = Seq(("a", 10L), ("b", 1L << 60), ("a", -3L), ("b", 1L << 60))
      .toDF("k", "v").repartition(4)
    val got = df.groupBy("k").agg(sumL128(col("v")).as("s"))
      .collect().map(r => r.getString(0) -> BigInt(r.getDecimal(1).toBigInteger))
      .toMap
    assert(got("a") === BigInt(7))
    assert(got("b") === BigInt(1L << 60) * 2)
  }

  test("SQL registration: sum_l128 over a view matches the Column form") {
    GraftExtensions.register(spark)
    Seq(3L, -1L, 1L << 50).toDF("v").createOrReplaceTempView("suml128_t")
    val viaSql = spark.sql("SELECT sum_l128(v) AS s FROM suml128_t")
      .head.getDecimal(0)
    assert(BigInt(viaSql.toBigInteger) === BigInt(2 + (1L << 50)))
  }

  test("rejects non-long input with a named error") {
    val e = intercept[Exception] {
      Seq(1.5, 2.5).toDF("v").agg(sumL128(col("v"))).collect()
    }
    assert(e.getMessage.contains("sum_l128") ||
      e.getMessage.toLowerCase.contains("bigint"))
  }

  test("parts: struct<hi,lo> carrier reassembles to the exact BigInt sum") {
    import graft.functions.SumL128.sumL128Parts
    val rnd = new scala.util.Random(7)
    val vs: Seq[java.lang.Long] = Seq.fill(4000)(
      java.lang.Long.valueOf(
        (rnd.nextLong() % (1L << 61)) * (if (rnd.nextBoolean()) 1 else -1)))
    val r = vs.toDF("v").repartition(8)
      .agg(sumL128Parts(col("v")).as("s"))
      .select(col("s.hi"), col("s.lo")).head
    val got = BigInt(r.getLong(0)) * BigInt(2).pow(62) + BigInt(r.getLong(1))
    assert(got == exact(vs))
    assert(r.getLong(1) >= 0 && r.getLong(1) < (1L << 62),
      "lo limb must stay the canonical [0, 2^62) digit")
  }

  test("partsDiff: windowed running difference equals the exact frame sum") {
    import graft.functions.SumL128.{sumL128Parts, partsDiff}
    import org.apache.spark.sql.expressions.Window
    // terms at cents² scale (~1.2e14): a plain long RUNNING sum of
    // 200k rows would wrap (caps at ~7.6e4); the two-limb carrier must
    // still reconstruct every trailing-20 frame sum exactly
    val n = 200000
    val df = spark.range(n).select(col("id"),
      (pmod(xxhash64(col("id")), lit(10000000L)) + 1L).as("v"))
    val wl = Window.orderBy(col("id"))
    val wRun = wl.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ws = wl.rowsBetween(-19, 0)
    val both = df
      .select(col("id"), col("v"),
        sumL128Parts(col("v") * col("v")).over(wRun).as("r"),
        sum(col("v") * col("v")).over(ws).as("frame"))
      .select(col("id"), col("frame"),
        partsDiff(col("r"), lag(col("r"), 20).over(wl)).as("diff"))
    assert(both.filter(col("frame") =!= col("diff")).count() == 0)
  }

  test("partsDiffChecked: exact at ±2^62, raises one past it and on dHi overflow") {
    import graft.functions.SumL128.partsDiffChecked
    def diffOf(curHi: Long, curLo: Long, prevHi: Long, prevLo: Long): Long =
      Seq((curHi, curLo, prevHi, prevLo)).toDF("ch", "cl", "ph", "pl")
        .select(partsDiffChecked(
          struct(col("ch").as("hi"), col("cl").as("lo")),
          struct(col("ph").as("hi"), col("pl").as("lo"))).as("d"))
        .head.getLong(0)
    // boundary: |s| == 2^62 is still inside the ANSI-safe contract
    assert(diffOf(1L, 0L, 0L, 0L) == (1L << 62))
    assert(diffOf(0L, 0L, 1L, 0L) == -(1L << 62))
    // one past the bound: |s| = 2^62 + 1 must raise, not wrap
    val over = intercept[Exception] { diffOf(1L, 1L, 0L, 0L) }
    assert(over.getMessage.contains("partsDiff contract"))
    // dHi outside [-1, 1]: raises BEFORE the multiply could wrap
    val hiOver = intercept[Exception] { diffOf(2L, 0L, 0L, 0L) }
    assert(hiOver.getMessage.contains("partsDiff contract"))
  }

  test("partsDiff: debug property routes through the checked form") {
    import graft.functions.SumL128
    System.setProperty("graft.suml128.check", "true")
    try {
      assert(SumL128.checkEnabled)
      val e = intercept[Exception] {
        Seq((1L, 1L)).toDF("ch", "cl")
          .select(SumL128.partsDiff(
            struct(col("ch").as("hi"), col("cl").as("lo")),
            struct(lit(0L).as("hi"), lit(0L).as("lo"))).as("d"))
          .collect()
      }
      assert(e.getMessage.contains("partsDiff contract"))
    } finally System.clearProperty("graft.suml128.check")
  }
}
