package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SkewOps

class SkewOpsSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  import spark.implicits._

  test("saltedAgg equals direct groupBy for sum/count/min/max") {
    // one hot key (90% of rows) + a tail
    val rows = (1 to 2000).map(i =>
      (if (i % 10 == 0) s"k${i % 7}" else "HOT", i.toDouble))
    val df = rows.toDF("k", "v")
    val direct = df.groupBy("k")
      .agg(sum($"v").as("s"), count(lit(1)).as("n"),
        min($"v").as("mn"), max($"v").as("mx"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    val salted = SkewOps.saltedAgg(df, Seq("k"), nSalts = 16)(
      partials = Seq(sum($"v").as("s"), count(lit(1)).as("n"),
        min($"v").as("mn"), max($"v").as("mx")),
      finals = Seq(sum($"s").as("s"), sum($"n").as("n"),
        min($"mn").as("mn"), max($"mx").as("mx")))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(salted.keySet == direct.keySet)
    salted.foreach { case (k, (s, n, mn, mx)) =>
      val (ds, dn, dmn, dmx) = direct(k)
      assert(n == dn && mn == dmn && mx == dmx)
      assert(math.abs(s - ds) <= 1e-9 * math.max(1.0, math.abs(ds)))
    }
  }

  test("mean via (sum, count) decomposition") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 4.0), ("b", 8.0)).toDF("k", "v")
    val out = SkewOps.saltedAgg(df, Seq("k"), nSalts = 4)(
      partials = Seq(sum($"v").as("s"), count($"v").as("n")),
      finals = Seq((sum($"s") / sum($"n")).as("mean")))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out == Map("a" -> (7.0 / 3), "b" -> 8.0))
  }

  test("saltedJoin equals the plain join for every supported join type") {
    // hot key "h" dominates the big side; key "x" has no right match,
    // right key "z" has no left match
    val big = (1 to 50).map(i => ("h", i)) ++ Seq(("a", 101), ("x", 102))
    val bigDf = big.toDF("k", "bv")
    val smallDf = Seq(("h", "H"), ("a", "A"), ("z", "Z")).toDF("k", "sv")
    for (jt <- Seq("inner", "left", "left_semi", "left_anti")) {
      val got = SkewOps.saltedJoin(bigDf, smallDf, Seq("k"), nSalts = 7,
          joinType = jt)
        .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
      val want = bigDf.join(smallDf, Seq("k"), jt)
        .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
      assert(got == want, s"join type $jt diverged")
    }
  }

  test("saltedJoin rejects right/full joins") {
    val df = Seq(("a", 1)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      SkewOps.saltedJoin(df, df.withColumnRenamed("v", "w"), Seq("k"), 4,
        joinType = "full_outer")
    }
  }
}
