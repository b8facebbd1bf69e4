package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Scd2

/** [[graft.operators.Scd2]] — change log → SCD2 validity intervals.
  * Pins the semantics the oracle key `scd2_intervals` relies on
  * (change-point compression with null-safe attribute compare, lead()
  * interval close, open interval = NULL/is_current) and the scale
  * contract from the scaladoc: both windows ride ONE hash exchange and
  * ONE sort.
  */
class Scd2Spec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def log = Seq(
    // key k1: A A B B A — three intervals (A, B, A)
    ("k1", 1, "A"), ("k1", 2, "A"), ("k1", 3, "B"),
    ("k1", 4, "B"), ("k1", 5, "A"),
    // key k2: single observation — one open interval
    ("k2", 1, "X"),
    // key k3: null transitions — null→C and C→null are both changes
    ("k3", 1, null), ("k3", 2, null), ("k3", 3, "C"), ("k3", 4, null)
  ).toDF("k", "ts", "attr")

  private def run = Scd2.intervals(log,
    keyCols = Seq("k"), tsCol = "ts", tieCols = Seq.empty,
    attrCols = Seq("attr"))

  test("change-point compression + interval close + open interval") {
    // valid_to is the NEXT change's ts (half-open intervals); -1 below
    // stands in for the NULL of the open interval
    val rows = run.select("k", "ts", "attr", "valid_from", "valid_to",
        "is_current")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getInt(3), if (r.isNullAt(4)) -1 else r.getInt(4),
        r.getBoolean(5))).toSet
    assert(rows == Set(
      ("k1", 1, "A", 1, 3, false),
      ("k1", 3, "B", 3, 5, false),
      ("k1", 5, "A", 5, -1, true),
      ("k2", 1, "X", 1, -1, true),
      ("k3", 1, null, 1, 3, false),
      ("k3", 3, "C", 3, 4, false),
      ("k3", 4, null, 4, -1, true)))
  }

  test("plan: one exchange, one sort for both windows") {
    val p = run.queryExecution.executedPlan.toString
    assert(p.split("Exchange hashpartitioning").length - 1 == 1,
      s"scd2 should shuffle exactly once:\n$p")
    assert(p.split("\\bSort \\[").length - 1 == 1,
      s"scd2 should sort exactly once (filter preserves order):\n$p")
  }

  test("property: intervals tile each key's change sequence exactly") {
    // brute-force oracle on a random log: per key, ordered observations
    // collapse to change points; intervals must start at each change,
    // end at the next change, and the last is open
    val rnd = new scala.util.Random(7)
    val data = for {
      k <- (0 until 17).map(i => s"k$i")
      ts <- 0 until (1 + rnd.nextInt(30))
    } yield (k, ts, "s" + rnd.nextInt(3))
    val df = scala.util.Random.shuffle(data).toDF("k", "ts", "attr")
    val got = Scd2.intervals(df, Seq("k"), "ts", Seq.empty, Seq("attr"))
      .select("k", "ts", "attr", "valid_to", "is_current")
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2),
        if (r.isNullAt(3)) -1 else r.getInt(3), r.getBoolean(4)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).toSeq).toMap
    val expect = data.groupBy(_._1).view.mapValues { obs =>
      val sorted = obs.sortBy(_._2)
      val changes = sorted.zip(Option.empty[String] +: sorted.map(t => Some(t._3)))
        .collect { case ((k, ts, a), prev) if !prev.contains(a) => (k, ts, a) }
      changes.zipWithIndex.map { case ((k, ts, a), i) =>
        val next = if (i + 1 < changes.size) changes(i + 1)._2 else -1
        (k, ts, a, next, next == -1)
      }
    }.toMap
    assert(got.keySet == expect.keySet)
    for (k <- expect.keySet) assert(got(k) == expect(k), s"key $k")
  }

  test("applyBatch == full recompute at every cut point") {
    // the incremental contract: for ANY ts split (history < cut ≤
    // batch), applying the tail as a batch to intervals(head) equals
    // intervals(full log) — including cuts where a key has no history,
    // no batch rows, or a batch echo of its current attribute
    val rnd = new scala.util.Random(11)
    val data = for {
      k <- (0 until 9).map(i => s"k$i")
      ts <- 0 until (1 + rnd.nextInt(20))
      if rnd.nextInt(4) > 0 // ragged per-key coverage
    } yield (k, ts, "s" + rnd.nextInt(2))
    val df = data.toDF("k", "ts", "attr")
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.select("k", "ts", "attr", "valid_from", "valid_to", "is_current")
        .collect().map(_.toSeq).toSet
    val full = canon(Scd2.intervals(df, Seq("k"), "ts", Seq.empty,
      Seq("attr")))
    for (cut <- Seq(1, 5, 10, 19)) {
      val prior = Scd2.intervals(df.filter(col("ts") < cut),
        Seq("k"), "ts", Seq.empty, Seq("attr"))
      val inc = Scd2.applyBatch(prior, df.filter(col("ts") >= cut),
        Seq("k"), "ts", Seq.empty, Seq("attr"))
      assert(canon(inc) == full, s"cut=$cut")
    }
  }
}
