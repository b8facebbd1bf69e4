package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.GlobalWindow

class GlobalWindowSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private lazy val orders =
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")

  test("two-pass cumSum equals the single-partition global window") {
    val single = orders.withColumn("cs",
      sum($"o_totalprice").over(Window.orderBy($"o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select($"o_orderkey", $"cs")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val scaled = GlobalWindow.cumSum(orders, Seq($"o_orderkey"),
      "o_totalprice", "cs", numPartitions = 8)
      .select($"o_orderkey", $"cs")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scaled.keySet == single.keySet)
    // FP reassociation across partitions: equal within relative ulps
    scaled.foreach { case (k, v) =>
      assert(math.abs(v - single(k)) <= 1e-9 * math.max(1.0, math.abs(single(k))),
        s"key $k: $v vs ${single(k)}")
    }
  }

  test("handles nulls (skipped) and empty partitions") {
    val df = Seq((1L, Some(1.0)), (2L, None), (3L, Some(2.0))).toDF("k", "v")
    val out = GlobalWindow.cumSum(df, Seq($"k"), "v", "cs",
      numPartitions = 8) // 8 partitions for 3 rows → empties exist
      .orderBy("k").select("cs").collect().map(_.getDouble(0)).toSeq
    assert(out == Seq(1.0, 1.0, 3.0))
  }

  test("leading nulls give NULL, matching window-sum semantics") {
    val df = Seq((1L, None), (2L, None), (3L, Some(2.0)), (4L, None))
      .toDF("k", "v")
    val out = GlobalWindow.cumSum(df, Seq($"k"), "v", "cs", numPartitions = 4)
      .orderBy("k").select("cs").collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
    assert(out == Seq(None, None, Some(2.0), Some(2.0)))
  }

  test("desc order keys compile to literal bounds — no range exchange, " +
      "no spark_partition_id") {
    val df = Seq((3L, 1.0), (2L, 2.0), (1L, 4.0)).toDF("k", "v")
    val out = GlobalWindow.cumSum(df, Seq($"k".desc), "v", "cs",
        numPartitions = 2)
    val got = out.orderBy($"k".desc).select("cs").collect()
      .map(_.getDouble(0)).toSeq
    assert(got == Seq(1.0, 3.0, 7.0))
    val analyzed = out.queryExecution.analyzed.toString.toLowerCase
    assert(!analyzed.contains("spark_partition_id"),
      "desc-key path must not depend on spark_partition_id")
    val p = out.queryExecution.executedPlan.toString
    assert(!p.toLowerCase.contains("rangepartitioning"),
      s"desc-key path must not range-exchange:\n$p")
    assert(p.contains("hashpartitioning(__gw_pid__"),
      s"sweep not hash-partitioned by content pid:\n$p")
  }

  test("desc cumsum over a real table matches the single-partition window") {
    val w = Window.orderBy($"o_orderkey".desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val single = orders.withColumn("cs", sum($"o_totalprice").over(w))
      .select($"o_orderkey", $"cs").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val scaled = GlobalWindow.cumSum(orders, Seq($"o_orderkey".desc),
        "o_totalprice", "cs", numPartitions = 8)
      .select($"o_orderkey", $"cs").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scaled.keySet == single.keySet)
    // FP prefix sums reassociate across ranges — compare within ulps
    scaled.foreach { case (k, v) =>
      assert(math.abs(v - single(k)) <= 1e-6 * (1 + single(k).abs),
        s"key $k: $v vs ${single(k)}")
    }
  }

  test("mixed-direction multi-key with nulls matches the plain window") {
    // g asc_nulls_last, k desc: exercises the per-field lexicographic
    // comparator (direction + null ordering per field) end-to-end
    val df = Seq((Some(2L), 1L, 1.0), (Some(1L), 2L, 2.0), (None, 3L, 4.0),
        (Some(1L), 4L, 8.0), (None, 5L, 16.0), (Some(2L), 6L, 32.0))
      .toDF("a", "k", "v")
    val w = Window.orderBy($"a".asc_nulls_last, $"k".desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val single = df.withColumn("cs", sum($"v").over(w))
      .select($"k", $"cs").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val scaled = GlobalWindow.cumSum(df,
        Seq($"a".asc_nulls_last, $"k".desc), "v", "cs", numPartitions = 3)
      .select($"k", $"cs").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scaled == single)
    assert(!GlobalWindow.cumSum(df, Seq($"a".asc_nulls_last, $"k".desc),
        "v", "cs", numPartitions = 3)
      .queryExecution.analyzed.toString.toLowerCase
      .contains("spark_partition_id"))
  }

  test("groupedCumSum equals the per-group window, with G×P parallelism") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val w = Window.partitionBy($"l_returnflag")
      .orderBy($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))
    val single = li.withColumn("cs", sum($"l_quantity").over(w))
      .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey", $"cs")
      .collect().map(r => key(r) -> r.getDouble(4)).toMap
    val scaled = GlobalWindow.groupedCumSum(li, Seq("l_returnflag"),
        Seq($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey"),
        "l_quantity", "cs", numPartitions = 8)
      .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey", $"cs")
      .collect().map(r => key(r) -> r.getDouble(4)).toMap
    assert(scaled.keySet == single.keySet)
    // l_quantity is integer-valued: partitioned summation is bit-exact
    scaled.foreach { case (k, v) => assert(v == single(k), s"key $k") }
  }

  test("groupedCumSumLong (round 17): int64-exact past 2^53 where the " +
      "double carrier rounds, nulls/null-group semantics match the " +
      "plain window, and overflow is a loud ANSI error") {
    val big = (1L << 53) + 1L
    val df = Seq((Some("a"), 1L, Some(big)), (Some("a"), 2L, Some(1L)),
        (Some("a"), 3L, None), (None, 1L, Some(2L)), (None, 2L, Some(big)))
      .toDF("g", "k", "v")
    val got = GlobalWindow.groupedCumSumLong(df, Seq("g"), Seq($"k"),
        "v", "cs", numPartitions = 4)
      .collect().map(r => (Option(r.getString(0)), r.getLong(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    // exact: big + 1 is NOT representable as a double (2^53 + 2 is,
    // but the running value big+1 would round to big on the double
    // path before the +1 lands... the point: these asserts fail on a
    // double carrier)
    assert(got((Some("a"), 1L)) == Some(big))
    assert(got((Some("a"), 2L)) == Some(big + 1L))
    assert(got((Some("a"), 3L)) == Some(big + 1L))
    assert(got((None, 1L)) == Some(2L))
    assert(got((None, 2L)) == Some(big + 2L))
    // overflow: two near-max values — loud, not wrapped
    val odf = Seq((1L, Long.MaxValue - 1), (2L, Long.MaxValue - 1))
      .toDF("k", "v")
    val e = intercept[Exception] {
      GlobalWindow.cumSumLong(odf, Seq($"k"), "v", "cs").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(m => m.contains("overflow") ||
      m.contains("ARITHMETIC_OVERFLOW")), msgs(e).mkString(" | "))
  }

  test("groupedCumSumsLong (round 17 optimization): the single-pass " +
      "multi-payload scaffold equals two sequential groupedCumSumLong " +
      "folds — per-payload null gating, null groups, 2^53-exact") {
    val big = (1L << 53) + 1L
    val df = Seq(
        (Some("a"), 1L, Some(big), None: Option[Long]),
        (Some("a"), 2L, Some(1L), Some(5L)),
        (Some("a"), 3L, None: Option[Long], Some(7L)),
        (None, 1L, Some(2L), None: Option[Long]),
        (None, 2L, Some(big), Some(1L)))
      .toDF("g", "k", "v1", "v2")
    def key(r: org.apache.spark.sql.Row) =
      (Option(r.getString(0)), r.getLong(1))
    def opt(r: org.apache.spark.sql.Row, i: Int) =
      if (r.isNullAt(i)) None else Some(r.getLong(i))
    val multi = GlobalWindow.groupedCumSumsLong(df, Seq("g"), Seq($"k"),
        Seq("v1" -> "c1", "v2" -> "c2"), numPartitions = 4)
      .collect().map(r => key(r) -> (opt(r, 4), opt(r, 5))).toMap
    val fold1 = GlobalWindow.groupedCumSumLong(df, Seq("g"), Seq($"k"),
      "v1", "c1", numPartitions = 4)
    val folded = GlobalWindow.groupedCumSumLong(fold1, Seq("g"), Seq($"k"),
        "v2", "c2", numPartitions = 4)
      .collect().map(r => key(r) -> (opt(r, 4), opt(r, 5))).toMap
    assert(multi == folded)
    // spot semantics: leading-null payload stays NULL only until its
    // own first value (per-payload gating), exactness past 2^53
    assert(multi((Some("a"), 1L)) == (Some(big), None))
    assert(multi((Some("a"), 2L)) == (Some(big + 1L), Some(5L)))
    assert(multi((Some("a"), 3L)) == (Some(big + 1L), Some(12L)))
    assert(multi((None, 2L)) == (Some(big + 2L), Some(1L)))
  }

  test("groupedCumAgg: min/max/count/avg match the plain window") {
    import graft.operators.GlobalWindow.RunningAgg
    val df = Seq((1L, 1L, Some(5.0)), (1L, 2L, None), (1L, 3L, Some(2.0)),
        (1L, 4L, Some(7.0)), (2L, 1L, None), (2L, 2L, Some(3.0)))
      .toDF("g", "k", "v")
    val w = Window.partitionBy($"g").orderBy($"k")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expect = df.select($"g", $"k",
        min($"v").over(w).as("mn"), max($"v").over(w).as("mx"),
        count($"v").over(w).as("ct"), avg($"v").over(w).as("av"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.toSeq.drop(2)).toMap
    def run(a: RunningAgg, out: String) =
      graft.operators.GlobalWindow.groupedCumAgg(df, Seq("g"), Seq($"k"),
        "v", out, a, numPartitions = 3)
    val mn = run(RunningAgg.Min, "o").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.get(3)).toMap
    val mx = run(RunningAgg.Max, "o").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.get(3)).toMap
    val ct = run(RunningAgg.Count, "o").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.get(3)).toMap
    val av = run(RunningAgg.Avg, "o").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.get(3)).toMap
    expect.foreach { case (key, Seq(emn, emx, ect, eav)) =>
      assert(mn(key) == emn, s"min $key"); assert(mx(key) == emx, s"max $key")
      assert(ct(key) == ect, s"count $key"); assert(av(key) == eav, s"avg $key")
    }
  }

  test("NULL group key is a real group (null-safe offsets join)") {
    // Window.partitionBy treats a NULL group as a group; a null-unsafe
    // offsets join would silently null the whole group's output.
    val df = Seq((Option.empty[String], 1L, 2.0),
        (Option.empty[String], 2L, 3.0), (Some("a"), 1L, 5.0))
      .toDF("flag", "k", "v")
    val out = GlobalWindow.groupedCumSum(df, Seq("flag"), Seq($"k"),
        "v", "cs", numPartitions = 4)
      .orderBy($"flag".asc_nulls_first, $"k")
      .select("cs").collect().map(_.getDouble(0)).toSeq
    assert(out == Seq(2.0, 5.0, 5.0))
  }

  test("plain keys: pid is content-derived (no spark_partition_id), no leaks") {
    val out = GlobalWindow.cumSum(orders, Seq($"o_orderkey"),
      "o_totalprice", "cs", numPartitions = 8)
    assert(!out.columns.exists(_.startsWith("__gw_")),
      s"internal columns leaked: ${out.columns.mkString(",")}")
    // pid must be a pure function of row content: any SPARK_PARTITION_ID
    // in the plan would re-introduce the two-branch consistency race.
    val analyzed = out.queryExecution.analyzed.toString.toLowerCase
    assert(!analyzed.contains("spark_partition_id"),
      "plain-key path must not depend on spark_partition_id")
  }

  test("plan: pid hash shuffle + broadcast offsets, no single-partition sweep") {
    val out = GlobalWindow.cumSum(orders, Seq($"o_orderkey"),
      "o_totalprice", "cs", numPartitions = 8)
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("hashpartitioning(__gw_pid__"),
      s"sweep not hash-partitioned by content pid:\n$p")
    assert(p.contains("BroadcastExchange"), s"offsets not broadcast:\n$p")
  }

  test("downstream coalesce(1) cannot corrupt the sweep (stage-merge regression)") {
    // coalesce(1) without the pin exchange merges into the map stage:
    // every TaskContext partition id becomes 0 on the join's left branch
    // while the offset branch keeps real ids — local sums then join the
    // wrong (zero) offsets and the cumsum resets at partition boundaries.
    val out = GlobalWindow.cumSum(orders, Seq($"o_orderkey"),
        "o_totalprice", "cs", numPartitions = 8)
      .coalesce(1)
      .orderBy($"o_orderkey").select("cs").collect().map(_.getDouble(0))
    val oracle = orders.orderBy($"o_orderkey")
      .select("o_totalprice").collect().map(_.getDouble(0))
      .scanLeft(0.0)(_ + _).drop(1)
    assert(out.length == oracle.length)
    // o_totalprice is not integer-valued: partitioned summation may differ
    // by float reassociation, so compare within ulps-scale tolerance.
    out.zip(oracle).foreach { case (a, b) =>
      assert(math.abs(a - b) <= 1e-6 * math.max(1.0, math.abs(b)),
        s"$a != $b")
    }
  }
}
