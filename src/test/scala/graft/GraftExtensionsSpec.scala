package graft

import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get

  test("kernels are callable from pure SQL after register()") {
    GraftExtensions.register(spark)
    val r = spark.sql("""
      SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
             size(shingle_hashes('a b c d', 3)) AS nsh,
             size(minhash_sig(shingle_hashes('a b c d', 3), 16)) AS k,
             simhash64(shingle_hashes('a b c d', 3), 32) AS sh,
             sorted_intersect_count(array(1L, 2L, 3L), array(2L, 3L, 9L)) AS ic
    """).collect()(0)
    assert(r.getDouble(0) == 11.0)
    assert(r.getInt(1) == 2)   // "a b c", "b c d"
    assert(r.getInt(2) == 16)
    assert(r.getLong(3) != 0L)
    assert(r.getInt(4) == 2)
  }

  test("SQL path equals the Column API path on real docs") {
    GraftExtensions.register(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.createOrReplaceTempView("docs_ext")
    val viaSql = spark.sql(
      "SELECT doc_id, simhash64(shingle_hashes(text, 3), 32) AS s FROM docs_ext")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    import org.apache.spark.sql.functions.col
    val viaApi = docs.select(col("doc_id"),
      graft.operators.Dedup.simhashFromHashes(
        graft.operators.Dedup.shingleHashes(col("text"), 3), 32).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql == viaApi)
  }

  test("SqlMutate renders the windowed-mutate verb to equivalent pure SQL") {
    // the reference's tbl_lazy audience: same verb spec, SQL backend.
    // Every supported shape must be VALUE-equivalent to the DataFrame path.
    import org.apache.spark.sql.functions._
    import graft.operators.{Frame, FrameEndpoint, TidierOps}
    import TidierOps._
    import graft.sql.SqlMutate
    import spark.implicits._
    val df = Seq(
      ("a", 1, java.sql.Date.valueOf("2024-01-01"), 10.0),
      ("a", 2, java.sql.Date.valueOf("2024-01-03"), 20.0),
      ("a", 3, java.sql.Date.valueOf("2024-01-07"), 30.0),
      ("a", 4, java.sql.Date.valueOf("2024-01-08"), 40.0),
      ("b", 1, java.sql.Date.valueOf("2024-02-01"), 1.0),
      ("b", 2, java.sql.Date.valueOf("2024-02-02"), 2.0))
      .toDF("g", "o", "d", "v")
    df.createOrReplaceTempView("sqlmutate_t")
    def same(sql: String, viaDf: org.apache.spark.sql.DataFrame): Unit = {
      val a = spark.sql(sql).collect().map(_.toSeq).toSet
      val b = viaDf.collect().map(_.toSeq).toSet
      assert(a == b, s"SQL != DataFrame for:\n$sql")
    }
    // frames + complete (rows), desc order — the headline shape
    same(
      SqlMutate.render("sqlmutate_t", Seq("s" -> "sum(v)"),
        by = Seq("g"), orderBy = Seq("o DESC"),
        frame = Some(Frame.rows(1, 0)), complete = true),
      df.mutateW("s" -> sum(col("v")))(by = Seq(col("g")),
        orderBy = Seq(col("o").desc), frame = Some(Frame.rows(1, 0)),
        complete = true))
    // range (days) frame + complete over the index span
    same(
      SqlMutate.render("sqlmutate_t", Seq("m" -> "avg(v)"),
        by = Seq("g"), frame = Some(Frame.days(3, 0)),
        index = Some("d"), complete = true),
      df.mutateW("m" -> avg(col("v")))(by = Seq(col("g")),
        frame = Some(Frame.days(3, 0)), index = Some(col("d")),
        complete = true))
    // running cumulative
    same(
      SqlMutate.render("sqlmutate_t", Seq("cs" -> "sum(v)"),
        by = Seq("g"), orderBy = Seq("o")),
      df.mutateW("cs" -> sum(col("v")))(by = Seq(col("g")),
        orderBy = Seq(col("o"))))
    // whole-group aggregate
    same(
      SqlMutate.render("sqlmutate_t", Seq("mx" -> "max(v)"),
        by = Seq("g")),
      df.mutateW("mx" -> max(col("v")))(by = Seq(col("g"))))
    // unitless numeric range, asymmetric negative after
    same(
      SqlMutate.render("sqlmutate_t", Seq("n" -> "count(v)"),
        by = Seq("g"), frame = Some(Frame.range(15, -5)),
        index = Some("v")),
      df.mutateW("n" -> count(col("v")))(by = Seq(col("g")),
        frame = Some(Frame.range(15, -5)), index = Some(col("v"))))
    // plain mutate (path 1)
    same(
      SqlMutate.render("sqlmutate_t", Seq("v2" -> "v * 2")),
      df.mutateW("v2" -> (col("v") * 2))())
    // month Period frame from PURE SQL — the CTE chain renders the same
    // prefix+as-of pipeline as CalendarWindow (sum/count/count(*)/avg/
    // stddev/variance); value-equivalent to the DataFrame path
    same(
      SqlMutate.render("sqlmutate_t",
        Seq("ms" -> "sum(v)", "mc" -> "count(v)", "ma" -> "avg(v)",
          "mall" -> "count(*)", "mv" -> "variance(v)", "msd" -> "stddev(v)"),
        by = Seq("g"), frame = Some(Frame.months(1, 0)), index = Some("d")),
      df.mutateW("ms" -> sum(col("v")), "mc" -> count(col("v")),
          "ma" -> avg(col("v")), "mall" -> count(lit(1)),
          "mv" -> variance(col("v")), "msd" -> stddev(col("v")))(
        by = Seq(col("g")), frame = Some(Frame.months(1, 0)),
        index = Some(col("d"))))
    // offset month frame (negative after: current month excluded) +
    // .complete gating; no-by global month frame
    same(
      SqlMutate.render("sqlmutate_t", Seq("ms" -> "sum(v)"),
        by = Seq("g"), frame = Some(Frame.months(2, -1)), index = Some("d"),
        complete = true),
      df.mutateW("ms" -> sum(col("v")))(
        by = Seq(col("g")), frame = Some(Frame.months(2, -1)),
        index = Some(col("d")), complete = true))
    same(
      SqlMutate.render("sqlmutate_t", Seq("ms" -> "sum(v)"),
        frame = Some(Frame.months(1, 0)), index = Some("d")),
      df.mutateW("ms" -> sum(col("v")))(
        frame = Some(Frame.months(1, 0)), index = Some(col("d"))))
    // compound months+days endpoints render too
    same(
      SqlMutate.render("sqlmutate_t", Seq("ms" -> "sum(v)"),
        by = Seq("g"), frame = Some(Frame.monthsDays(1, 3, 0, -2)),
        index = Some("d")),
      df.mutateW("ms" -> sum(col("v")))(
        by = Seq(col("g")), frame = Some(Frame.monthsDays(1, 3, 0, -2)),
        index = Some(col("d"))))
    // STRICT-lubridate month mode renders too (clamped month-end rows
    // NULL) — fixture with genuine clamp rows (Mar 30/31 → Feb 31/30 NA,
    // May 31 → Apr 31 NA; Feb 29 2024 exists, Mar 29 doesn't clamp)
    val dfStrict = Seq(
      ("a", 1, java.sql.Date.valueOf("2024-02-29"), 10.0),
      ("a", 2, java.sql.Date.valueOf("2024-03-15"), 20.0),
      ("a", 3, java.sql.Date.valueOf("2024-03-30"), 30.0),
      ("a", 4, java.sql.Date.valueOf("2024-03-31"), 40.0),
      ("b", 1, java.sql.Date.valueOf("2024-05-30"), 1.0),
      ("b", 2, java.sql.Date.valueOf("2024-05-31"), 2.0),
      // NULL-index row: the strict guard must render null-safely — a
      // bare CASE WHEN clamp THEN NULL ELSE agg END falls to ELSE on
      // the NULL day where the DataFrame path yields NULL (ADVICE r07)
      ("b", 3, null.asInstanceOf[java.sql.Date], 3.0))
      .toDF("g", "o", "d", "v")
    dfStrict.createOrReplaceTempView("sqlmutate_strict_t")
    locally {
      val sql = SqlMutate.render("sqlmutate_strict_t",
        Seq("ms" -> "sum(v)", "mc" -> "count(v)"),
        by = Seq("g"), frame = Some(Frame.monthsStrict(1, 0)),
        index = Some("d"))
      val a = spark.sql(sql).collect().map(_.toSeq).toSet
      val b = dfStrict.mutateW("ms" -> sum(col("v")),
          "mc" -> count(col("v")))(
          by = Seq(col("g")), frame = Some(Frame.monthsStrict(1, 0)),
          index = Some(col("d")))
        .collect().map(_.toSeq).toSet
      assert(a == b, s"strict SQL != DataFrame for:\n$sql")
      // and the NA rows really are NULL (3 clamp rows + 1 NULL-index
      // row across both paths)
      val naRows = spark.sql(sql).filter("ms IS NULL AND mc IS NULL").count()
      assert(naRows == 4L, s"expected 4 strict-NA rows, got $naRows")
    }
    // month-frame min/max: the daily-partial EXPANSION chain renders
    // (round-9, closing the documented delta) — mixed with prefix ops
    // in one statement, and alone (no prefix CTEs emitted)
    same(
      SqlMutate.render("sqlmutate_t",
        Seq("mmn" -> "min(v)", "mmx" -> "max(v)", "ms" -> "sum(v)"),
        by = Seq("g"), frame = Some(Frame.months(1, 0)), index = Some("d")),
      df.mutateW("mmn" -> min(col("v")), "mmx" -> max(col("v")),
          "ms" -> sum(col("v")))(
        by = Seq(col("g")), frame = Some(Frame.months(1, 0)),
        index = Some(col("d"))))
    same(
      SqlMutate.render("sqlmutate_t", Seq("mmx" -> "max(v)"),
        by = Seq("g"), frame = Some(Frame.months(2, -1)), index = Some("d")),
      df.mutateW("mmx" -> max(col("v")))(
        by = Seq(col("g")), frame = Some(Frame.months(2, -1)),
        index = Some(col("d"))))
    // ... including global (no-by) and .complete-gated shapes
    same(
      SqlMutate.render("sqlmutate_t", Seq("mmn" -> "min(v)"),
        frame = Some(Frame.months(1, 0)), index = Some("d")),
      df.mutateW("mmn" -> min(col("v")))(
        frame = Some(Frame.months(1, 0)), index = Some(col("d"))))
    same(
      SqlMutate.render("sqlmutate_t",
        Seq("mmx" -> "max(v)", "mc" -> "count(v)"),
        by = Seq("g"), frame = Some(Frame.months(1, 0)), index = Some("d"),
        complete = true),
      df.mutateW("mmx" -> max(col("v")), "mc" -> count(col("v")))(
        by = Seq(col("g")), frame = Some(Frame.months(1, 0)),
        index = Some(col("d")), complete = true))
    // months+SUB-DAY compound Periods render as the seconds-granularity
    // expansion chain (round-11, closing the last documented SQL delta)
    // — the full aggregate family in one statement
    same(
      SqlMutate.render("sqlmutate_t",
        Seq("ms" -> "sum(v)", "mc" -> "count(v)", "mall" -> "count(*)",
          "ma" -> "avg(v)", "mmn" -> "min(v)", "mmx" -> "max(v)",
          "mv" -> "variance(v)"),
        by = Seq("g"), frame = Some(Frame.monthsHours(1, 6, 0, -12)),
        index = Some("d")),
      df.mutateW("ms" -> sum(col("v")), "mc" -> count(col("v")),
          "mall" -> count(lit(1)), "ma" -> avg(col("v")),
          "mmn" -> min(col("v")), "mmx" -> max(col("v")),
          "mv" -> variance(col("v")))(
        by = Seq(col("g")), frame = Some(Frame.monthsHours(1, 6, 0, -12)),
        index = Some(col("d"))))
    // ... negative-after offset + .complete gating, and global (no-by)
    same(
      SqlMutate.render("sqlmutate_t", Seq("ms" -> "sum(v)"),
        by = Seq("g"), frame = Some(Frame.monthsSeconds(2, 3600, -1, 7200)),
        index = Some("d"), complete = true),
      df.mutateW("ms" -> sum(col("v")))(
        by = Seq(col("g")),
        frame = Some(Frame.monthsSeconds(2, 3600, -1, 7200)),
        index = Some(col("d")), complete = true))
    same(
      SqlMutate.render("sqlmutate_t", Seq("mc" -> "count(v)"),
        frame = Some(Frame.monthsHours(1, -6, 0, 6)), index = Some("d")),
      df.mutateW("mc" -> count(col("v")))(
        frame = Some(Frame.monthsHours(1, -6, 0, 6)),
        index = Some(col("d"))))
    // ... strict-lubridate mode on the timestamp axis (clamp rows +
    // the NULL-index row NULL on both paths)
    same(
      SqlMutate.render("sqlmutate_strict_t",
        Seq("ms" -> "sum(v)", "mc" -> "count(v)"),
        by = Seq("g"),
        frame = Some(Frame(FrameEndpoint.MonthsSeconds(1, 3600),
          FrameEndpoint.MonthsSeconds(0, 0), strict = true)),
        index = Some("d")),
      dfStrict.mutateW("ms" -> sum(col("v")), "mc" -> count(col("v")))(
        by = Seq(col("g")),
        frame = Some(Frame(FrameEndpoint.MonthsSeconds(1, 3600),
          FrameEndpoint.MonthsSeconds(0, 0), strict = true)),
        index = Some(col("d"))))
    // rows frame without an order is rejected (SQL has no input order)
    intercept[IllegalArgumentException] {
      SqlMutate.render("sqlmutate_t", Seq("s" -> "sum(v)"),
        frame = Some(Frame.rows(1, 1)))
    }
  }

  test("arity errors are reported at analysis time") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT vec_dot(array(1.0D))").collect()
    }
    assert(e.getMessage.contains("2 arguments"))
  }
}
