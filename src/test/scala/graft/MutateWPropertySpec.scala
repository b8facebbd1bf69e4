package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Frame, FrameEndpoint, TidierOps}
import TidierOps._

/** Property tests for frame-boundary invariants of the windowed mutate
  * (SURVEY.md §5 plan item (c)): algebraic identities that must hold for
  * ANY data, not just hand-sized fixtures. (ScalaCheck driven directly —
  * the scalatest bridge artifact isn't in the offline cache; 20 cases
  * per property keeps the Spark-job-per-case cost sane.)
  */
class MutateWPropertySpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(20).withWorkers(1)
    val res = SCTest.check(params, p)
    assert(res.passed, res.status.toString)
  }

  // Small random grouped tables: up to 4 groups × up to 12 rows.
  private val tableGen: Gen[List[(String, Int, Double)]] = for {
    n <- Gen.choose(1, 30)
    rows <- Gen.listOfN(n, for {
      g <- Gen.oneOf("a", "b", "c", "d")
      o <- Gen.choose(0, 11)
      v <- Gen.choose(-100, 100).map(_.toDouble)
    } yield (g, o, v))
  } yield rows

  private def df(rows: List[(String, Int, Double)]): DataFrame = {
    // a unique tiebreaker makes every window deterministic
    rows.zipWithIndex.map { case ((g, o, v), i) => (g, o, v, i.toLong) }
      .toDF("g", "o", "v", "rid")
  }

  private def col0Doubles(d: DataFrame): Seq[Double] =
    d.select("x").collect().toSeq.map(r =>
      if (r.isNullAt(0)) Double.NaN else r.getDouble(0))

  test("frame (0,0) ⇒ aggregate of self: sum == v") {
    check(forAll(tableGen) { rows =>
      rows.isEmpty || {
        val out = df(rows).mutateW("x" -> sum($"v"))(
          by = Seq($"g"), orderBy = Seq($"o", $"rid"),
          frame = Some(Frame.rows(0, 0)))
        out.select("v", "x").collect()
          .forall(r => r.getDouble(0) == r.getDouble(1))
      }
    })
  }

  test("frame (Inf,Inf) ⇒ group-constant == groupBy aggregate") {
    check(forAll(tableGen) { rows =>
      rows.isEmpty || {
        val out = df(rows).mutateW("x" -> sum($"v"))(
          by = Seq($"g"),
          frame = Some(Frame(FrameEndpoint.Unbounded, FrameEndpoint.Unbounded)))
        val expect = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
        out.select("g", "x").collect()
          .forall(r => math.abs(r.getDouble(1) - expect(r.getString(0))) < 1e-9)
      }
    })
  }

  test("cumulative frame at the last row of each group == group total") {
    check(forAll(tableGen) { rows =>
      rows.isEmpty || {
        val out = df(rows).mutateW("x" -> sum($"v"))(
          by = Seq($"g"), orderBy = Seq($"o", $"rid"),
          frame = Some(Frame.cumulative))
        val lastPerGroup = out.withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy($"g")
              .orderBy($"o".desc, $"rid".desc)))
          .filter($"rn" === 1)
        val expect = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
        lastPerGroup.select("g", "x").collect()
          .forall(r => math.abs(r.getDouble(1) - expect(r.getString(0))) < 1e-9)
      }
    })
  }

  test("complete=true nulls exactly the rows within `before` of the group start" +
    " or `after` of the group end") {
    check(forAll(tableGen, Gen.choose(0, 3), Gen.choose(0, 3)) { (rows, b, a) =>
      rows.isEmpty || {
        val out = df(rows).mutateW("x" -> sum($"v"))(
          by = Seq($"g"), orderBy = Seq($"o", $"rid"),
          frame = Some(Frame.rows(b, a)), complete = true)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"g").orderBy($"o", $"rid")
        val checked = out
          .withColumn("pos", row_number().over(w))
          .withColumn("cnt", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy($"g")))
        checked.collect().forall { r =>
          val pos = r.getAs[Int]("pos"); val cnt = r.getAs[Long]("cnt")
          val isComplete = pos - b >= 1 && pos + a <= cnt
          r.isNullAt(r.fieldIndex("x")) == !isComplete
        }
      }
    })
  }

  test("differential fuzz: mutateW equals spark.sql(SqlMutate.render) " +
      "across random (by, order, frame, complete) x aggregate specs") {
    // The two surfaces are independent implementations of the same verb
    // (TidierOps compiles WindowSpecs / CalendarWindow pipelines;
    // SqlMutate renders SQL text) — random differential replay catches
    // router/renderer divergence the fixed-shape equivalence suite
    // cannot. The cross-ENGINE replay (vs DuckDB, incl. NULL values and
    // NULL groups) is graft.Fuzz + tools/check_oracle.py.
    import org.apache.spark.sql.Column
    import graft.sql.SqlMutate
    val views = new java.util.concurrent.atomic.AtomicLong(0)
    val aggOf: Int => (Column => Column, String) = Seq[(Column => Column, String)](
      (sum(_), "sum"), (c => count(c), "count"),
      (min(_), "min"), (max(_), "max"), (avg(_), "avg"))
    val specGen = for {
      shape <- Gen.choose(0, 4)
      aggI <- Gen.choose(0, 4)
      useBy <- Gen.oneOf(true, false)
      desc <- Gen.oneOf(true, false)
      b <- Gen.choose(0, 5)
      a <- Gen.choose(0, 3)
      complete <- Gen.oneOf(true, false)
    } yield (shape, aggI, useBy, desc, b, a, complete)
    check(forAll(tableGen, specGen) { (rows, spec) =>
      rows.isEmpty || {
        val (shape, aggI, useBy, desc, b, a, complete) = spec
        val (aggC, aggN) = aggOf(aggI)
        val base = df(rows).withColumn("d", date_add(
          lit("2024-01-01").cast("date"),
          (col("o") * 3 + pmod(col("rid"), lit(7))).cast("int")))
        val vn = s"fuzz_diff_${views.incrementAndGet()}"
        base.createOrReplaceTempView(vn)
        val by = if (useBy) Seq($"g") else Nil
        val byS = if (useBy) Seq("g") else Nil
        val ordC = Seq(if (desc) $"o".desc else $"o", $"rid")
        val ordS = Seq(if (desc) "o DESC" else "o", "rid")
        val (res, sql) = shape match {
          case 0 => // running
            (base.mutateW("out" -> aggC($"v"))(by = by, orderBy = ordC),
              SqlMutate.render(vn, Seq("out" -> s"$aggN(v)"),
                by = byS, orderBy = ordS))
          case 1 => // group-constant
            (base.mutateW("out" -> aggC($"v"))(by = Seq($"g")),
              SqlMutate.render(vn, Seq("out" -> s"$aggN(v)"),
                by = Seq("g")))
          case 2 => // rows frame (+ complete)
            (base.mutateW("out" -> aggC($"v"))(by = by, orderBy = ordC,
              frame = Some(Frame.rows(b, a)), complete = complete),
              SqlMutate.render(vn, Seq("out" -> s"$aggN(v)"), by = byS,
                orderBy = ordS, frame = Some(Frame.rows(b, a)),
                complete = complete))
          case 3 => // days index frame (+ complete)
            (base.mutateW("out" -> aggC($"v"))(by = by,
              frame = Some(Frame.days(b, a)), index = Some($"d"),
              complete = complete),
              SqlMutate.render(vn, Seq("out" -> s"$aggN(v)"), by = byS,
                frame = Some(Frame.days(b, a)), index = Some("d"),
                complete = complete))
          case _ => // trailing month frame (incl. min/max expansion SQL)
            (base.mutateW("out" -> aggC($"v"))(by = by,
              frame = Some(Frame.months(math.max(b, 1), 0)),
              index = Some($"d")),
              SqlMutate.render(vn, Seq("out" -> s"$aggN(v)"), by = byS,
                frame = Some(Frame.months(math.max(b, 1), 0)),
                index = Some("d")))
        }
        val got = res.select("rid", "out").collect()
          .map(r => (r.getLong(0), Option(r.get(1)))).toSet
        val want = spark.sql(sql).select("rid", "out").collect()
          .map(r => (r.getLong(0), Option(r.get(1)))).toSet
        spark.catalog.dropTempView(vn)
        got == want
      }
    })
  }

  test("multi-expression call equals separate single-expression calls") {
    check(forAll(tableGen) { rows =>
      rows.isEmpty || {
        val both = df(rows).mutateW(
          "x" -> sum($"v"), "y" -> avg($"v"))(
          by = Seq($"g"), orderBy = Seq($"o", $"rid"),
          frame = Some(Frame.rows(1, 1)))
        val one = df(rows).mutateW("x" -> sum($"v"))(
          by = Seq($"g"), orderBy = Seq($"o", $"rid"),
          frame = Some(Frame.rows(1, 1)))
        val gotX = both.orderBy("rid").select("x").collect().map(_.getDouble(0)).toSeq
        val oneX = one.orderBy("rid").select("x").collect().map(_.getDouble(0)).toSeq
        gotX == oneX
      }
    })
  }
}
