package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Both product tiers — the typed Aggregator/udaf
  * (functions.ProductAgg.product) and the native DeclarativeAggregate
  * (functions.ProductAgg.productDecl / SQL product_agg) — must agree with
  * each other and with DuckDB product() semantics: nulls skipped,
  * zero-non-null group is NULL. */
class ProductAggSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private lazy val df = Seq(
    ("g1", Some(2.0)), ("g1", Some(3.0)), ("g1", None),
    ("g2", Some(0.5)), ("g3", None), ("g3", None)
  ).toDF("g", "x")

  private def byGroup(c: org.apache.spark.sql.Column): Map[String, Option[Double]] =
    df.groupBy("g").agg(c.as("p")).collect()
      .map(r => r.getString(0) -> Option(r.get(1)).map(_.asInstanceOf[Double]))
      .toMap

  private val expected =
    Map("g1" -> Some(6.0), "g2" -> Some(0.5), "g3" -> None)

  test("udaf tier: nulls skipped, all-null group is NULL") {
    assert(byGroup(graft.functions.ProductAgg.product($"x")) == expected)
  }

  test("declarative tier agrees with the udaf tier on group-agg") {
    assert(byGroup(graft.functions.ProductAgg.productDecl($"x")) == expected)
  }

  test("declarative tier over a sliding window frame") {
    val w = Window.partitionBy($"g").orderBy($"i")
      .rowsBetween(-1, 0)
    val d = Seq(("a", 1, 2.0), ("a", 2, 3.0), ("a", 3, 4.0))
      .toDF("g", "i", "x")
    val out = d.select($"i",
        graft.functions.ProductAgg.productDecl($"x").over(w).as("p"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(out == Map(1 -> 2.0, 2 -> 6.0, 3 -> 12.0))
  }

  test("SQL product_agg matches the Column API, casts int input") {
    GraftExtensions.register(spark)
    df.createOrReplaceTempView("prod_t")
    val viaSql = spark.sql(
      "SELECT g, product_agg(x) AS p FROM prod_t GROUP BY g")
      .collect()
      .map(r => r.getString(0) -> Option(r.get(1)).map(_.asInstanceOf[Double]))
      .toMap
    assert(viaSql == expected)
    // int input goes through the registration-site cast
    val r = spark.sql("SELECT product_agg(v) FROM VALUES (2), (3) AS t(v)")
      .collect()(0).getDouble(0)
    assert(r == 6.0)
  }

  test("non-double input without a cast is rejected at analysis time") {
    import org.apache.spark.sql.graft.ColumnShim
    val bad = ColumnShim.column(
      graft.functions.ProductExpr(
        ColumnShim.expression(col("v"))).toAggregateExpression())
    val ex = intercept[Exception] {
      Seq(1, 2).toDF("v").agg(bad).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("double"))
  }
}
