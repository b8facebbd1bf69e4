package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sources/sinks coverage (SURVEY.md §2.4 row 1): the reference operates
  * on tables someone else opened; our engine inherits Spark's reader/
  * writer surface. These specs pin the formats round-trip losslessly and
  * that partitioned layouts give physical partition pruning — the layout
  * property every 100 TB table depends on.
  */
class SourcesSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private val src = "/root/testdata/sf0.001"
  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_$name")
    d.toFile.deleteOnExit(); d.toString + "/out"
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.orderBy("n_nationkey").collect().map(_.toString).toSeq

  test("parquet → csv → parquet round-trips values and schema") {
    val nation = spark.read.parquet(s"$src/nation.parquet")
    val p = tmp("csv")
    nation.write.option("header", "true").csv(p)
    val back = spark.read.option("header", "true")
      .schema(nation.schema).csv(p)
    assert(canon(back) == canon(nation))
  }

  test("parquet → json → parquet round-trips values") {
    val nation = spark.read.parquet(s"$src/nation.parquet")
    val p = tmp("json")
    nation.write.json(p)
    val back = spark.read.schema(nation.schema).json(p)
    assert(canon(back) == canon(nation))
  }

  test("partitionBy layout gives partition pruning (PartitionFilters)") {
    val li = spark.read.parquet(s"$src/lineitem.parquet")
    val p = tmp("part")
    li.write.partitionBy("l_returnflag").parquet(p)
    val pruned = spark.read.parquet(p).filter($"l_returnflag" === "R")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.contains("l_returnflag"),
      s"no partition pruning in:\n$scan")
    // pruning must not change results
    assert(pruned.count() ==
      li.filter($"l_returnflag" === "R").count())
  }

  test("bucketed tables join co-located — zero exchanges in the join plan") {
    val li = spark.read.parquet(s"$src/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val or = spark.read.parquet(s"$src/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("b_lineitem")
    or.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("b_orders")
    val joined = spark.table("b_lineitem").join(spark.table("b_orders"),
      $"l_orderkey" === $"o_orderkey")
    val p = joined.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$p")
    assert(joined.count() == li.join(or,
      $"l_orderkey" === $"o_orderkey").count())
  }

  test("sorted single-partition parquet write preserves min/max pushdown") {
    val orders = spark.read.parquet(s"$src/orders.parquet")
    val p = tmp("sorted")
    orders.sort("o_orderkey").coalesce(1).write.parquet(p)
    val back = spark.read.parquet(p).filter($"o_orderkey" === 1)
    val f = back.queryExecution.executedPlan.toString
    assert(f.contains("PushedFilters") && f.contains("EqualTo(o_orderkey,1)"))
  }
}
