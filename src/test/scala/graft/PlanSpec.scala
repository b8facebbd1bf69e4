package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Frame, TidierOps}
import TidierOps._

/** Physical-plan assertions: the plans we want at 100 TB, checked at
  * test scale. A correct result off a bad plan is a latent scale bug —
  * these tests pin the properties that make the operators survive a
  * 100× scale-up (SURVEY.md §4.2, build brief "optimize for scale").
  */
class PlanSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def formatted(df: DataFrame): String = {
    val qe = df.queryExecution
    org.apache.spark.sql.execution.ExplainMode.fromString("formatted") match {
      case m => qe.explainString(m)
    }
  }

  test("column pruning: a 2-column projection reads a 2-column schema") {
    val df = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val f = formatted(df)
    val readSchema = f.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_extendedprice"),
      s"scan reads pruned columns: $readSchema")
  }

  test("filter pushdown: predicate reaches the parquet scan") {
    val df = spark.read.parquet(s"$dir/orders.parquet")
      .filter($"o_orderkey" < 100).select("o_orderkey", "o_totalprice")
    val f = formatted(df)
    val pushed = f.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(pushed.contains("LessThan(o_orderkey,100)"),
      s"filter not pushed: $pushed")
  }

  test("CollapseWindow: N same-spec expressions produce ONE Window node") {
    val df = spark.read.parquet(s"$dir/lineitem.parquet")
      .mutateW("a" -> sum($"l_quantity"), "b" -> avg($"l_quantity"),
        "c" -> count(lit(1)), "d" -> min($"l_quantity"))(
        by = Seq($"l_returnflag"),
        orderBy = Seq($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey"),
        frame = Some(Frame.rows(3, 0)))
    val p = plan(df)
    assert(p.split("Window \\[").length - 1 == 1,
      s"expected exactly one Window operator:\n$p")
  }

  test("window_ewma's 20 lag terms share exactly ONE Window node (and one " +
      "exchange)") {
    // the last audit-only plan shape promoted to a test (r07 verdict
    // item 5): 20 lag(value, j) calls over one spec must collapse into
    // a single WindowExec — 20 sequential Window nodes would be 20
    // sort-buffer passes at 100 TB
    val df = SparkEntry.queries("window_ewma")(spark, dir)
    val p = plan(df)
    assert(p.split("Window \\[").length - 1 == 1,
      s"expected exactly one Window operator:\n$p")
    assert(p.split("Exchange ").length - 1 == 1,
      s"expected exactly one exchange (the user_id hash partition):\n$p")
  }

  test("windowed mutate shuffles ONCE on the partition keys") {
    val df = spark.read.parquet(s"$dir/lineitem.parquet")
    val out = df.mutateW("s" -> sum($"l_quantity"))(
      by = Seq($"l_returnflag"), orderBy = Seq($"l_orderkey"),
      frame = Some(Frame.rows(2, 2)))
    val p = plan(out)
    val nExchanges = p.split("Exchange hashpartitioning").length - 1
    assert(nExchanges == 1, s"expected one hash exchange:\n$p")
  }

  test("cosineTopK broadcasts the query side (no shuffle of the corpus)") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val out = graft.operators.Similarity.cosineTopK(
      emb, emb.filter($"vec_id" < 5), k = 3)
    val p = plan(out)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"query side not broadcast:\n$p")
  }

  test("dedup verification joins broadcast the df-count side, not postings") {
    // The high-level property: jaccardPairs must not shuffle shingle
    // STRINGS anywhere — all exchanges carry 8-byte hash keys.
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val out = graft.operators.Dedup.jaccardPairs(docs, "doc_id", "text")
    val p = plan(out)
    assert(!p.contains("array_intersect"), "string intersection survived")
  }

  test("partitioned-parquet read-back prunes to the filtered partition") {
    // The sink_partitioned_parquet contract: a filter on the partition
    // column must become a PartitionFilters entry on the scan — never a
    // full-scan-then-filter.
    val path = "/tmp/graft_plan_spec/orders_part"
    spark.read.parquet(s"$dir/orders.parquet").write.mode("overwrite")
      .partitionBy("o_orderstatus").parquet(path)
    val df = spark.read.parquet(path).filter($"o_orderstatus" === "F")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    val f = formatted(df)
    val pf = f.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("o_orderstatus") && pf.contains("F"),
      s"partition filter not pruned at scan: $pf\n$f")
    // and the row filter must NOT appear as a post-scan Filter on data rows
    assert(!plan(df).contains("Filter (o_orderstatus"),
      "partition predicate evaluated per-row instead of pruning")
  }

  test("IVF buckets as physical partitions: a probe prunes to its clusters") {
    // The 100 TB similarity-search path (Similarity.ivfAssign scaladoc):
    // write the corpus partitioned by IVF cluster; an nProbe query then
    // reads ONLY its probed clusters' subtrees via partition pruning —
    // the scan must carry the cluster PartitionFilters, not a row filter.
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val cents = emb.filter($"vec_id" < 4)
      .select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toSeq))
      .sortBy(_._1)
    val path = "/tmp/graft_plan_spec/ivf_part"
    graft.operators.Similarity.ivfAssign(emb, cents)
      .write.mode("overwrite").partitionBy("cluster").parquet(path)
    val probed = spark.read.parquet(path)
      .filter($"cluster".isin(0L, 2L))
      .select("vec_id", "embedding")
    val f = formatted(probed)
    val pf = f.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("cluster") && pf.toUpperCase.contains("IN (0,2"),
      s"probe not partition-pruned: $pf\n$f")
    // and the cluster predicate is NOT evaluated per data row (it exists
    // only as the scan's partition filter — a residual row Filter would
    // mean pruning didn't happen)
    assert(!plan(probed).contains("Filter (cluster"),
      "cluster predicate evaluated per-row instead of pruning")
    assert(probed.count() > 0)
  }

  test("time-window aggs are hash aggs over (key, window) — no WindowExec") {
    // Tumbling/session windows must compile to TimeWindow projections +
    // hash aggregation (streaming-transferable), not analytic windows.
    val q = SparkEntry.queries("window_tumbling_day")(spark, dir)
    val p = plan(q)
    assert(p.contains("HashAggregate"), s"no hash agg:\n$p")
    assert(!p.contains("Window ["), s"unexpected WindowExec:\n$p")
  }

  test("whole-stage codegen covers the scalar pipeline (no interpreted gaps)") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val out = docs.select(col("doc_id"),
      graft.operators.Dedup.shingleHashes(col("text"), 3).as("hs"))
    // `*(n)` prefixes mark operators fused into WholeStageCodegen stage n.
    val p = plan(out)
    assert(p.linesIterator.exists(l => l.trim.startsWith("*(")),
      s"no codegen span:\n$p")
    assert(p.linesIterator.filter(_.contains("Project"))
      .forall(_.contains("*(")), s"interpreted Project in:\n$p")
  }

  test("SumL128 moment aggs plan as codegen HashAggregate (long fast path)") {
    // the round-8 claim behind centMoments: the exact 124-bit sums keep
    // the whole aggregation in primitive-buffer HashAggregateExec —
    // an ObjectHashAggregate/SortAggregate here means some buffer type
    // fell off the UnsafeRow fast path and the rewrite lost its point
    for (key <- Seq("agg_moments", "agg_regression", "agg_conditional")) {
      val p = plan(SparkEntry.queries(key)(spark, dir))
      assert(p.contains("HashAggregate"), s"$key not hash-agg:\n$p")
      assert(!p.contains("ObjectHashAggregate") && !p.contains("SortAggregate"),
        s"$key left the primitive-buffer agg path:\n$p")
      assert(p.split("Exchange hashpartitioning").length - 1 == 1,
        s"$key should shuffle once (partial→final):\n$p")
    }
  }
}
