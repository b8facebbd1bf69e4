package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing: the co-located-join story from the build brief ("use
  * broadcast() for small dims, repartition/bucketing for co-located
  * joins"). Writing both join sides bucketed (+ sorted) on the join key
  * lets a sort-merge join consume the bucket layout directly — no
  * exchange on EITHER side, and no per-query sort when sortBy matches.
  * At 100 TB this turns every recurring fact-to-fact join on the bucket
  * key from a two-sided shuffle into a scan-and-merge.
  */
class BucketingSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get

  private val dir = "/root/testdata/sf0.001"

  test("bucketed+sorted tables join with zero exchanges and zero sorts") {
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val customer = spark.read.parquet(s"$dir/customer.parquet")
    orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("b_orders")
    customer.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("b_customer")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the shuffle-join path (a broadcast would trivially have no
      // exchange and prove nothing about the bucket layout)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("b_orders").join(spark.table("b_customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      val p = j.queryExecution.executedPlan.toString
      // the JOIN itself must consume bucket layout: no exchange below the
      // SortMergeJoin (the post-join groupBy agg legitimately shuffles)
      assert(p.contains("SortMergeJoin"), s"expected SMJ:\n$p")
      val belowJoin = p.substring(p.indexOf("SortMergeJoin"))
      assert(!belowJoin.contains("Exchange hashpartitioning"),
        s"bucketed join still exchanges:\n$p")
      assert(p.contains("SelectedBucketsCount"), s"bucket scan not used:\n$p")
      // and the result is right (vs the plain unbucketed join)
      val expect = orders.join(customer,
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = j.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  test("windowed mutate over a table bucketed on the partition keys: " +
      "ZERO exchanges") {
    // the 100 TB shape of the reference's core operator: mutateW's one
    // shuffle (PlanSpec "shuffles ONCE") disappears entirely when the
    // table is already bucketed on the window partition keys — the
    // bucketed scan's HashPartitioning satisfies the window's
    // ClusteredDistribution, so a 100 TB fact table laid out once pays
    // zero network for every subsequent windowed mutate over it
    import graft.operators.{Frame, TidierOps}
    import TidierOps._
    import spark.implicits._
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    li.write.bucketBy(8, "l_suppkey").mode("overwrite")
      .saveAsTable("b_lineitem_w")
    try {
      def q(df: org.apache.spark.sql.DataFrame) =
        df.mutateW("s" -> sum(col("l_quantity")))(
          by = Seq(col("l_suppkey")),
          orderBy = Seq(col("l_orderkey"), col("l_linenumber"),
            col("l_partkey")),
          frame = Some(Frame.rows(2, 0)))
      val bucketed = q(spark.table("b_lineitem_w"))
      val p = bucketed.queryExecution.executedPlan.toString
      assert(p.split("Exchange hashpartitioning").length - 1 == 0,
        s"bucketed windowed mutate still shuffles:\n$p")
      // and value-identical to the plain-parquet path (which shuffles)
      val cols = Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
      val got = bucketed.select(cols.map(col) :+ col("s"): _*)
        .collect().map(_.toSeq).toSet
      val expect = q(li).select(cols.map(col) :+ col("s"): _*)
        .collect().map(_.toSeq).toSet
      assert(got == expect)
    } finally spark.sql("DROP TABLE IF EXISTS b_lineitem_w")
  }

  test("compaction: 64 fragments -> 4 range-clustered files, rows intact") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    // run the sink_compacted key, then inspect the layout it wrote
    val out = graft.queries.FormatQueries.queries("sink_compacted")(
      spark, dir)
    out.collect() // force the compaction write
    val root = s"/tmp/graft_roundtrip/${spark.sparkContext.applicationId}" +
      "/sf0.001/lineitem_compacted"
    val files = Option(new java.io.File(root).listFiles()).get
      .filter(f => f.getName.endsWith(".parquet"))
    assert(files.length == 4, s"expected 4 compacted files, got ${files.length}")
    // range clustering: per-file key ranges must not interleave
    val spans = files.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min(col("l_orderkey")), max(col("l_orderkey")),
          count(lit(1))).head
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }.sortBy(_._1)
    spans.sliding(2).foreach {
      case Array((_, hi, _), (lo2, _, _)) =>
        assert(hi <= lo2, s"file ranges interleave: $hi > $lo2")
      case _ =>
    }
    val total = spans.map(_._3).sum
    val orig = spark.read.parquet(s"$dir/lineitem.parquet").count()
    assert(total == orig, s"compaction changed row count: $total vs $orig")
  }

  test("bucket pruning: an equality filter on the bucket key prunes buckets") {
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    orders.write.bucketBy(8, "o_custkey").mode("overwrite")
      .saveAsTable("b_orders_prune")
    // autoBucketedScan turns the bucket layout off when no operator needs
    // its distribution — which also forfeits pruning; pin it on for the
    // scan-only query shape
    val auto = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.get(auto)
    try {
      spark.conf.set(auto, "false")
      val q = spark.table("b_orders_prune")
        .filter(col("o_custkey") === 7L)
      val f = q.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(f.contains("SelectedBucketsCount: 1 out of 8"),
        s"bucket pruning missing:\n$f")
    } finally {
      spark.conf.set(auto, prev)
      spark.sql("DROP TABLE IF EXISTS b_orders_prune")
    }
  }
}
