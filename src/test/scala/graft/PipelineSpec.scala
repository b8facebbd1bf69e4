package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFunctions._
import graft.operators.Dedup._

/** End-to-end composition: the realistic training-data curation flow —
  * quality/language filtering → exact dedup → near-dup clustering →
  * canonical selection → embedding enrichment — written exactly as a
  * user of the library would write it. One declarative plan per stage,
  * no collects, every stage shuffle-bounded.
  */
class PipelineSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  import spark.implicits._

  test("curation pipeline composes and monotonically narrows the corpus") {
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val n0 = docs.count()

    // 1. score + filter (narrow, no shuffle)
    val scored = docs
      .withColumn("lang", langId($"text"))
      .withColumn("quality", qualityScore($"text"))
    val kept = scored.filter($"lang" === "en" && $"quality" > 0.3)
    val n1 = kept.count()
    assert(n1 > 0 && n1 <= n0)

    // 2. exact dedup: keep min doc_id per fingerprint (one shuffle)
    val wFp = Window.partitionBy($"fp").orderBy($"doc_id")
    val exact = kept.withColumn("fp", fingerprint($"text"))
      .withColumn("rn", row_number().over(wFp))
      .filter($"rn" === 1).drop("rn")
    val n2 = exact.count()
    assert(n2 > 0 && n2 <= n1)
    assert(exact.select("fp").distinct().count() == n2)

    // 3. near-dup clusters → canonical = min doc per cluster
    val pairs = jaccardPairs(exact, "doc_id", "text", n = 3, minJaccard = 0.5)
    val clusters = duplicateClusters(pairs)
    val canonical = exact.join(clusters, Seq("doc_id"), "left")
      .filter($"cluster_id".isNull || $"cluster_id" === $"doc_id")
    val n3 = canonical.count()
    assert(n3 > 0 && n3 <= n2)
    // canonical set keeps exactly one doc per near-dup cluster
    val nClusters = clusters.select("cluster_id").distinct().count()
    val dropped = n2 - n3
    assert(dropped == clusters.count() - nClusters)

    // 4. enrich with embeddings (broadcastable dim) + sanity on features
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val enriched = canonical.join(broadcast(emb),
      canonical("doc_id") === emb("vec_id"), "left")
    assert(enriched.count() == n3) // left join keeps cardinality

    // the whole pipeline is one lazy plan end-to-end: no action needed
    // to build it, and explain() succeeds on the composed plan
    assert(enriched.queryExecution.executedPlan.toString.nonEmpty)
  }
}
