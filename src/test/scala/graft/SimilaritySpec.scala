package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity._

class SimilaritySpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("dot: null elements and ragged lengths poison the result to NULL") {
    val df = Seq(
      (Seq(Some(1f), None, Some(2f)), Seq(Some(1f), Some(1f), Some(1f))),
      (Seq(Some(1f), Some(2f)), Seq(Some(1f), Some(2f), Some(3f))),
      (Seq(Some(1f), Some(2f)), Seq(Some(3f), Some(4f)))).toDF("a", "b")
      .select(dot($"a", $"b").as("d"))
    val rows = df.collect()
    assert(rows(0).isNullAt(0), "null element must yield NULL")
    assert(rows(1).isNullAt(0), "length mismatch must yield NULL")
    assert(rows(2).getDouble(0) == 11.0)
  }

  test("cosine: orthogonal→0, identical→1, opposite→-1") {
    val df = Seq(
      (Seq(1f, 0f), Seq(0f, 1f)),
      (Seq(1f, 2f), Seq(1f, 2f)),
      (Seq(1f, 0f), Seq(-1f, 0f))).toDF("a", "b")
      .select(cosine($"a", $"b").as("c"))
    val got = df.collect().map(_.getDouble(0))
    assert(math.abs(got(0)) < 1e-12)
    assert(math.abs(got(1) - 1.0) < 1e-12)
    assert(math.abs(got(2) + 1.0) < 1e-12)
  }

  test("cosineTopK: ranks are contiguous, scores non-increasing, no self") {
    val topk = cosineTopK(emb, emb.filter($"vec_id" < 5), 4).collect()
    val byQ = topk.groupBy(_.getLong(0))
    assert(byQ.size == 5)
    byQ.foreach { case (q, rows) =>
      val sorted = rows.sortBy(_.getLong(3))
      assert(sorted.map(_.getLong(3)).toSeq == Seq(1L, 2L, 3L, 4L))
      val scores = sorted.map(_.getDouble(2)).toSeq
      assert(scores == scores.sorted.reverse, s"scores not descending for $q")
      assert(!rows.exists(_.getLong(1) == q), "self-match leaked")
    }
  }

  test("brute-force baselines fail fast past the row cap, naming the " +
      "sub-quadratic sibling") {
    val conf = graft.operators.Similarity.BruteRowsCapConf
    spark.conf.set(conf, "3")
    try {
      val e1 = intercept[IllegalArgumentException] {
        cosineTopK(emb, emb.limit(2), 2)
      }
      assert(e1.getMessage.contains("ivf"), e1.getMessage)
      assert(e1.getMessage.contains(conf), e1.getMessage)
      val e2 = intercept[IllegalArgumentException] {
        cosinePairs(emb, 0.9)
      }
      assert(e2.getMessage.contains("srpNearPairs"), e2.getMessage)
      // within the cap both still construct (and the guard's limit()
      // early-out never scanned past cap+1 rows)
      cosineTopK(emb.limit(3), emb.limit(2), 2)
      cosinePairs(emb.limit(3), 0.9)
    } finally spark.conf.unset(conf)
  }

  test("topKRank (bounded-buffer agg) equals the window-function top-k") {
    val q = emb.filter($"vec_id" < 20)
    val scored = emb.select($"vec_id".as("nbr_id"), $"embedding".as("nv"))
      .crossJoin(broadcast(q.select($"vec_id".as("query_id"),
        $"embedding".as("qv"))))
      .filter($"query_id" =!= $"nbr_id")
      .withColumn("cosine", cosine($"qv", $"nv"))
    val viaAgg = cosineTopK(emb, q, 4).collect()
      .map(r => (r.getLong(0), r.getLong(3)) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_id").orderBy($"cosine".desc, $"nbr_id")
    val viaWindow = scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 4).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank").toLong) ->
        (r.getAs[Long]("nbr_id"), r.getAs[Double]("cosine")))
      .toMap
    assert(viaAgg == viaWindow)
  }

  test("srpNearPairs: subset of brute force (precision 1.0), decent recall") {
    val tau = 0.35 // random 64-dim corpus: a few dozen pairs above this
    val brute = emb.as("a").join(emb.as("b"), $"a.vec_id" < $"b.vec_id")
      .withColumn("c", cosine($"a.embedding", $"b.embedding"))
      .filter($"c" >= tau)
      .select($"a.vec_id", $"b.vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = srpNearPairs(emb, tau, nBits = 32, rowsPerBand = 2)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty, "threshold should produce some pairs")
    assert(lsh.subsetOf(brute), "verification must kill false positives")
    val recall = lsh.size.toDouble / brute.size
    // p(bit)=1-acos(0.35)/pi≈0.6; r=2,b=16 → expected recall ≈ 1-(1-.36)^16≈0.999
    assert(recall >= 0.8, s"recall $recall below floor (${lsh.size}/${brute.size})")
  }

  test("ivfTopK: probing 4/8 clusters recovers most of exact top-3") {
    val cents = emb.filter($"vec_id" < 8)
      .select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toSeq))
    val queries = emb.filter($"vec_id" < 20)
    val exact = cosineTopK(emb, queries, 3)
      .select("query_id", "nbr_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = ivfTopK(emb, queries, cents, k = 3, nProbe = 4)
      .select("query_id", "nbr_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ivf intersect exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall $recall too low")
    // and exact re-ranking means every returned pair is honestly scored
    assert(ivf.size == exact.size)
  }

  test("ivfAssign: every vector lands in exactly one cluster") {
    val cents = emb.filter($"vec_id" < 8)
      .select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toSeq))
    val assigned = ivfAssign(emb, cents)
    assert(assigned.count() == emb.count())
    assert(assigned.filter($"cluster".isNull).count() == 0)
    val nClusters = assigned.select("cluster").distinct().count()
    assert(nClusters > 1 && nClusters <= 8)
  }
}
