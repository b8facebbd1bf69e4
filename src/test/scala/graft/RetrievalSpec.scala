package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the retrieval/admission operators added in round 6's
  * second wave. The oracle gate pins their VALUES on the fixtures
  * (`text_bm25`, `text_unigram_logprob`, `dedup_incremental`); these
  * specs pin the semantic contracts on constructed corpora the fixtures
  * can't isolate: BM25's term-frequency and length-normalization
  * ordering, unigram log-prob's rarity ordering, and the incremental
  * probe's planted-duplicate recall with batch/corpus roles kept
  * straight.
  */
class RetrievalSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def bm25(df: org.apache.spark.sql.DataFrame,
      qterms: Seq[String]): Map[Long, Double] = {
    import graft.functions.TextFunctions.tokens
    val d = df.select(col("doc_id"), tokens(col("text")).as("toks"))
      .withColumn("dl", size(col("toks")).cast("double"))
    val stats = d.agg(count(lit(1)).cast("double").as("n"),
      avg(col("dl")).as("avgdl"))
    val tf = d.select(col("doc_id"), col("dl"),
        explode(col("toks")).as("term"))
      .filter(col("term").isin(qterms: _*))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), Seq("term")).crossJoin(broadcast(stats))
      .withColumn("contrib",
        log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
          (col("tf") * 2.2) /
          (col("tf") + (col("dl") / col("avgdl") * 0.75 + 0.25) * 1.2))
      .groupBy("doc_id").agg(sum(col("contrib")).as("bm25"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
  }

  test("bm25: tf ordering, idf rarity ordering, length normalization") {
    // same length everywhere so ordering isolates tf/idf effects
    val docs = Seq(
      (1L, "cat cat cat pad pad pad pad pad"),  // tf(cat)=3
      (2L, "cat pad pad pad pad pad pad pad"),  // tf(cat)=1
      (3L, "rare pad pad pad pad pad pad pad"), // rare term, df=1
      (4L, "pad pad pad pad pad pad pad pad"),
      (5L, "pad pad pad pad pad pad pad pad"),
      (6L, "pad pad pad pad pad pad pad pad")
    ).toDF("doc_id", "text")
    val s = bm25(docs, Seq("cat", "rare"))
    assert(s(1L) > s(2L), "higher tf must score higher at equal length")
    assert(s(3L) > s(2L), "rarer term (df 1 vs 2) must outscore at tf 1")
    assert(!s.contains(4L), "docs without query terms don't score")

    // same tf, longer doc → lower score (length normalization, b=0.75)
    val len = Seq(
      (1L, "cat pad"),
      (2L, "cat pad pad pad pad pad pad pad pad pad pad pad pad pad")
    ).toDF("doc_id", "text")
    val ls = bm25(len, Seq("cat"))
    assert(ls(1L) > ls(2L), "longer doc must be penalized at equal tf")
  }

  test("unigram log-prob: docs of rarer tokens score lower") {
    import graft.functions.TextFunctions.tokens
    val docs = Seq(
      (1L, "the the the the"),  // all common
      (2L, "the the zyx the"),  // one rare token
      (3L, "zyx qwv zyx qwv")   // all rare
    ).toDF("doc_id", "text")
    val tok = docs.select(col("doc_id"),
      explode(tokens(col("text"))).as("term"))
    val cnt = tok.groupBy("term").agg(count(lit(1)).as("c"))
    val tot = cnt.agg(sum(col("c")).cast("double").as("t"))
    val lp = tok.join(broadcast(cnt), Seq("term")).crossJoin(broadcast(tot))
      .groupBy("doc_id").agg(avg(log(col("c") / col("t"))).as("lp"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(lp(1L) > lp(2L) && lp(2L) > lp(3L),
      s"rarity must order the scores, got $lp")
  }

  test("minhashProbe: planted batch-vs-corpus near-dups found, roles kept") {
    // corpus doc i and batch doc 1000+i share 39 of 40 words → J ≈ 0.9;
    // batch docs 1000+i with i >= 50 are fresh (no corpus relative).
    // Words are per-seed PRNG draws from a 100k vocabulary — an earlier
    // arithmetic-progression generator here made docs overlap in shifted
    // runs and the probe (correctly) reported hundreds of genuine
    // extra near-dups
    def words(seed: Int, n: Int): String = {
      val r = new scala.util.Random(seed)
      (0 until n).map(_ => s"w${r.nextInt(100000)}").mkString(" ")
    }
    val corpus = (0 until 50)
      .map(i => (i.toLong, words(i, 40))).toDF("doc_id", "text")
    val batch = (0 until 80).map { i =>
      val t = if (i < 50) words(i, 39) + " zz" else words(i + 5000, 40)
      (1000L + i, t)
    }.toDF("doc_id", "text")
    val pairs = graft.operators.Dedup.minhashProbe(batch, corpus,
        "doc_id", "text", n = 3, k = 32, rowsPerBand = 2,
        minJaccard = 0.5)
      .collect().map(r => (r.getLong(1), r.getLong(0))).toSet
    // every planted (corpus i, batch 1000+i) pair recovered, nothing else
    assert(pairs == (0 until 50).map(i => (i.toLong, 1000L + i)).toSet,
      s"expected the 50 planted cross-pairs, got ${pairs.size}")
  }

  test("kmeans: a starved cluster keeps its centroid instead of crashing") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    // seeds 0 and 1 sit at the IDENTICAL position: round 1 tie-breaks
    // every point to label 0, so cluster 1 is STARVED and the
    // keep-previous-centroid branch fires (a dropped centroid would
    // shrink the literal array and crash or silently relabel). Cluster
    // 0's centroid then moves to the global mean (~1.06), and in round
    // 2 the kept centroid at 0.0 legitimately WINS BACK the points
    // near the origin — the keep-old policy is what lets a starved
    // cluster recover instead of dying
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    def v(x: Float) = Seq.fill(4)(x)
    val rows: Seq[Row] = Seq(
      Row(0L, v(0.0f)), Row(1L, v(0.0f)),
      Row(2L, v(0.1f)), Row(3L, v(0.2f)), Row(4L, v(5.0f)))
    val df = spark.createDataFrame(rows.asJava, schema)
    val out = graft.operators.Similarity.kmeansAssignments(df, k = 2,
        iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(0L -> 1L, 1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 0L),
      s"starved-then-recovered split expected: $out")
  }

  test("asofNearest: empty right side yields all-null matches") {
    import spark.implicits._
    val left = Seq((1L, 10L), (2L, 20L)).toDF("k", "lt")
      .withColumn("tag", col("k").cast("string"))
    val right = Seq.empty[(Long, Long, Double)].toDF("k", "rt", "v")
    val out = graft.operators.AsofJoin.asofNearest(left, right,
        Seq("k"), "lt", "rt", Seq("v"))
      .collect()
    assert(out.length == 2 && out.forall(r => r.isNullAt(3) && r.isNullAt(4)))
  }
}
