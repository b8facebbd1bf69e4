package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the training-prep query shapes shipped this round
  * (chunking, mixture upsampling, global shuffle/shard, vocabulary
  * pruning). The oracle gate pins their VALUES against DuckDB on the
  * fixtures; these specs pin the structural contracts a pipeline
  * consumer relies on — coverage, multiplicity, permutation-ness,
  * order preservation — on adversarial synthetic inputs the fixtures
  * don't exercise (exact-boundary lengths, empty docs, skewed
  * partitionings).
  */
class TrainingPrepSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private val ChunkLen = 64L
  private val Stride = 48L

  /** The chunk_documents shape over an arbitrary (doc_id, text) frame. */
  private def chunk(df: org.apache.spark.sql.DataFrame) = {
    import graft.functions.TextFunctions.tokens
    df.select(col("doc_id"), tokens(col("text")).as("toks"))
      .withColumn("n", size(col("toks")).cast("long"))
      .filter(col("n") > 0)
      .select(col("doc_id"), col("toks"), col("n"),
        explode(sequence(lit(0L), col("n") - 1L, lit(Stride))).as("st"))
      .select(col("doc_id"), expr(s"st div $Stride").as("chunk_id"),
        col("st"),
        array_join(slice(col("toks"), (col("st") + 1L).cast("int"),
          lit(ChunkLen.toInt)), " ").as("chunk_text"),
        least(lit(ChunkLen), col("n") - col("st")).as("chunk_toks"))
  }

  test("chunking: every token covered, stride exact, boundaries correct") {
    // lengths chosen to hit: below one chunk, exactly one chunk, exactly
    // chunk+stride ("st = n" edge would double-count if sequence were
    // inclusive of n), one over, and a long tail
    val lens = Seq(1, 47, 48, 49, 63, 64, 65, 112, 113, 200)
    val docs = lens.zipWithIndex.map { case (len, i) =>
      (i.toLong, (0 until len).map(t => s"t$t").mkString(" "))
    }.toDF("doc_id", "text")
    val ch = chunk(docs).collect()
    val byDoc = ch.groupBy(_.getLong(0))
    for ((len, i) <- lens.zipWithIndex) {
      val rows = byDoc(i.toLong).sortBy(_.getLong(1))
      // chunk count = ceil(len / stride) (starts at 0, stride, ... < len)
      assert(rows.length == (len + Stride - 1) / Stride,
        s"len=$len chunk count")
      // chunk_ids contiguous from 0
      assert(rows.map(_.getLong(1)).toSeq == rows.indices.map(_.toLong),
        s"len=$len ids")
      // every token index in [0, len) covered by >= 1 chunk
      val covered = rows.flatMap { r =>
        val st = r.getLong(2)
        st until math.min(st + ChunkLen, len)
      }.toSet
      assert(covered == (0 until len).map(_.toLong).toSet, s"len=$len cover")
      // last chunk short length = len - last st; others = min(64, ...)
      for (r <- rows)
        assert(r.getLong(4) == math.min(ChunkLen, len - r.getLong(2)))
      // chunk text round-trips the token slice verbatim
      for (r <- rows) {
        val st = r.getLong(2)
        val expect = (st until math.min(st + ChunkLen, len))
          .map(t => s"t$t").mkString(" ")
        assert(r.getString(3) == expect, s"len=$len st=$st text")
      }
    }
    // empty doc yields no chunks (filtered, not a crash)
    assert(chunk(Seq((99L, "")).toDF("doc_id", "text")).count() == 0)
  }

  test("shuffle_shards: rank is a permutation, stable across partitionings") {
    val base = spark.range(1000).select(col("id").as("doc_id"),
        graft.operators.Dedup.baseHash(concat(lit("seed42|"),
          col("id").cast("string"))).as("hk"))
      .withColumn("__one", lit(1L))
    def ranks(parts: Int) = graft.operators.GlobalWindow.cumSum(
        base.repartition(parts), Seq(col("hk"), col("doc_id")), "__one",
        "rank")
      .select(col("doc_id"), col("rank").cast("long").as("rank"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val r4 = ranks(4)
    // a permutation of 1..n
    assert(r4.values.toSeq.sorted == (1L to 1000L))
    // invariant under input partitioning (the determinism contract)
    assert(ranks(13) == r4)
    // and consistent with the hash order (spot-check via a driver sort)
    val expect = base.select("doc_id", "hk").collect()
      .map(r => (r.getLong(1), r.getLong(0))).sorted
      .zipWithIndex.map { case ((_, d), i) => d -> (i + 1L) }.toMap
    assert(r4 == expect)
  }

  test("mixture upsampling: per-source multiplicity matches the weight law") {
    // the sample_mixture copy-count law: k = floor(w) + (unit < frac%)
    val srcNum = substring(col("source"), 4, 8).cast("int")
    val unit = pmod(graft.operators.Dedup.baseHash(
      col("doc_id").cast("string")), lit(100))
    val k = (when(srcNum <= 4, 2).when(srcNum <= 9, 1).otherwise(0) +
      when(unit < when(srcNum <= 4, 50).when(srcNum <= 9, 0)
        .otherwise(25), 1).otherwise(0)).cast("long")
    val docs = (0L until 300L).map(i => (i, s"src${i % 15}"))
      .toDF("doc_id", "source")
    val out = docs.select(col("doc_id"), col("source"), k.as("k"))
      .filter(col("k") > 0)
      .select(col("doc_id"), col("source"),
        explode(sequence(lit(1L), col("k"))).as("epoch"))
      .collect()
    val copies = out.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    val kOf = docs.select(col("doc_id"), k.as("k")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every doc appears exactly k times, k=0 docs not at all
    for ((d, kk) <- kOf)
      assert(copies.getOrElse(d, 0) == kk, s"doc=$d k=$kk")
    // epoch ids are 1..k per doc
    for ((d, rows) <- out.groupBy(_.getLong(0)))
      assert(rows.map(_.getLong(2)).sorted.toSeq == (1L to kOf(d)))
    // weight sanity: 2x sources replicate, 0.25x sources downsample
    val bySrc = out.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(bySrc("src0") >= 2 * 20 && bySrc("src0") <= 3 * 20)
    assert(bySrc.getOrElse("src12", 0) <= 20 / 2)
  }

  test("vocab pruning: order preserved, high-df gone, low-df intact") {
    val docs = Seq(
      (1L, "the quick brown fox the lazy dog"),
      (2L, "the slow red fox the happy cat"),
      (3L, "the old grey fox the small bird"),
      (4L, "")).toDF("doc_id", "text")
    import graft.functions.TextFunctions.tokens
    val n = docs.count()
    val toks = docs.select(col("doc_id"),
      posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
    val high = toks.select("doc_id", "tok").distinct()
      .groupBy("tok").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 0.9 * n).select("tok")
    // df >= 3.6 of 4 docs: "the" and "fox" are in 3 docs → NOT pruned;
    // lower the bar for the test by asserting against the actual set
    val highSet = high.collect().map(_.getString(0)).toSet
    assert(highSet.isEmpty) // 3 of 4 docs < 90%
    val pruned = toks.join(broadcast(high), Seq("tok"), "left_anti")
      .groupBy("doc_id")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("tok")))),
        x => x("tok")), " ").as("pruned"))
    val out = docs.select("doc_id").join(pruned, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("pruned"), lit("")).as("pruned"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // nothing pruned → texts unchanged (order preservation end-to-end)
    assert(out(1L) == "the quick brown fox the lazy dog")
    assert(out(4L) == "") // empty doc survives with empty output
    // now with a 3-of-4 threshold the ubiquitous tokens vanish in order
    val high2 = toks.select("doc_id", "tok").distinct()
      .groupBy("tok").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 3).select("tok")
    assert(high2.collect().map(_.getString(0)).toSet == Set("the", "fox"))
    val out2 = docs.select("doc_id").join(
        toks.join(broadcast(high2), Seq("tok"), "left_anti")
          .groupBy("doc_id")
          .agg(array_join(transform(
            array_sort(collect_list(struct(col("pos"), col("tok")))),
            x => x("tok")), " ").as("pruned")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("pruned"), lit("")).as("pruned"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out2(1L) == "quick brown lazy dog")
    assert(out2(2L) == "slow red happy cat")
  }
}
