package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup._

class DedupSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("shingles: distinct n-grams, empty below n tokens") {
    val r = Seq("a b c d", "a b", "a b a b c").toDF("text")
      .select(shingles($"text", 3).as("sh")).collect()
    assert(r(0).getSeq[String](0) == Seq("a b c", "b c d"))
    assert(r(1).getSeq[String](0).isEmpty)
    // "a b a b c" → grams: a b a, b a b, a b c — all distinct here
    assert(r(2).getSeq[String](0).toSet == Set("a b a", "b a b", "a b c"))
  }

  test("shingleHashes kernel equals declarative shingles→baseHash on real docs") {
    val fused = docs.select($"doc_id", shingleHashes($"text", 3).as("h"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).sorted).toMap
    val slow = docs.select($"doc_id",
        transform(shingles($"text", 3), s => baseHash(s)).as("h"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).sorted).toMap
    assert(fused == slow)
  }

  test("minhashPairs finds exactly the same pairs as exact jaccardPairs") {
    val exact = jaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = minhashPairs(docs, "doc_id", "text", 3, 32, 2, 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture should contain planted near-dups")
    assert(lsh == exact)
  }

  test("identical docs have jaccard 1.0 and identical minhash signatures") {
    val two = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "completely different words entirely here now")).toDF("doc_id", "text")
    val pairs = jaccardPairs(two, "doc_id", "text", 3, 0.5).collect()
    assert(pairs.length == 1 &&
      pairs(0).getLong(0) == 1L && pairs(0).getLong(1) == 2L &&
      pairs(0).getDouble(2) == 1.0)
    val sigs = two.select(minhashSignature(shingles($"text", 3), 32)).collect()
    assert(sigs(0).getSeq[Long](0) == sigs(1).getSeq[Long](0))
    assert(sigs(0).getSeq[Long](0) != sigs(2).getSeq[Long](0))
  }

  test("simhash: identical → equal; one-word edit → small hamming") {
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"))
      .toDF("doc_id", "text")
    val sims = d.select(simhash(shingles($"text", 3))).collect().map(_.getLong(0))
    assert(sims(0) == sims(1))
    val ham13 = java.lang.Long.bitCount(sims(0) ^ sims(2))
    assert(ham13 > 0 && ham13 <= 12, s"edit distance 1 gave hamming $ham13")
  }

  test("simhashPairs banding equals brute-force (pigeonhole recall = 1)") {
    val brute = docs.select($"doc_id", simhash(shingles($"text", 3)).as("sim"))
      .filter(size(shingles($"text", 3)) > 0)
    val expected = brute.as("a").join(brute.as("b"),
        $"a.doc_id" < $"b.doc_id" &&
        bit_count($"a.sim".bitwiseXOR($"b.sim")) <= 3)
      .select($"a.doc_id", $"b.doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = simhashPairs(docs, "doc_id", "text", 3, 3)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == expected)
  }

  test("containmentPairs: catches a contained quote Jaccard misses") {
    import org.apache.spark.sql.functions._
    val r = new scala.util.Random(11)
    val big = (0 until 400).map(_ => s"w${r.nextInt(100000)}").mkString(" ")
    val quote = big.split(" ").slice(100, 140).mkString(" ") // 40 words
    val noise = (0 until 40).map(_ => s"x${r.nextInt(100000)}").mkString(" ")
    val docs = Seq((1L, big), (2L, quote), (3L, noise))
      .toDF("doc_id", "text")
    val cp = graft.operators.Dedup.containmentPairs(
        docs, "doc_id", "text", n = 3, minContainment = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet // (contained, container)
    assert(cp.contains((2L, 1L)), s"quote-in-doc pair missing: $cp")
    assert(!cp.exists(_._1 == 3L) && !cp.exists(_._2 == 3L))
    // the same pair is INVISIBLE to a 0.5-Jaccard gate (J ~ 38/398)
    val jp = graft.operators.Dedup.jaccardPairs(
        docs, "doc_id", "text", n = 3, minJaccard = 0.5).count()
    assert(jp == 0L)
  }

  test("duplicateClusters: chains collapse to one component (multi-hop)") {
    // path graph 1-2-3-4 plus isolated pair 10-11: two clusters
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("doc_a", "doc_b")
    val got = duplicateClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("duplicateClusters: empty pair graph yields empty labels (no NPE)") {
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(duplicateClusters(empty).collect().isEmpty)
  }

  test("duplicateClusters: output schema is strategy-independent") {
    // int ids: union-find must cast back (not widen to long); string ids
    // must route to the distributed path instead of null-casting
    val intPairs = Seq((1, 2), (2, 3)).toDF("doc_a", "doc_b")
    val small = duplicateClusters(intPairs)
    val large = duplicateClusters(intPairs, driverEdgeLimit = 0)
    assert(small.schema == large.schema)
    assert(small.collect().map(r => r.getInt(0) -> r.getInt(1)).toMap ==
      large.collect().map(r => r.getInt(0) -> r.getInt(1)).toMap)
    val strPairs = Seq(("a", "b"), ("b", "c")).toDF("doc_a", "doc_b")
    val got = duplicateClusters(strPairs).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("a" -> "a", "b" -> "a", "c" -> "a"))
    // mixed integral widths widen to the COMMON type on both strategies,
    // and long ids above Int.MaxValue survive the driver round-trip
    val big = 5000000000L
    val mixed = Seq((1, big), (2, big + 1)).toDF("a32", "b64")
      .select(col("a32").as("doc_a"), col("b64").as("doc_b"))
    val uf = duplicateClusters(mixed)
    val dist = duplicateClusters(mixed, driverEdgeLimit = 0)
    assert(uf.schema == dist.schema)
    assert(uf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      dist.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
  }

  test("duplicateClusters: null-id edges are dropped on BOTH strategies") {
    // a null identifies no document — previously union-find NPE'd while
    // the distributed loop kept the non-null side, so the answer depended
    // on the edge-count heuristic
    val pairs = Seq((Option(1L), Option(2L)), (Option.empty[Long], Option(3L)),
      (Option(4L), Option.empty[Long])).toDF("doc_a", "doc_b")
    val want = Map(1L -> 1L, 2L -> 1L)
    val uf = duplicateClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = duplicateClusters(pairs, driverEdgeLimit = 0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(uf == want && dist == want)
  }

  test("duplicateClusters: distributed path (driverEdgeLimit=0) agrees") {
    // force the label-propagation strategy and check it matches union-find
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (5L, 4L))
      .toDF("doc_a", "doc_b")
    val dist = duplicateClusters(pairs, driverEdgeLimit = 0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val uf = duplicateClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == uf)
    assert(dist == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("maxShingleDf pruning keeps planted high-jaccard pairs") {
    val pruned = jaccardPairs(docs, "doc_id", "text", 3, 0.9, maxShingleDf = 50)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = jaccardPairs(docs, "doc_id", "text", 3, 0.9)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    // near-identical docs share *rare* shingles, so DF-pruning at 50 of 500
    // docs must not lose them
    assert(pruned == exact)
  }

  test("editDistancePairs: thresholded distances, symmetric-free, a<b") {
    val d = Seq(
      (1L, "hello world this is a doc"),
      (2L, "hello world this is a dog"),   // dist 1 from doc 1
      (3L, "hello world entirely different tail that is long"),
      (10L, "zzz unrelated")
    ).toDF("doc_id", "text")
    val got = editDistancePairs(d, "doc_id", "text", prefixLen = 5,
        maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L, 1L)))
  }

  test("eager=false matches eager results and leaves a pure lazy plan") {
    val eagerPairs = jaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val lazyDf = jaccardPairs(docs, "doc_id", "text", 3, 0.5, eager = false)
    // building the plan must not register caches or run jobs
    assert(spark.sparkContext.getPersistentRDDs.keySet == before,
      "lazy mode registered a cache at plan-build time")
    val lazyPairs = lazyDf.select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lazyPairs == eagerPairs)
    assert(spark.sparkContext.getPersistentRDDs.keySet == before,
      "lazy mode left a cache behind after execution")
    // downstream pruning reaches into the lazy plan: a filter on doc_a
    // appears in the optimized plan, not post-hoc over a checkpoint
    val pruned = lazyDf.filter(col("doc_a") === lit(-1L))
    assert(pruned.queryExecution.optimizedPlan.toString.contains("doc_a"))
    assert(pruned.count() == 0)
  }

  test("editDistancePairs maxBucket drops oversized blocking buckets") {
    val d = Seq(
      (1L, "aaaa x"), (2L, "aaaa y"), (3L, "aaaa z"), // bucket of 3
      (7L, "bbbb p"), (8L, "bbbb q")                  // bucket of 2
    ).toDF("doc_id", "text")
    val capped = editDistancePairs(d, "doc_id", "text", prefixLen = 4,
        maxDist = 5, maxBucket = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((7L, 8L))) // the size-3 bucket is skipped entirely
  }

  test("shinglesAt: element i is the n-gram at 0-based pos i, null tail") {
    val r = Seq("a b c d", "a b", "").toDF("text")
      .select(shinglesAt($"text", 3).as("sh")).collect()
    assert(r(0).getSeq[String](0) == Seq("a b c", "b c d", null, null))
    assert(r(1).getSeq[String](0) == Seq(null, null)) // below n: all null
    assert(r(2).getSeq[String](0).isEmpty)
  }

  test("text_dedup_passages: non-canonical occurrences excised, first kept") {
    // two docs share the 8-token passage p1..p8; doc 1 holds the
    // canonical (min doc_id, pos) occurrence and must keep it; doc 2's
    // copy is removed while its unique suffix survives in order
    val dir = java.nio.file.Files.createTempDirectory("graft_pass").toString
    Seq(
      (1L, "p1 p2 p3 p4 p5 p6 p7 p8 u1 u2", "en", "a", 0L),
      (2L, "p1 p2 p3 p4 p5 p6 p7 p8 v1 v2", "en", "a", 0L),
      (3L, "w1 w2 w3", "en", "a", 0L) // < 8 tokens: untouched
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("text_dedup_passages")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((10L, 10L, "p1 p2 p3 p4 p5 p6 p7 p8 u1 u2")))
    assert(out(2L) == ((10L, 2L, "v1 v2")))
    assert(out(3L) == ((3L, 3L, "w1 w2 w3")))
  }

  test("text_bigram_logprob: add-one smoothed mean matches hand computation") {
    // corpus: "a b" ×2 and "a c" — vocab {a,b,c} V=3; prefix count
    // c(a)=3; bigram counts c(a b)=2, c(a c)=1. Doc "a b" scores
    // ln((2+1)/(3+3)) = ln(1/2); doc "a c" scores ln((1+1)/(3+3)) = ln(1/3).
    val dir = java.nio.file.Files.createTempDirectory("graft_bg").toString
    Seq((1L, "a b", "en", "a", 0L), (2L, "a b", "en", "a", 0L),
        (3L, "a c", "en", "a", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("text_bigram_logprob")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    def r4(d: Double) = math.rint((d + 1e-9) * 1e4) / 1e4
    assert(out(1L) == r4(math.log(0.5)) && out(2L) == out(1L))
    assert(out(3L) == r4(math.log(1.0 / 3)))
  }

  test("text_bpe_merge_rounds: greedy left-to-right merge, iterated") {
    // corpus: "aaa" ×2, "ab" ×1. Round 1: (a,a) counted twice per
    // "aaa" → cnt 4, beats (a,b)=1. GREEDY apply: "aaa" → [aa, a]
    // (not [aa, aa]). Round 2: (aa,a)=2 wins; "aaa" → [aaa]. Round 3:
    // only (a,b)=1 remains.
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe").toString
    Seq((1L, "aaa", "en", "a", 0L), (2L, "aaa", "en", "a", 0L),
        (3L, "ab", "en", "a", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("text_bpe_merge_rounds")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    assert(out.toSeq == Seq((1, "a a", 4L), (2, "aa a", 2L), (3, "a b", 1L)))
  }

  test("canonicalizeUrl: boundary-anchored utm strip, scheme-aware ports") {
    val cases = Seq(
      // default port stripped only under its own scheme
      "https://Host.Example.com:443/a" -> "https://host.example.com/a",
      "http://h.example.com:80/a" -> "http://h.example.com/a",
      "http://h.example.com:443/a" -> "http://h.example.com:443/a",
      "https://h.example.com:80/a" -> "https://h.example.com:80/a",
      "https://h.example.com:8443/a" -> "https://h.example.com:8443/a",
      // utm strip anchored at ?/& — xutm_a is NOT a utm parameter
      "https://h/a?xutm_a=1&b=2" -> "https://h/a?xutm_a=1&b=2",
      "https://h/a?utm_s=f&utm_c=x" -> "https://h/a",
      "https://h/a?utm_s=f&b=2" -> "https://h/a?b=2",
      "https://h/a?b=2&utm_s=f" -> "https://h/a?b=2",
      "https://h/a?a=1&utm_s=f&c=3" -> "https://h/a?a=1&c=3",
      "https://h/a?xutm_a=1&utm_s=f" -> "https://h/a?xutm_a=1",
      // fragment + trailing slash
      "https://h/a/#frag" -> "https://h/a",
      "https://h/a/?utm_s=f#frag" -> "https://h/a")
    val got = cases.map(_._1).toDF("url")
      .select(canonicalizeUrl($"url")).collect().map(_.getString(0))
    cases.map(_._2).zip(got).foreach { case (want, g) =>
      assert(g == want, s"expected $want got $g")
    }
  }
}
