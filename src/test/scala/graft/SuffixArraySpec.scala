package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SuffixArray

class SuffixArraySpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  import spark.implicits._

  /** Brute-force oracle: word-start suffixes sorted by (full suffix,
    * doc_id, pos) — Scala String ordering = byte order for ASCII,
    * matching both Spark and DuckDB. */
  private def expected(docs: Seq[(Long, String)]): Seq[(Long, Long, Long)] = {
    val pos = for {
      (id, t) <- docs if t.nonEmpty
      p <- 0 until t.length if p == 0 || t(p - 1) == ' '
    } yield (id, p.toLong, t.substring(p))
    pos.sortBy { case (id, p, sfx) => (sfx, id, p) }.zipWithIndex
      .map { case ((id, p, _), i) => (id, p, i + 1L) }
  }

  private def run(docs: Seq[(Long, String)]): Seq[(Long, Long, Long)] =
    SuffixArray.suffixRanks(docs.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toSeq

  test("suffixRanks matches brute force incl. ties, prefixes, 1-token docs") {
    val docs = Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "the quick brown fox",   // prefix of doc 1's start
      3L -> "fox",                   // single token, also a full suffix of 2
      4L -> "zebra",
      5L -> "the quick brown fox jumps over the lazy dog" // identical to 1
    )
    assert(run(docs) == expected(docs).sortBy(t => (t._1, t._2)))
  }

  test("suffixRanks needs >1 doubling pass on long shared prefixes") {
    // 30-token shared prefix forces a doubling pass (round-0 fan ~6
    // covers only 6 tokens) before ranks separate.
    val shared = (1 to 30).map(i => "tok" + (i % 3)).mkString(" ")
    val docs = Seq(1L -> s"$shared alpha", 2L -> s"$shared beta",
      3L -> s"$shared alpha") // 1 and 3 identical -> tie-break pass too
    val got = run(docs)
    assert(got == expected(docs).sortBy(t => (t._1, t._2)))
    assert(got.map(_._3).sorted == (1L to got.size).toList)
  }

  test("suffixRanks: ranks are a contiguous 1..n permutation on real docs") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .where($"doc_id" % 7 === 0)
    val ranks = SuffixArray.suffixRanks(d).collect().map(_.getLong(2)).sorted
    assert(ranks.head == 1L && ranks.last == ranks.length.toLong &&
      ranks.distinct.length == ranks.length)
  }

  test("repeatSpans finds a planted cross-doc span with exact capped lcp") {
    val span = "one two three four five six seven eight nine ten" // 48 chars
    val docs = Seq(
      10L -> s"aaa bbb $span ccc",
      20L -> s"ddd $span eee fff",
      30L -> "unrelated words only here")
    val got = SuffixArray.repeatSpans(docs.toDF("doc_id", "text"),
        minLcp = 20, cap = 64)
      .where($"doc_lo" === 10 && $"doc_hi" === 20)
      .collect()
    assert(got.length == 1)
    // suffixes "one two ... ten ccc" vs "one two ... ten eee fff":
    // common prefix = span + " " = 49 chars (then 'c' <> 'e')
    assert(got.head.getAs[Long]("max_lcp") == span.length + 1L)
  }

  test("differential fuzz: suffixRanks vs brute force on random corpora") {
    import org.scalacheck.{Gen, Test => SCTest}
    import org.scalacheck.Prop.forAll
    // Tiny vocab + planted duplicate docs force long shared prefixes,
    // full-suffix cross-doc ties, and every pass-count regime.
    val corpusGen: Gen[List[(Long, String)]] = for {
      n <- Gen.choose(1, 10)
      base <- Gen.listOfN(n, for {
        len <- Gen.choose(0, 40)
        ws <- Gen.listOfN(len, Gen.oneOf("ab", "b", "ba", "cc", "a"))
      } yield ws.mkString(" "))
      dupOf <- Gen.choose(0, n - 1)
      withDup = base :+ base(dupOf) // planted exact duplicate
    } yield withDup.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(12).withWorkers(1)
    val res = SCTest.check(params, forAll(corpusGen) { docs =>
      run(docs) == expected(docs).sortBy(t => (t._1, t._2))
    })
    assert(res.passed, res.status.toString)
  }

  /** Brute-force repeatSpans: sort word-start suffixes, walk adjacent
    * pairs, capped-64 LCP, filter, aggregate per unordered doc pair —
    * independent of the operator's rank/expression machinery. */
  private def expectedSpans(docs: Seq[(Long, String)], minLcp: Int)
      : Set[(Long, Long, Long, Long)] = {
    val sfx = (for {
      (id, t) <- docs if t.nonEmpty
      p <- 0 until t.length if p == 0 || t(p - 1) == ' '
    } yield (id, p.toLong, t.substring(p)))
      .sortBy { case (id, p, s) => (s, id, p) }
    val pairs = sfx.zip(sfx.drop(1)).map { case ((ia, _, sa), (ib, _, sb)) =>
      val a = sa.take(64); val b = sb.take(64)
      val lcp = a.zip(b).takeWhile { case (x, y) => x == y }.length.toLong
      (math.min(ia, ib), math.max(ia, ib), lcp)
    }.filter(_._3 >= minLcp)
    pairs.groupBy(p => (p._1, p._2)).map { case ((lo, hi), ps) =>
      (lo, hi, ps.size.toLong, ps.map(_._3).max)
    }.toSet
  }

  test("differential fuzz: repeatSpans vs brute force on random corpora") {
    import org.scalacheck.{Gen, Test => SCTest}
    import org.scalacheck.Prop.forAll
    val corpusGen: Gen[List[(Long, String)]] = for {
      n <- Gen.choose(2, 8)
      base <- Gen.listOfN(n, for {
        len <- Gen.choose(1, 30)
        ws <- Gen.listOfN(len, Gen.oneOf("aa", "b", "ab", "cd"))
      } yield ws.mkString(" "))
      dupOf <- Gen.choose(0, n - 1)
    } yield (base :+ base(dupOf)).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(10).withWorkers(1)
    val res = SCTest.check(params, forAll(corpusGen) { docs =>
      val got = SuffixArray.repeatSpans(docs.toDF("doc_id", "text"),
          minLcp = 8, cap = 64)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getLong(2), r.getLong(3))).toSet
      got == expectedSpans(docs, 8)
    })
    assert(res.passed, res.status.toString)
  }

  test("suffixRanks rejects corpora violating the single-space ASCII contract") {
    for (bad <- Seq("a  b", " a b", "a b ", "café au lait")) {
      val e = intercept[IllegalArgumentException] {
        SuffixArray.suffixRanks(Seq(1L -> "clean text", 2L -> bad)
          .toDF("doc_id", "text")).collect()
      }
      assert(e.getMessage.contains("single-space printable-ASCII"))
    }
  }

  test("repeatSpans reports internal repetition as doc_lo == doc_hi") {
    val rep = "alpha beta gamma delta epsilon" // 30 chars, repeated in-doc
    val docs = Seq(1L -> s"$rep zzz $rep qqq")
    val got = SuffixArray.repeatSpans(docs.toDF("doc_id", "text"),
        minLcp = 20, cap = 64).collect()
    assert(got.exists(r => r.getLong(0) == 1L && r.getLong(1) == 1L &&
      r.getAs[Long]("max_lcp") >= rep.length.toLong))
  }

  test("common_prefix_chars (round 17 optimization) is bit-equal to the " +
      "declarative transform/array_min mismatch formula it replaced, " +
      "incl. empty strings, prefixes, multi-byte chars") {
    val cap = 8
    val rnd = new scala.util.Random(42)
    // ascii + 2-/3-byte chars + space (the 4-byte 𝄞 appears only in the
    // fixed cases: indexing a Scala string can split its surrogate pair)
    val alphabet = "ab é €"
    def randS(): String =
      (0 until rnd.nextInt(12)).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString
    val cases = Seq(("", ""), ("", "a"), ("abc", "abc"), ("abc", "abcd"),
      ("é", "è"), ("éx", "éy"), ("𝄞a", "𝄞b")) ++
      Seq.fill(300)((randS(), randS()))
    val df = cases.toDF("a", "b")
      .selectExpr(s"substring(a, 1, $cap) AS sa",
        s"substring(b, 1, $cap) AS sb")
    val legacy = expr(
      s"""array_min(transform(sequence(1, $cap),
            i -> CASE WHEN substring(sa, i, 1) <> substring(sb, i, 1)
                      THEN i ELSE ${cap + 1} END))""")
    val got = df
      .withColumn("lcp_old",
        when(legacy === (cap + 1), least(length(col("sa")),
          length(col("sb")))).otherwise(legacy - 1).cast("long"))
      .withColumn("lcp_new", graft.functions.HashKernels
        .commonPrefixChars(col("sa"), col("sb")).cast("long"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) == r.getLong(3),
        s"'${r.getString(0)}' vs '${r.getString(1)}': " +
          s"old=${r.getLong(2)} new=${r.getLong(3)}")
    }
  }
}
