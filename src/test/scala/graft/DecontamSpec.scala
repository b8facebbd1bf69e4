package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Decontam, Dedup}

class DecontamSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("bloom decontam: zero false negatives vs the exact gram join") {
    val bench = docs.filter($"doc_id" % 10 === 3) // held-out slice
    val corpus = docs.filter($"doc_id" % 10 =!= 3)
    // exact contaminated set: docs sharing any 5-gram with the bench
    val benchGrams = bench
      .select(explode(Dedup.shingleHashes($"text", 5)).as("g")).distinct()
    val exact = corpus
      .select($"doc_id", explode(Dedup.shingleHashes($"text", 5)).as("g"))
      .join(benchGrams, Seq("g"), "left_semi")
      .select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet

    val bloom = Decontam.buildGramBloom(bench, "text", n = 5,
      expectedItems = 1L << 16, fpp = 0.001)
    val kept = Decontam.dropContaminated(corpus, "text", bloom, n = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val flagged = corpus.select("doc_id").collect().map(_.getLong(0)).toSet -- kept

    // safety: every truly-contaminated doc is flagged (bloom can only
    // over-approximate)
    assert(exact.subsetOf(flagged),
      s"false negatives: ${(exact -- flagged).take(5)}")
    // precision: false positives bounded well under 5% of clean docs at
    // fpp=1e-3 with ~200 grams/doc (expected ~18% worst-case per-doc
    // union bound is loose; observed is near zero — assert a lenient cap
    // so the test stays robust)
    val clean = corpus.count() - exact.size
    val fp = (flagged -- exact).size
    assert(fp <= math.max(2L, clean / 20),
      s"$fp false positives of $clean clean docs")
  }

  test("null/short text is KEPT (no grams can't overlap); empty bench fails loudly") {
    val bloom = Decontam.buildGramBloom(docs.limit(20), "text", n = 5,
      expectedItems = 1 << 12, fpp = 0.01)
    val corpus = Seq((1L, null.asInstanceOf[String]), (2L, "too short"),
        (3L, docs.select("text").head().getString(0)))
      .toDF("doc_id", "text")
    val kept = Decontam.dropContaminated(corpus, "text", bloom, n = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(Set(1L, 2L).subsetOf(kept),
      "gram-free docs must never be dropped")
    // a benchmark with no extractable grams must refuse, not produce a
    // null sketch that would drop the whole corpus
    val emptyBench = Seq((1L, "a b")).toDF("doc_id", "text") // < 5 tokens
    intercept[IllegalArgumentException] {
      Decontam.buildGramBloom(emptyBench, "text", n = 5,
        expectedItems = 1 << 12, fpp = 0.01)
    }
    // oversizing past the session's bloom caps must refuse, not clamp
    intercept[IllegalArgumentException] {
      Decontam.buildGramBloom(docs.limit(5), "text", n = 5,
        expectedItems = 1L << 30, fpp = 0.001)
    }
  }

  test("bloom probe plan is narrow: no join, no shuffle on the corpus") {
    val bloom = Decontam.buildGramBloom(docs.limit(20), "text", n = 5,
      expectedItems = 1 << 12, fpp = 0.01)
    val out = Decontam.dropContaminated(docs, "text", bloom, n = 5)
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange") && !p.contains("Join"),
      s"probe should be a narrow filter:\n$p")
  }
}
