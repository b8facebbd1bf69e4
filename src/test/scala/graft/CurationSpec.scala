package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-sized cases for the curation pack (CurationQueries) — the oracle
  * gate proves Spark==DuckDB on the fixture; these pin the intended
  * semantics on inputs small enough to check by hand.
  */
class CurationSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("curation").toString
    rows.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    dir
  }

  private def q(name: String, dir: String) =
    graft.queries.CurationQueries.queries(name)(spark, dir)

  test("text_pii_redact masks all three classes and counts them") {
    val dir = writeDocs(Seq((7L, "hello world")))
    val r = q("text_pii_redact", dir).head()
    val red = r.getString(r.fieldIndex("redacted"))
    assert(red == "hello world contact <EMAIL> ip <IP> tel <PHONE>")
    assert(r.getLong(r.fieldIndex("n_email")) == 1L)
    assert(r.getLong(r.fieldIndex("n_ip")) == 1L)
    assert(r.getLong(r.fieldIndex("n_phone")) == 1L)
  }

  test("text_pii_redact: email local part absorbs the synthesized prefix") {
    // 'user7@...' — the regex consumes 'user7', not just '7'
    val dir = writeDocs(Seq((7L, "x")))
    val red = q("text_pii_redact", dir).head.getString(1)
    assert(!red.contains("user"))
    assert(!red.contains("@"))
  }

  test("text_repetition on a fully repetitive doc") {
    // "a a a a": 4 tokens, 1 distinct, top=4; bigrams: "a a"×3 all dup
    val dir = writeDocs(Seq((1L, "a a a a")))
    val r = q("text_repetition", dir).head()
    assert(r.getLong(r.fieldIndex("n_toks")) == 4L)
    assert(r.getDouble(r.fieldIndex("distinct_frac")) == 0.25)
    assert(r.getDouble(r.fieldIndex("top_tok_frac")) == 1.0)
    assert(r.getDouble(r.fieldIndex("dup_bigram_frac")) == 1.0)
  }

  test("text_repetition on an all-distinct doc") {
    val dir = writeDocs(Seq((1L, "a b c d")))
    val r = q("text_repetition", dir).head()
    assert(r.getLong(r.fieldIndex("n_toks")) == 4L)
    assert(r.getDouble(r.fieldIndex("distinct_frac")) == 1.0)
    assert(r.getDouble(r.fieldIndex("top_tok_frac")) == 0.25)
    assert(r.getDouble(r.fieldIndex("dup_bigram_frac")) == 0.0)
  }

  test("text_repetition: single-token doc has null bigram fraction") {
    val dir = writeDocs(Seq((1L, "solo")))
    val r = q("text_repetition", dir).head()
    assert(r.getLong(r.fieldIndex("n_toks")) == 1L)
    assert(r.isNullAt(r.fieldIndex("dup_bigram_frac")))
  }

  test("text_repetition: empty/whitespace docs are excluded") {
    val dir = writeDocs(Seq((1L, "  "), (2L, "a b")))
    val ids = q("text_repetition", dir).select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(ids == Seq(2L))
  }

  test("decontam_overlap flags exactly the docs sharing a 5-gram with the benchmark slice") {
    val bench = "one two three four five six" // doc 0 → benchmark (id%20==0)
    val hit = "zz one two three four five zz" // shares "one two three four five"
    // benchmark grams are {"one two three four five", "two three four five
    // six"}; hit2 contains the second one (shifted into its own offsets 1-5)
    val hit2 = "two three four five six tail pad x"
    val miss = "one two three four X five six" // no shared 5-gram
    val short = "one two" // < 5 tokens → no grams
    val dir = writeDocs(Seq(
      (0L, bench), (1L, hit), (2L, hit2), (3L, miss), (4L, short)))
    val got = q("decontam_overlap", dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L))
  }

  test("decontam_overlap: benchmark docs themselves never appear") {
    val dir = writeDocs(Seq((0L, "a b c d e f"), (20L, "a b c d e f")))
    assert(q("decontam_overlap", dir).count() == 0)
  }
}
