package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFunctions._

class TextFunctionsSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def one(text: String) = Seq(text).toDF("text")

  test("tokenCount: empty, whitespace-only, and multi-space inputs") {
    val df = Seq("", "   ", "a  b\tc", " x ").toDF("text")
      .select(tokenCount($"text").as("n"))
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(0, 0, 3, 1))
  }

  test("normText collapses case and whitespace") {
    val r = one("  The\tQUICK  fox ").select(normText($"text")).head.getString(0)
    assert(r == "the quick fox")
  }

  test("fingerprint is whitespace/case-insensitive, content-sensitive") {
    val fps = Seq("The  quick fox", "the quick\tfox", "the quick cat")
      .toDF("text").select(fingerprint($"text")).collect().map(_.getString(0))
    assert(fps(0) == fps(1) && fps(0) != fps(2))
  }

  test("punctRatio counts only the enumerated class; empty text is 0") {
    assert(one("a.b!c").select(punctRatio($"text")).head.getDouble(0) == 0.4)
    assert(one("").select(punctRatio($"text")).head.getDouble(0) == 0.0)
  }

  test("meanTokenLen: null on empty, exact on single-spaced text") {
    assert(one("").select(meanTokenLen($"text")).head.isNullAt(0))
    // "ab cdef" → (7 - 1) / 2 = 3.0
    assert(one("ab cdef").select(meanTokenLen($"text")).head.getDouble(0) == 3.0)
  }

  test("langId picks the language with most stopword hits, en tie-break") {
    assert(one("the cat and the dog in a box")
      .select(langId($"text")).head.getString(0) == "en")
    assert(one("el perro y la casa que un gato en")
      .select(langId($"text")).head.getString(0) == "es")
    assert(one("der hund und die katze ist von")
      .select(langId($"text")).head.getString(0) == "de")
    assert(one("zzz qqq")  // zero hits everywhere → en by tie-break order
      .select(langId($"text")).head.getString(0) == "en")
  }

  test("rollingHash is order-sensitive and 0 for empty docs") {
    val h = Seq("a b c", "c b a", "a b c", "")
      .toDF("text").select(rollingHash($"text")).collect().map(_.getLong(0))
    assert(h(0) == h(2) && h(0) != h(1) && h(3) == 0L)
  }

  test("qualityScore stays in [0,1]") {
    val qs = Seq("", "x", "the cat sat on the mat and looked at the dog",
      "!!!.,;;;", ("word " * 50).trim)
      .toDF("text").select(qualityScore($"text")).collect().map(_.getDouble(0))
    assert(qs.forall(q => q >= 0.0 && q <= 1.0))
  }
}
