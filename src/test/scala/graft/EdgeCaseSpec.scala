package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Frame, TidierOps}
import TidierOps._

/** Edge contracts: empty inputs, all-null columns, single-row groups,
  * and argument validation — the failure modes that surface as silent
  * wrong answers at scale if untested.
  */
class EdgeCaseSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private lazy val empty = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
    StructType(Seq(StructField("g", StringType), StructField("v", DoubleType))))

  test("mutateW on an empty table returns empty with the extended schema") {
    val out = empty.mutateW("m" -> avg($"v"))(by = Seq($"g"))
    assert(out.count() == 0)
    assert(out.columns.toSeq == Seq("g", "v", "m"))
    assert(out.schema("m").dataType == DoubleType)
  }

  test("all-null value column: aggregates are null, count is zero") {
    val df = Seq(("a", null: java.lang.Double), ("a", null: java.lang.Double))
      .toDF("g", "v")
    val out = df.mutateW("m" -> avg($"v"), "n" -> count($"v"))(by = Seq($"g"))
    val r = out.collect()
    assert(r.forall(_.isNullAt(2)))
    assert(r.forall(_.getLong(3) == 0L))
  }

  test("single-row groups: frames clamp, complete-gating nulls them") {
    val df = Seq(("a", 1, 1.0), ("b", 1, 2.0)).toDF("g", "o", "v")
    val plain = df.mutateW("m" -> avg($"v"))(
      by = Seq($"g"), orderBy = Seq($"o"), frame = Some(Frame.rows(1, 1)))
    assert(plain.select("m").collect().map(_.getDouble(0)).sorted.toSeq ==
      Seq(1.0, 2.0))
    val gated = df.mutateW("m" -> avg($"v"))(
      by = Seq($"g"), orderBy = Seq($"o"), frame = Some(Frame.rows(1, 1)),
      complete = true)
    assert(gated.select("m").collect().forall(_.isNullAt(0)))
  }

  test("range frame without an index column is rejected") {
    val df = Seq(("a", 1.0)).toDF("g", "v")
    val e = intercept[IllegalArgumentException] {
      df.mutateW("m" -> avg($"v"))(by = Seq($"g"),
        frame = Some(Frame.days(1, 1)))
    }
    assert(e.getMessage.contains("index"))
  }

  test("mutateW with zero expressions is rejected") {
    val df = Seq(("a", 1.0)).toDF("g", "v")
    intercept[IllegalArgumentException] { df.mutateW()() }
  }

  test("dedup operators tolerate empty and sub-n-token documents") {
    val docs = Seq((1L, ""), (2L, "one two"), (3L, "a b c d e"))
      .toDF("doc_id", "text")
    // docs 1 and 2 have no 3-gram shingles → excluded, no crash, no pairs
    assert(graft.operators.Dedup.jaccardPairs(docs, "doc_id", "text").count() == 0)
    assert(graft.operators.Dedup.minhashPairs(docs, "doc_id", "text").count() == 0)
    assert(graft.operators.Dedup.simhashPairs(docs, "doc_id", "text").count() == 0)
  }

  test("similarity handles zero vectors (null cosine, excluded from top-k)") {
    val vecs = Seq((0L, Seq(0f, 0f)), (1L, Seq(1f, 0f)), (2L, Seq(1f, 1f)))
      .toDF("vec_id", "embedding")
    val topk = graft.operators.Similarity.cosineTopK(vecs, vecs, k = 2)
      .collect()
    // zero-vector rows produce null cosine; row_number still assigns ranks
    // but null sorts last under desc — pairs involving vec 0 rank below real ones
    val firstRanks = topk.filter(_.getLong(3) == 1L)
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(firstRanks(1L) == 2L && firstRanks(2L) == 1L)
  }
}
