package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.QueryUtil

/** Fixture-vintage contract for `events.ts` (round-6 VERDICT item 8):
  * the driver has regenerated the fixture across vintages —
  * TIMESTAMP(NANOS) parquet (readable by Spark 4 only as an epoch-nanos
  * BIGINT via `nanosAsLong`) and TIMESTAMP(MICROS)/NTZ — and every query
  * is written against `QueryUtil.normalizeTs`'s canonical epoch-nanos
  * BIGINT. This spec pins:
  *   1. both accepted vintages normalize to the SAME epoch-nanos values
  *      (so a regeneration cannot silently shift `ts` semantics);
  *   2. an unknown vintage fails LOUDLY instead of null-casting
  *      (the old catch-all arm would have silently misread a plain
  *      INT64-micros fixture as nanos).
  */
class EventsVintageSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  import spark.implicits._

  // wall-clock instants with sub-second parts, written as epoch-micros
  private val micros = Seq(
    1704067200000000L,            // 2024-01-01 00:00:00 UTC
    1704067200123456L,            // +123.456 ms
    1706745599999999L)            // 2024-01-31 23:59:59.999999

  test("TIMESTAMP(NANOS)-as-long and TIMESTAMP(MICROS) NTZ/LTZ vintages " +
      "normalize to identical epoch-nanos") {
    QueryUtil.pinEventConfs(spark)
    // vintage A: what a nanosAsLong read of TIMESTAMP(NANOS) parquet
    // yields — a raw epoch-nanos BIGINT column
    val vintageNanos = micros.map(_ * 1000L).toDF("ts")
      .withColumn("id", monotonically_increasing_id())

    // vintage B: TIMESTAMP_NTZ micros, round-tripped through parquet
    // (the 2026-08-13 regeneration's physical type)
    val ntzDir = java.nio.file.Files
      .createTempDirectory("vintage_ntz").toString
    micros.toDF("us")
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
      .write.mode("overwrite").parquet(ntzDir)
    val readBack = spark.read.parquet(ntzDir)
    assert(readBack.schema("ts").dataType == TimestampNTZType,
      s"NTZ did not survive the round trip: ${readBack.schema("ts")}")
    val vintageNtz = readBack
      .withColumn("id", monotonically_increasing_id())

    // vintage C: plain TIMESTAMP (LTZ) micros
    val vintageLtz = micros.toDF("us")
      .select(timestamp_micros(col("us")).as("ts"))
      .withColumn("id", monotonically_increasing_id())

    def nanosOf(df: org.apache.spark.sql.DataFrame): Set[Long] = {
      val out = QueryUtil.normalizeTs(df)
      assert(out.schema("ts").dataType == LongType)
      out.select("ts").as[Long].collect().toSet
    }
    val expected = micros.map(_ * 1000L).toSet
    assert(nanosOf(vintageNanos) == expected)
    assert(nanosOf(vintageNtz) == expected)
    assert(nanosOf(vintageLtz) == expected)
  }

  test("an unknown ts vintage fails loudly, not a silent null-cast") {
    val weird = Seq("2024-01-01").toDF("ts") // string ts: no known vintage
    val ex = intercept[IllegalStateException] {
      QueryUtil.normalizeTs(weird)
    }
    assert(ex.getMessage.contains("fixture vintage"))
  }

  test("a real key over the real fixture agrees between events() and a " +
      "manual normalizeTs of the raw read") {
    val dir = "/root/testdata/sf0.001"
    // modular sum: a plain sum of epoch-nanos overflows long
    val digest = Seq(sum(col("ts") % lit(1000000007L)), min(col("ts")),
      max(col("ts")), count(lit(1)))
    val viaEvents = QueryUtil.events(spark, dir)
      .agg(digest.head, digest.tail: _*).collect()(0)
    val manual = QueryUtil.normalizeTs(QueryUtil.rawEvents(spark, dir))
      .agg(digest.head, digest.tail: _*).collect()(0)
    assert(viaEvents == manual)
  }
}
