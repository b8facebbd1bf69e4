package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The ONE definition of the helpers every query module shares. The
  * DuckDB-oracle parity scheme depends on these being identical across
  * modules (e.g. the epsilon bias in [[r4]] must match the `1e-9` the
  * oracle SQL adds before rounding) — they used to be copy-pasted per
  * file, which is exactly how one copy drifts. Local `r4`/`t`/`events`
  * defs in the query files are thin aliases of these.
  */
private[graft] object QueryUtil {

  /** Parquet table loader (driver testdata layout: `<dir>/<name>.parquet`). */
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Raw events.parquet read. The fixture's `ts` physical type has
    * changed across driver vintages — TIMESTAMP(NANOS) originally (which
    * Spark 4 only reads with the nanosAsLong legacy flag, hence the
    * conf), TIMESTAMP(MICROS)/NTZ since the 2026-08-13 regeneration. Use
    * [[events]] unless you need the on-disk schema (streaming file
    * sources must declare the RAW schema, then [[normalizeTs]] the
    * stream). */
  def rawEvents(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(s"$dir/events.parquet")
  }

  /** Canonicalize `ts` to epoch-NANOS BIGINT — the contract every query
    * in the repo (and the `epoch_ns(ts)` arithmetic mirrored in the
    * DuckDB oracle SQL) is written against — regardless of fixture
    * vintage. The NTZ→LTZ cast interprets the wall-clock in the session
    * time zone; callers ([[events]]) pin it to UTC first, matching
    * DuckDB's tz-naive TIMESTAMP reading of the same file. */
  def normalizeTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case org.apache.spark.sql.types.LongType => df // nanos fixture vintage
    case _ =>
      df.withColumn("ts",
        unix_micros(col("ts").cast(org.apache.spark.sql.types.TimestampType))
          * lit(1000L))
  }

  /** events table with `ts` as epoch-nanos BIGINT (see [[normalizeTs]]). */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.session.timeZone", "UTC")
    normalizeTs(rawEvents(s, dir))
  }

  /** Epsilon-biased 4-decimal rounding: plain round(4) diverges between
    * Spark and DuckDB on exact-halfway floats; both sides add 1e-9 first
    * (oracle SQL: `round(1e-9 + x, 4)`). */
  def r4(c: Column): Column = round(c + lit(1e-9), 4)
}
