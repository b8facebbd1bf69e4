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

  /** The NAMED side-effect contract every events reader depends on
    * (ADVICE round-6: it used to be incidental inside [[events]]):
    *   - `nanosAsLong` lets Spark 4 read the TIMESTAMP(NANOS) fixture
    *     vintage at all (as epoch-nanos BIGINT);
    *   - session tz UTC makes the NTZ→LTZ cast in [[normalizeTs]]
    *     interpret wall-clocks exactly like DuckDB's tz-naive read.
    * Call sites: [[events]] and the streaming reader
    * (TimeSeriesQueries.eventsStream) BEFORE analysis of any plan over
    * events. Both confs are runtime-settable and idempotent. NOTE:
    * session tz is session-GLOBAL — the harness standardizes on UTC
    * for every tz-sensitive query (the fixtures carry no local-time
    * semantics), so pinning it here is the invariant, not a hazard. */
  def pinEventConfs(s: SparkSession): Unit = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.conf.set("spark.sql.session.timeZone", "UTC")
  }

  /** Raw events.parquet read. The fixture's `ts` physical type has
    * changed across driver vintages — TIMESTAMP(NANOS) originally (which
    * Spark 4 only reads with the nanosAsLong legacy flag), TIMESTAMP
    * (MICROS)/NTZ since the 2026-08-13 regeneration. Use [[events]]
    * unless you need the on-disk schema (streaming file sources must
    * declare the RAW schema, then [[normalizeTs]] the stream). */
  def rawEvents(s: SparkSession, dir: String): DataFrame = {
    pinEventConfs(s)
    s.read.parquet(s"$dir/events.parquet")
  }

  /** Canonicalize `ts` to epoch-NANOS BIGINT — the contract every query
    * in the repo (and the `epoch_ns(ts)` arithmetic mirrored in the
    * DuckDB oracle SQL) is written against — regardless of fixture
    * vintage. The NTZ→LTZ cast interprets the wall-clock in the session
    * time zone; callers ([[events]]) pin it to UTC first, matching
    * DuckDB's tz-naive TIMESTAMP reading of the same file. */
  def normalizeTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    // LongType only appears via nanosAsLong on the TIMESTAMP(NANOS)
    // vintage, so the long IS epoch-nanos. A future regeneration writing
    // plain INT64 micros/millis would be silently misread — fail loudly
    // on anything that is neither that long nor a timestamp type
    // (EventsVintageSpec covers both accepted vintages).
    case org.apache.spark.sql.types.LongType => df // nanos fixture vintage
    case _: org.apache.spark.sql.types.TimestampType
       | _: org.apache.spark.sql.types.TimestampNTZType =>
      df.withColumn("ts",
        unix_micros(col("ts").cast(org.apache.spark.sql.types.TimestampType))
          * lit(1000L))
    case other => throw new IllegalStateException(
      s"unexpected events.ts fixture vintage: $other — normalizeTs " +
        "understands TIMESTAMP(NANOS)-as-long and TIMESTAMP(NTZ/LTZ) " +
        "micros; audit the new fixture before widening this match")
  }

  /** events table with `ts` as epoch-nanos BIGINT (see [[normalizeTs]];
    * confs via [[pinEventConfs]] inside [[rawEvents]]). */
  def events(s: SparkSession, dir: String): DataFrame =
    normalizeTs(rawEvents(s, dir))

  /** Epsilon-biased 4-decimal rounding: plain round(4) diverges between
    * Spark and DuckDB on exact-halfway floats; both sides add 1e-9 first
    * (oracle SQL: `round(1e-9 + x, 4)`). */
  def r4(c: Column): Column = round(c + lit(1e-9), 4)
}
