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

  /** events.parquet carries TIMESTAMP(NANOS), which Spark 4 only reads
    * with the nanosAsLong legacy flag (runtime-settable) — every consumer
    * must come through here or hit PARQUET_TYPE_ILLEGAL. */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(s"$dir/events.parquet")
  }

  /** Epsilon-biased 4-decimal rounding: plain round(4) diverges between
    * Spark and DuckDB on exact-halfway floats; both sides add 1e-9 first
    * (oracle SQL: `round(1e-9 + x, 4)`). */
  def r4(c: Column): Column = round(c + lit(1e-9), 4)
}
