package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data pipelines
  * (north-star extension surface; BASELINE.json `north_star` — not part of
  * the reference, which delegates scalar functions to the host language,
  * reference R/mutate.R:45).
  *
  * Every function here is a composition of built-in Catalyst expressions
  * (no UDFs), so they stay inside whole-stage codegen, are null-safe, and
  * distribute trivially: per-row narrow transforms with zero shuffle. Each
  * has an exact DuckDB-SQL rendering used by the oracle harness (see
  * SparkEntry.oracleSql) — deterministic integer/string logic wherever
  * possible, epsilon-biased rounding for ratios.
  */
object TextFunctions {

  /** Whitespace-normalized text: lowercase, runs of whitespace collapsed to
    * single spaces, trimmed. The canonical form for fingerprints and
    * shingles. */
  def normText(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Whitespace tokens of the normalized text. Empty input gives an empty
    * token array (split of "" yields [""], which we normalize away). */
  def tokens(c: Column): Column = {
    val t = split(normText(c), " ")
    when(length(normText(c)) === 0, array().cast("array<string>")).otherwise(t)
  }

  /** Token count (whitespace + collapse — the "BPE-ish regex" level is
    * wordPattern below). */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** Word-character runs (a BPE-ish tokenizer's pre-split), counted. */
  def wordCount(c: Column): Column = {
    val arr = filter(split(lower(c), "[^a-z0-9']+"), t => length(t) > 0)
    size(arr)
  }

  /** Mean token length over normalized text, NULL for empty docs. */
  def meanTokenLen(c: Column): Column = {
    val n = tokenCount(c)
    val totalLen = length(normText(c)) - (n - lit(1)) // tokens + (n-1) spaces
    when(n > 0, totalLen.cast("double") / n)
  }

  /** Punctuation chars per char of raw text (0 for empty docs). The class
    * is an explicit enumeration so Spark and DuckDB regex agree. */
  def punctRatio(c: Column): Column = {
    val punct = length(c) - length(regexp_replace(c, "[.,!?;:]", ""))
    when(length(c) > 0, punct.cast("double") / length(c)).otherwise(lit(0.0))
  }

  // public: the oracle SQL in TextQueries interpolates these SAME lists —
  // a private copy there could silently drift from the Spark side
  val enStop = Seq("the", "a", "and", "of", "to", "in", "is")
  val esStop = Seq("el", "la", "de", "que", "y", "en", "un")
  val deStop = Seq("der", "die", "das", "und", "ist", "von")
  val frStop = Seq("le", "les", "une", "et", "est", "dans")

  private def stopHits(c: Column, stops: Seq[String]): Column =
    size(filter(tokens(c), t => t.isin(stops.map(lit): _*)))

  /** Fraction of tokens that are (English) stopwords — a standard quality
    * signal; 0 for empty docs. */
  def stopwordRatio(c: Column): Column = {
    val n = tokenCount(c)
    when(n > 0, stopHits(c, enStop).cast("double") / n).otherwise(lit(0.0))
  }

  /** Language-ID by per-language stopword hit counts with a fixed
    * tie-break order (en > es > de > fr) — the classic cheap n-gram/
    * stopword heuristic. Deterministic, SQL-expressible. */
  def langId(c: Column): Column = {
    val (en, es, de, fr) = (stopHits(c, enStop), stopHits(c, esStop),
      stopHits(c, deStop), stopHits(c, frStop))
    when(en >= es && en >= de && en >= fr, lit("en"))
      .when(es >= de && es >= fr, lit("es"))
      .when(de >= fr, lit("de"))
      .otherwise(lit("fr"))
  }

  /** Composite quality score in [0,1]: length saturation, punctuation
    * penalty, stopword-presence signal, token-length plausibility. Weights
    * are arbitrary but fixed; the value is a deterministic function of the
    * text, reproduced verbatim in oracle SQL. */
  def qualityScore(c: Column): Column = {
    val lenSat = least(tokenCount(c).cast("double") / 20.0, lit(1.0))
    val punctPen = greatest(lit(0.0), lit(1.0) - punctRatio(c) * 5.0)
    val stopSig = least(stopwordRatio(c) * 4.0, lit(1.0))
    val mtl = coalesce(meanTokenLen(c), lit(0.0))
    val lenPlaus = when(mtl >= 2.5 && mtl <= 10.0, 1.0).otherwise(0.0)
    lenSat * 0.25 + punctPen * 0.25 + stopSig * 0.25 + lenPlaus * 0.25
  }

  /** Whole-document fingerprint: md5 of the normalized text. Identical
    * docs (modulo case/whitespace) collide by construction — the key for
    * exact dedup. md5 exists verbatim in DuckDB for the oracle. */
  def fingerprint(c: Column): Column = md5(normText(c))

  /** Rolling (polynomial) hash over the token stream, mod 2^31-1 — an
    * order-sensitive document sketch. Per-token value mixes length and
    * first/last char codes; the fold is `aggregate` (codegen'd), rendered
    * in DuckDB as list_transform + list_reduce. 0 for empty docs. */
  def rollingHash(c: Column): Column = {
    val m = lit(2147483647L)
    val tokHashes = transform(tokens(c), t =>
      (length(t) * lit(131L) + ascii(t) * lit(7L) +
        ascii(substring(t, -1, 1))).cast("long"))
    val folded = aggregate(tokHashes, lit(0L),
      (acc, h) => pmod(acc * lit(31L) + h, m))
    coalesce(folded, lit(0L))
  }
}
