package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.SuffixArray

/** Suffix-array family over `documents`: distributed prefix-doubling
  * suffix ranks and the substring-dedup decisions built on them (the
  * Lee-et-al exact-substring path the shingle-hash keys
  * `text_dup_spans` / `text_dedup_passages` approximate). Every key is
  * oracle-gated bit-exact: DuckDB sorts the raw suffixes
  * (`ORDER BY substr(text, pos+1)`), Spark never materializes a suffix
  * — only ranks (prefix doubling) and capped-64 LCP windows.
  */
object SuffixQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** Shared oracle prelude: word-start suffix positions (`pos = 0` or
    * the previous char is the separator). */
  private def saBase(filter: String): String =
    s"""WITH p AS (
          SELECT doc_id, text,
                 unnest(generate_series(0, length(text) - 1)) AS pos
          FROM documents WHERE length(text) > 0$filter
        ), w AS (
          SELECT doc_id, text, pos FROM p
          WHERE pos = 0 OR substr(text, pos, 1) = ' '
        )"""

  /** Capped-64 adjacent-pair LCP CTEs on top of [[saBase]], mirroring
    * [[SuffixArray.repeatSpans]]'s transform/array_min scan with a
    * DuckDB list comprehension — identical mismatch-index formula on
    * both engines. */
  private def lcpCtes(minLcp: Int): String =
    s""", sa AS (
          SELECT doc_id, pos, substr(text, pos + 1, 64) AS sfx,
                 row_number() OVER (ORDER BY substr(text, pos + 1),
                                    doc_id, pos) AS rn
          FROM w
        ), pr AS (
          SELECT a.doc_id AS doc_a, a.sfx AS sa,
                 b.doc_id AS doc_b, b.sfx AS sb
          FROM sa a JOIN sa b ON b.rn = a.rn + 1
        ), l AS (
          SELECT doc_a, doc_b,
            CASE WHEN m = 65 THEN least(length(sa), length(sb))
                 ELSE m - 1 END AS lcp
          FROM (SELECT *, list_min([CASE WHEN substr(sa, i, 1) <>
                                              substr(sb, i, 1)
                                    THEN i ELSE 65 END
                                    FOR i IN generate_series(1, 64)]) AS m
                FROM pr)
        ), agg AS (
          SELECT least(doc_a, doc_b) AS doc_lo,
                 greatest(doc_a, doc_b) AS doc_hi,
                 count(*) AS anchors, CAST(max(lcp) AS BIGINT) AS max_lcp
          FROM l WHERE lcp >= $minLcp GROUP BY 1, 2
        )"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_suffix_ranks" -> ((s, dir) => {
      // The engine primitive, gated bit-exact against a full suffix
      // sort: one row per word-start suffix with its global 1-based
      // lexicographic rank. ~log4(maxTokens) shuffle passes; DuckDB
      // pays the O(n · |suffix|) sort instead.
      SuffixArray.suffixRanks(docs(s, dir))
    }),
    "text_sa_repeat_spans" -> ((s, dir) => {
      // Repeated substrings >= 20 chars (capped LCP grid 64) as
      // unordered doc-pair aggregates — the substring-dedup candidate
      // table. Includes doc_lo = doc_hi rows (internal repetition).
      SuffixArray.repeatSpans(docs(s, dir), minLcp = 20, cap = 64)
    }),
    "text_sa_dedup_docs" -> ((s, dir) => {
      // The dedup DECISION: drop any doc sharing a >= 40-char span with
      // a lower-id doc (Lee et al.'s keep-first policy), on the
      // doc_id % 3 slice — a different corpus shape than the two full
      // keys, and the family's bench-bounded arm.
      SuffixArray.repeatSpans(
        docs(s, dir).where(col("doc_id") % 3 === 0),
        minLcp = 40, cap = 64)
        .where(col("doc_lo") =!= col("doc_hi"))
        .groupBy(col("doc_hi").as("doc_id"))
        .agg(count(lit(1)).as("n_partners"),
          max(col("max_lcp")).as("max_span"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "text_suffix_ranks" ->
      s"""${saBase("")}
          SELECT doc_id, CAST(pos AS BIGINT) AS pos,
                 row_number() OVER (ORDER BY substr(text, pos + 1),
                                    doc_id, pos) AS sa_rank
          FROM w""",
    "text_sa_repeat_spans" ->
      s"""${saBase("")}${lcpCtes(20)}
          SELECT doc_lo, doc_hi, anchors, max_lcp FROM agg""",
    "text_sa_dedup_docs" ->
      s"""${saBase(" AND doc_id % 3 = 0")}${lcpCtes(40)}
          SELECT doc_hi AS doc_id, count(*) AS n_partners,
                 CAST(max(max_lcp) AS BIGINT) AS max_span
          FROM agg WHERE doc_lo <> doc_hi GROUP BY 1"""
  )
}
