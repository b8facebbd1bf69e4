package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Similarity._

/** Similarity-search query inventory over `embeddings` (500–2000 rows of
  * 64-dim float vectors). Oracle parity hinges on bit-identical cosine:
  * both engines fold element products left-to-right in double precision
  * (Spark `aggregate`, DuckDB `list_reduce`), so scores — and therefore
  * top-k membership with vec_id tie-breaks — are deterministic.
  */
object SimilarityQueries {

  private def emb(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  private def r4(c: Column): Column = round(c + lit(1e-9), 4)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_cosine_topk" -> ((s, dir) => {
      // 10 query vectors (vec_id < 10) against the whole corpus, top-5.
      val all = emb(s, dir)
      cosineTopK(all, all.filter(col("vec_id") < 10), k = 5)
        .select(col("query_id"), col("nbr_id"),
          r4(col("cosine")).as("cosine"), col("rank"))
    }),
    "ann_knn_join" -> ((s, dir) => {
      // kNN self-join: top-3 neighbors for EVERY vector (the cosine kNN
      // graph — the embedding near-dup primitive).
      val all = emb(s, dir)
      cosineTopK(all, all, k = 3)
        .select(col("query_id"), col("nbr_id"),
          r4(col("cosine")).as("cosine"), col("rank"))
    })
  )

  /** dot(a,b) as a left fold, identical to Spark's aggregate order. */
  private def dotSql(a: String, b: String): String =
    s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        list_transform(range(1, length($a) + 1),
          i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))),
        (x, y) -> x + y)"""

  private def cosineSql(a: String, b: String): String =
    s"""CASE WHEN sqrt(${dotSql(a, a)} * ${dotSql(b, b)}) > 0
        THEN ${dotSql(a, b)} / sqrt(${dotSql(a, a)} * ${dotSql(b, b)}) END"""

  private def topkSql(queryFilter: String, k: Int): String =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
                   FROM embeddings $queryFilter),
         c AS (SELECT vec_id AS nbr_id, embedding AS nv FROM embeddings),
         scored AS (
           SELECT query_id, nbr_id, ${cosineSql("qv", "nv")} AS cos_raw
           FROM q CROSS JOIN c WHERE query_id <> nbr_id),
         ranked AS (
           SELECT query_id, nbr_id, cos_raw,
             row_number() OVER (PARTITION BY query_id
               ORDER BY cos_raw DESC, nbr_id) AS rank
           FROM scored)
       SELECT query_id, nbr_id, round(1e-9 + cos_raw, 4) AS cosine, rank
       FROM ranked WHERE rank <= $k"""

  val oracleSql: Map[String, String] = Map(
    "ann_cosine_topk" -> topkSql("WHERE vec_id < 10", 5),
    "ann_knn_join" -> topkSql("", 3)
  )
}
