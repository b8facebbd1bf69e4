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

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  private def r4(c: Column): Column = QueryUtil.r4(c)

  /** The planted-twin corpus shared by the near-dup keys: vec_id < 500
    * plus an exact-double twin per vector (see embedding_dup_pairs_lsh's
    * determinism argument — doubling is an IEEE exponent bump, so twin
    * cosines and SRP signs replicate bit-for-bit in both engines). */
  private def twinCorpus(s: SparkSession, dir: String): DataFrame = {
    val base = emb(s, dir).filter(col("vec_id") < 500)
      .select(col("vec_id"), col("embedding"))
    base.unionByName(base.select((col("vec_id") + 10000000L).as("vec_id"),
      transform(col("embedding"), x => x * lit(2.0f)).as("embedding")))
  }

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
    }),
    "embedding_dup_pairs" -> ((s, dir) => {
      // Embedding-cosine near-dup: all pairs with cosine ≥ 0.4 (the
      // fixture has no planted dups — 0.4 exercises the operator with a
      // nonempty, data-dependent pair set at every sf).
      cosinePairs(emb(s, dir), minCosine = 0.4)
        .select(col("id_a"), col("id_b"), r4(col("cosine")).as("cosine"))
    }),
    "embedding_dup_pairs_lsh" -> ((s, dir) => {
      // The SUB-QUADRATIC embedding near-dup path, oracle-gated: SRP-LSH
      // banding + exact re-scoring (srpNearPairs) instead of the n² scan
      // behind `embedding_dup_pairs`. The fixture's organic max cosine is
      // ~0.6 (SURVEY §2.5), so near-dup structure is PLANTED
      // deterministically in both engines: each vec_id < 500 gets a twin
      // at 2·x (exact in IEEE float — exponent bump, no rounding — and
      // sign(dot(2x, r)) == sign(dot(x, r)), so the twin's SRP signature
      // is IDENTICAL bit-for-bit). Every qualifying pair therefore shares
      // ALL bands — recall is structurally 1, not probabilistically ~1 —
      // which is exactly the recall-1 regime where an LSH output can be
      // hash-gated against the exact pair scan. Precision is exact by
      // construction (candidates are re-scored), so output == oracle.
      val base = emb(s, dir).filter(col("vec_id") < 500)
        .select(col("vec_id"), col("embedding"))
      val twins = base.select((col("vec_id") + 10000000L).as("vec_id"),
        transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
      srpNearPairs(base.unionByName(twins), minCosine = 0.95)
        .select(col("id_a"), col("id_b"), r4(col("cosine")).as("cosine"))
    }),
    "embedding_dup_clusters" -> ((s, dir) => {
      // Near-dup CLUSTERS over embeddings — the embedding analogue of
      // dedup_clusters, i.e. the keep-one-per-group decision input:
      // srpNearPairs (sub-quadratic banded candidates + exact re-score;
      // recall-1 on the planted-twin corpus, see embedding_dup_pairs_lsh)
      // feeds Dedup.duplicateClusters (bounded driver union-find below
      // the edge cap, distributed hash-min CC above it). Oracle
      // recomputes components via a recursive CTE over the exact pair
      // scan.
      val base = emb(s, dir).filter(col("vec_id") < 500)
        .select(col("vec_id"), col("embedding"))
      val twins = base.select((col("vec_id") + 10000000L).as("vec_id"),
        transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
      val pairs = srpNearPairs(base.unionByName(twins), minCosine = 0.95)
        .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
      graft.operators.Dedup.duplicateClusters(pairs)
        .select(col("doc_id").as("vec_id"), col("cluster_id"))
    }),
    "agg_vector_centroid" -> ((s, dir) => {
      // Per-group element-wise mean embedding (class centroids / topic
      // vectors): posexplode → two-level hash agg. The shuffle carries
      // (group, dim) partial sums — O(groups × dim), independent of row
      // count, so this scales to any corpus size. Output is one row per
      // (group, dimension); r4 absorbs cross-engine summation-order ulps.
      emb(s, dir)
        .select((col("vec_id") % 8).as("grp"),
          posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy("grp", "pos")
        .agg(r4(avg(col("v").cast("double"))).as("ctr"),
          count(lit(1)).cast("long").as("n"))
        .select(col("grp"), (col("pos") + 1).cast("long").as("pos"),
          col("ctr"), col("n"))
    }),
    "ann_pq_topk" -> ((s, dir) => {
      // Product quantization: 64 dims → 4 subspaces × 16 deterministic
      // centroids (the subvectors of vec_id < 16, so both engines hold
      // bit-identical codebooks). The corpus is scanned as 4-int codes;
      // ADC ranks by table lookups. Exactly reproducible → full oracle
      // replay; accuracy vs exact search is PqSpec's job.
      val all = emb(s, dir)
      val books = pqCodebooks(all, m = 4, maxCentroidId = 16)
      pqTopK(all, all.filter(col("vec_id") < 10), books, k = 5)
        .select(col("query_id"), col("nbr_id"),
          r4(col("adist")).as("adist"), col("rank"))
    }),
    "ann_ivfpq_topk" -> ((s, dir) => {
      // IVF-PQ — the actual billion-vector index layout (round-12
      // verdict item 8): coarse IVF probe (2 of 8 deterministic
      // centroids, vec_id < 8) bounds WHICH rows are scored, per-
      // cluster ADC over 4×16 PQ codes (codebooks = subvectors of
      // vec_id < 16) bounds WHAT is read per row. Both halves are the
      // gated ann_ivf_topk / ann_pq_topk operators verbatim, so the
      // composition is deterministic and the oracle replays it end to
      // end (assignment/probe/encode/ADC tie-breaks all pinned).
      val all = emb(s, dir)
      val cents = all.filter(col("vec_id") < 8)
        .select(col("vec_id"), col("embedding")).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toSeq))
        .sortBy(_._1)
      val books = pqCodebooks(all, m = 4, maxCentroidId = 16)
      ivfPqTopK(all, all.filter(col("vec_id") < 10), cents, books,
          k = 5, nProbe = 2)
        .select(col("query_id"), col("nbr_id"),
          r4(col("adist")).as("adist"), col("rank"))
    }),
    "ann_ivfpq_recall" -> ((s, dir) => {
      // recall@5 of the IVF-PQ path against the exact top-5 — the
      // ann_ivf_recall audit pattern applied to the composed index:
      // quantization (PQ) now loses candidates INSIDE a probed cluster
      // too, so this measures the compound probe×code loss a
      // deployment signs off on before swapping in the compressed
      // index. Integers plus one correctly-rounded division.
      val all = emb(s, dir)
      val qs = all.filter(col("vec_id") < 10)
      val exact = cosineTopK(all, qs, k = 5)
        .select(col("query_id"), col("nbr_id"))
      val cents = all.filter(col("vec_id") < 8)
        .select(col("vec_id"), col("embedding")).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toSeq))
        .sortBy(_._1)
      val books = pqCodebooks(all, m = 4, maxCentroidId = 16)
      val approx = ivfPqTopK(all, qs, cents, books, k = 5, nProbe = 2)
        .select(col("query_id").as("qid2"), col("nbr_id").as("nbr2"))
      exact.join(approx,
          col("query_id") === col("qid2") && col("nbr_id") === col("nbr2"),
          "left")
        .groupBy("query_id")
        .agg(count(col("nbr2")).as("n_hits"))
        .select(col("query_id"), col("n_hits"),
          r4(col("n_hits") / lit(5.0)).as("recall"))
    }),
    "ann_knn_join_ivf" -> ((s, dir) => {
      // SUB-QUADRATIC kNN graph: same output shape as ann_knn_join (top-3
      // per vector) but each vector scores only its 2 probed IVF clusters
      // (~n/4 of the corpus) via a SHUFFLE join on cluster id — no n²
      // cross join and no corpus broadcast. Approximate vs the exact
      // graph but exactly reproducible (deterministic centroids), so the
      // oracle replays the probe pipeline in SQL.
      val all = emb(s, dir)
      val cents = all.filter(col("vec_id") < 8)
        .select(col("vec_id"), col("embedding")).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toSeq))
        .sortBy(_._1)
      ivfKnnJoin(all, cents, k = 3, nProbe = 2)
        .select(col("query_id"), col("nbr_id"),
          r4(col("cosine")).as("cosine"), col("rank"))
    }),
    "embedding_kmeans" -> ((s, dir) => {
      // REAL Lloyd iterations (Similarity.kmeansAssignments) — closes
      // the "at real scale you'd fit k-means" note the deterministic
      // IVF/PQ centroid bootstraps carry: k=8, 2 rounds, epsilon-biased
      // 4-decimal centroid rounding between rounds so both engines
      // replay the identical trajectory (see the operator's scaladoc).
      // Output is the final assignment — the oracle re-runs both rounds
      // in generated CTEs.
      graft.operators.Similarity.kmeansAssignments(
          emb(s, dir), k = 8, iters = 2)
        .select(col("vid").as("vec_id"), col("cl").as("cluster"))
    }),
    "ann_ivf_topk" -> ((s, dir) => {
      // IVF with DETERMINISTIC centroids (the vectors of vec_id < 8 —
      // no averaging, so both engines see bit-identical centroids),
      // nProbe = 2 of 8: queries touch ~1/4 of the corpus. Approximate
      // vs brute force but exactly reproducible, so the oracle replays
      // the same assignment/probe/rank pipeline in SQL.
      val all = emb(s, dir)
      val cents = all.filter(col("vec_id") < 8)
        .select(col("vec_id"), col("embedding")).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toSeq))
        .sortBy(_._1)
      ivfTopK(all, all.filter(col("vec_id") < 10), cents, k = 3, nProbe = 2)
        .select(col("query_id"), col("nbr_id"),
          r4(col("cosine")).as("cosine"), col("rank"))
    }),
    "ann_ivf_recall" -> ((s, dir) => {
      // ANN index QUALITY EVALUATION as a first-class operator (r11):
      // recall@k of the IVF path against the exact top-k on the same
      // query set — the accept/reject measurement a pipeline runs
      // before swapping exact kNN for an approximate index. Reuses the
      // two gated paths verbatim (identical determinism contracts:
      // left-fold cosine, (score desc, nbr_id) rank order), joins on
      // neighbor identity and scores hits/k per query — integers plus
      // ONE correctly-rounded division, so the value is bit-stable.
      // SCALE: recall estimation costs O(|query sample| · corpus) exact
      // work REGARDLESS of corpus size — it is a sampled audit by
      // design, never a full sweep; the exact side's bounded-query
      // contract is what makes the brute-force arm legitimate here.
      val all = emb(s, dir)
      val qs = all.filter(col("vec_id") < 10)
      val exact = cosineTopK(all, qs, k = 3)
        .select(col("query_id"), col("nbr_id"))
      val cents = all.filter(col("vec_id") < 8)
        .select(col("vec_id"), col("embedding")).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toSeq))
        .sortBy(_._1)
      val approx = ivfTopK(all, qs, cents, k = 3, nProbe = 2)
        .select(col("query_id").as("qid2"), col("nbr_id").as("nbr2"))
      exact.join(approx,
          col("query_id") === col("qid2") && col("nbr_id") === col("nbr2"),
          "left")
        .groupBy("query_id")
        .agg(count(col("nbr2")).as("n_hits"))
        .select(col("query_id"), col("n_hits"),
          r4(col("n_hits") / lit(3.0)).as("recall"))
    }),
    "dedup_semantic" -> ((s, dir) => {
      // SEMANTIC dedup (the SemDeDup recipe, Abbas et al. 2023):
      // cluster the embedding space coarsely, then prune near-
      // duplicates ONLY within each cluster — the move that turns the
      // O(n²) embedding-pair scan into Σ|cluster|² work, with k chosen
      // ∝ n at real scale so per-cluster candidate lists stay bounded
      // (and banding inside a hot cluster as the next knob). Spherical
      // assignment (argmax cosine against deterministic centroids —
      // the ivf convention, scale-invariant so each planted twin
      // PROVABLY lands with its base vector), one shuffle equi-join on
      // the cluster id for pairs, exact cosine verification at ≥ 0.95,
      // keep = lowest id per near-dup neighborhood (no lower-id
      // neighbor above threshold — a join-based decision, no
      // union-find needed). Corpus is the planted-twin set, so the
      // prune set is structurally nonempty and exactly replayable.
      val corpus = twinCorpus(s, dir)
      val cents = emb(s, dir).filter(col("vec_id") < 8)
        .select(col("vec_id"), col("embedding")).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toSeq))
        .sortBy(_._1)
      val parallelism = s.sparkContext.defaultParallelism
      val assigned = ivfAssign(corpus.repartition(parallelism), cents)
        .select(col("vec_id"), col("embedding"), col("cluster"),
          dot(col("embedding"), col("embedding")).as("nrm"))
      val a = assigned.select(col("cluster"), col("vec_id").as("id_a"),
        col("embedding").as("va"), col("nrm").as("na"))
      val b = assigned.select(col("cluster"), col("vec_id").as("id_b"),
        col("embedding").as("vb"), col("nrm").as("nb2"))
      val denom = sqrt(col("na") * col("nb2"))
      val dups = a.join(b, Seq("cluster"))
        .filter(col("id_a") < col("id_b"))
        .withColumn("cos",
          when(denom > 0, dot(col("va"), col("vb")) / denom))
        .filter(col("cos") >= 0.95)
        .select(col("id_b").as("vec_id")).distinct()
        .withColumn("dup", lit(true))
      assigned.select("vec_id", "cluster")
        .join(dups, Seq("vec_id"), "left")
        .select(col("vec_id"), col("cluster"),
          coalesce(!col("dup"), lit(true)).as("keep"))
    }),
    "ann_hybrid_rrf" -> ((s, dir) => {
      // HYBRID retrieval — reciprocal-rank fusion of a vector arm and
      // a lexical arm, the standard two-tower serving shape: dense
      // top-10 by cosine (the gated exact path; at corpus scale the
      // IVF sibling drops in — the fusion is rank-only, so swapping
      // arms never changes this operator) fused with term-overlap
      // top-10 (query terms = the doc's 3 longest distinct tokens —
      // an exact-integer keyword choice; scores are exact tf sums).
      // RRF keeps NO scores across arms — only ranks — which is why
      // it composes arbitrary retrievers; each rank contributes the
      // INTEGER 1e12 div (60 + rank) (truncating division in both
      // engines), so the fused ordering is pure int64 arithmetic with
      // doc_id tie-break — no FP anywhere past the per-arm gates.
      // Plan: both arms end in per-query top-k, fusion is a full outer
      // join on (query, doc) of two ≤10-row-per-query frames.
      import org.apache.spark.sql.expressions.Window
      import graft.functions.TextFunctions.tokens
      val all = emb(s, dir)
      val vrank = cosineTopK(all, all.filter(col("vec_id") < 10), k = 10)
        .select(col("query_id"), col("nbr_id").as("id"),
          col("rank").as("rv"))
      val toks = docs(s, dir).select(col("doc_id"),
        explode(tokens(col("text"))).as("term"))
      val wq = Window.partitionBy("doc_id")
        .orderBy(length(col("term")).desc, col("term"))
      val qterms = toks.filter(col("doc_id") < 10).distinct()
        .withColumn("rk", row_number().over(wq))
        .filter(col("rk") <= 3)
        .select(col("doc_id").as("query_id"), col("term"))
      val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val ts = tf.join(broadcast(qterms), Seq("term"))
        .filter(col("doc_id") =!= col("query_id"))
        .groupBy("query_id", "doc_id").agg(sum(col("tf")).as("ts"))
      val wt = Window.partitionBy("query_id")
        .orderBy(col("ts").desc, col("doc_id"))
      val trank = ts.withColumn("rt", row_number().over(wt))
        .filter(col("rt") <= 10)
        .select(col("query_id"), col("doc_id").as("id"), col("rt"))
      val wf = Window.partitionBy("query_id")
        .orderBy(col("rrf_scaled").desc, col("id"))
      vrank.join(trank, Seq("query_id", "id"), "full_outer")
        .withColumn("rrf_scaled",
          coalesce(expr("cast(1000000000000 as bigint) div (60 + rv)"),
            lit(0L)) +
          coalesce(expr("cast(1000000000000 as bigint) div (60 + rt)"),
            lit(0L)))
        .withColumn("rank", row_number().over(wf))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("id").as("doc_id"),
          col("rrf_scaled"), col("rank").cast("long").as("rank"))
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

  /** Generated k-means replay: `rounds` Lloyd iterations as CTE chains.
    * Mirrors Similarity.kmeansAssignments exactly — same dropped-‖v‖²
    * distance, same (score, j) tie order, same epsilon-biased 4-decimal
    * centroid rounding between rounds, same keep-old-on-empty policy
    * (via COALESCE against the previous round's centroids). */
  private def kmeansSql(k: Int, rounds: Int): String = {
    def assignCte(name: String, cents: String) =
      s"""$name AS (
           SELECT vec_id, xv, j AS cl FROM (
             SELECT v.vec_id, v.xv, c.j,
               row_number() OVER (PARTITION BY v.vec_id
                 ORDER BY (${dotSql("xv", "cv")} * -2.0
                   + ${dotSql("cv", "cv")}) ASC, c.j ASC) AS rn
             FROM v CROSS JOIN $cents c)
           WHERE rn = 1
         )"""
    def meanCte(name: String, assign: String, prev: String) =
      s"""$name AS (
           SELECT p.j, COALESCE(n.cv, p.cv) AS cv
           FROM $prev p LEFT JOIN (
             SELECT cl AS j, list(m ORDER BY d) AS cv FROM (
               SELECT cl, d, round(1e-9 + avg(x), 4) AS m FROM (
                 SELECT cl,
                   unnest(range(1, length(xv) + 1)) AS d,
                   unnest(xv) AS x
                 FROM $assign)
               GROUP BY 1, 2)
             GROUP BY 1
           ) n ON p.j = n.j
         )"""
    val body = (1 to rounds).map(i =>
      assignCte(s"a$i", s"c${i - 1}") + ", " +
        meanCte(s"c$i", s"a$i", s"c${i - 1}")).mkString(", ")
    s"""WITH v AS (
         SELECT vec_id, list_transform(embedding,
           x -> CAST(x AS DOUBLE)) AS xv
         FROM embeddings
       ), c0 AS (
         SELECT vec_id AS j, xv AS cv FROM v WHERE vec_id < $k
       ), $body, ${assignCte("fin", s"c$rounds")}
       SELECT vec_id, cl AS cluster FROM fin"""
  }

  val oracleSql: Map[String, String] = Map(
    "embedding_kmeans" -> kmeansSql(8, 2),
    "agg_vector_centroid" ->
      // parallel unnests in one SELECT zip positionally in DuckDB
      """WITH e AS (
           SELECT vec_id % 8 AS grp,
             unnest(range(1, length(embedding) + 1)) AS pos,
             unnest(list_transform(range(1, length(embedding) + 1),
               i -> CAST(embedding[i] AS DOUBLE))) AS v
           FROM embeddings
         )
         SELECT grp, pos, round(1e-9 + avg(v), 4) AS ctr,
                CAST(count(*) AS BIGINT) AS n
         FROM e GROUP BY 1, 2""",
    "ann_cosine_topk" -> topkSql("WHERE vec_id < 10", 5),
    // PQ replay: same codebooks (subvectors of vec_id < 16, index ==
    // vec_id), same L2² algebra (‖x‖² − 2·x·c + ‖c‖², left-associated),
    // same argmin/rank tie-breaks (lowest index / lowest nbr_id), and the
    // ADC sum folds the per-subspace terms in subspace order exactly like
    // Spark's left-to-right `+` chain.
    "ann_pq_topk" ->
      s"""WITH sp AS (SELECT unnest([0, 1, 2, 3]) AS s),
           sub AS (
             SELECT e.vec_id, sp.s,
                    e.embedding[sp.s*16 + 1 : sp.s*16 + 16] AS xv
             FROM embeddings e CROSS JOIN sp),
           cent AS (
             SELECT vec_id AS j, s, xv AS cv FROM sub WHERE vec_id < 16),
           encd AS (
             SELECT vec_id, s, j AS code FROM (
               SELECT sub.vec_id, sub.s, cent.j,
                 row_number() OVER (PARTITION BY sub.vec_id, sub.s
                   ORDER BY (${dotSql("xv", "xv")} - 2.0 * ${dotSql("xv", "cv")}
                     + ${dotSql("cv", "cv")}) ASC, cent.j ASC) AS rn
               FROM sub JOIN cent ON sub.s = cent.s)
             WHERE rn = 1),
           tab AS (
             SELECT q.vec_id AS query_id, q.s, cent.j,
               (${dotSql("qv", "qv")} - 2.0 * ${dotSql("qv", "cv")}
                 + ${dotSql("cv", "cv")}) AS dst
             FROM (SELECT vec_id, s, xv AS qv FROM sub WHERE vec_id < 10) q
             JOIN cent ON q.s = cent.s),
           adc AS (
             SELECT t.query_id, e2.vec_id AS nbr_id,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list(t.dst ORDER BY t.s)), (a, b) -> a + b) AS adist
             FROM encd e2 JOIN tab t ON e2.s = t.s AND e2.code = t.j
             WHERE e2.vec_id <> t.query_id
             GROUP BY 1, 2)
         SELECT query_id, nbr_id, round(1e-9 + adist, 4) AS adist, rank
         FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY adist ASC, nbr_id) AS rank FROM adc)
         WHERE rank <= 5""",
    "ann_knn_join" -> topkSql("", 3),
    "embedding_dup_pairs" ->
      s"""WITH v AS (SELECT vec_id, embedding AS ev,
                     ${dotSql("embedding", "embedding")} AS nrm
                     FROM embeddings)
         SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                round(1e-9 + ${dotSql("a.ev", "b.ev")}
                  / sqrt(a.nrm * b.nrm), 4) AS cosine
         FROM v a JOIN v b ON a.vec_id < b.vec_id
         WHERE sqrt(a.nrm * b.nrm) > 0
           AND ${dotSql("a.ev", "b.ev")} / sqrt(a.nrm * b.nrm) >= 0.4""",
    // exact pair scan over the SAME planted-twin corpus; the LSH result
    // must equal it (recall-1 regime — see the query comment)
    "embedding_dup_pairs_lsh" ->
      s"""WITH base AS (SELECT vec_id, embedding FROM embeddings
                        WHERE vec_id < 500),
           corpus AS (
             SELECT vec_id, embedding FROM base
             UNION ALL
             SELECT vec_id + 10000000,
                    list_transform(embedding, x -> CAST(x * 2 AS FLOAT))
             FROM base),
           v AS (SELECT vec_id, embedding AS ev,
                 ${dotSql("embedding", "embedding")} AS nrm FROM corpus)
         SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                round(1e-9 + ${dotSql("a.ev", "b.ev")}
                  / sqrt(a.nrm * b.nrm), 4) AS cosine
         FROM v a JOIN v b ON a.vec_id < b.vec_id
         WHERE sqrt(a.nrm * b.nrm) > 0
           AND ${dotSql("a.ev", "b.ev")} / sqrt(a.nrm * b.nrm) >= 0.95""",
    "embedding_dup_clusters" ->
      s"""WITH RECURSIVE base AS (SELECT vec_id, embedding FROM embeddings
                        WHERE vec_id < 500),
           corpus AS (
             SELECT vec_id, embedding FROM base
             UNION ALL
             SELECT vec_id + 10000000,
                    list_transform(embedding, x -> CAST(x * 2 AS FLOAT))
             FROM base),
           v AS (SELECT vec_id, embedding AS ev,
                 ${dotSql("embedding", "embedding")} AS nrm FROM corpus),
           pairs AS (
             SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
             FROM v a JOIN v b ON a.vec_id < b.vec_id
             WHERE sqrt(a.nrm * b.nrm) > 0
               AND ${dotSql("a.ev", "b.ev")} / sqrt(a.nrm * b.nrm) >= 0.95),
           edges AS (
             SELECT doc_a AS src, doc_b AS dst FROM pairs
             UNION SELECT doc_b, doc_a FROM pairs),
           reach(src, dst) AS (
             SELECT src, dst FROM edges
             UNION
             SELECT r.src, e2.dst FROM reach r JOIN edges e2 ON r.dst = e2.src),
           cl AS (
             SELECT src AS vec_id, least(src, min(dst)) AS cluster_id
             FROM reach GROUP BY src)
         SELECT vec_id, cluster_id FROM cl""",
    // IVF replay: same centroids (vec_id < 8), same assignment tie-break
    // (cosine DESC, cid DESC = Spark's greatest-struct), same probe
    // tie-break (cosine DESC, cid ASC = array_sort on (-cos, cid)),
    // same final ranking.
    "ann_ivf_topk" -> ivfSql("WHERE vec_id < 10", k = 3, nProbe = 2),
    // IVF-PQ replay: ann_ivf_topk's assignment/probe CTEs (icent —
    // renamed to dodge the PQ codebook CTE) composed with ann_pq_topk's
    // encode/ADC CTEs; candidates come from the probed clusters only,
    // scored by table lookups, ranked (adist ASC, nbr_id)
    "ann_ivfpq_topk" -> ivfpqSql("WHERE sub.vec_id < 10", k = 5, nProbe = 2),
    "ann_ivfpq_recall" ->
      s"""WITH ex AS (${topkSql("WHERE vec_id < 10", 5)}),
           ip AS (${ivfpqSql("WHERE sub.vec_id < 10", k = 5, nProbe = 2)})
         SELECT ex.query_id, CAST(count(ip.nbr_id) AS BIGINT) AS n_hits,
           round(1e-9 + count(ip.nbr_id) / 5.0, 4) AS recall
         FROM ex LEFT JOIN ip
           ON ex.query_id = ip.query_id AND ex.nbr_id = ip.nbr_id
         GROUP BY ex.query_id""",
    "ann_ivf_recall" ->
      // recall@3 per query: the exact and IVF oracles verbatim as
      // subqueries, joined on neighbor identity — 3 exact rows per
      // query, count(matched) = hits, one division
      s"""WITH ex AS (${topkSql("WHERE vec_id < 10", 3)}),
           iv AS (${ivfSql("WHERE vec_id < 10", k = 3, nProbe = 2)})
         SELECT ex.query_id, CAST(count(iv.nbr_id) AS BIGINT) AS n_hits,
           round(1e-9 + count(iv.nbr_id) / 3.0, 4) AS recall
         FROM ex LEFT JOIN iv
           ON ex.query_id = iv.query_id AND ex.nbr_id = iv.nbr_id
         GROUP BY ex.query_id""",
    // same replay with EVERY vector as a query — the kNN-graph form
    "ann_knn_join_ivf" -> ivfSql("", k = 3, nProbe = 2),
    // spherical assignment replay (cosine DESC, cid DESC = ivfAssign's
    // greatest-struct, the ivfSql asg convention), intra-cluster pair
    // scan at the same ≥ 0.95 cosine, keep = no lower-id neighbor
    "dedup_semantic" ->
      s"""WITH base AS (SELECT vec_id, embedding FROM embeddings
                        WHERE vec_id < 500),
           corpus AS (
             SELECT vec_id, embedding FROM base
             UNION ALL
             SELECT vec_id + 10000000,
                    list_transform(embedding, x -> CAST(x * 2 AS FLOAT))
             FROM base),
           cent AS (SELECT vec_id AS cid, embedding AS cv
                    FROM embeddings WHERE vec_id < 8),
           v AS (SELECT vec_id, embedding AS ev,
                 ${dotSql("embedding", "embedding")} AS nrm FROM corpus),
           vc AS (SELECT v.vec_id, v.nrm, v.ev, cent.cid,
                  ${cosineSql("v.ev", "cent.cv")} AS s
                  FROM v CROSS JOIN cent),
           asg AS (SELECT vec_id, nrm, ev, cid AS cluster FROM (
                    SELECT vc.*, row_number() OVER (PARTITION BY vec_id
                      ORDER BY s DESC, cid DESC) AS rn FROM vc)
                   WHERE rn = 1),
           dup AS (
             SELECT DISTINCT b.vec_id FROM asg a JOIN asg b
               ON a.cluster = b.cluster AND a.vec_id < b.vec_id
             WHERE sqrt(a.nrm * b.nrm) > 0
               AND ${dotSql("a.ev", "b.ev")} / sqrt(a.nrm * b.nrm) >= 0.95)
         SELECT asg.vec_id, asg.cluster, dup.vec_id IS NULL AS keep
         FROM asg LEFT JOIN dup ON asg.vec_id = dup.vec_id""",
    // both arms replayed exactly (the vector arm is topkSql at k=10,
    // the lexical arm exact-integer tf ranking); fusion is the same
    // truncating 1e12 // (60 + rank) int arithmetic
    "ann_hybrid_rrf" ->
      s"""WITH vr AS (${topkSql("WHERE vec_id < 10", 10)}),
           nrm AS (SELECT doc_id,
             trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
             FROM documents),
           tk AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS term
                  FROM nrm WHERE length(norm) > 0),
           qt AS (SELECT doc_id AS query_id, term FROM (
                    SELECT doc_id, term, row_number() OVER (
                      PARTITION BY doc_id
                      ORDER BY length(term) DESC, term) AS rk
                    FROM (SELECT DISTINCT doc_id, term FROM tk
                          WHERE doc_id < 10))
                  WHERE rk <= 3),
           tf AS (SELECT doc_id, term, count(*) AS tf
                  FROM tk GROUP BY 1, 2),
           ts AS (SELECT qt.query_id, tf.doc_id AS id,
                    CAST(sum(tf.tf) AS BIGINT) AS ts
                  FROM tf JOIN qt ON tf.term = qt.term
                    AND tf.doc_id <> qt.query_id
                  GROUP BY 1, 2),
           tr AS (SELECT query_id, id, rt FROM (
                    SELECT query_id, id, row_number() OVER (
                      PARTITION BY query_id ORDER BY ts DESC, id) AS rt
                    FROM ts)
                  WHERE rt <= 10),
           vr2 AS (SELECT query_id, nbr_id AS id, rank AS rv FROM vr),
           fu AS (SELECT COALESCE(vr2.query_id, tr.query_id) AS query_id,
                    COALESCE(vr2.id, tr.id) AS id,
                    COALESCE(1000000000000 // (60 + vr2.rv), 0)
                      + COALESCE(1000000000000 // (60 + tr.rt), 0)
                      AS rrf_scaled
                  FROM vr2 FULL OUTER JOIN tr
                    ON vr2.query_id = tr.query_id AND vr2.id = tr.id)
         SELECT query_id, id AS doc_id,
           CAST(rrf_scaled AS BIGINT) AS rrf_scaled, rank
         FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY rrf_scaled DESC, id) AS rank FROM fu)
         WHERE rank <= 5"""
  )

  /** IVF-PQ replay (`ann_ivfpq_topk` / `ann_ivfpq_recall`): the IVF
    * assignment + probe CTEs (IVF centroid CTE renamed `icent` — `cent`
    * is the PQ codebook CTE) composed with the PQ encode + ADC-table
    * CTEs; each candidate pair appears once (every corpus row lives in
    * exactly ONE cluster), the ADC sum folds per-subspace terms in
    * subspace order like Spark's left-to-right `+` chain. */
  private def ivfpqSql(queryFilter: String, k: Int, nProbe: Int): String =
    s"""WITH sp AS (SELECT unnest([0, 1, 2, 3]) AS s),
         sub AS (
           SELECT e.vec_id, sp.s,
                  e.embedding[sp.s*16 + 1 : sp.s*16 + 16] AS xv
           FROM embeddings e CROSS JOIN sp),
         cent AS (
           SELECT vec_id AS j, s, xv AS cv FROM sub WHERE vec_id < 16),
         encd AS (
           SELECT vec_id, s, j AS code FROM (
             SELECT sub.vec_id, sub.s, cent.j,
               row_number() OVER (PARTITION BY sub.vec_id, sub.s
                 ORDER BY (${dotSql("xv", "xv")} - 2.0 * ${dotSql("xv", "cv")}
                   + ${dotSql("cv", "cv")}) ASC, cent.j ASC) AS rn
             FROM sub JOIN cent ON sub.s = cent.s)
           WHERE rn = 1),
         tab AS (
           SELECT q.vec_id AS query_id, q.s, cent.j,
             (${dotSql("qv", "qv")} - 2.0 * ${dotSql("qv", "cv")}
               + ${dotSql("cv", "cv")}) AS dst
           FROM (SELECT sub.vec_id, sub.s, sub.xv AS qv FROM sub
                 $queryFilter) q
           JOIN cent ON q.s = cent.s),
         icent AS (SELECT vec_id AS cid, embedding AS cv
                   FROM embeddings WHERE vec_id < 8),
         v AS (SELECT vec_id, embedding AS ev FROM embeddings),
         vc AS (SELECT v.vec_id, icent.cid,
                ${cosineSql("v.ev", "icent.cv")} AS sc
                FROM v CROSS JOIN icent),
         asg AS (SELECT vec_id, cid AS cluster FROM (
                  SELECT vc.*, row_number() OVER (PARTITION BY vec_id
                    ORDER BY sc DESC, cid DESC) AS rn FROM vc)
                 WHERE rn = 1),
         qp AS (SELECT vec_id AS query_id, cid AS cluster FROM (
                  SELECT vc.*, row_number() OVER (PARTITION BY vec_id
                    ORDER BY sc DESC, cid ASC) AS rn
                  FROM vc WHERE vec_id IN (SELECT DISTINCT query_id
                                           FROM tab))
                WHERE rn <= $nProbe),
         adc AS (
           SELECT t.query_id, e2.vec_id AS nbr_id,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(t.dst ORDER BY t.s)), (a, b) -> a + b) AS adist
           FROM qp
           JOIN asg a2 ON qp.cluster = a2.cluster
                       AND qp.query_id <> a2.vec_id
           JOIN encd e2 ON e2.vec_id = a2.vec_id
           JOIN tab t ON t.query_id = qp.query_id
                      AND e2.s = t.s AND e2.code = t.j
           GROUP BY 1, 2)
       SELECT query_id, nbr_id, round(1e-9 + adist, 4) AS adist, rank
       FROM (SELECT *, row_number() OVER (PARTITION BY query_id
               ORDER BY adist ASC, nbr_id) AS rank FROM adc)
       WHERE rank <= $k"""

  /** IVF probe-pipeline replay, parameterized over the query-side filter
    * (shared by `ann_ivf_topk` and `ann_knn_join_ivf`). */
  private def ivfSql(queryFilter: String, k: Int, nProbe: Int): String =
    s"""WITH cent AS (SELECT vec_id AS cid, embedding AS cv
                      FROM embeddings WHERE vec_id < 8),
         v AS (SELECT vec_id, embedding AS ev,
               ${dotSql("embedding", "embedding")} AS nrm
               FROM embeddings),
         vc AS (SELECT v.vec_id, v.nrm, cent.cid,
                ${cosineSql("v.ev", "cent.cv")} AS s
                FROM v CROSS JOIN cent),
         asg AS (SELECT vec_id, nrm, cid AS cluster FROM (
                  SELECT vc.*, row_number() OVER (PARTITION BY vec_id
                    ORDER BY s DESC, cid DESC) AS rn FROM vc)
                 WHERE rn = 1),
         qp AS (SELECT vec_id AS query_id, nrm AS qnrm, cid AS cluster
                FROM (
                  SELECT vc.*, row_number() OVER (PARTITION BY vec_id
                    ORDER BY s DESC, cid ASC) AS rn
                  FROM vc $queryFilter)
                WHERE rn <= $nProbe),
         cand AS (SELECT qp.query_id, a.vec_id AS nbr_id,
                  CASE WHEN sqrt(qp.qnrm * a.nrm) > 0 THEN
                    ${dotSql("qe.embedding", "ne.embedding")}
                      / sqrt(qp.qnrm * a.nrm) END AS cos_raw
                  FROM qp
                  JOIN asg a ON qp.cluster = a.cluster
                             AND qp.query_id <> a.vec_id
                  JOIN embeddings qe ON qe.vec_id = qp.query_id
                  JOIN embeddings ne ON ne.vec_id = a.vec_id),
         ranked AS (SELECT query_id, nbr_id, cos_raw,
                    row_number() OVER (PARTITION BY query_id
                      ORDER BY cos_raw DESC, nbr_id) AS rank
                    FROM cand)
       SELECT query_id, nbr_id, round(1e-9 + cos_raw, 4) AS cosine, rank
       FROM ranked WHERE rank <= $k"""
}
