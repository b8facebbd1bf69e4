package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Iterative graph analytics on DataFrames — the loop-of-joins shape
  * (edges shuffle-joined to the rank vector per iteration) that scales
  * to billion-edge graphs: each iteration is one equi-join + one hash
  * aggregation, both partitioned by vertex, so a cluster pays E/P per
  * task per round with no driver-side graph state. Complements the
  * connected-components operator (`Dedup.duplicateClusters`) on the
  * unknown-iteration side: PageRank runs a FIXED iteration count, so
  * the whole computation is one deterministic Catalyst plan (at real
  * scale you'd `localCheckpoint` per round to cut lineage — documented,
  * not needed at gate size).
  *
  * Graph: the nation-level trade network — an edge cust_nation →
  * supp_nation weighted by the number of lineitems a customer of the
  * source nation bought from a supplier of the target nation.
  *
  * Weighted PageRank, damping 0.85, 3 iterations, uniform init:
  *   r'(v) = (1-d)/N + d · Σ_{u→v} w(u,v)/outW(u) · r(u)
  * Dangling mass (nations with no outgoing trade) is dropped rather
  * than redistributed — deliberate, mirrored exactly by the oracle's
  * unrolled-CTE replay.
  */
object GraphQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    QueryUtil.t(s, dir, name)

  private def r4(c: Column): Column = QueryUtil.r4(c)

  private val D = 0.85
  private val Iters = 3

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_pagerank" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
      val edges = li
        .join(t(s, dir, "orders").select("o_orderkey", "o_custkey"),
          li("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer").select("c_custkey", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .join(t(s, dir, "supplier").select("s_suppkey", "s_nationkey"),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("c_nationkey").as("src"),
          col("s_nationkey").as("dst"))
        .agg(count(lit(1)).as("w"))
      val nodes = t(s, dir, "nation")
        .select(col("n_nationkey").as("v"))
      // one driver scalar (node count) — broadcast-side bounded
      val n = nodes.count().toDouble
      val outw = edges.groupBy("src").agg(sum(col("w")).as("ow"))
      val contrib = edges.join(outw, Seq("src"))
        .select(col("src"), col("dst"),
          (col("w").cast("double") / col("ow")).as("p"))
      var ranks = nodes.withColumn("r", lit(1.0 / n))
      for (_ <- 1 to Iters) {
        val in = contrib
          .join(ranks.withColumnRenamed("v", "src"), Seq("src"))
          .groupBy("dst").agg(sum(col("p") * col("r")).as("m"))
        ranks = nodes
          .join(in.withColumnRenamed("dst", "v"), Seq("v"), "left")
          .select(col("v"),
            (lit((1 - D) / n) + lit(D) * coalesce(col("m"), lit(0.0)))
              .as("r"))
      }
      ranks.select(col("v").as("nationkey"), r4(col("r")).as("rank"))
    }),
    "graph_triangles" -> ((s, dir) => {
      // Per-vertex triangle counting on the undirected trade network —
      // the standard degree-ordered-orientation algorithm (each edge
      // points from its lower-(degree, id) endpoint to the higher, so
      // every triangle is enumerated at exactly one vertex and the
      // wedge join fans out by the ORIENTED out-degree, which the
      // orientation caps at O(sqrt(|E|)) amortized — the reason this
      // survives power-law graphs where a naive wedge join explodes on
      // the hub vertices). Pipeline: threshold to above-average-weight
      // edges (gives the gate graph real degree variance), one
      // explode+hash-agg for degrees, one self-join for wedges, one
      // equi-join back to the edge set to close them, one explode to
      // attribute each triangle to its three corners. All joins are
      // vertex/edge equi-joins — no driver-side adjacency, nothing
      // quadratic in vertices.
      val und = tradeGraph(s, dir)
      val perV = triangleCounts(und)
      t(s, dir, "nation").select(col("n_nationkey").as("nationkey"))
        .join(perV.withColumnRenamed("v", "nationkey"),
          Seq("nationkey"), "left")
        .select(col("nationkey"),
          coalesce(col("n_tri"), lit(0L)).as("n_tri"))
    }),
    "graph_label_prop" -> ((s, dir) => {
      // Community detection by SYNCHRONOUS label propagation on the
      // same thresholded trade network — the deterministic LPA form:
      // every vertex simultaneously adopts the most frequent neighbor
      // label, smallest label on ties, fixed round count (async LPA's
      // update order is a nondeterminism no cross-engine gate can
      // carry; synchronous + min-tiebreak makes the whole trajectory a
      // pure function of the graph, like kmeansAssignments' rounds).
      // Per round: one edge-to-labels join + one (v, lbl) hash count +
      // one per-vertex top-1 window — all vertex-partitioned, no
      // driver state; isolated vertices keep their own label.
      val und = tradeGraph(s, dir)
      val e2 = und.select(col("a").as("v"), col("b").as("nb"))
        .unionByName(und.select(col("b").as("v"), col("a").as("nb")))
      val nodes = t(s, dir, "nation").select(col("n_nationkey").as("v"))
      var labels = nodes.select(col("v"), col("v").as("lbl"))
      for (_ <- 1 to LpaRounds) {
        val nbl = e2.join(
          labels.select(col("v").as("nb"), col("lbl")), Seq("nb"))
        val cnt = nbl.groupBy("v", "lbl").agg(count(lit(1)).as("c"))
        val w = Window.partitionBy("v")
          .orderBy(col("c").desc, col("lbl").asc)
        val adopted = cnt.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("v"), col("lbl").as("newl"))
        labels = labels.join(adopted, Seq("v"), "left")
          .select(col("v"),
            coalesce(col("newl"), col("lbl")).as("lbl"))
      }
      labels.select(col("v").as("nationkey"), col("lbl").as("community"))
    }),
    "graph_khop_reach" -> ((s, dir) => {
      // Transitive reachability to a FIXED depth — FRONTIER-DELTA BFS
      // (khopReach): each round expands only the pairs ADDED last
      // round, anti-joins the closed set, localCheckpoints both to cut
      // lineage. The full-closure iterated-distinct form remains the
      // ORACLE (semantically identical — proven by the hash gate);
      // GraphScaleProbe measures the delta win on a denser synthetic
      // graph where closed ≫ frontier. Output: |reachable within 3
      // hops| per nation, self included.
      val und = tradeGraph(s, dir)
      val e2 = und.select(col("a").as("v"), col("b").as("nb"))
        .unionByName(und.select(col("b").as("v"), col("a").as("nb")))
      val nodes = t(s, dir, "nation").select(col("n_nationkey").as("v"))
      khopReach(nodes, e2, KhopDepth)
        .groupBy(col("v").as("nationkey"))
        .agg(count(lit(1)).as("n_reach"))
    }),
    "graph_shortest_path_k" -> ((s, dir) => {
      // WEIGHTED single-source shortest distances within K=3 hops —
      // Bellman–Ford with the iteration count fixed and unrolled (the
      // pagerank shape): per round, relax every edge out of the
      // current distance vector (one equi-join) and keep the per-
      // vertex min (one hash agg), both partitioned by vertex — a
      // cluster pays E/P per task per round, no driver frontier. Edge
      // cost is inverse trade volume in exact integers
      // (1000000 div wu + 1 — heavier trade = cheaper route), so every
      // distance is an exact long and the oracle compare has no float
      // dimension. The distance vector is localCheckpointed per round
      // (duplicateClusters' loop contract): each round references the
      // previous vector TWICE (carry + relax), so the un-checkpointed
      // plan replays its lineage 2^K times — 28 exchanges at K=3,
      // down to a flat per-round plan with the checkpoint. K bounds
      // the rounds like khopReach; at unknown diameter the production
      // form adds a convergence check. Source: nation 0. Output:
      // (nationkey, dist_cost) for every nation reachable in ≤ 3 hops.
      val li = t(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
      val dirEdges = li
        .join(t(s, dir, "orders").select("o_orderkey", "o_custkey"),
          li("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer").select("c_custkey", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .join(t(s, dir, "supplier").select("s_suppkey", "s_nationkey"),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("c_nationkey").as("src"),
          col("s_nationkey").as("dst"))
        .agg(count(lit(1)).as("w"))
      val undAll = dirEdges.filter(col("src") =!= col("dst"))
        .groupBy(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .agg(sum(col("w")).as("wu"))
      // same mean-threshold graph as tradeGraph, weight KEPT
      val avgW = undAll.agg(
        (sum(col("wu")).cast("double") / count(lit(1))).as("m"))
        .head.getDouble(0)
      val undw = undAll.filter(col("wu") > avgW)
        .select(col("a").cast("long").as("a"),
          col("b").cast("long").as("b"),
          (expr("1000000 div wu") + 1L).as("cost"))
        .localCheckpoint()
      val e2 = undw.select(col("a").as("eu"), col("b").as("ev"),
          col("cost"))
        .unionByName(undw.select(col("b").as("eu"), col("a").as("ev"),
          col("cost")))
      var dist = t(s, dir, "nation")
        .filter(col("n_nationkey") === 0)
        .select(col("n_nationkey").cast("long").as("v"),
          lit(0L).as("d"))
      for (_ <- 1 to KhopDepth) {
        val relaxed = dist.join(e2, col("v") === col("eu"))
          .select(col("ev").as("v"), (col("d") + col("cost")).as("d"))
        dist = dist.unionByName(relaxed)
          .groupBy("v").agg(min(col("d")).as("d"))
          .localCheckpoint(eager = false)
      }
      dist.select(col("v").as("nationkey"), col("d").as("dist_cost"))
    }),
    "graph_common_neighbors" -> ((s, dir) => {
      // LINK PREDICTION scores for non-adjacent pairs: common-neighbor
      // count and neighborhood Jaccard — the classic "who should be
      // trading but isn't" statistic. One wedge self-join generates
      // candidate pairs (u adjacent to both p and q), a hash count
      // collapses them, an ANTI join removes existing edges, and the
      // degree join assembles Jaccard = cn / (deg(p) + deg(q) − cn)
      // from exact integers — one IEEE division per pair, identical in
      // both engines. SCALE STATUS — bounded-graph only, declared: the
      // wedge self-join generates Σ deg(u)² candidate pairs, and unlike
      // triangle counting the degree-ordered orientation does NOT
      // apply (a triangle is counted once from its min-degree corner,
      // but common-neighbor scoring needs EVERY wedge — orientation
      // changes the answer, not just the work). On the 25-node nation
      // graph the wedge set is trivially small; on a power-law graph
      // the production shape is neighborhood-set similarity via the
      // prefix-filter candidate bound (exactly operators/Dedup's
      // PPJoin on adjacency lists, with cn recovered from the verified
      // pairs) or hub sampling — this exact-wedge form is the oracle
      // those would be gated against, same contract as the ANN
      // brute-force baselines. Round 10: that sibling now EXISTS —
      // `graph_common_neighbors_ppjoin` below — so this key is the
      // declared exact oracle of a gated scale path, exactly like
      // ann_cosine_topk vs ann_ivf_topk.
      cnProject(commonNeighborsExact(tradeGraph(s, dir)))
    }),
    "graph_common_neighbors_ppjoin" -> ((s, dir) => {
      // SCALE SIBLING of graph_common_neighbors: link-prediction pairs
      // with neighborhood-Jaccard ≥ τ, computed WITHOUT the Σ deg(u)²
      // wedge join. Candidates come from the PPJoin prefix filter over
      // adjacency lists (each vertex's neighbor set, globally ordered
      // rarest-neighbor-first) — only vertices sharing a PREFIX token
      // ever meet, the positional filter prunes by remaining-suffix
      // overlap, and a codegen sorted-merge intersect verifies exactly.
      // τ is carried as the RATIONAL CnNum/CnDen and every threshold
      // comparison is integer cross-multiplication, so the two engines
      // can never disagree on a boundary pair. The oracle replays the
      // exact wedge form with the same integer filter — hash equality
      // therefore proves the prefix bound is LOSSLESS, the same
      // contract the ANN baselines pin for IVF/PQ.
      cnProject(commonNeighborsPrefix(tradeGraph(s, dir), CnNum, CnDen))
    }),
    "graph_resource_alloc" -> ((s, dir) => {
      // WEIGHTED link prediction — the Resource-Allocation index
      // RA(p,q) = Σ_{u ∈ CN(p,q)} 1/deg(u): common neighbors count
      // INVERSELY to their degree, so a promiscuous hub contributes
      // almost nothing while a rare shared partner is strong evidence
      // (Zhou/Lü/Zhang 2009 — the degree-weighted sibling of
      // graph_common_neighbors' raw count; Adamic-Adar's 1/ln(deg) is
      // the same shape but ln is libm-varying, 1/deg is exactly
      // representable). DETERMINISM: each wedge's term is the INTEGER
      // `1e9 div deg(u)` — truncating integer division in both engines
      // (Spark `div`, DuckDB `//` on positive longs) — summed as exact
      // longs (≤ 1e9 per term, int64-safe to ~9e9 common neighbors per
      // pair), ONE double division at the end. SCALE: same wedge
      // self-join as the exact common-neighbor baseline — Σ deg(u)²
      // candidates, declared; at power-law scale candidates come from
      // the PPJoin prefix filter (graph_common_neighbors_ppjoin) and
      // the per-u degree weights join back onto the verified pairs'
      // exploded common-neighbor lists.
      val und = tradeGraph(s, dir)
      val e2 = und.select(col("a").as("v"), col("b").as("nb"))
        .unionByName(und.select(col("b").as("v"), col("a").as("nb")))
      val deg = e2.groupBy("v").agg(count(lit(1)).as("d"))
      val wedges = e2.select(col("v").as("u"), col("nb").as("p"))
        .join(e2.select(col("v").as("u"), col("nb").as("q")), Seq("u"))
        .filter(col("p") < col("q"))
      val scores = wedges
        .join(deg.select(col("v").as("u"), col("d")), Seq("u"))
        .withColumn("term", expr("cast(1000000000 as bigint) div d"))
        .groupBy("p", "q")
        .agg(count(lit(1)).as("cn"), sum(col("term")).as("ra_scaled"))
      val nonEdge = scores.join(und,
        scores("p") === und("a") && scores("q") === und("b"), "left_anti")
      nonEdge.select(col("p"), col("q"), col("cn"), col("ra_scaled"),
        r4(col("ra_scaled").cast("double") / lit(1e9)).as("ra"))
    })
  )

  /** τ = CnNum/CnDen — the Jaccard floor of the ppjoin sibling, kept
    * rational so both engines filter by exact integer arithmetic. */
  private[graft] val CnNum = 1
  private[graft] val CnDen = 2

  private def cnProject(scores: DataFrame): DataFrame =
    scores.select(col("p"), col("q"), col("cn"),
      r4(col("cn").cast("double") /
        (col("dp") + col("dq") - col("cn")).cast("double"))
        .as("jaccard"))

  /** Exact common-neighbor scores of non-adjacent pairs via the wedge
    * self-join — O(Σ deg(u)²) candidate pairs, the declared-baseline
    * oracle for [[commonNeighborsPrefix]]. Returns (p, q, cn, dp, dq)
    * with p < q. */
  private[graft] def commonNeighborsExact(und: DataFrame): DataFrame = {
    val e2 = und.select(col("a").as("v"), col("b").as("nb"))
      .unionByName(und.select(col("b").as("v"), col("a").as("nb")))
    val deg = e2.groupBy("v").agg(count(lit(1)).as("d"))
    val cn = e2.select(col("v").as("u"), col("nb").as("p"))
      .join(e2.select(col("v").as("u"), col("nb").as("q")), Seq("u"))
      .filter(col("p") < col("q"))
      .groupBy("p", "q").agg(count(lit(1)).as("cn"))
    val nonEdge = cn.join(und,
      cn("p") === und("a") && cn("q") === und("b"), "left_anti")
    nonEdge
      .join(deg.select(col("v").as("p"), col("d").as("dp")), Seq("p"))
      .join(deg.select(col("v").as("q"), col("d").as("dq")), Seq("q"))
      .select("p", "q", "cn", "dp", "dq")
  }

  /** Degree-bounded common-neighbor scores: all non-adjacent pairs
    * with neighborhood Jaccard ≥ num/den, WITHOUT enumerating wedges.
    *
    * The adjacency list N(v) is treated as a token set and run through
    * the PPJoin prefix filter (the same theorem as Dedup.jaccardPairs,
    * re-derived on integer tokens): order every list by global
    * neighbor frequency (= degree of the neighbor, rarest first, id
    * tiebreak), index only the first |N| − ⌈τ|N|⌉ + 1 tokens, and join
    * postings on the token — any pair with J ≥ τ shares at least one
    * PREFIX token, so the equi-join is a complete candidate generator.
    * The PPJoin positional filter then bounds achievable overlap by
    * min remaining-suffix length, and a sorted-merge intersect
    * (codegen kernel) verifies candidates exactly. All three threshold
    * expressions — prefix length ⌈τn⌉, positional need
    * ⌈τ(za+zb)/(1+τ)⌉, and the final J ≥ τ — are evaluated as integer
    * `div`/cross-multiplication on the rational τ = num/den, so there
    * is no FP ceil()/tie hazard anywhere in the pipeline (§5.1
    * determinism playbook).
    *
    * At scale: work is Σ_t posting(t)² over PREFIX postings only —
    * rare-first ordering makes hot tokens (hub neighbors) fall out of
    * most prefixes, which is what replaces the wedge join's Σ deg(u)²
    * blowup; GraphScaleProbe measures the candidate-count collapse on
    * a hubby synthetic graph. A df-cap (drop tokens with posting lists
    * above a bound, like jaccardPairs' maxShingleDf) is the remaining
    * knob if a single neighbor is adjacent to a constant fraction of
    * the graph — not needed at probe scale, documented here. */
  private[graft] def commonNeighborsPrefix(und: DataFrame,
      num: Int, den: Int): DataFrame = {
    val posts = cnPosts(und)
    val cands = cnPrefixCandidates(posts, num, den)
    // exact verification on value-sorted adjacency arrays
    val adj = posts.groupBy("v").agg(
      sort_array(collect_list(col("s"))).as("xh"),
      count(lit(1)).as("d"))
    val verified = cands
      .join(adj.select(col("v").as("p"), col("xh").as("xa"),
        col("d").as("dp")), Seq("p"))
      .join(adj.select(col("v").as("q"), col("xh").as("xb"),
        col("d").as("dq")), Seq("q"))
      .withColumn("cn", graft.functions.HashKernels
        .sortedIntersectCount(col("xa"), col("xb")).cast("long"))
      .filter(col("cn") * (den + num) >= lit(num) * (col("dp") + col("dq")))
    verified.join(und,
        verified("p") === und("a") && verified("q") === und("b"),
        "left_anti")
      .select("p", "q", "cn", "dp", "dq")
  }

  /** (v, token) postings of the undirected adjacency — tokens are the
    * neighbor ids as longs (the intersect kernel's element type); v
    * keeps its source type so output ids match the oracle. */
  private def cnPosts(und: DataFrame): DataFrame =
    und.select(col("a").as("v"), col("b").as("nb"))
      .unionByName(und.select(col("b").as("v"), col("a").as("nb")))
      .select(col("v"), col("nb").cast("long").as("s"))

  /** PPJoin candidate generator over adjacency postings: distinct
    * (p, q) pairs that share a prefix token under τ = num/den, after
    * the positional filter. Factored out so GraphScaleProbe can count
    * candidates directly. */
  private[graft] def cnPrefixCandidates(posts: DataFrame,
      num: Int, den: Int): DataFrame = {
    require(num > 0 && den > 0 && num < den, "need 0 < tau < 1")
    val dfc = posts.groupBy("s").agg(count(lit(1)).as("df_"))
    val ordered = posts.join(dfc, Seq("s"))
      .groupBy("v")
      .agg(sort_array(collect_list(struct(col("df_"), col("s"))))
        .as("ord"))
      .select(col("v"),
        transform(col("ord"), _.getField("s")).as("ordNb"),
        size(col("ord")).as("osz"))
    // prefix length |N| − ⌈τ|N|⌉ + 1, ⌈a/b⌉ as (a + b − 1) div b
    val prefix = ordered
      .select(col("v"), col("osz"),
        posexplode(col("ordNb")).as(Seq("pos", "s")))
      .filter(col("pos") <
        col("osz") - expr(s"(osz * $num + ${den - 1}) div $den") + 1)
    // positional filter: overlap ≥ ⌈num(za+zb)/(den+num)⌉, and the
    // current-token-plus-suffix bound min(za−pa, zb−pb) must reach it
    val need = expr(
      s"($num * (pa.osz + pb.osz) + ${den + num - 1}) div ${den + num}")
    prefix.as("pa").join(prefix.as("pb"), Seq("s"))
      .filter(col("pa.v") < col("pb.v") &&
        least(col("pa.osz") - col("pa.pos"),
          col("pb.osz") - col("pb.pos")) >= need)
      .select(col("pa.v").as("p"), col("pb.v").as("q"))
      .dropDuplicates("p", "q")
  }

  private val KhopDepth = 3

  /** Frontier-delta BFS: the (v, r) pairs reachable within `depth`
    * hops of each seed in `nodes`, over the undirected adjacency
    * `e2 = (v, nb)`.
    *
    * Per round, only LAST round's newly-discovered pairs join the edge
    * list (on real graphs the frontier collapses after the first hops
    * while the closed set keeps growing — the full-closure form
    * re-joins closed ∪ frontier every round, so its per-round join
    * input grows toward |V|·|reach| while the delta form's shrinks
    * toward zero); the anti-join against the closed set keeps rounds
    * from rediscovering pairs, and the eager `localCheckpoint` on both
    * frames cuts the otherwise-exponential lineage each round (the
    * iterative-plan norm — at 100 TB a reliable checkpoint() of the
    * same frames is the fault-tolerant variant). Fixpoint-aware: an
    * empty frontier short-circuits remaining rounds, so `depth` may be
    * an upper bound (diameter-capped graphs converge early). */
  private[graft] def khopReach(nodes: DataFrame, e2: DataFrame,
      depth: Int): DataFrame = {
    var closed = nodes.select(col("v"), col("v").as("r")).localCheckpoint()
    var frontier = closed
    var round = 0
    var done = false
    while (round < depth && !done) {
      val expanded = frontier
        .join(e2.select(col("v").as("r"), col("nb")), Seq("r"))
        .select(col("v"), col("nb").as("r")).distinct()
      frontier = expanded.join(closed, Seq("v", "r"), "left_anti")
        .localCheckpoint()
      if (frontier.isEmpty) done = true
      else closed = closed.unionByName(frontier).localCheckpoint()
      round += 1
    }
    closed
  }

  private val LpaRounds = 3

  /** The thresholded undirected trade network shared by the structural
    * graph keys: nation-nation edges above the mean weight, normalized
    * (a < b, no self-loops), MATERIALIZED once via localCheckpoint —
    * the edge set is referenced many times downstream and without
    * truncation every reference re-executes the whole 4-table
    * derivation (29 parquet scans in the un-cut triangle plan vs 5
    * after). localCheckpoint is the iterative-graph norm; at 100 TB a
    * reliable checkpoint()/write-out of the edge list is the
    * fault-tolerant variant of the same decision. */
  private def tradeGraph(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
    val dirEdges = li
      .join(t(s, dir, "orders").select("o_orderkey", "o_custkey"),
        li("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer").select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(t(s, dir, "supplier").select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_nationkey").as("src"),
        col("s_nationkey").as("dst"))
      .agg(count(lit(1)).as("w"))
    val undAll = dirEdges.filter(col("src") =!= col("dst"))
      .groupBy(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .agg(sum(col("w")).as("wu"))
    // one driver scalar (mean edge weight) — broadcast-side bounded
    val avgW = undAll.agg(
      (sum(col("wu")).cast("double") / count(lit(1))).as("m"))
      .head.getDouble(0)
    undAll.filter(col("wu") > avgW).select("a", "b").localCheckpoint()
  }

  /** Per-vertex triangle counts of an UNDIRECTED simple graph given as
    * (a, b) normalized edges (a < b, no self-loops, no duplicates) —
    * the degree-ordered-orientation core of `graph_triangles`,
    * factored out so the algorithm is pinned by GraphSpec on known
    * graphs independent of the DuckDB oracle. Returns (v, n_tri) for
    * vertices in at least one triangle. */
  def triangleCounts(und: DataFrame): DataFrame = {
    val deg = und.select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("d"))
    val oriented = und
      .join(deg.select(col("v").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("v").as("b"), col("d").as("db")), Seq("b"))
      .select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")),
          col("a")).otherwise(col("b")).as("u"),
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")),
          col("b")).otherwise(col("a")).as("x"))
    val e1 = oriented.select(col("u"), col("x").as("x1"))
    val e2 = oriented.select(col("u"), col("x").as("x2"))
    // wedge ends in id order so the closing lookup hits the (a<b)
    // normalized edge set directly
    val wedges = e1.join(e2, Seq("u")).filter(col("x1") < col("x2"))
    val tri = wedges.join(und,
      wedges("x1") === und("a") && wedges("x2") === und("b"))
      .select(col("u"), col("x1"), col("x2"))
    tri.select(explode(array(col("u"), col("x1"), col("x2"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("n_tri"))
  }

  /** Shared MATERIALIZED CTE prefix deriving the thresholded
    * undirected trade network (`und(a, b)`) — used verbatim by every
    * structural-graph oracle so the two engines always agree on the
    * graph. */
  private val undSql: String =
    """de AS MATERIALIZED (
           SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
             count(*) AS w
           FROM lineitem l
           JOIN orders o ON l.l_orderkey = o.o_orderkey
           JOIN customer c ON o.o_custkey = c.c_custkey
           JOIN supplier s ON l.l_suppkey = s.s_suppkey
           GROUP BY 1, 2
         ), undall AS MATERIALIZED (
           SELECT least(src, dst) AS a, greatest(src, dst) AS b,
             sum(w) AS wu
           FROM de WHERE src != dst GROUP BY 1, 2
         ), und AS MATERIALIZED (
           SELECT a, b FROM undall
           WHERE wu > (SELECT CAST(sum(wu) AS DOUBLE) / count(*)
                       FROM undall)
         )"""

  /** LPA oracle: synchronous rounds unrolled as generated CTEs,
    * identical adopt/tiebreak logic (most frequent neighbor label,
    * smallest on ties, keep own when isolated). */
  private val lpaCtes: String = (1 to LpaRounds).map { i =>
    s"""n$i AS (SELECT e.v, l.lbl, count(*) AS c
           FROM e2 e JOIN l${i - 1} l ON e.nb = l.v GROUP BY 1, 2),
         a$i AS (SELECT v, lbl FROM (
           SELECT v, lbl, row_number() OVER (PARTITION BY v
             ORDER BY c DESC, lbl) AS rn FROM n$i) WHERE rn = 1),
         l$i AS (SELECT p.v, COALESCE(a$i.lbl, p.lbl) AS lbl
           FROM l${i - 1} p LEFT JOIN a$i ON p.v = a$i.v)"""
  }.mkString(", ")

  /** k-hop oracle: BFS rounds unrolled as generated CTEs. */
  private val khopCtes: String = (1 to KhopDepth).map { i =>
    s"""p$i AS (SELECT DISTINCT v, r FROM (
           SELECT v, r FROM p${i - 1}
           UNION ALL
           SELECT p.v, e.nb AS r FROM p${i - 1} p
           JOIN e2 e ON p.r = e.v))"""
  }.mkString(", ")

  /** The oracle unrolls the 3 iterations as generated CTEs — identical
    * arithmetic (the damping constants are INTERPOLATED from D, so the
    * oracle can never desynchronize from the Spark side, and `1 - D`'s
    * exact double 0.15000000000000002 is shared, not re-derived) and
    * identical dangling-mass policy. */
  private val iterCte: String = (1 to Iters).map { i =>
    s"""r$i AS (
         SELECT n.v,
           ${1 - D} / nn.n + $D * COALESCE(x.m, 0.0) AS r
         FROM nodes n CROSS JOIN nn
         LEFT JOIN (
           SELECT c.dst, sum(c.p * r${i - 1}.r) AS m
           FROM contrib c JOIN r${i - 1} ON c.src = r${i - 1}.v
           GROUP BY 1
         ) x ON n.v = x.dst
       )"""
  }.mkString(", ")

  val oracleSql: Map[String, String] = Map(
    "graph_pagerank" ->
      s"""WITH edges AS (
           SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
             count(*) AS w
           FROM lineitem l
           JOIN orders o ON l.l_orderkey = o.o_orderkey
           JOIN customer c ON o.o_custkey = c.c_custkey
           JOIN supplier s ON l.l_suppkey = s.s_suppkey
           GROUP BY 1, 2
         ), nodes AS (SELECT n_nationkey AS v FROM nation),
         nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
         outw AS (SELECT src, sum(w) AS ow FROM edges GROUP BY 1),
         contrib AS (
           SELECT e.src, e.dst, e.w::DOUBLE / o.ow AS p
           FROM edges e JOIN outw o ON e.src = o.src
         ), r0 AS (
           SELECT n.v, 1.0 / nn.n AS r FROM nodes n CROSS JOIN nn
         ), $iterCte
         SELECT v AS nationkey,
           round(1e-9 + r, 4) AS rank
         FROM r$Iters""",
    "graph_triangles" ->
      s"""WITH $undSql, deg AS MATERIALIZED (
           SELECT v, count(*) AS d FROM (
             SELECT a AS v FROM und UNION ALL SELECT b AS v FROM und)
           GROUP BY 1
         ), oriented AS MATERIALIZED (
           SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND a < b)
                    THEN a ELSE b END AS u,
                  CASE WHEN da.d < db.d OR (da.d = db.d AND a < b)
                    THEN b ELSE a END AS x
           FROM und JOIN deg da ON und.a = da.v
                    JOIN deg db ON und.b = db.v
         ), tri AS MATERIALIZED (
           SELECT e1.u, e1.x AS x1, e2.x AS x2
           FROM oriented e1 JOIN oriented e2 ON e1.u = e2.u
             AND e1.x < e2.x
           JOIN und ON e1.x = und.a AND e2.x = und.b
         ), perv AS (
           SELECT v, count(*) AS n_tri FROM (
             SELECT u AS v FROM tri UNION ALL
             SELECT x1 AS v FROM tri UNION ALL
             SELECT x2 AS v FROM tri)
           GROUP BY 1
         )
         SELECT n.n_nationkey AS nationkey,
           COALESCE(p.n_tri, 0) AS n_tri
         FROM nation n LEFT JOIN perv p ON n.n_nationkey = p.v""",
    "graph_label_prop" ->
      s"""WITH $undSql, e2 AS MATERIALIZED (
           SELECT a AS v, b AS nb FROM und
           UNION ALL SELECT b AS v, a AS nb FROM und
         ), l0 AS (
           SELECT n_nationkey AS v, n_nationkey AS lbl FROM nation
         ), $lpaCtes
         SELECT v AS nationkey, lbl AS community FROM l$LpaRounds""",
    "graph_common_neighbors" ->
      s"""WITH $undSql, e2 AS MATERIALIZED (
           SELECT a AS v, b AS nb FROM und
           UNION ALL SELECT b AS v, a AS nb FROM und
         ), deg AS MATERIALIZED (
           SELECT v, count(*) AS d FROM e2 GROUP BY 1
         ), cn AS MATERIALIZED (
           SELECT e1.nb AS p, e2x.nb AS q, count(*) AS cn
           FROM e2 e1 JOIN e2 e2x ON e1.v = e2x.v AND e1.nb < e2x.nb
           GROUP BY 1, 2
         ), ne AS (
           SELECT cn.* FROM cn
           WHERE NOT EXISTS (SELECT 1 FROM und
             WHERE und.a = cn.p AND und.b = cn.q)
         )
         SELECT ne.p, ne.q, ne.cn,
           round(1e-9 + CAST(ne.cn AS DOUBLE)
             / CAST(dp.d + dq.d - ne.cn AS DOUBLE), 4) AS jaccard
         FROM ne JOIN deg dp ON ne.p = dp.v
                 JOIN deg dq ON ne.q = dq.v""",
    // Same exact-wedge replay, filtered by the integer cross-multiplied
    // J ≥ CnNum/CnDen — hash equality against the prefix-filter plan
    // proves the candidate bound lossless.
    "graph_common_neighbors_ppjoin" ->
      s"""WITH $undSql, e2 AS MATERIALIZED (
           SELECT a AS v, b AS nb FROM und
           UNION ALL SELECT b AS v, a AS nb FROM und
         ), deg AS MATERIALIZED (
           SELECT v, count(*) AS d FROM e2 GROUP BY 1
         ), cn AS MATERIALIZED (
           SELECT e1.nb AS p, e2x.nb AS q, count(*) AS cn
           FROM e2 e1 JOIN e2 e2x ON e1.v = e2x.v AND e1.nb < e2x.nb
           GROUP BY 1, 2
         ), ne AS (
           SELECT cn.* FROM cn
           WHERE NOT EXISTS (SELECT 1 FROM und
             WHERE und.a = cn.p AND und.b = cn.q)
         )
         SELECT ne.p, ne.q, ne.cn,
           round(1e-9 + CAST(ne.cn AS DOUBLE)
             / CAST(dp.d + dq.d - ne.cn AS DOUBLE), 4) AS jaccard
         FROM ne JOIN deg dp ON ne.p = dp.v
                 JOIN deg dq ON ne.q = dq.v
         WHERE ne.cn * ${CnDen + CnNum} >= $CnNum * (dp.d + dq.d)""",
    // Same wedge replay keeping the hub vertex u; the per-wedge term is
    // the identical truncating integer division (DuckDB `//` == Spark
    // `div` on positive longs), so ra_scaled is an exact-int sum in
    // both engines and `ra` one shared IEEE division.
    "graph_resource_alloc" ->
      s"""WITH $undSql, e2 AS MATERIALIZED (
           SELECT a AS v, b AS nb FROM und
           UNION ALL SELECT b AS v, a AS nb FROM und
         ), deg AS MATERIALIZED (
           SELECT v, count(*) AS d FROM e2 GROUP BY 1
         ), sc AS MATERIALIZED (
           SELECT e1.nb AS p, e2x.nb AS q, count(*) AS cn,
             CAST(sum(1000000000 // deg.d) AS BIGINT) AS ra_scaled
           FROM e2 e1
           JOIN e2 e2x ON e1.v = e2x.v AND e1.nb < e2x.nb
           JOIN deg ON deg.v = e1.v
           GROUP BY 1, 2
         ), ne AS (
           SELECT sc.* FROM sc
           WHERE NOT EXISTS (SELECT 1 FROM und
             WHERE und.a = sc.p AND und.b = sc.q)
         )
         SELECT p, q, cn, ra_scaled,
           round(1e-9 + CAST(ra_scaled AS DOUBLE) / 1e9, 4) AS ra
         FROM ne""",
    "graph_khop_reach" ->
      s"""WITH $undSql, e2 AS MATERIALIZED (
           SELECT a AS v, b AS nb FROM und
           UNION ALL SELECT b AS v, a AS nb FROM und
         ), p0 AS (
           SELECT n_nationkey AS v, n_nationkey AS r FROM nation
         ), $khopCtes
         SELECT v AS nationkey, count(*) AS n_reach
         FROM p$KhopDepth GROUP BY 1""",
    // Bellman–Ford unrolled: d0 = {source 0}; each round relaxes every
    // edge and keeps the per-vertex min — same undall threshold graph,
    // weight kept as cost = 1000000 // wu + 1 (// is floor in DuckDB,
    // div truncation in Spark — identical on these positive ints)
    "graph_shortest_path_k" ->
      s"""WITH $undSql, undw AS MATERIALIZED (
           SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
             CAST((1000000 // wu) + 1 AS BIGINT) AS cost
           FROM undall
           WHERE wu > (SELECT CAST(sum(wu) AS DOUBLE) / count(*)
                       FROM undall)
         ), e2 AS MATERIALIZED (
           SELECT a AS eu, b AS ev, cost FROM undw
           UNION ALL SELECT b AS eu, a AS ev, cost FROM undw
         ), d0 AS (
           SELECT CAST(n_nationkey AS BIGINT) AS v,
             CAST(0 AS BIGINT) AS d
           FROM nation WHERE n_nationkey = 0
         ), d1 AS MATERIALIZED (
           SELECT v, min(d) AS d FROM (
             SELECT v, d FROM d0
             UNION ALL
             SELECT e2.ev AS v, d0.d + e2.cost AS d
             FROM d0 JOIN e2 ON d0.v = e2.eu
           ) GROUP BY 1
         ), d2 AS MATERIALIZED (
           SELECT v, min(d) AS d FROM (
             SELECT v, d FROM d1
             UNION ALL
             SELECT e2.ev AS v, d1.d + e2.cost AS d
             FROM d1 JOIN e2 ON d1.v = e2.eu
           ) GROUP BY 1
         ), d3 AS (
           SELECT v, min(d) AS d FROM (
             SELECT v, d FROM d2
             UNION ALL
             SELECT e2.ev AS v, d2.d + e2.cost AS d
             FROM d2 JOIN e2 ON d2.v = e2.eu
           ) GROUP BY 1
         )
         SELECT v AS nationkey, d AS dist_cost FROM d3"""
  )
}
