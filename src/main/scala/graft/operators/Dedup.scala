package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection for large-scale training-data pipelines
  * (north-star extension surface — BASELINE.json `north_star`; no
  * counterpart in the reference, which has no joins at all,
  * reference NAMESPACE:1-6).
  *
  * Four families, each built shuffle-consciously for the 100 TB design
  * point:
  *   - exact: hash-groupBy on a normalized fingerprint (see
  *     TextQueries.dedup_exact) — map-side partial agg, tiny shuffle.
  *   - n-gram Jaccard: inverted-index self-join on shingles — the exact
  *     method; shuffles scale with Σ shingle-postings², so production use
  *     prunes high-document-frequency shingles (maxShingleDf).
  *   - MinHash+LSH: per-row signatures (NO shuffle — higher-order array
  *     functions over the shingle set), band-bucket self-join (shuffle only
  *     band keys), exact-Jaccard verification of the candidate set only.
  *   - SimHash: per-row 32-bit sketch; candidate pairs via pigeonhole
  *     banding (4 × 8-bit chunks ⇒ recall is EXACTLY 1.0 for hamming ≤ 3),
  *     verified by bit_count(xor).
  *
  * Every hash is derived from md5 so DuckDB oracles can replay the math
  * bit-for-bit: base = first 15 hex digits of md5 as a 60-bit long.
  */
object Dedup {

  import graft.functions.TextFunctions.{normText, tokens}

  /** Materialize a SMALL result eagerly (localCheckpoint truncates lineage
    * and stores the partitions), then unpersist the big cached input the
    * pipeline derived from. This scopes the corpus-sized cache to the
    * operator call: without it, every pair op in a long-lived session
    * (Verify/Bench run ~80 queries in one SparkSession) leaves a cached
    * hashed-corpus frame behind until LRU eviction. The checkpointed
    * output itself is cleaned by the ContextCleaner once unreferenced.
    * Trade (documented, deliberate): localCheckpoint is not resilient to
    * executor loss — but losing one mid-query fails the query either way
    * here, because the lineage it replaces contains non-deterministic-
    * partition caches of the same data. Pair outputs are orders of
    * magnitude smaller than the corpus, so the storage cost is trivial.
    *
    * The pair operators expose this behavior via their `eager` parameter
    * (default true). `eager = false` composes LAZILY instead: no cache, no
    * checkpoint — the returned frame is a pure plan, downstream filters /
    * limits can prune work before anything executes, and nothing is pinned
    * in executor memory. The trade is that the normalize→shingle→hash scan
    * re-runs once per plan branch (2-3×), and on near-dup-heavy corpora the
    * un-pinned pair set is recomputed by every downstream action. At the
    * 100 TB design point, `eager = false` is the right default for
    * pipelines that immediately aggregate or filter the pairs; `eager =
    * true` fits interactive sessions and small-to-medium corpora where the
    * pair set is reused many times. */
  private def materializeAndRelease(out: DataFrame,
      cached: DataFrame): DataFrame = {
    val ck = out.localCheckpoint(true)
    cached.unpersist()
    ck
  }

  /** `.cache()` when eager, identity when lazy (see materializeAndRelease). */
  private def cacheIf(eager: Boolean)(df: DataFrame): DataFrame =
    if (eager) df.cache() else df

  private def finish(eager: Boolean)(out: DataFrame,
      cached: DataFrame): DataFrame =
    if (eager) materializeAndRelease(out, cached) else out

  /** Distinct word n-gram shingles of the normalized text; empty array for
    * docs with fewer than n tokens.
    *
    * Built by folding `zip_with(acc, slice(tokens, k+1, …), concat)` —
    * every lambda references ONLY its lambda variables, so nothing
    * re-evaluates per element. (The naive `transform(sequence(...), i =>
    * concat(element_at(tokens(c), i+k)...))` re-runs the whole tokenizer
    * regex chain per gram per position — measured 20-40x slower.)
    * zip_with pads the shorter side with null and `concat` propagates it,
    * so the tail positions null out and are filtered. */
  def shingles(c: Column, n: Int = 3): Column = {
    val t = tokens(c)
    val grams = (1 until n).foldLeft(t) { (acc, k) =>
      zip_with(acc, slice(t, lit(k + 1), greatest(size(t) - k, lit(0))),
        (a, b) => concat(a, lit(" "), b))
    }
    array_distinct(filter(grams, g => g.isNotNull))
  }

  /** Positional shingles: element i (0-based) is the n-gram STARTING at
    * token position i, tail positions null (posexplode + isNotNull gives
    * every occurrence with its start offset). Same zip_with construction
    * as [[shingles]] — no per-element re-tokenization — but WITHOUT the
    * distinct/filter, because occurrence identity (doc_id, pos) is the
    * point: passage-removal needs to know WHERE each duplicated span
    * sits, not just that the doc contains it. */
  def shinglesAt(c: Column, n: Int): Column = {
    val t = tokens(c)
    (1 until n).foldLeft(t) { (acc, k) =>
      zip_with(acc, slice(t, lit(k + 1), greatest(size(t) - k, lit(0))),
        (a, b) => concat(a, lit(" "), b))
    }
  }

  /** 60-bit base hash shared with the DuckDB oracle:
    * Spark `conv(substr(md5(s),1,15),16,10)` ==
    * DuckDB `CAST('0x' || substr(md5(s),1,15) AS BIGINT)`. */
  def baseHash(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Canonical form of a URL for exact-dedup grouping — the web-crawl
    * normalizer: lowercase the `scheme://host[:port]` prefix, drop the
    * scheme's OWN default port (`:80` only under http, `:443` only
    * under https — `http://h:443` is a distinct origin from
    * `http://h` and must not collapse), drop the fragment, strip
    * `utm_*` tracking parameters anchored at a `?`/`&` parameter
    * boundary (so a non-utm parameter merely containing `utm_`, e.g.
    * `xutm_a=1`, survives), then collapse the separator runs the strip
    * leaves behind (`?&&` → `?`) and drop dangling `?`/`&` and
    * trailing slashes. Pure codegen string/regex ops — a narrow map at
    * any scale, no shuffle. The DuckDB oracle mirrors each step
    * token-for-token ('g' flags where Spark's regexp_replace is
    * replace-all by default; `\1` group refs where Java uses `$1`). */
  def canonicalizeUrl(c: Column): Column = {
    val noFrag = regexp_replace(c, "#.*$", "")
    val prefix =
      regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", 0)
    val rest = noFrag.substr(length(prefix) + 1, length(noFrag))
    val canonPrefix = regexp_replace(
      regexp_replace(lower(prefix), "^(http://[^/?#]*):80$", "$1"),
      "^(https://[^/?#]*):443$", "$1")
    val restClean = regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(rest, "([?&])utm_[A-Za-z0-9_]*=[^&#]*", "$1"),
          "([?&])&+", "$1"),
        "[?&]+$", ""),
      "/+$", "")
    concat(canonPrefix, restClean)
  }

  /** Distinct n-gram shingles pre-hashed to 60-bit longs in ONE compiled
    * pass (normalize → tokenize → gram → md5), replacing the interpreted
    * shingles→transform(baseHash) chain whose lambda re-evaluated the
    * tokenizer per gram (see [[graft.functions.ShingleHashesExpr]]).
    * All pair operators below run on these: 8-byte keys also shuffle ~3x
    * smaller than the gram strings they stand for. */
  def shingleHashes(c: Column, n: Int = 3): Column =
    graft.functions.HashKernels.shingleHashes(c, n)

  // --- MinHash ----------------------------------------------------------

  /** Permutation constants. p prime > 2^32; a < 2^20 keeps a*(x%p) < 2^52,
    * overflow-free in BOTH engines (DuckDB errors on BIGINT overflow rather
    * than wrapping, so staying in range is a correctness requirement). */
  val MinhashP: Long = 4294967311L
  def minhashA(i: Int): Long = ((i * 2654435761L) % 1048573L) + 1L
  def minhashB(i: Int): Long = (i * 1013904223L + 12345L) % MinhashP

  /** k-permutation MinHash signature of the shingle set, as an array
    * column. Pure per-row computation (transform + array_min over the
    * shingle array) — zero shuffle, stays in codegen. NULL-free: docs with
    * no shingles get signature [p, p, ...] (p = sentinel "empty"). */
  def minhashSignature(shingleCol: Column, k: Int = 32): Column =
    minhashSignatureFromHashes(transform(shingleCol, s => baseHash(s)), k)

  /** Signature from raw 60-bit shingle hashes (the [[shingleHashes]]
    * output). md5 is by far the dominant cost of a signature — hashing
    * once per shingle instead of once per (shingle × permutation) is a
    * k-fold reduction; the kernel loop handles the mod-p reduction. */
  def minhashSignatureFromHashes(hashCol: Column, k: Int = 32): Column =
    graft.functions.HashKernels.minhashSig(hashCol, k)

  /** Exact n-gram Jaccard pairs via PREFIX-FILTERED inverted index
    * (AllPairs / PPJoin family).
    *
    * Naive posting-list self-joins explode on low-diversity corpora: every
    * ubiquitous shingle with document frequency df contributes df² join
    * rows (measured: ~250M intermediate rows for 5000 docs at sf0.1).
    * Prefix filtering is the lossless fix: J(A,B) ≥ τ implies
    * |A∩B| ≥ ⌈τ·|A|⌉, and two sets with overlap ≥ o must share an element
    * within the first |X|−o+1 elements of each, under ANY shared total
    * order. Ordering shingles by ascending global df puts the RAREST
    * shingles in the indexed prefix, so candidate generation scales with
    * Σ_shingle df_prefix² — orders of magnitude smaller — while recall for
    * pairs above τ stays exactly 1. Candidates are then verified with a
    * full `array_intersect`, so results equal the brute-force pair scan
    * bit-for-bit (the DuckDB oracle).
    *
    * @param maxShingleDf additionally drop shingles with df above this cap
    *        from the candidate INDEX only (0 = off). Verification still
    *        uses full shingle sets, so precision is always exact; the cap
    *        can only lose candidate pairs whose prefixes are entirely
    *        ubiquitous — a documented recall trade for bounded skew at
    *        extreme scale.
    * @param eager true (default): the result is EAGERLY computed
    *        (localCheckpoint) and the intermediate hashed-corpus cache is
    *        released before returning — session-hygienic, but the full
    *        pair output (worst-case quadratic on near-dup-heavy corpora)
    *        is pinned and downstream pruning cannot reach into the plan.
    *        false: fully lazy composition — no cache, no checkpoint, at
    *        the cost of re-running the hashing scan per plan branch. */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, minJaccard: Double = 0.5,
      maxShingleDf: Long = 0L, eager: Boolean = true): DataFrame = {
    // All downstream math runs on the 60-bit hash of each gram — postings,
    // prefix index, and verification. Same result as string shingles
    // modulo md5-prefix collisions (< 1e-8 expected spurious matches at
    // gate scale), with one compiled hashing pass and long join keys.
    // The fused hashing kernel is the dominant per-doc cost and this
    // frame feeds three branches (postings, prefix index, verification) —
    // cache it so the corpus is normalized+hashed ONCE, not once per
    // branch. MEMORY_AND_DISK + LRU eviction keep it safe at scale (the
    // cached shape is (id, hash-array), far smaller than the text), and
    // materializeAndRelease unpersists it before this function returns.
    val withH = cacheIf(eager)(docs.select(col(idCol).as("doc_id"),
      shingleHashes(col(textCol), n).as("hs"))
      .filter(size(col("hs")) > 0))
    val posts = withH.select(col("doc_id"), explode(col("hs")).as("s"))
    val dfCounts0 = posts.groupBy("s").agg(count(lit(1)).as("df_"))
    val dfCounts = if (maxShingleDf > 0) dfCounts0.filter(col("df_") <= maxShingleDf)
                   else dfCounts0
    // Rebuild each doc's shingle list ordered by (global df asc, hash),
    // keep only the prefix that the theorem requires us to index.
    val ordered = posts.join(dfCounts, Seq("s"))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("df_"), col("s")))).as("ord"))
      .select(col("doc_id"),
        transform(col("ord"), _.getField("s")).as("ordSh"),
        size(col("ord")).as("osz"))
    // ceil() over FP products can overshoot the exact rational bound by 1
    // for thresholds like 0.8/0.9 (e.g. 63 × 0.9/1.9 lands one ulp above
    // an integer); the 1e-9 slack biases toward a LONGER prefix / LOWER
    // overlap requirement — extra candidates, never lost ones, and the
    // exact verification step absorbs the surplus.
    val prefixLen = (col("osz") - ceil(col("osz") * lit(minJaccard) - 1e-9) + 1)
      .cast("int")
    // Postings keep (0-based) position and set size for PPJoin's
    // positional filter below.
    val prefix = ordered
      .select(col("doc_id"), col("osz"),
        posexplode(col("ordSh")).as(Seq("pos", "s")))
      .filter(col("pos") < prefixLen)
    // Positional filter (lossless): a match at positions (pa, pb) bounds
    // the overlap by min(za-pa, zb-pb) (current token + suffixes), and
    // J ≥ τ needs overlap ≥ ⌈τ(za+zb)/(1+τ)⌉. A true pair always
    // survives via its FIRST shared token in the global order.
    val need = ceil((col("pa.osz") + col("pb.osz"))
      * lit(minJaccard / (1 + minJaccard)) - 1e-9)
    val cands = prefix.as("pa").join(prefix.as("pb"), Seq("s"))
      .filter(col("pa.doc_id") < col("pb.doc_id") &&
        least(col("pa.osz") - col("pa.pos"),
          col("pb.osz") - col("pb.pos")) >= need)
      .select(col("pa.doc_id").as("doc_a"), col("pb.doc_id").as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    // Exact verification: merge-count over the SORTED hash arrays
    // (codegen kernel) — ~20x less work per candidate than string
    // array_intersect.
    val hashed = withH.select(col("doc_id"),
      sort_array(col("hs")).as("xh"), size(col("hs")).as("sz"))
    val fullA = hashed.select(col("doc_id").as("doc_a"),
      col("xh").as("xh_a"), col("sz").as("za"))
    val fullB = hashed.select(col("doc_id").as("doc_b"),
      col("xh").as("xh_b"), col("sz").as("zb"))
    val out = cands.join(fullA, Seq("doc_a")).join(fullB, Seq("doc_b"))
      .withColumn("inter", graft.functions.HashKernels
        .sortedIntersectCount(col("xh_a"), col("xh_b")))
      .withColumn("jaccard", col("inter").cast("double") /
        (col("za") + col("zb") - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select("doc_a", "doc_b", "jaccard")
    finish(eager)(out, withH)
  }

  /** MinHash-LSH near-dup pairs: signature per row → band keys → bucket
    * self-join for candidates → exact-Jaccard verification of candidates
    * only. With rowsPerBand=2 and 16 bands, P(miss) at j=0.9 is ~3e-12, so
    * the verified output equals the exact jaccardPairs result w.h.p. —
    * which is precisely what the oracle checks (end-to-end recall).
    *
    * `eager` has the same semantics as [[jaccardPairs]]: true = computed
    * now + scoped caches, false = pure lazy plan.
    */
  def minhashPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 32, rowsPerBand: Int = 2,
      minJaccard: Double = 0.5, eager: Boolean = true): DataFrame = {
    require(k % rowsPerBand == 0, "k must divide into bands")
    // cached for the same reason as jaccardPairs' withH: band posting and
    // verification branches would otherwise re-run the hashing kernel
    val withSh = cacheIf(eager)(docs.select(col(idCol).as("doc_id"),
      shingleHashes(col(textCol), n).as("hs"))
      .filter(size(col("hs")) > 0)
      .withColumn("sig", minhashSignatureFromHashes(col("hs"), k)))
    // Bands carry ONLY (doc_id, band, key) — shuffling the shingle arrays
    // 16x through the self-join costs more than the join itself.
    val bands = withSh.select(col("doc_id"),
        posexplode(bandKeyArray(k, rowsPerBand)).as(Seq("band", "key")))
    val l = bands.select(col("band"), col("key"), col("doc_id").as("doc_a"))
    val r = bands.select(col("band"), col("key"), col("doc_id").as("doc_b"))
    val cands = l.join(r, Seq("band", "key"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .dropDuplicates("doc_a", "doc_b")
    // Verify candidates on sorted hash arrays (codegen merge-count).
    val hashed = withSh.select(col("doc_id"),
      sort_array(col("hs")).as("xh"), size(col("hs")).as("sz"))
    val out = cands
      .join(hashed.select(col("doc_id").as("doc_a"),
        col("xh").as("xh_a"), col("sz").as("za")), Seq("doc_a"))
      .join(hashed.select(col("doc_id").as("doc_b"),
        col("xh").as("xh_b"), col("sz").as("zb")), Seq("doc_b"))
      .withColumn("inter", graft.functions.HashKernels
        .sortedIntersectCount(col("xh_a"), col("xh_b")))
      .withColumn("jaccard", col("inter").cast("double") /
        (col("za") + col("zb") - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select("doc_a", "doc_b", "jaccard")
    finish(eager)(out, withSh)
  }

  /** ASYMMETRIC containment pairs: directed (contained, container) pairs
    * with C(A→B) = |A∩B| / |A| ≥ minContainment — the quote-extraction /
    * subset-spam shape Jaccard misses (a 40-gram doc fully inside a
    * 400-gram doc has C = 1.0 but J ≈ 0.1, far below any useful Jaccard
    * gate). One-sided prefix filter, lossless: overlap ≥ o := ⌈τ·|A|⌉
    * forces one of A's first |A|−o+1 shingles (rarest-first under the
    * global df order) to hit B somewhere — so only the CONTAINED side
    * explodes a prefix; the container side is indexed in full. Exact
    * verification on sorted hash arrays, like [[jaccardPairs]]. */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, minContainment: Double = 0.9,
      eager: Boolean = true): DataFrame = {
    val withH = cacheIf(eager)(docs.select(col(idCol).as("doc_id"),
      shingleHashes(col(textCol), n).as("hs"))
      .filter(size(col("hs")) > 0))
    val posts = withH.select(col("doc_id"), explode(col("hs")).as("s"))
    val dfCounts = posts.groupBy("s").agg(count(lit(1)).as("df_"))
    val ordered = posts.join(dfCounts, Seq("s"))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("df_"), col("s")))).as("ord"))
      .select(col("doc_id"),
        transform(col("ord"), _.getField("s")).as("ordSh"),
        size(col("ord")).as("osz"))
    // same 1e-9 ceil slack as jaccardPairs: overshoot only ever LENGTHENS
    // the prefix (extra candidates), and verification is exact
    val prefixLen =
      (col("osz") - ceil(col("osz") * lit(minContainment) - 1e-9) + 1)
        .cast("int")
    val prefixA = ordered
      .select(col("doc_id").as("doc_a"),
        posexplode(col("ordSh")).as(Seq("pos", "s")))
      .filter(col("pos") < prefixLen)
      .select("doc_a", "s")
    val cands = prefixA
      .join(posts.select(col("doc_id").as("doc_b"), col("s")), Seq("s"))
      .filter(col("doc_a") =!= col("doc_b"))
      .select("doc_a", "doc_b")
      .dropDuplicates("doc_a", "doc_b")
    val hashed = withH.select(col("doc_id"),
      sort_array(col("hs")).as("xh"), size(col("hs")).as("sz"))
    val out = cands
      .join(hashed.select(col("doc_id").as("doc_a"),
        col("xh").as("xh_a"), col("sz").as("za")), Seq("doc_a"))
      .join(hashed.select(col("doc_id").as("doc_b"),
        col("xh").as("xh_b")), Seq("doc_b"))
      .withColumn("inter", graft.functions.HashKernels
        .sortedIntersectCount(col("xh_a"), col("xh_b")))
      .withColumn("containment", col("inter").cast("double") / col("za"))
      .filter(col("containment") >= minContainment)
      .select("doc_a", "doc_b", "containment")
    finish(eager)(out, withH)
  }

  /** Band keys ("v1-v2" per band) over a `sig` MinHash-signature column —
    * shared by the self-join ([[minhashPairs]]) and the incremental probe
    * ([[minhashProbe]]), so both sides of a batch-vs-corpus join are
    * guaranteed the same banding. */
  private def bandKeyArray(k: Int, rowsPerBand: Int): Column =
    array((0 until k / rowsPerBand).map { j =>
      concat_ws("-", (0 until rowsPerBand).map(r =>
        element_at(col("sig"), j * rowsPerBand + r + 1)): _*)
    }: _*)

  /** INCREMENTAL (batch-vs-corpus) MinHash-LSH near-dup probe: band keys
    * on both sides, the batch's bands equi-joined INTO the corpus band
    * index, exact Jaccard verification of candidates only. This is the
    * growing-corpus production shape: at 100 TB the corpus band index is
    * a precomputed bucketed table and each arriving batch shuffles only
    * ITS OWN bands + probe results — the corpus is never rescanned
    * pairwise, and cost scales with |batch| · bucket-hit-rate, not
    * |corpus|². Returns (batch_id, corpus_id, jaccard ≥ minJaccard);
    * recall follows [[minhashPairs]]'s banding argument (the pair
    * universe here is a subset of the self-join's). */
  def minhashProbe(batch: DataFrame, corpus: DataFrame, idCol: String,
      textCol: String, n: Int = 3, k: Int = 32, rowsPerBand: Int = 2,
      minJaccard: Double = 0.5, eager: Boolean = true): DataFrame = {
    require(k % rowsPerBand == 0, "k must divide into bands")
    def prep(df: DataFrame): DataFrame =
      cacheIf(eager)(df.select(col(idCol).as("doc_id"),
        shingleHashes(col(textCol), n).as("hs"))
        .filter(size(col("hs")) > 0)
        .withColumn("sig", minhashSignatureFromHashes(col("hs"), k)))
    val bSh = prep(batch); val cSh = prep(corpus)
    def bands(df: DataFrame, as: String): DataFrame =
      df.select(col("doc_id").as(as),
        posexplode(bandKeyArray(k, rowsPerBand)).as(Seq("band", "key")))
    val cands = bands(bSh, "batch_id").join(bands(cSh, "corpus_id"),
        Seq("band", "key"))
      .select("batch_id", "corpus_id")
      .dropDuplicates("batch_id", "corpus_id")
    def hashed(df: DataFrame, id: String, xh: String, sz: String) =
      df.select(col("doc_id").as(id), sort_array(col("hs")).as(xh),
        size(col("hs")).as(sz))
    val out = cands
      .join(hashed(bSh, "batch_id", "xh_a", "za"), Seq("batch_id"))
      .join(hashed(cSh, "corpus_id", "xh_b", "zb"), Seq("corpus_id"))
      .withColumn("inter", graft.functions.HashKernels
        .sortedIntersectCount(col("xh_a"), col("xh_b")))
      .withColumn("jaccard", col("inter").cast("double") /
        (col("za") + col("zb") - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select("batch_id", "corpus_id", "jaccard")
    // two scoped caches: release both after materializing (eager) —
    // finish() handles one frame; unpersist the second explicitly
    val fin = finish(eager)(out, bSh)
    if (eager) cSh.unpersist()
    fin
  }

  // --- SimHash ----------------------------------------------------------

  /** 32-bit SimHash over the shingle set: bit i is set iff the sum of
    * ±1 contributions (sign of bit i of each shingle's base hash) is
    * positive. Pure per-row fold (aggregate over the shingle array with an
    * int-array accumulator) — zero shuffle. 0 for empty shingle sets. */
  def simhash(shingleCol: Column, bits: Int = 32): Column =
    simhashFromHashes(transform(shingleCol, s => baseHash(s)), bits)

  /** SimHash from pre-computed shingle hashes. Bit i is set iff more than
    * half the hashes have bit i set (2·cnt_set > n ⟺ Σ±1 > 0) — one cheap
    * `filter`+`size` pass per bit instead of a per-shingle 32-wide array
    * fold, and md5 runs once per shingle (shared via codegen subexpression
    * elimination). Bit positions are Scala-level Ints (unrolled):
    * shiftright takes only literal shift amounts, and unrolling keeps the
    * math in exact integer arithmetic. */
  def simhashFromHashes(hashCol: Column, bits: Int = 32): Column =
    graft.functions.HashKernels.simhashOf(hashCol, bits)

  /** Duplicate CLUSTERS from a near-dup pair graph: connected components,
    * with an ADAPTIVE strategy keyed on pair-graph size — the same shape
    * decision AQE makes between broadcast and shuffle joins:
    *
    *   - pair graph ≤ `driverEdgeLimit` edges → collect the edge list and
    *     run union-find with path compression on the driver (O(E·α(E)),
    *     milliseconds), then parallelize the labels back. The pair graph
    *     of a deduped corpus is orders of magnitude smaller than the
    *     corpus itself (it holds only near-duplicate DOCS, not rows), so
    *     this bounded collect is the common case even at large scale —
    *     exactly as a broadcast join collects its small side.
    *   - larger → distributed hash-min label propagation: every doc
    *     repeatedly adopts the smallest doc_id reachable over pair edges;
    *     converges in O(diameter) rounds (near-dup clusters are shallow),
    *     bounded by `maxIters`, each round two shuffles (join + min-agg).
    *
    * Output: (doc_id, cluster_id = min doc_id of the component),
    * restricted to docs that appear in at least one pair.
    *
    * NOTE: unlike the pair operators, this one is EAGER by nature — both
    * strategies must run jobs (a bounded early-out collect or the
    * propagation loop), and the result is returned as a materialized
    * frame. Callers composing a 100 TB pipeline should treat it as a
    * pipeline breaker. */
  def duplicateClusters(pairs: DataFrame, maxIters: Int = 20,
      driverEdgeLimit: Long = 1L << 20): DataFrame = {
    require(driverEdgeLimit < Int.MaxValue,
      "driverEdgeLimit must stay below Int.MaxValue (bounded collect)")
    // NULL ids are dropped BEFORE the strategy split: a null identifies no
    // document, and previously the two strategies disagreed on such edges
    // (driver union-find NPE'd on getLong; the distributed loop silently
    // treated null as an isolated node) — behavior must not depend on
    // which path the edge-count heuristic picks.
    val dedup = pairs.select(col("doc_a"), col("doc_b"))
      .filter(col("doc_a").isNotNull && col("doc_b").isNotNull)
      .dropDuplicates("doc_a", "doc_b")
    // The union-find path is integral-id only: ids round-trip through
    // Long and the result is cast back to the WIDER of the two input id
    // types — the same type the distributed path's struct coercion
    // produces — so the chosen strategy never changes the output schema.
    // Other id types (string fingerprints, …) always take the
    // distributed path — a silent cast-to-long would null them out.
    import org.apache.spark.sql.types._
    def width(dt: DataType): Int = dt match {
      case ByteType => 1; case ShortType => 2
      case IntegerType => 3; case LongType => 4
      case _ => -1
    }
    val widths = Seq("doc_a", "doc_b").map(c => width(dedup.schema(c).dataType))
    if (widths.forall(_ > 0)) {
      // single bounded action with an early-out: limit+collect stops as
      // soon as the cap is exceeded (CollectLimit), no checkpoint pinned
      // in executor storage and no separate count job. The oversized
      // case re-runs the pair pipeline once for the distributed loop —
      // the rare branch, and the loop caches its own edge list.
      val idType = dedup.schema(
        if (widths(0) >= widths(1)) "doc_a" else "doc_b").dataType
      val head = dedup
        .select(col("doc_a").cast("long"), col("doc_b").cast("long"))
        .limit(driverEdgeLimit.toInt + 1).collect()
      if (head.length <= driverEdgeLimit)
        return unionFindClusters(dedup.sparkSession,
          head.map(r => (r.getLong(0), r.getLong(1))), idType)
    }
    propagateClusters(dedup, maxIters)
  }

  /** Small-graph path: driver union-find (path compression + union by
    * min-id root) over a bounded collected edge list — the
    * broadcast-join contract. */
  private def unionFindClusters(spark: org.apache.spark.sql.SparkSession,
      edges: Array[(Long, Long)],
      idType: org.apache.spark.sql.types.DataType): DataFrame = {
    import spark.implicits._
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var root = x
      while (parent.getOrElse(root, root) != root)
        root = parent.getOrElse(root, root)
      var cur = x // path compression
      while (parent.getOrElse(cur, cur) != root) {
        val next = parent.getOrElse(cur, cur); parent(cur) = root; cur = next
      }
      root
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      // union toward the SMALLER root: the root IS min(component), so no
      // second pass to compute cluster ids
      if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
    }
    val labels = parent.keysIterator
      .map(v => (v, find(v))).toSeq.sortBy(_._1)
    spark.createDataset(labels).toDF("doc_id", "cluster_id")
      .select(col("doc_id").cast(idType), col("cluster_id").cast(idType))
      .repartition(spark.sessionState.conf.numShufflePartitions)
  }

  /** Large-graph path: distributed hash-min label propagation. */
  private def propagateClusters(dedup: DataFrame, maxIters: Int): DataFrame = {
    // undirected edge list, both directions — explode instead of a
    // self-union so the pair pipeline above runs once per cache fill,
    // cached so the iteration reuses materialized edges
    val edges = dedup.select(explode(array(
        struct(col("doc_a").as("src"), col("doc_b").as("dst")),
        struct(col("doc_b").as("src"), col("doc_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct()
      .cache()
    var labels = edges.select(col("src").as("doc_id"))
      .distinct()
      .withColumn("cluster_id", col("doc_id"))
    // Convergence witness: labels only ever DECREASE, so a round that
    // changes zero labels is the fixed point. The changed flag is
    // computed as a column inside the round's own frame, so detection
    // costs no extra join and works for ANY orderable id type (the old
    // Σ(cluster_id) witness was numeric-only and needed one confirming
    // extra round).
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      // each node adopts min(own label, neighbors' labels)
      val nbrMin = edges
        .join(labels.withColumnRenamed("doc_id", "dst"), Seq("dst"))
        .groupBy(col("src").as("doc_id"))
        .agg(min(col("cluster_id")).as("nbr_min"))
      val next = labels.join(nbrMin, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("cluster_id"), coalesce(col("nbr_min"), col("cluster_id")))
            .as("cluster_id"),
          coalesce(col("nbr_min") < col("cluster_id"), lit(false))
            .as("__chg"))
        .cache()
      // sum() over zero rows is NULL (empty pair graph ⇒ empty labels) —
      // treat as converged immediately.
      val chgRow = next.agg(
        org.apache.spark.sql.functions.sum(col("__chg").cast("long"))).first()
      val nChanged = if (chgRow.isNullAt(0)) 0L else chgRow.getLong(0)
      labels.unpersist()
      // keep `labels` = the CACHED frame itself (a .drop projection here
      // would no longer match the cache entry, so round N+1's unpersist
      // would leak round N's cache); __chg is pruned away by the next
      // round's joins and dropped once at the end.
      labels = next
      converged = nChanged == 0L
      i += 1
    }
    edges.unpersist()
    // Returning silently-wrong labels (a component whose min hasn't
    // propagated to every node yet) would split one duplicate cluster
    // into several with no sign anything failed — fail loudly instead.
    if (!converged) throw new IllegalStateException(
      s"duplicateClusters did not converge in $maxIters rounds — the pair " +
        "graph has a component with diameter > maxIters (e.g. a long " +
        "near-dup chain); raise maxIters")
    // Hand back a lineage-free copy and drop the loop's cache: same
    // session-hygiene contract as materializeAndRelease in the pair ops.
    materializeAndRelease(labels.drop("__chg"), labels)
  }

  /** Edit-distance near-dup pairs: candidates blocked by a text prefix
    * (equi-join), then verified with the THRESHOLDED levenshtein (banded
    * DP — O(len·maxDist) and early-exit, vs the O(len²) unbounded form).
    *
    * Scale guards, because prefix blocking concentrates boilerplate (a
    * shared license header / HTML preamble puts 100k docs in ONE bucket
    * → ~5e9 pairs in a single straggler task):
    *   - a free length-difference prefilter inside the join condition:
    *     lev(a,b) ≤ k implies |len(a)−len(b)| ≤ k, so the check is
    *     lossless and prunes before any DP runs;
    *   - `maxBucket` (0 = off): drop blocking buckets with more than this
    *     many docs from pairing entirely — a DOCUMENTED recall trade for
    *     bounded task size, the same contract as jaccardPairs'
    *     maxShingleDf. Precision is always exact (every emitted pair is
    *     DP-verified).
    */
  def editDistancePairs(docs: DataFrame, idCol: String, textCol: String,
      prefixLen: Int = 12, maxDist: Int = 20,
      maxBucket: Long = 0L): DataFrame = {
    val d0 = docs.select(col(idCol).as("doc_id"), col(textCol).as("txt"),
      substring(col(textCol), 1, prefixLen).as("pfx"),
      length(col(textCol)).as("len"))
    val d = if (maxBucket > 0) {
      val ok = d0.groupBy("pfx").agg(count(lit(1)).as("bsz"))
        .filter(col("bsz") <= maxBucket).select("pfx")
      d0.join(ok, Seq("pfx"))
    } else d0
    val a = d.select(col("pfx"), col("doc_id").as("doc_a"),
      col("txt").as("ta"), col("len").as("la"))
    val b = d.select(col("pfx"), col("doc_id").as("doc_b"),
      col("txt").as("tb"), col("len").as("lb"))
    a.join(b, Seq("pfx")).filter(col("doc_a") < col("doc_b") &&
        abs(col("la") - col("lb")) <= maxDist)
      .withColumn("dist", levenshtein(col("ta"), col("tb"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("doc_a"), col("doc_b"),
        col("dist").cast("long").as("dist"))
  }

  /** SimHash near-dup pairs with hamming distance ≤ maxHamming, via
    * pigeonhole banding: split the 32-bit sketch into (maxHamming+1)
    * chunks — any pair within the hamming budget MUST agree on at least
    * one chunk, so banding has recall exactly 1.0 and the verified output
    * is deterministically equal to the brute-force pair scan the oracle
    * runs. Shuffle cost: one self-join on (chunkIdx, chunkValue).
    *
    * `eager` has the same semantics as [[jaccardPairs]]: true = computed
    * now + scoped caches, false = pure lazy plan. */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, maxHamming: Int = 3, eager: Boolean = true): DataFrame = {
    val bits = 32
    val nChunks = maxHamming + 1
    val width = bits / nChunks // 8
    // cached: both sides of the band self-join derive from this frame
    val withSh = cacheIf(eager)(docs.select(col(idCol).as("doc_id"),
      shingleHashes(col(textCol), n).as("hs"))
      .filter(size(col("hs")) > 0)
      .withColumn("sim", simhashFromHashes(col("hs"), bits)))
    val chunks = array((0 until nChunks).map(j =>
      shiftright(col("sim"), j * width).bitwiseAND(lit((1L << width) - 1))): _*)
    val bands = withSh.select(col("doc_id"), col("sim"),
      posexplode(chunks).as(Seq("chunk", "cv")))
    val l = bands.select(col("chunk"), col("cv"), col("doc_id").as("doc_a"),
      col("sim").as("sim_a"))
    val r = bands.select(col("chunk"), col("cv"), col("doc_id").as("doc_b"),
      col("sim").as("sim_b"))
    // A pair agreeing on m chunks meets in m buckets; instead of a global
    // dropDuplicates shuffle over the candidate stream, keep ONLY the
    // meeting in the FIRST agreeing chunk — computable from the two
    // sketches already on the row, so dedup costs zero shuffles and each
    // qualifying pair is emitted exactly once.
    val firstAgreeing = (0 until nChunks).map { i =>
      val ca = shiftright(col("sim_a"), i * width).bitwiseAND(lit((1L << width) - 1))
      val cb = shiftright(col("sim_b"), i * width).bitwiseAND(lit((1L << width) - 1))
      (col("chunk") <= i) || (ca =!= cb)
    }.reduce(_ && _)
    val out = l.join(r, Seq("chunk", "cv"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("hamming",
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .filter(col("hamming") <= maxHamming && firstAgreeing)
      .select("doc_a", "doc_b", "hamming")
    finish(eager)(out, withSh)
  }
}
