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

  /** Distinct word n-gram shingles of the normalized text; empty array for
    * docs with fewer than n tokens. */
  def shingles(c: Column, n: Int = 3): Column = {
    val t = tokens(c)
    val grams = transform(sequence(lit(1), size(t) - lit(n - 1)), i =>
      concat_ws(" ", (0 until n).map(k => element_at(t, i + lit(k))): _*))
    when(size(t) >= n, array_distinct(grams))
      .otherwise(array().cast("array<string>"))
  }

  /** 60-bit base hash shared with the DuckDB oracle:
    * Spark `conv(substr(md5(s),1,15),16,10)` ==
    * DuckDB `CAST('0x' || substr(md5(s),1,15) AS BIGINT)`. */
  def baseHash(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

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
  def minhashSignature(shingleCol: Column, k: Int = 32): Column = {
    val hs = (0 until k).map { i =>
      val perm = transform(shingleCol, s =>
        pmod(lit(minhashA(i)) * pmod(baseHash(s), lit(MinhashP))
          + lit(minhashB(i)), lit(MinhashP)))
      coalesce(array_min(perm), lit(MinhashP))
    }
    array(hs: _*)
  }

  /** Exact n-gram Jaccard pairs via inverted-index self-join.
    *
    * @param maxShingleDf drop shingles appearing in more than this many
    *        docs before pairing (0 = no pruning). High-DF shingles generate
    *        O(df²) candidate pairs each — at 100 TB this cap is what keeps
    *        the self-join bounded; with it, work scales with
    *        Σ_shingle min(df, cap)². Pruning can only LOWER recall for
    *        pairs whose overlap is concentrated in ubiquitous shingles —
    *        acceptable in production, disabled for oracle-gated runs. */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, minJaccard: Double = 0.5,
      maxShingleDf: Long = 0L): DataFrame = {
    val withSh = docs.select(col(idCol).as("doc_id"),
      shingles(col(textCol), n).as("sh"))
    val sized = withSh.select(col("doc_id"), col("sh"), size(col("sh")).as("sz"))
      .filter(col("sz") > 0)
    val posts = sized.select(col("doc_id"), col("sz"), explode(col("sh")).as("s"))
    val pruned =
      if (maxShingleDf > 0) {
        val dfCounts = posts.groupBy("s")
          .agg(count(lit(1)).as("df_"))
          .filter(col("df_") <= maxShingleDf)
        posts.join(pruned_hint(dfCounts), Seq("s"))
      } else posts
    val a = pruned.select(col("s"), col("doc_id").as("doc_a"), col("sz").as("za"))
    val b = pruned.select(col("s"), col("doc_id").as("doc_b"), col("sz").as("zb"))
    a.join(b, Seq("s")).filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b", "za", "zb")
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("za") + col("zb") - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** The DF table is tiny relative to postings — broadcast it so pruning
    * adds no extra shuffle of the posting list. */
  private def pruned_hint(dfCounts: DataFrame): DataFrame = broadcast(dfCounts)

  /** MinHash-LSH near-dup pairs: signature per row → band keys → bucket
    * self-join for candidates → exact-Jaccard verification of candidates
    * only. With rowsPerBand=2 and 16 bands, P(miss) at j=0.9 is ~3e-12, so
    * the verified output equals the exact jaccardPairs result w.h.p. —
    * which is precisely what the oracle checks (end-to-end recall).
    */
  def minhashPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 32, rowsPerBand: Int = 2,
      minJaccard: Double = 0.5): DataFrame = {
    require(k % rowsPerBand == 0, "k must divide into bands")
    val nBands = k / rowsPerBand
    val withSh = docs.select(col(idCol).as("doc_id"),
      shingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minhashSignature(col("sh"), k))
    // band keys: "bandIdx:v1-v2" strings; posexplode → (band, key) posts
    val bandKeys = array((0 until nBands).map { j =>
      concat_ws("-", (0 until rowsPerBand).map(r =>
        element_at(col("sig"), j * rowsPerBand + r + 1)): _*)
    }: _*)
    val bands = withSh.select(col("doc_id"), col("sh"),
        posexplode(bandKeys).as(Seq("band", "key")))
    val l = bands.select(col("band"), col("key"), col("doc_id").as("doc_a"),
      col("sh").as("sh_a"))
    val r = bands.select(col("band"), col("key"), col("doc_id").as("doc_b"),
      col("sh").as("sh_b"))
    val cands = l.join(r, Seq("band", "key"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "sh_a", "sh_b")
      .dropDuplicates("doc_a", "doc_b")
    cands
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select("doc_a", "doc_b", "jaccard")
  }

  // --- SimHash ----------------------------------------------------------

  /** 32-bit SimHash over the shingle set: bit i is set iff the sum of
    * ±1 contributions (sign of bit i of each shingle's base hash) is
    * positive. Pure per-row fold (aggregate over the shingle array with an
    * int-array accumulator) — zero shuffle. 0 for empty shingle sets. */
  def simhash(shingleCol: Column, bits: Int = 32): Column = {
    // Bit positions are Scala-level Ints (unrolled), not Column indices —
    // shiftright/shiftleft only take literal shift amounts, and unrolling
    // keeps everything in integer arithmetic (no double-precision drift).
    val contrib = aggregate(
      shingleCol,
      array_repeat(lit(0L), bits),
      (acc, s) => {
        val h = baseHash(s)
        val signs = array((0 until bits).map(i =>
          when(shiftright(h, i).bitwiseAND(lit(1L)) === 1L, lit(1L))
            .otherwise(lit(-1L))): _*)
        zip_with(acc, signs, (x, y) => x + y)
      })
    val value = (0 until bits).map(i =>
      when(element_at(contrib, i + 1) > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)
    coalesce(value, lit(0L))
  }

  /** SimHash near-dup pairs with hamming distance ≤ maxHamming, via
    * pigeonhole banding: split the 32-bit sketch into (maxHamming+1)
    * chunks — any pair within the hamming budget MUST agree on at least
    * one chunk, so banding has recall exactly 1.0 and the verified output
    * is deterministically equal to the brute-force pair scan the oracle
    * runs. Shuffle cost: one self-join on (chunkIdx, chunkValue). */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, maxHamming: Int = 3): DataFrame = {
    val bits = 32
    val nChunks = maxHamming + 1
    val width = bits / nChunks // 8
    val withSh = docs.select(col(idCol).as("doc_id"),
      shingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sim", simhash(col("sh"), bits))
    val chunks = array((0 until nChunks).map(j =>
      shiftright(col("sim"), j * width).bitwiseAND(lit((1L << width) - 1))): _*)
    val bands = withSh.select(col("doc_id"), col("sim"),
      posexplode(chunks).as(Seq("chunk", "cv")))
    val l = bands.select(col("chunk"), col("cv"), col("doc_id").as("doc_a"),
      col("sim").as("sim_a"))
    val r = bands.select(col("chunk"), col("cv"), col("doc_id").as("doc_b"),
      col("sim").as("sim_b"))
    l.join(r, Seq("chunk", "cv"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "sim_a", "sim_b")
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming",
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }
}
