package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.BinaryType

/** Benchmark decontamination at the 100 TB design point.
  *
  * The EXACT form (CurationQueries `decontam_overlap`) broadcast-joins
  * the held-out suite's n-gram set — right for suites that fit in
  * executor memory as a hash set. When the contamination source is
  * itself large (every eval suite ever shipped, a dedup-against-web
  * blocklist), the set doesn't fit but a Bloom SKETCH does: fixed bits
  * regardless of item count, built distributedly (partial sketches
  * OR-merged — Spark's own runtime-filter aggregate), probed per gram
  * with zero shuffle on the corpus side.
  *
  * Semantics: NO false negatives — a doc sharing any n-gram with the
  * suite is always flagged (the bloom can only over-approximate), so
  * decontamination is SAFE; false positives drop clean docs at the
  * configured fpp (recall/size trade, the standard bloom contract).
  *
  * Spark-native detail: the sketch is built by the same
  * `BloomFilterAggregate` expression Spark's InjectRuntimeFilter plants
  * under joins, and probed by `BloomFilterMightContain` with a LITERAL
  * sketch (collected once, bounded size — the broadcast contract), whose
  * deserialized bitset is cached across rows. Grams are the library's
  * 60-bit shingle hashes, so exact and bloom paths see identical keys.
  */
object Decontam {

  /** Build the gram bloom sketch (bytes) from the held-out suite:
    * one distributed aggregation over `shingleHashes(textCol, n)`. */
  def buildGramBloom(bench: DataFrame, textCol: String, n: Int = 5,
      expectedItems: Long = 1L << 22, fpp: Double = 0.001): Array[Byte] =
    buildGramBloomFromHashes(
      bench.select(explode(Dedup.shingleHashes(col(textCol), n)).as("g")),
      "g", expectedItems, fpp)

  /** Build the sketch from an ALREADY-PROJECTED gram-hash frame — lets a
    * caller that also needs the exact gram set (e.g. the oracle-gated
    * safety check) derive both from one shingle projection instead of
    * re-evaluating the tokenizer kernel per consumer. */
  def buildGramBloomFromHashes(grams: DataFrame, hashCol: String,
      expectedItems: Long = 1L << 22, fpp: Double = 0.001): Array[Byte] = {
    require(fpp > 0 && fpp < 1, "fpp must be in (0, 1)")
    // standard bloom sizing: bits = -items * ln(fpp) / ln(2)^2
    val numBits = math.ceil(
      -expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    // BloomFilterAggregate silently CLAMPS its arguments to the
    // runtime-filter conf caps; a clamped sketch would deliver a far
    // worse fpp than requested with no sign anything degraded — fail
    // loudly and point at the confs instead.
    val conf = grams.sparkSession.sessionState.conf
    val maxItems = conf.getConfString(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumItems", "4000000").toLong
    val maxBits = conf.getConfString(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "67108864").toLong
    require(expectedItems <= maxItems && numBits <= maxBits,
      s"bloom sizing (items=$expectedItems, bits=$numBits) exceeds the " +
        s"session caps (maxNumItems=$maxItems, maxNumBits=$maxBits) and " +
        "would be silently clamped to a worse fpp — raise " +
        "spark.sql.optimizer.runtime.bloomFilter.{maxNumItems,maxNumBits} " +
        "or lower expectedItems/fpp")
    val agg = ColumnShim.column(new BloomFilterAggregate(
        ColumnShim.expression(col(hashCol)),
        Literal(expectedItems), Literal(numBits))
      .toAggregateExpression())
    val row = grams.select(agg.as("bf")).head()
    // an aggregate over ZERO grams yields NULL; probing with a null
    // sketch would make might_contain NULL for every row and the drop
    // filter would then remove the ENTIRE corpus silently
    require(!row.isNullAt(0),
      "benchmark produced no n-grams (empty frame, null text, or every " +
        s"doc shorter than n tokens) — refusing to build a null sketch")
    row.getAs[Array[Byte]](0)
  }

  /** Probe column: TRUE when any n-gram of `textCol` might be in the
    * sketch. Narrow (no shuffle, no join): `exists` over the gram array
    * against a literal sketch. NULL text coalesces to FALSE — a doc with
    * no grams cannot share an n-gram with the suite, so it must be KEPT
    * (a bare `exists` would be NULL there, and `filter(!NULL)` would
    * silently drop every null-text doc). */
  def mightOverlap(textCol: Column, bloom: Array[Byte], n: Int = 5): Column =
    mightOverlapHashes(Dedup.shingleHashes(textCol, n), bloom)

  /** Probe over an ALREADY-COMPUTED gram-hash array column — pairs with
    * [[buildGramBloomFromHashes]] so a pipeline that projected
    * `shingleHashes` once can probe without re-running the kernel. */
  def mightOverlapHashes(hashesCol: Column, bloom: Array[Byte]): Column =
    coalesce(
      exists(hashesCol, g =>
        ColumnShim.column(BloomFilterMightContain(
          Literal(bloom, BinaryType), ColumnShim.expression(g)))),
      lit(false))

  /** Drop every corpus doc that might share an n-gram with the suite —
    * guaranteed to drop all truly-contaminated docs (no false
    * negatives), plus an fpp-bounded sliver of clean ones. */
  def dropContaminated(corpus: DataFrame, textCol: String,
      bloom: Array[Byte], n: Int = 5): DataFrame =
    corpus.filter(!mightOverlap(col(textCol), bloom, n))
}
