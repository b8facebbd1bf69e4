package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval-containment) join — the second classic operator Spark
  * lacks a fast native plan for (with as-of join, SURVEY.md §2.4 "Joins"
  * row): `points.t BETWEEN intervals.lo AND intervals.hi` on equal keys.
  *
  * Spark plans a non-equi condition as BroadcastNestedLoopJoin (every
  * point against every interval — O(n·m) comparisons), which dies at
  * scale. The standard fix is BINNING: quantize time into fixed-width
  * bins, explode each interval to the bins it overlaps, tag each point
  * with its bin, then run an ordinary EQUI join on (key, bin) and
  * re-check the exact predicate. Comparisons drop to pairs sharing a
  * bin; the join is a hash/sort-merge join Catalyst can shuffle, AQE
  * can skew-split, and executors can spill.
  *
  * Bin width trades duplication (each interval appears in
  * `span/binWidth + 1` bins) against candidate precision — set it near
  * the TYPICAL interval span. Degenerate giant intervals (≫ binWidth)
  * should be handled out-of-band (split them, or broadcast that tiny
  * subset); this operator asserts nothing about them beyond correctness.
  */
object RangeJoin {

  /** Data-derived bin width: a length quantile of the intervals
    * themselves (default p75), floored at 1 — ONE tiny aggregate job
    * (approx_percentile, mergeable sketch; cost is a scan of two
    * columns). A fixed binWidth tuned to the "typical" span
    * underestimates on SKEWED length distributions: each tail interval
    * explodes into span/binWidth + 1 bins, and a heavy tail multiplies
    * the exploded row count (ScaleProbe's skewed 10M probe measures
    * this). Anchoring the width at p75 keeps the short majority in
    * ~1-2 bins while capping the tail's per-interval expansion at
    * span/p75. Pass the LONGER-tailed side when joining two interval
    * sets. */
  def autoBinWidth(intervals: DataFrame, loCol: String, hiCol: String,
      quantile: Double = 0.75): Long = {
    val v = intervals
      .agg(expr(s"approx_percentile($hiCol - $loCol, $quantile)"))
      .collect()(0).get(0)
    math.max(1L, Option(v).map(_.toString.toDouble.toLong).getOrElse(1L))
  }

  /** Inner range join: rows of `points` paired with every row of
    * `intervals` with matching `keys` and `pointCol ∈ [loCol, hiCol]`
    * (inclusive both ends). Time columns must be numeric (cast dates/
    * timestamps to epoch units first). Output: all point columns + all
    * interval columns (keys once). */
  def intervalJoin(points: DataFrame, intervals: DataFrame,
      keys: Seq[String], pointCol: String, loCol: String, hiCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val BIN = "__rj_bin__"
    val p = points.withColumn(BIN, floor(col(pointCol) / binWidth))
    val i = intervals.withColumn(BIN, explode(sequence(
      floor(col(loCol) / binWidth), floor(col(hiCol) / binWidth))))
    p.join(i, keys :+ BIN)
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop(BIN)
  }

  /** Interval-OVERLAP join (interval × interval, both sides large):
    * pairs of rows with matching `keys` whose closed intervals
    * `[lo1, hi1]` and `[lo2, hi2]` intersect. Same binning idea as
    * [[intervalJoin]] with one extra trick: a pair of overlapping
    * intervals shares EVERY bin their intersection covers, so a plain
    * binned equi-join emits duplicates. Instead of a `distinct` over
    * the (wide) pair output, each pair is emitted only from its
    * CANONICAL bin — the bin containing `greatest(lo1, lo2)`, the
    * intersection's start, which exists exactly once per overlapping
    * pair. The join stays a pure shuffle hash/sort-merge equi-join on
    * (keys, bin); no dedup pass, no nested loop.
    *
    * Left columns are suffixed `_1`, right `_2` (keys kept once,
    * unsuffixed). Interval columns must be numeric; both sides explode
    * to `span/binWidth + 1` bins, so set `binWidth` near the typical
    * interval span. */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
      keys: Seq[String], lo1: String, hi1: String, lo2: String,
      hi2: String, binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val BIN = "__oj_bin__"
    def suffix(df: DataFrame, sfx: String) = df.columns.foldLeft(df) {
      (d, c) => if (keys.contains(c)) d else d.withColumnRenamed(c, c + sfx)
    }
    val l = suffix(left, "_1").withColumn(BIN, explode(sequence(
      floor(col(lo1 + "_1") / binWidth), floor(col(hi1 + "_1") / binWidth))))
    val r = suffix(right, "_2").withColumn(BIN, explode(sequence(
      floor(col(lo2 + "_2") / binWidth), floor(col(hi2 + "_2") / binWidth))))
    l.join(r, keys :+ BIN)
      .filter(col(hi1 + "_1") >= col(lo2 + "_2") &&
        col(hi2 + "_2") >= col(lo1 + "_1") &&
        floor(greatest(col(lo1 + "_1"), col(lo2 + "_2")) / binWidth)
          === col(BIN))
      .drop(BIN)
  }
}
