package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD2 interval builder — change log → validity intervals.
  *
  * The warehouse/training-pipeline primitive the CDC diff
  * (`cdc_snapshot_diff`) feeds into: given a keyed change log (one row
  * per observation of a dimension's attributes), emit one row per
  * CHANGE with `[valid_from, valid_to)` validity and an `is_current`
  * flag — the "slowly changing dimension type 2" table that lets a
  * fact row at time t join the dimension attributes that were true AT
  * t (the as-of/interval joins in AsofJoin/RangeJoin consume exactly
  * this shape).
  *
  * Scale design: everything rides ONE hash exchange on the dimension
  * key. Change-point compression is a `lag` over
  * (key, ts, tiebreak...), the interval close is a `lead` over the
  * SURVIVING rows — same window spec, so the second Window reuses the
  * first's partitioning (the filter preserves both partitioning and
  * order: no second exchange, no re-sort; pinned by the plan assert in
  * Scd2Spec). State per key is O(1) — no buffering of the
  * full history anywhere.
  *
  * Determinism contract: (ts, tiebreak...) must be unique within a
  * key, or lag/lead order — and therefore which duplicate "wins" a
  * change point — is undefined. Attribute comparison is null-safe
  * (`<=>`), so a NULL→value or value→NULL transition is a change.
  */
object Scd2 {

  /** @param keyCols  dimension key
    * @param tsCol    observation time (any orderable type)
    * @param tieCols  disambiguators making (ts, tie*) unique per key
    * @param attrCols tracked attributes; a row opens a new interval
    *                 when any of them differs (null-safely) from the
    *                 previous observation
    * @return input columns of the surviving change rows plus
    *         `valid_from` (= ts), `valid_to` (next change's ts, NULL
    *         for the open interval), `is_current`
    */
  def intervals(df: DataFrame, keyCols: Seq[String], tsCol: String,
      tieCols: Seq[String], attrCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty,
      "scd2: key and attribute columns required")
    val order: Seq[Column] = (tsCol +: tieCols).map(col)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
    val cur = struct(attrCols.map(col): _*)
    val changed = df
      .withColumn("__scd2_prev", lag(cur, 1).over(w))
      .filter(!(col("__scd2_prev") <=> cur))
      .drop("__scd2_prev")
    changed
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Incrementally apply a batch of LATER observations to an existing
    * SCD2 table — the 100 TB refresh path. A dimension history grows
    * forever; recomputing [[intervals]] over the full log every load
    * reshuffles all of history. This instead windows ONLY (one open
    * interval per key) ∪ (the batch): each key's current row IS its
    * last change point, so re-running the same compression over that
    * union reproduces exactly the new change set — the current row is
    * re-closed (or stays open) by the lead(), batch echoes of the
    * current attribute are dropped, new keys open cleanly. Closed
    * history is unioned back untouched: cost scales with
    * |keys| + |batch|, never with |history|. Equals a full recompute
    * (property-pinned in Scd2Spec; the oracle key `scd2_incremental`
    * hash-gates it against the full-recompute SQL) under the standard
    * append-only contract: every batch ts is strictly later than every
    * prior observation of its key.
    */
  def applyBatch(prior: DataFrame, batch: DataFrame, keyCols: Seq[String],
      tsCol: String, tieCols: Seq[String], attrCols: Seq[String])
      : DataFrame = {
    val logCols = ((keyCols :+ tsCol) ++ tieCols ++ attrCols).distinct
    val refreshed = intervals(
      prior.filter(col("is_current")).select(logCols.map(col): _*)
        .unionByName(batch.select(logCols.map(col): _*)),
      keyCols, tsCol, tieCols, attrCols)
    prior.filter(!col("is_current"))
      .select(refreshed.columns.map(col).toIndexedSeq: _*)
      .unionByName(refreshed)
  }
}
