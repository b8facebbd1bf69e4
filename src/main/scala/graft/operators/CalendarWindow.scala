package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Calendar-Period range frames — the reference's `.frame` accepts ANY
  * lubridate Period, including `months(k)` (R/mutate.R:164-165 checks
  * only "numeric or Period"); day/second Periods map onto Spark's
  * `rangeBetween` (TidierOps), but month windows have per-row widths
  * (`[add_months(d, -k), d]` clamps at month ends), which a constant-
  * offset range frame cannot express.
  *
  * The naive rendering — a range self-join collecting every (row,
  * in-window row) pair — re-materializes each window like the
  * reference's slider does: O(n·w) pairs, quadratic on dense groups.
  * This operator keeps the sort-based cost model instead, composing two
  * primitives this library already ships:
  *
  *   1. collapse to per-(group, day) partials and PREFIX-SUM them
  *      (one window sweep — running sum/count per group);
  *   2. as-of join (strict, backward) each row's boundary
  *      `lo = add_months(day, -k)` into that cumulative series: the
  *      last prefix STRICTLY BEFORE lo;
  *   3. window aggregate = prefix(day) − prefix(lo⁻) — inclusive of lo,
  *      like SQL BETWEEN and slider's closed interval.
  *
  * Cost: two hash shuffles on the group keys (prefix window + as-of
  * sweep) over |distinct (group, day)| rows, then one join back —
  * O(n log n), no pair blowup, same shape at any window width.
  */
object CalendarWindow {

  /** Trailing-months window aggregates of `valueCol` over
    * `[add_months(index, -months), index]` per `by` group, appended as
    * `<out>_sum`, `<out>_cnt`, `<out>_avg` (null-safe: days without
    * values contribute nothing; an all-null window yields NULL sum/avg
    * and 0 cnt, matching SQL aggregate semantics). `index` must be a
    * DateType column expression. */
  def trailingMonths(df: DataFrame, by: Seq[String], index: Column,
      valueCol: String, months: Int, out: String = "win"): DataFrame = {
    require(months >= 0, "months must be >= 0")
    val DAY = "__cw_day__"
    val LO = "__cw_lo__"
    val byCols = by.map(col)
    // same contract as AsofJoin: colliding output names would survive as
    // duplicate columns and make every downstream select ambiguous
    val outCols = Seq(s"${out}_sum", s"${out}_cnt", s"${out}_avg", DAY)
    val collisions = outCols.toSet.intersect(df.columns.toSet)
    require(collisions.isEmpty,
      s"output columns ${collisions.mkString(", ")} already exist on the " +
        "input — pass a different `out` prefix")

    val keyed = df.withColumn(DAY, index)
    // 1. per-(group, day) partials, then per-group running prefix
    val daily = keyed.groupBy((byCols :+ col(DAY)): _*)
      .agg(sum(col(valueCol)).as("__s"), count(col(valueCol)).as("__c"))
    val pw = Window.partitionBy(byCols: _*).orderBy(col(DAY))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = daily
      .withColumn("__cs", sum(col("__s")).over(pw))
      .withColumn("__cc", sum(col("__c")).over(pw))
      .select((byCols ++ Seq(col(DAY), col("__cs"), col("__cc"))): _*)

    // 2. strict backward as-of at each distinct (group, day)'s lo
    val bounds = cum.select((byCols :+ col(DAY)): _*)
      .withColumn(LO, add_months(col(DAY), -months))
    val matched = AsofJoin.asofBackward(
      bounds, cum.withColumnRenamed(DAY, "__rt"),
      keys = by, leftTime = LO, rightTime = "__rt",
      valueCols = Seq("__cs", "__cc"), strict = true,
      matchedTimeCol = "__mt")

    // 3. prefix difference, joined back to every input row by (group, day).
    // Both joins below are NULL-SAFE (<=>): Window/groupBy upstream treat
    // a NULL group or NULL index day as real groups, and a null-unsafe
    // equi-join would silently DROP those rows (GlobalWindow.sweepAndJoin
    // uses <=> for the same reason).
    val mn = (by :+ DAY).map(c => s"__cw_m_$c")
    val matchedR = matched.toDF(matched.columns.map(c =>
      if ((by :+ DAY).contains(c)) s"__cw_m_$c" else c): _*)
    val mCond = (by :+ DAY).zip(mn)
      .map { case (l, r) => col(l) <=> col(r) }.reduce(_ && _)
    val winCols = cum.select((byCols ++ Seq(col(DAY), col("__cs").as("__cse"),
        col("__cc").as("__cce"))): _*)
      .join(matchedR, mCond).drop(mn: _*)
      .select((byCols ++ Seq(col(DAY),
        (col("__cse") - coalesce(col("__cs"), lit(0.0).cast(
          df.schema(valueCol).dataType))).as("__rawsum"),
        (col("__cce") - coalesce(col("__cc"), lit(0L))).as(s"${out}_cnt"))): _*)
      // empty window (only null values in range) → NULL sum/avg, 0 cnt —
      // SQL aggregate semantics, not a fabricated 0.0
      .withColumn(s"${out}_sum",
        when(col(s"${out}_cnt") > 0, col("__rawsum")))
      .withColumn(s"${out}_avg",
        when(col(s"${out}_cnt") > 0,
          col("__rawsum").cast("double") / col(s"${out}_cnt")))
      .drop("__rawsum")

    // NULL-SAFE join-back: Window/groupBy upstream treat a NULL group or
    // NULL index day as real groups, and a null-unsafe equi-join would
    // silently DROP those rows from the output (GlobalWindow.sweepAndJoin
    // uses <=> for the same reason).
    val rn = (by :+ DAY).map(c => s"__cw_r_$c")
    val winR = winCols.toDF(
      winCols.columns.map(c =>
        if ((by :+ DAY).contains(c)) s"__cw_r_$c" else c): _*)
    val cond = (by :+ DAY).zip(rn)
      .map { case (l, r) => col(l) <=> col(r) }.reduce(_ && _)
    keyed.join(winR, cond).drop(rn: _*).drop(DAY)
  }
}
