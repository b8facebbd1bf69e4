package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark lacks natively and the
  * classic per-row range probe cannot survive at scale.
  *
  * Implementation is the union-and-sweep pattern: tag both inputs, union
  * them, and run ONE window pass per key partition ordered by
  * (time, side) where the side bit encodes the inequality:
  *   - backward inclusive (l.t >= r.t): right rows sort BEFORE left rows
  *     at equal time, so `last_value(..., ignoreNulls)` over
  *     [unboundedPreceding, currentRow] picks them up;
  *   - backward strict (l.t > r.t): right rows sort AFTER left rows at
  *     equal time, so an equal-time right row is invisible.
  * Cost: one hash shuffle on the keys + one sort — same plan shape as any
  * windowed aggregate, no broadcast of either side, no range-duplicated
  * rows. This is the 100 TB-safe rendering (a range-condition join would
  * rescan right per left row; a per-key collect would skew).
  *
  * Output: every left row, plus each requested right value column (null
  * when no right row precedes), plus `matchedTime` (the matched right
  * row's time, null when unmatched) — the hook for tolerance filtering.
  */
object AsofJoin {

  private val SIDE = "__asof_side__"
  private val MT = "__asof_mt__"

  /** Backward as-of join (latest right row at-or-before / strictly-before
    * each left row's time).
    *
    * @param keys      equality join keys (both sides)
    * @param leftTime  left event-time column name
    * @param rightTime right event-time column name (same orderable type)
    * @param valueCols right columns to bring over
    * @param strict    false → match right.t <= left.t (SQL `>=` asof);
    *                  true → match right.t < left.t
    * @param tolerance max allowed (leftTime - rightTime), in the time
    *                  column's native units; matches farther back are
    *                  nulled (pandas merge_asof tolerance semantics)
    */
  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, valueCols: Seq[String],
      strict: Boolean = false, tolerance: Option[Column] = None,
      matchedTimeCol: String = "matched_time"): DataFrame = {
    require(valueCols.nonEmpty, "asofBackward needs at least one value column")
    val t = "__asof_t__"
    // side bit: right must be visible at equal time iff inclusive
    val (rSide, lSide) = if (strict) (1, 0) else (0, 1)

    val leftCols = left.columns.toSeq
    val l = left
      .withColumn(t, col(leftTime))
      .withColumn(SIDE, lit(lSide))
      .withColumn(MT, lit(null).cast(left.schema(leftTime).dataType))
      .withColumns(valueCols.map(v =>
        v -> lit(null).cast(right.schema(v).dataType)).toMap)
    val r = right
      .select((keys.map(col) :+ col(rightTime).as(t)) ++
        valueCols.map(col): _*)
      .withColumn(SIDE, lit(rSide))
      .withColumn(MT, col(t))
      .withColumns(leftCols.filterNot(c =>
        keys.contains(c) || valueCols.contains(c)).map { c =>
        c -> lit(null).cast(left.schema(c).dataType)
      }.toMap)

    val unioned = l.unionByName(r.select(l.columns.map(col): _*))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(t), col(SIDE))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = valueCols.foldLeft(
      unioned.withColumn(MT, last(col(MT), ignoreNulls = true).over(w))) {
      (d, v) => d.withColumn(v, last(col(v), ignoreNulls = true).over(w))
    }

    val leftOnly = filled.filter(col(SIDE) === lSide)
    val toleranced = tolerance.fold(leftOnly) { tol =>
      val inTol = col(MT).isNotNull && (col(t) - col(MT)) <= tol
      valueCols.foldLeft(
        leftOnly.withColumn(MT, when(inTol, col(MT)))) { (d, v) =>
        d.withColumn(v, when(inTol, col(v)))
      }
    }
    toleranced
      .withColumn(matchedTimeCol, col(MT))
      .select((leftCols.map(col) :+ col(matchedTimeCol)) ++
        valueCols.map(col): _*)
  }
}
