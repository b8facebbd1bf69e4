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
      matchedTimeCol: String = "matched_time"): DataFrame =
    sweep(left, right, keys, leftTime, rightTime, valueCols, strict,
      tolerance, matchedTimeCol, forward = false)

  /** Forward as-of join (earliest right row at-or-after / strictly-after
    * each left row's time) — same union-and-sweep, run on a DESCENDING
    * time sort so the incremental `last_value` running frame applies
    * unchanged. (The tempting [currentRow, unboundedFollowing] frame is an
    * UnboundedFollowing frame in WindowExec, which RE-AGGREGATES the whole
    * remaining partition suffix per output row — O(n²) per key; sorting
    * desc keeps the O(n) one-pass sweep.) `strict = true` matches
    * right.t > left.t; tolerance bounds (rightTime - leftTime). */
  def asofForward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, valueCols: Seq[String],
      strict: Boolean = false, tolerance: Option[Column] = None,
      matchedTimeCol: String = "matched_time"): DataFrame =
    sweep(left, right, keys, leftTime, rightTime, valueCols, strict,
      tolerance, matchedTimeCol, forward = true)

  /** NEAREST as-of join (pandas `merge_asof(direction='nearest')`, the
    * third direction): the closer of the backward and forward matches by
    * absolute time distance, backward preferred on exact ties. FUSED
    * single-shuffle rendering: both inputs are tagged and unioned ONCE,
    * then the backward candidate comes from the ascending-time running
    * window and the forward candidate from the descending-time one —
    * both windows partition on the same keys, so Catalyst plans ONE
    * exchange with two sorts, instead of the naive composition of two
    * full union-and-sweep passes (which re-executes the backward pass's
    * whole upstream plan inside the forward pass and shuffles twice).
    * Still O(n) per key, never a range probe. `strict` and `tolerance`
    * apply symmetrically to both directions. */
  def asofNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, valueCols: Seq[String],
      strict: Boolean = false, tolerance: Option[Column] = None,
      matchedTimeCol: String = "matched_time"): DataFrame = {
    val (unioned, leftCols, t, pay, lSide) =
      tagAndUnion(left, right, keys, leftTime, rightTime, valueCols,
        strict, matchedTimeCol)
    val BP = "__asof_bpay__"; val FP = "__asof_fpay__"
    // Same SIDE tiebreak serves both directions: the forward sweep flips
    // the TIME sort only (see tagAndUnion's side-bit comment).
    def w(ord: Column) = Window.partitionBy(keys.map(col): _*)
      .orderBy(ord, col(SIDE))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned
      .withColumn(BP, last(col(pay), ignoreNulls = true).over(w(col(t).asc)))
      .withColumn(FP, last(col(pay), ignoreNulls = true).over(w(col(t).desc)))
      .filter(col(SIDE) === lSide)
    def gate(c: String, gap: Column => Column): Column =
      tolerance.fold(col(c))(tol =>
        when(col(c).isNotNull && gap(col(c).getField("__mt")) <= tol, col(c)))
    val g = filled
      .withColumn(BP, gate(BP, mt => col(t) - mt))
      .withColumn(FP, gate(FP, mt => mt - col(t)))
    val useB = col(BP).isNotNull && (col(FP).isNull ||
      (col(t) - col(BP).getField("__mt")) <=
        (col(FP).getField("__mt") - col(t)))
    val chosen = g.withColumn(pay, when(useB, col(BP)).otherwise(col(FP)))
    chosen
      .withColumn(matchedTimeCol, col(pay).getField("__mt"))
      .withColumns(valueCols.map(v => v -> col(pay).getField(v)).toMap)
      .select((leftCols.map(col) :+ col(matchedTimeCol)) ++
        valueCols.map(col): _*)
  }

  /** Shared tag-and-union construction: returns (unioned df, left column
    * list, time-column name, payload-column name, left side bit). */
  private def tagAndUnion(left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTime: String, rightTime: String,
      valueCols: Seq[String], strict: Boolean, matchedTimeCol: String)
      : (DataFrame, Seq[String], String, String, Int) = {
    require(valueCols.nonEmpty, "asof join needs at least one value column")
    require(valueCols.toSet.intersect(keys.toSet).isEmpty,
      "valueCols must be disjoint from the join keys")
    val collisions =
      (valueCols.toSet + matchedTimeCol).intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"output columns ${collisions.mkString(", ")} already exist on the " +
        "left input — rename one side (they would be silently overwritten)")
    val t = "__asof_t__"
    val PAY = "__asof_pay__"
    // side bit: right must be visible at equal time iff inclusive — i.e.
    // sort before the left row at equal t. Independent of direction: the
    // forward sweep flips the TIME sort, not the equal-time tiebreak.
    val (rSide, lSide) = if (strict) (1, 0) else (0, 1)

    // The whole matched right row travels as ONE struct, so matched_time
    // and every value column always come from the SAME right row — a
    // per-column last(v, ignoreNulls) sweep would skip a right row whose
    // value is genuinely NULL and resurrect an older row's value.
    val payType = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField(
        "__mt", right.schema(rightTime).dataType) +:
        valueCols.map(v => right.schema(v)))

    val leftCols = left.columns.toSeq
    val l = left
      .withColumn(t, col(leftTime))
      .withColumn(SIDE, lit(lSide))
      .withColumn(PAY, lit(null).cast(payType))
    val r = right
      .select((keys.map(col) :+ col(rightTime).as(t)) :+
        struct(col(rightTime).as("__mt") +: valueCols.map(col): _*).as(PAY): _*)
      .withColumn(SIDE, lit(rSide))
      .withColumns(leftCols.filterNot(keys.contains).map { c =>
        c -> lit(null).cast(left.schema(c).dataType)
      }.toMap)
    (l.unionByName(r.select(l.columns.map(col): _*)), leftCols, t, PAY, lSide)
  }

  private def sweep(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, valueCols: Seq[String],
      strict: Boolean, tolerance: Option[Column],
      matchedTimeCol: String, forward: Boolean): DataFrame = {
    val (unioned, leftCols, t, pay, lSide) =
      tagAndUnion(left, right, keys, leftTime, rightTime, valueCols,
        strict, matchedTimeCol)
    // One running frame both ways: forward = backward on reversed time.
    // last(ignoreNulls) over [unboundedPreceding, currentRow] is the
    // incremental (O(1)-per-row) frame in WindowExec; with t sorted desc
    // the nearest FOLLOWING right row is the last preceding non-null.
    val tOrd = if (forward) col(t).desc else col(t).asc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tOrd, col(SIDE))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = unioned
      .withColumn(pay, last(col(pay), ignoreNulls = true).over(w))
      .filter(col(SIDE) === lSide)

    val gated = tolerance.fold(filled) { tol =>
      val gap =
        if (forward) col(pay).getField("__mt") - col(t)
        else col(t) - col(pay).getField("__mt")
      filled.withColumn(pay,
        when(col(pay).isNotNull && gap <= tol, col(pay)))
    }
    gated
      .withColumn(matchedTimeCol, col(pay).getField("__mt"))
      .withColumns(valueCols.map(v => v -> col(pay).getField(v)).toMap)
      .select((leftCols.map(col) :+ col(matchedTimeCol)) ++
        valueCols.map(col): _*)
  }
}
