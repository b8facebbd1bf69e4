package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{DateType, TimestampType}

/** Spark-native rendering of the reference's windowed-mutate operator
  * (reference: R/mutate.R:120-354 `mutate_`, :474-739 `mutate` — the entire
  * public surface of talegari/tidier v0.2.0).
  *
  * The reference materializes a window slice per row and re-aggregates it
  * (`slider::slide`, R/mutate.R:206-212 — O(n·w) interpreted R). Here the
  * same five-path decision tree (SURVEY.md §2.1) compiles to declarative
  * `Column` aggregates over a shared `WindowSpec`, so Catalyst's
  * `ExtractWindowExpressions` + `CollapseWindow` produce ONE sort-based
  * `WindowExec` per spec regardless of how many expressions are attached —
  * per-partition buffered evaluation, spill-capable, shuffle-parallel on the
  * `.by` keys. No custom plan nodes are needed; `.complete` (the one
  * capability Spark lacks natively) is ~15 lines of Column algebra.
  *
  * Decision tree (df branch of the reference, R/mutate.R:574-664):
  *   1. no by / no order / no frame  → plain `withColumns`
  *   2. frame, no by                 → global window over input row order
  *   3. frame + index, no by         → global range window over the index
  *   4. by only                      → group window (running if ordered)
  *   5. by + frame (± index)         → partitioned rows/range window
  */
object TidierOps {

  private val RID = "__tidier_rid__" // captured input row id (order restore)
  private val IDX = "__tidier_idx__" // numeric projection of the index col

  /** Month-frame branch of [[TidierDF.mutateW]]: translate each expression
    * into a [[CalendarWindow.MonthsAggSpec]] (sum/count/avg/stddev/variance
    * ride the O(n log n) prefix path; min/max the daily-partial expansion
    * path) and evaluate them all in ONE CalendarWindow pass; expression
    * sets containing ANY aggregate outside that family (median,
    * percentile, collect...) route through the raw-row expansion join
    * ([[CalendarWindow.monthsAggGeneral]]) instead. Same-name overwrite
    * (`withColumn` semantics) is preserved by computing under temp names. */
  private def monthsMutate(df: DataFrame, exprs: Seq[(String, Column)],
      by: Seq[Column], frame: Frame, index: Option[Column],
      complete: Boolean, restoreOrder: Boolean): DataFrame = {
    import CalendarWindow.{MonthsAggSpec, MonthsOp}
    require(index.isDefined,
      "a Months (Period) frame requires an index column (.index)")

    // Sub-day compound Periods (months + hours/seconds) route to the
    // seconds-granularity expansion path — the index stays a TIMESTAMP
    // (the date-granular prefix path can't carry sub-day boundaries).
    // All month-family endpoint shapes normalize to (months, seconds);
    // a day is exactly 86400 s under UTC Period arithmetic.
    if (frame.isMonthsSeconds)
      return monthsSecondsMutate(df, exprs, by, frame, index.get,
        complete, restoreOrder)

    // both endpoints must be month-family Periods (pure Months or
    // compound MonthsDays — the reference requires one shared Period
    // class per frame, R/mutate.R:165)
    def monthDay(e: FrameEndpoint): (Int, Int) = e match {
      case FrameEndpoint.Months(x)        => (x.toInt, 0)
      case FrameEndpoint.MonthsDays(m, d) => (m.toInt, d.toInt)
      case _ => throw new IllegalArgumentException(
        "month frames cannot mix units: both endpoints must be Months " +
          "or MonthsDays (use Days/Seconds frames for sub-month " +
          "granularity)")
    }
    val (b, bd) = monthDay(frame.before)
    val (a, ad) = monthDay(frame.after)
    val byNames = by.map(attrName(_, ".by"))
    val withRid =
      if (restoreOrder) df.withColumn(RID, monotonically_increasing_id())
      else df
    // Two evaluation strategies: every expression in the prefix-
    // decomposable family → the O(n log n) prefix+as-of path; ANY
    // expression outside it (median, percentile, collect aggregates —
    // the reference evaluates arbitrary R functions per slice,
    // R/mutate.R:208,586) routes the WHOLE set through the expansion
    // join (monthsAggGeneral) — the slider's own O(n·w̄) cost model,
    // distributed.
    val parsedAll = exprs.map { case (_, c) =>
      try Some(parseMonthsAgg(c)) catch {
        case _: UnsupportedOperationException => None
      }
    }
    var out: DataFrame = if (parsedAll.forall(_.isDefined)) {
      val specs = exprs.zip(parsedAll).zipWithIndex.map {
        case (((name, _), Some((op, v))), i) =>
          (name, MonthsAggSpec(s"__tidier_mout_${i}__", op, v))
        case ((_, None), _) => throw new IllegalStateException("unreachable")
      }
      val res = CalendarWindow.monthsAgg(withRid, byNames,
        index.get.cast(DateType), specs.map(_._2), before = b, after = a,
        complete = complete, beforeDays = bd, afterDays = ad,
        strict = frame.strict)
      specs.foldLeft(res) { case (d, (name, sp)) =>
        d.withColumn(name, col(sp.out)).drop(sp.out)
      }
    } else {
      // count(*)-style row counts must count a RAW-side column on the
      // expansion join (padding rows of empty windows would otherwise
      // be counted) — substitute a marker for the parseable CountAll
      // shape; all other expressions aggregate raw columns, which are
      // NULL on padding rows, so SQL null-skipping does the right thing
      val ONE = "__tidier_one__"
      require(!df.columns.contains(ONE), s"column $ONE is reserved")
      // temp output names preserve same-name-overwrite semantics, like
      // the prefix branch
      val exprs2 = exprs.zip(parsedAll).zipWithIndex.map {
        case (((_, _), Some((CalendarWindow.MonthsOp.CountAll, _))), i) =>
          s"__tidier_mout_${i}__" -> count(col(ONE))
        case (((_, c), _), i) => s"__tidier_mout_${i}__" -> c
      }
      val res = CalendarWindow.monthsAggGeneral(
          withRid.withColumn(ONE, lit(1)), byNames,
          index.get.cast(DateType), exprs2, before = b, after = a,
          complete = complete, beforeDays = bd, afterDays = ad,
          strict = frame.strict)
        .drop(ONE)
      exprs.map(_._1).zip(exprs2.map(_._1)).foldLeft(res) {
        case (d, (name, tmp)) => d.withColumn(name, col(tmp)).drop(tmp)
      }
    }
    if (restoreOrder) out = out.orderBy(col(RID)).drop(RID)
    out
  }

  /** Sub-day compound month frames (months + hours/seconds) — the
    * seconds-granularity sibling of [[monthsMutate]]'s general branch:
    * every expression rides [[CalendarWindow.monthsSecondsAgg]]'s
    * expansion join (timestamp boundaries are not day-partitionable, so
    * there is no prefix path to prefer). Same CountAll-marker,
    * temp-name-overwrite and restore-order contracts. */
  private def monthsSecondsMutate(df: DataFrame,
      exprs: Seq[(String, Column)], by: Seq[Column], frame: Frame,
      index: Column, complete: Boolean,
      restoreOrder: Boolean): DataFrame = {
    def monthSec(e: FrameEndpoint): (Int, Long) = e match {
      case FrameEndpoint.Months(x)           => (x.toInt, 0L)
      case FrameEndpoint.MonthsDays(m, d)    => (m.toInt, d * 86400L)
      case FrameEndpoint.MonthsSeconds(m, s) => (m.toInt, s)
      case _ => throw new IllegalArgumentException(
        "month frames cannot mix units: both endpoints must be " +
          "month-family Periods (Months / MonthsDays / MonthsSeconds)")
    }
    val (bm, bs) = monthSec(frame.before)
    val (am, asec) = monthSec(frame.after)
    val byNames = by.map(attrName(_, ".by"))
    val withRid =
      if (restoreOrder) df.withColumn(RID, monotonically_increasing_id())
      else df
    val ONE = "__tidier_one__"
    require(!df.columns.contains(ONE), s"column $ONE is reserved")
    val parsedAll = exprs.map { case (_, c) =>
      try Some(parseMonthsAgg(c)) catch {
        case _: UnsupportedOperationException => None
      }
    }
    val exprs2 = exprs.zip(parsedAll).zipWithIndex.map {
      case (((_, _), Some((CalendarWindow.MonthsOp.CountAll, _))), i) =>
        s"__tidier_mout_${i}__" -> count(col(ONE))
      case (((_, c), _), i) => s"__tidier_mout_${i}__" -> c
    }
    val res = CalendarWindow.monthsSecondsAgg(
        withRid.withColumn(ONE, lit(1)), byNames,
        index.cast(TimestampType), exprs2,
        beforeMonths = bm, beforeSecs = bs,
        afterMonths = am, afterSecs = asec,
        complete = complete, strict = frame.strict)
      .drop(ONE)
    var out = exprs.map(_._1).zip(exprs2.map(_._1)).foldLeft(res) {
      case (d, (name, tmp)) => d.withColumn(name, col(tmp)).drop(tmp)
    }
    if (restoreOrder) out = out.orderBy(col(RID)).drop(RID)
    out
  }

  private def attrName(c: Column, what: String): String =
    ColumnShim.attrNameOf(c).getOrElse(throw new IllegalArgumentException(
      s"month frames require plain column references in $what (got: $c)"))

  /** Recognize the aggregate family CalendarWindow can evaluate on the
    * O(n log n) prefix path: sum/count/avg/mean/min/max/stddev/variance
    * over one column, plus count(lit) = count(*). Anything else throws,
    * which [[monthsMutate]] catches to route the whole expression set
    * through [[CalendarWindow.monthsAggGeneral]] — the expansion join
    * that evaluates ANY Spark aggregate per window (the reference
    * evaluates any R function per slice, same O(n·w̄) cost model). */
  private def parseMonthsAgg(c: Column): (CalendarWindow.MonthsOp, String) = {
    import CalendarWindow.MonthsOp._
    ColumnShim.simpleAggCall(c) match {
      case Some((fn, false, args)) =>
        val op = fn match {
          case "sum"                            => Sum
          case "count"                          => Count
          case "avg" | "mean"                   => Avg
          case "min"                            => Min
          case "max"                            => Max
          case "stddev" | "stddev_samp" | "std" => Std
          case "variance" | "var_samp"          => Var
          // exact median rides the daily-partial expansion path (one
          // collect per day, window fan-out on days not raw rows) —
          // round-9: previously this dragged the WHOLE expr set through
          // monthsAggGeneral's raw-row expansion
          case "median"                         => Quantile(0.5)
          case other => throw new UnsupportedOperationException(
            s"month Period frames support sum/count/avg/min/max/" +
              s"stddev/variance/median (got: $other)")
        }
        (op, args) match {
          case (Count, Seq(None))    => (CountAll, "")
          case (_, Seq(Some(name))) => (op, name)
          case _ => throw new UnsupportedOperationException(
            s"month Period frames support $fn over a single column " +
              s"(got: $c)")
        }
      case _ => throw new UnsupportedOperationException(
        "month Period frames support sum/count/avg/min/max over a single " +
          s"column (got: $c)")
    }
  }

  implicit class TidierDF(val df: DataFrame) {

    /** Windowed mutate. Every expression in `exprs` must be an aggregate or
      * window-function `Column` when any of `by` / `orderBy` / `frame` is
      * given (the reference has the same contract: windowed expressions are
      * evaluated under `summarise`, one value per slice, R/mutate.R:208,586).
      * Same-name keys overwrite existing columns (`withColumn` semantics =
      * the reference's `remove_common_nested_columns` bugfix, NEWS.md:8).
      *
      * @param by       partition keys (`.by`, R/mutate.R:153-160)
      * @param orderBy  sort keys incl. `.desc` via `col.desc`
      *                 (`.order_by`/`.desc`, R/mutate.R:141-150)
      * @param frame    `c(before, after)` frame (`.frame`); None + orderBy
      *                 gives running (rows unbounded-preceding..current)
      *                 semantics, matching R cumulative fns after the
      *                 reference's pre-sort; None without orderBy gives
      *                 whole-group frames (dplyr grouped-mutate semantics)
      * @param index    `.index` column for range frames (R/mutate.R:55-56).
      *                 Range windows order on the index itself — the sane
      *                 resolution of the reference allowing `.order_by` ≠
      *                 `.index` (SURVEY.md §7.4 risk 2)
      * @param complete `.complete = TRUE` → incomplete (edge-truncated)
      *                 windows yield NULL instead of a partial aggregate
      *                 (R/mutate.R:58-62)
      * @param restoreOrder re-sort to the captured input row order before
      *                 returning, as the reference's `mutate_` does
      *                 (R/mutate.R:291). Default FALSE — deliberate deviation
      *                 from SURVEY §2.1's restore-by-default: a global sort
      *                 purely for cosmetic row order is a full extra shuffle
      *                 at 100 TB, Spark DataFrames carry no row-order
      *                 contract, and the NSE `mutate` branch of the reference
      *                 itself returns sorted order (R/mutate.R:561 dead
      *                 store). Opt in for strict `mutate_` fidelity.
      */
    def mutateW(exprs: (String, Column)*)(
        by: Seq[Column] = Nil,
        orderBy: Seq[Column] = Nil,
        frame: Option[Frame] = None,
        index: Option[Column] = None,
        complete: Boolean = false,
        restoreOrder: Boolean = false): DataFrame = {
      require(exprs.nonEmpty, "mutateW needs at least one name -> expr pair")

      val windowed = by.nonEmpty || orderBy.nonEmpty || frame.isDefined
      if (!windowed) {
        // Path 1: plain mutate (R/mutate.R:200,578).
        return df.withColumns(exprs.toMap)
      }

      // strict-lubridate NA mode is a month-frame-only semantic
      // (Frame.strict scaladoc) — reject it anywhere else rather than
      // silently ignoring the flag
      require(frame.forall(f => !f.strict || f.isMonths),
        "Frame.strict (lubridate month-end NA replay) is only " +
          "meaningful on month-family frames")

      // Months (Period) frames have per-row clamped widths no WindowSpec
      // can express — route to CalendarWindow (prefix sums + as-of
      // boundary lookups) instead of compiling a frame.
      if (frame.exists(_.isMonths))
        return monthsMutate(df, exprs, by, frame.get, index, complete,
          restoreOrder)

      val isRange = frame.exists(_.isRange)
      require(!isRange || index.isDefined,
        "a Days/Seconds (Period) frame requires an index column (.index)")

      // Frames without explicit ordering slide over the input row order,
      // like slider does (R/mutate.R:204-215) — capture it explicitly.
      val needRid = restoreOrder || (frame.isDefined && !isRange && orderBy.isEmpty)
      val withRid =
        if (needRid) df.withColumn(RID, monotonically_increasing_id()) else df

      // Range frames order on a numeric projection of the index at the
      // frame's granularity (DateType/TimestampType aren't valid
      // rangeBetween order types for long offsets). A frame must not mix
      // units — its two finite endpoints measure the same axis.
      val prepared = if (isRange) {
        // Rows is collected too (as a distinct unit) so a hand-built
        // Rows+Period mix is rejected like a Days+Seconds mix, instead
        // of the Rows endpoint being silently reinterpreted as a value
        // offset on the index axis (reference requires both endpoints
        // share one class, R/mutate.R:165)
        val units = Seq(frame.get.before, frame.get.after).collect {
          case _: FrameEndpoint.Days    => "days"
          case _: FrameEndpoint.Seconds => "seconds"
          case _: FrameEndpoint.Range   => "range"
          case _: FrameEndpoint.Rows    => "rows"
        }.distinct
        require(units.size == 1,
          s"range frame mixes units (${units.mkString(", ")}) — both " +
            "value endpoints must share one unit")
        val idxNum = units.head match {
          case "days" =>
            datediff(index.get.cast(DateType), to_date(lit("1970-01-01")))
          case "seconds" => index.get.cast(TimestampType).cast("long")
          // unitless: the numeric index IS the range axis, verbatim
          case _ => index.get
        }
        withRid.withColumn(IDX, idxNum)
      } else withRid

      val part: WindowSpec = Window.partitionBy(by: _*)

      def endpointLong(e: FrameEndpoint, isBefore: Boolean): Long = e match {
        case FrameEndpoint.Unbounded =>
          if (isBefore) Window.unboundedPreceding else Window.unboundedFollowing
        case FrameEndpoint.Rows(n)    => if (isBefore) -n else n
        case FrameEndpoint.Days(n)    => if (isBefore) -n else n
        case FrameEndpoint.Seconds(n) => if (isBefore) -n else n
        case FrameEndpoint.Range(n)   => if (isBefore) -n else n
        case FrameEndpoint.Months(_) | FrameEndpoint.MonthsDays(_, _) =>
          throw new IllegalStateException(
            "Months endpoints are routed to CalendarWindow before frame compile")
      }

      val spec: WindowSpec = frame match {
        case Some(f) if f.isRange =>
          part.orderBy(col(IDX))
            .rangeBetween(endpointLong(f.before, isBefore = true),
                          endpointLong(f.after, isBefore = false))
        case Some(f) =>
          val ordered =
            if (orderBy.nonEmpty) part.orderBy(orderBy: _*)
            else part.orderBy(col(RID))
          ordered.rowsBetween(endpointLong(f.before, isBefore = true),
                              endpointLong(f.after, isBefore = false))
        case None if orderBy.nonEmpty =>
          // Running semantics: R cumulative fns are row-positional, so rows
          // (not the SQL default RANGE, which merges order-key peers).
          part.orderBy(orderBy: _*)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        case None =>
          part // whole-group frame (dplyr grouped mutate of an aggregate)
      }

      // `.complete` gating (R/mutate.R:58-62 + slider .complete): NULL out
      // windows whose frame is truncated by the partition/index edge.
      val gate: Option[Column] = frame match {
        case Some(f) if complete && f.isFinite && !f.isRange =>
          val expected = (endpointLong(f.after, isBefore = false)
            - endpointLong(f.before, isBefore = true) + 1).max(0)
          Some(count(lit(1)).over(spec) === lit(expected))
        case Some(f) if complete && f.isFinite && f.isRange =>
          val lo = col(IDX) + lit(endpointLong(f.before, isBefore = true))
          val hi = col(IDX) + lit(endpointLong(f.after, isBefore = false))
          Some(lo >= min(col(IDX)).over(part) && hi <= max(col(IDX)).over(part))
        case _ => None
      }

      val outCols: Map[String, Column] = exprs.map { case (name, e) =>
        val c = e.over(spec)
        name -> gate.fold(c)(g => when(g, c))
      }.toMap

      var out = prepared.withColumns(outCols)
      if (isRange) out = out.drop(IDX)
      if (restoreOrder) out = out.orderBy(col(RID))
      if (needRid) out = out.drop(RID)
      out
    }

    /** SE (standard-eval) variant mirroring the reference's `mutate_`
      * exactly: string column keys, a recycled `.desc` flag vector
      * (length 1 or length of `orderBy`, R/mutate.R:148-150,177-179),
      * and restore-original-row-order semantics (R/mutate.R:291 — the
      * one behavioral difference from the NSE `mutate`, SURVEY.md §2.1).
      * R's `order()` places NA last for both directions, hence the
      * `_nulls_last` variants (SURVEY.md §2.2). */
    def mutateSE(exprs: (String, Column)*)(
        by: Seq[String] = Nil,
        orderBy: Seq[String] = Nil,
        desc: Seq[Boolean] = Seq(false),
        frame: Option[Frame] = None,
        index: Option[String] = None,
        complete: Boolean = false): DataFrame = {
      require(desc.length == 1 || desc.length == orderBy.length,
        s".desc must have length 1 or ${orderBy.length} (got ${desc.length})")
      val flags =
        if (desc.length == 1) Seq.fill(orderBy.length)(desc.head) else desc
      val ord = orderBy.zip(flags).map { case (k, d) =>
        if (d) col(k).desc_nulls_last else col(k).asc_nulls_last
      }
      df.mutateW(exprs: _*)(by = by.map(col), orderBy = ord, frame = frame,
        index = index.map(col), complete = complete, restoreOrder = true)
    }
  }
}
