package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Calendar-Period range frames — the reference's `.frame` accepts ANY
  * lubridate Period, including `months(k)` (R/mutate.R:164-165 checks
  * only "numeric or Period"), and the two endpoints are independent:
  * `c(months(2), months(-1))` is the month-granular analogue of the
  * documented `c(days(7), days(-1))` example (R/mutate.R:98-100) — the
  * window `[add_months(d, -2), add_months(d, -1)]`, excluding the
  * current month. Month windows have per-row widths (`add_months`
  * clamps at month ends), which a constant-offset `rangeBetween` frame
  * cannot express.
  *
  * COMPATIBILITY NOTE (deliberate semantic delta from the reference):
  * boundaries use `add_months`' month-end CLAMPING (Mar 31 − 1 month =
  * Feb 28), the standard SQL-engine semantics (DuckDB INTERVAL
  * arithmetic clamps identically). lubridate Period arithmetic yields
  * NA for nonexistent dates (`ymd("2023-03-31") - months(1)` is NA), so
  * a literal slider replay can differ on rows landing on clamped
  * month-ends. See SURVEY.md §2.3's compatibility note.
  *
  * The naive rendering — a range self-join collecting every (row,
  * in-window row) pair — re-materializes each window like the
  * reference's slider does: O(n·w) pairs, quadratic on dense groups.
  * This operator keeps the sort-based cost model instead, composing two
  * primitives this library already ships:
  *
  *   1. collapse to per-(group, day) partials and PREFIX-SUM them
  *      (one window sweep — running sum/count per group);
  *   2. as-of join each row's boundaries into that cumulative series:
  *      STRICT backward at `lo = add_months(day, -before)` (last prefix
  *      strictly before the window start) and INCLUSIVE backward at
  *      `hi = add_months(day, after)` (last prefix at-or-before the
  *      window end — the identity lookup when `after == 0`);
  *   3. window aggregate = prefix(hi) − prefix(lo⁻) — inclusive of both
  *      endpoints, like SQL BETWEEN and slider's closed interval.
  *
  * Cost: two hash shuffles on the group keys (prefix window + as-of
  * sweeps) over |distinct (group, day)| rows, then one join back —
  * O(n log n), no pair blowup, same shape at any window width.
  *
  * Min/max are not prefix-decomposable, so [[MonthsOp.Min]]/[[MonthsOp.Max]]
  * take the second-best distributed shape: daily partial min/max
  * (|distinct (group, day)| rows, NOT raw rows) binned-interval-joined to
  * each window's day span and re-aggregated — expansion factor is the
  * window width in DAYS per distinct day, independent of row density, and
  * the join is an equi hash join on (group, bin), never a nested loop.
  */
object CalendarWindow {

  /** Window aggregate kind for [[monthsAgg]]. Sum/Count/CountAll/Avg/
    * Var/Std ride the O(n log n) prefix-difference path (Var/Std via an
    * extra sum-of-squares prefix); Min/Max the daily-partial
    * interval-expansion path. */
  sealed trait MonthsOp
  object MonthsOp {
    /** `sum(value)` over the month window. */
    case object Sum extends MonthsOp
    /** `count(value)` (non-null values) over the month window. */
    case object Count extends MonthsOp
    /** `count(*)` (all rows) over the month window; `valueCol` ignored. */
    case object CountAll extends MonthsOp
    /** `avg(value)` over the month window. */
    case object Avg extends MonthsOp
    /** `min(value)` over the month window (expansion path). */
    case object Min extends MonthsOp
    /** `max(value)` over the month window (expansion path). */
    case object Max extends MonthsOp
    /** `var_samp(value)` over the month window — prefix-decomposable via
      * a sum-of-squares running column: var = (Σx² − (Σx)²/n)/(n−1),
      * clamped at 0 against floating cancellation; NULL for n ≤ 1
      * (SQL var_samp semantics). */
    case object Var extends MonthsOp
    /** `stddev_samp(value)` over the month window — `sqrt` of [[Var]]. */
    case object Std extends MonthsOp
    /** EXACT `percentile(value, p)` over the month window (`median` =
      * `Quantile(0.5)`). Not prefix-decomposable, but MERGEABLE from
      * day partials, so it rides the [[Min]]/[[Max]] daily-partial
      * expansion path instead of [[monthsAggGeneral]]'s raw-row
      * expansion: per-(group, day) value lists are collected once
      * (shuffling n rows once), the binned interval join fans out on
      * DISTINCT DAYS — window width in days per window, independent of
      * row density — and each window sorts its own merged list. Same
      * linear interpolation as Spark's `Percentile`, replayed with the
      * SAME 0-based position (`pos = (n−1)·p`; `lo·(hi−pos) +
      * hi·(pos−lo)`, lower==higher short-circuit), so results are
      * bit-identical to `expr("percentile(v, p)")` — a 1-based
      * `1 + (n−1)p` variant ulp-shifts the weights for non-dyadic p
      * (r9 review, verified empirically). */
    final case class Quantile(p: Double) extends MonthsOp {
      require(p >= 0 && p <= 1, s"percentile p must be in [0,1] (got $p)")
    }
  }

  /** One output column of [[monthsAgg]]: `out` = `op(valueCol)` over each
    * row's month window. */
  final case class MonthsAggSpec(out: String, op: MonthsOp, valueCol: String)

  private val DAY = "__cw_day__"
  private val LO = "__cw_lo__"
  private val HI = "__cw_hi__"
  private val GMIN = "__cw_gmin__"
  private val GMAX = "__cw_gmax__"

  /** Trailing-months window aggregates of `valueCol` over
    * `[add_months(index, -months), index]` per `by` group, appended as
    * `<out>_sum`, `<out>_cnt`, `<out>_avg` (null-safe: days without
    * values contribute nothing; an all-null window yields NULL sum/avg
    * and 0 cnt, matching SQL aggregate semantics). `index` must be a
    * DateType column expression. The `after == 0` special case of
    * [[monthsAgg]]. */
  def trailingMonths(df: DataFrame, by: Seq[String], index: Column,
      valueCol: String, months: Int, out: String = "win"): DataFrame = {
    require(months >= 0, "months must be >= 0")
    import MonthsOp._
    monthsAgg(df, by, index, Seq(
      MonthsAggSpec(s"${out}_sum", Sum, valueCol),
      MonthsAggSpec(s"${out}_cnt", Count, valueCol),
      MonthsAggSpec(s"${out}_avg", Avg, valueCol)),
      before = months, after = 0)
  }

  /** General calendar-month Period frame: for every input row, aggregate
    * `spec.valueCol` over the rows of the same `by` group whose `index`
    * day falls in `[add_months(day, -before), add_months(day, after)]`
    * (inclusive both ends — slider's closed interval). Negative `after`
    * shifts the window entirely before the current row
    * (`before = 2, after = -1` = the reference's `c(months(2),
    * months(-1))`); negative `before` shifts it after. Appends one
    * column per spec; empty windows yield NULL (count ops yield 0).
    *
    * @param complete `.complete = TRUE` gating (R/mutate.R:58-62): a
    *   window is complete iff its VALUE span `[lo, hi]` lies inside the
    *   group's observed index span — edge-truncated windows yield NULL
    *   for every spec (the same contract as the range branch of
    *   [[TidierOps]]'s gate, oracle-pinned by `window_complete_range`).
    * @param beforeDays extra day component of the before endpoint
    *   (compound lubridate Period `months(before) + days(beforeDays)`,
    *   R/mutate.R:164-165): lo = `date_add(add_months(d, -before),
    *   -beforeDays)`. 0 = pure month frame.
    * @param afterDays extra day component of the after endpoint:
    *   hi = `date_add(add_months(d, after), afterDays)`.
    */
  def monthsAgg(df: DataFrame, by: Seq[String], index: Column,
      specs: Seq[MonthsAggSpec], before: Int, after: Int,
      complete: Boolean = false,
      beforeDays: Int = 0, afterDays: Int = 0,
      strict: Boolean = false): DataFrame = {
    import MonthsOp._
    require(specs.nonEmpty, "monthsAgg needs at least one spec")
    // statically-nonempty check: hi − lo spans (before+after) months of
    // 28..31 days each plus (beforeDays+afterDays) days; reject only
    // frames empty for EVERY date (max month span: 31 d/mo when the
    // month total is positive, 28 when negative). Reduces to the exact
    // `-before <= after` for pure month frames. Per-row empty windows
    // just yield NULL, same as any other empty window.
    val monthsSpan = before.toLong + after
    require((if (monthsSpan >= 0) monthsSpan * 31 else monthsSpan * 28) +
        beforeDays + afterDays >= 0,
      s"empty month frame: [d - (${before}mo ${beforeDays}d), " +
        s"d + (${after}mo ${afterDays}d)] starts after it ends")
    val outs = specs.map(_.out)
    require(outs.distinct.size == outs.size,
      s"duplicate output names: ${outs.diff(outs.distinct).mkString(", ")}")
    // same contract as AsofJoin: colliding output names would survive as
    // duplicate columns and make every downstream select ambiguous
    val bad = (outs.toSet + DAY).intersect(df.columns.toSet)
    require(bad.isEmpty,
      s"output columns ${bad.mkString(", ")} already exist on the " +
        "input — pass different `out` names")

    val byCols = by.map(col)
    val keyed = df.withColumn(DAY, index)

    // compound-Period boundary algebra: lubridate's `d - (months(m) +
    // days(k))` composes as `date_add(add_months(d, -m), -k)` (pure month
    // frames keep the bare add_months, preserving their existing plans)
    def loOf(d: Column): Column = {
      val m = add_months(d, -before)
      if (beforeDays == 0) m else date_add(m, -beforeDays)
    }
    def hiOf(d: Column): Column = {
      val m = add_months(d, after)
      if (afterDays == 0) m else date_add(m, afterDays)
    }
    // hi == day (the identity lookup, no second as-of sweep) only when
    // the after endpoint is exactly zero in BOTH units
    val afterZero = after == 0 && afterDays == 0

    // ---- 1. per-(group, day) partials for EVERY spec, one groupBy ----
    val prefixCols = specs.collect {
      case MonthsAggSpec(_, Sum | Count | Avg | Var | Std, v) => v }.distinct
    val sqCols =
      specs.collect { case MonthsAggSpec(_, Var | Std, v) => v }.distinct
    val needAll = specs.exists(_.op == CountAll)
    val minCols = specs.collect { case MonthsAggSpec(_, Min, v) => v }.distinct
    val maxCols = specs.collect { case MonthsAggSpec(_, Max, v) => v }.distinct
    val quantCols = specs.collect {
      case MonthsAggSpec(_, Quantile(_), v) => v }.distinct
    val partials: Seq[Column] =
      prefixCols.flatMap(v => Seq(sum(col(v)).as(s"__s_$v"),
        count(col(v)).as(s"__c_$v"))) ++
      sqCols.map(v =>
        sum(col(v).cast("double") * col(v).cast("double")).as(s"__q_$v")) ++
      (if (needAll) Seq(count(lit(1)).as("__call")) else Nil) ++
      minCols.map(v => min(col(v)).as(s"__mn_$v")) ++
      maxCols.map(v => max(col(v)).as(s"__mx_$v")) ++
      // day value lists stay UNSORTED here — one array_sort per WINDOW
      // after the merge beats |days| partial sorts that the merge
      // cannot exploit anyway (collect_list skips NULLs, like
      // percentile)
      quantCols.map(v => collect_list(col(v).cast("double"))
        .as(s"__ql_$v"))
    val daily = keyed.groupBy((byCols :+ col(DAY)): _*)
      .agg(partials.head, partials.tail: _*)

    // every distinct (group, day) with its window's value bounds
    val bounds = daily.select((byCols :+ col(DAY)): _*)
      .withColumn(LO, loOf(col(DAY)))
      .withColumn(HI, hiOf(col(DAY)))

    // ---- 2a. prefix path: running sums + boundary as-ofs ----
    val runCols = prefixCols.flatMap(v => Seq(s"__s_$v" -> s"__cs_$v",
      s"__c_$v" -> s"__cc_$v")) ++
      sqCols.map(v => s"__q_$v" -> s"__cq_$v") ++
      (if (needAll) Seq("__call" -> "__ccall") else Nil)
    val win0: DataFrame = if (runCols.nonEmpty) {
      val pw = Window.partitionBy(byCols: _*).orderBy(col(DAY))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      var cum = daily
      for ((src, dst) <- runCols) cum = cum.withColumn(dst, sum(col(src)).over(pw))
      cum = cum.select((byCols ++ (col(DAY) +: runCols.map(p => col(p._2)))): _*)

      // The as-of LEFT frame is cum itself with bounds attached — so the
      // after == 0 case (hi == day) keeps its OWN prefix as the hi lookup
      // with no extra join; the general case drops the raw prefixes and
      // sweeps both boundaries.
      val withBounds = cum
        .withColumn(LO, loOf(col(DAY)))
        .withColumn(HI, hiOf(col(DAY)))
      val left0 =
        if (afterZero)
          runCols.foldLeft(withBounds) { case (d, (_, c)) =>
            d.withColumnRenamed(c, s"__hi$c") }
        else withBounds.drop(runCols.map(_._2): _*)
      // strict backward as-of at lo: last prefix STRICTLY BEFORE the start
      val loRight = runCols.foldLeft(cum.withColumnRenamed(DAY, "__rt")) {
        case (d, (_, c)) => d.withColumnRenamed(c, s"__lo$c")
      }
      val withLo = AsofJoin.asofBackward(left0, loRight, keys = by,
        leftTime = LO, rightTime = "__rt",
        valueCols = runCols.map(p => s"__lo${p._2}"), strict = true,
        matchedTimeCol = "__cw_mtlo__").drop("__cw_mtlo__")
      // inclusive backward as-of at hi: last prefix AT-OR-BEFORE the end
      // (skipped when the after endpoint is zero — carried on left0 above)
      if (afterZero) withLo
      else {
        val hiRight = runCols.foldLeft(cum.withColumnRenamed(DAY, "__rt")) {
          case (d, (_, c)) => d.withColumnRenamed(c, s"__hi$c")
        }
        AsofJoin.asofBackward(withLo, hiRight, keys = by,
          leftTime = HI, rightTime = "__rt",
          valueCols = runCols.map(p => s"__hi${p._2}"), strict = false,
          matchedTimeCol = "__cw_mthi__").drop("__cw_mthi__")
      }
    } else bounds

    // Grouped quantiles ride the per-group two-pointer SWEEP (round-9:
    // the binned expansion join was measured cost-neutral vs
    // monthsAggGeneral at sf1 — at ~2.5 rows per (group, day) the
    // day-collapse shrank the join fan-out only 1.3×, and shuffling
    // per-day ARRAYS through a join + re-collect cost that back). The
    // sweep shuffles the day partials ONCE (hash on the group keys, no
    // fan-out), then each group merges its own overlapping windows
    // locally. Global quantiles (by = Nil) keep the expansion join —
    // one group would serialize the sweep, while the global day domain
    // is calendar-bounded so the join stays small.
    val sweepQuant = quantCols.nonEmpty && by.nonEmpty

    // ---- 2b. expansion path: daily min/max/value-list partials ×
    // window day spans ----
    val win1: DataFrame = if (minCols.nonEmpty || maxCols.nonEmpty ||
        (quantCols.nonEmpty && !sweepQuant)) {
      val expQuantCols = if (sweepQuant) Nil else quantCols
      val epoch = to_date(lit("1970-01-01"))
      val mmDaily = daily.select((byCols ++ (col(DAY) +:
        (minCols.map(v => col(s"__mn_$v")) ++
         maxCols.map(v => col(s"__mx_$v")) ++
         expQuantCols.map(v => col(s"__ql_$v"))))): _*)
        .withColumn("__pd", datediff(col(DAY), epoch))
      val spans = bounds
        .withColumn("__lod", datediff(col(LO), epoch))
        .withColumn("__hid", datediff(col(HI), epoch))
        .withColumnRenamed(DAY, "__wday")
        .drop(LO, HI)
      // binned interval join (RangeJoin's shape, inlined for NULL-SAFE
      // group keys — a plain using-join would drop NULL-key groups that
      // groupBy/Window upstream treat as real): explode each window to
      // its bins, equi-join on (group <=>, bin), exact recheck.
      val width =
        math.max(1L, (before + after) * 31L + beforeDays + afterDays + 1L)
      val BIN = "__cw_bin__"
      val p = mmDaily.withColumn(BIN, floor(col("__pd") / width))
      val iPre = spans.withColumn(BIN, explode(sequence(
        floor(col("__lod") / width), floor(col("__hid") / width))))
      val iCols = by.map(c => s"__cw_i_$c")
      val i = iPre.toDF(iPre.columns.map(c =>
        if (by.contains(c)) s"__cw_i_$c" else c): _*)
      val cond = by.zip(iCols).map { case (l, r) => col(l) <=> col(r) }
        .foldLeft(p(BIN) === i(BIN))(_ && _)
      val joined = p.join(i, cond)
        .filter(col("__pd") >= col("__lod") && col("__pd") <= col("__hid"))
      val mmAggs = minCols.map(v => min(col(s"__mn_$v")).as(s"__wmn_$v")) ++
        maxCols.map(v => max(col(s"__mx_$v")).as(s"__wmx_$v")) ++
        expQuantCols.map(v => collect_list(col(s"__ql_$v")).as(s"__wql_$v"))
      val agged = joined.groupBy((iCols.map(col) :+ col("__wday")): _*)
        .agg(mmAggs.head, mmAggs.tail: _*)
      // ONE sort per window over the merged day lists — the whole
      // window's multiset, exactly what Percentile's buffer would hold
      expQuantCols.foldLeft(agged) { (d, v) =>
          d.withColumn(s"__wql_$v", array_sort(flatten(col(s"__wql_$v"))))
        }
        .withColumnRenamed("__wday", DAY)
        .toDF // (group renamed __cw_i_*, DAY, window min/max/list cols)
    } else null

    // ---- 2c. grouped-quantile sweep ----
    val quantSpecs = specs.collect {
      case s @ MonthsAggSpec(_, Quantile(_), _) => s }
    val win2: DataFrame =
      if (sweepQuant) quantileSweep(daily, by, quantSpecs, loOf, hiOf)
      else null

    // ---- 3. assemble per-(group, day) window values ----
    var win = win0
    if (win1 != null) {
      // left join: windows whose day span contains no data get NULL min/max
      val r = win1.withColumnRenamed(DAY, "__cw_d1__")
      val cond = by.map(c => win(c) <=> r(s"__cw_i_$c"))
        .foldLeft(win(DAY) <=> r("__cw_d1__"))(_ && _)
      win = win.join(r, cond, "left")
        .drop("__cw_d1__").drop(by.map(c => s"__cw_i_$c"): _*)
    }
    if (win2 != null) {
      // same left-join contract as win1: swept windows carry values,
      // empty/NULL-day windows get NULL quantiles
      val r = by.foldLeft(win2.withColumnRenamed(DAY, "__cw_d2__")) {
        (d, c) => d.withColumnRenamed(c, s"__cw_q_$c") }
      val cond = by.map(c => win(c) <=> r(s"__cw_q_$c"))
        .foldLeft(win(DAY) <=> r("__cw_d2__"))(_ && _)
      win = win.join(r, cond, "left")
        .drop("__cw_d2__").drop(by.map(c => s"__cw_q_$c"): _*)
    }

    // `.complete` gate: window value-span inside the group's index span —
    // computed as a whole-partition window over the per-(group, day) frame
    // itself (G×D tiny rows), no extra aggregate or join
    val gate: Option[Column] = if (complete) {
      val spanW = Window.partitionBy(byCols: _*)
      win = win.withColumn(GMIN, min(col(DAY)).over(spanW))
        .withColumn(GMAX, max(col(DAY)).over(spanW))
      Some(col(LO) >= col(GMIN) && col(HI) <= col(GMAX))
    } else None

    val outCols: Seq[Column] = specs.map { sp =>
      val c = sp.op match {
        case Sum =>
          val cnt = col(s"__hi__cc_${sp.valueCol}") -
            coalesce(col(s"__lo__cc_${sp.valueCol}"), lit(0L))
          val sumT = daily.schema(s"__s_${sp.valueCol}").dataType
          when(cnt > 0, coalesce(col(s"__hi__cs_${sp.valueCol}"),
            lit(0).cast(sumT)) -
            coalesce(col(s"__lo__cs_${sp.valueCol}"), lit(0).cast(sumT)))
        case Count =>
          coalesce(col(s"__hi__cc_${sp.valueCol}"), lit(0L)) -
            coalesce(col(s"__lo__cc_${sp.valueCol}"), lit(0L))
        case CountAll =>
          coalesce(col("__hi__ccall"), lit(0L)) -
            coalesce(col("__lo__ccall"), lit(0L))
        case Avg =>
          val cnt = coalesce(col(s"__hi__cc_${sp.valueCol}"), lit(0L)) -
            coalesce(col(s"__lo__cc_${sp.valueCol}"), lit(0L))
          val sumT = daily.schema(s"__s_${sp.valueCol}").dataType
          val raw = coalesce(col(s"__hi__cs_${sp.valueCol}"),
            lit(0).cast(sumT)) -
            coalesce(col(s"__lo__cs_${sp.valueCol}"), lit(0).cast(sumT))
          when(cnt > 0, raw.cast("double") / cnt)
        case Min => col(s"__wmn_${sp.valueCol}")
        case Max => col(s"__wmx_${sp.valueCol}")
        case Quantile(_) if sweepQuant => col(s"__wq_${sp.out}")
        case Quantile(p) =>
          // global (by = Nil) expansion form — Spark Percentile's own
          // interpolation, replayed on the sorted merged list with the
          // SAME 0-based position: pos = (n−1)·p, lower==higher
          // short-circuits, else a[lo]·(hi−pos) + a[hi]·(pos−lo).
          // (The earlier 1-based 1+(n−1)p form shifted the weights by
          // an ulp for non-dyadic p — round-9 review finding, ~22% of
          // random (array, p) cases bitwise-diverged from Percentile.)
          val arr = col(s"__wql_${sp.valueCol}")
          val n = size(arr)
          val pos = (n.cast("double") - lit(1.0)) * lit(p)
          val lo = floor(pos)
          val hi = ceil(pos)
          val loV = element_at(arr, lo.cast("int") + lit(1))
          val hiV = element_at(arr, hi.cast("int") + lit(1))
          when(arr.isNotNull && n > 0,
            when(lo === hi, loV)
              .otherwise(loV * (hi - pos) + hiV * (pos - lo)))
        case Var | Std =>
          // var_samp = (Σx² − (Σx)²/n) / (n−1): three prefix differences,
          // clamped at 0 against floating cancellation; NULL for n ≤ 1
          val v = sp.valueCol
          val n = coalesce(col(s"__hi__cc_$v"), lit(0L)) -
            coalesce(col(s"__lo__cc_$v"), lit(0L))
          val sumT = daily.schema(s"__s_$v").dataType
          val s1 = (coalesce(col(s"__hi__cs_$v"), lit(0).cast(sumT)) -
            coalesce(col(s"__lo__cs_$v"), lit(0).cast(sumT))).cast("double")
          val s2 = coalesce(col(s"__hi__cq_$v"), lit(0d)) -
            coalesce(col(s"__lo__cq_$v"), lit(0d))
          val variance =
            when(n > 1, greatest((s2 - s1 * s1 / n) / (n - lit(1)), lit(0d)))
          if (sp.op == Var) variance else sqrt(variance)
      }
      val gated = gate.fold(c)(g => when(g, c))
      // strict-lubridate mode: a clamped month-end boundary is a
      // lubridate NA date -> the row's window is undefined -> NULL for
      // EVERY output (counts included). when(!na, x) also nulls
      // NULL-index rows (NA date arithmetic), matching the reference.
      strictNaCond(strict, col(DAY), before, after)
        .fold(gated)(na => when(!na, gated)).as(sp.out)
    }
    val winVals = win.select((byCols ++ (col(DAY) +: outCols)): _*)

    // NULL-SAFE join-back: Window/groupBy upstream treat a NULL group or
    // NULL index day as real groups, and a null-unsafe equi-join would
    // silently DROP those rows from the output (GlobalWindow.sweepAndJoin
    // uses <=> for the same reason).
    joinNullSafe(keyed, winVals, by :+ DAY, "__cw_r_").drop(DAY)
  }

  /** Grouped exact-quantile sweep (round-9, the `window_range_months_
    * median` scale fix): one hash repartition of the per-(group, day)
    * value lists on the GROUP keys (no fan-out, no array re-shuffle),
    * then each group computes every window locally — a two-pointer
    * walk over its day-sorted partials (both `add_months` boundaries
    * are monotone in the day, so the window edges only advance), one
    * merge + sort + interpolation per window. Work is O(Σ_g D_g · w̄
    * log w̄) — the same exact-quantile cost every other form pays — but
    * with ZERO join fan-out; state per group is its distinct-day
    * partial list, calendar-bounded (a group's days, not its rows).
    * The interpolation replays Spark `Percentile`'s IEEE expression
    * (0-based pos = (n−1)·p; lo·(hi−pos) + hi·(pos−lo)) bit-for-bit.
    *
    * Emits one row per input (group, day): group cols (original
    * names), [[DAY]], and `__wq_<spec.out>` doubles. NULL-day partials
    * are excluded (a NULL index joins no window; the caller's
    * left-join keeps those rows with NULL outputs). */
  private def quantileSweep(daily: DataFrame, by: Seq[String],
      quantSpecs: Seq[MonthsAggSpec],
      loOf: Column => Column, hiOf: Column => Column): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
    val byCols = by.map(col)
    val qCols = quantSpecs.map(_.valueCol).distinct
    val epoch = to_date(lit("1970-01-01"))
    val qin = daily.filter(col(DAY).isNotNull)
      .select((byCols ++ Seq(col(DAY),
        datediff(col(DAY), epoch).as("__dd"),
        datediff(loOf(col(DAY)), epoch).as("__lod"),
        datediff(hiOf(col(DAY)), epoch).as("__hid")) ++
        qCols.map(v => col(s"__ql_$v"))): _*)
    val inSchema = qin.schema
    val nBy = by.size
    val dayIdx = nBy
    val colIdx = qCols.zipWithIndex.map { case (v, i) => v -> (nBy + 4 + i) }
      .toMap
    // spec → (source-array index, p), resolved once
    val quantCols = quantSpecs.map(sp => colIdx(sp.valueCol)).distinct
    val specPlan = quantSpecs.map(sp => (colIdx(sp.valueCol),
      sp.op.asInstanceOf[MonthsOp.Quantile].p))
    val outSchema = StructType(
      inSchema.fields.take(nBy + 1) ++
        quantSpecs.map(sp => StructField(s"__wq_${sp.out}", DoubleType)))
    val enc = Encoders.row(outSchema)

    qin.repartition(byCols: _*)
      .sortWithinPartitions((byCols :+ col(DAY)): _*)
      .mapPartitions { it =>
        // one GROUP buffered at a time (groups are contiguous after the
        // repartition + sort); each entry = (day value, dd, lod, hid,
        // per-col value arrays)
        final case class Entry(day: Any, dd: Int, lod: Int, hid: Int,
          vals: Array[Array[Double]])
        val buf = scala.collection.mutable.ArrayBuffer.empty[Entry]
        var curKey: Seq[Any] = null
        // group-boundary comparison needs VALUE equality matching the
        // repartition's grouping semantics: BinaryType surfaces as
        // Array[Byte] (reference ==), ±0.0 boxed doubles/floats are
        // equals-distinct though Spark groups them together, and both
        // can nest inside array/struct keys — so canonicalize
        // RECURSIVELY (round-9 review findings). NaN stays NaN
        // (boxed equals(NaN, NaN) is true, matching groupBy). Output
        // rows keep the ORIGINAL values (curKey).
        var curKeyCmp: Seq[Any] = null
        // NOTE NaN: Scala Seq == routes boxed numerics through
        // cooperative numeric equality, so NaN != NaN (unlike
        // java.lang.Double.equals) — map every NaN to one token, as
        // Spark's groupBy normalization does (r9 review, verified).
        def canon(v: Any): Any = v match {
          case b: Array[Byte] => b.toSeq
          case d: java.lang.Double =>
            if (d.isNaN) " NaN" else if (d.doubleValue == 0.0) 0.0 else d
          case f: java.lang.Float =>
            if (f.isNaN) " NaN" else if (f.floatValue == 0.0f) 0.0f else f
          case s: Seq[_] => s.map(canon)
          case r: Row => r.toSeq.map(canon)
          case other => other
        }
        def cmpForm(k: Seq[Any]): Seq[Any] = k.map(canon)

        def interpolate(a: Array[Double], p: Double): Any =
          if (a.isEmpty) null
          else {
            // Spark Percentile's 0-based formula, op for op (the
            // 1-based variant ulp-diverged on non-dyadic p — r9 review)
            val pos = (a.length - 1).toDouble * p
            val lo = math.floor(pos)
            val hi = math.ceil(pos)
            if (lo == hi) a(lo.toInt)
            else a(lo.toInt) * (hi - pos) + a(hi.toInt) * (pos - lo)
          }

        def flush(): Iterator[Row] = {
          if (buf.isEmpty) return Iterator.empty
          val entries = buf.toArray
          buf.clear()
          val key = curKey
          var loIdx = 0
          var hiIdx = -1
          entries.iterator.map { e =>
            // both boundaries are monotone non-decreasing in the day,
            // so the pointers only ever advance
            while (loIdx < entries.length && entries(loIdx).dd < e.lod)
              loIdx += 1
            if (hiIdx < loIdx - 1) hiIdx = loIdx - 1
            while (hiIdx + 1 < entries.length &&
                entries(hiIdx + 1).dd <= e.hid)
              hiIdx += 1
            // merge + sort ONCE per distinct value column, then
            // interpolate every requested p from the shared sorted
            // array (a p25/p50/p75 trio over one column was paying the
            // dominant O(w̄ log w̄) cost per spec — r9 review finding)
            val sortedByCol = quantCols.map { ci =>
              val vi = ci - (nBy + 4)
              var n = 0
              var j = loIdx
              while (j <= hiIdx) { n += entries(j).vals(vi).length; j += 1 }
              val merged = new Array[Double](n)
              var o = 0
              j = loIdx
              while (j <= hiIdx) {
                val a = entries(j).vals(vi)
                System.arraycopy(a, 0, merged, o, a.length)
                o += a.length
                j += 1
              }
              java.util.Arrays.sort(merged)
              ci -> merged
            }.toMap
            val outs = specPlan.map { case (ci, p) =>
              interpolate(sortedByCol(ci), p)
            }
            Row.fromSeq(key ++ Seq(e.day) ++ outs)
          }
        }

        new Iterator[Row] {
          private var pending: Iterator[Row] = Iterator.empty
          def hasNext: Boolean = {
            while (!pending.hasNext && (it.hasNext || buf.nonEmpty)) {
              if (!it.hasNext) pending = flush()
              else {
                val r = it.next()
                val key = (0 until nBy).map(r.get)
                val keyCmp = cmpForm(key)
                if (curKeyCmp != null && keyCmp != curKeyCmp)
                  pending = flush()
                curKey = key
                curKeyCmp = keyCmp
                buf += Entry(r.get(dayIdx), r.getInt(nBy + 1),
                  r.getInt(nBy + 2), r.getInt(nBy + 3),
                  qCols.indices.map { i =>
                    val s = r.getSeq[Double](nBy + 4 + i)
                    if (s == null) Array.empty[Double] else s.toArray
                  }.toArray)
              }
            }
            pending.hasNext
          }
          def next(): Row = pending.next()
        }
      }(enc)
      .toDF()
  }

  /** GENERAL month-frame aggregates — ANY Spark aggregate expression per
    * window, the full analogue of the reference evaluating an arbitrary
    * R function per slice (R/mutate.R:208,586). Not prefix-decomposable
    * (medians, percentiles, collect-based aggregates), so this rides the
    * honest expansion cost model: every window's day span is binned and
    * equi-joined (group <=>, bin) to the RAW rows — O(n·w̄) joined rows,
    * the same work the reference's slider does, but distributed as a
    * hash join + hash aggregation instead of a per-row interpreted loop.
    * [[TidierOps.mutateW]] routes month frames here automatically when
    * any expression falls outside [[monthsAgg]]'s prefix family.
    *
    * Aggregates are evaluated over the raw input columns of the joined
    * rows; empty windows contribute LEFT-JOIN null rows, so null-skipping
    * SQL aggregates yield NULL/0 correctly. `count(*)`-style row counts
    * must count a raw-side column (e.g. the marker the TidierOps routing
    * substitutes) — a bare `count(1)` would count the join's padding
    * rows. */
  def monthsAggGeneral(df: DataFrame, by: Seq[String], index: Column,
      exprs: Seq[(String, Column)], before: Int, after: Int,
      complete: Boolean = false,
      beforeDays: Int = 0, afterDays: Int = 0,
      strict: Boolean = false): DataFrame = {
    require(exprs.nonEmpty, "monthsAggGeneral needs at least one expr")
    val outs = exprs.map(_._1)
    require(outs.distinct.size == outs.size,
      s"duplicate output names: ${outs.diff(outs.distinct).mkString(", ")}")
    val bad = (outs.toSet + DAY).intersect(df.columns.toSet)
    require(bad.isEmpty,
      s"output columns ${bad.mkString(", ")} already exist on the " +
        "input — pass different `out` names")
    def loOf(d: Column): Column = {
      val m = add_months(d, -before)
      if (beforeDays == 0) m else date_add(m, -beforeDays)
    }
    def hiOf(d: Column): Column = {
      val m = add_months(d, after)
      if (afterDays == 0) m else date_add(m, afterDays)
    }
    val byCols = by.map(col)
    val keyed = df.withColumn(DAY, index)
    val epoch = to_date(lit("1970-01-01"))

    // distinct windows with binned day spans (RangeJoin's shape, inlined
    // for NULL-SAFE group keys, same as the min/max branch of monthsAgg)
    val width = math.max(1L,
      (math.abs(before) + math.abs(after)) * 31L +
        math.abs(beforeDays) + math.abs(afterDays) + 1L)
    val BIN = "__cw_bin__"
    val spans = keyed.select((byCols :+ col(DAY)): _*).distinct()
      .withColumn("__lod", datediff(loOf(col(DAY)), epoch))
      .withColumn("__hid", datediff(hiOf(col(DAY)), epoch))
      .withColumnRenamed(DAY, "__wday")
    val iCols = by.map(c => s"__cw_i_$c")
    // NULL index days produce NULL spans — keep ONE padding bin so the
    // window row survives (left-join padding → NULL outputs, and the
    // join-back keeps the input row) instead of silently dropping it
    val iPre = spans.withColumn(BIN, explode(coalesce(sequence(
      least(floor(col("__lod") / width), floor(col("__hid") / width)),
      floor(col("__hid") / width)), array(lit(0L)))))
    val i = iPre.toDF(iPre.columns.map(c =>
      if (by.contains(c)) s"__cw_i_$c" else c): _*)
    val raw = keyed.withColumn("__pd", datediff(col(DAY), epoch))
      .withColumn(BIN, floor(col("__pd") / width))
      .drop(DAY)
    // LEFT join from windows: empty windows keep their padding rows so
    // the aggregate result is NULL/0, not a silently missing window. The
    // range recheck lives in the JOIN CONDITION to preserve left rows.
    val cond = by.zip(iCols).map { case (l, r) => col(l) <=> col(r) }
      .foldLeft(i(BIN) === raw(BIN) &&
        col("__pd") >= col("__lod") && col("__pd") <= col("__hid"))(_ && _)
    val joined = i.join(raw, cond, "left")
    val aggs = exprs.map { case (n, e) => e.as(n) }
    var win = joined.groupBy((iCols.map(col) :+ col("__wday")): _*)
      .agg(aggs.head, aggs.tail: _*)

    val gate: Option[Column] = if (complete) {
      val spanW = Window.partitionBy(iCols.map(col): _*)
      win = win.withColumn(GMIN, min(col("__wday")).over(spanW))
        .withColumn(GMAX, max(col("__wday")).over(spanW))
      Some(loOf(col("__wday")) >= col(GMIN) &&
        hiOf(col("__wday")) <= col(GMAX))
    } else None
    val outCols = exprs.map { case (n, _) =>
      val gated = gate.fold(col(n))(g => when(g, col(n)))
      strictNaCond(strict, col("__wday"), before, after)
        .fold(gated)(na => when(!na, gated)).as(n) }
    val winVals = win.select(
      (iCols.map(col) ++ (col("__wday") +: outCols)): _*)
      .toDF((by ++ (DAY +: outs)): _*)

    joinNullSafe(keyed, winVals, by :+ DAY, "__cw_r_").drop(DAY)
  }

  /** Compound months+SUB-DAY Period frame aggregates
    * (`c(months(m) + hours/seconds(s), ...)` — the last Period shape the
    * reference's class check accepts, R/mutate.R:164-165): for every
    * input row, aggregate each expr over the rows of the same `by` group
    * whose TIMESTAMP index falls in
    * `[(ts - bm months) - bs seconds, (ts + am months) + as seconds]`
    * (inclusive — slider's closed interval). The month shift uses ANSI
    * year-month interval arithmetic (clamps to month-end PRESERVING
    * time-of-day — `add_months` would truncate to DATE); the second
    * shift is exact. lubridate applies Period components months-first,
    * so the composition order is faithful.
    *
    * Timestamps are not day-partitionable, so the O(n log n) prefix
    * path of [[monthsAgg]] does not apply; this rides the same honest
    * expansion cost model as [[monthsAggGeneral]] — binned interval
    * equi-join on (group <=>, micros-bin) + exact recheck, O(n·w̄)
    * joined rows distributed as a hash join, never a nested loop.
    *
    * @param strict strict-lubridate NA mode (Frame.strict): NULL for
    *   rows whose month shift clamped a nonexistent month-end. */
  def monthsSecondsAgg(df: DataFrame, by: Seq[String], index: Column,
      exprs: Seq[(String, Column)],
      beforeMonths: Int, beforeSecs: Long,
      afterMonths: Int, afterSecs: Long,
      complete: Boolean = false, strict: Boolean = false): DataFrame = {
    require(exprs.nonEmpty, "monthsSecondsAgg needs at least one expr")
    val outs = exprs.map(_._1)
    require(outs.distinct.size == outs.size,
      s"duplicate output names: ${outs.diff(outs.distinct).mkString(", ")}")
    val TSC = "__cw_tsc__"
    val bad = (outs.toSet + TSC).intersect(df.columns.toSet)
    require(bad.isEmpty,
      s"output columns ${bad.mkString(", ")} already exist on the " +
        "input — pass different `out` names")
    // statically-nonempty check, the monthsAgg contract at second
    // granularity (31-day months bound the positive span)
    val monthsSpan = beforeMonths.toLong + afterMonths
    require((if (monthsSpan >= 0) monthsSpan * 31 else monthsSpan * 28) *
        86400L + beforeSecs + afterSecs >= 0,
      s"empty month frame: [ts - (${beforeMonths}mo ${beforeSecs}s), " +
        s"ts + (${afterMonths}mo ${afterSecs}s)] starts after it ends")

    def shift(t: Column, months: Int, secs: Long): Column = {
      val m =
        if (months == 0) t
        else if (months > 0) t + expr(s"INTERVAL '$months' MONTH")
        else t - expr(s"INTERVAL '${-months}' MONTH")
      if (secs == 0) m
      else if (secs > 0) m + expr(s"INTERVAL '$secs' SECOND")
      else m - expr(s"INTERVAL '${-secs}' SECOND")
    }
    def loOf(t: Column): Column = shift(t, -beforeMonths, -beforeSecs)
    def hiOf(t: Column): Column = shift(t, afterMonths, afterSecs)

    val byCols = by.map(col)
    val keyed = df.withColumn(TSC,
      index.cast(org.apache.spark.sql.types.TimestampType))

    val width = math.max(1L,
      (math.abs(beforeMonths).toLong + math.abs(afterMonths)) * 31L *
        86400L + math.abs(beforeSecs) + math.abs(afterSecs) + 1L) *
      1000000L // micros
    val BIN = "__cw_bin__"
    val spans = keyed.select((byCols :+ col(TSC)): _*).distinct()
      .withColumn("__lous", unix_micros(loOf(col(TSC))))
      .withColumn("__hius", unix_micros(hiOf(col(TSC))))
      .withColumnRenamed(TSC, "__wts")
    val iCols = by.map(c => s"__cw_i_$c")
    // NULL index timestamps keep one padding bin (the monthsAggGeneral
    // survival contract — left-join padding, not a dropped row)
    val iPre = spans.withColumn(BIN, explode(coalesce(sequence(
      least(floor(col("__lous") / width), floor(col("__hius") / width)),
      floor(col("__hius") / width)), array(lit(0L)))))
    val i = iPre.toDF(iPre.columns.map(c =>
      if (by.contains(c)) s"__cw_i_$c" else c): _*)
    val raw = keyed.withColumn("__pus", unix_micros(col(TSC)))
      .withColumn(BIN, floor(col("__pus") / width))
      .drop(TSC)
    val cond = by.zip(iCols).map { case (l, r) => col(l) <=> col(r) }
      .foldLeft(i(BIN) === raw(BIN) &&
        col("__pus") >= col("__lous") && col("__pus") <= col("__hius"))(
        _ && _)
    val joined = i.join(raw, cond, "left")
    val aggs = exprs.map { case (n, e) => e.as(n) }
    var win = joined.groupBy((iCols.map(col) :+ col("__wts")): _*)
      .agg(aggs.head, aggs.tail: _*)

    val gate: Option[Column] = if (complete) {
      val spanW = Window.partitionBy(iCols.map(col): _*)
      win = win.withColumn(GMIN, min(col("__wts")).over(spanW))
        .withColumn(GMAX, max(col("__wts")).over(spanW))
      Some(loOf(col("__wts")) >= col(GMIN) &&
        hiOf(col("__wts")) <= col(GMAX))
    } else None
    val outCols = exprs.map { case (n, _) =>
      val gated = gate.fold(col(n))(g => when(g, col(n)))
      strictNaCond(strict, col("__wts"), beforeMonths, afterMonths)
        .fold(gated)(na => when(!na, gated)).as(n) }
    val winVals = win.select(
      (iCols.map(col) ++ (col("__wts") +: outCols)): _*)
      .toDF((by ++ (TSC +: outs)): _*)

    joinNullSafe(keyed, winVals, by :+ TSC, "__cw_r_").drop(TSC)
  }

  /** Strict-lubridate NA detector (Frame.strict): a month-shifted
    * boundary clamped iff the shifted date's day-of-month differs from
    * the source's (`add_months` clamps Mar 31 - 1mo to Feb 28 where
    * lubridate yields NA). Zero-month endpoints never clamp; the day
    * component of a compound Period shifts AFTER the month landing, so
    * it cannot clamp either (lubridate: months-part NA poisons the
    * whole Period sum). Returns None when strict mode is off or no
    * endpoint can clamp. */
  private def strictNaCond(strict: Boolean, d: Column,
      before: Int, after: Int): Option[Column] = {
    if (!strict) None
    else {
      val checks =
        (if (before != 0)
           Seq(dayofmonth(add_months(d, -before)) =!= dayofmonth(d))
         else Nil) ++
        (if (after != 0)
           Seq(dayofmonth(add_months(d, after)) =!= dayofmonth(d))
         else Nil)
      checks.reduceOption(_ || _)
    }
  }

  /** Null-safe inner equi-join on `keys`, dropping the right copy of the
    * keys (renamed with `pfx` to keep the condition unambiguous). */
  private def joinNullSafe(left: DataFrame, right: DataFrame,
      keys: Seq[String], pfx: String): DataFrame = {
    val rn = keys.map(c => s"$pfx$c")
    val r = right.toDF(right.columns.map(c =>
      if (keys.contains(c)) s"$pfx$c" else c): _*)
    val cond = keys.zip(rn).map { case (l, rr) => col(l) <=> col(rr) }
      .reduce(_ && _)
    left.join(r, cond).drop(rn: _*)
  }
}
