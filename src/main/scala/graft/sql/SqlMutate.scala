package graft.sql

import graft.operators.{Frame, FrameEndpoint}

/** SQL surface of the windowed-mutate verb — the reference's second
  * backend (`tbl_lazy`, reference R/mutate.R:293-351,666-736) renders the
  * SAME operator spec to SQL instead of evaluating data frames; this
  * object is that renderer for Spark SQL. `render` takes the mutateW
  * argument shape (exprs / by / order / frame / index / complete) with
  * SQL-text leaves and produces one SELECT statement over a named
  * table/view, runnable via `spark.sql(...)` — so SQL-only users keep
  * `.frame` endpoint algebra and `.complete` gating without hand-writing
  * window clauses. GraftExtensionsSpec proves the rendered SQL
  * value-equivalent to the DataFrame path on every supported shape.
  *
  * Month Period frames render as a CTE chain ([[monthsSql]]) — the same
  * prefix+as-of pipeline CalendarWindow builds, in pure SQL — for the
  * prefix-decomposable aggregate family (sum/count/count(*)/avg/stddev/
  * variance).
  *
  * Deliberate deltas from the DataFrame verb, inherent to SQL:
  *   - a frame without `.order_by` slides over INPUT ROW ORDER in the
  *     reference (slider semantics) — SQL result sets have no input
  *     order, so that shape is rejected here (the reference's own SQL
  *     branch forces an explicit order for the same reason).
  *
  * Month-frame min/max render as the daily-partial expansion CTE chain
  * (round-9); months+SUB-DAY compound Periods render as the
  * seconds-granularity expansion chain ([[monthsSecondsSql]], round-11
  * — closing the last documented SQL-surface delta): the same binned
  * interval join [[graft.operators.CalendarWindow.monthsSecondsAgg]]
  * builds, as `LATERAL VIEW explode(sequence(...))` over micros bins +
  * a LEFT JOIN with the exact range recheck in the join condition.
  */
object SqlMutate {

  /** Render the windowed mutate as one SQL SELECT over `table`.
    *
    * @param table   table/view name (must be resolvable in the session)
    * @param exprs   output name → SQL aggregate/window-function text
    *                (e.g. `"avg(value)"`); appended as new columns, names
    *                must not collide with existing ones
    * @param by      partition key SQL texts (`.by`)
    * @param orderBy order key SQL texts, may carry `DESC` (`.order_by`)
    * @param frame   endpoint pair (`.frame`); None + orderBy = running
    * @param index   index SQL text for range frames (`.index`)
    * @param complete `.complete = TRUE` gating
    */
  def render(table: String, exprs: Seq[(String, String)],
      by: Seq[String] = Nil, orderBy: Seq[String] = Nil,
      frame: Option[Frame] = None, index: Option[String] = None,
      complete: Boolean = false): String = {
    require(exprs.nonEmpty, "render needs at least one name -> expr pair")
    val windowed = by.nonEmpty || orderBy.nonEmpty || frame.isDefined
    if (!windowed)
      return s"SELECT *, ${exprs.map { case (n, e) => s"$e AS $n" }
        .mkString(", ")} FROM $table"

    if (frame.exists(_.isMonthsSeconds))
      return monthsSecondsSql(table, exprs, by, frame.get, index, complete)
    if (frame.exists(_.isMonths))
      return monthsSql(table, exprs, by, frame.get, index, complete)
    val isRange = frame.exists(_.isRange)
    require(!isRange || index.isDefined,
      "a Days/Seconds/Range frame requires an index (.index)")
    require(frame.isEmpty || isRange || orderBy.nonEmpty,
      "SQL result sets have no input row order — a rows frame needs an " +
        "explicit .order_by (the reference's SQL branch has the same " +
        "restriction)")

    // Numeric projection of the index at the frame's granularity —
    // the same projection TidierOps compiles (IDX column).
    def idxSql: String = {
      // Rows collected too: a hand-built Rows+Period mix must be
      // rejected, not silently reinterpreted on the index axis
      val units = Seq(frame.get.before, frame.get.after).collect {
        case _: FrameEndpoint.Days    => "days"
        case _: FrameEndpoint.Seconds => "seconds"
        case _: FrameEndpoint.Range   => "range"
        case _: FrameEndpoint.Rows    => "rows"
      }.distinct
      require(units.size == 1,
        s"range frame mixes units (${units.mkString(", ")})")
      units.head match {
        case "days" =>
          s"datediff(CAST(${index.get} AS DATE), DATE'1970-01-01')"
        case "seconds" =>
          s"CAST(CAST(${index.get} AS TIMESTAMP) AS BIGINT)"
        case _ => index.get
      }
    }

    def endLong(e: FrameEndpoint, isBefore: Boolean): Option[Long] = e match {
      case FrameEndpoint.Unbounded  => None
      case FrameEndpoint.Rows(n)    => Some(if (isBefore) -n else n)
      case FrameEndpoint.Days(n)    => Some(if (isBefore) -n else n)
      case FrameEndpoint.Seconds(n) => Some(if (isBefore) -n else n)
      case FrameEndpoint.Range(n)   => Some(if (isBefore) -n else n)
      case FrameEndpoint.Months(_) | FrameEndpoint.MonthsDays(_, _) =>
        throw new IllegalStateException("months rejected above")
    }
    def boundSql(n: Option[Long], isBefore: Boolean): String = n match {
      case None => if (isBefore) "UNBOUNDED PRECEDING"
                   else "UNBOUNDED FOLLOWING"
      case Some(0)          => "CURRENT ROW"
      case Some(k) if k < 0 => s"${-k} PRECEDING"
      case Some(k)          => s"$k FOLLOWING"
    }

    val part =
      if (by.isEmpty) "" else s"PARTITION BY ${by.mkString(", ")}"
    val winBody: String = frame match {
      case Some(f) if f.isRange =>
        val lo = boundSql(endLong(f.before, isBefore = true), isBefore = true)
        val hi = boundSql(endLong(f.after, isBefore = false), isBefore = false)
        s"$part ORDER BY $idxSql RANGE BETWEEN $lo AND $hi".trim
      case Some(f) =>
        val lo = boundSql(endLong(f.before, isBefore = true), isBefore = true)
        val hi = boundSql(endLong(f.after, isBefore = false), isBefore = false)
        s"$part ORDER BY ${orderBy.mkString(", ")} " +
          s"ROWS BETWEEN $lo AND $hi".trim
      case None if orderBy.nonEmpty =>
        // running semantics: ROWS, not the SQL-default RANGE (which
        // merges order-key peers) — same choice as TidierOps
        s"$part ORDER BY ${orderBy.mkString(", ")} " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW".trim
      case None => part // whole-group frame
    }

    // `.complete` gate — the same two branches as TidierOps' gate.
    val gate: Option[String] = frame match {
      case Some(f) if complete && f.isFinite && !f.isRange =>
        val lo = endLong(f.before, isBefore = true).get
        val hi = endLong(f.after, isBefore = false).get
        val expected = math.max(hi - lo + 1, 0)
        Some(s"count(1) OVER w = $expected")
      case Some(f) if complete && f.isFinite && f.isRange =>
        val lo = endLong(f.before, isBefore = true).get
        val hi = endLong(f.after, isBefore = false).get
        Some(s"($idxSql) + ($lo) >= min($idxSql) OVER p AND " +
          s"($idxSql) + ($hi) <= max($idxSql) OVER p")
      case _ => None
    }

    val items = exprs.map { case (n, e) =>
      val applied = s"$e OVER w"
      gate.fold(s"$applied AS $n")(g =>
        s"CASE WHEN $g THEN $applied END AS $n")
    }.mkString(", ")
    val needP = gate.isDefined && frame.exists(_.isRange)
    val windows = s"w AS ($winBody)" +
      (if (needP) s", p AS (${if (part.isEmpty) "" else part})" else "")
    s"SELECT *, $items FROM $table WINDOW $windows"
  }

  // ---- month Period frames: the prefix+as-of pipeline as a CTE chain ----

  private sealed trait MAgg
  private object MAgg {
    case object Sum extends MAgg; case object Count extends MAgg
    case object CountAll extends MAgg; case object Avg extends MAgg
    case object Var extends MAgg; case object Std extends MAgg
    case object Min extends MAgg; case object Max extends MAgg
  }
  private val AggCall = """(?i)^\s*([a-z_]+)\s*\(\s*(\*|1|[\w.`]+)\s*\)\s*$""".r

  /** Render a month-Period frame as the same multi-step plan
    * [[graft.operators.CalendarWindow.monthsAgg]] builds — pure SQL, no
    * DataFrame API:
    *
    *   1. `daily`: per-(group, day) partial sums/counts (+ sum of squares
    *      for stddev/variance);
    *   2. `cum`: running prefix per group over days;
    *   3. `un`: the prefix rows UNION ALL one probe row per (group, day,
    *      boundary) — `lo = add_months(day, -before)` and
    *      `hi + 1 day` (an inclusive-at-hi lookup is a strict lookup at
    *      the next day, so ONE strict sweep serves both boundaries);
    *      probes sort BEFORE data rows at equal time (`rk`), so a
    *      running `last_value IGNORE NULLS` sees exactly the prefix
    *      strictly before each boundary;
    *   4. `win`: pivot each (group, day)'s two probe rows back to
    *      columns; window aggregate = prefix(hi) − prefix(lo⁻);
    *   5. join back to the input on (group, CAST(index AS DATE)),
    *      null-safely (NULL groups/days are real groups upstream).
    *
    * Same O(n log n) shape as the DataFrame path — no quadratic range
    * self-join. Month-frame min/max render the daily-partial EXPANSION
    * branch instead (g_bins/g_ebins/g_exp): per-day min/max partials,
    * window day spans exploded to width-sized bins (LATERAL VIEW
    * explode(sequence(...)), <= 2 bins per window), an equi join on
    * (group, bin) with the exact range recheck in the join condition,
    * and a re-aggregate per window — the same plan monthsAgg's 2b
    * branch builds, never a nested loop. */
  private def monthsSql(table: String, exprs: Seq[(String, String)],
      by: Seq[String], frame: Frame, index: Option[String],
      complete: Boolean): String = {
    require(index.isDefined,
      "a Months (Period) frame requires an index (.index)")
    def monthDay(e: FrameEndpoint): (Long, Long) = e match {
      case FrameEndpoint.Months(m)        => (m, 0L)
      case FrameEndpoint.MonthsDays(m, d) => (m, d)
      case FrameEndpoint.MonthsSeconds(_, _) =>
        // unreachable from render(): isMonthsSeconds frames dispatch to
        // monthsSecondsSql first. Kept as a defensive guard for direct
        // callers of this private path.
        throw new IllegalStateException(
          "months+sub-day compound Periods render via monthsSecondsSql " +
            "(the seconds-granularity expansion chain), not monthsSql")
      case _ => throw new IllegalArgumentException(
        "month frames cannot mix units: both endpoints must be Months " +
          "or MonthsDays")
    }
    val (b, bd) = monthDay(frame.before)
    val (a, ad) = monthDay(frame.after)
    // same statically-empty-frame rejection as CalendarWindow.monthsAgg:
    // without it a frame like months(-24, 0) renders a DESCENDING
    // sequence() per (group, day) — Spark sequence steps -1 when start >
    // stop, a silent O(span/width)-bin explode fan-out that then joins
    // nothing — where the DataFrame path throws (r9 review finding)
    val monthsSpan = b + a
    require((if (monthsSpan >= 0) monthsSpan * 31 else monthsSpan * 28) +
        bd + ad >= 0,
      s"empty month frame: [d - (${b}mo ${bd}d), d + (${a}mo ${ad}d)] " +
        "starts after it ends")

    import MAgg._
    val parsed: Seq[(String, MAgg, String)] = exprs.map { case (n, e) =>
      e match {
        case AggCall(fn, arg) =>
          val op = fn.toLowerCase match {
            case "sum"                            => Sum
            case "count"                          => Count
            case "avg" | "mean"                   => Avg
            case "stddev" | "stddev_samp" | "std" => Std
            case "variance" | "var_samp"          => Var
            case "min"                            => Min
            case "max"                            => Max
            case other => throw new UnsupportedOperationException(
              s"month Period frames support sum/count/avg/stddev/" +
                s"variance/min/max in SQL (got: $other)")
          }
          if (op == Count && (arg == "*" || arg == "1")) (n, CountAll, "")
          else if (arg == "*" || arg == "1")
            throw new UnsupportedOperationException(
              s"$fn(*) is not an aggregate over a column (got: $e)")
          else (n, op, arg)
        case _ => throw new UnsupportedOperationException(
          "month Period frames support simple aggregate calls over one " +
            s"column in SQL (got: $e)")
      }
    }
    // distinct value columns, indexed for stable generated aliases
    val vcols = parsed.collect {
      case (_, Sum | Count | Avg | Var | Std, v) => v }.distinct
    val vi = vcols.zipWithIndex.toMap
    val sqcols = parsed.collect { case (_, Var | Std, v) => v }.distinct
    val needAll = parsed.exists(_._2 == CountAll)
    // min/max ride the daily-partial EXPANSION chain (g_bins/g_exp) —
    // the same binned interval join CalendarWindow.monthsAgg builds,
    // rendered via LATERAL VIEW explode(sequence(...))
    val mncols = parsed.collect { case (_, Min, v) => v }.distinct
    val mxcols = parsed.collect { case (_, Max, v) => v }.distinct
    val mmAll = (mncols ++ mxcols).distinct
    val mi = mmAll.zipWithIndex.toMap
    val hasPrefix = vcols.nonEmpty || needAll
    val hasMm = mmAll.nonEmpty

    val byL = by.mkString(", ")
    val byPfx = if (by.isEmpty) "" else s"$byL, "
    val pb = if (by.isEmpty) "" else s"PARTITION BY $byL "
    def loSql(d: String) = {
      val m = s"add_months($d, ${-b})"
      if (bd == 0) m else s"date_add($m, ${-bd})"
    }
    def hiSql(d: String) = {
      val m = s"add_months($d, $a)"
      if (ad == 0) m else s"date_add($m, $ad)"
    }

    val dailyAggs = vcols.flatMap { v => val i = vi(v)
      Seq(s"sum($v) AS s_$i", s"count($v) AS c_$i") ++
        (if (sqcols.contains(v))
           Seq(s"sum(CAST($v AS DOUBLE) * CAST($v AS DOUBLE)) AS q_$i")
         else Nil)
    } ++ (if (needAll) Seq("count(1) AS call") else Nil) ++
      mncols.map(v => s"min($v) AS mn_${mi(v)}") ++
      mxcols.map(v => s"max($v) AS mx_${mi(v)}")
    val runPairs: Seq[(String, String)] = vcols.flatMap { v => val i = vi(v)
      Seq(s"s_$i" -> s"cs_$i", s"c_$i" -> s"cc_$i") ++
        (if (sqcols.contains(v)) Seq(s"q_$i" -> s"cq_$i") else Nil)
    } ++ (if (needAll) Seq("call" -> "ccall") else Nil)
    val cumCols = runPairs.map { case (s, d) => s"sum($s) OVER cw AS $d" }
    val runNames = runPairs.map(_._2)

    val nullRun = runNames.map(c => s"NULL AS $c").mkString(", ")
    val sweepCols = runNames.map(c =>
      s"last_value($c) IGNORE NULLS OVER sw AS l_$c").mkString(", ")
    val pivotCols = runNames.flatMap(c => Seq(
      s"max(CASE WHEN kind = 'h' THEN l_$c END) AS hi_$c",
      s"max(CASE WHEN kind = 'l' THEN l_$c END) AS lo_$c")).mkString(", ")

    def outSql(op: MAgg, v: String): String = {
      // prefix-family alias index; min/max index into mi instead
      lazy val i = if (v.nonEmpty) vi(v) else -1
      def cnt = s"(coalesce(hi_cc_$i, 0) - coalesce(lo_cc_$i, 0))"
      def raw = s"(coalesce(hi_cs_$i, 0) - coalesce(lo_cs_$i, 0))"
      op match {
        case Sum => s"CASE WHEN $cnt > 0 THEN $raw END"
        case Count => cnt
        case CountAll => "(coalesce(hi_ccall, 0) - coalesce(lo_ccall, 0))"
        case Avg => s"CASE WHEN $cnt > 0 THEN CAST($raw AS DOUBLE) / $cnt END"
        case Var | Std =>
          val n = cnt
          val s1 = s"CAST($raw AS DOUBLE)"
          val s2 = s"(coalesce(hi_cq_$i, 0D) - coalesce(lo_cq_$i, 0D))"
          val varc = s"CASE WHEN $n > 1 THEN " +
            s"greatest(($s2 - $s1 * $s1 / $n) / ($n - 1), 0D) END"
          if (op == Var) varc else s"sqrt($varc)"
        case Min => s"w_mn_${mi(v)}"
        case Max => s"w_mx_${mi(v)}"
      }
    }
    // strict-lubridate NA replay (Frame.strict) — same clamp detector
    // as CalendarWindow.strictNaCond, rendered in SQL: a month-shifted
    // boundary clamped iff its day-of-month changed
    val strictCond: Option[String] = if (!frame.strict) None else {
      val checks =
        (if (b != 0) Seq(s"day(add_months(day, ${-b})) <> day(day)")
         else Nil) ++
        (if (a != 0) Seq(s"day(add_months(day, $a)) <> day(day)")
         else Nil)
      checks.reduceOption(_ + " OR " + _)
    }
    val gated = parsed.map { case (n, op, v) =>
      val o = outSql(op, v)
      val g = if (complete)
        s"CASE WHEN ${loSql("day")} >= gmin AND ${hiSql("day")} <= gmax " +
          s"THEN $o END"
      else o
      // NULL-index rows: the clamp checks are NULL on a NULL day, and a
      // bare CASE would fall through to ELSE (emit the aggregate) where
      // the DataFrame path's when(!na, gated) yields NULL — render the
      // guard null-safely so both backends agree (ADVICE r07)
      val sg = strictCond.fold(g)(c =>
        s"CASE WHEN ($c) OR day IS NULL THEN NULL ELSE $g END")
      s"$sg AS $n"
    }.mkString(", ")

    val joinOn = (by.map(c => s"b.$c <=> w.$c") :+
      s"CAST(b.${index.get} AS DATE) <=> w.day").mkString(" AND ")

    val dailyCte = s"""WITH g_daily AS (
  SELECT $byPfx CAST(${index.get} AS DATE) AS day, ${dailyAggs.mkString(", ")}
  FROM $table GROUP BY $byPfx CAST(${index.get} AS DATE)
)"""
    val prefixCtes = if (!hasPrefix) "" else s""", g_cum AS (
  SELECT $byPfx day, ${cumCols.mkString(", ")}
  FROM g_daily
  WINDOW cw AS (${pb}ORDER BY day
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), g_un AS (
  SELECT $byPfx day AS t, 1 AS rk, CAST(NULL AS STRING) AS kind,
         CAST(NULL AS DATE) AS pday, ${runNames.mkString(", ")}
  FROM g_cum
  UNION ALL
  SELECT $byPfx ${loSql("day")} AS t, 0 AS rk, 'l' AS kind, day AS pday,
         $nullRun
  FROM g_cum
  UNION ALL
  SELECT $byPfx date_add(${hiSql("day")}, 1) AS t, 0 AS rk, 'h' AS kind,
         day AS pday, $nullRun
  FROM g_cum
), g_sweep AS (
  SELECT $byPfx t, kind, pday, $sweepCols
  FROM g_un
  WINDOW sw AS (${pb}ORDER BY t, rk
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), g_win AS (
  SELECT $byPfx pday AS day, $pivotCols
  FROM g_sweep WHERE kind IS NOT NULL
  GROUP BY $byPfx pday
)"""
    // the min/max daily-partial expansion as SQL — bins via LATERAL
    // VIEW explode(sequence(...)), the exact shape of
    // CalendarWindow.monthsAgg's 2b branch (width guarantees <= 2 bins
    // per window; the range recheck rides the join condition)
    val width = math.max(1L, (b + a) * 31L + bd + ad + 1L)
    val mmDailyCols = (mncols.map(v => s"mn_${mi(v)}") ++
      mxcols.map(v => s"mx_${mi(v)}")).mkString(", ")
    val mmSel = (mncols.map(v => s"min(d.mn_${mi(v)}) AS w_mn_${mi(v)}") ++
      mxcols.map(v => s"max(d.mx_${mi(v)}) AS w_mx_${mi(v)}")).mkString(", ")
    val mmOutNames = (mncols.map(v => s"w_mn_${mi(v)}") ++
      mxcols.map(v => s"w_mx_${mi(v)}"))
    val byIPfx = if (by.isEmpty) "" else by.map(c => s"i.$c").mkString(", ") + ", "
    val byIAs = if (by.isEmpty) "" else by.map(c => s"i.$c AS $c").mkString(", ") + ", "
    val mmCtes = if (!hasMm) "" else s""", g_bins AS (
  SELECT $byPfx day AS wday,
         datediff(${loSql("day")}, DATE '1970-01-01') AS lod,
         datediff(${hiSql("day")}, DATE '1970-01-01') AS hid
  FROM g_daily
), g_ebins AS (
  SELECT ${byPfx}wday, lod, hid, bin
  FROM g_bins
  LATERAL VIEW explode(sequence(CAST(floor(lod / $width) AS BIGINT),
    CAST(floor(hid / $width) AS BIGINT))) __gt AS bin
), g_exp AS (
  SELECT ${byIAs}i.wday AS day, $mmSel
  FROM g_ebins i
  JOIN (SELECT $byPfx day, datediff(day, DATE '1970-01-01') AS pd,
          $mmDailyCols
        FROM g_daily) d
    ON ${(by.map(c => s"i.$c <=> d.$c") :+
          s"CAST(floor(d.pd / $width) AS BIGINT) = i.bin")
        .mkString(" AND ")}
      AND d.pd >= i.lod AND d.pd <= i.hid
  GROUP BY ${byIPfx}i.wday
)"""
    // complete-gate columns, with a qualifier for joined contexts where
    // bare `day`/group names would be ambiguous
    def gateColsQ(q: String): String = if (!complete) "" else {
      val p = if (by.isEmpty) ""
        else s"PARTITION BY ${by.map(q + _).mkString(", ")} "
      s", min(${q}day) OVER (${p.trim}) AS gmin, " +
        s"max(${q}day) OVER (${p.trim}) AS gmax"
    }
    val mmJoinOn = (q: String) => (by.map(c => s"$q$c <=> e.$c") :+
      s"${q}day <=> e.day").mkString(" AND ")
    val wSub =
      if (hasPrefix && hasMm)
        s"SELECT p.*${mmOutNames.map(c => s", e.$c AS $c").mkString}" +
          s"${gateColsQ("p.")} FROM g_win p LEFT JOIN g_exp e " +
          s"ON ${mmJoinOn("p.")}"
      else if (hasPrefix) s"SELECT *${gateColsQ("")} FROM g_win"
      else
        s"SELECT ${if (by.isEmpty) "" else by.map(c => s"a.$c").mkString(", ") + ", "}" +
          s"a.day${mmOutNames.map(c => s", e.$c AS $c").mkString}" +
          s"${gateColsQ("a.")} FROM (SELECT $byPfx day FROM g_daily) a " +
          s"LEFT JOIN g_exp e ON ${mmJoinOn("a.")}"

    s"""$dailyCte$prefixCtes$mmCtes
SELECT b.*, $gated
FROM $table b
JOIN ($wSub) w ON $joinOn"""
  }

  /** Render a months+SUB-DAY compound Period frame
    * (`c(months(m) + hours/seconds(s), ...)`) as pure SQL — the
    * seconds-granularity expansion chain of
    * [[graft.operators.CalendarWindow.monthsSecondsAgg]], statement
    * form (round-11, closing the last documented SQL-surface delta):
    *
    *   1. `ms_spans`: one row per distinct (group, index timestamp)
    *      with the frame's micros boundaries (`ts ∓ m MONTH ∓ s SECOND`
    *      — months first, then the exact second shift, the lubridate
    *      composition order);
    *   2. `ms_bins`: each span exploded to its covering micros bins —
    *      the bin width exceeds the maximum frame span, so `sequence()`
    *      emits ≤ 2 bins per window (`coalesce(..., array(0))` keeps
    *      one padding bin for NULL-index rows, the survival contract);
    *   3. `ms_win`: bins LEFT JOIN the binned raw rows — the exact
    *      range recheck rides the join condition so empty windows keep
    *      their padding row — grouped back to per-window aggregates.
    *      Every aggregate evaluates DIRECTLY over the joined rows (no
    *      prefix decomposition exists on a timestamp axis), so the full
    *      monthsSql family is supported uniformly;
    *   4. join back to the input by (group, timestamp).
    *
    * Distributed shape: two shuffles (the expansion join + the
    * join-back), O(n·w̄) joined rows as a hash join — the DataFrame
    * path's exact cost model. */
  private def monthsSecondsSql(table: String, exprs: Seq[(String, String)],
      by: Seq[String], frame: Frame, index: Option[String],
      complete: Boolean): String = {
    require(index.isDefined,
      "a Months (Period) frame requires an index (.index)")
    def monthSec(e: FrameEndpoint): (Long, Long) = e match {
      case FrameEndpoint.Months(x)           => (x, 0L)
      case FrameEndpoint.MonthsDays(m, d)    => (m, d * 86400L)
      case FrameEndpoint.MonthsSeconds(m, s) => (m, s)
      case _ => throw new IllegalArgumentException(
        "month frames cannot mix units: both endpoints must be " +
          "month-family Periods (Months / MonthsDays / MonthsSeconds)")
    }
    val (bm, bs) = monthSec(frame.before)
    val (am, asec) = monthSec(frame.after)
    // statically-empty rejection, the monthsSecondsAgg contract
    val monthsSpan = bm + am
    require((if (monthsSpan >= 0) monthsSpan * 31 else monthsSpan * 28) *
        86400L + bs + asec >= 0,
      s"empty month frame: [ts - (${bm}mo ${bs}s), ts + (${am}mo " +
        s"${asec}s)] starts after it ends")

    // the same aggregate-call surface as monthsSql; here every fn
    // evaluates directly over the joined rows, count(*) via the
    // LEFT-JOIN-safe constant column
    val parsed: Seq[(String, String, String)] = exprs.map { case (n, e) =>
      e match {
        case AggCall(fn, arg) =>
          val f = fn.toLowerCase match {
            case "mean"               => "avg"
            case "std" | "stddev"     => "stddev_samp"
            case "variance"           => "var_samp"
            case x @ ("sum" | "count" | "avg" | "min" | "max" |
                "stddev_samp" | "var_samp") => x
            case other => throw new UnsupportedOperationException(
              s"month Period frames support sum/count/avg/stddev/" +
                s"variance/min/max in SQL (got: $other)")
          }
          if (arg == "*" || arg == "1") {
            if (f != "count") throw new UnsupportedOperationException(
              s"$fn(*) is not an aggregate over a column (got: $e)")
            (n, "count", "__ms_one__")
          } else (n, f, arg)
        case _ => throw new UnsupportedOperationException(
          "month Period frames support simple aggregate calls over one " +
            s"column in SQL (got: $e)")
      }
    }
    val aggCols = parsed.zipWithIndex
      .map { case ((_, f, v), i) => s"$f($v) AS __mo_$i" }.mkString(", ")

    val byL = by.mkString(", ")
    val byPfx = if (by.isEmpty) "" else s"$byL, "
    val iBy = by.map(c => s"__ms_i_$c")
    val iByPfx = if (by.isEmpty) "" else iBy.mkString(", ") + ", "
    val iByAs = if (by.isEmpty) ""
      else by.zip(iBy).map { case (c, i) => s"$c AS $i" }.mkString(", ") + ", "
    def shiftSql(t: String, months: Long, secs: Long): String = {
      val m =
        if (months == 0) t
        else if (months > 0) s"($t + INTERVAL '$months' MONTH)"
        else s"($t - INTERVAL '${-months}' MONTH)"
      if (secs == 0) m
      else if (secs > 0) s"($m + INTERVAL '$secs' SECOND)"
      else s"($m - INTERVAL '${-secs}' SECOND)"
    }
    def loSql(t: String) = shiftSql(t, -bm, -bs)
    def hiSql(t: String) = shiftSql(t, am, asec)
    val width = (math.max(1L,
      (math.abs(bm) + math.abs(am)) * 31L * 86400L +
        math.abs(bs) + math.abs(asec) + 1L)) * 1000000L

    // strict-lubridate clamp detector on the timestamp axis (the
    // strictNaCond replay; the sub-day shift lands AFTER the month
    // shift so it can never clamp)
    val strictCond: Option[String] = if (!frame.strict) None else {
      val checks =
        (if (bm != 0)
           Seq(s"day(add_months(w.__wts, ${-bm})) <> day(w.__wts)")
         else Nil) ++
        (if (am != 0)
           Seq(s"day(add_months(w.__wts, $am)) <> day(w.__wts)")
         else Nil)
      checks.reduceOption(_ + " OR " + _)
    }
    val gated = parsed.zipWithIndex.map { case ((n, _, _), i) =>
      val o = if (complete)
        s"CASE WHEN unix_micros(${loSql("w.__wts")}) >= w.__gmin AND " +
          s"unix_micros(${hiSql("w.__wts")}) <= w.__gmax " +
          s"THEN w.__mo_$i END"
      else s"w.__mo_$i"
      val sg = strictCond.fold(o)(c =>
        s"CASE WHEN ($c) OR w.__wts IS NULL THEN NULL ELSE $o END")
      s"$sg AS $n"
    }.mkString(", ")
    // complete gate bounds live on the per-window frame (one row per
    // distinct (group, ts)), matching the DataFrame path's window over
    // win — compared in micros so the ms_win projection stays columnar
    val gateCols = if (!complete) "" else {
      val p = if (by.isEmpty) "" else s"PARTITION BY ${iBy.mkString(", ")}"
      s", min(unix_micros(__wts)) OVER ($p) AS __gmin" +
        s", max(unix_micros(__wts)) OVER ($p) AS __gmax"
    }

    val joinOn = (by.zip(iBy).map { case (c, i) => s"b.$c <=> w.$i" } :+
      s"CAST(b.${index.get} AS TIMESTAMP) <=> w.__wts").mkString(" AND ")

    s"""WITH ms_spans AS (
  SELECT ${iByAs}__wts,
         unix_micros(${loSql("__wts")}) AS __lous,
         unix_micros(${hiSql("__wts")}) AS __hius
  FROM (SELECT DISTINCT $byPfx CAST(${index.get} AS TIMESTAMP) AS __wts
        FROM $table)
), ms_bins AS (
  SELECT ${iByPfx}__wts, __lous, __hius, __bin
  FROM ms_spans
  LATERAL VIEW explode(coalesce(sequence(
    least(CAST(floor(__lous / $width) AS BIGINT),
          CAST(floor(__hius / $width) AS BIGINT)),
    CAST(floor(__hius / $width) AS BIGINT)),
    array(CAST(0 AS BIGINT)))) __gt AS __bin
), ms_win AS (
  SELECT ${iByPfx}__wts, $aggCols$gateCols
  FROM ms_bins
  LEFT JOIN (SELECT *, 1 AS __ms_one__,
               unix_micros(CAST(${index.get} AS TIMESTAMP)) AS __pus
             FROM $table) __msr
    ON ${(by.zip(iBy).map { case (c, i) => s"$i <=> __msr.$c" } :+
          s"CAST(floor(__msr.__pus / $width) AS BIGINT) = __bin")
        .mkString(" AND ")}
      AND __msr.__pus >= __lous AND __msr.__pus <= __hius
  GROUP BY ${iByPfx}__wts, __lous, __hius
)
SELECT b.*, $gated
FROM $table b
JOIN ms_win w ON $joinOn"""
  }
}
