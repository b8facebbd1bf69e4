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
  * Deliberate deltas from the DataFrame verb, both inherent to SQL:
  *   - a frame without `.order_by` slides over INPUT ROW ORDER in the
  *     reference (slider semantics) — SQL result sets have no input
  *     order, so that shape is rejected here (the reference's own SQL
  *     branch forces an explicit order for the same reason);
  *   - month Period frames compile to a multi-step plan (prefix sums +
  *     as-of), not a window clause — use the DataFrame API
  *     (CalendarWindow / mutateW) for those.
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

    if (frame.exists(_.isMonths)) throw new UnsupportedOperationException(
      "month Period frames are multi-step plans (prefix sums + as-of " +
        "boundary lookups), not window clauses — use the DataFrame API " +
        "(TidierOps.mutateW with Frame.months / CalendarWindow.monthsAgg)")
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
}
