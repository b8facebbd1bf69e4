package graft

import org.apache.spark.sql.{SparkSession, DataFrame, Column}
import org.apache.spark.sql.functions._
import graft.operators.{Frame, FrameEndpoint, TidierOps}
import TidierOps._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query keys mirror SURVEY.md §2.5 (the reference's behavior inventory,
  * tests/testthat/tests_tidier.R) re-expressed over the driver's parquet
  * fixtures (FIXTURES.md §C mapping). Oracle-parity conventions:
  *   - float aggregates are `round(_, 4)` on BOTH sides (FP summation order
  *     differs between engines; SURVEY.md §7.4 risk 1);
  *   - order keys always include a unique tiebreaker (row-frame results are
  *     otherwise nondeterministic across engines);
  *   - `events.ts` is canonicalized to an epoch-nanos BIGINT whatever the
  *     fixture vintage (TIMESTAMP(NANOS) or TIMESTAMP(MICROS)/NTZ — see
  *     QueryUtil.rawEvents/normalizeTs), ordered identically by DuckDB's
  *     `epoch_ns(ts)`; results never expose raw `ts`;
  *   - empty frames yield NULL (Spark/SQL) where R yields NaN — normalized
  *     to NULL by policy (SURVEY.md §1.2).
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.queries.QueryUtil.t(s, dir, name)

  /** events table with `ts` canonicalized to epoch-nanos BIGINT across
    * both fixture vintages (QueryUtil.rawEvents + normalizeTs, confs via
    * QueryUtil.pinEventConfs — the dual-vintage contract is spec-pinned
    * by EventsVintageSpec). The long is the BETTER fidelity choice:
    * ordering by it matches DuckDB's ns-precision ordering exactly.
    * Day-granularity projections use integer `div` (not `/`, which is
    * double division and rounds at 1e18). */
  private def events(s: SparkSession, dir: String): DataFrame =
    graft.queries.QueryUtil.events(s, dir)

  /** ts (epoch-nanos long) → DateType, truncating like CAST(ts AS DATE). */
  private val tsDate = expr("cast(timestamp_micros(ts div 1000) as date)")

  /** Epsilon-biased 4-decimal rounding, applied identically in the oracle
    * SQL (`round(1e-9 + x, 4)`). Aggregates of 2-decimal inputs regularly
    * land EXACTLY on a rounding boundary (e.g. avg of 8 values = x.xxxx5);
    * there Spark's BigDecimal HALF_UP and DuckDB's scaled-double rounding
    * disagree based on 1-ulp summation-order noise. The 1e-9 bias (huge vs
    * the ~1e-13 noise, tiny vs any legitimate value gap) pushes halfway
    * values decisively over the boundary in BOTH engines. */
  private def r4(c: Column): Column = graft.queries.QueryUtil.r4(c)

  /** Flagship: the reference's README headline (mean over the trailing 7
    * days per group, README.md:26-54) on `events` — per-user mean value over
    * the day-range frame [day-7, day-1]. Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("window_range_index")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    coreQueries ++ graft.queries.TextQueries.queries ++
      graft.queries.DedupQueries.queries ++
      graft.queries.SimilarityQueries.queries ++
      graft.queries.MultimodalQueries.queries ++
      graft.queries.RelationalQueries.queries ++
      graft.queries.ExtendedQueries.queries ++
      graft.queries.CurationQueries.queries ++
      graft.queries.TimeSeriesQueries.queries ++
      graft.queries.FormatQueries.queries ++
      graft.queries.GraphQueries.queries ++
      graft.queries.SuffixQueries.queries

  /** Every module's oracle SQL, with the negative-zero normalization
    * applied centrally (QueryUtil.negZeroSafeOracle): each `round(1e-9 …,
    * 4)` template becomes `(round(… ) + 0.0)`, matching the `+ lit(0.0)`
    * inside QueryUtil.r4 — see the r07 verdict (DuckDB -0.0 vs Spark +0.0
    * on 4 roll_corr rows was the round's only driver-red). */
  def oracleSql: Map[String, String] =
    rawOracleSql.map { case (k, v) =>
      k -> graft.queries.QueryUtil.negZeroSafeOracle(v) }

  private def rawOracleSql: Map[String, String] =
    coreOracleSql ++ graft.queries.TextQueries.oracleSql ++
      graft.queries.DedupQueries.oracleSql ++
      graft.queries.SimilarityQueries.oracleSql ++
      graft.queries.MultimodalQueries.oracleSql ++
      graft.queries.RelationalQueries.oracleSql ++
      graft.queries.ExtendedQueries.oracleSql ++
      graft.queries.CurationQueries.oracleSql ++
      graft.queries.TimeSeriesQueries.oracleSql ++
      graft.queries.FormatQueries.oracleSql ++
      graft.queries.GraphQueries.oracleSql ++
      graft.queries.SuffixQueries.oracleSql

  private val coreQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- core mutate paths (SURVEY §2.1 decision tree) ----
    "mutate_plain" -> ((s, dir) => {
      // Path 1: plain vectorized mutate (tests_tidier.R:2-12).
      t(s, dir, "lineitem")
        .mutateW("revenue" ->
          round(col("l_extendedprice") * (lit(1) - col("l_discount")), 4))()
        .select("l_orderkey", "l_linenumber", "revenue")
    }),
    "mutate_grouped" -> ((s, dir) => {
      // Path 4: `.by` only — group-constant aggregate (tests_tidier.R:51-74).
      t(s, dir, "lineitem")
        .mutateW("avg_price" -> avg(col("l_extendedprice")))(
          by = Seq(col("l_returnflag")))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          r4(col("avg_price")).as("avg_price"))
    }),
    "order_cumsum" -> ((s, dir) => {
      // `.order_by` + running aggregate (tests_tidier.R:14-49).
      t(s, dir, "lineitem")
        .mutateW("cum_qty" -> sum(col("l_quantity")))(
          by = Seq(col("l_returnflag")),
          orderBy = Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
            col("l_partkey"), col("l_suppkey")))
        .select(col("l_orderkey"), col("l_linenumber"),
          r4(col("cum_qty")).as("cum_qty"))
    }),
    "order_desc_multi" -> ((s, dir) => {
      // Multi-key mixed asc/desc ordering (tests_tidier.R:25-31,41-48).
      t(s, dir, "orders")
        .mutateW("rn" -> row_number())(
          by = Seq(col("o_orderpriority")),
          orderBy = Seq(col("o_totalprice").desc, col("o_orderkey")))
        .select(col("o_orderkey"), col("rn").cast("long").as("rn"))
    }),
    "window_rows_unbounded" -> ((s, dir) => {
      // `.frame = c(Inf, 0)` cumulative mean (tests_tidier.R:76-97).
      // ROUND-11 DETERMINISM FIX (caught by the 158-key sf1 sweep, the
      // only red): avg(double) over a cumulative frame diverged at sf1 —
      // DuckDB evaluates windowed sums on a SEGMENT TREE, Spark
      // sequentially, and at ~1.5M-row partitions the summation-order
      // ulp drift crossed the r4 grid on 143 rows (53112.9141 vs
      // 53112.914). The cents discipline makes the value order-
      // independent: exact long-cent running sum (< 2^53, so the
      // double cast is exact in both engines) and ONE correctly-rounded
      // division by (n · 100) — bit-equal at every partition length.
      t(s, dir, "lineitem")
        .withColumn("pc",
          floor(col("l_extendedprice") * 100 + 0.5).cast("long"))
        .mutateW("cs" -> sum(col("pc")), "cn" -> count(lit(1)))(
          by = Seq(col("l_returnflag")),
          orderBy = Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
            col("l_partkey"), col("l_suppkey")),
          frame = Some(Frame.cumulative))
        .select(col("l_orderkey"), col("l_linenumber"),
          r4(col("cs").cast("double") / (col("cn") * lit(100.0)))
            .as("run_avg"))
    }),
    "window_rows_sym" -> ((s, dir) => {
      // Finite symmetric rows frame + `.by` — the reference's one real
      // differential test (tests_tidier.R:271-323).
      events(s, dir)
        .mutateW("avg_v" -> avg(col("value")))(
          by = Seq(col("user_id")),
          orderBy = Seq(col("ts"), col("event_id")),
          frame = Some(Frame.rows(3, 3)))
        .select(col("event_id"), r4(col("avg_v")).as("avg_v"))
    }),
    "window_range_index" -> ((s, dir) => {
      // Period frame over a date index with gaps (tests_tidier.R:99-160):
      // [day-7, day-1], current day excluded (negative `after`).
      events(s, dir)
        .mutateW("trail_avg" -> avg(col("value")))(
          by = Seq(col("user_id")),
          frame = Some(Frame.days(7, -1)),
          index = Some(tsDate))
        .select(col("event_id"), r4(col("trail_avg")).as("trail_avg"))
    }),
    "window_orderby_neq_index" -> ((s, dir) => {
      // `.order_by` ≠ `.index` — the reference's own README example
      // (R/mutate.R:96-101 orders by Day while ranging over date_col).
      // Policy (SURVEY §7.4 risk 2): the range window orders on the
      // INDEX; frame membership depends only on the index, so the
      // result is provably identical for ANY `.order_by`. Pinned here
      // (r07 verdict item 3): same frame as window_range_index but
      // passing a deliberately different `.order_by`; the oracle's
      // standard index-ordered RANGE window must hash-match.
      events(s, dir)
        .mutateW("trail_avg" -> avg(col("value")))(
          by = Seq(col("user_id")),
          orderBy = Seq(col("value").desc, col("event_id")), // ≠ .index
          frame = Some(Frame.days(7, -1)),
          index = Some(tsDate))
        .select(col("event_id"), r4(col("trail_avg")).as("trail_avg"))
    }),
    "window_range_seconds" -> ((s, dir) => {
      // Seconds-granularity Period frame: trailing hour per user,
      // current second excluded. Index = exact integer epoch-seconds
      // (ts div 1e9 on the nanos long ≡ DuckDB epoch_ns // 1e9).
      events(s, dir)
        .mutateW("trail_avg" -> avg(col("value")))(
          by = Seq(col("user_id")),
          frame = Some(Frame.seconds(3600, -1)),
          index = Some(expr("ts div 1000000000")))
        .select(col("event_id"), r4(col("trail_avg")).as("trail_avg"))
    }),
    "window_overwrite" -> ((s, dir) => {
      // Same-name column replacement (tests_tidier.R:162-269).
      t(s, dir, "lineitem")
        .mutateW("l_quantity" -> avg(col("l_quantity")))(
          by = Seq(col("l_returnflag")),
          orderBy = Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
            col("l_partkey"), col("l_suppkey")),
          frame = Some(Frame.rows(2, 0)))
        .select(col("l_orderkey"), col("l_linenumber"),
          r4(col("l_quantity")).as("l_quantity"))
    }),
    "window_complete" -> ((s, dir) => {
      // `.complete = TRUE` NULL-gating (R/mutate.R:58-62; no ref test).
      events(s, dir)
        .mutateW("avg_v" -> avg(col("value")))(
          by = Seq(col("user_id")),
          orderBy = Seq(col("ts"), col("event_id")),
          frame = Some(Frame.rows(2, 2)),
          complete = true)
        .select(col("event_id"), r4(col("avg_v")).as("avg_v"))
    }),
    "window_multi_expr" -> ((s, dir) => {
      // ≥2 expressions sharing ONE frame (R/mutate.R:133 quosure splice) —
      // CollapseWindow must merge these into a single WindowExec.
      events(s, dir)
        .mutateW(
          "sum_v" -> sum(col("value")),
          "avg_v" -> avg(col("value")),
          "n_v"   -> count(lit(1)),
          "min_v" -> min(col("value")),
          "max_v" -> max(col("value")))(
          by = Seq(col("user_id")),
          orderBy = Seq(col("ts"), col("event_id")),
          frame = Some(Frame.rows(3, 0)))
        .select(col("event_id"), r4(col("sum_v")).as("sum_v"),
          r4(col("avg_v")).as("avg_v"), col("n_v").cast("long").as("n_v"),
          col("min_v"), col("max_v"))
    }),
    "window_product" -> ((s, dir) => {
      // Custom product aggregate over a window frame — the reference's
      // "any R expr per slice" (e.g. prod). Two tiers ship: the typed
      // Aggregator/udaf (functions/ProductAgg, spec-tested) and this
      // native DeclarativeAggregate (ProductExpr), which WindowExec
      // re-evaluates per sliding frame without the udaf's per-update
      // encoder round-trip (11.6s -> builtin-priced in BENCH_r01).
      // Oracle is DuckDB's native product().
      t(s, dir, "lineitem")
        .mutateW("tax_factor" ->
          graft.functions.ProductAgg.productDecl(lit(1.0) + col("l_tax")))(
          by = Seq(col("l_returnflag")),
          orderBy = Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
            col("l_partkey"), col("l_suppkey")),
          frame = Some(Frame.rows(2, 0)))
        .select(col("l_orderkey"), col("l_linenumber"),
          r4(col("tax_factor")).as("tax_factor"))
    }),
    "asof_join_daily" -> ((s, dir) => {
      // As-of join (union-and-sweep, one shuffle — operators/AsofJoin):
      // each event picks up the PREVIOUS day's per-user mean (strict
      // backward match). Oracle is DuckDB's native ASOF LEFT JOIN.
      val ev = events(s, dir).select(col("event_id"), col("user_id"),
        col("value"), expr("ts div 86400000000000").as("day"))
      val daily = ev.groupBy("user_id", "day")
        .agg(r4(avg(col("value"))).as("prev_mean"))
      graft.operators.AsofJoin.asofBackward(
          ev.select("event_id", "user_id", "day"), daily,
          keys = Seq("user_id"), leftTime = "day", rightTime = "day",
          valueCols = Seq("prev_mean"), strict = true,
          matchedTimeCol = "prev_day")
        .select(col("event_id"), col("prev_day"), col("prev_mean"))
    }),
    "asof_tolerance_daily" -> ((s, dir) => {
      // Backward as-of with a TOLERANCE window (pandas merge_asof
      // semantics): matches farther than 3 days back are nulled. Same
      // union-and-sweep plan as asof_join_daily; the tolerance is a
      // post-sweep gate, not a join-condition rescan.
      val ev = events(s, dir).select(col("event_id"), col("user_id"),
        col("value"), expr("ts div 86400000000000").as("day"))
      val daily = ev.groupBy("user_id", "day")
        .agg(r4(avg(col("value"))).as("prev_mean"))
      graft.operators.AsofJoin.asofBackward(
          ev.select("event_id", "user_id", "day"), daily,
          keys = Seq("user_id"), leftTime = "day", rightTime = "day",
          valueCols = Seq("prev_mean"), strict = true,
          tolerance = Some(lit(3L)), matchedTimeCol = "prev_day")
        .select(col("event_id"), col("prev_day"), col("prev_mean"))
    }),
    "attribution_last_touch" -> ((s, dir) => {
      // LAST-TOUCH ATTRIBUTION: each purchase credits the user's latest
      // click STRICTLY before it, within a 24h window — the standard
      // marketing join, expressed as the as-of operator on raw event
      // streams (one union-and-sweep shuffle; no per-user sort-merge
      // reinvention, no range self-join). Right-side ts ties collapse
      // to a canonical click FIRST (max event_id per (user, ts)) so
      // the match is well-defined in both engines.
      val e = events(s, dir)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = e.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts").as("click_ts"))
        .agg(max(col("event_id")).as("click_id"))
      graft.operators.AsofJoin.asofBackward(
          purchases, clicks,
          keys = Seq("user_id"), leftTime = "ts", rightTime = "click_ts",
          valueCols = Seq("click_id"), strict = true,
          tolerance = Some(lit(86400000000000L)), // 24h in nanos
          matchedTimeCol = "click_at")
        .select(col("event_id"), col("click_id"), col("click_at"))
    }),
    "asof_nearest_daily" -> ((s, dir) => {
      // NEAREST as-of (pandas merge_asof direction='nearest' — the third
      // direction, completing backward/forward/tolerance): each event
      // picks the CLOSER of the previous and next day's per-user mean,
      // backward preferred on equal distance. Two union-and-sweep
      // passes, still O(n) per key (AsofJoin.asofNearest).
      val ev = events(s, dir).select(col("event_id"), col("user_id"),
        col("value"), expr("ts div 86400000000000").as("day"))
      val daily = ev.groupBy("user_id", "day")
        .agg(r4(avg(col("value"))).as("near_mean"))
      graft.operators.AsofJoin.asofNearest(
          ev.select("event_id", "user_id", "day"), daily,
          keys = Seq("user_id"), leftTime = "day", rightTime = "day",
          valueCols = Seq("near_mean"), strict = true,
          matchedTimeCol = "near_day")
        .select(col("event_id"), col("near_day"), col("near_mean"))
    }),
    "window_range_months" -> ((s, dir) => {
      // CALENDAR-month Period frame ([add_months(d,-1), d] per user) —
      // the reference accepts months(k) Periods, whose per-row clamped
      // widths rangeBetween cannot express. operators/CalendarWindow
      // renders it as prefix sums + a strict backward as-of at each
      // row's boundary (O(n log n)), not a quadratic range self-join;
      // the oracle IS the quadratic self-join, so the rewrite must be
      // value-identical.
      graft.operators.CalendarWindow.trailingMonths(
          events(s, dir).select(col("event_id"), col("user_id"),
            col("value"), tsDate.as("d")),
          by = Seq("user_id"), index = col("d"),
          valueCol = "value", months = 1)
        .select(col("event_id"), col("win_cnt"),
          r4(col("win_avg")).as("win_avg"))
    }),
    "window_range_months_offset" -> ((s, dir) => {
      // GENERAL month Period frame c(months(2), months(-1)) — the
      // reference's c(days(7), days(-1)) example shape (R/mutate.R:98-100)
      // at month granularity (R/mutate.R:164-165 admits any Period pair):
      // window [add_months(d,-2), add_months(d,-1)], current month
      // EXCLUDED. Routed through mutateW → CalendarWindow.monthsAgg
      // (prefix sums + two as-of boundary lookups; min/max ride the
      // daily-partial expansion join) — O(n log n), vs the oracle's
      // quadratic pair scan.
      events(s, dir).select(col("event_id"), col("user_id"),
          col("value"), tsDate.as("d"))
        .mutateW("win_cnt" -> count(col("value")),
            "win_avg" -> avg(col("value")),
            "win_max" -> max(col("value")))(
          by = Seq(col("user_id")),
          frame = Some(Frame.months(2, -1)),
          index = Some(col("d")))
        .select(col("event_id"), col("win_cnt"),
          r4(col("win_avg")).as("win_avg"), col("win_max"))
    }),
    "window_complete_months" -> ((s, dir) => {
      // `.complete = TRUE` over a MONTH Period frame: complete iff the
      // window's value span [add_months(d,-1), d] lies inside the user's
      // observed index span — the months analogue of
      // window_complete_range, gating CalendarWindow.monthsAgg's gate
      // branch in the oracle harness (previously spec-only).
      events(s, dir).select(col("event_id"), col("user_id"),
          col("value"), tsDate.as("d"))
        .mutateW("c_cnt" -> count(col("value")),
            "c_avg" -> avg(col("value")))(
          by = Seq(col("user_id")),
          frame = Some(Frame.months(1, 0)),
          index = Some(col("d")), complete = true)
        .select(col("event_id"), col("c_cnt"),
          r4(col("c_avg")).as("c_avg"))
    }),
    "window_range_months_std" -> ((s, dir) => {
      // Second-moment aggregates over a MONTH Period frame: stddev/
      // variance are prefix-decomposable via a sum-of-squares running
      // column, so they ride CalendarWindow's O(n log n) prefix+as-of
      // path (one extra prefix column), not the reference's per-slice
      // re-aggregation (R/mutate.R:208,586 evaluates any R fn per
      // window — O(n·w)). Oracle = quadratic pair scan with
      // stddev_samp/var_samp.
      events(s, dir).select(col("event_id"), col("user_id"),
          col("value"), tsDate.as("d"))
        .mutateW("win_cnt" -> count(col("value")),
            "win_std" -> stddev(col("value")),
            "win_var" -> variance(col("value")))(
          by = Seq(col("user_id")),
          frame = Some(Frame.months(1, 0)),
          index = Some(col("d")))
        .select(col("event_id"), col("win_cnt"),
          r4(col("win_std")).as("win_std"),
          r4(col("win_var")).as("win_var"))
    }),
    "window_range_months_median" -> ((s, dir) => {
      // NON-prefix-decomposable aggregate over a month Period frame:
      // median has no running form, so mutateW routes it to
      // CalendarWindow's grouped quantile SWEEP (round-9: one hash
      // repartition of per-day partials, per-group two-pointer window
      // merge — replacing the raw-row expansion join, 10.2s → 2.3s at
      // sf1) while the count in the same set rides the prefix+as-of
      // path. Exact interpolated median matches DuckDB's. NOTE the
      // Column-API `median(col)` — `expr("median(value)")` parses to a
      // SqlExpression node the NSE router cannot inspect, silently
      // falling back to the general expansion path.
      events(s, dir).select(col("event_id"), col("user_id"),
          col("value"), tsDate.as("d"))
        .mutateW("med_v" -> median(col("value")),
            "n_all" -> count(lit(1)))(
          by = Seq(col("user_id")),
          frame = Some(Frame.months(1, 0)),
          index = Some(col("d")))
        .select(col("event_id"), r4(col("med_v")).as("med_v"), col("n_all"))
    }),
    "window_range_weeks" -> ((s, dir) => {
      // weeks(k) Period sugar — the reference accepts ANY lubridate
      // Period (R/mutate.R:164-165); a week is exactly 7 days under
      // Period arithmetic, so Frame.weeks(1, 0) ≡ days(7, 0) and routes
      // through the plain rangeBetween path. Pins the constructor
      // algebra end-to-end.
      events(s, dir)
        .mutateW("w_cnt" -> count(col("value")),
            "w_sum" -> sum(col("value")))(
          by = Seq(col("user_id")),
          frame = Some(Frame.weeks(1, 0)),
          index = Some(tsDate))
        .select(col("event_id"), col("w_cnt"), r4(col("w_sum")).as("w_sum"))
    }),
    "window_range_years" -> ((s, dir) => {
      // years(k) Period sugar — 12 calendar months per year under
      // lubridate Period arithmetic (clamping included), so
      // Frame.years(1, 0) ≡ months(12, 0) and routes through
      // CalendarWindow's prefix+as-of path. Runs on ORDERS (7-year date
      // span; events span only 30 days, where a year frame would
      // degenerate to the cumulative window). Trailing-year order
      // count + spend per customer.
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          to_date(col("o_orderdate")).as("d"))
        .mutateW("y_cnt" -> count(col("o_totalprice")),
            "y_sum" -> sum(col("o_totalprice")))(
          by = Seq(col("o_custkey")),
          frame = Some(Frame.years(1, 0)),
          index = Some(col("d")))
        .select(col("o_orderkey"), col("y_cnt"), r4(col("y_sum")).as("y_sum"))
    }),
    "window_range_hours" -> ((s, dir) => {
      // hours(k) Period sugar — Frame.hours(6, 0) ≡ seconds(21600, 0),
      // sub-day granularity on the same rangeBetween path
      // window_range_seconds exercises; pins the hours/minutes
      // constructor algebra end-to-end (reference any-Period contract,
      // R/mutate.R:164-165).
      events(s, dir)
        .mutateW("h_max" -> max(col("value")))(
          by = Seq(col("user_id")),
          frame = Some(Frame.hours(6, 0)),
          index = Some(expr("ts div 1000000000")))
        .select(col("event_id"), r4(col("h_max")).as("h_max"))
    }),
    "window_range_months_days" -> ((s, dir) => {
      // COMPOUND Period frame c(months(1) + days(3), days(-2)) — legal
      // lubridate, accepted by the reference's class check
      // (R/mutate.R:164-165). Boundary algebra composes:
      // [date_add(add_months(d,-1),-3), date_add(d,-2)] — the current
      // row sits OUTSIDE its own window, so single-event users have
      // empty windows (0 cnt / NULL avg). Exercises both day-offset
      // boundaries and the hi as-of sweep.
      events(s, dir).select(col("event_id"), col("user_id"),
          col("value"), tsDate.as("d"))
        .mutateW("md_cnt" -> count(col("value")),
            "md_avg" -> avg(col("value")))(
          by = Seq(col("user_id")),
          frame = Some(Frame.monthsDays(1, 3, 0, -2)),
          index = Some(col("d")))
        .select(col("event_id"), col("md_cnt"), r4(col("md_avg")).as("md_avg"))
    }),
    "window_range_months_strict" -> ((s, dir) => {
      // STRICT-lubridate month mode (Frame.monthsStrict / Frame.strict):
      // lubridate Period arithmetic yields NA for nonexistent dates
      // (ymd("2023-03-31") - months(1) = NA — no Feb 31), so the
      // reference's window for that row is UNDEFINED; default
      // CalendarWindow uses warehouse add_months clamping (documented
      // semantic delta, SURVEY §2.5). This key gates the bit-faithful
      // replay: rows whose boundary clamped (day-of-month shrank) get
      // NULL for every output. Runs on ORDERS (7-year span — events
      // cover only Jan 1-30, where a 1-month lookback never clamps);
      // sums ride the decimal-exact scheme (§5.1).
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice").cast("decimal(11,2)").as("p"),
          to_date(col("o_orderdate")).as("d"))
        .mutateW("m_cnt" -> count(col("p")), "m_sum" -> sum(col("p")))(
          by = Seq(col("o_custkey")),
          frame = Some(Frame.monthsStrict(1, 0)),
          index = Some(col("d")))
        .select(col("o_orderkey"), col("m_cnt"),
          r4(col("m_sum").cast("double")).as("m_sum"))
    }),
    "window_range_months_hours" -> ((s, dir) => {
      // COMPOUND months+SUB-DAY Period frame c(months(1) + hours(6),
      // hours(-12)) — the last Period shape the reference's class check
      // accepts (R/mutate.R:164-165) that needed a path: months mixed
      // with hours. Boundary = (ts − 1 month) − 6 h … ts − 12 h (month
      // shift clamps preserving time-of-day; lubridate applies Period
      // components months-first). Orders are spread inside the day by a
      // deterministic o_orderkey-derived second offset so BOTH sub-day
      // endpoints bite (midnight-only data would make the hours parts
      // invisible); the current row sits outside its own window.
      // Session tz pinned to UTC so the NTZ→LTZ cast in
      // CalendarWindow.monthsSecondsAgg is DST-free and the oracle's
      // naive timestamp arithmetic matches exactly.
      s.conf.set("spark.sql.session.timeZone", "UTC")
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice").cast("decimal(11,2)").as("p"),
          expr("o_orderdate + make_interval(0,0,0,0,0,0, o_orderkey % 86400)")
            .as("ts2"))
        .mutateW("mh_cnt" -> count(col("p")), "mh_sum" -> sum(col("p")))(
          by = Seq(col("o_custkey")),
          frame = Some(Frame.monthsHours(1, 6, 0, -12)),
          index = Some(col("ts2")))
        .select(col("o_orderkey"), col("mh_cnt"),
          r4(col("mh_sum").cast("double")).as("mh_sum"))
    }),
    "window_complete_months_hours" -> ((s, dir) => {
      // `.complete = TRUE` on the months+SUB-DAY compound path (round
      // 15, r14 verdict item 7): the gate branch of
      // CalendarWindow.monthsSecondsAgg (:789) existed in code but had
      // no oracle key — window_complete{,_range,_months} cover the
      // rows/range/months branches only. Same fixture as
      // window_range_months_hours (orders spread inside the day by an
      // o_orderkey-derived second offset, UTC-pinned); a window is
      // complete iff its VALUE span [(ts−1mo)−6h, ts−12h] lies inside
      // the customer's observed ts2 span, else every output is NULL.
      s.conf.set("spark.sql.session.timeZone", "UTC")
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice").cast("decimal(11,2)").as("p"),
          expr("o_orderdate + make_interval(0,0,0,0,0,0, o_orderkey % 86400)")
            .as("ts2"))
        .mutateW("mhc_cnt" -> count(col("p")), "mhc_sum" -> sum(col("p")))(
          by = Seq(col("o_custkey")),
          frame = Some(Frame.monthsHours(1, 6, 0, -12)),
          index = Some(col("ts2")), complete = true)
        .select(col("o_orderkey"), col("mhc_cnt"),
          r4(col("mhc_sum").cast("double")).as("mhc_sum"))
    }),
    "window_complete_range" -> ((s, dir) => {
      // `.complete = TRUE` over a RANGE (Period) frame: the window is
      // complete iff its VALUE span [day-3, day] lies inside the
      // partition's observed index span (slider's slide_index contract —
      // edge truncation, not gap density). Pins the range branch of the
      // TidierOps gate in the oracle harness (window_complete covers the
      // rows branch).
      events(s, dir)
        .mutateW("avg_v" -> avg(col("value")))(
          by = Seq(col("user_id")),
          frame = Some(Frame.days(3, 0)),
          index = Some(tsDate),
          complete = true)
        .select(col("event_id"), r4(col("avg_v")).as("avg_v"))
    }),
    "range_join_firstweek" -> ((s, dir) => {
      // Binned range join (operators/RangeJoin): events falling inside
      // each user's first active week — equi join on (user, bin) + exact
      // recheck, not a nested-loop range scan.
      val ev = events(s, dir).select(col("event_id"), col("user_id"),
        expr("ts div 86400000000000").as("day"))
      val firstWeek = ev.groupBy("user_id").agg(min(col("day")).as("lo"))
        .withColumn("hi", col("lo") + 7)
      graft.operators.RangeJoin.intervalJoin(ev, firstWeek,
          Seq("user_id"), "day", "lo", "hi", binWidth = 7)
        .select(col("event_id"), col("lo"), col("hi"))
    }),
    "window_range_numeric" -> ((s, dir) => {
      // UNITLESS numeric range frame (slide_index over a non-time index,
      // R/mutate.R:55-56): per-nation sliding value-window over account
      // balance, [bal-1000, bal-10] — asymmetric with a NEGATIVE after
      // endpoint, so the current row sits outside its own window. Empty
      // windows → 0 cnt / NULL avg. RANGE frames include order-key peers,
      // so the result is deterministic without a tiebreaker.
      t(s, dir, "customer")
        .mutateW("n_win" -> count(col("c_acctbal")),
            "avg_win" -> avg(col("c_acctbal")))(
          by = Seq(col("c_nationkey")),
          frame = Some(Frame.range(1000, -10)),
          index = Some(col("c_acctbal")))
        .select(col("c_custkey"), col("n_win"),
          r4(col("avg_win")).as("avg_win"))
    }),
    "window_noby_frame" -> ((s, dir) => {
      // Path 2: frame without partition — single-partition global window;
      // kept on the 25-row `nation` table by design (SURVEY §4.2 scale note).
      t(s, dir, "nation")
        .mutateW("cum_key" -> sum(col("n_nationkey")))(
          orderBy = Seq(col("n_nationkey")),
          frame = Some(Frame(FrameEndpoint.Unbounded, FrameEndpoint.Rows(0))))
        .select("n_nationkey", "cum_key")
    })
  )

  private val coreOracleSql: Map[String, String] = Map(
    "mutate_plain" ->
      """SELECT l_orderkey, l_linenumber,
         round(l_extendedprice * (1 - l_discount), 4) AS revenue
         FROM lineitem""",
    "mutate_grouped" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag,
         round(1e-9 + avg(l_extendedprice) OVER (PARTITION BY l_returnflag), 4) AS avg_price
         FROM lineitem""",
    "order_cumsum" ->
      """SELECT l_orderkey, l_linenumber,
         round(1e-9 + sum(l_quantity) OVER (PARTITION BY l_returnflag
           ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey, l_suppkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS cum_qty
         FROM lineitem""",
    "order_desc_multi" ->
      """SELECT o_orderkey,
         row_number() OVER (PARTITION BY o_orderpriority
           ORDER BY o_totalprice DESC, o_orderkey) AS rn
         FROM orders""",
    "window_rows_unbounded" ->
      """SELECT l_orderkey, l_linenumber,
         round(1e-9 + CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5)
             AS BIGINT)) OVER w AS DOUBLE) / (count(*) OVER w * 100.0), 4)
           AS run_avg
         FROM lineitem
         WINDOW w AS (PARTITION BY l_returnflag
           ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey, l_suppkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""",
    "window_rows_sym" ->
      """SELECT event_id,
         round(1e-9 + avg(value) OVER (PARTITION BY user_id
           ORDER BY ts, event_id
           ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING), 4) AS avg_v
         FROM events""",
    "window_range_index" ->
      """SELECT event_id,
         round(1e-9 + avg(value) OVER (PARTITION BY user_id
           ORDER BY date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
           RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING), 4) AS trail_avg
         FROM events""",
    // identical to window_range_index BY DESIGN: `.order_by` must not
    // change a range window's values (frame membership is an index-only
    // function)
    "window_orderby_neq_index" ->
      """SELECT event_id,
         round(1e-9 + avg(value) OVER (PARTITION BY user_id
           ORDER BY date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
           RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING), 4) AS trail_avg
         FROM events""",
    "window_range_seconds" ->
      """SELECT event_id,
         round(1e-9 + avg(value) OVER (PARTITION BY user_id
           ORDER BY epoch_ns(ts) // 1000000000
           RANGE BETWEEN 3600 PRECEDING AND 1 PRECEDING), 4) AS trail_avg
         FROM events""",
    "window_overwrite" ->
      """SELECT l_orderkey, l_linenumber,
         round(1e-9 + avg(l_quantity) OVER (PARTITION BY l_returnflag
           ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey, l_suppkey
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS l_quantity
         FROM lineitem""",
    "window_complete" ->
      """SELECT event_id,
         CASE WHEN count(*) OVER w = 5
              THEN round(1e-9 + avg(value) OVER w, 4) END AS avg_v
         FROM events
         WINDOW w AS (PARTITION BY user_id
           ORDER BY ts, event_id
           ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)""",
    "window_multi_expr" ->
      """SELECT event_id,
         round(1e-9 + sum(value) OVER w, 4) AS sum_v,
         round(1e-9 + avg(value) OVER w, 4) AS avg_v,
         count(*) OVER w AS n_v,
         min(value) OVER w AS min_v,
         max(value) OVER w AS max_v
         FROM events
         WINDOW w AS (PARTITION BY user_id
           ORDER BY ts, event_id
           ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)""",
    "window_noby_frame" ->
      """SELECT n_nationkey,
         CAST(sum(n_nationkey) OVER (ORDER BY n_nationkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_key
         FROM nation""",
    "window_product" ->
      """SELECT l_orderkey, l_linenumber,
         round(1e-9 + product(1.0 + l_tax) OVER (PARTITION BY l_returnflag
           ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey, l_suppkey
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS tax_factor
         FROM lineitem""",
    "range_join_firstweek" ->
      """WITH e AS (SELECT event_id, user_id,
           date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day
           FROM events),
         f AS (SELECT user_id, min(day) AS lo, min(day) + 7 AS hi
           FROM e GROUP BY 1)
         SELECT e.event_id, f.lo, f.hi
         FROM e JOIN f ON e.user_id = f.user_id
           AND e.day BETWEEN f.lo AND f.hi""",
    "asof_nearest_daily" ->
      """WITH e AS (SELECT event_id, user_id, value,
           date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day
           FROM events),
         daily AS (SELECT user_id, day, round(1e-9 + avg(value), 4) AS m
           FROM e GROUP BY 1, 2),
         b AS (SELECT e.event_id, d.day AS bday, d.m AS bm
           FROM e ASOF LEFT JOIN daily d
             ON e.user_id = d.user_id AND e.day > d.day),
         f AS (SELECT e.event_id, d.day AS fday, d.m AS fm
           FROM e ASOF LEFT JOIN daily d
             ON e.user_id = d.user_id AND e.day < d.day)
         SELECT e.event_id,
           CASE WHEN bday IS NOT NULL AND (fday IS NULL
                  OR e.day - bday <= fday - e.day)
             THEN bday ELSE fday END AS near_day,
           CASE WHEN bday IS NOT NULL AND (fday IS NULL
                  OR e.day - bday <= fday - e.day)
             THEN bm ELSE fm END AS near_mean
         FROM e JOIN b USING (event_id) JOIN f USING (event_id)""",
    "asof_tolerance_daily" ->
      """WITH e AS (SELECT event_id, user_id, value,
           date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day
           FROM events),
         daily AS (SELECT user_id, day, round(1e-9 + avg(value), 4) AS prev_mean
           FROM e GROUP BY 1, 2),
         j AS (SELECT e.event_id, e.day, d.day AS md, d.prev_mean AS pm
           FROM e ASOF LEFT JOIN daily d
             ON e.user_id = d.user_id AND e.day > d.day)
         SELECT event_id,
           CASE WHEN day - md <= 3 THEN md END AS prev_day,
           CASE WHEN day - md <= 3 THEN pm END AS prev_mean
         FROM j""",
    "attribution_last_touch" ->
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_ns(ts) AS tsn
           FROM events),
         p AS (SELECT event_id, user_id, tsn FROM e
           WHERE event_type = 'purchase'),
         c AS (SELECT user_id, tsn AS click_tsn, max(event_id) AS click_id
           FROM e WHERE event_type = 'click' GROUP BY 1, 2),
         j AS (SELECT p.event_id, p.tsn, c.click_tsn, c.click_id
           FROM p ASOF LEFT JOIN c
             ON p.user_id = c.user_id AND p.tsn > c.click_tsn)
         SELECT event_id,
           CASE WHEN tsn - click_tsn <= 86400000000000 THEN click_id END
             AS click_id,
           CASE WHEN tsn - click_tsn <= 86400000000000 THEN click_tsn END
             AS click_at
         FROM j""",
    "window_range_numeric" ->
      """SELECT c_custkey, count(c_acctbal) OVER w AS n_win,
           round(1e-9 + avg(c_acctbal) OVER w, 4) AS avg_win
         FROM customer
         WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal
           RANGE BETWEEN 1000 PRECEDING AND 10 PRECEDING)""",
    "window_range_months" ->
      """WITH e AS (SELECT event_id, user_id, value, CAST(ts AS DATE) AS d
           FROM events)
         SELECT a.event_id, count(b.value) AS win_cnt,
           round(1e-9 + avg(b.value), 4) AS win_avg
         FROM e a JOIN e b ON a.user_id = b.user_id
           AND b.d BETWEEN CAST(a.d - INTERVAL 1 MONTH AS DATE) AND a.d
         GROUP BY 1""",
    "window_range_months_offset" ->
      """WITH e AS (SELECT event_id, user_id, value, CAST(ts AS DATE) AS d
           FROM events)
         SELECT a.event_id, count(b.value) AS win_cnt,
           round(1e-9 + avg(b.value), 4) AS win_avg,
           max(b.value) AS win_max
         FROM e a LEFT JOIN e b ON a.user_id = b.user_id
           AND b.d BETWEEN CAST(a.d - INTERVAL 2 MONTH AS DATE)
                       AND CAST(a.d - INTERVAL 1 MONTH AS DATE)
         GROUP BY 1""",
    "window_range_months_std" ->
      """WITH e AS (SELECT event_id, user_id, value, CAST(ts AS DATE) AS d
           FROM events)
         SELECT a.event_id, count(b.value) AS win_cnt,
           round(1e-9 + stddev_samp(b.value), 4) AS win_std,
           round(1e-9 + var_samp(b.value), 4) AS win_var
         FROM e a JOIN e b ON a.user_id = b.user_id
           AND b.d BETWEEN CAST(a.d - INTERVAL 1 MONTH AS DATE) AND a.d
         GROUP BY 1""",
    "window_range_months_median" ->
      """WITH e AS (SELECT event_id, user_id, value, CAST(ts AS DATE) AS d
           FROM events)
         SELECT a.event_id,
           round(1e-9 + median(b.value), 4) AS med_v,
           count(*) AS n_all
         FROM e a JOIN e b ON a.user_id = b.user_id
           AND b.d BETWEEN CAST(a.d - INTERVAL 1 MONTH AS DATE) AND a.d
         GROUP BY 1""",
    "window_range_hours" ->
      """SELECT event_id,
         round(1e-9 + max(value) OVER (PARTITION BY user_id
           ORDER BY epoch_ns(ts) // 1000000000
           RANGE BETWEEN 21600 PRECEDING AND CURRENT ROW), 4) AS h_max
         FROM events""",
    "window_range_weeks" ->
      """WITH e AS (SELECT event_id, user_id, value,
           date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day
           FROM events)
         SELECT event_id, count(value) OVER w AS w_cnt,
           round(1e-9 + sum(value) OVER w, 4) AS w_sum
         FROM e
         WINDOW w AS (PARTITION BY user_id ORDER BY day
           RANGE BETWEEN 7 PRECEDING AND CURRENT ROW)""",
    "window_range_years" ->
      """WITH o AS (SELECT o_orderkey, o_custkey, o_totalprice,
           CAST(o_orderdate AS DATE) AS d FROM orders)
         SELECT a.o_orderkey, count(b.o_totalprice) AS y_cnt,
           round(1e-9 + sum(b.o_totalprice), 4) AS y_sum
         FROM o a LEFT JOIN o b ON a.o_custkey = b.o_custkey
           AND b.d BETWEEN CAST(a.d - INTERVAL 12 MONTH AS DATE) AND a.d
         GROUP BY 1""",
    "window_range_months_days" ->
      """WITH e AS (SELECT event_id, user_id, value, CAST(ts AS DATE) AS d
           FROM events)
         SELECT a.event_id, count(b.value) AS md_cnt,
           round(1e-9 + avg(b.value), 4) AS md_avg
         FROM e a LEFT JOIN e b ON a.user_id = b.user_id
           AND b.d BETWEEN CAST(a.d - INTERVAL 1 MONTH AS DATE) - 3
                       AND a.d - 2
         GROUP BY 1""",
    "window_range_months_strict" ->
      """WITH o AS (SELECT o_orderkey, o_custkey,
           CAST(o_totalprice AS DECIMAL(11,2)) AS p,
           CAST(o_orderdate AS DATE) AS d FROM orders)
         SELECT a.o_orderkey,
           CASE WHEN day(CAST(a.d - INTERVAL 1 MONTH AS DATE)) <> day(a.d)
             THEN NULL ELSE count(b.p) END AS m_cnt,
           CASE WHEN day(CAST(a.d - INTERVAL 1 MONTH AS DATE)) <> day(a.d)
             THEN NULL
             ELSE round(1e-9 + CAST(sum(b.p) AS DOUBLE), 4) END AS m_sum
         FROM o a LEFT JOIN o b ON a.o_custkey = b.o_custkey
           AND b.d BETWEEN CAST(a.d - INTERVAL 1 MONTH AS DATE) AND a.d
         GROUP BY a.o_orderkey, a.d""",
    "window_range_months_hours" ->
      """WITH o AS (SELECT o_orderkey, o_custkey,
           CAST(o_totalprice AS DECIMAL(11,2)) AS p,
           o_orderdate + INTERVAL (o_orderkey % 86400) SECOND AS ts2
         FROM orders)
         SELECT a.o_orderkey, count(b.p) AS mh_cnt,
           round(1e-9 + CAST(sum(b.p) AS DOUBLE), 4) AS mh_sum
         FROM o a LEFT JOIN o b ON a.o_custkey = b.o_custkey
           AND b.ts2 BETWEEN a.ts2 - INTERVAL 1 MONTH - INTERVAL 6 HOUR
                         AND a.ts2 - INTERVAL 12 HOUR
         GROUP BY 1""",
    // quadratic pair scan + span-containment gate, the months+sub-day
    // compound twin of window_complete_months's oracle (o MATERIALIZED:
    // referenced three times — DuckDB inlines CTEs per reference)
    "window_complete_months_hours" ->
      """WITH o AS MATERIALIZED (SELECT o_orderkey, o_custkey,
           CAST(o_totalprice AS DECIMAL(11,2)) AS p,
           o_orderdate + INTERVAL (o_orderkey % 86400) SECOND AS ts2
         FROM orders),
         s AS (SELECT o_custkey, min(ts2) AS tmin, max(ts2) AS tmax
           FROM o GROUP BY 1)
         SELECT a.o_orderkey,
           CASE WHEN a.ts2 - INTERVAL 1 MONTH - INTERVAL 6 HOUR >= s.tmin
                 AND a.ts2 - INTERVAL 12 HOUR <= s.tmax
                THEN count(b.p) END AS mhc_cnt,
           CASE WHEN a.ts2 - INTERVAL 1 MONTH - INTERVAL 6 HOUR >= s.tmin
                 AND a.ts2 - INTERVAL 12 HOUR <= s.tmax
                THEN round(1e-9 + CAST(sum(b.p) AS DOUBLE), 4)
           END AS mhc_sum
         FROM o a
         JOIN s ON a.o_custkey = s.o_custkey
         LEFT JOIN o b ON a.o_custkey = b.o_custkey
           AND b.ts2 BETWEEN a.ts2 - INTERVAL 1 MONTH - INTERVAL 6 HOUR
                         AND a.ts2 - INTERVAL 12 HOUR
         GROUP BY a.o_orderkey, a.ts2, s.tmin, s.tmax""",
    "window_complete_months" ->
      """WITH e AS (SELECT event_id, user_id, value, CAST(ts AS DATE) AS d
           FROM events),
         s AS (SELECT user_id, min(d) AS dmin, max(d) AS dmax
           FROM e GROUP BY 1)
         SELECT a.event_id,
           CASE WHEN CAST(a.d - INTERVAL 1 MONTH AS DATE) >= s.dmin
                 AND a.d <= s.dmax THEN count(b.value) END AS c_cnt,
           CASE WHEN CAST(a.d - INTERVAL 1 MONTH AS DATE) >= s.dmin
                 AND a.d <= s.dmax
                THEN round(1e-9 + avg(b.value), 4) END AS c_avg
         FROM e a
         JOIN s ON a.user_id = s.user_id
         LEFT JOIN e b ON a.user_id = b.user_id
           AND b.d BETWEEN CAST(a.d - INTERVAL 1 MONTH AS DATE) AND a.d
         GROUP BY a.event_id, s.dmin, s.dmax, a.d""",
    "window_complete_range" ->
      """WITH e AS (SELECT event_id, user_id, value,
           date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day
           FROM events)
         SELECT event_id,
           CASE WHEN day - 3 >= min(day) OVER u AND day <= max(day) OVER u
                THEN round(1e-9 + avg(value) OVER w, 4) END AS avg_v
         FROM e
         WINDOW u AS (PARTITION BY user_id),
           w AS (PARTITION BY user_id ORDER BY day
             RANGE BETWEEN 3 PRECEDING AND 0 FOLLOWING)""",
    "asof_join_daily" ->
      """WITH e AS (SELECT event_id, user_id, value,
           date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day
           FROM events),
         daily AS (SELECT user_id, day, round(1e-9 + avg(value), 4) AS prev_mean
           FROM e GROUP BY 1, 2)
         SELECT e.event_id, d.day AS prev_day, d.prev_mean
         FROM e ASOF LEFT JOIN daily d
           ON e.user_id = d.user_id AND e.day > d.day"""
  )
}
