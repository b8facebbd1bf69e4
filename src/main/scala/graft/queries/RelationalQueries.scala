package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational-surface inventory (SURVEY.md §2.4 checklist rows that the
  * reference delegates to its host ecosystem): grouped aggregation with
  * exact quantiles, CUBE grouping sets, set operations, semi/anti joins,
  * and the ranking/analytic window-function family. All built-in Spark —
  * the point of these queries is oracle-gated proof that the engine
  * covers the checklist, with plans that scale (hash aggs, broadcastable
  * joins, one window pass).
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    QueryUtil.t(s, dir, name)

  private def r4(c: Column): Column = QueryUtil.r4(c)

  /** Exact moment sums for `agg_moments`/`agg_regression`, computed on
    * the long fast path (round-7 verdict item 7). The decimal-exact
    * rewrite's wide `sum(decimal)` accumulators (precision > 18) left
    * Spark's compact-long decimal representation — every map-side
    * partial update allocated a BigInteger, a measured ~2x on these
    * keys. Same exact values, different route: cent-scale the inputs to
    * LONG (decimal(.,2) * 100 is value-exact; terms ≤ 1.2e14 < 2^47),
    * accumulate Σx Σy Σxy Σx² Σy² with [[graft.functions.SumL128Expr]]
    * (three codegen'd long ops per row, exact to 2^123 ≈ 1e37 — no
    * overflow at any physical scale), then rescale ONCE PER GROUP into
    * the exact decimal types the oracle SQL's replay contract fixes
    * (sxD..syyD — the downstream cancellation and double assembly are
    * bit-identical to before). */
  private def centMoments(li: DataFrame): DataFrame = {
    import graft.functions.SumL128.sumL128
    // floor(v*100 + 0.5) == CAST(v AS DECIMAL(.,2))*100 on this data:
    // LiteralReplaySpec's tie-exposure property proves v*100 never
    // strays near a half from the cent grid, and the floor form is pure
    // codegen double math — the decimal cast allocates per row.
    val x = floor(col("l_quantity") * 100 + 0.5).cast("long")
    val y = floor(col("l_extendedprice") * 100 + 0.5).cast("long")
    li.select(col("l_returnflag"), x.as("x"), y.as("y"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).cast("decimal(10,0)").as("nD"),
        sumL128(col("x")).as("sx128"),
        sumL128(col("y")).as("sy128"),
        sumL128(col("x") * col("y")).as("sxy128"),
        sumL128(col("x") * col("x")).as("sxx128"),
        sumL128(col("y") * col("y")).as("syy128"))
      // Precisions sized to N <= 1e9 ROWS PER GROUP (the round-9 sf1
      // sweep caught the old gate-sized decimal(9,2) overflowing on
      // sum(qty) at 6M rows): sxD<=5e10, syD<=1.1e14, sxyD<=5.5e15,
      // sxxD<=2.5e12, syyD<=1.2e19 at that bound, and every downstream
      // product stays within decimal(38) on BOTH engines — Spark
      // nD*syyD=(35,4), syD²=(35,4); DuckDB p1+p2 rule max 10+24=34.
      // Beyond 1e9 rows/group the y² cancellation needs >38 exact
      // digits — that is the documented envelope of the decimal replay
      // contract, not a silent wrap (ANSI mode errors, as sf1 proved).
      .select(col("l_returnflag"), col("nD"),
        (col("sx128") * lit(BigDecimal("0.01"))).cast("decimal(13,2)")
          .as("sxD"),
        (col("sy128") * lit(BigDecimal("0.01"))).cast("decimal(17,2)")
          .as("syD"),
        (col("sxy128") * lit(BigDecimal("0.0001"))).cast("decimal(20,4)")
          .as("sxyD"),
        (col("sxx128") * lit(BigDecimal("0.0001"))).cast("decimal(17,4)")
          .as("sxxD"),
        (col("syy128") * lit(BigDecimal("0.0001"))).cast("decimal(24,4)")
          .as("syyD"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_quantiles" -> ((s, dir) => {
      // exact linear-interpolation quantiles per group (sort-based agg).
      // Two-key grouping: percentile buffers each group in one task, so
      // group count is the parallelism floor — 3 flags alone would cap
      // the whole query at 3 tasks. ONE array-percentile call: each extra
      // percentile(c, p) agg maintains its own counts-of-values buffer per
      // group (3x memory, 3x update cost, 3x the final sort) — the array
      // form shares one buffer and one sort for all three cut points,
      // which took this query from 16.9s to ~1/3 of that in BENCH_r01.
      t(s, dir, "lineitem").groupBy("l_returnflag", "l_linestatus")
        .agg(percentile(col("l_extendedprice"),
          array(lit(0.25), lit(0.5), lit(0.75))).as("__qs"))
        .select(col("l_returnflag"), col("l_linestatus"),
          r4(col("__qs")(0)).as("q25"),
          r4(col("__qs")(1)).as("q50"),
          r4(col("__qs")(2)).as("q75"))
    }),
    "agg_distinct" -> ((s, dir) => {
      // distinct aggregation (two-phase: dedup shuffle then agg) mixed
      // with plain aggregates in one pass
      t(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"),
          r4(sum(col("l_quantity"))).as("sum_qty"))
    }),
    "agg_cube" -> ((s, dir) => {
      // grouping sets: full CUBE over two dims + grand total
      // decimal-exact sum (round-7 fragility audit): grouped float
      // sums combine partials in a run-to-run nondeterministic order;
      // on a ~1e10 grand total the jitter can straddle the 1e-4 grid.
      // Cent-exact input -> value-preserving decimal cast -> exact sum.
      t(s, dir, "orders").cube("o_orderpriority", "o_orderstatus")
        .agg(r4(sum(col("o_totalprice").cast("decimal(11,2)"))
          .cast("double")).as("total"),
          count(lit(1)).as("n"))
    }),
    "set_except" -> ((s, dir) => {
      // customers that never placed an URGENT order (EXCEPT — distinct
      // set semantics; ~4% of customers at the gate sf)
      t(s, dir, "customer").select(col("c_custkey"))
        .except(t(s, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey").as("c_custkey")))
    }),
    "join_semi" -> ((s, dir) => {
      // parts with at least one lineitem (left-semi: no row duplication,
      // build side broadcastable)
      t(s, dir, "part").join(t(s, dir, "lineitem"),
          col("p_partkey") === col("l_partkey"), "leftsemi")
        .select("p_partkey")
    }),
    "join_anti" -> ((s, dir) => {
      // parts never sold in bulk (left-anti vs a filtered build side —
      // the filter pushes below the join; nonzero at every sf)
      t(s, dir, "part").join(
          t(s, dir, "lineitem").filter(col("l_quantity") > 45),
          col("p_partkey") === col("l_partkey"), "leftanti")
        .select("p_partkey")
    }),
    "agg_moments" -> ((s, dir) => {
      // second-moment aggregate family (sample stddev/variance,
      // covariance, correlation) — single hash-agg pass, map-side
      // partials. DETERMINISM (round-7 fragility audit): native
      // stddev/covar/corr accumulate double Welford moments whose
      // association order differs per engine/thread-schedule; on
      // magnitudes ~1e5 the jitter can straddle the 1e-4 rounding
      // grid. Instead: DECIMAL-EXACT sums (tight precisions so every
      // product/difference stays within decimal(38) — exact integer
      // arithmetic in disguise), the cancellation-prone differences
      // n·Σxy−ΣxΣy / n·Σx²−(Σx)² computed IN decimal (exact, so the
      // catastrophic cancellation happens exactly), and only the
      // well-conditioned results cast to double for the closed-form
      // divide/sqrt — the identical expression embedded in the oracle
      // SQL (the window_rolling_corr / window_ewma replay contract).
      // The sums ride [[centMoments]]'s SumL128 long fast path (round-8:
      // same exact values, ~half the cost of the wide-decimal sums).
      val g = centMoments(t(s, dir, "lineitem"))
      val m2xD = col("nD") * col("sxxD") - col("sxD") * col("sxD")
      val m2yD = col("nD") * col("syyD") - col("syD") * col("syD")
      val cxyD = col("nD") * col("sxyD") - col("sxD") * col("syD")
      val nd  = col("nD").cast("double")
      val m2x = m2xD.cast("double")
      val m2y = m2yD.cast("double")
      val cxy = cxyD.cast("double")
      val den = nd * (nd - lit(1.0))
      g.select(col("l_returnflag"),
        r4(when(col("nD") >= 2, sqrt(m2x / den))).as("sd_qty"),
        r4(when(col("nD") >= 2, m2x / den)).as("var_qty"),
        r4(when(col("nD") >= 2, cxy / den)).as("cov_qp"),
        r4(when(m2xD > 0 && m2yD > 0, cxy / sqrt(m2x * m2y)))
          .as("corr_qp"))
    }),
    "agg_covar_matrix" -> ((s, dir) => {
      // FULL correlation matrix over a numeric feature vector
      // (quantity, price, discount, tax) per return flag — the
      // feature-stats pass a training pipeline runs before whitening /
      // feature selection, generalizing agg_moments' bivariate pair to
      // k features in ONE hash-agg pass (15 sum_l128 aggregates = 45
      // codegen long ops/row, map-side partials; output is |groups|
      // rows). Same exactness contract: integer-scaled features, exact
      // 124-bit sums, cancellations n·Σxy−ΣxΣy in DECIMAL(38,0)
      // (max term n·Σp² ≈ 5e26 at 1e9 rows/group — inside decimal(38)
      // on both engines; DuckDB's HUGEINT mirrors it), and only the
      // well-conditioned results cast to double for the shared
      // closed-form sqrt/divide. Correlations are unitless and
      // stddevs land at feature magnitude, so every r4 output sits
      // where the 1e-9 bias dominates the ulp (the std_wide lesson).
      import graft.functions.SumL128.sumL128
      val feats: Seq[(String, Column, Double)] = Seq(
        ("q", floor(col("l_quantity") + 0.5).cast("long"), 1.0),
        ("p", floor(col("l_extendedprice") * 100 + 0.5).cast("long"), 100.0),
        ("d", floor(col("l_discount") * 100 + 0.5).cast("long"), 100.0),
        ("t", floor(col("l_tax") * 100 + 0.5).cast("long"), 100.0))
      val base = t(s, dir, "lineitem").select(
        col("l_returnflag") +: feats.map { case (n, c, _) => c.as(n) }: _*)
      val pairs = for { i <- 0 until 4; j <- i until 4 } yield (i, j)
      val aggs = Seq(count(lit(1)).cast("decimal(19,0)").as("nD")) ++
        feats.map { case (n, _, _) => sumL128(col(n)).as(s"s_$n") } ++
        pairs.map { case (i, j) =>
          val (a, b) = (feats(i)._1, feats(j)._1)
          sumL128(col(a) * col(b)).as(s"s_$a$b")
        }
      val g = base.groupBy("l_returnflag").agg(aggs.head, aggs.tail: _*)
      def cc(i: Int, j: Int): Column = {
        val (a, b) = (feats(i)._1, feats(j)._1)
        col("nD") * col(s"s_$a$b") - col(s"s_$a") * col(s"s_$b")
      }
      val nd = col("nD").cast("double")
      val den = nd * (nd - lit(1.0))
      val stds = feats.zipWithIndex.map { case ((n, _, u), i) =>
        r4(when(col("nD") >= 2, sqrt(cc(i, i).cast("double") / den) /
          lit(u))).as(s"std_$n")
      }
      val corrs = pairs.filter(p => p._1 < p._2).map { case (i, j) =>
        val (a, b) = (feats(i)._1, feats(j)._1)
        r4(when(cc(i, i) > 0 && cc(j, j) > 0, cc(i, j).cast("double") /
          sqrt(cc(i, i).cast("double") * cc(j, j).cast("double"))))
          .as(s"corr_$a$b")
      }
      g.select(col("l_returnflag") +:
        (Seq(col("nD").cast("long").as("n")) ++ stds ++ corrs): _*)
    }),
    "scalar_funcs" -> ((s, dir) => {
      // scalar-function breadth (date/string/math/array families), all
      // codegen builtins with exact DuckDB equivalents
      t(s, dir, "orders").select(col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast("date"))
          .cast("long").as("days_since"),
        upper(substring(col("o_orderpriority"), 1, 3)).as("pri3"),
        concat_ws("|", col("o_orderstatus"), col("o_orderpriority")).as("tag"),
        r4(sqrt(col("o_totalprice"))).as("sqrt_price"),
        size(split(col("o_orderpriority"), "-")).cast("long").as("pri_parts"),
        element_at(split(col("o_orderpriority"), "-"), 1).as("pri_head"))
    }),
    "agg_conditional" -> ((s, dir) => {
      // conditional/boolean aggregate family: count_if, filtered sums
      // (sum-of-when — Spark's FILTER-clause analog), bool_and/bool_or —
      // one hash-agg pass. disc_rev sums exact cents on the SumL128
      // long fast path (round-8; the sum(decimal(9,2)) accumulator was
      // 19-precision = BigInteger-backed), then rescales once per group
      // — the double the oracle's CAST(sum(..) AS DOUBLE) sees is the
      // same exact value.
      import graft.functions.SumL128.sumL128
      t(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(count_if(col("l_quantity") > 25).as("n_bulk"),
          r4((sumL128(when(col("l_discount") > 0.05,
              floor(col("l_extendedprice") * 100 + 0.5).cast("long"))
            .otherwise(lit(0L))) * lit(BigDecimal("0.01")))
            .cast("double"))
            .as("disc_rev"),
          bool_and(col("l_quantity") > 0).as("all_pos"),
          bool_or(col("l_discount") > 0.09).as("any_deep"))
    }),
    "date_funcs" -> ((s, dir) => {
      // calendar scalar family: offsets (days/months, month-end clamped),
      // last_day, month truncation, quarter/ISO week/day-of-week
      t(s, dir, "orders").select(col("o_orderkey"),
        date_add(col("o_orderdate").cast("date"), 30).as("plus30"),
        add_months(col("o_orderdate").cast("date"), 2).as("plus2mo"),
        last_day(col("o_orderdate").cast("date")).as("eom"),
        trunc(col("o_orderdate").cast("date"), "mm").as("month_start"),
        quarter(col("o_orderdate")).cast("long").as("qtr"),
        weekofyear(col("o_orderdate")).cast("long").as("iso_week"),
        dayofweek(col("o_orderdate")).cast("long").as("dow1"))
    }),
    "profile_stats" -> ((s, dir) => {
      // data-profiling utility: one pass, one row — row count, per-column
      // null and distinct cardinalities, numeric/date extrema. The
      // single-agg shape is what a 100 TB profiler wants: every stat
      // shares one scan + one (tiny) shuffle of partial buffers.
      t(s, dir, "orders").agg(
        count(lit(1)).as("n_rows"),
        count(col("o_totalprice")).as("n_price"),
        countDistinct(col("o_custkey")).as("nd_cust"),
        countDistinct(col("o_orderstatus")).as("nd_status"),
        r4(min(col("o_totalprice"))).as("min_price"),
        r4(max(col("o_totalprice"))).as("max_price"),
        min(col("o_orderdate").cast("date").cast("string")).as("min_date"),
        max(col("o_orderdate").cast("date").cast("string")).as("max_date"))
    }),
    "agg_histogram" -> ((s, dir) => {
      // fixed-width histogram: bucket = floor((x - lo) / w) — pure
      // integer result of identical IEEE double ops in both engines;
      // a groupBy over ~50 buckets, map-side partials carry the load
      t(s, dir, "lineitem")
        .select(floor((col("l_extendedprice") - lit(900.0)) / lit(2000.0))
          .cast("long").as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n"))
    }),
    "agg_mode_median" -> ((s, dir) => {
      // exact median (interpolated percentile) + DETERMINISTIC mode:
      // both engines leave mode() ties unspecified, so the mode is
      // computed as count-then-argmax with a smallest-value tiebreak —
      // two tiny hash aggs + a 3-row broadcast join, no ambiguity
      val li = t(s, dir, "lineitem")
      val med = li.groupBy("l_returnflag")
        .agg(r4(median(col("l_quantity"))).as("med_qty"))
      val mode = li.groupBy("l_returnflag", "l_linenumber")
        .agg(count(lit(1)).as("cnt"))
        .groupBy("l_returnflag")
        .agg(max_by(col("l_linenumber"),
          struct(col("cnt"), -col("l_linenumber"))).cast("long").as("mode_ln"))
      med.join(mode, Seq("l_returnflag"))
    }),
    "agg_weighted_median" -> ((s, dir) => {
      // WEIGHTED median — the per-group price point where half the
      // QUANTITY (not half the rows) sits at or below: the inventory-
      // weighted "typical price" no unweighted quantile computes.
      // Lower weighted median semantics, exact: the crossing test
      // 2·cumw ≥ totw stays in cross-multiplied int64 — no halving
      // division, no float. SCALE SHAPE (round-12 Sf1Probe finding):
      // the naive per-ROW running sum windows over |groups| = 3
      // partitions, so one task sorts the whole group — measured 6.8×
      // at 10× data, catastrophic at 100 TB. The shipped form
      // collapses to per-(group, price) weights FIRST — a map-side-
      // combined hash agg on a HIGH-cardinality key — and runs the
      // running sum over the collapsed table, whose size is bounded by
      // the PRICE DOMAIN per group, not the corpus (the bucket-domain
      // argument of window_rolling_distinct's cumsum); measured
      // 6.8× → 0.95× at 10× data (the distinct-price table barely
      // grows), identical answers. Collapsing also
      // makes pc unique per group, so the window order is total with
      // no tiebreak columns.
      val li = t(s, dir, "lineitem").select(col("l_returnflag"),
        floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("pc"),
        floor(col("l_quantity") + 0.5).cast("long").as("q"))
      val byPrice = li.groupBy("l_returnflag", "pc")
        .agg(sum(col("q")).as("pw"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("l_returnflag").orderBy(col("pc"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = org.apache.spark.sql.expressions.Window
        .partitionBy("l_returnflag")
      byPrice.select(col("l_returnflag"), col("pc"),
          sum(col("pw")).over(w).as("cumw"),
          sum(col("pw")).over(wAll).as("totw"))
        .filter(col("cumw") * 2 >= col("totw"))
        .groupBy("l_returnflag")
        .agg(min(col("pc")).as("wmedian_c"),
          max(col("totw")).as("tot_qty"))
    }),
    "agg_regression" -> ((s, dir) => {
      // linear-regression aggregate family (regr_* semantics):
      // slope/intercept/R² of extendedprice over quantity per group —
      // one hash-agg pass, map-side partial moments. Same decimal-
      // exact literal-replay scheme as agg_moments (round-7 fragility
      // audit): exact moment sums (SumL128 long fast path via
      // [[centMoments]]), cancellation in decimal, closed-form double
      // assembly identical to the oracle SQL.
      // slope = Cxy/M2x, icept = (Σy − slope·Σx)/n, r2 = Cxy²/(M2x·M2y)
      // — algebraically regr_slope/regr_intercept/regr_r2.
      val g = centMoments(t(s, dir, "lineitem"))
      val m2xD = col("nD") * col("sxxD") - col("sxD") * col("sxD")
      val m2yD = col("nD") * col("syyD") - col("syD") * col("syD")
      val cxyD = col("nD") * col("sxyD") - col("sxD") * col("syD")
      val nd  = col("nD").cast("double")
      val m2x = m2xD.cast("double")
      val m2y = m2yD.cast("double")
      val cxy = cxyD.cast("double")
      val slope = cxy / m2x
      g.select(col("l_returnflag"),
        col("nD").cast("long").as("n_pairs"),
        r4(when(m2xD > 0, slope)).as("slope"),
        r4(when(m2xD > 0,
          (col("syD").cast("double") - slope * col("sxD").cast("double"))
            / nd)).as("icept"),
        r4(when(m2xD > 0 && m2yD > 0, cxy * cxy / (m2x * m2y)))
          .as("r2"))
    }),
    "window_ranks" -> ((s, dir) => {
      // ranking/analytic family sharing ONE window: rank, dense_rank,
      // lag, lead (CollapseWindow → single WindowExec)
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders").select(col("o_orderkey"),
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"),
          lag(col("o_orderkey"), 1).over(w).as("prev_key"),
          lead(col("o_orderkey"), 1).over(w).as("next_key"))
    }),
    "agg_gini" -> ((s, dir) => {
      // Gini coefficient of customer-spend concentration per nation —
      // the inequality statistic beside entropy (mixture health) and
      // winsorized/MAD (robust location): how unevenly does a
      // nation's revenue concentrate across its customers?
      //   G = (2·Σ i·xᵢ − (n+1)·Σx) / (n·Σx),  xᵢ ascending
      // One spend hash agg, one per-nation rank window, one hash agg
      // of EXACT integer sums (Σi·x rides sum_l128 — the rank-weighted
      // sum tops int64 at scale), and a single double division —
      // cross-engine identical. Customers with no orders count as
      // zero-spend rows (real inequality, not sampled inequality).
      import graft.functions.SumL128.sumL128
      val spend = t(s, dir, "orders").groupBy("o_custkey")
        .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
          .as("x"))
      val cust = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
        .join(spend, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_nationkey"), col("c_custkey"),
          coalesce(col("x"), lit(0L)).as("x"))
      val w = Window.partitionBy("c_nationkey")
        .orderBy(col("x").asc, col("c_custkey").asc)
      val g = cust.withColumn("i", row_number().over(w).cast("long"))
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n"),
          sumL128(col("x")).as("s0"),
          sumL128(col("i") * col("x")).as("s1"))
      val nD = col("n").cast("decimal(12,0)")
      g.select(col("c_nationkey").as("nationkey"), col("n"),
        r4(when(col("s0") > 0,
          (lit(2).cast("decimal(2,0)") * col("s1") -
            (nD + 1) * col("s0")).cast("double") /
            (nD * col("s0")).cast("double"))).as("gini"))
    }),
    "agg_winsorized" -> ((s, dir) => {
      // IQR-winsorized mean per group — the robust-mean member of the
      // MAD/median family: prices clamp to [p25, p75] before
      // averaging, so tail outliers move the estimate by at most the
      // clamp width. Two passes (exact quantiles need one), quantile
      // bounds broadcast back. EXACTNESS: quantiles are computed on
      // 4x-SCALED cents — the dyadic ps interpolate at fractions
      // {0, .25, .5, .75}, and on multiples of 4 every such
      // interpolant is an INTEGER, bit-identical across engines (2x
      // only fixes the .5 fraction; .25 of doubled cents is a half,
      // where Spark's long cast truncates and DuckDB's rounds). The
      // clamp compares exact integer-valued doubles and the clamped
      // values sum as exact LONGS — the winsorized mean is one final
      // division.
      val pc2 = (floor(col("l_extendedprice") * 100 + 0.5).cast("long")
        * 4).as("pc2")
      val li = t(s, dir, "lineitem").select(col("l_returnflag"), pc2)
      val q = li.groupBy("l_returnflag")
        .agg(percentile(col("pc2"), array(lit(0.25), lit(0.75)))
          .as("qs"))
      li.join(broadcast(q), Seq("l_returnflag"))
        .select(col("l_returnflag"),
          least(greatest(col("pc2").cast("double"), col("qs")(0)),
            col("qs")(1)).cast("long").as("w2"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), sum(col("w2")).as("sw2"))
        .select(col("l_returnflag"), col("n"),
          r4(col("sw2").cast("double") /
            (col("n").cast("double") * 400.0)).as("wins_mean"))
    }),
    "agg_entropy" -> ((s, dir) => {
      // Shannon entropy of the event-type mix per user — the
      // distribution-health statistic a mixture monitor alerts on
      // (collapsed mix → entropy drop). Two vocabulary-bounded hash
      // aggs + one broadcast-joinable per-user total; H assembled as
      // -Σ (c/n)·ln(c/n) from EXACT integer counts with the identical
      // expression in the oracle (the unigram_logprob/source_kl log
      // determinism precedent: exact inputs + same expression tree,
      // 1e-9-biased rounding absorbs sub-ulp libm drift).
      val e = QueryUtil.events(s, dir).select(col("user_id"),
        col("event_type"))
      val c = e.groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("c"))
      val n = c.groupBy("user_id").agg(sum(col("c")).as("n"),
        count(lit(1)).as("n_types"))
      c.join(n, Seq("user_id"))
        .withColumn("p", col("c").cast("double") / col("n").cast("double"))
        .groupBy("user_id")
        .agg(r4(-sum(col("p") * log(col("p")))).as("entropy"),
          max(col("n_types")).as("n_types"))
    }),
    "window_pct_rank" -> ((s, dir) => {
      // the DISTRIBUTION-ranking analytic trio completing window_ranks:
      // percent_rank ((rank−1)/(n−1)), cume_dist (peers≤/n), and
      // nth_value(3) — one shared WindowExec like its sibling.
      // DETERMINISM: both ratios are small-exact-int divisions (one
      // correctly-rounded IEEE op each, identical in both engines), so
      // no rounding epsilon is needed; they are emitted raw.
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders").select(col("o_orderkey"),
          percent_rank().over(w).as("pct_rnk"),
          cume_dist().over(w).as("cdist"),
          nth_value(col("o_orderkey"), 3).over(wf).as("third_key"))
    }),
    "bucketize_quantiles" -> ((s, dir) => {
      // Quantile discretization (feature bucketing): quartile
      // boundaries from ONE exact array-percentile aggregate, fetched
      // as a single bounded driver row (the agg_heavyhitters pattern —
      // bounded like a broadcast side; the crossJoin(broadcast) form
      // plans as BroadcastNestedLoopJoin) and embedded as LITERALS in a
      // codegen'd when-chain over the full table — two passes, no
      // repartition, no rank-the-world window (ntile would sort the
      // entire table inside ONE task per partition key; this is the
      // scalable form of the same feature). Integer-valued l_quantity
      // keeps the interpolated cut points dyadic-exact so both engines
      // compare bit-identically.
      val li = t(s, dir, "lineitem")
      val qs = li.agg(percentile(col("l_quantity"),
          array(lit(0.25), lit(0.5), lit(0.75))).as("__qs"))
        .head.getSeq[Double](0)
      li.withColumn("bucket",
          when(col("l_quantity") <= lit(qs(0)), 0L)
            .when(col("l_quantity") <= lit(qs(1)), 1L)
            .when(col("l_quantity") <= lit(qs(2)), 2L)
            .otherwise(3L))
        .groupBy("bucket")
        .agg(count(lit(1)).cast("long").as("n"),
          min(col("l_quantity")).cast("long").as("q_lo"),
          max(col("l_quantity")).cast("long").as("q_hi"))
    }),
    "dq_checks" -> ((s, dir) => {
      // Data-quality audit — the ingest gate a training pipeline runs
      // before admitting a batch, with each rule CLASS in its minimal
      // plan shape: every row-level rule is one conditional sum in ONE
      // shared scan (adding a rule costs a column, not a pass); both
      // cross-table rules (referential orphan + ship-before-order
      // temporal) are conditional sums over ONE shared left join; the
      // duplicate-PK rule is the one hash agg on the key. Three
      // lineitem scans total for seven rules. Output is the
      // (rule, violation_count) table a scheduler would alert on.
      // Zero AND nonzero counts both gate: the zeros prove the rule
      // fires nowhere, not that it was skipped.
      val li = t(s, dir, "lineitem")
      val rc = li.agg(
          sum(when(col("l_quantity") < 1 || col("l_quantity") > 45, 1L)
            .otherwise(0L)).as("qty_out_of_range"),
          sum(when(col("l_discount") < 0 || col("l_discount") > 0.1, 1L)
            .otherwise(0L)).as("discount_out_of_range"),
          sum(when(col("l_tax") > 0.06, 1L).otherwise(0L))
            .as("tax_out_of_range"),
          sum(when(col("l_returnflag").isNull, 1L).otherwise(0L))
            .as("null_returnflag"))
        .selectExpr("""stack(4,
          'qty_out_of_range', qty_out_of_range,
          'discount_out_of_range', discount_out_of_range,
          'tax_out_of_range', tax_out_of_range,
          'null_returnflag', null_returnflag) AS (check_name, n_bad)""")
      // cross-table rules share ONE left join pass against the parent:
      // referential orphans (no parent row) and the temporal rule
      // (shipped before its order was placed) are both conditional
      // sums over the same joined row — one scan, one join, two rules
      // (fact-dim join, broadcast at dim scale)
      val joined = li.select("l_orderkey", "l_shipdate")
        .join(t(s, dir, "orders").select("o_orderkey", "o_orderdate"),
          li("l_orderkey") === col("o_orderkey"), "left_outer")
        .agg(
          sum(when(col("o_orderkey").isNull, 1L).otherwise(0L))
            .as("orphans"),
          sum(when(col("l_shipdate").cast("date") < col("o_orderdate"),
            1L).otherwise(0L)).as("early"))
      val crossRules = joined.selectExpr("""stack(2,
          'orphan_orderkey', coalesce(orphans, 0L),
          'ship_before_order', coalesce(early, 0L))
          AS (check_name, n_bad)""")
      val dup = li
        .groupBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
        .agg(count(lit(1)).as("c"))
        .agg(coalesce(sum(col("c") - 1), lit(0L)).as("n_bad"))
        .select(lit("dup_pk").as("check_name"), col("n_bad"))
      rc.unionByName(crossRules).unionByName(dup)
    }),
    "agg_incremental_refresh" -> ((s, dir) => {
      // Incremental aggregate maintenance — the partial-aggregate
      // state-merge primitive behind every "refresh yesterday's
      // rollup without rescanning history" job: history before the
      // cutoff is a pre-aggregated state table (per-group sum+count
      // partials — avg is NOT mergeable, so it is carried decomposed
      // and assembled only at read time), the new batch is aggregated
      // alone, and the refresh is union + re-aggregate of the
      // PARTIALS — cost scales with |batch| + |groups|, never with
      // history. The oracle is the full single-scan recompute, so the
      // gate proves merge(state, batch) == recompute exactly (cent
      // sums are exact longs — merge order cannot drift them).
      val o = t(s, dir, "orders").select(col("o_orderdate").as("d"),
        round(col("o_totalprice") * 100).cast("long").as("pc"))
      def part(df: DataFrame): DataFrame = df.groupBy("d")
        .agg(sum("pc").as("sum_pc"), count(lit(1)).as("n"))
      val cutoff = to_date(lit("1996-01-01"))
      val state = part(o.filter(col("d") < cutoff))
      val batch = part(o.filter(col("d") >= cutoff))
      state.unionByName(batch).groupBy("d")
        .agg(sum("sum_pc").as("rev_cents"), sum("n").as("n"))
        .select(col("d").as("o_orderdate"), col("n"), col("rev_cents"),
          r4(col("rev_cents").cast("double") / col("n").cast("double")
            / 100.0).as("avg_price"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "agg_quantiles" ->
      """SELECT l_returnflag, l_linestatus,
         round(1e-9 + quantile_cont(l_extendedprice, 0.25), 4) AS q25,
         round(1e-9 + quantile_cont(l_extendedprice, 0.5), 4) AS q50,
         round(1e-9 + quantile_cont(l_extendedprice, 0.75), 4) AS q75
         FROM lineitem GROUP BY 1, 2""",
    "agg_distinct" ->
      """SELECT l_returnflag,
         count(DISTINCT l_partkey) AS n_parts,
         count(DISTINCT l_suppkey) AS n_supps,
         count(*) AS n_rows,
         round(1e-9 + sum(l_quantity), 4) AS sum_qty
         FROM lineitem GROUP BY 1""",
    "agg_cube" ->
      """SELECT o_orderpriority, o_orderstatus,
         round(1e-9 + CAST(sum(CAST(o_totalprice AS DECIMAL(11,2)))
           AS DOUBLE), 4) AS total, count(*) AS n
         FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)""",
    "set_except" ->
      """SELECT c_custkey FROM customer
         EXCEPT SELECT o_custkey AS c_custkey FROM orders
                WHERE o_orderpriority = '1-URGENT'""",
    "join_semi" ->
      """SELECT p_partkey FROM part
         WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)""",
    "join_anti" ->
      """SELECT p_partkey FROM part
         WHERE NOT EXISTS (SELECT 1 FROM lineitem
           WHERE l_partkey = p_partkey AND l_quantity > 45)""",
    // HUGEINT mirrors the Spark side's sum_l128 → decimal(38,0)
    // cancellations exactly; every double is assembled by the same
    // closed-form expression tree
    "agg_covar_matrix" -> {
      val feats = Seq("q" -> "CAST(floor(l_quantity + 0.5) AS BIGINT)",
        "p" -> "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)",
        "d" -> "CAST(floor(l_discount * 100 + 0.5) AS BIGINT)",
        "t" -> "CAST(floor(l_tax * 100 + 0.5) AS BIGINT)")
      val units = Map("q" -> "1.0", "p" -> "100.0", "d" -> "100.0",
        "t" -> "100.0")
      val pairs = for { i <- 0 until 4; j <- i until 4 } yield
        (feats(i)._1, feats(j)._1)
      def c(a: String, b: String) = s"(n * s_$a$b - s_$a * s_$b)"
      val stds = feats.map { case (a, _) =>
        s"""round(1e-9 + CASE WHEN n >= 2 THEN
            sqrt(${c(a, a)}::DOUBLE /
              (n::DOUBLE * (n::DOUBLE - 1.0))) / ${units(a)} END, 4)
            AS std_$a"""
      }
      val corrs = pairs.filter(p => p._1 != p._2).map { case (a, b) =>
        s"""round(1e-9 + CASE WHEN ${c(a, a)} > 0 AND ${c(b, b)} > 0 THEN
            ${c(a, b)}::DOUBLE /
              sqrt(${c(a, a)}::DOUBLE * ${c(b, b)}::DOUBLE) END, 4)
            AS corr_$a$b"""
      }
      s"""WITH b AS (SELECT l_returnflag,
            ${feats.map { case (n, e) => s"$e AS $n" }.mkString(", ")}
          FROM lineitem),
          g AS (SELECT l_returnflag, count(*) AS n,
            ${feats.map { case (n, _) => s"sum($n) AS s_$n" }
              .mkString(", ")},
            ${pairs.map { case (a, b) => s"sum($a * $b) AS s_$a$b" }
              .mkString(", ")}
          FROM b GROUP BY 1)
          SELECT l_returnflag, CAST(n AS BIGINT) AS n,
            ${(stds ++ corrs).mkString(",\n            ")}
          FROM g"""
    },
    "agg_moments" ->
      """WITH d AS (SELECT l_returnflag,
           CAST(l_quantity AS DECIMAL(4,2)) AS qd,
           CAST(l_extendedprice AS DECIMAL(9,2)) AS pd FROM lineitem),
         g AS (SELECT l_returnflag,
           CAST(count(*) AS DECIMAL(10,0)) AS nD,
           CAST(sum(qd) AS DECIMAL(13,2)) AS sxD,
           CAST(sum(pd) AS DECIMAL(17,2)) AS syD,
           CAST(sum(qd * pd) AS DECIMAL(20,4)) AS sxyD,
           CAST(sum(qd * qd) AS DECIMAL(17,4)) AS sxxD,
           CAST(sum(pd * pd) AS DECIMAL(24,4)) AS syyD
         FROM d GROUP BY 1),
         m AS (SELECT l_returnflag, nD,
           CAST(nD AS DOUBLE) AS nd,
           nD * CAST(sxxD AS DECIMAL(19,4))
             - CAST(sxD AS DECIMAL(19,2)) * sxD AS m2xD,
           nD * syyD
             - CAST(syD AS DECIMAL(19,2)) * syD AS m2yD,
           nD * sxyD
             - CAST(sxD AS DECIMAL(19,2)) * syD AS cxyD
         FROM g)
         SELECT l_returnflag,
           round(1e-9 + CASE WHEN nD >= 2 THEN
             sqrt(CAST(m2xD AS DOUBLE) / (nd * (nd - 1.0))) END, 4)
             AS sd_qty,
           round(1e-9 + CASE WHEN nD >= 2 THEN
             CAST(m2xD AS DOUBLE) / (nd * (nd - 1.0)) END, 4) AS var_qty,
           round(1e-9 + CASE WHEN nD >= 2 THEN
             CAST(cxyD AS DOUBLE) / (nd * (nd - 1.0)) END, 4) AS cov_qp,
           round(1e-9 + CASE WHEN m2xD > 0 AND m2yD > 0 THEN
             CAST(cxyD AS DOUBLE)
               / sqrt(CAST(m2xD AS DOUBLE) * CAST(m2yD AS DOUBLE)) END, 4)
             AS corr_qp
         FROM m""",
    "scalar_funcs" ->
      """SELECT o_orderkey,
         year(o_orderdate) AS yr, month(o_orderdate) AS mo,
         day(o_orderdate) AS dom,
         date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
           AS days_since,
         upper(substr(o_orderpriority, 1, 3)) AS pri3,
         concat_ws('|', o_orderstatus, o_orderpriority) AS tag,
         round(1e-9 + sqrt(o_totalprice), 4) AS sqrt_price,
         length(string_split(o_orderpriority, '-')) AS pri_parts,
         string_split(o_orderpriority, '-')[1] AS pri_head
         FROM orders""",
    "agg_conditional" ->
      """SELECT l_returnflag,
         count(*) FILTER (WHERE l_quantity > 25) AS n_bulk,
         round(1e-9 + CAST(sum(CASE WHEN l_discount > 0.05
           THEN CAST(l_extendedprice AS DECIMAL(9,2))
           ELSE CAST(0 AS DECIMAL(9,2)) END) AS DOUBLE), 4) AS disc_rev,
         bool_and(l_quantity > 0) AS all_pos,
         bool_or(l_discount > 0.09) AS any_deep
         FROM lineitem GROUP BY 1""",
    "date_funcs" ->
      """SELECT o_orderkey,
         CAST(o_orderdate AS DATE) + 30 AS plus30,
         CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE)
           AS plus2mo,
         last_day(CAST(o_orderdate AS DATE)) AS eom,
         CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE)
           AS month_start,
         quarter(o_orderdate) AS qtr,
         weekofyear(o_orderdate) AS iso_week,
         dayofweek(o_orderdate) + 1 AS dow1
         FROM orders""",
    "profile_stats" ->
      """SELECT count(*) AS n_rows,
         count(o_totalprice) AS n_price,
         count(DISTINCT o_custkey) AS nd_cust,
         count(DISTINCT o_orderstatus) AS nd_status,
         round(1e-9 + min(o_totalprice), 4) AS min_price,
         round(1e-9 + max(o_totalprice), 4) AS max_price,
         CAST(CAST(min(o_orderdate) AS DATE) AS VARCHAR) AS min_date,
         CAST(CAST(max(o_orderdate) AS DATE) AS VARCHAR) AS max_date
         FROM orders""",
    "agg_histogram" ->
      """SELECT CAST(floor((l_extendedprice - 900.0) / 2000.0) AS BIGINT)
           AS bucket, count(*) AS n
         FROM lineitem GROUP BY 1""",
    "agg_mode_median" ->
      """WITH med AS (SELECT l_returnflag,
           round(1e-9 + median(l_quantity), 4) AS med_qty
           FROM lineitem GROUP BY 1),
         c AS (SELECT l_returnflag, l_linenumber, count(*) AS cnt
           FROM lineitem GROUP BY 1, 2),
         m AS (SELECT l_returnflag, l_linenumber AS mode_ln
           FROM (SELECT l_returnflag, l_linenumber,
                   row_number() OVER (PARTITION BY l_returnflag
                     ORDER BY cnt DESC, l_linenumber) AS rn
                 FROM c) WHERE rn = 1)
         SELECT med.l_returnflag, med.med_qty, m.mode_ln
         FROM med JOIN m ON med.l_returnflag = m.l_returnflag""",
    // same collapse-then-scan: per-(group, price) weights first, then
    // the running sum over the collapsed table; the 2*cumw >= totw
    // crossing test stays in exact integers
    "agg_weighted_median" ->
      """WITH li AS (SELECT l_returnflag,
           CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
           CAST(round(l_quantity) AS BIGINT) AS q
           FROM lineitem),
         bp AS (SELECT l_returnflag, pc, sum(q) AS pw
           FROM li GROUP BY 1, 2),
         r AS (SELECT l_returnflag, pc,
           sum(pw) OVER (PARTITION BY l_returnflag ORDER BY pc
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
           sum(pw) OVER (PARTITION BY l_returnflag) AS totw
           FROM bp)
         SELECT l_returnflag,
           min(pc) AS wmedian_c,
           CAST(max(totw) AS BIGINT) AS tot_qty
         FROM r WHERE cumw * 2 >= totw GROUP BY 1""",
    "agg_regression" ->
      """WITH d AS (SELECT l_returnflag,
           CAST(l_quantity AS DECIMAL(4,2)) AS qd,
           CAST(l_extendedprice AS DECIMAL(9,2)) AS pd FROM lineitem),
         g AS (SELECT l_returnflag,
           CAST(count(*) AS DECIMAL(10,0)) AS nD,
           CAST(sum(qd) AS DECIMAL(13,2)) AS sxD,
           CAST(sum(pd) AS DECIMAL(17,2)) AS syD,
           CAST(sum(qd * pd) AS DECIMAL(20,4)) AS sxyD,
           CAST(sum(qd * qd) AS DECIMAL(17,4)) AS sxxD,
           CAST(sum(pd * pd) AS DECIMAL(24,4)) AS syyD
         FROM d GROUP BY 1),
         m AS (SELECT l_returnflag, nD, sxD, syD,
           CAST(nD AS DOUBLE) AS nd,
           nD * CAST(sxxD AS DECIMAL(19,4))
             - CAST(sxD AS DECIMAL(19,2)) * sxD AS m2xD,
           nD * syyD
             - CAST(syD AS DECIMAL(19,2)) * syD AS m2yD,
           nD * sxyD
             - CAST(sxD AS DECIMAL(19,2)) * syD AS cxyD
         FROM g)
         SELECT l_returnflag,
           CAST(nD AS BIGINT) AS n_pairs,
           round(1e-9 + CASE WHEN m2xD > 0 THEN
             CAST(cxyD AS DOUBLE) / CAST(m2xD AS DOUBLE) END, 4) AS slope,
           round(1e-9 + CASE WHEN m2xD > 0 THEN
             (CAST(syD AS DOUBLE)
               - CAST(cxyD AS DOUBLE) / CAST(m2xD AS DOUBLE)
                 * CAST(sxD AS DOUBLE)) / nd END, 4) AS icept,
           round(1e-9 + CASE WHEN m2xD > 0 AND m2yD > 0 THEN
             CAST(cxyD AS DOUBLE) * CAST(cxyD AS DOUBLE)
               / (CAST(m2xD AS DOUBLE) * CAST(m2yD AS DOUBLE)) END, 4)
             AS r2
         FROM m""",
    "window_ranks" ->
      """SELECT o_orderkey,
         rank() OVER w AS rnk,
         dense_rank() OVER w AS drnk,
         lag(o_orderkey, 1) OVER w AS prev_key,
         lead(o_orderkey, 1) OVER w AS next_key
         FROM orders
         WINDOW w AS (PARTITION BY o_orderpriority
           ORDER BY o_totalprice DESC, o_orderkey)""",
    "bucketize_quantiles" ->
      """WITH q AS (SELECT quantile_cont(l_quantity, [0.25, 0.5, 0.75])
           AS qs FROM lineitem)
         SELECT CAST(CASE WHEN l_quantity <= qs[1] THEN 0
                WHEN l_quantity <= qs[2] THEN 1
                WHEN l_quantity <= qs[3] THEN 2
                ELSE 3 END AS BIGINT) AS bucket,
           count(*) AS n,
           CAST(floor(min(l_quantity)) AS BIGINT) AS q_lo,
           CAST(floor(max(l_quantity)) AS BIGINT) AS q_hi
         FROM lineitem CROSS JOIN q
         GROUP BY 1""",
    "agg_gini" ->
      """WITH spend AS (SELECT o_custkey,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
             AS BIGINT) AS x
           FROM orders GROUP BY 1),
         cust AS (SELECT c.c_nationkey, c.c_custkey,
           COALESCE(s.x, 0) AS x
           FROM customer c LEFT JOIN spend s
             ON c.c_custkey = s.o_custkey),
         rk AS (SELECT c_nationkey, x,
           row_number() OVER (PARTITION BY c_nationkey
             ORDER BY x, c_custkey) AS i
           FROM cust),
         g AS (SELECT c_nationkey, count(*) AS n,
           sum(x) AS s0, sum(i * x) AS s1
           FROM rk GROUP BY 1)
         SELECT c_nationkey AS nationkey, n,
           round(1e-9 + CASE WHEN s0 > 0
             THEN CAST(2 * s1 - (n + 1) * s0 AS DOUBLE)
               / CAST(n * s0 AS DOUBLE) END, 4) AS gini
         FROM g""",
    "agg_winsorized" ->
      """WITH d AS (SELECT l_returnflag,
           CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * 4 AS pc2
           FROM lineitem),
         q AS (SELECT l_returnflag,
           quantile_cont(pc2, [0.25, 0.75]) AS qs
           FROM d GROUP BY 1),
         w AS (SELECT d.l_returnflag,
           CAST(least(greatest(CAST(d.pc2 AS DOUBLE), q.qs[1]),
             q.qs[2]) AS BIGINT) AS w2
           FROM d JOIN q ON d.l_returnflag = q.l_returnflag)
         SELECT l_returnflag, count(*) AS n,
           round(1e-9 + CAST(sum(w2) AS DOUBLE)
             / (CAST(count(*) AS DOUBLE) * 400.0), 4) AS wins_mean
         FROM w GROUP BY 1""",
    "agg_entropy" ->
      """WITH c AS (SELECT user_id, event_type, count(*) AS c
           FROM events GROUP BY 1, 2),
         n AS (SELECT user_id, sum(c) AS n, count(*) AS n_types
           FROM c GROUP BY 1),
         p AS (SELECT c.user_id,
           CAST(c.c AS DOUBLE) / CAST(n.n AS DOUBLE) AS p, n.n_types
           FROM c JOIN n ON c.user_id = n.user_id)
         SELECT user_id,
           round(1e-9 + -sum(p * ln(p)), 4) AS entropy,
           CAST(max(n_types) AS BIGINT) AS n_types
         FROM p GROUP BY 1""",
    "window_pct_rank" ->
      """SELECT o_orderkey,
         percent_rank() OVER w AS pct_rnk,
         cume_dist() OVER w AS cdist,
         nth_value(o_orderkey, 3) OVER (PARTITION BY o_orderpriority
           ORDER BY o_totalprice DESC, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS third_key
         FROM orders
         WINDOW w AS (PARTITION BY o_orderpriority
           ORDER BY o_totalprice DESC, o_orderkey)""",
    "dq_checks" ->
      """SELECT 'qty_out_of_range' AS check_name,
           CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 45
             THEN 1 ELSE 0 END) AS BIGINT) AS n_bad FROM lineitem
         UNION ALL
         SELECT 'discount_out_of_range',
           CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.1
             THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
         UNION ALL
         SELECT 'tax_out_of_range',
           CAST(sum(CASE WHEN l_tax > 0.06 THEN 1 ELSE 0 END) AS BIGINT)
           FROM lineitem
         UNION ALL
         SELECT 'null_returnflag',
           CAST(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END)
             AS BIGINT) FROM lineitem
         UNION ALL
         SELECT 'ship_before_order',
           CAST(COALESCE(sum(CASE WHEN CAST(l.l_shipdate AS DATE)
             < o.o_orderdate THEN 1 ELSE 0 END), 0) AS BIGINT)
         FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         UNION ALL
         SELECT 'dup_pk', CAST(COALESCE(sum(c - 1), 0) AS BIGINT)
         FROM (SELECT count(*) AS c FROM lineitem
               GROUP BY l_orderkey, l_linenumber, l_partkey, l_suppkey)
         UNION ALL
         SELECT 'orphan_orderkey', count(*) FROM lineitem l
         WHERE NOT EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_orderkey = l.l_orderkey)""",
    "agg_incremental_refresh" ->
      """SELECT o_orderdate, count(*) AS n,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS rev_cents,
           round(1e-9 + CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
               AS DOUBLE) / CAST(count(*) AS DOUBLE) / 100.0, 4)
             AS avg_price
         FROM orders GROUP BY 1"""
  )
}
