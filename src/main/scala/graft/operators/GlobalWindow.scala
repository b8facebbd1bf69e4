package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.DoubleType

/** Scalable global and few-hot-groups running aggregates.
  *
  * `Window.orderBy(...)` with no `partitionBy` is semantically what the
  * reference's path-2 frames mean (SURVEY.md §2.1 path 2), but Spark
  * executes it on a SINGLE partition — the documented 100 TB bottleneck
  * (SURVEY.md §4.2). Grouped running aggregates over a low-cardinality
  * key hit the same wall: `Window.partitionBy(flag)` caps at G tasks.
  * Both get the classic two-pass fix:
  *
  *   1. split the key space into P contiguous ranges and compute each
  *      (group, range)'s LOCAL running sum (an ordinary
  *      `Window.partitionBy(group, pid).orderBy(keys)` — one hash
  *      shuffle, G×P-way parallel);
  *   2. aggregate one total per (group, range) (G×P tiny rows),
  *      exclusive prefix-sum per group, and broadcast-join the offsets
  *      back.
  *
  * '''Partition id is DATA, not an execution artifact.''' Earlier
  * versions stamped `spark_partition_id()` after a `repartitionByRange`;
  * the sweep and the offset aggregation are two branches of a plan
  * diamond, and because column pruning projects their range exchanges
  * differently, the exchanges do NOT canonicalize equal — each branch
  * re-evaluated `spark_partition_id()` independently (verified: the
  * physical plan contains no ReusedExchange for either branch, with or
  * without AQE). Row/offset consistency then rested on range-bound
  * sampling being deterministic — observed true, but not a Spark
  * contract. This version removes the race class structurally: the range
  * split points are sampled ONCE (a driver-side, keys-only job — the
  * same pass `RangePartitioner` runs hidden inside every range exchange)
  * and compiled into the plan as literals; each row's pid is a pure
  * expression of its own key (binary when-tree over the sorted bounds),
  * so every branch — and every task retry, AQE re-plan, or
  * exchange-reuse decision — computes the identical pid by construction.
  *
  * The sampling job projects only the order keys (column-pruned +
  * pushed down for scans). Callers whose input is an expensive derived
  * frame rather than a scan should persist it first, as they would
  * before any multi-action pipeline.
  *
  * Keys wrapped in an explicit `.asc`/`.desc` (SortOrder) cannot be
  * compared as a struct, so they get a per-field lexicographic
  * comparator compiled in each key's declared direction and null
  * ordering ([[sortedPidExpr]]) — same literal-bounds determinism as
  * the plain path; no `spark_partition_id` anywhere.
  *
  * Cost: one keys-only sampling pass + one hash shuffle (group, pid) +
  * one G×P-row broadcast — fully parallel at any scale. With a total
  * order (callers include a tiebreaker, same contract as any
  * deterministic window) the result equals the plain window exactly for
  * integer-valued data and within float ulps otherwise (partitioned
  * summation reassociates the adds).
  */
object GlobalWindow {

  private val PID = "__gw_pid__"
  private val OPID = "__gw_opid__" // offset-side alias of PID (join clarity)
  private val KEY = "__gw_key__"
  private val LOC = "__gw_loc__"
  private val CNT = "__gw_cnt__"
  private val OFF = "__gw_off__"
  private val OFFCNT = "__gw_offcnt__"

  /** Range-split count ceiling: the pid when-tree materializes one node
    * per split, so splits track shuffle partitions only up to a bound
    * that keeps the expression tree small (a 2048-way prefix structure
    * saturates any realistic cumsum; beyond it the tree itself becomes
    * the cost). A larger explicit `numPartitions` is silently clamped
    * here — public so callers can see the ceiling they'll get. */
  val MaxSplits = 2048

  /** The prefix-decomposable running aggregates: local per-range result
    * ⊕ an offset folded from whole preceding ranges. Sum/Count/Min/Max
    * are the associative kernels; Avg rides on Sum+Count. */
  sealed trait RunningAgg
  object RunningAgg {
    case object Sum extends RunningAgg
    /** Long-exact sum (round 17, r16 ADVICE): [[Sum]] accumulates
      * `sum(v.cast(double))`, so integral magnitudes past 2^53 silently
      * lose exactness. This kernel keeps the value in its native LONG
      * arithmetic end to end — partials, offsets, and the combine are
      * all int64 adds, and ANSI mode makes a genuine int64 overflow a
      * loud error instead of a wrong answer. For the distinct-sum
      * carriers of [[graft.operators.RollingDistinct]], whose "exact
      * 64-bit arithmetic" contract the double carrier was quietly
      * weakening. `valueCol` must be LongType (or null). */
    case object SumLong extends RunningAgg
    case object Count extends RunningAgg
    case object Min extends RunningAgg
    case object Max extends RunningAgg
    case object Avg extends RunningAgg
  }

  /** Global cumulative sum of `valueCol` (cast to double) in the total
    * order of `orderBy`, appended as `outCol`.
    *
    * NOTE: constructing the result runs an EAGER driver-side sampling job
    * over `df` projected to the order keys (the same hidden pass every
    * range exchange runs) — an un-persisted expensive derived input
    * recomputes its lineage for that sample plus once per consuming plan
    * branch. Persist such inputs first, as before any multi-action
    * pipeline. `numPartitions` is capped at [[MaxSplits]] (2048); 0 means
    * the session's shuffle parallelism. */
  def cumSum(df: DataFrame, orderBy: Seq[Column], valueCol: String,
      outCol: String, numPartitions: Int = 0): DataFrame =
    groupedCumSum(df, Nil, orderBy, valueCol, outCol, numPartitions)

  /** Ungrouped [[groupedCumSumLong]]. */
  def cumSumLong(df: DataFrame, orderBy: Seq[Column], valueCol: String,
      outCol: String, numPartitions: Int = 0): DataFrame =
    groupedCumSumLong(df, Nil, orderBy, valueCol, outCol, numPartitions)

  /** Grouped running sum for FEW-HOT-GROUPS data — parallelism G×P
    * instead of the G-task cap of `Window.partitionBy(group)`. Groups
    * clustered inside a narrow slice of the GLOBAL key distribution
    * degrade toward the plain window (their rows share few pids) —
    * acceptable for the hot-group shape this targets, where every group
    * spans the key domain. Eager-sampling + `numPartitions` cap notes on
    * [[cumSum]] apply here too. */
  def groupedCumSum(df: DataFrame, by: Seq[String], orderBy: Seq[Column],
      valueCol: String, outCol: String, numPartitions: Int = 0): DataFrame =
    groupedCumAgg(df, by, orderBy, valueCol, outCol, RunningAgg.Sum,
      numPartitions)

  /** The LONG-EXACT sibling of [[groupedCumSum]] (round 17):
    * `valueCol` must be LongType; the running value never leaves int64,
    * so magnitudes past 2^53 stay exact and a genuine overflow is a
    * loud ANSI error. Same plan shape and scaling notes. */
  def groupedCumSumLong(df: DataFrame, by: Seq[String],
      orderBy: Seq[Column], valueCol: String, outCol: String,
      numPartitions: Int = 0): DataFrame =
    groupedCumAgg(df, by, orderBy, valueCol, outCol, RunningAgg.SumLong,
      numPartitions)

  /** Generalized scalable running aggregate (sum/count/min/max/avg) —
    * any aggregate whose global running value decomposes into a local
    * per-range running value combined with a fold of whole preceding
    * ranges. Same plan shape for every kind: pid stamp, one hash
    * shuffle, G×P offset rows, broadcast join. */
  def groupedCumAgg(df: DataFrame, by: Seq[String], orderBy: Seq[Column],
      valueCol: String, outCol: String, agg: RunningAgg,
      numPartitions: Int = 0): DataFrame =
    sweepAndJoin(stampPid(df, orderBy, numPartitions), by, orderBy,
      valueCol, outCol, agg)

  /** MULTI-PAYLOAD sibling of [[groupedCumSumLong]] (round 17,
    * optimization): N independent running Long sums in the SAME total
    * order share ONE pid stamp (one sampling job), ONE local sweep
    * window, ONE offset aggregate and ONE broadcast join. The
    * dual-aggregate distinct lowerings previously folded the
    * single-payload form once per payload — each fold re-paying the
    * driver-side bounds sampling and a full (group, pid) window +
    * offset-join pass over the frame. Per-payload NULL gating matches
    * N sequential [[groupedCumSumLong]] calls exactly: each payload
    * gates on its OWN running non-null count, so "no values yet" stays
    * NULL per payload. Each `(in, out)` payload must be LongType (or
    * null) — same int64-exact contract as [[RunningAgg.SumLong]]. */
  def groupedCumSumsLong(df: DataFrame, by: Seq[String],
      orderBy: Seq[Column], payloads: Seq[(String, String)],
      numPartitions: Int = 0): DataFrame = {
    require(payloads.nonEmpty, "groupedCumSumsLong needs >= 1 payload")
    if (payloads.size == 1)
      groupedCumSumLong(df, by, orderBy, payloads.head._1,
        payloads.head._2, numPartitions)
    else
      multiSweepAndJoin(stampPid(df, orderBy, numPartitions), by,
        orderBy, payloads)
  }

  /** Stamp the literal-bounds range pid (shared by the single- and
    * multi-payload scaffolds — the construction notes live on
    * [[groupedCumAgg]]'s original body). */
  private def stampPid(df: DataFrame, orderBy: Seq[Column],
      numPartitions: Int): DataFrame = {
    val parts = math.min(MaxSplits,
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions)
    // Plain columns compose into a comparable struct whose ordering
    // (lexicographic, nulls-first) matches Window.orderBy's asc default;
    // SortOrder nodes (.desc/.asc wrappers) cannot, so they take the
    // legacy path.
    val plainKeys = orderBy.forall(c => !ColumnShim.isSortOrder(c))
    if (plainKeys) {
      // single-key fast path: compare the bare column — a struct per
      // comparison costs an InternalRow allocation per row per tree
      // level. Multi-key: hoist the struct into ONE projected column so
      // the tree's O(parts) nodes reference it instead of re-building it.
      if (orderBy.size == 1) {
        val pid = rangePidExpr(df, orderBy.head, parts)
        df.withColumn(PID, pid)
      } else {
        val keyed = df.withColumn(KEY, struct(orderBy: _*))
        keyed.withColumn(PID, rangePidExpr(keyed, col(KEY), parts))
          .drop(KEY)
      }
    } else {
      // `.asc`/`.desc`-wrapped keys: same literal-bounds construction,
      // with the bound comparison compiled per-field in the declared
      // direction and null ordering (a struct comparison can't express
      // mixed directions). No spark_partition_id anywhere — every plan
      // branch computes the identical pid by construction.
      df.withColumn(PID,
        sortedPidExpr(df, orderBy.map(ColumnShim.sortSpec), parts))
    }
  }

  /** The shared two-pass scaffold over a pid-stamped frame: local sweep,
    * per-(group, pid) totals, per-group exclusive prefix, broadcast join
    * back. Group keys join NULL-SAFELY (`<=>`): `Window.partitionBy`
    * treats a NULL group as a real group, and a null-unsafe join would
    * silently null out that whole group's output. */
  private def sweepAndJoin(ranged: DataFrame, by: Seq[String],
      orderBy: Seq[Column], valueCol: String, outCol: String,
      agg: RunningAgg): DataFrame = {
    import RunningAgg._
    val byCols = by.map(col)
    val v = () => col(valueCol)
    val SUM = "__gw_psum__"; val MIN = "__gw_pmin__"; val MAX = "__gw_pmax__"
    val OFFMIN = "__gw_offmin__"; val OFFMAX = "__gw_offmax__"

    // Pass 1: per-(group, range) running partials. The running non-null
    // count is always computed: it distinguishes "sum is 0" from "no
    // values seen yet" (a window agg is NULL until the first non-null
    // value; count itself is the one aggregate that starts at 0).
    val lw = Window.partitionBy((byCols :+ col(PID)): _*).orderBy(orderBy: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val needSum = agg == Sum || agg == Avg
    val needSumL = agg == SumLong
    val needMin = agg == Min
    val needMax = agg == Max
    var swept = ranged.withColumn(CNT, count(v()).over(lw))
    if (needSum) swept =
      swept.withColumn(LOC, sum(v().cast(DoubleType)).over(lw))
    // SumLong: NO double cast anywhere — int64 partials/offsets/combine
    // keep magnitudes past 2^53 exact (ANSI makes true overflow loud)
    if (needSumL) swept = swept.withColumn(LOC, sum(v()).over(lw))
    if (needMin) swept = swept.withColumn(LOC, min(v()).over(lw))
    if (needMax) swept = swept.withColumn(LOC, max(v()).over(lw))

    // Pass 2: one total per (group, pid) (map-side partial agg → G×P
    // rows), exclusive prefix-fold per group over its P rows (a window
    // over G×P tiny rows — that's the point of the rewrite), broadcast
    // the offsets back. pid is the SAME data/expression in both passes,
    // so the branches cannot disagree.
    val pw = Window.partitionBy(byCols: _*).orderBy(col(PID))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offBy = by.map(b => s"__gw_by_$b")
    val partials = Seq(count(v()).as("pcnt")) ++
      (if (needSum) Seq(coalesce(sum(v().cast(DoubleType)), lit(0.0)).as(SUM))
       else Nil) ++
      (if (needSumL) Seq(coalesce(sum(v()), lit(0L)).as(SUM)) else Nil) ++
      (if (needMin) Seq(min(v()).as(MIN)) else Nil) ++
      (if (needMax) Seq(max(v()).as(MAX)) else Nil)
    var offsetDf = ranged.groupBy((byCols :+ col(PID)): _*)
      .agg(partials.head, partials.tail: _*)
      .withColumn(OFFCNT, coalesce(sum(col("pcnt")).over(pw), lit(0L)))
    if (needSum) offsetDf =
      offsetDf.withColumn(OFF, coalesce(sum(col(SUM)).over(pw), lit(0.0)))
    if (needSumL) offsetDf =
      offsetDf.withColumn(OFF, coalesce(sum(col(SUM)).over(pw), lit(0L)))
    if (needMin) offsetDf = offsetDf.withColumn(OFFMIN, min(col(MIN)).over(pw))
    if (needMax) offsetDf = offsetDf.withColumn(OFFMAX, max(col(MAX)).over(pw))
    // The offset side's pid is RENAMED (like the `__gw_by_` group keys):
    // both frames share lineage, and a `swept(PID) === offsetDf(PID)`
    // condition is exactly the self-join ambiguity class Spark resolves
    // heuristically (it logged "trivially true equals predicate" warnings)
    // — two distinct attribute names make the equi-join unambiguous under
    // any plan rewrite.
    val offOut = Seq(col(PID).as(OPID), col(OFFCNT)) ++
      (if (needSum || needSumL) Seq(col(OFF)) else Nil) ++
      (if (needMin) Seq(col(OFFMIN)) else Nil) ++
      (if (needMax) Seq(col(OFFMAX)) else Nil)
    offsetDf = offsetDf.select(
      (by.zip(offBy).map { case (b, o) => col(b).as(o) } ++ offOut): _*)

    // Combine: local ⊕ offset. least/greatest skip NULLs, which is
    // exactly "no values yet on that side"; the count gate preserves the
    // NULL-until-first-value window contract for everything except
    // Count, which genuinely starts at 0.
    val combined: Column = agg match {
      case Sum   => when(col(CNT) + col(OFFCNT) > 0,
        coalesce(col(LOC), lit(0.0)) + col(OFF))
      case SumLong => when(col(CNT) + col(OFFCNT) > 0,
        coalesce(col(LOC), lit(0L)) + col(OFF))
      case Avg   => when(col(CNT) + col(OFFCNT) > 0,
        (coalesce(col(LOC), lit(0.0)) + col(OFF)) / (col(CNT) + col(OFFCNT)))
      case Count => col(CNT) + col(OFFCNT)
      case Min   => least(col(LOC), col(OFFMIN))
      case Max   => greatest(col(LOC), col(OFFMAX))
    }
    val joinCond = (by.zip(offBy).map { case (b, o) => col(b) <=> col(o) } :+
      (col(PID) === col(OPID))).reduce(_ && _)
    swept.join(broadcast(offsetDf), joinCond, "left")
      .withColumn(outCol, combined)
      .drop((offBy :+ PID :+ OPID) :+ LOC: _*)
      .drop(CNT, OFF, OFFCNT, SUM, MIN, MAX, OFFMIN, OFFMAX)
  }

  /** The multi-payload SumLong scaffold: identical two-pass structure
    * to [[sweepAndJoin]], with per-payload (running count, running sum,
    * partial count, partial sum, offset count, offset sum) columns all
    * riding the SAME (group, pid) window / aggregate / broadcast join.
    * Window aggregates over one spec share one WindowExec, so N
    * payloads cost N extra buffers in the existing passes rather than
    * N-1 extra passes. */
  private def multiSweepAndJoin(ranged: DataFrame, by: Seq[String],
      orderBy: Seq[Column],
      payloads: Seq[(String, String)]): DataFrame = {
    val byCols = by.map(col)
    def CNTi(i: Int) = s"__gw_cnt_${i}__"
    def LOCi(i: Int) = s"__gw_loc_${i}__"
    def PCNTi(i: Int) = s"__gw_pcnt_${i}__"
    def SUMi(i: Int) = s"__gw_psum_${i}__"
    def OFFCNTi(i: Int) = s"__gw_offcnt_${i}__"
    def OFFi(i: Int) = s"__gw_off_${i}__"

    val lw = Window.partitionBy((byCols :+ col(PID)): _*)
      .orderBy(orderBy: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val swept = payloads.zipWithIndex.foldLeft(ranged) {
      case (acc, ((in, _), i)) =>
        // int64 end to end — no double cast (the SumLong contract)
        acc.withColumn(CNTi(i), count(col(in)).over(lw))
          .withColumn(LOCi(i), sum(col(in)).over(lw))
    }

    val pw = Window.partitionBy(byCols: _*).orderBy(col(PID))
      .rowsBetween(Window.unboundedPreceding, -1)
    val partials = payloads.zipWithIndex.flatMap { case ((in, _), i) =>
      Seq(count(col(in)).as(PCNTi(i)),
        coalesce(sum(col(in)), lit(0L)).as(SUMi(i)))
    }
    val offBy = by.map(b => s"__gw_by_$b")
    val withOffsets = payloads.indices.foldLeft(
      ranged.groupBy((byCols :+ col(PID)): _*)
        .agg(partials.head, partials.tail: _*)) { (acc, i) =>
      acc.withColumn(OFFCNTi(i),
          coalesce(sum(col(PCNTi(i))).over(pw), lit(0L)))
        .withColumn(OFFi(i), coalesce(sum(col(SUMi(i))).over(pw), lit(0L)))
    }
    val offOut = Seq(col(PID).as(OPID)) ++
      payloads.indices.flatMap(i => Seq(col(OFFCNTi(i)), col(OFFi(i))))
    val offsetDf = withOffsets.select(
      (by.zip(offBy).map { case (b, o) => col(b).as(o) } ++ offOut): _*)

    val joinCond = (by.zip(offBy).map { case (b, o) => col(b) <=> col(o) } :+
      (col(PID) === col(OPID))).reduce(_ && _)
    val combined = payloads.zipWithIndex.foldLeft(
      swept.join(broadcast(offsetDf), joinCond, "left")) {
      case (acc, ((_, out), i)) =>
        acc.withColumn(out, when(col(CNTi(i)) + col(OFFCNTi(i)) > 0,
          coalesce(col(LOCi(i)), lit(0L)) + col(OFFi(i))))
    }
    combined
      .drop((offBy :+ PID :+ OPID): _*)
      .drop(payloads.indices.flatMap(i =>
        Seq(CNTi(i), LOCi(i), PCNTi(i), SUMi(i), OFFCNTi(i), OFFi(i))): _*)
  }

  /** Sampled-bounds memo, keyed by (semantic hash of the keys-only
    * analyzed plan, the key schema + direction signature, parts). The
    * signature guards the (astronomically unlikely) 32-bit semanticHash
    * collision between plans whose key columns differ in type or sort
    * direction — a collision would otherwise replay cached values into
    * `Literal.create(v, kType)` with a mismatched type and crash query
    * construction. Re-invoking cumSum/groupedCumAgg on the same frame
    * shape (benchmark reruns, iterative pipelines, plan diamonds built
    * by callers) skips the driver-side sampling job. SAFE BY
    * CONSTRUCTION: any bounds yield a CORRECT pid function (sampling
    * quality only affects partition balance), so even a stale entry —
    * e.g. the underlying files changed between calls — can only skew
    * balance, never results. Bounded LRU (64 entries). */
  private val boundsMemo =
    new java.util.LinkedHashMap[(Int, String, Int), Seq[Seq[Any]]](
        64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(Int, String, Int), Seq[Seq[Any]]]): Boolean =
        size() > 64
    }

  /** Quantile split rows over `keyed` (already projected to the key
    * columns) in the total order of `sortCols`: a one-pass
    * TakeOrderedAndProject by key hash (uniform-ish pseudo-random sample,
    * top-S per partition retained), the retained S rows sorted by the
    * actual key order, then `parts`-quantile stepping, deduplicated.
    * Heavy key duplication collapses bounds — trading balance for
    * correctness; equal keys always share a pid. */
  private def sampleBounds(keyed: DataFrame, sortCols: Seq[Column],
      sig: String, parts: Int): Seq[Seq[Any]] = {
    val memoKey = (keyed.queryExecution.analyzed.semanticHash(), sig, parts)
    boundsMemo.synchronized {
      Option(boundsMemo.get(memoKey))
    }.getOrElse {
      val sampleSz = math.min(parts * 64, 262144)
      val hash = xxhash64(struct(keyed.columns.map(col): _*))
      val sample: Array[Row] = keyed
        .orderBy(hash +: sortCols: _*)
        .limit(sampleSz)
        .orderBy(sortCols: _*)
        .collect()
      val step = sample.length.toDouble / parts
      val vals: Seq[Seq[Any]] =
        if (sample.isEmpty) Nil // empty input → single pid 0
        else (1 until parts)
          .map(i => sample(math.min((i * step).toInt, sample.length - 1)))
          .map(_.toSeq)
          .distinct
      // only the ≤ parts-1 split VALUES are retained, never the sample
      boundsMemo.synchronized { boundsMemo.put(memoKey, vals) }
      vals
    }
  }

  private def rangePidExpr(df: DataFrame, key: Column,
      parts: Int): Column = {
    if (parts <= 1) return lit(0)
    val keyed = df.select(key.as("k"))
    val kType = keyed.schema("k").dataType
    // NULL bounds are dropped (possible on the bare-column fast path when
    // null keys are common): `key >= NULL` is NULL, which the when-tree
    // would route left unconditionally; null KEYS themselves route left
    // to pid 0 on every branch — consistently in both plan branches,
    // matching asc-nulls-first order.
    val boundVals = sampleBounds(keyed, Seq(col("k")), kType.sql, parts)
      .filterNot(r => r.head == null).map(_.head)
    val bounds = boundVals.map(v => ColumnShim.column(Literal.create(v, kType)))
    if (bounds.isEmpty) return lit(0)
    // pid(key) = |{i : bound_i <= key}| via balanced when-tree.
    def search(lo: Int, hi: Int): Column =
      if (lo == hi) lit(lo)
      else {
        val mid = (lo + hi + 1) / 2
        when(key >= bounds(mid - 1), search(mid, hi))
          .otherwise(search(lo, mid - 1))
      }
    search(0, bounds.length)
  }

  /** Literal-bounds pid for `.asc`/`.desc`-wrapped order keys: the same
    * sampled-quantile when-tree as [[rangePidExpr]], with the bound
    * comparison compiled as a per-field lexicographic predicate in each
    * key's declared direction and null ordering (struct comparison can't
    * express descending or nulls-last fields, and dropping null bounds
    * isn't an option because null keys may legitimately sort LAST here).
    * The comparators are built from `when` chains that always yield
    * true/false — never NULL — so negation is two-valued and every plan
    * branch routes identically. */
  private def sortedPidExpr(df: DataFrame,
      specs: Seq[(Column, Boolean, Boolean)], parts: Int): Column = {
    if (parts <= 1) return lit(0)
    val names = specs.indices.map(i => s"__gw_k$i")
    val keyed = df.select(specs.zip(names).map { case ((c, _, _), n) =>
      c.as(n) }: _*)
    val types = keyed.schema.fields.map(_.dataType)
    val sortCols = specs.zip(names).map { case ((_, asc, nf), n) =>
      (asc, nf) match {
        case (true, true)   => col(n).asc_nulls_first
        case (true, false)  => col(n).asc_nulls_last
        case (false, true)  => col(n).desc_nulls_first
        case (false, false) => col(n).desc_nulls_last
      }
    }
    val sig = types.map(_.sql).mkString(",") + "|" +
      specs.map { case (_, asc, nf) =>
        (if (asc) "a" else "d") + (if (nf) "f" else "l") }.mkString
    val boundRows = sampleBounds(keyed, sortCols, sig, parts)
    if (boundRows.isEmpty) return lit(0)

    // strict "row-key < bound" in sort order, totally ordered over NULLs
    def fieldLt(f: Column, b: Column, asc: Boolean,
        nullsFirst: Boolean): Column = {
      val cmp = if (asc) f < b else f > b
      if (nullsFirst)
        when(f.isNull && b.isNotNull, lit(true))
          .when(f.isNull || b.isNull, lit(false))
          .otherwise(cmp)
      else
        when(b.isNull && f.isNotNull, lit(true))
          .when(f.isNull || b.isNull, lit(false))
          .otherwise(cmp)
    }
    def lexLt(bound: Seq[Any]): Column =
      specs.zipWithIndex.foldRight(lit(false): Column) {
        case (((child, asc, nf), i), rest) =>
          val b = ColumnShim.column(Literal.create(bound(i), types(i)))
          fieldLt(child, b, asc, nf) || (child <=> b && rest)
      }
    // pid(key) = |{i : bound_i <= key}| = |{i : NOT key < bound_i}|
    def search(lo: Int, hi: Int): Column =
      if (lo == hi) lit(lo)
      else {
        val mid = (lo + hi + 1) / 2
        when(!lexLt(boundRows(mid - 1)), search(mid, hi))
          .otherwise(search(lo, mid - 1))
      }
    search(0, boundRows.length)
  }
}
