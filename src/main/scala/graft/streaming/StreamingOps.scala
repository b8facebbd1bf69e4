package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming rendering of the windowed-mutate surface
  * (optional extension — the reference is batch-only, SURVEY.md §2.4;
  * `.index` range frames over event time are the closest batch concept,
  * reference R/mutate.R:55-56).
  *
  * Semantics note (the honest contract): arbitrary per-row sliding
  * frames (`.frame = c(b, a)` around EVERY row) are not incrementally
  * computable in Spark's streaming model — they'd need unbounded
  * retention. The streamable projection is:
  *   - rows/range frames  →  fixed tumbling/sliding event-time windows
  *     (`window(ts, len, slide)`) with a watermark bounding state;
  *   - `.by` partition keys  →  extra groupBy keys;
  *   - multi-expression single-window  →  one `agg(...)` per call.
  * Custom per-key state (running frames, sessions) goes through
  * `flatMapGroupsWithState` — see [[sessionize]].
  */
object StreamingOps {

  /** Streaming support verdict for a batch [[graft.operators.Frame]] —
    * see [[supports]]. */
  sealed trait StreamSupport
  object StreamSupport {
    /** Exact per-row semantics expressible with BOUNDED custom keyed
      * state (`flatMapGroupsWithState`); `how` names the state shape. */
    final case class StatefulOnly(how: String) extends StreamSupport
    /** No bounded-state streaming rendering of the exact semantics
      * exists; `why` names the obstruction. */
    final case class NotStreamable(why: String) extends StreamSupport
  }

  /** The DEGRADATION MATRIX (round-6 verdict item 9, SURVEY §2.4): which
    * batch `mutateW` frame shapes have a faithful streaming rendering,
    * and which inherently don't. Codifies what was prose in SURVEY §2.4
    * ("arbitrary per-row sliding frames are not incrementally
    * computable") as a checkable function.
    *
    * Verdicts (exact PER-ROW mutate semantics — the epoch-aligned
    * [[mutateStreamW]] windows are a different, grouped output shape,
    * not a rendering of per-row frames):
    *
    *   - `c(Inf, Inf)` (whole partition): NOT streamable — every
    *     arrival changes every row's result; no append-mode output.
    *   - any `Inf` FOLLOWING endpoint: NOT streamable — needs the end
    *     of an unbounded stream.
    *   - `c(Inf, rows a≤0)` (running/cumulative): stateful — per-key
    *     accumulator (`mapGroupsWithState`), decomposable aggs only.
    *   - `c(rows b, rows a≤0)`: stateful — bounded per-key buffer of
    *     the trailing b+1 rows.
    *   - any POSITIVE row-count lookahead: NOT streamable — n future
    *     rows is unbounded in EVENT TIME (they may never arrive), so
    *     no watermark can ever release the frame.
    *   - finite event-time Periods (days/seconds/months/compound),
    *     after ≤ 0 or a finite positive time lookahead: stateful —
    *     watermark-bounded per-key event-time buffer spanning the
    *     frame width (months bound by 31 d/mo); emit a row once the
    *     watermark passes its `hi` boundary. This is exactly the
    *     bounded-state contract [[sessionize]] demonstrates.
    *   - unitless numeric `Range` frames: NOT streamable — a non-time
    *     index has no watermark axis, so state cannot be bounded.
    */
  def supports(frame: graft.operators.Frame): StreamSupport = {
    import graft.operators.FrameEndpoint._
    import StreamSupport._
    def isTime(e: graft.operators.FrameEndpoint): Boolean = e match {
      case Days(_) | Seconds(_) | Months(_) | MonthsDays(_, _) |
           MonthsSeconds(_, _) => true
      case _ => false
    }
    (frame.before, frame.after) match {
      case (Unbounded, Unbounded) => NotStreamable(
        "whole-partition frame: every arrival changes every row's " +
          "result — no append-mode output exists")
      case (_, Unbounded) => NotStreamable(
        "unbounded FOLLOWING endpoint needs the end of an unbounded " +
          "stream")
      case (Unbounded, Rows(a)) if a <= 0 => StatefulOnly(
        "running aggregate: per-key accumulator via " +
          "mapGroupsWithState (decomposable aggregates only)")
      case (Unbounded, e) if isTime(e) => StatefulOnly(
        "running aggregate with a watermark-delayed emit (per-key " +
          "accumulator; a positive time lookahead waits for the " +
          "watermark to pass hi)")
      case (Rows(_) | Unbounded, Rows(a)) if a > 0 => NotStreamable(
        // Unbounded-before shares the verdict AND the why: the blocker
        // is the row-count lookahead, not the trailing side (the old
        // catch-all called this a "mixed-unit frame", which it isn't —
        // ADVICE r07)
        "positive row-count lookahead: n future rows is unbounded in " +
          "event time — no watermark can release the frame")
      case (Rows(b), Rows(_)) => StatefulOnly(
        s"bounded per-key buffer of the trailing ${b + 1} rows " +
          "(flatMapGroupsWithState)")
      case (bE, aE) if isTime(bE) && isTime(aE) => StatefulOnly(
        "watermark-bounded per-key event-time buffer spanning the " +
          "frame width (calendar months bound by 31 d/mo); emit each " +
          "row once the watermark passes its hi boundary")
      case (Range(_), _) | (_, Range(_)) => NotStreamable(
        "unitless numeric index has no watermark axis — state cannot " +
          "be bounded")
      case (bE, aE) => NotStreamable(
        s"mixed-unit frame ($bE, $aE) has no single event-time axis " +
          "(batch mutateW rejects it too)")
    }
  }

  /** Tumbling/sliding windowed mutate on a streaming DataFrame.
    *
    * @param tsCol     event-time column name (must be TimestampType)
    * @param watermark max lateness, e.g. "10 minutes" — bounds state and
    *                  admits late data up to the bound (late-data policy
    *                  is Spark's: older-than-watermark rows are dropped)
    * @param windowLen window length, e.g. "1 hour"
    * @param slide     slide interval; None = tumbling
    * @param by        extra partition keys alongside the time window
    * @param exprs     named aggregate expressions sharing the window
    */
  def mutateStreamW(df: DataFrame, tsCol: String, watermark: String,
      windowLen: String, slide: Option[String] = None,
      by: Seq[Column] = Nil)(exprs: (String, Column)*): DataFrame = {
    require(exprs.nonEmpty, "mutateStreamW needs at least one name -> expr")
    val win = slide.fold(window(col(tsCol), windowLen))(s =>
      window(col(tsCol), windowLen, s))
    df.withWatermark(tsCol, watermark)
      .groupBy(win.as("window") +: by: _*)
      .agg(exprs.head._2.as(exprs.head._1),
        exprs.tail.map { case (n, e) => e.as(n) }: _*)
  }

  /** Streaming exact dedup with BOUNDED state: duplicates of the key
    * columns arriving within the watermark lateness bound are dropped,
    * and per-key state expires as the watermark advances. (Plain
    * `dropDuplicates` on a stream retains every key forever — a state
    * leak at 100 TB/day; this is the production form.) */
  def dedupStream(df: DataFrame, tsCol: String, watermark: String,
      keys: Seq[String]): DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** THE scaled-int convention for streaming values: the exact IEEE
    * operation sequence the DuckDB oracles spell as
    * `CAST(floor(value * 10000 + 0.5) AS BIGINT)` — multiply, add 0.5,
    * floor, each a rounded double op. `math.round` is NOT this function:
    * the JDK special-cases doubles like 0.49999999999999994 (where the
    * `+ 0.5` itself rounds up past the true sum) to stay "closest long",
    * while DuckDB's floor-form lets the addition's rounding decide. One
    * shared helper so the convention cannot fork across the six
    * stateful operators again (round-9 verdict item 1); StreamingSpec
    * pins it against the literal floor form on tie and near-tie values,
    * negatives included. */
  def scaledE4(value: Double): Long =
    math.floor(value * 10000d + 0.5d).toLong

  // --- per-row trailing range frame (the StatefulOnly recipe, realized) --

  /** One output row per input event: the trailing-frame aggregate at
    * that event. `winSumE4` is the EXACT integer sum of `value` scaled
    * by 1e4 (the fixture's value grid) — integer accumulation makes the
    * cross-engine comparison deterministic with no rounding epsilon at
    * all (SURVEY §5.1 discipline, applied at the operator level). */
  case class TrailingAgg(key: Long, tsMillis: Long, winN: Long,
      winSumE4: Long)

  /** Per-key buffer state: events inside the trailing horizon of the
    * newest seen timestamp, ascending; bounded by frame span × arrival
    * rate. */
  case class TrailingBuf(entryTs: Seq[Long], entryV: Seq[Long],
      maxTs: Long)

  /** PER-ROW trailing event-time frame on a stream — the reference's
    * flagship semantics (`.frame = c(before, 0)` over a time `.index`),
    * which [[supports]] classifies `StatefulOnly("watermark-bounded
    * per-key event-time buffer")`. This is that recipe, realized:
    * each key keeps the events inside `beforeMillis` of its newest
    * timestamp; every arriving event emits its own
    * `[t - beforeMillis, t]` aggregate (inclusive both ends and
    * including equal-timestamp peers — exactly the batch
    * `rangeBetween(-before, 0)` contract).
    *
    * ARRIVAL-ORDER CONTRACT: with per-key ts-ordered arrival (sorted
    * log/file replay — the gated fixture), emission is immediate and
    * EXACT: a trailing frame only needs past events, all of which have
    * arrived. Out-of-order arrivals are best-effort: a late row
    * aggregates over whatever the retained horizon still holds, and
    * never corrupts in-order state (it enters the buffer only inside
    * the horizon). A strict out-of-order deployment would delay each
    * row's emission until the watermark passes its timestamp — same
    * state bound, added latency; the immediate form is the one a
    * time-ordered ingest (Kafka per-key order, dated files) actually
    * wants.
    *
    * State per key is O(frame span × rate), not O(stream); the shuffle
    * is the standard hash-partition every stateful op pays. Works
    * identically on batch Datasets (the df/lazy single-path collapse,
    * like [[sessionize]]). */
  def trailingW(events: Dataset[KeyedEvent],
      beforeMillis: Long): Dataset[TrailingAgg] = {
    require(beforeMillis >= 0, "beforeMillis must be >= 0")
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState[TrailingBuf, TrailingAgg](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[KeyedEvent], st: GroupState[TrailingBuf]) =>
          val batch = it.toSeq.sortBy(e => (e.tsMillis, e.value))
          val prev = st.getOption.getOrElse(TrailingBuf(Nil, Nil, Long.MinValue))
          // merged ascending multiset of (ts, scaledValue): retained
          // horizon + this batch (ties included — range-frame peers)
          val merged = (prev.entryTs.zip(prev.entryV) ++ batch.map(e =>
              e.tsMillis -> scaledE4(e.value)))
            .sortBy(identity)
          val out = batch.map { e =>
            val lo = e.tsMillis - beforeMillis
            var n = 0L; var s = 0L
            merged.foreach { case (t, v) =>
              if (t >= lo && t <= e.tsMillis) { n += 1; s += v }
            }
            TrailingAgg(key, e.tsMillis, n, s)
          }
          val maxTs = math.max(prev.maxTs,
            if (batch.nonEmpty) batch.last.tsMillis else Long.MinValue)
          val keep = merged.filter(_._1 >= maxTs - beforeMillis)
          st.update(TrailingBuf(keep.map(_._1), keep.map(_._2), maxTs))
          out.iterator
      }
  }

  /** [[trailingWDelayed]] input row: [[KeyedEvent]] plus the TimestampType
    * projection of tsMillis the watermark is declared on (public because
    * encoder codegen must construct it). */
  case class KeyedEventT(key: Long, tsMillis: Long, value: Double,
      eventTime: java.sql.Timestamp)

  /** [[trailingWDelayed]] per-key state: retained events (ascending
    * (ts, scaledValue) multiset) and the emission high-water mark —
    * every event with ts <= emittedThrough has already been emitted. */
  case class TrailingDelayBuf(entryTs: Seq[Long], entryV: Seq[Long],
      emittedThrough: Long)

  /** [[trailingW]]'s OUT-OF-ORDER sibling: watermark-DELAYED emission
    * (r07 verdict item 4 — the "strict out-of-order deployment" the
    * trailingW scaladoc described, executed). Same output contract (one
    * row per event carrying its own `[t - beforeMillis, t]` exact
    * integer aggregate), but each row is held until the watermark
    * strictly passes its timestamp: at that point every event with
    * ts <= t is either arrived (it is <= the watermark) or dropped by
    * the engine's late-row filter as beyond `latenessMillis`, so the
    * emitted aggregate is EXACT under ANY arrival order with disorder
    * bounded by the lateness — no sorted-replay contract.
    *
    * Emission gates on `wm - 1`, not `wm`: Spark's late filter admits
    * rows AT the watermark, so a ts == wm row could still arrive after
    * rows at that timestamp were emitted; the strict gate closes that
    * one-millisecond race. Stragglers beyond the lateness bound (which
    * a correctly-configured fixture never produces, and the engine
    * normally drops) emit immediately, best-effort, like [[trailingW]].
    *
    * State per key is O((frame span + lateness) × rate): the retained
    * horizon covers pending rows' frames; pruning tracks the emission
    * mark exactly as [[trailingW]] prunes behind maxTs. The trade vs
    * [[trailingW]] is the standard one: exactness under disorder,
    * bought with watermark latency and a lateness-widened buffer.
    *
    * `afterMillis > 0` generalizes the frame to `[t - before, t + after]`
    * — the FINITE POSITIVE TIME LOOKAHEAD the degradation matrix
    * classifies StatefulOnly ("a positive time lookahead waits for the
    * watermark to pass hi"): a row emits once the watermark strictly
    * passes `t + after`, at which point every frame member has either
    * arrived or been dropped as beyond-lateness. Same state bound with
    * the span widened by `after`. (Contrast ROW-count lookahead, which
    * no watermark can ever release — NotStreamable.) */
  def trailingWDelayed(events: Dataset[KeyedEvent], beforeMillis: Long,
      latenessMillis: Long, afterMillis: Long = 0L): Dataset[TrailingAgg] = {
    require(beforeMillis >= 0, "beforeMillis must be >= 0")
    require(latenessMillis >= 0, "latenessMillis must be >= 0")
    require(afterMillis >= 0,
      "afterMillis must be >= 0 (a FINITE positive time lookahead — the " +
        "supports() StatefulOnly verdict for (time b, time a>0) frames)")
    import events.sparkSession.implicits._
    events
      .withColumn("eventTime", timestamp_millis(col("tsMillis")))
      .withWatermark("eventTime", s"$latenessMillis milliseconds")
      .as[KeyedEventT]
      .groupByKey(_.key)
      .flatMapGroupsWithState[TrailingDelayBuf, TrailingAgg](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[KeyedEventT],
         st: GroupState[TrailingDelayBuf]) =>
          val prev = st.getOption.getOrElse(
            TrailingDelayBuf(Nil, Nil, Long.MinValue))
          val batch = it.toSeq
          // stragglers: already past the emission mark (beyond-lateness
          // arrivals the engine let through) — their own row emits now,
          // best-effort; they still join the buffer so FUTURE frames
          // that reach back to them stay exact
          val (stragglers, fresh) =
            batch.partition(_.tsMillis <= prev.emittedThrough)
          val merged = (prev.entryTs.zip(prev.entryV) ++
              (fresh ++ stragglers).map(e =>
                e.tsMillis -> scaledE4(e.value)))
            .sortBy(identity)
          def aggAt(t: Long): TrailingAgg = {
            val lo = t - beforeMillis
            val hi = t + afterMillis
            var n = 0L; var s = 0L
            merged.foreach { case (ts, v) =>
              if (ts >= lo && ts <= hi) { n += 1; s += v }
            }
            TrailingAgg(key, t, n, s)
          }
          // a row's frame closes once the watermark strictly passes its
          // hi boundary t + after — the watermark-released lookahead of
          // the degradation matrix ("emit each row once the watermark
          // passes its hi boundary")
          val emitUpTo = st.getCurrentWatermarkMs() - 1 - afterMillis
          val out =
            merged.iterator.map(_._1)
              .filter(t => t > prev.emittedThrough && t <= emitUpTo)
              .map(aggAt).toVector ++
            stragglers.map(e => aggAt(e.tsMillis))
          val emittedThrough = math.max(prev.emittedThrough, emitUpTo)
          val keep = merged.filter(_._1 > emittedThrough - beforeMillis)
          st.update(TrailingDelayBuf(keep.map(_._1), keep.map(_._2),
            emittedThrough))
          out.iterator
      }
  }

  /** [[runningW]] output: the running (cumulative) aggregate AT each
    * event, range-peer semantics (ties share the value). */
  case class RunningAgg(key: Long, tsMillis: Long, cumN: Long,
      cumSumE4: Long)

  /** [[runningW]] per-key state — O(1): the accumulator, not a buffer. */
  case class RunningState(n: Long, sumE4: Long, maxTs: Long)

  /** RUNNING (cumulative) aggregate on a stream — the degradation
    * matrix's FIRST StatefulOnly recipe ("running aggregate: per-key
    * accumulator, decomposable aggregates only"), realized: the batch
    * `.frame = c(Inf, 0)` over a time `.index` (range semantics: rows
    * sharing a timestamp are frame peers and share the value). One
    * output row per event carrying the cumulative count and exact
    * scaled-integer sum through its timestamp.
    *
    * State per key is O(1) — three longs, NOT a buffer: this is the
    * most scalable shape in the matrix (state ∝ |active keys|, like
    * [[sessionize]], and independent of both frame span and rate).
    * Same arrival-order contract as [[trailingW]]: per-key ts-ordered
    * arrival (sorted log/file replay) gives immediate exact emission;
    * a beyond-contract straggler folds into the accumulator and emits
    * its row best-effort (the accumulator stays consistent — sums are
    * order-independent — but rows already emitted are not revised). */
  def runningW(events: Dataset[KeyedEvent]): Dataset[RunningAgg] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState[RunningState, RunningAgg](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[KeyedEvent], st: GroupState[RunningState]) =>
          val prev = st.getOption.getOrElse(RunningState(0L, 0L, Long.MinValue))
          val batch = it.toSeq.sortBy(e => (e.tsMillis, e.value))
          var n = prev.n; var s = prev.sumE4
          val out = batch.groupBy(_.tsMillis).toSeq.sortBy(_._1)
            .flatMap { case (ts, peers) =>
              // range-peer semantics: fold the whole tie group, then
              // every peer emits the shared post-group value
              n += peers.size
              s += peers.map(e => scaledE4(e.value)).sum
              peers.map(_ => RunningAgg(key, ts, n, s))
            }
          val maxTs = math.max(prev.maxTs,
            batch.lastOption.map(_.tsMillis).getOrElse(Long.MinValue))
          st.update(RunningState(n, s, maxTs))
          out.iterator
      }
  }

  /** [[runningWDelayed]] per-key state: the accumulator (n, sumE4) over
    * every FOLDED row, the emission high-water mark, the not-yet-folded
    * (ts, scaledValue) buffer, and the not-yet-emitted ts list. With a
    * positive lookahead the two pendings differ: a row inside an
    * earlier row's `[_, t+after]` frame folds into the accumulator
    * before its own release point arrives. */
  case class RunningDelayBuf(n: Long, sumE4: Long, emittedThrough: Long,
      pendTs: Seq[Long], pendV: Seq[Long], emitTs: Seq[Long])

  /** [[runningW]]'s OUT-OF-ORDER sibling — the LAST StatefulOnly recipe
    * of the degradation matrix realized ("running aggregate with a
    * watermark-delayed emit"): the accumulator is still O(1), but each
    * row is held in a pending buffer until the watermark strictly
    * passes its timestamp — at that point every row with ts <= t has
    * either arrived or been dropped as beyond-lateness, so the emitted
    * cumulative (count, exact scaled-integer sum) is EXACT under ANY
    * arrival order with disorder bounded by the lateness. Range-peer
    * semantics as [[runningW]]: ties fold as one group and share the
    * post-group value.
    *
    * State per key is O(1) + O(lateness × rate) pending rows — the
    * lateness-widened sliver between the watermark and the newest
    * arrival, NOT the stream (contrast [[trailingWDelayed]], whose
    * buffer also spans the frame width). Stragglers beyond the
    * emission mark fold into the accumulator immediately (sums are
    * order-independent, so state stays consistent) and emit their own
    * row best-effort, like every delayed operator here. */
  def runningWDelayed(events: Dataset[KeyedEvent],
      latenessMillis: Long, afterMillis: Long = 0L): Dataset[RunningAgg] = {
    require(latenessMillis >= 0, "latenessMillis must be >= 0")
    require(afterMillis >= 0,
      "afterMillis must be >= 0 (a FINITE positive time lookahead — the " +
        "supports() StatefulOnly verdict for (Unbounded, time a>0) frames)")
    import events.sparkSession.implicits._
    events
      .withColumn("eventTime", timestamp_millis(col("tsMillis")))
      .withWatermark("eventTime", s"$latenessMillis milliseconds")
      .as[KeyedEventT]
      .groupByKey(_.key)
      .flatMapGroupsWithState[RunningDelayBuf, RunningAgg](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[KeyedEventT],
         st: GroupState[RunningDelayBuf]) =>
          val prev = st.getOption.getOrElse(
            RunningDelayBuf(0L, 0L, Long.MinValue, Nil, Nil, Nil))
          val batch = it.toSeq
            .map(e => e.tsMillis -> scaledE4(e.value))
          val (stragglers, fresh) =
            batch.partition(_._1 <= prev.emittedThrough)
          var n = prev.n; var s = prev.sumE4
          // stragglers fold + emit best-effort: with a lookahead the
          // accumulator has already folded through a LATER frame end,
          // so the straggler's value over-counts — documented, like
          // every delayed operator's beyond-lateness path
          val stragglerOut = stragglers.sortBy(identity).map {
            case (ts, v) => n += 1; s += v; RunningAgg(key, ts, n, s)
          }
          // two pendings (see RunningDelayBuf): fold-pending carries
          // values for the accumulator, emit-pending carries rows
          // awaiting their own release — a lookahead folds frame
          // members before they emit
          val pendFold = (prev.pendTs.zip(prev.pendV) ++ fresh)
            .sortBy(identity).toIndexedSeq
          val pendEmit = (prev.emitTs ++ fresh.map(_._1)).sorted
          // a row's frame [start, t + after] closes once the watermark
          // strictly passes t + after; every frame member (ts' <= t +
          // after <= wm - 1) has then arrived or been dropped
          val emitUpTo = st.getCurrentWatermarkMs() - 1 - afterMillis
          val (release, keepEmit) = pendEmit.partition(_ <= emitUpTo)
          // releases and the fold buffer are BOTH ascending, so one
          // two-pointer sweep folds each frame's members exactly once —
          // O(R + P) per batch, not O(R x P) (after = 0 degenerates to
          // folding exactly the release tie-group)
          var fi = 0
          val releaseOut = release.groupBy(identity).toSeq.sortBy(_._1)
            .flatMap { case (ts, peers) =>
              while (fi < pendFold.length &&
                  pendFold(fi)._1 <= ts + afterMillis) {
                n += 1; s += pendFold(fi)._2; fi += 1
              }
              peers.map(_ => RunningAgg(key, ts, n, s))
            }
          val keepFold = pendFold.drop(fi)
          val emittedThrough = math.max(prev.emittedThrough, emitUpTo)
          st.update(RunningDelayBuf(n, s, emittedThrough,
            keepFold.map(_._1), keepFold.map(_._2), keepEmit))
          (stragglerOut ++ releaseOut).iterator
      }
  }

  /** [[cusumWDelayed]] output: the CUSUM value AT each event
    * (range-peer semantics: ties share it) plus the drift flag. */
  case class CusumAgg(key: Long, tsMillis: Long, cusumE4: Long,
      isDrift: Boolean)

  /** [[cusumWDelayed]] per-key state: the running Σ(v−a) and its
    * running minimum over released tie-groups (both O(1) longs — the
    * max-subarray identity s = r − min(0, min r) needs nothing else),
    * the emission high-water mark, and the lateness-sliver pending
    * buffer. */
  case class CusumDelayBuf(r: Long, mn: Long, emittedThrough: Long,
      pendTs: Seq[Long], pendV: Seq[Long])

  /** CUSUM upward-drift detection on a stream — the ORDER-DEPENDENT
    * stateful recipe the degradation matrix's running aggregates don't
    * cover: s = max(0, s + v − a) is a recursion over the EVENT-TIME
    * order, so unlike a running sum (order-independent folds) it can
    * only be exact once arrival order is settled. The watermark-delayed
    * form holds each row in the lateness-sliver pending buffer and
    * releases tie-groups in event-time order when the watermark
    * strictly passes their timestamp — at that point the prefix is
    * complete, and the max-subarray identity
    *   s(t) = r(t) − min(0, min_{t'≤t} r(t'))
    * (r = running Σ(v−a), ts-tie groups fold as one — range-peer
    * semantics like [[runningWDelayed]]) gives the exact CUSUM with
    * O(1) accumulator state: two longs, no window buffer. This is the
    * streaming twin of the batch `ts_changepoint_cusum` key, same
    * identity, same exact-integer contract (scaledE4 values, integer
    * allowance/threshold, pure integer drift predicate).
    *
    * A beyond-lateness straggler folds into (r, mn) at its ARRIVAL
    * point and emits best-effort — the accumulator remains a valid
    * CUSUM of the as-arrived sequence, but event-time exactness for
    * later rows is degraded (documented; unlike sums, an
    * order-dependent recursion cannot absorb stragglers exactly). */
  def cusumWDelayed(events: Dataset[KeyedEvent], allowanceE4: Long,
      thresholdE4: Long, latenessMillis: Long): Dataset[CusumAgg] = {
    require(latenessMillis >= 0, "latenessMillis must be >= 0")
    import events.sparkSession.implicits._
    events
      .withColumn("eventTime", timestamp_millis(col("tsMillis")))
      .withWatermark("eventTime", s"$latenessMillis milliseconds")
      .as[KeyedEventT]
      .groupByKey(_.key)
      .flatMapGroupsWithState[CusumDelayBuf, CusumAgg](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[KeyedEventT],
         st: GroupState[CusumDelayBuf]) =>
          val prev = st.getOption.getOrElse(
            CusumDelayBuf(0L, 0L, Long.MinValue, Nil, Nil))
          val batch = it.toSeq
            .map(e => e.tsMillis -> (scaledE4(e.value) - allowanceE4))
          val (stragglers, fresh) =
            batch.partition(_._1 <= prev.emittedThrough)
          var r = prev.r; var mn = prev.mn
          def emit(ts: Long, n: Int): Seq[CusumAgg] = {
            val s = r - math.min(0L, mn)
            Seq.fill(n)(CusumAgg(key, ts, s, s > thresholdE4))
          }
          // beyond-lateness stragglers: fold at arrival, best-effort
          val stragglerOut = stragglers.sortBy(identity).flatMap {
            case (ts, d) => r += d; mn = math.min(mn, r); emit(ts, 1)
          }
          val pend = (prev.pendTs.zip(prev.pendV) ++ fresh)
            .sortBy(identity).toIndexedSeq
          val emitUpTo = st.getCurrentWatermarkMs() - 1
          val fi = pend.indexWhere(_._1 > emitUpTo) match {
            case -1 => pend.length
            case i  => i
          }
          // release in ts order, folding tie-groups as one delta
          val releaseOut = pend.take(fi).groupBy(_._1).toSeq.sortBy(_._1)
            .flatMap { case (ts, grp) =>
              r += grp.map(_._2).sum
              mn = math.min(mn, r)
              emit(ts, grp.size)
            }
          val keep = pend.drop(fi)
          st.update(CusumDelayBuf(r, mn,
            math.max(prev.emittedThrough, emitUpTo),
            keep.map(_._1), keep.map(_._2)))
          (stragglerOut ++ releaseOut).iterator
      }
  }

  /** [[topkWDelayed]] output: one row per (key, closed window, rank). */
  case class TopkAgg(key: Long, winStartMillis: Long, rank: Long,
      valueE4: Long, cnt: Long)

  /** One open window's value→count bag, Seq-encoded as parallel
    * (vs, cs) arrays sorted by value (a stable state layout — the
    * encoder round-trip must not reorder what the fold rebuilds). */
  case class WinCounts(winStart: Long, vs: Seq[Long], cs: Seq[Long])

  /** [[topkWDelayed]] per-key state: the open windows' count bags and
    * the largest already-closed window start (every window at or
    * below it has been emitted). */
  case class TopkDelayBuf(wins: Seq[WinCounts], emittedThrough: Long)

  /** Per-key TOP-K heavy values over TUMBLING event-time windows,
    * exact under out-of-order arrival — an op Structured Streaming
    * cannot express natively: the windowed value counts are one
    * streaming aggregation, but ranking them per window is a SECOND
    * aggregation over streaming results, and chained streaming
    * aggregations are unsupported in append mode. One
    * flatMapGroupsWithState does both: per key it keeps a count bag
    * per OPEN window (state O(open windows × distinct values) — open
    * windows are bounded by lateness/window, distinct values by the
    * domain, both INDEPENDENT of stream length: the StreamProbe
    * contract), folds arrivals in any order (counting is
    * order-independent — unlike [[cusumWDelayed]] no tie-order
    * contract is needed; determinism comes from the total
    * (cnt desc, value asc) rank order alone), and emits a window's
    * ranked top k once the watermark strictly passes its last member
    * timestamp (winStart + W − 1 ≤ wm − 1): at that point every member
    * has either arrived or been dropped by the engine's late filter,
    * so the ranking is final. Rows for an already-emitted window
    * (beyond-lateness stragglers the engine let through) are DROPPED —
    * append mode cannot retract a published ranking; a
    * correctly-configured stream (lateness ≥ disorder bound) never
    * produces them, mirroring the engine's own windowed-aggregate
    * semantics. */
  def topkWDelayed(events: Dataset[KeyedEvent], windowMillis: Long,
      k: Int, latenessMillis: Long): Dataset[TopkAgg] = {
    require(windowMillis > 0, "windowMillis must be > 0")
    require(k >= 1, "k must be >= 1")
    require(latenessMillis >= 0, "latenessMillis must be >= 0")
    import events.sparkSession.implicits._
    events
      .withColumn("eventTime", timestamp_millis(col("tsMillis")))
      .withWatermark("eventTime", s"$latenessMillis milliseconds")
      .as[KeyedEventT]
      .groupByKey(_.key)
      .flatMapGroupsWithState[TopkDelayBuf, TopkAgg](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[KeyedEventT],
         st: GroupState[TopkDelayBuf]) =>
          val prev = st.getOption.getOrElse(TopkDelayBuf(Nil, Long.MinValue))
          val bags = scala.collection.mutable.Map.empty[Long,
            scala.collection.mutable.Map[Long, Long]]
          prev.wins.foreach { w =>
            bags(w.winStart) =
              scala.collection.mutable.Map(w.vs.zip(w.cs): _*)
          }
          it.foreach { e =>
            val w = Math.floorDiv(e.tsMillis, windowMillis) * windowMillis
            if (w > prev.emittedThrough) {
              val bag = bags.getOrElseUpdate(w,
                scala.collection.mutable.Map.empty)
              val v = scaledE4(e.value)
              bag(v) = bag.getOrElse(v, 0L) + 1L
            }
          }
          // winStart + W − 1 ≤ wm − 1  ⇔  winStart ≤ wm − W
          val emitUpTo = st.getCurrentWatermarkMs() - windowMillis
          val (close, keep) = bags.partition(_._1 <= emitUpTo)
          val out = close.toSeq.sortBy(_._1).flatMap { case (w, bag) =>
            bag.toSeq.sortBy { case (v, c) => (-c, v) }.take(k)
              .zipWithIndex.map { case ((v, c), i) =>
                TopkAgg(key, w, i + 1L, v, c)
              }
          }
          val emittedThrough =
            if (close.nonEmpty) math.max(prev.emittedThrough, close.keys.max)
            else prev.emittedThrough
          st.update(TopkDelayBuf(
            keep.toSeq.sortBy(_._1).map { case (w, bag) =>
              val sorted = bag.toSeq.sortBy(_._1)
              WinCounts(w, sorted.map(_._1), sorted.map(_._2))
            },
            emittedThrough))
          out.iterator
      }
  }

  /** [[quantileWDelayed]] output: exact discrete quantiles of one
    * closed (key, tumbling window) group. Indices are 1-based ceil
    * ranks computed in INTEGER arithmetic — `p50 = (n+1)/2`,
    * `p95 = (95n+99)/100` — so the cross-engine compare has no float
    * dimension at all (the oracle uses the same `//` forms). */
  case class QuantileAgg(key: Long, winStartMillis: Long, n: Long,
      p50E4: Long, p95E4: Long)

  /** Per-key P50/P95 over TUMBLING event-time windows, exact under
    * out-of-order arrival — the latency-monitoring staple (round-12
    * verdict item 7) and, like [[topkWDelayed]], an op Structured
    * Streaming cannot express natively (a windowed percentile of
    * streaming aggregates would chain two streaming aggregations —
    * unsupported in append mode). State is the same
    * order-independent value→count bag per OPEN window the topk op
    * keeps ([[WinCounts]]/[[TopkDelayBuf]] reused verbatim — the bag
    * IS the mergeable sketch: in the e4-scaled value domain it is an
    * EXACT equi-width histogram, O(open windows × distinct values),
    * independent of stream length — the StreamProbe contract). Folds
    * arrivals in any order; emits a window once the watermark strictly
    * passes its last member (winStart ≤ wm − W), at which point the
    * bag is final and the quantiles are computed by one cumulative
    * walk of the value-sorted bag (no expansion to n rows).
    * Beyond-lateness stragglers for an already-emitted window are
    * dropped — append mode cannot retract, mirroring the engine's own
    * windowed-aggregate semantics. */
  def quantileWDelayed(events: Dataset[KeyedEvent], windowMillis: Long,
      latenessMillis: Long): Dataset[QuantileAgg] = {
    require(windowMillis > 0, "windowMillis must be > 0")
    require(latenessMillis >= 0, "latenessMillis must be >= 0")
    import events.sparkSession.implicits._
    events
      .withColumn("eventTime", timestamp_millis(col("tsMillis")))
      .withWatermark("eventTime", s"$latenessMillis milliseconds")
      .as[KeyedEventT]
      .groupByKey(_.key)
      .flatMapGroupsWithState[TopkDelayBuf, QuantileAgg](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[KeyedEventT],
         st: GroupState[TopkDelayBuf]) =>
          val prev = st.getOption.getOrElse(TopkDelayBuf(Nil, Long.MinValue))
          val bags = scala.collection.mutable.Map.empty[Long,
            scala.collection.mutable.Map[Long, Long]]
          prev.wins.foreach { w =>
            bags(w.winStart) =
              scala.collection.mutable.Map(w.vs.zip(w.cs): _*)
          }
          it.foreach { e =>
            val w = Math.floorDiv(e.tsMillis, windowMillis) * windowMillis
            if (w > prev.emittedThrough) {
              val bag = bags.getOrElseUpdate(w,
                scala.collection.mutable.Map.empty)
              val v = scaledE4(e.value)
              bag(v) = bag.getOrElse(v, 0L) + 1L
            }
          }
          val emitUpTo = st.getCurrentWatermarkMs() - windowMillis
          val (close, keep) = bags.partition(_._1 <= emitUpTo)
          val out = close.toSeq.sortBy(_._1).map { case (w, bag) =>
            val sorted = bag.toSeq.sortBy(_._1)
            val n = sorted.iterator.map(_._2).sum
            // 1-based ceil ranks in integer arithmetic (see QuantileAgg)
            def at(rank: Long): Long = {
              var cum = 0L
              var res = sorted.head._1
              val iter = sorted.iterator
              var found = false
              while (!found && iter.hasNext) {
                val (v, c) = iter.next(); cum += c
                if (cum >= rank) { res = v; found = true }
              }
              res
            }
            QuantileAgg(key, w, n, at((n + 1) / 2), at((95 * n + 99) / 100))
          }
          val emittedThrough =
            if (close.nonEmpty) math.max(prev.emittedThrough, close.keys.max)
            else prev.emittedThrough
          st.update(TopkDelayBuf(
            keep.toSeq.sortBy(_._1).map { case (w, bag) =>
              val sorted = bag.toSeq.sortBy(_._1)
              WinCounts(w, sorted.map(_._1), sorted.map(_._2))
            },
            emittedThrough))
          out.iterator
      }
  }

  /** [[asofJoinWDelayed]] input: one UNION-TAGGED stream — Spark has no
    * stream-stream as-of join, so both sides ride one keyed stream with
    * a side tag and meet in per-key state (the Flink-temporal-join
    * pattern, re-expressed on flatMapGroupsWithState). */
  case class TaggedEvent(key: Long, tsMillis: Long, value: Double,
      isQuote: Boolean)
  private[graft] case class TaggedEventT(key: Long, tsMillis: Long,
      value: Double, isQuote: Boolean, eventTime: java.sql.Timestamp)

  /** [[asofJoinWDelayed]] output: each LEFT event joined to the latest
    * quote at or before its timestamp (None = no quote yet). */
  case class AsofJoined(key: Long, tsMillis: Long, valueE4: Long,
      quoteE4: Option[Long])

  /** [[asofJoinWDelayed]] per-key state: the quote book as ascending
    * (ts → per-ts MAX value) entries — pruned to the single latest
    * entry at or below the emission mark plus everything after it —
    * and the pending left rows in the lateness sliver. */
  case class AsofBuf(emittedThrough: Long, quoteTs: Seq[Long],
      quoteV: Seq[Long], pendTs: Seq[Long], pendV: Seq[Long])

  /** Stream-stream AS-OF join (temporal join): every left event emits
    * with the most recent right-side quote at or before its event
    * time. Structured Streaming's stream-stream joins are equality +
    * bounded-range only — the as-of shape ("latest value so far") is
    * exactly what they cannot express, and the standard rewrite is the
    * one here: tag both sides, union into ONE keyed stream, and keep a
    * per-key QUOTE BOOK in state. Watermark-delayed exactness: a left
    * row releases when the watermark strictly passes its timestamp —
    * every quote with ts ≤ that row's ts (the only ones that can win
    * the as-of) has then arrived or been dropped — so emission is
    * EXACT under any arrival order within the lateness, both sides
    * shuffled together. Ties: rows sharing (key, ts) are one side by
    * construction here, and concurrent quotes at one ts fold to their
    * MAX (the deterministic tie rule the batch oracle mirrors with a
    * per-(key, ts) max pre-aggregate before DuckDB's native ASOF).
    * State is O(lateness × rate) pending lefts + the pruned quote
    * book: one entry at or below the emission mark (the reigning
    * quote) plus the lateness sliver — NOT the stream's history.
    * Stragglers: a beyond-lateness left answers from the current book
    * best-effort; a beyond-lateness quote folds into the book and can
    * only affect FUTURE answers (already-emitted rows are immutable,
    * the Append-mode contract). */
  def asofJoinWDelayed(events: Dataset[TaggedEvent],
      latenessMillis: Long): Dataset[AsofJoined] = {
    require(latenessMillis >= 0, "latenessMillis must be >= 0")
    import events.sparkSession.implicits._
    events
      .withColumn("eventTime", timestamp_millis(col("tsMillis")))
      .withWatermark("eventTime", s"$latenessMillis milliseconds")
      .as[TaggedEventT]
      .groupByKey(_.key)
      .flatMapGroupsWithState[AsofBuf, AsofJoined](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[TaggedEventT], st: GroupState[AsofBuf]) =>
          val prev = st.getOption.getOrElse(
            AsofBuf(Long.MinValue, Nil, Nil, Nil, Nil))
          val batch = it.toSeq
          val (quotes, lefts) = batch.partition(_.isQuote)
          // quote book: merge fresh quotes (any order, any lateness —
          // a quote only ever improves future answers) at per-ts MAX
          val book = scala.collection.mutable.TreeMap.empty[Long, Long]
          prev.quoteTs.zip(prev.quoteV).foreach { case (t, v) =>
            book(t) = v
          }
          quotes.foreach { q =>
            val v = scaledE4(q.value)
            book(q.tsMillis) = book.get(q.tsMillis).fold(v)(math.max(_, v))
          }
          def answer(ts: Long): Option[Long] =
            book.rangeTo(ts).lastOption.map(_._2)
          val (stragglers, fresh) = lefts.map(e =>
              e.tsMillis -> scaledE4(e.value))
            .partition(_._1 <= prev.emittedThrough)
          val stragglerOut = stragglers.sortBy(identity).map {
            case (ts, v) => AsofJoined(key, ts, v, answer(ts))
          }
          val pend = (prev.pendTs.zip(prev.pendV) ++ fresh)
            .sortBy(identity).toIndexedSeq
          val emitUpTo = st.getCurrentWatermarkMs() - 1
          val fi = pend.indexWhere(_._1 > emitUpTo) match {
            case -1 => pend.length
            case i  => i
          }
          val releaseOut = pend.take(fi).map { case (ts, v) =>
            AsofJoined(key, ts, v, answer(ts))
          }
          val keep = pend.drop(fi)
          val emittedThrough = math.max(prev.emittedThrough, emitUpTo)
          // prune: the reigning quote (latest ≤ mark) + the open tail
          val reign = book.rangeTo(emittedThrough).lastOption.map(_._1)
          val kept = book.iterator.filter { case (t, _) =>
            t > emittedThrough || reign.contains(t)
          }.toIndexedSeq
          st.update(AsofBuf(emittedThrough,
            kept.map(_._1), kept.map(_._2),
            keep.map(_._1), keep.map(_._2)))
          (stragglerOut ++ releaseOut).iterator
      }
  }

  /** [[trailingRowsW]] per-key state: the trailing nRows−1 entries as an
    * ascending (ts, scaledValue) list. */
  case class RowsBuf(entryTs: Seq[Long], entryV: Seq[Long])

  /** Trailing N-ROWS frame on a stream — the `(Rows(b), Rows(0))`
    * StatefulOnly recipe from [[supports]] ("bounded per-key buffer of
    * the trailing b+1 rows"), realized: each key retains exactly the
    * previous nRows−1 entries, and every arriving event emits its own
    * rows-frame aggregate over them plus itself — the batch
    * `rowsBetween(-(n-1), 0)` contract, ramp-up included.
    *
    * State per key is O(nRows) — independent of frame SPAN and rate
    * (contrast [[trailingW]]'s time-buffer, which is O(span × rate)):
    * rows frames are the cheapest stateful window shape.
    *
    * ARRIVAL-ORDER CONTRACT as [[trailingW]]: per-key ts-ordered file
    * replay gives immediate exact emission; within a micro-batch rows
    * order by (ts, scaledValue). Rows-frame tie order is inherently
    * ambiguous, but the OUTPUT MULTISET is tie-order invariant (tied
    * rows carry equal values, so swapping two tied rows swaps which of
    * them gets which frame sum — the set of emitted rows is unchanged),
    * which is exactly what the sorted-hash oracle gate compares. A
    * beyond-contract straggler aggregates over the retained buffer
    * best-effort, like trailingW's late rows. */
  def trailingRowsW(events: Dataset[KeyedEvent],
      nRows: Int): Dataset[TrailingAgg] = {
    require(nRows >= 1, "nRows must be >= 1")
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState[RowsBuf, TrailingAgg](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[KeyedEvent], st: GroupState[RowsBuf]) =>
          val batch = it.toSeq
            .map(e => (e.tsMillis, scaledE4(e.value)))
            .sortBy(identity)
          val prev = st.getOption.getOrElse(RowsBuf(Nil, Nil))
          // state entries are strictly older than the batch under the
          // arrival contract (file splits are by ts), so concatenation
          // IS the merged order
          val all = (prev.entryTs.zip(prev.entryV) ++ batch).toIndexedSeq
          val k = all.length - batch.length
          val out = batch.zipWithIndex.map { case ((ts, _), j) =>
            val i = k + j
            val fr = all.slice(math.max(0, i - (nRows - 1)), i + 1)
            TrailingAgg(key, ts, fr.length.toLong, fr.iterator.map(_._2).sum)
          }
          val keep = all.takeRight(nRows - 1)
          st.update(RowsBuf(keep.map(_._1), keep.map(_._2)))
          out.iterator
      }
  }

  /** [[trailingRowsWDelayed]] per-key state: trailing nRows−1 entries of
    * the RELEASED prefix (ascending (ts, scaledValue)), the pending
    * not-yet-released buffer, and the emission high-water mark. */
  case class RowsDelayBuf(tailTs: Seq[Long], tailV: Seq[Long],
      pendTs: Seq[Long], pendV: Seq[Long], emittedThrough: Long)

  /** [[trailingRowsW]]'s OUT-OF-ORDER sibling: trailing N-rows frames
    * under bounded-disorder arrival. Row order is the total (ts,
    * scaledValue) order; a row releases when the watermark strictly
    * passes its ts — at that point every row sorting before it has
    * either arrived or been dropped as beyond-lateness, so the frame
    * (the N−1 rows immediately before it in the total order, plus
    * itself) is exact. Releases ascend, so the released prefix grows in
    * order and the state keeps only its trailing N−1 entries plus the
    * pending sliver — O(nRows + lateness × rate). Output multiset is
    * tie-order invariant (the trailingRowsW argument). Stragglers emit
    * best-effort over the retained tail. */
  def trailingRowsWDelayed(events: Dataset[KeyedEvent], nRows: Int,
      latenessMillis: Long): Dataset[TrailingAgg] = {
    require(nRows >= 1, "nRows must be >= 1")
    require(latenessMillis >= 0, "latenessMillis must be >= 0")
    import events.sparkSession.implicits._
    events
      .withColumn("eventTime", timestamp_millis(col("tsMillis")))
      .withWatermark("eventTime", s"$latenessMillis milliseconds")
      .as[KeyedEventT]
      .groupByKey(_.key)
      .flatMapGroupsWithState[RowsDelayBuf, TrailingAgg](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[KeyedEventT],
         st: GroupState[RowsDelayBuf]) =>
          val prev = st.getOption.getOrElse(
            RowsDelayBuf(Nil, Nil, Nil, Nil, Long.MinValue))
          val batch = it.toSeq
            .map(e => e.tsMillis -> scaledE4(e.value))
          val (stragglers, fresh) =
            batch.partition(_._1 <= prev.emittedThrough)
          val stragglerOut = stragglers.sortBy(identity).map {
            case (ts, v) =>
              val fr = (prev.tailTs.zip(prev.tailV) :+ ((ts, v)))
                .takeRight(nRows)
              TrailingAgg(key, ts, fr.length.toLong,
                fr.iterator.map(_._2).sum)
          }
          val pending = (prev.pendTs.zip(prev.pendV) ++ fresh)
            .sortBy(identity)
          val emitUpTo = st.getCurrentWatermarkMs() - 1
          val (release, keep) = pending.partition(_._1 <= emitUpTo)
          // walk releases in total order against the running tail of
          // the released prefix: frame = self + the nRows-1 before it
          var runTail = prev.tailTs.zip(prev.tailV)
          val releaseOut = release.map { case (ts, v) =>
            val fr = (runTail :+ ((ts, v))).takeRight(nRows)
            runTail = (runTail :+ ((ts, v))).takeRight(nRows - 1)
            TrailingAgg(key, ts, fr.length.toLong,
              fr.iterator.map(_._2).sum)
          }
          val emittedThrough = math.max(prev.emittedThrough, emitUpTo)
          st.update(RowsDelayBuf(runTail.map(_._1), runTail.map(_._2),
            keep.map(_._1), keep.map(_._2), emittedThrough))
          (stragglerOut ++ releaseOut).iterator
      }
  }

  /** [[weightedRowsWDelayed]] output: the fixed-point FIR value AT each
    * event (the weighted dot of the trailing rows frame). */
  case class FirAgg(key: Long, tsMillis: Long, firQ: Long)

  /** Q30 fixed-point truncated-EWMA weights — the batch window_ewma
    * coefficients a·(1−a)ʲ (a = 0.3, depth 20) quantized to
    * floor(c·2³⁰). ONE definition shared by the gate key
    * (stream_ewma_stateful), its DuckDB oracle literals, StreamProbe's
    * ewma_delayed arm, and StreamCorrectness's 10× hash gate — so the
    * quantization can never drift between evidence surfaces. */
  val EwmaQ30Weights: IndexedSeq[Long] =
    (0 until 20).map(j =>
      math.floor(0.3 * math.pow(0.7, j) * (1L << 30).toDouble).toLong)

  /** Streaming FIR filter under OUT-OF-ORDER arrival: each event emits
    * the weighted dot Σⱼ wⱼ·v(i−j) of its trailing |weights|-row frame
    * in the total (ts, scaledValue) order — weights(0) applies to the
    * event itself, rows before the stream start contribute 0. This is
    * the trailing-rows machinery of [[trailingRowsWDelayed]] with a
    * weighted emission, and it generalizes every finite impulse
    * response a feature pipeline wants on a stream: truncated EWMA
    * (geometric weights — the `stream_ewma_stateful` instantiation),
    * linear decay, Savitzky–Golay smoothing, difference filters.
    *
    * EXACTNESS CONTRACT: weights are FIXED-POINT LONGS (callers
    * quantize, e.g. floor(a·(1−a)ʲ·2³⁰)), values are the e4-scaled
    * longs of [[scaledE4]], and the dot is exact 64-bit arithmetic —
    * like every operator in this family the emitted stream has NO
    * float dimension, so the batch-oracle hash compare is exact under
    * any arrival order within the lateness. Bounds: |Σⱼ wⱼ·vⱼ| ≤
    * max|v|·Σ|w| — for Q30 EWMA weights (Σw < 2³⁰) and v4 ≤ 10⁹ the
    * dot stays ≤ ~10¹⁸, inside int64.
    *
    * State per key is O(|weights|) released-tail entries + the
    * lateness-bounded pending sliver — frame-SPAN-independent, the
    * rows-frame property. Releases ascend; stragglers beyond the
    * emission mark emit best-effort over the retained tail, like every
    * delayed operator here. */
  def weightedRowsWDelayed(events: Dataset[KeyedEvent],
      weights: Seq[Long], latenessMillis: Long): Dataset[FirAgg] = {
    require(weights.nonEmpty, "weights must be non-empty")
    require(latenessMillis >= 0, "latenessMillis must be >= 0")
    val ws = weights.toArray
    val depth = ws.length
    import events.sparkSession.implicits._
    // fr is ascending in the total order; fr(last) is the event itself
    def dotQ(fr: IndexedSeq[(Long, Long)]): Long = {
      var acc = 0L; var j = 0; val last = fr.length - 1
      while (j < depth) {
        if (last - j >= 0) acc += fr(last - j)._2 * ws(j)
        j += 1
      }
      acc
    }
    events
      .withColumn("eventTime", timestamp_millis(col("tsMillis")))
      .withWatermark("eventTime", s"$latenessMillis milliseconds")
      .as[KeyedEventT]
      .groupByKey(_.key)
      .flatMapGroupsWithState[RowsDelayBuf, FirAgg](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[KeyedEventT],
         st: GroupState[RowsDelayBuf]) =>
          val prev = st.getOption.getOrElse(
            RowsDelayBuf(Nil, Nil, Nil, Nil, Long.MinValue))
          val batch = it.toSeq
            .map(e => e.tsMillis -> scaledE4(e.value))
          val (stragglers, fresh) =
            batch.partition(_._1 <= prev.emittedThrough)
          val stragglerOut = stragglers.sortBy(identity).map {
            case (ts, v) =>
              val fr = (prev.tailTs.zip(prev.tailV) :+ ((ts, v)))
                .takeRight(depth).toIndexedSeq
              FirAgg(key, ts, dotQ(fr))
          }
          val pending = (prev.pendTs.zip(prev.pendV) ++ fresh)
            .sortBy(identity)
          val emitUpTo = st.getCurrentWatermarkMs() - 1
          val (release, keep) = pending.partition(_._1 <= emitUpTo)
          var runTail = prev.tailTs.zip(prev.tailV)
          val releaseOut = release.map { case (ts, v) =>
            val fr = (runTail :+ ((ts, v))).takeRight(depth).toIndexedSeq
            runTail = (runTail :+ ((ts, v))).takeRight(depth - 1)
            FirAgg(key, ts, dotQ(fr))
          }
          val emittedThrough = math.max(prev.emittedThrough, emitUpTo)
          st.update(RowsDelayBuf(runTail.map(_._1), runTail.map(_._2),
            keep.map(_._1), keep.map(_._2), emittedThrough))
          (stragglerOut ++ releaseOut).iterator
      }
  }

  // --- stateful sessionization (custom state via flatMapGroupsWithState) --

  /** Input event for sessionization: epoch-millis event time. */
  case class KeyedEvent(key: Long, tsMillis: Long, value: Double)

  /** A closed (or timed-out) session. */
  case class Session(key: Long, startMillis: Long, endMillis: Long,
      nEvents: Long, sumValue: Double)

  /** [[sessionizeDelayed]] output: exact-integer sum on the 1e-4 value
    * grid ([[scaledE4]]) — double addition is order-sensitive, and the
    * delayed sessionizer folds events in ARRIVAL order within a run, so
    * only the associative integer carrier makes the output a pure
    * function of the event SET (the hash-gate requirement). */
  case class SessionE4(key: Long, startMillis: Long, endMillis: Long,
      nEvents: Long, sumE4: Long)

  /** [[sessionizeDelayed]] per-key state: pending session RUNS (start-
    * sorted, pairwise separated by > gap) as parallel columns, plus the
    * event-time horizon already flushed. Runs are O(1) each — raw
    * events are never retained, because a new event can only MERGE
    * runs (start min / end max / additive n, sum), never split one. */
  case class SessDelayBuf(starts: Seq[Long], ends: Seq[Long],
      ns: Seq[Long], sums: Seq[Long], closedThrough: Long)

  /** [[sessionize]]'s WATERMARK-DETERMINISTIC sibling (r13 verdict
    * item 6): gap sessionization whose output is a pure function of
    * the event set whenever arrival disorder is bounded by the
    * lateness — the regime the 10× hash gate can check. The in-order
    * [[sessionize]] keeps an arrival-order-dependent beyond-lateness
    * policy by design (bounded state, no reopened sessions, late
    * buffers coalesce); this operator instead:
    *
    *   - declares an event-time WATERMARK (lateness); with the
    *     EventTimeTimeout below, the engine deterministically drops
    *     strictly-late rows (ts < watermark) before the stateful
    *     operator;
    *   - holds every session until the watermark STRICTLY passes
    *     `end + gap` — only then can no admitted future row (ts ≥
    *     watermark) extend or bridge it, so emission never depends on
    *     which batch a row arrived in;
    *   - registers an event-time TIMEOUT at `min(pending end) + gap
    *     + 1` so trailing sessions FLUSH ON WATERMARK ADVANCE alone —
    *     a key whose stream goes quiet still emits its final sessions
    *     once any later data anywhere moves the watermark past their
    *     release points (no per-key re-activation rows needed), and a
    *     key with nothing pending has its state REMOVED, so the store
    *     tracks active keys only (r14 advice item 1);
    *   - drops (counts, does not emit) any straggler at or below the
    *     flushed horizon `closedThrough = max(wm − gap − 1)` — a
    *     belt-and-braces twin of the engine filter: such a row could
    *     only belong to already-emitted event-time territory.
    *
    * Sessions are maintained as interval RUNS: each arriving event is
    * a singleton run; one sort + sweep per batch merges runs whose
    * gap is ≤ gapMillis (incremental connected components on the ts
    * line — order-independent by construction). State per key is
    * O(pending runs) = O((lateness + gap) × rate / gap), independent
    * of stream length, and zero once the key's horizon fully closes. */
  def sessionizeDelayed(events: Dataset[KeyedEvent], gapMillis: Long,
      latenessMillis: Long): Dataset[SessionE4] = {
    require(gapMillis >= 0 && latenessMillis >= 0,
      "gap and lateness must be >= 0")
    import events.sparkSession.implicits._
    events
      .withColumn("eventTime", timestamp_millis(col("tsMillis")))
      .withWatermark("eventTime", s"$latenessMillis milliseconds")
      .as[KeyedEventT]
      .groupByKey(_.key)
      .flatMapGroupsWithState[SessDelayBuf, SessionE4](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, it: Iterator[KeyedEventT],
         st: GroupState[SessDelayBuf]) =>
          val prev = st.getOption.getOrElse(
            SessDelayBuf(Nil, Nil, Nil, Nil, Long.MinValue))
          // the deterministic drop policy: at or below the flushed
          // horizon ⇒ already-emitted territory (the engine's own
          // late filter catches these first; on a timeout invocation
          // `it` is simply empty)
          val fresh = it.filter(_.tsMillis > prev.closedThrough)
          // singleton runs + pending runs, sort by start, sweep-merge
          val all = (prev.starts.indices.map(i => (prev.starts(i),
              prev.ends(i), prev.ns(i), prev.sums(i))) ++
            fresh.map(e => (e.tsMillis, e.tsMillis, 1L,
              scaledE4(e.value)))).sortBy(r => (r._1, r._2))
          val merged = scala.collection.mutable.ArrayBuffer
            .empty[(Long, Long, Long, Long)]
          all.foreach { r =>
            if (merged.nonEmpty && r._1 - merged.last._2 <= gapMillis) {
              val p = merged.remove(merged.length - 1)
              merged += ((p._1, math.max(p._2, r._2), p._3 + r._3,
                p._4 + r._4))
            } else merged += r
          }
          // close exactly the runs no admitted future row (ts ≥ wm)
          // can reach: end + gap < wm  ⇔  end ≤ wm − gap − 1
          val closeBound = st.getCurrentWatermarkMs() - gapMillis - 1
          val (closed, pending) = merged.partition(_._2 <= closeBound)
          if (pending.isEmpty) {
            // nothing to hold: clear the key from the store entirely.
            // The closedThrough horizon is subsumed by the engine's
            // late filter (any ts ≤ old wm − gap − 1 is < the current
            // watermark, so it never reaches this function again).
            st.remove()
          } else {
            val keepBound = math.max(prev.closedThrough, closeBound)
            st.update(SessDelayBuf(pending.map(_._1).toSeq,
              pending.map(_._2).toSeq, pending.map(_._3).toSeq,
              pending.map(_._4).toSeq, keepBound))
            // earliest release point among pending runs; provably >
            // current wm (pending ⇒ end > wm − gap − 1), so the
            // registration is always legal. The max(1, ·) clamp keeps
            // PRE-EPOCH event times (negative release points) legal
            // too — setTimeoutTimestamp requires a positive epoch; the
            // engine's watermark never goes below 0 either, so a
            // clamped timeout fires as soon as any watermark exists,
            // which is the earliest a pre-epoch session could close.
            st.setTimeoutTimestamp(
              math.max(1L, pending.map(_._2).min + gapMillis + 1))
          }
          closed.iterator.map(r =>
            SessionE4(key, r._1, r._2, r._3, r._4))
      }
  }

  /** Internal per-key state (public only because encoder codegen must
    * construct it from generated bytecode). */
  case class SessionState(start: Long, end: Long, n: Long, total: Double)

  /** Gap-based sessionization with explicit per-key state — the
    * `mapGroupsWithState`/`flatMapGroupsWithState` capability of the
    * brief. Events for a key belong to one session while consecutive
    * gaps stay ≤ gapMillis; a longer gap closes the session and emits
    * it. With `idleTimeout = Some(d)`, a processing-time timeout flushes
    * idle keys so state stays bounded without requiring a terminal event
    * (note: registered timeouts keep the micro-batch engine cycling, so
    * `processAllAvailable`-style draining never settles — production
    * queries run with a real trigger and don't care; tests use None).
    *
    * State per key is O(1) (4 numbers) — at 100 TB scale the state
    * store grows with |active keys|, not |events|; the shuffle is the
    * standard hash-partition on key that any stateful op pays.
    *
    * Works identically on batch Datasets (Spark runs the same operator
    * with NoTimeout semantics per group) — used by the spec for
    * deterministic assertions, mirroring the reference's df/lazy
    * single-code-path collapse. */
  def sessionize(events: Dataset[KeyedEvent], gapMillis: Long,
      idleTimeout: Option[String] = None): Dataset[Session] = {
    import events.sparkSession.implicits._
    val conf = idleTimeout.fold(GroupStateTimeout.NoTimeout)(_ =>
      GroupStateTimeout.ProcessingTimeTimeout)
    events.groupByKey(_.key)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, conf) {
        (key: Long, it: Iterator[KeyedEvent], st: GroupState[SessionState]) =>
          if (st.hasTimedOut) {
            val out = st.getOption.map(s =>
              Session(key, s.start, s.end, s.n, s.total))
            st.remove()
            out.iterator
          } else {
            val sorted = it.toSeq.sortBy(e => (e.tsMillis, e.value))
            val closed = scala.collection.mutable.ArrayBuffer.empty[Session]
            var cur = st.getOption
            // too-late events (older than start - gap) merge with EACH
            // OTHER by the same gap rule before closing — a reconnecting
            // device flushing a buffer of N adjacent late events yields
            // one session like the batch twin, not N singletons. They
            // still never merge with future batches (bounded-state
            // late-data policy: no reopened sessions).
            var late = Option.empty[SessionState]
            def flushLate(): Unit = late.foreach { ls =>
              closed += Session(key, ls.start, ls.end, ls.n, ls.total)
              late = None
            }
            sorted.foreach { e =>
              cur match {
                case Some(s) if e.tsMillis >= s.start - gapMillis &&
                    e.tsMillis - s.end <= gapMillis =>
                  // in or adjacent to the current session window (either
                  // side — cross-batch late events may precede `start`)
                  cur = Some(SessionState(s.start min e.tsMillis,
                    s.end max e.tsMillis, s.n + 1, s.total + e.value))
                case Some(s) if e.tsMillis > s.end =>
                  // gap after the session: close it, start a new one
                  closed += Session(key, s.start, s.end, s.n, s.total)
                  cur = Some(SessionState(e.tsMillis, e.tsMillis, 1, e.value))
                case Some(_) =>
                  // older than start - gap: belongs to an already-gone
                  // session (merging into the CURRENT session would
                  // corrupt its boundaries). Coalesce with the running
                  // late-session if within gap, else close that and open
                  // a new one — `sorted` is ascending so one pass works.
                  late match {
                    case Some(ls) if e.tsMillis - ls.end <= gapMillis =>
                      late = Some(SessionState(ls.start,
                        ls.end max e.tsMillis, ls.n + 1, ls.total + e.value))
                    case _ =>
                      flushLate()
                      late = Some(SessionState(e.tsMillis, e.tsMillis, 1,
                        e.value))
                  }
                case None =>
                  cur = Some(SessionState(e.tsMillis, e.tsMillis, 1, e.value))
              }
            }
            flushLate()
            cur.foreach { s =>
              st.update(s)
              idleTimeout.foreach(st.setTimeoutDuration)
            }
            closed.iterator
          }
      }
  }
}
