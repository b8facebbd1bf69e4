package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingOps
import graft.streaming.StreamingOps._

class StreamingSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  import spark.implicits._

  test("mutateStreamW: tumbling window aggs match the batch plan") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val df = ms.toDF.toDF("ts", "user_id", "value")

    val out = mutateStreamW(df, "ts", watermark = "10 seconds",
      windowLen = "1 minute", by = Seq(col("user_id")))(
      "sum_v" -> sum(col("value")), "n" -> count(lit(1)))

    val q = out.writeStream.format("memory").queryName("winagg")
      .outputMode("complete").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    ms.addData(
      (t("2026-01-01 00:00:10"), 1L, 1.0),
      (t("2026-01-01 00:00:50"), 1L, 2.0),
      (t("2026-01-01 00:01:10"), 1L, 4.0),
      (t("2026-01-01 00:00:20"), 2L, 8.0))
    q.processAllAvailable()
    val rows = spark.sql(
      "SELECT user_id, window.start, sum_v, n FROM winagg ORDER BY 1, 2")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getDouble(2), r.getLong(3)))
    q.stop()
    assert(rows.toSeq == Seq(
      (1L, "2026-01-01 00:00:00.0", 3.0, 2L),
      (1L, "2026-01-01 00:01:00.0", 4.0, 1L),
      (2L, "2026-01-01 00:00:00.0", 8.0, 1L)))
  }

  test("mutateStreamW: sliding windows overlap as specified") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val df = ms.toDF.toDF("ts", "user_id", "value")
    val out = mutateStreamW(df, "ts", watermark = "10 seconds",
      windowLen = "1 minute", slide = Some("30 seconds"))(
      "n" -> count(lit(1)))
    val q = out.writeStream.format("memory").queryName("slide")
      .outputMode("complete").start()
    ms.addData((java.sql.Timestamp.valueOf("2026-01-01 00:00:45"), 1L, 1.0))
    q.processAllAvailable()
    // one event at :45 falls in windows [00:00,01:00) and [00:30,01:30)
    val n = spark.sql("SELECT count(*) FROM slide").collect()(0).getLong(0)
    q.stop()
    assert(n == 2)
  }

  test("native session_window runs IDENTICALLY in streaming and batch") {
    // window_session_native's claim: the batch query pins the exact
    // semantics the streaming twin inherits. Run the SAME session_window
    // aggregation as a watermarked stream and as a batch frame over the
    // same rows — merged sessions, boundaries, and sums must be equal.
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val df = ms.toDF.toDF("ts", "user_id", "value")
    val out = df.withWatermark("ts", "10 seconds")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_v"))
      .select(col("user_id"), col("session_window.start").as("start"),
        col("n"), col("sum_v"))
    val q = out.writeStream.format("memory").queryName("sessnative")
      .outputMode("complete").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      (t("2026-01-01 00:00:00"), 1L, 1.0),
      (t("2026-01-01 00:29:59"), 1L, 2.0),  // 29:59 gap → same session
      (t("2026-01-01 00:59:59"), 1L, 4.0),  // EXACTLY prev+gap → MERGES
      (t("2026-01-01 01:30:00"), 1L, 8.0),  // 30:01 after prev → NEW
      (t("2026-01-01 00:00:00"), 2L, 16.0),
      // millisecond-resolution boundary pair (r15 ADVICE — pin the
      // inclusive-merge tie rule deterministically, not by fixture
      // luck): exactly prev+gap MERGES; ONE millisecond past it does
      // not. An engine-version change to the tie rule fails here
      // loudly instead of surfacing as a flaky 2M-event hash gate.
      (t("2026-01-01 00:30:00.000"), 2L, 32.0), // == prev+gap → MERGES
      (t("2026-01-01 01:00:00.001"), 2L, 64.0)) // gap+1ms → NEW
    val streamed = try {
      ms.addData(rows: _*)
      q.processAllAvailable()
      spark.sql(
          "SELECT user_id, start, n, sum_v FROM sessnative ORDER BY 1, 2")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
          r.getLong(2), r.getDouble(3))).toSeq
    } finally q.stop()
    val batch = rows.toDF("ts", "user_id", "value")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_v"))
      .select(col("user_id"), col("session_window.start").as("start"),
        col("n"), col("sum_v"))
      .orderBy(col("user_id"), col("start"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getLong(2), r.getDouble(3))).toSeq
    assert(streamed == batch)
    // boundary pin: the merge is gap-INCLUSIVE (an event at exactly
    // prev+gap joins the session) — the window_session_native oracle
    // breaks strictly on diff > gap for this reason
    assert(streamed == Seq(
      (1L, "2026-01-01 00:00:00.0", 3L, 7.0),
      (1L, "2026-01-01 01:30:00.0", 1L, 8.0),
      (2L, "2026-01-01 00:00:00.0", 2L, 48.0),
      (2L, "2026-01-01 01:00:00.001", 1L, 64.0)))
  }

  test("sessionize (streaming): a gap larger than gapMillis closes the session") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[KeyedEvent]
    val q = sessionize(ms.toDS(), gapMillis = 1000)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    ms.addData(KeyedEvent(1, 1000, 1.0), KeyedEvent(1, 1500, 2.0))
    q.processAllAvailable()
    assert(spark.sql("SELECT * FROM sessions").count() == 0) // still open
    ms.addData(KeyedEvent(1, 10000, 4.0)) // gap 8.5s > 1s → closes first
    q.processAllAvailable()
    val s = spark.sql(
      "SELECT key, startMillis, endMillis, nEvents, sumValue FROM sessions")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    q.stop()
    assert(s.toSeq == Seq((1L, 1000L, 1500L, 2L, 3.0)))
  }

  test("trailingW (streaming): per-row trailing frames emit immediately, " +
      "cross-batch buffer carries frame members") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[KeyedEvent]
    val q = StreamingOps.trailingW(ms.toDS(), beforeMillis = 1000)
      .writeStream.format("memory").queryName("trailing")
      .outputMode("append").start()
    // batch 1: two events 400ms apart — second frame holds both
    ms.addData(KeyedEvent(1, 1000, 1.0), KeyedEvent(1, 1400, 2.0))
    q.processAllAvailable()
    // batch 2: 1900 is within 1000ms of both prior events (cross-batch
    // buffer); 3000 is within nothing but itself
    ms.addData(KeyedEvent(1, 1900, 4.0), KeyedEvent(1, 3000, 8.0))
    q.processAllAvailable()
    val rows = spark.sql(
      "SELECT tsMillis, winN, winSumE4 FROM trailing ORDER BY tsMillis")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    q.stop()
    assert(rows.toSeq == Seq(
      (1000L, 1L, 10000L),          // just itself
      (1400L, 2L, 30000L),          // 1.0 + 2.0
      (1900L, 3L, 70000L),          // all three within 1s
      (3000L, 1L, 80000L)))         // alone again
  }

  test("runningWDelayed (streaming): out-of-order arrivals release in ts " +
      "order with exact cumulative sums once the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[KeyedEvent]
    val q = StreamingOps.runningWDelayed(ms.toDS(), latenessMillis = 1000)
      .writeStream.format("memory").queryName("running_ooo")
      .outputMode("append").start()
    def rows() = spark.sql(
      "SELECT tsMillis, cumN, cumSumE4 FROM running_ooo ORDER BY tsMillis")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // batch 1 arrives OUT of ts order; watermark still MinValue → no emit
    ms.addData(KeyedEvent(1, 2000, 2.0), KeyedEvent(1, 1000, 1.0))
    q.processAllAvailable()
    assert(rows().isEmpty)
    // batch 2: wm advances to 2000-1000=1000, but release requires the
    // watermark to STRICTLY pass the ts (emitUpTo = wm-1 = 999), so
    // ts=1000 is still pending — nothing emits yet
    ms.addData(KeyedEvent(1, 4000, 4.0))
    q.processAllAvailable()
    assert(rows().isEmpty)
    // batch 3: wm=3000 releases ts=1000 AND ts=2000 together, the
    // latter with the cumulative THROUGH it (1.0+2.0), proving the
    // pending buffer preserved ts order
    ms.addData(KeyedEvent(1, 9000, 8.0))
    q.processAllAvailable()
    assert(rows() == Seq((1000L, 1L, 10000L), (2000L, 2L, 30000L)))
    q.stop()
  }

  test("trailingRowsWDelayed (streaming): out-of-order rows release in " +
      "total (ts, value) order with exact N-rows frames") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[KeyedEvent]
    val q = StreamingOps.trailingRowsWDelayed(ms.toDS(), nRows = 2,
        latenessMillis = 1000)
      .writeStream.format("memory").queryName("rows_ooo")
      .outputMode("append").start()
    def rows() = spark.sql(
      "SELECT tsMillis, winN, winSumE4 FROM rows_ooo ORDER BY tsMillis")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // batch 1 out of ts order; wm still 0 → nothing releases
    ms.addData(KeyedEvent(1, 3000, 4.0), KeyedEvent(1, 1000, 1.0))
    q.processAllAvailable()
    assert(rows().isEmpty)
    // batch 2: a row BETWEEN the two earlier ones (disorder); wm=2000
    // releases ts=1000 only
    ms.addData(KeyedEvent(1, 2000, 2.0), KeyedEvent(1, 9000, 8.0))
    q.processAllAvailable()
    assert(rows() == Seq((1000L, 1L, 10000L)))
    // batch 3: wm=8000 releases 2000 (frame = {1000, 2000}) and 3000
    // (frame = {2000, 3000}) — the disordered middle row slotted into
    // its total-order position before the later row's frame was cut
    ms.addData(KeyedEvent(1, 20000, 16.0))
    q.processAllAvailable()
    assert(rows() == Seq((1000L, 1L, 10000L),
      (2000L, 2L, 30000L), (3000L, 2L, 60000L)))
    q.stop()
  }

  test("trailingRowsW (streaming): trailing N-rows frames ramp up and the " +
      "cross-batch buffer keeps exactly nRows-1 entries") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[KeyedEvent]
    val q = StreamingOps.trailingRowsW(ms.toDS(), nRows = 3)
      .writeStream.format("memory").queryName("trailing_rows")
      .outputMode("append").start()
    // batch 1: ramp-up — frames of 1 then 2 rows
    ms.addData(KeyedEvent(1, 1000, 1.0), KeyedEvent(1, 2000, 2.0))
    q.processAllAvailable()
    // batch 2: full 3-row frames sliding over the cross-batch buffer;
    // the time GAP is irrelevant (rows frame, not a time frame)
    ms.addData(KeyedEvent(1, 90000, 4.0), KeyedEvent(1, 91000, 8.0))
    q.processAllAvailable()
    val rows = spark.sql(
      "SELECT tsMillis, winN, winSumE4 FROM trailing_rows ORDER BY tsMillis")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    q.stop()
    assert(rows.toSeq == Seq(
      (1000L, 1L, 10000L),           // just itself
      (2000L, 2L, 30000L),           // 1.0 + 2.0
      (90000L, 3L, 70000L),          // 1.0 + 2.0 + 4.0 (gap ignored)
      (91000L, 3L, 140000L)))        // 2.0 + 4.0 + 8.0 (1.0 slid out)
  }

  test("trailingWDelayed (streaming): out-of-order arrivals emit exactly " +
      "when the watermark passes, matching batch range-frame values") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[KeyedEvent]
    val q = StreamingOps.trailingWDelayed(ms.toDS(), beforeMillis = 1000,
        latenessMillis = 1000)
      .writeStream.format("memory").queryName("trailing_ooo")
      .outputMode("append").start()
    def rows() = spark.sql(
      "SELECT tsMillis, winN, winSumE4 FROM trailing_ooo ORDER BY tsMillis")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // batch 1: out of order within the batch; wm 0 → nothing emits
    ms.addData(KeyedEvent(1, 5000, 1.0), KeyedEvent(1, 3000, 2.0))
    q.processAllAvailable()
    assert(rows().isEmpty, "emitted before the watermark passed")
    // batch 2: 4200 arrives AFTER 5000 (cross-batch disorder, inside
    // lateness); wm is now 4000 → only ts 3000 emits
    ms.addData(KeyedEvent(1, 4200, 4.0), KeyedEvent(1, 9000, 8.0))
    q.processAllAvailable()
    assert(rows() == Seq((3000L, 1L, 20000L)))
    // batch 3: wm 8000 → 4200 and 5000 emit; 5000's frame INCLUDES the
    // late-arrived 4200 — the exactness the delay buys
    ms.addData(KeyedEvent(1, 9500, 16.0))
    q.processAllAvailable()
    assert(rows() == Seq((3000L, 1L, 20000L), (4200L, 1L, 40000L),
      (5000L, 2L, 50000L)))
    // two sentinel batches push wm past every real row (the staged
    // fixture's flush pattern); the sentinels themselves never emit
    ms.addData(KeyedEvent(1, 12000, 0.0))
    q.processAllAvailable()
    ms.addData(KeyedEvent(1, 13000, 0.0))
    q.processAllAvailable()
    q.stop()
    assert(rows() == Seq((3000L, 1L, 20000L), (4200L, 1L, 40000L),
      (5000L, 2L, 50000L), (9000L, 1L, 80000L), (9500L, 2L, 240000L)))
  }

  test("trailingWDelayed: randomized batching-invariance — jitter-shuffled " +
      "arrivals under random batch splits emit the exact batch-computed " +
      "range-frame multiset") {
    // The claim every staged _ooo fixture rests on, pinned with
    // randomness instead of a hand fixture: for ANY bounded-disorder
    // arrival order and ANY batch split, the emitted (key, ts, n, sum)
    // set equals the batch range-frame computation. Disorder is kept
    // under lateness (jitter < 1000ms) so nothing is droppable; values
    // are integers so the 1e4 scaling is exact.
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(97)
    val lateness = 1000L
    for (trial <- 0 until 3) {
      val events = for {
        k <- 1L to 2L
        i <- 0 until 25
      } yield StreamingOps.KeyedEvent(k, 1000L + i * 250 + (k - 1) * 125,
        rnd.nextInt(11).toDouble)
      val maxTs = events.map(_.tsMillis).max
      val expect = events.map { e =>
        val fr = events.filter(o => o.key == e.key &&
          o.tsMillis >= e.tsMillis - 1000 && o.tsMillis <= e.tsMillis)
        (e.key, e.tsMillis, fr.size.toLong,
          fr.map(o => (o.value * 10000).toLong).sum)
      }.toSet
      // bounded-disorder arrival: stable sort on a PRECOMPUTED jittered
      // key (sortBy with a randomized key function would violate the
      // comparator contract)
      val arrival = events
        .map(e => (e, e.tsMillis + rnd.nextInt(750))).sortBy(_._2).map(_._1)
      val ms = MemoryStream[StreamingOps.KeyedEvent]
      val qn = s"trail_inv_$trial"
      val q = StreamingOps.trailingWDelayed(ms.toDS(), beforeMillis = 1000,
          latenessMillis = lateness)
        .writeStream.format("memory").queryName(qn)
        .outputMode("append").start()
      var rest = arrival
      while (rest.nonEmpty) {
        val (b, r) = rest.splitAt(1 + rnd.nextInt(7))
        rest = r
        ms.addData(b: _*)
        q.processAllAvailable()
      }
      // two per-key sentinel batches (NoTimeout: a key only flushes when
      // it sees data; wm in effect during the second batch is
      // s1.ts - lateness = maxTs + 500 > maxTs, releasing every real row
      // while both sentinels stay pending)
      ms.addData((1L to 2L).map(k =>
        StreamingOps.KeyedEvent(k, maxTs + 1500, 0.0)): _*)
      q.processAllAvailable()
      ms.addData((1L to 2L).map(k =>
        StreamingOps.KeyedEvent(k, maxTs + 1500 + lateness, 0.0)): _*)
      q.processAllAvailable()
      q.stop()
      val got = spark.sql(s"SELECT key, tsMillis, winN, winSumE4 FROM $qn")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got.filter(_._2 <= maxTs) == expect, s"trial $trial mismatch")
      assert(got.forall(t => t._2 <= maxTs || t._2 >= maxTs + 1500),
        s"trial $trial: unexpected emission between real tail and sentinels")
    }
  }

  test("runningW (streaming): O(1)-state cumulative aggregate, ties share " +
      "the value, accumulator carries across batches") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[KeyedEvent]
    val q = StreamingOps.runningW(ms.toDS())
      .writeStream.format("memory").queryName("running")
      .outputMode("append").start()
    ms.addData(KeyedEvent(1, 100, 1.0), KeyedEvent(1, 100, 2.0),
      KeyedEvent(1, 200, 4.0))
    q.processAllAvailable()
    ms.addData(KeyedEvent(1, 300, 8.0)) // cross-batch accumulation
    q.processAllAvailable()
    val rows = spark.sql(
      "SELECT tsMillis, cumN, cumSumE4 FROM running ORDER BY tsMillis, cumN")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    q.stop()
    assert(rows.toSeq == Seq(
      (100L, 2L, 30000L), (100L, 2L, 30000L), // range peers: same value
      (200L, 3L, 70000L),
      (300L, 4L, 150000L)))
  }

  test("trailingWDelayed with afterMillis: positive time lookahead frames " +
      "release when the watermark passes t + after") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[KeyedEvent]
    val q = StreamingOps.trailingWDelayed(ms.toDS(), beforeMillis = 1000,
        latenessMillis = 1000, afterMillis = 500)
      .writeStream.format("memory").queryName("lookahead")
      .outputMode("append").start()
    def rows() = spark.sql(
      "SELECT tsMillis, winN, winSumE4 FROM lookahead ORDER BY tsMillis")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    ms.addData(KeyedEvent(1, 1000, 1.0), KeyedEvent(1, 1400, 2.0))
    q.processAllAvailable()
    ms.addData(KeyedEvent(1, 3000, 4.0))
    q.processAllAvailable()
    // wm is 400: no frame [t-1000, t+500] is closed yet
    assert(rows().isEmpty)
    ms.addData(KeyedEvent(1, 5000, 8.0))
    q.processAllAvailable()
    // wm 2000 closes t=1000 and t=1400; each row's FUTURE member 1400
    // (resp. past 1000) is inside its frame
    assert(rows() == Seq((1000L, 2L, 30000L), (1400L, 2L, 30000L)))
    ms.addData(KeyedEvent(1, 8000, 16.0))
    q.processAllAvailable()
    ms.addData(KeyedEvent(1, 9000, 0.0))
    q.processAllAvailable()
    q.stop()
    // wm 7000 released t=5000 (frame [4000,5500]: alone); t=3000
    // released at wm 4000 (frame [2000,3500]: alone)
    assert(rows() == Seq((1000L, 2L, 30000L), (1400L, 2L, 30000L),
      (3000L, 1L, 40000L), (5000L, 1L, 80000L)))
  }

  test("trailingW: ties share the frame (range-frame peers); batch " +
      "Dataset path agrees with a window-SQL twin") {
    import spark.implicits._
    val ev = Seq(KeyedEvent(1, 100, 1.0), KeyedEvent(1, 100, 2.0),
      KeyedEvent(1, 150, 4.0), KeyedEvent(2, 100, 8.0)).toDS()
    val got = StreamingOps.trailingW(ev, beforeMillis = 60)
      .collect().map(t => (t.key, t.tsMillis, t.winN, t.winSumE4)).toSeq
      .sorted
    // ties at (1, 100): both rows see BOTH tied values (peers)
    assert(got == Seq(
      (1L, 100L, 2L, 30000L), (1L, 100L, 2L, 30000L),
      (1L, 150L, 3L, 70000L), (2L, 100L, 1L, 80000L)))
  }

  test("dedupStream: duplicates within the watermark emit once") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val df = ms.toDF.toDF("ts", "event_id", "value")
    val q = dedupStream(df, "ts", "10 seconds", Seq("event_id"))
      .writeStream.format("memory").queryName("dedupstream")
      .outputMode("append").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    ms.addData(
      (t("2026-01-01 00:00:01"), 1L, 1.0),
      (t("2026-01-01 00:00:02"), 1L, 1.0), // dup within watermark
      (t("2026-01-01 00:00:03"), 2L, 2.0))
    q.processAllAvailable()
    ms.addData((t("2026-01-01 00:00:04"), 2L, 2.0)) // dup, second batch
    q.processAllAvailable()
    val ids = spark.sql("SELECT event_id FROM dedupstream")
      .collect().map(_.getLong(0)).toSeq.sorted
    q.stop()
    assert(ids == Seq(1L, 2L))
  }

  test("stream-static join: streaming events enrich against a static dim") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val ms = MemoryStream[(Long, Double)]
    val joined = ms.toDF.toDF("user_id", "value")
      .join(org.apache.spark.sql.functions.broadcast(dim), Seq("user_id"), "left")
    val q = joined.writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    ms.addData((1L, 1.0), (2L, 2.0), (3L, 4.0))
    q.processAllAvailable()
    val rows = spark.sql("SELECT user_id, tier FROM enriched ORDER BY user_id")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toSeq
    q.stop()
    assert(rows == Seq(1L -> Some("gold"), 2L -> Some("basic"), 3L -> None))
  }

  test("sessionize: cross-batch late events don't corrupt session boundaries") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[KeyedEvent]
    val q = sessionize(ms.toDS(), gapMillis = 1000)
      .writeStream.format("memory").queryName("late_sessions")
      .outputMode("append").start()
    ms.addData(KeyedEvent(1, 10000, 1.0))
    q.processAllAvailable()
    // 8s older than the open session start − gap: must NOT merge into it
    ms.addData(KeyedEvent(1, 2000, 2.0))
    q.processAllAvailable()
    // close the open session with a far-future event
    ms.addData(KeyedEvent(1, 50000, 4.0))
    q.processAllAvailable()
    val s = spark.sql(
      "SELECT startMillis, endMillis, nEvents, sumValue FROM late_sessions")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    q.stop()
    assert(s == Set(
      (2000L, 2000L, 1L, 2.0),    // late singleton, emitted immediately
      (10000L, 10000L, 1L, 1.0))) // original session, boundaries intact
  }

  test("sessionize: a burst of adjacent late events coalesces into one session") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[KeyedEvent]
    val q = sessionize(ms.toDS(), gapMillis = 1000)
      .writeStream.format("memory").queryName("late_burst")
      .outputMode("append").start()
    ms.addData(KeyedEvent(1, 20000, 1.0))
    q.processAllAvailable()
    // a reconnecting client flushes a buffer: three mutually-adjacent
    // late events (≤ gap apart) plus one isolated late event
    ms.addData(KeyedEvent(1, 2000, 1.0), KeyedEvent(1, 2500, 2.0),
      KeyedEvent(1, 2900, 4.0), KeyedEvent(1, 8000, 8.0))
    q.processAllAvailable()
    val s = spark.sql(
      "SELECT startMillis, endMillis, nEvents, sumValue FROM late_burst")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    q.stop()
    assert(s == Set(
      (2000L, 2900L, 3L, 7.0),  // burst merged like the batch twin would
      (8000L, 8000L, 1L, 8.0))) // isolated late event stays a singleton
  }

  test("sessionize (batch): same operator, deterministic closed sessions") {
    val events = Seq(
      KeyedEvent(1, 1000, 1.0), KeyedEvent(1, 1800, 2.0),
      KeyedEvent(1, 5000, 4.0), KeyedEvent(1, 9000, 8.0),
      KeyedEvent(2, 100, 16.0), KeyedEvent(2, 5000, 32.0)).toDS()
    val closed = sessionize(events, gapMillis = 1000).collect()
      .map(s => (s.key, s.startMillis, s.endMillis, s.nEvents, s.sumValue))
      .toSet
    // per key the LAST session stays open (held in state) — batch emits
    // only sessions closed by a later event
    assert(closed == Set(
      (1L, 1000L, 1800L, 2L, 3.0),
      (1L, 5000L, 5000L, 1L, 4.0),
      (2L, 100L, 100L, 1L, 16.0)))
  }

  test("scaledE4 IS the oracle's floor(v*10000 + 0.5) — exact negative " +
      "ties included, and the Math.round near-tie special case excluded") {
    // the DuckDB side, spelled as the same IEEE op sequence
    def oracle(v: Double): Long = math.floor(v * 10000d + 0.5d).toLong
    // -2.00005 * 10000 is EXACTLY -20000.5 in double (the product's
    // rounding lands on the tie): floor(-20000.5 + 0.5) = -20000 —
    // half-UP, where DuckDB round() would answer half-away (-20001);
    // the oracles use the floor form precisely so both engines agree
    assert((-2.00005 * 10000d) == -20000.5d)
    assert(StreamingOps.scaledE4(-2.00005) == -20000L)
    assert((-4.99995 * 10000d) == -49999.5d)
    assert(StreamingOps.scaledE4(-4.99995) == -49999L)
    // positive tie: 2.00005 * 10000 == 20000.5 exactly; floor = 20001
    assert(StreamingOps.scaledE4(2.00005) == 20001L)
    // Math.round's special case: for the largest double BELOW a tie the
    // JDK answers "closest long" while the floor form lets `+ 0.5`'s own
    // IEEE rounding carry the sum over the tie — they genuinely differ
    val nearTie = math.nextDown(0.5) // 0.49999999999999994
    assert(math.round(nearTie) == 0L && math.floor(nearTie + 0.5).toLong == 1L)
    // exhaustive agreement with the oracle form on the fixture grid,
    // ties, near-ties, negatives, and adversarial magnitudes
    val probes = Seq(-2.00005, 2.00005, -4.99995, 4.99995, -0.00005,
      0.00005, -0.00015, 0.00015, -123.45675, 123.45675,
      nearTie / 10000d, -nearTie / 10000d,
      0.0, -0.0, 1e-12, -1e-12, 987654.32105, -987654.32105)
    probes.foreach { v =>
      assert(StreamingOps.scaledE4(v) == oracle(v), s"diverged at $v")
    }
    // end-to-end: a negative tie value flowing through a stateful op
    // lands on the oracle grid (winSumE4 uses the shared helper)
    val ev = Seq(KeyedEvent(1, 100, -4.99995), KeyedEvent(1, 150, -2.00005))
      .toDS()
    val got = StreamingOps.trailingW(ev, beforeMillis = 60)
      .collect().map(t => (t.tsMillis, t.winSumE4)).toSeq.sorted
    assert(got == Seq(
      (100L, -49999L),
      (150L, -49999L + -20000L)))
  }

  test("asofJoinWDelayed: quoteless lefts emit None; quote-only streams " +
      "emit nothing; a late-but-in-lateness quote wins its left") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingOps.TaggedEvent
    def run(batches: Seq[Seq[TaggedEvent]]): Seq[(Long, Long, Option[Long])] = {
      val ms = MemoryStream[TaggedEvent]
      val qn = s"asof_edge_${System.nanoTime()}"
      val q = StreamingOps.asofJoinWDelayed(ms.toDS(), latenessMillis = 1000)
        .writeStream.format("memory").queryName(qn)
        .outputMode("append").start()
      try {
        batches.foreach { b => ms.addData(b); q.processAllAvailable() }
        spark.table(qn).collect().map(r => (r.getLong(0), r.getLong(1),
          Option(r.get(3)).map(_.asInstanceOf[Long]))).toSeq.sortBy(x => (x._1, x._2))
      } finally { q.stop(); spark.catalog.dropTempView(qn) }
    }
    val flushA = Seq(TaggedEvent(1, 99000, 0.0, true))
    val flushB = Seq(TaggedEvent(1, 100000, 0.0, true))
    // no quotes at all: every released left emits quoteE4 = None
    assert(run(Seq(Seq(TaggedEvent(1, 1000, 1.0, false),
        TaggedEvent(1, 2000, 2.0, false)), flushA, flushB)) ==
      Seq((1L, 1000L, None), (1L, 2000L, None)))
    // quote-only stream: quotes never emit rows
    assert(run(Seq(Seq(TaggedEvent(1, 1000, 5.0, true)), flushA, flushB))
      .isEmpty)
    // OOO: the quote ARRIVES after the left it must win (same batch
    // window via lateness), and the left's emission still carries it
    assert(run(Seq(Seq(TaggedEvent(1, 3000, 7.0, false)),
        Seq(TaggedEvent(1, 2500, 4.0, true)), flushA, flushB)) ==
      Seq((1L, 3000L, Some(40000L))))
  }

  test("cusumWDelayed: all-negative drifts pin cusum at 0; a positive " +
      "burst raises and the max(0,·) floor resets") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingOps.KeyedEvent
    val ms = MemoryStream[KeyedEvent]
    val qn = "cusum_edge"
    // allowance 2.0 (E4 20000), threshold 5.0 (E4 50000)
    val q = StreamingOps.cusumWDelayed(ms.toDS(), allowanceE4 = 20000L,
        thresholdE4 = 50000L, latenessMillis = 1000)
      .writeStream.format("memory").queryName(qn)
      .outputMode("append").start()
    // values: 1, 1 (below allowance → cusum 0), 10 (burst → +8),
    // 1 (decay → 7), 30 (→ 35 > threshold)
    ms.addData(KeyedEvent(1, 1000, 1.0), KeyedEvent(1, 2000, 1.0),
      KeyedEvent(1, 3000, 10.0), KeyedEvent(1, 4000, 1.0),
      KeyedEvent(1, 5000, 30.0))
    q.processAllAvailable()
    ms.addData(KeyedEvent(1, 99000, 0.0)); q.processAllAvailable()
    ms.addData(KeyedEvent(1, 100000, 0.0)); q.processAllAvailable()
    val got = spark.table(qn).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSeq.sortBy(_._1)
    q.stop(); spark.catalog.dropTempView(qn)
    assert(got == Seq(
      (1000L, 0L, false), (2000L, 0L, false),
      (3000L, 80000L, true), (4000L, 70000L, true),
      (5000L, 350000L, true)))
  }

  test("topkWDelayed: OOO cross-batch bag merge, tie-break on value, " +
      "windows close only past the watermark") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingOps.KeyedEvent
    val ms = MemoryStream[KeyedEvent]
    val qn = "topk_edge"
    // W = 10 s windows, k = 2, lateness 5 s
    val q = StreamingOps.topkWDelayed(ms.toDS(), windowMillis = 10000L,
        k = 2, latenessMillis = 5000L)
      .writeStream.format("memory").queryName(qn)
      .outputMode("append").start()
    // window [0,10s): value 2.0 ×2, 1.0 ×2 (TIE on cnt → 1.0 ranks
    // first on value asc), 3.0 ×1 (excluded by k=2); arrivals split
    // across batches and out of ts order
    ms.addData(KeyedEvent(1, 9000, 2.0), KeyedEvent(1, 1000, 1.0))
    q.processAllAvailable()
    ms.addData(KeyedEvent(1, 3000, 2.0), KeyedEvent(1, 2000, 1.0),
      KeyedEvent(1, 5000, 3.0))
    q.processAllAvailable()
    // nothing can have emitted yet: wm ≈ 9000 − 5000 < window end
    assert(spark.table(qn).count() == 0)
    // advance the watermark past the window end (wm = 30000 − 5000)
    ms.addData(KeyedEvent(1, 30000, 0.0)); q.processAllAvailable()
    ms.addData(KeyedEvent(1, 31000, 0.0)); q.processAllAvailable()
    val got = spark.table(qn).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq.sorted
    q.stop(); spark.catalog.dropTempView(qn)
    // (winStart, rank, valueE4, cnt): the cnt tie (2 vs 2) breaks on
    // value asc — 1.0 at rank 1, 2.0 at rank 2; 3.0 (cnt 1) is cut
    assert(got == Seq((0L, 1L, 10000L, 2L), (0L, 2L, 20000L, 2L)))
  }

  test("quantileWDelayed: integer ceil-rank edges — n=1, even-n lower " +
      "median, duplicate-heavy bag, OOO cross-batch merge") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingOps.KeyedEvent
    val ms = MemoryStream[KeyedEvent]
    val qn = "quant_edge"
    val q = StreamingOps.quantileWDelayed(ms.toDS(), windowMillis = 10000L,
        latenessMillis = 5000L)
      .writeStream.format("memory").queryName(qn)
      .outputMode("append").start()
    // key 1, window [0,10s): values 4,1,3,2 (n=4, even → p50 = rank
    // ceil(5/2)=2 → 2.0; p95 = rank ceil(95·4/100)=4 → 4.0), arrivals
    // shuffled across two batches
    ms.addData(KeyedEvent(1, 9000, 4.0), KeyedEvent(1, 1000, 1.0))
    q.processAllAvailable()
    ms.addData(KeyedEvent(1, 3000, 3.0), KeyedEvent(1, 2000, 2.0),
      // key 2 same window: single element (n=1 → both ranks hit it);
      // key 3: duplicate-heavy bag 7×5.0 + 1×9.0 (n=8 → p50 rank 4 in
      // the 5.0 run; p95 rank ceil(7.6)=8 → 9.0)
      KeyedEvent(2, 4000, -1.5))
    q.processAllAvailable()
    ms.addData((1 to 7).map(i => KeyedEvent(3, 1000L * i, 5.0)) :+
      KeyedEvent(3, 8000, 9.0))
    q.processAllAvailable()
    assert(spark.table(qn).count() == 0) // wm still below window end
    ms.addData(KeyedEvent(1, 30000, 0.0), KeyedEvent(2, 30000, 0.0),
      KeyedEvent(3, 30000, 0.0))
    q.processAllAvailable()
    // second sentinel batch must carry EVERY key: the state fn only
    // runs for keys present in a batch, and the watermark advanced by
    // batch N is only visible in batch N+1
    ms.addData(KeyedEvent(1, 31000, 0.0), KeyedEvent(2, 31000, 0.0),
      KeyedEvent(3, 31000, 0.0))
    q.processAllAvailable()
    val got = spark.table(qn).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSeq.sorted
    q.stop(); spark.catalog.dropTempView(qn)
    assert(got == Seq(
      (1L, 0L, 4L, 20000L, 40000L),
      (2L, 0L, 1L, -15000L, -15000L),
      (3L, 0L, 8L, 50000L, 90000L)))
  }

  test("sessionizeDelayed: OOO arrival lands on the batch gap sweep; " +
      "sessions hold until the watermark strictly passes end + gap; " +
      "strictly-late stragglers are dropped deterministically") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[KeyedEvent]
    val gap = 150L; val late = 10000L
    val out = StreamingOps.sessionizeDelayed(ms.toDS(), gap, late)
    val qn = "sessdel_spec"
    val q = out.toDF().writeStream.format("memory").queryName(qn)
      .outputMode("append").start()
    // two runs forming out of order: [1000,1120] and [1400,1500]
    ms.addData(KeyedEvent(1, 1000, 1.0), KeyedEvent(1, 1100, 2.0),
      KeyedEvent(1, 1400, 4.0))
    q.processAllAvailable()
    ms.addData(KeyedEvent(1, 1120, 8.0), KeyedEvent(1, 1500, 16.0))
    q.processAllAvailable()
    // nothing can emit yet: wm is still below end + gap for both runs
    assert(spark.table(qn).count() == 0,
      "sessions must hold until the watermark passes end + gap")
    // sentinel pair: batch N lifts the watermark, batch N+1 (carrying
    // the key) evaluates under it — both runs close, sentinels pend
    ms.addData(KeyedEvent(1, 20000, 0.0))
    q.processAllAvailable()
    ms.addData(KeyedEvent(1, 21000, 0.0))
    q.processAllAvailable()
    def rows() = spark.table(qn).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq.sorted
    assert(rows() == Seq(
      (1L, 1000L, 1120L, 3L, 110000L),  // 1.0 + 2.0 + 8.0 on the e4 grid
      (1L, 1400L, 1500L, 2L, 200000L))) // 4.0 + 16.0
    // straggler at or below the flushed horizon: dropped (the engine's
    // late filter catches it first — ts < wm — and the operator's
    // closedThrough policy is the deterministic second line); the
    // emitted set must not change and no session reopens
    ms.addData(KeyedEvent(1, 500, 99.0))
    q.processAllAvailable()
    ms.addData(KeyedEvent(1, 21500, 0.0))
    q.processAllAvailable()
    assert(rows() == Seq(
      (1L, 1000L, 1120L, 3L, 110000L),
      (1L, 1400L, 1500L, 2L, 200000L)),
      "a strictly-late straggler must not reopen or re-emit sessions")
    q.stop(); spark.catalog.dropTempView(qn)
  }

  test("sessionizeDelayed: trailing sessions flush on WATERMARK ADVANCE " +
      "alone (EventTimeTimeout) — no per-key re-activation row needed") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[KeyedEvent]
    val out = StreamingOps.sessionizeDelayed(ms.toDS(), gapMillis = 150L,
      latenessMillis = 10000L)
    val qn = "sessdel_timeout_spec"
    val q = out.toDF().writeStream.format("memory").queryName(qn)
      .outputMode("append").start()
    // key 1's only events, then key 1 goes SILENT forever
    ms.addData(KeyedEvent(1, 1000, 1.0), KeyedEvent(1, 1100, 2.0))
    q.processAllAvailable()
    assert(spark.table(qn).count() == 0)
    // a single row on a DIFFERENT key lifts the watermark to 10000;
    // the registered event-time timeout (end 1100 + gap + 1 = 1251)
    // fires in the ensuing no-data batch and key 1's session emits —
    // the r14-advice contract: emission is a function of the event
    // set + watermark, not of later per-key activity
    ms.addData(KeyedEvent(42, 20000, 0.0))
    q.processAllAvailable()
    val got = spark.table(qn).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq.sorted
    q.stop(); spark.catalog.dropTempView(qn)
    assert(got == Seq((1L, 1000L, 1100L, 2L, 30000L)),
      s"trailing session must flush via timeout, got $got")
  }

  test("sessionizeDelayed: a bridging event MERGES two pending runs " +
      "into one session (incremental connected components)") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[KeyedEvent]
    val out = StreamingOps.sessionizeDelayed(ms.toDS(), gapMillis = 150L,
      latenessMillis = 10000L)
    val qn = "sessdel_bridge_spec"
    val q = out.toDF().writeStream.format("memory").queryName(qn)
      .outputMode("append").start()
    // runs [1000,1050] and [1300,1350] (gap 250 > 150), then 1180
    // arrives late and bridges BOTH (1180-1050=130, 1300-1180=120)
    ms.addData(KeyedEvent(7, 1000, 1.0), KeyedEvent(7, 1050, 1.0),
      KeyedEvent(7, 1300, 1.0), KeyedEvent(7, 1350, 1.0))
    q.processAllAvailable()
    ms.addData(KeyedEvent(7, 1180, 1.0))
    q.processAllAvailable()
    ms.addData(KeyedEvent(7, 20000, 0.0))
    q.processAllAvailable()
    ms.addData(KeyedEvent(7, 21000, 0.0))
    q.processAllAvailable()
    val got = spark.table(qn).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    q.stop(); spark.catalog.dropTempView(qn)
    assert(got == Seq((7L, 1000L, 1350L, 5L, 50000L)))
  }
}
