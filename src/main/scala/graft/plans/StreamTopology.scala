package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming TOPOLOGY fingerprints (round-14, r13 verdict item 3): the
  * streaming inventory keys (24 as of round 14) were the only slice
  * outside PLAN_FINGERPRINTS — a refactor that silently doubled a stateful
  * op's state stores, or turned a stateless broadcast enrichment into
  * a stateful join, would have passed every correctness gate. This
  * captures, per key, the micro-batch execution's skeleton from the
  * ENGINE's own progress events (`StreamingQueryProgress`):
  *
  *   - how many streaming queries the key runs;
  *   - each query's state operators — `operatorName` with the maximum
  *     per-batch instance count (the honest "how many state stores
  *     per partition" signal: `symmetricHashJoin` keeps four stores,
  *     `dedupeWithinWatermark` one, a stateless stream-static join
  *     none) and the state-store shuffle partition count (the
  *     per-stream sizing knob `withStreamParts` scopes);
  *   - the sink class.
  *
  * The committed ledger is STREAM_FINGERPRINTS.json;
  * StreamTopologySpec recomputes every key's shape against it — the
  * streaming twin of PlanFingerprintSpec. */
object StreamTopology {

  /** Run one streaming inventory key and fingerprint the micro-batch
    * topology it executed. Progress events post asynchronously on the
    * listener bus, so the capture polls until the buffer is stable;
    * events are attributed by query id (only queries STARTED while
    * this capture's listener was attached count — a straggler from a
    * previous key cannot leak in). */
  def fingerprint(spark: SparkSession, key: String, dir: String): String = {
    val started = java.util.concurrent.ConcurrentHashMap
      .newKeySet[java.util.UUID]()
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[
      org.apache.spark.sql.streaming.StreamingQueryProgress]()
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = {
        started.add(e.id): Unit
      }
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        if (started.contains(e.progress.id)) buf.add(e.progress): Unit
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    try {
      graft.SparkEntry.queries(key)(spark, dir).count(): Unit
      // the bus drains after the key returns — poll until stable AND
      // covered: every started query must have delivered at least one
      // progress event (an AvailableNow query always runs ≥1 batch),
      // so three quiet samples BEFORE any event arrives on a loaded
      // box cannot end the poll with an empty buffer
      import scala.jdk.CollectionConverters._
      def covered: Boolean = {
        val seen = buf.asScala.map(_.id).toSet
        started.asScala.forall(seen.contains)
      }
      var last = -1; var stable = 0; var tries = 0
      while (tries < 100 && !(stable >= 3 && covered)) {
        val n = buf.size
        if (n == last) stable += 1 else { stable = 0; last = n }
        Thread.sleep(100); tries += 1
      }
      // a timed-out poll must fail LOUDLY (r14 advice): a partial
      // buffer would hash to a silently-smaller fingerprint that
      // surfaces as spurious topology drift rather than a flake.
      // BOTH exit conditions are asserted (r15 review): `covered`
      // alone would accept a buffer that saw one event per query but
      // was still GROWING at the 10 s cap — the same partial
      // fingerprint through the other door.
      require(stable >= 3 && covered,
        s"$key: listener bus did not drain after ${tries * 100} ms " +
          s"(covered=$covered, stable=$stable) — rerun (flake), " +
          "this is NOT topology drift")
    } finally spark.streams.removeListener(listener)

    import scala.jdk.CollectionConverters._
    val byQuery = buf.asScala.toSeq.groupBy(_.id)
    val parts = byQuery.toSeq.map { case (_, ps) =>
      val opNames = ps.flatMap(_.stateOperators.toSeq)
        .map(_.operatorName).distinct.sorted
      val ops = opNames.map { op =>
        val perBatch = ps.map(_.stateOperators
          .count(_.operatorName == op)).max
        val nParts = ps.flatMap(_.stateOperators.toSeq)
          .filter(_.operatorName == op)
          .map(_.numShufflePartitions).max
        s"$op:$perBatch:p$nParts"
      }.mkString(",")
      val sink = ps.headOption
        .map(_.sink.description.takeWhile(c => c != '[' && c != '@'))
        .getOrElse("?").trim
      s"ops=[$ops];sink=$sink"
    }.sorted
    s"queries=${byQuery.size};" + parts.mkString("|")
  }
}
