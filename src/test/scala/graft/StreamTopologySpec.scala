package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.plans.StreamTopology

/** The streaming-TOPOLOGY gate (round-14, r13 verdict item 3): every
  * streaming inventory key's micro-batch skeleton — query count, state
  * operators with per-batch instance counts and state-store partition
  * counts, sink class — must match the committed
  * STREAM_FINGERPRINTS.json ledger, the streaming twin of
  * [[PlanFingerprintSpec]]. A refactor that silently doubled a
  * stateful op's state stores (or made a stateless enrichment
  * stateful) previously passed every correctness gate. After an
  * INTENTIONAL change, regenerate with
  * `sbt "runMain graft.StreamFingerprints"` and review the diff. */
class StreamTopologySpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  private val dir = "/root/testdata/sf0.001"

  private lazy val ledger: Map[String, String] = {
    val txt = java.nio.file.Files.readString(
      java.nio.file.Paths.get("STREAM_FINGERPRINTS.json"))
    """"([^"]+)":\s*"([^"]*)"""".r.findAllMatchIn(txt)
      .map(m => m.group(1) -> m.group(2)).toMap
  }

  test("ledger covers exactly the streaming inventory keys") {
    val want = graft.queries.TimeSeriesQueries.streamingKeys
    assert(ledger.keySet == want,
      s"missing=${want.diff(ledger.keySet).toSeq.sorted} " +
        s"stale=${ledger.keySet.diff(want).toSeq.sorted} " +
        "— regenerate: sbt \"runMain graft.StreamFingerprints\"")
  }

  test("every streaming key's executed topology matches the ledger") {
    val drift = graft.queries.TimeSeriesQueries.streamingKeys.toSeq.sorted
      .flatMap { name =>
        val got = StreamTopology.fingerprint(spark, name, dir)
        val want = ledger.getOrElse(name, "<absent>")
        if (got == want) Nil
        else Seq(s"$name:\n  want $want\n  got  $got")
      }
    assert(drift.isEmpty,
      s"${drift.size} streaming topologies drifted (regenerate via " +
        "graft.StreamFingerprints if intentional):\n" +
        drift.mkString("\n"))
  }
}
