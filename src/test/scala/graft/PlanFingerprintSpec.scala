package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.plans.PlanFingerprint

/** The plan-SNAPSHOT gate (round-11): every headline key's normalized
  * operator-tree shape must match the committed PLAN_FINGERPRINTS.json
  * ledger, so an accidental exchange / scan-count / join-strategy
  * change fails CI even when no PlanAudit lint rule names it. After an
  * INTENTIONAL plan change, regenerate with
  * `sbt "runMain graft.PlanFingerprints"` and review the file diff. */
class PlanFingerprintSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  private val dir = "/root/testdata/sf0.001"

  private lazy val ledger: Map[String, String] = {
    val txt = java.nio.file.Files.readString(
      java.nio.file.Paths.get("PLAN_FINGERPRINTS.json"))
    """"([^"]+)":\s*"([^"]*)"""".r.findAllMatchIn(txt)
      .map(m => m.group(1) -> m.group(2)).toMap
  }

  test("ledger covers exactly the fingerprinted keys (all non-streaming)") {
    val want = Plans.fingerprinted.toSet ++ Plans.scopedFingerprints.keySet
    assert(ledger.keySet == want,
      s"missing=${want.diff(ledger.keySet).toSeq.sorted} " +
        s"stale=${ledger.keySet.diff(want).toSeq.sorted} " +
        "— regenerate: sbt \"runMain graft.PlanFingerprints\"")
  }

  test("every fingerprinted plan shape matches the committed ledger") {
    val drift = (Plans.fingerprinted.map { name =>
      name -> (() =>
        PlanFingerprint.of(SparkEntry.queries(name)(spark, dir)))
    } ++ Plans.scopedFingerprints.toSeq.map { case (name, fp) =>
      name -> (() => fp(spark, dir))
    }).flatMap { case (name, compute) =>
      val got = compute()
      val want = ledger.getOrElse(name, "<absent>")
      if (got == want) Nil else Seq(s"$name:\n  want $want\n  got  $got")
    }
    assert(drift.isEmpty,
      s"${drift.size} plan shapes drifted (regenerate via " +
        "graft.PlanFingerprints if intentional):\n" +
        drift.mkString("\n"))
  }
}
