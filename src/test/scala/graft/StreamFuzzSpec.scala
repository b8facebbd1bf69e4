package graft

import org.scalatest.funsuite.AnyFunSuite

/** In-suite smoke of the streaming property fuzz: the first 8 seeded
  * samples at seed 42 (FUZZ.json records the full evidence runs —
  * 1000 samples across seeds 42/43/45/46/47 via `graft.StreamFuzz`,
  * later seeds adding the cusum_ooo and asof_ooo arms) replayed on the
  * shared test session, so CI exercises random arrival permutations +
  * watermark schedules on every stateful operator without the full
  * 200-sample cost. */
class StreamFuzzSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get

  test("first 8 stream-fuzz samples match the batch frame definition") {
    val bad = (0 until 8).flatMap { i =>
      StreamFuzz.check(spark, i, 42L) match {
        case Left((arm, msg)) => Seq(s"$arm#$i: $msg")
        case Right(_)         => Nil
      }
    }
    assert(bad.isEmpty, bad.mkString("; "))
  }
}
