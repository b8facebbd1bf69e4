package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.GraphQueries

/** Pins the degree-ordered-orientation triangle algorithm
  * (GraphQueries.triangleCounts) on known graphs, independent of the
  * DuckDB oracle: exact per-vertex counts on K4, a pure wedge (no
  * false triangle), and a power-law-ish hub shape where the
  * orientation's out-degree cap is what keeps the wedge join small.
  */
class GraphSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def counts(edges: (Long, Long)*): Map[Long, Long] = {
    val und = edges.toSeq.toDF("a", "b")
    GraphQueries.triangleCounts(und).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("K4: every vertex is in C(3,2)=3 triangles, total 4 triangles") {
    val got = counts((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L))
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    assert(got.values.sum == 12L) // 4 triangles x 3 corners
  }

  test("a path (wedge) has no triangles") {
    assert(counts((1L, 2L), (2L, 3L)).isEmpty)
  }

  test("hub graph: only the closed fans count, each triangle once") {
    // hub 0 connected to 1..5; spokes 1-2 and 3-4 closed, 5 dangling.
    // Triangles: (0,1,2) and (0,3,4).
    val got = counts((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (0L, 5L),
      (1L, 2L), (3L, 4L))
    assert(got == Map(0L -> 2L, 1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("two triangles sharing an edge") {
    // (1,2,3) and (2,3,4): shared edge 2-3
    val got = counts((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }

  // ---- commonNeighborsPrefix vs the exact wedge oracle ----

  private def scoreSet(df: org.apache.spark.sql.DataFrame)
      : Set[(Long, Long, Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSet

  private def exactThresholded(und: org.apache.spark.sql.DataFrame,
      num: Int, den: Int) =
    GraphQueries.commonNeighborsExact(und)
      .filter(col("cn") * (den + num) >= lit(num) * (col("dp") + col("dq")))

  test("ppjoin link scores: hub fan — prefix bound loses no pair") {
    // hub 0 over 1..6; spokes 1..6 pairwise non-adjacent, each pair
    // shares exactly neighbor {0}: J = 1/(1+1-1) = 1 ≥ 1/2 for deg-1
    // spokes — all 15 spoke pairs must survive the prefix filter.
    val und = (1L to 6L).map(i => (0L, i)).toDF("a", "b")
    val pp = scoreSet(GraphQueries.commonNeighborsPrefix(und, 1, 2))
    assert(pp == scoreSet(exactThresholded(und, 1, 2)))
    assert(pp.size == 15 && pp.forall { case (_, _, cn, dp, dq) =>
      cn == 1L && dp == 1L && dq == 1L })
  }

  test("ppjoin link scores equal the exact wedge form on random graphs") {
    // Erdős–Rényi graphs at several densities and two thresholds —
    // the prefix + positional filters must be exactly lossless.
    val rnd = new scala.util.Random(1042)
    for (trial <- 1 to 6) {
      val n = 12 + rnd.nextInt(12)
      val p = 0.15 + 0.1 * (trial % 3)
      val edges = for {
        a <- 0 until n; b <- (a + 1) until n if rnd.nextDouble() < p
      } yield (a.toLong, b.toLong)
      if (edges.nonEmpty) {
        val und = edges.toDF("a", "b").localCheckpoint()
        for ((num, den) <- Seq((1, 2), (1, 4))) {
          val got = scoreSet(GraphQueries.commonNeighborsPrefix(und, num, den))
          val want = scoreSet(exactThresholded(und, num, den))
          assert(got == want,
            s"trial=$trial tau=$num/$den: got ${got.size} want ${want.size}")
        }
      }
    }
  }
}
