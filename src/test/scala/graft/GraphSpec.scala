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
}
