package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.ZOrder

/** functions/ZOrder — the Morton-interleave layout primitive. The
  * DuckDB-replayed arithmetic is gated by the `layout_zorder` oracle
  * key; this spec pins the expression's own contract: codegen/eval
  * agreement with the reference fold, per-dimension monotonicity (the
  * property that makes z-order a useful clustering key at all), range
  * rejection, and the SQL registration.
  */
class ZOrderSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get

  private def viaSpark(pairs: Seq[(Long, Long)], bits: Int): Seq[Any] = {
    import spark.implicits._
    pairs.toDF("x", "y")
      .select(ZOrder.zorder(col("x"), col("y"), bits).as("z"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getLong(0)).toSeq
  }

  test("codegen agrees with the reference interleave on deterministic cases") {
    val rnd = new scala.util.Random(42)
    val pairs = Seq((0L, 0L), (1023L, 1023L), (1L, 0L), (0L, 1L)) ++
      Seq.fill(200)((rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
    val got = viaSpark(pairs, 10)
    val want = pairs.map { case (x, y) =>
      java.lang.Long.valueOf(refInterleave(x, y, 10)) }
    assert(got == want)
  }

  private def refInterleave(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L)((z, i) =>
      z | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1)))

  test("monotone in each dimension with the other held fixed") {
    // z(x, c) strictly increases in x (and symmetrically in y): the
    // even/odd bit planes are independent, so ordering within one
    // dimension is preserved — the locality property the layout relies on
    val fixed = 357L
    val xs = (0L until 1024L).map(x => refInterleave(x, fixed, 10))
    assert(xs == xs.sorted && xs.distinct.size == xs.size)
    val ys = (0L until 1024L).map(y => refInterleave(fixed, y, 10))
    assert(ys == ys.sorted && ys.distinct.size == ys.size)
  }

  test("out-of-range and null inputs yield NULL, not truncation") {
    assert(viaSpark(Seq((1024L, 0L), (0L, 1024L), (-1L, 5L)), 10)
      == Seq(null, null, null))
    import spark.implicits._
    val withNull = Seq((Some(3L), None: Option[Long]))
      .toDF("x", "y")
      .select(ZOrder.zorder(col("x"), col("y"), 10).as("z"))
      .collect()
    assert(withNull(0).isNullAt(0))
  }

  test("z_order is callable from pure SQL and matches the Column API") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT z_order(5L, 9L, 10) AS z").collect()(0).getLong(0)
    assert(r == refInterleave(5L, 9L, 10))
  }
}
