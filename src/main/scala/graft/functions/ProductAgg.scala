package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Running-product buffer: partial product + count of non-null inputs.
  * Public for encoder codegen (same Janino visibility rule as the
  * streaming state class). */
case class ProductBuf(p: Double, n: Long)

/** Product aggregate — the tier-(b) UDAF path of the build brief
  * (SURVEY.md §2.4 "UDF/UDAF surface"): the reference accepts ANY R
  * expression per window slice (e.g. `prod(x)`, reference R/mutate.R:208),
  * and `prod` has no Spark builtin. A typed `Aggregator` registered via
  * `functions.udaf` slots into `.over(windowSpec)` exactly like a builtin,
  * with map-side partial aggregation in group-by mode.
  *
  * SQL-aggregate null semantics: nulls are skipped; a frame with zero
  * non-null inputs yields NULL (matches DuckDB's `product()`).
  */
object ProductAgg extends Aggregator[java.lang.Double, ProductBuf, java.lang.Double] {
  override def zero: ProductBuf = ProductBuf(1.0, 0L)
  override def reduce(b: ProductBuf, x: java.lang.Double): ProductBuf =
    if (x == null) b else ProductBuf(b.p * x, b.n + 1)
  override def merge(a: ProductBuf, b: ProductBuf): ProductBuf =
    ProductBuf(a.p * b.p, a.n + b.n)
  override def finish(b: ProductBuf): java.lang.Double =
    if (b.n == 0) null else b.p
  override def bufferEncoder: Encoder[ProductBuf] = Encoders.product[ProductBuf]
  override def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE

  /** Column form: `product(col).over(w)`. */
  val product: Column => Column = {
    val fn = udaf(ProductAgg)
    (c: Column) => fn(c)
  }
}
