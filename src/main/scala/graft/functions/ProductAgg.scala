package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression, If, IsNotNull, IsNull, Literal, Multiply, Or}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType}

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

  /** Column form of the declarative tier: `productDecl(col).over(w)`.
    * Input is cast to double here (the expression itself expects
    * DoubleType — `AbstractDataType` is private[sql], so the implicit
    * input-cast trait isn't available outside Spark's own tree). */
  def productDecl(c: Column): Column = {
    import org.apache.spark.sql.graft.ColumnShim
    ColumnShim.column(
      ProductExpr(ColumnShim.expression(c.cast("double"))).toAggregateExpression())
  }
}

/** Product as a native `DeclarativeAggregate` — the tier ABOVE the udaf:
  * the buffer is two unsafe-row slots (running product + seen-a-value bit)
  * updated by pure Catalyst expressions, so window evaluation never pays
  * the typed `Aggregator`'s per-row encoder round-trip (case-class buffer
  * serialize/deserialize on EVERY update). Over a sliding frame — where
  * WindowExec re-aggregates the frame buffer for every output row — that
  * overhead dominated: the udaf form was the slowest query in BENCH_r01
  * (11.6s); this form prices like a builtin `sum`.
  *
  * Null semantics identical to [[ProductAgg]] and DuckDB `product()`:
  * nulls are skipped, a frame with zero non-null inputs yields NULL.
  * Registered in SQL as `product_agg` (GraftExtensions).
  */
case class ProductExpr(child: Expression)
    extends DeclarativeAggregate
    with UnaryLike[Expression] {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"product_agg requires DOUBLE input, got ${child.dataType.sql}; " +
          "cast the argument explicitly")

  private lazy val prod =
    AttributeReference("prod", DoubleType, nullable = false)()
  private lazy val seen =
    AttributeReference("seen", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(prod, seen)
  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(1.0), Literal(false))
  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(IsNull(child), prod, Multiply(prod, child)),
    Or(seen, IsNotNull(child)))
  override lazy val mergeExpressions: Seq[Expression] = Seq(
    Multiply(prod.left, prod.right),
    Or(seen.left, seen.right))
  override lazy val evaluateExpression: Expression =
    If(seen, prod, Literal(null, DoubleType))

  override protected def withNewChildInternal(newChild: Expression): ProductExpr =
    copy(child = newChild)
}
