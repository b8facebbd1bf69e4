package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Codegen'd Z-order (Morton) bit interleave of two non-negative integer
  * keys: output bit `2i` is bit `i` of the FIRST key, bit `2i+1` is bit
  * `i` of the second, for the low `bits` bits of each (1 ≤ bits ≤ 31,
  * so the result fits a positive long).
  *
  * This is the multi-dimensional DATA-LAYOUT primitive (the reference
  * ecosystem's OPTIMIZE ZORDER move): sort or `repartitionByRange` a
  * 100 TB table by `z_order(a, b)` before writing, and rows close in
  * EITHER dimension land in the same files, so parquet min/max row-group
  * stats prune scans filtered on `a`, on `b`, or on both — a linear sort
  * key can only serve one of the two. The expression itself is a narrow
  * per-row computation compiled into whole-stage codegen (preference
  * order (b) of the build brief); the layout pipeline around it is plain
  * declarative Spark (`repartitionByRange(col) + sortWithinPartitions`).
  *
  * Out-of-range inputs (negative, or ≥ 2^bits) are REJECTED as NULL
  * rather than silently truncated: a truncated high bit would interleave
  * two far-apart keys to adjacent z-values, quietly destroying the
  * locality the operator exists to provide. Callers bucket first
  * (`pmod`, `least`, width clamps — see the `layout_zorder` query).
  */
case class InterleaveBits(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "z_order"

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(e => e.dataType == LongType ||
        e.dataType == IntegerType || e.dataType == ShortType ||
        e.dataType == ByteType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"z_order expects integral inputs, got " +
          s"${left.dataType.simpleString} / ${right.dataType.simpleString}")

  private def asLong(e: Expression, v: Any): Long = e.dataType match {
    case LongType    => v.asInstanceOf[Long]
    case IntegerType => v.asInstanceOf[Int].toLong
    case ShortType   => v.asInstanceOf[Short].toLong
    case ByteType    => v.asInstanceOf[Byte].toLong
    case t => throw new IllegalStateException(s"unreachable: $t")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = asLong(left, a); val y = asLong(right, b)
    val lim = 1L << bits
    if (x < 0 || y < 0 || x >= lim || y >= lim) null
    else ZOrder.interleave(x, y, bits)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // freshName everywhere — fixed locals collide when several z_order
    // calls share a codegen scope and Janino silently drops to the
    // interpreted path (see VecDot's identical note)
    val i = ctx.freshName("i"); val z = ctx.freshName("z")
    val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
    val lim = 1L << bits
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |long $xv = (long) $a;
         |long $yv = (long) $b;
         |if ($xv < 0L || $yv < 0L || $xv >= ${lim}L || $yv >= ${lim}L) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $z = 0L;
         |  for (int $i = 0; $i < $bits; $i++) {
         |    $z |= (($xv >> $i) & 1L) << (2 * $i);
         |    $z |= (($yv >> $i) & 1L) << (2 * $i + 1);
         |  }
         |  ${ev.value} = $z;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): InterleaveBits =
    copy(left = newLeft, right = newRight)
}

object ZOrder {

  /** Reference interleave (shared by eval and the spec's property
    * oracle). */
  private[functions] def interleave(x: Long, y: Long, bits: Int): Long = {
    var z = 0L; var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  /** Z-order value of two bucketed integer columns (see
    * [[InterleaveBits]]). */
  def zorder(x: Column, y: Column, bits: Int): Column =
    ColumnShim.column(InterleaveBits(
      ColumnShim.expression(x), ColumnShim.expression(y), bits))
}
