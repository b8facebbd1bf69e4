package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Probe of a serialized Count-Min sketch (the binary produced by
  * Spark's own `count_min_sketch(col, eps, conf, seed)` imperative
  * aggregate): `cms_estimate(sketch, key)` returns the sketch's count
  * estimate for `key`.
  *
  * The aggregate half is builtin and MERGEABLE — partials combine across
  * partitions/days like any sketch, which is what makes frequency
  * estimation constant-memory at 100 TB. Spark ships no probe side at
  * all (the sketch is only consumable from driver code); this expression
  * closes that, so heavy-hitter detection composes declaratively:
  * build the sketch (one tiny agg), broadcast it as a LITERAL, probe the
  * candidate keys — the decontam_bloom shape, with counts instead of
  * membership.
  *
  * Estimates are one-sided by construction (estimate ≥ true count,
  * overshoot ≤ eps·N w.p. ≥ confidence) — the `agg_heavyhitters` oracle
  * key gates exactly that contract.
  *
  * Interpreted eval only (no doGenCode): the probe runs over CANDIDATE
  * keys — a bounded, post-aggregation frame — never inside a corpus
  * scan, so codegen would buy nothing. The deserialized sketch is cached
  * per sketch-bytes instance (the literal/broadcast case: deserialize
  * once per partition, not per row).
  *
  * Key hashing matches the aggregate's: longs/ints probe the long path,
  * strings probe their UTF-8 bytes (CountMinSketchAgg adds UTF8String
  * bytes via addBinary).
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "cms_estimate"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType | IntegerType | StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cms_estimate expects (binary sketch, bigint|int|string key), " +
          s"got ${l.simpleString} / ${r.simpleString}")
    }

  // cache keyed by the byte-array INSTANCE: a literal/broadcast sketch is
  // the same object for every row of a partition, so deserialization
  // happens once; a genuinely per-row sketch column still works (slow
  // path), it just re-deserializes
  @transient private var cachedRef: AnyRef = _
  @transient private var cachedSketch: CountMinSketch = _

  private def sketchOf(bytes: Array[Byte]): CountMinSketch = {
    if (!(bytes eq cachedRef)) {
      cachedSketch = CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(bytes))
      cachedRef = bytes
    }
    cachedSketch
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val sk = sketchOf(a.asInstanceOf[Array[Byte]])
    right.dataType match {
      case LongType    => sk.estimateCount(b.asInstanceOf[Long])
      case IntegerType => sk.estimateCount(b.asInstanceOf[Int].toLong)
      case StringType  =>
        // the aggregate adds string keys as their UTF-8 bytes
        sk.estimateCount(b.asInstanceOf[UTF8String].getBytes)
      case t => throw new IllegalStateException(s"unreachable: $t")
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}

object CmsProbe {
  /** `cms_estimate(sketchCol, keyCol)` as a Column. */
  def cmsEstimate(sketch: Column, key: Column): Column =
    ColumnShim.column(CmsEstimate(
      ColumnShim.expression(sketch), ColumnShim.expression(key)))
}
