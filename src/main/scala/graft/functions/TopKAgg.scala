package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{struct, udaf}

/** Scored candidate: (score, id). Public for encoder codegen. */
case class Scored(score: Double, id: Long)

/** Bounded top-k aggregate with MAP-SIDE pruning.
  *
  * `row_number().over(Window.partitionBy(query))` top-k ships EVERY
  * scored row through the shuffle before ranking — O(|Q|·|C|) rows of
  * network at brute-force ANN scale. This Aggregator keeps a k-bounded
  * buffer instead, so partial aggregation prunes each map partition to k
  * rows per query and the shuffle carries O(|Q|·k·P) tiny buffers. Same
  * result (descending score, ascending id tie-break), 1000-executor-safe.
  *
  * The buffer is a sorted Vector (k is small — tens); a binary heap only
  * pays off for k in the thousands.
  */
class TopKAgg(k: Int)
    extends Aggregator[Scored, Vector[Scored], Vector[Scored]] {

  private def ord: Ordering[Scored] =
    Ordering.by(s => (-s.score, s.id)) // best first, id tie-break

  override def zero: Vector[Scored] = Vector.empty

  override def reduce(buf: Vector[Scored], x: Scored): Vector[Scored] =
    if (buf.length < k) (buf :+ x).sorted(ord)
    else if (ord.lt(x, buf.last)) (buf.init :+ x).sorted(ord)
    else buf

  override def merge(a: Vector[Scored], b: Vector[Scored]): Vector[Scored] =
    (a ++ b).sorted(ord).take(k)

  override def finish(buf: Vector[Scored]): Vector[Scored] = buf

  override def bufferEncoder: Encoder[Vector[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Vector[Scored]]()
  override def outputEncoder: Encoder[Vector[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Vector[Scored]]()
}

object TopKAgg {
  /** `topK(k)(scoreCol, idCol)` → `array<struct<score:double, id:bigint>>`
    * sorted best-first. Use with posexplode for (rank, id, score) rows. */
  def topK(k: Int)(score: Column, id: Column): Column = {
    val fn = udaf(new TopKAgg(k))
    fn(score, id) // case-class input encoder flattens to (score, id) args
  }
}
