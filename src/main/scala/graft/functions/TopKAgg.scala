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

  // val, not def: reduce() runs once per scored row — no per-call
  // Ordering allocation; comparisons avoid tuple boxing
  private val ord: Ordering[Scored] = new Ordering[Scored] {
    def compare(a: Scored, b: Scored): Int = {
      val c = java.lang.Double.compare(b.score, a.score) // best first
      if (c != 0) c else java.lang.Long.compare(a.id, b.id)
    }
  }

  override def zero: Vector[Scored] = Vector.empty

  override def reduce(buf: Vector[Scored], x: Scored): Vector[Scored] =
    if (buf.length >= k && ord.gteq(x, buf.last)) buf // common case: reject
    else {
      // binary-search insert keeps the buffer sorted without a full re-sort
      var lo = 0; var hi = buf.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (ord.lt(buf(mid), x)) lo = mid + 1 else hi = mid
      }
      val inserted = buf.patch(lo, Seq(x), 0)
      if (inserted.length > k) inserted.dropRight(1) else inserted
    }

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
