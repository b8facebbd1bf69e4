package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Scalable global running aggregates.
  *
  * `Window.orderBy(...)` with no `partitionBy` is semantically what the
  * reference's path-2 frames mean (SURVEY.md §2.1 path 2), but Spark
  * executes it on a SINGLE partition — the documented 100 TB bottleneck
  * (SURVEY.md §4.2). This is the classic two-pass fix:
  *
  *   1. range-repartition by the order keys (Spark samples split points),
  *      sort within partitions, and compute each partition's LOCAL
  *      running sum in one `mapPartitions` sweep (genuine per-partition
  *      imperative logic — the sanctioned mapPartitions case);
  *   2. aggregate one total per partition (P tiny rows), prefix-sum those
  *      on the driver (the only driver step: P numbers, not data), and
  *      broadcast-join the offsets back.
  *
  * Cost: one range shuffle + one P-row broadcast — fully parallel at any
  * scale. With a total order (callers include a tiebreaker, same contract
  * as any deterministic window) the result equals the single-partition
  * window exactly for integer-valued data and within float ulps
  * otherwise (partitioned summation reassociates the adds).
  */
object GlobalWindow {

  private val PID = "__gw_pid__"
  private val LOC = "__gw_loc__"

  /** Global cumulative sum of `valueCol` (cast to double) in the total
    * order of `orderBy`, appended as `outCol`. */
  def cumSum(df: DataFrame, orderBy: Seq[Column], valueCol: String,
      outCol: String, numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions

    val ranged = df
      .withColumn(LOC, col(valueCol).cast(DoubleType))
      .repartitionByRange(parts, orderBy: _*)
      .sortWithinPartitions(orderBy: _*)

    // Pass 1: local running sum + running non-null count + partition id,
    // one sweep, no extra shuffle. The count distinguishes "sum is 0"
    // from "no values seen yet" — a window sum is NULL until the first
    // non-null value, and this operator matches that contract.
    val CNT = "__gw_cnt__"
    val outSchema = ranged.schema
      .add(CNT, org.apache.spark.sql.types.LongType)
      .add(PID, org.apache.spark.sql.types.IntegerType)
    val vIdx = ranged.schema.fieldIndex(LOC)
    val withLocal = ranged.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      var acc = 0.0
      var cnt = 0L
      it.map { r =>
        if (!r.isNullAt(vIdx)) { acc += r.getDouble(vIdx); cnt += 1 }
        Row.fromSeq(r.toSeq.updated(vIdx, acc) :+ cnt :+ pid)
      }
    }(Encoders.row(outSchema))

    // Pin the sweep behind an exchange before fanning out to two
    // consumers. The local sums are tagged with RUNTIME partition ids;
    // without this barrier a downstream stage-shape change (e.g. a user's
    // `coalesce(1)`, which merges into the map stage and makes every
    // TaskContext id 0) would let the two consumers below evaluate the
    // sweep under DIFFERENT layouts and mis-join offsets. Behind the
    // exchange the ids are data, the plans canonicalize equal
    // (ReusedExchange → the sweep runs once), and no downstream operator
    // can reach into the sweep stage.
    val swept = withLocal.repartition(col(PID))

    // Pass 2: one total per partition (P rows), exclusive prefix-sum over
    // those P rows (a single-partition window over P values is fine —
    // that's the point of the rewrite), broadcast the offsets back.
    // No driver collect; the whole thing is one lazy plan.
    val pw = org.apache.spark.sql.expressions.Window.orderBy(col(PID))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsetDf = swept.groupBy(col(PID))
      .agg(coalesce(sum(col(valueCol).cast(DoubleType)), lit(0.0)).as("psum"),
        count(col(valueCol)).as("pcnt"))
      .withColumn("__gw_off__", coalesce(sum(col("psum")).over(pw), lit(0.0)))
      .withColumn("__gw_offcnt__", coalesce(sum(col("pcnt")).over(pw), lit(0L)))
      .select(col(PID), col("__gw_off__"), col("__gw_offcnt__"))

    swept.join(broadcast(offsetDf), Seq(PID))
      .withColumn(outCol, when(col(CNT) + col("__gw_offcnt__") > 0,
        col(LOC) + col("__gw_off__")))
      .drop(PID, LOC, CNT, "__gw_off__", "__gw_offcnt__")
  }
}
