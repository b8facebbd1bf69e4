package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Scalable global running aggregates.
  *
  * `Window.orderBy(...)` with no `partitionBy` is semantically what the
  * reference's path-2 frames mean (SURVEY.md §2.1 path 2), but Spark
  * executes it on a SINGLE partition — the documented 100 TB bottleneck
  * (SURVEY.md §4.2). This is the classic two-pass fix:
  *
  *   1. range-repartition by the order keys (Spark samples split points)
  *      and compute each range partition's LOCAL running sum;
  *   2. aggregate one total per partition (P tiny rows), exclusive
  *      prefix-sum those (a window over P rows), and broadcast-join the
  *      offsets back.
  *
  * The local sweep is an ordinary `Window.partitionBy(pid)` cumulative
  * sum, where pid = `spark_partition_id()` captured right after the range
  * exchange: the window's own hash exchange then (a) pins the pid
  * projection between two exchanges, so no downstream stage-shape change
  * (a user's `coalesce(1)`, AQE) can re-evaluate it under a different
  * layout, and (b) lets the offset aggregation reuse the SAME exchange
  * (ReusedExchange), so the upstream runs once. An earlier revision did
  * the sweep in a Row-encoder `mapPartitions` plus an explicit pin
  * shuffle — same shuffle count, but every row paid an
  * InternalRow→Row→InternalRow codec round-trip that WindowExec's
  * UnsafeRow frame processor avoids.
  *
  * AQE coalescing merges only ADJACENT shuffle partitions, so coalesced
  * range partitions remain contiguous key ranges and pid stays monotone
  * in the key order — prefix offsets stay correct.
  *
  * Cost: one range shuffle + one pid shuffle + one P-row broadcast —
  * fully parallel at any scale. With a total order (callers include a
  * tiebreaker, same contract as any deterministic window) the result
  * equals the single-partition window exactly for integer-valued data
  * and within float ulps otherwise (partitioned summation reassociates
  * the adds).
  */
object GlobalWindow {

  private val PID = "__gw_pid__"
  private val LOC = "__gw_loc__"
  private val CNT = "__gw_cnt__"

  /** Global cumulative sum of `valueCol` (cast to double) in the total
    * order of `orderBy`, appended as `outCol`. */
  def cumSum(df: DataFrame, orderBy: Seq[Column], valueCol: String,
      outCol: String, numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions

    val ranged = df
      .repartitionByRange(parts, orderBy: _*)
      .withColumn(PID, spark_partition_id())

    // Pass 1: per-range-partition running sum + running non-null count.
    // The count distinguishes "sum is 0" from "no values seen yet" — a
    // window sum is NULL until the first non-null value, and this
    // operator matches that contract.
    val lw = Window.partitionBy(col(PID)).orderBy(orderBy: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val swept = ranged
      .withColumn(LOC, sum(col(valueCol).cast(DoubleType)).over(lw))
      .withColumn(CNT, count(col(valueCol)).over(lw))

    // Pass 2: one total per partition (P rows), exclusive prefix-sum over
    // those P rows (a single-partition window over P values is fine —
    // that's the point of the rewrite), broadcast the offsets back.
    // No driver collect; the whole thing is one lazy plan.
    val pw = Window.orderBy(col(PID))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsetDf = ranged.groupBy(col(PID))
      .agg(coalesce(sum(col(valueCol).cast(DoubleType)), lit(0.0)).as("psum"),
        count(col(valueCol)).as("pcnt"))
      .withColumn("__gw_off__", coalesce(sum(col("psum")).over(pw), lit(0.0)))
      .withColumn("__gw_offcnt__", coalesce(sum(col("pcnt")).over(pw), lit(0L)))
      .select(col(PID), col("__gw_off__"), col("__gw_offcnt__"))

    swept.join(broadcast(offsetDf), Seq(PID))
      .withColumn(outCol, when(col(CNT) + col("__gw_offcnt__") > 0,
        coalesce(col(LOC), lit(0.0)) + col("__gw_off__")))
      .drop(PID, LOC, CNT, "__gw_off__", "__gw_offcnt__")
  }
}
