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
  * exchange: the window's own hash exchange pins the pid projection
  * between two exchanges, so no downstream stage-shape change (a user's
  * `coalesce(1)`, AQE) can re-evaluate it under a different layout.
  *
  * '''Row/offset pid consistency.''' The sweep and the offset aggregation
  * are two branches of a plan diamond, and column pruning gives them
  * differently-projected children — so their range exchanges do NOT
  * canonicalize equal and each one evaluates `spark_partition_id()`
  * independently (verified against the physical plan; there is no
  * ReusedExchange here). Three facts keep the branches aligned:
  * (a) `repartitionByRange(parts, ...)` plans as a REPARTITION_BY_NUM
  * shuffle, which AQE never coalesces — partition boundaries can't be
  * re-drawn per-branch at runtime; (b) range-bound sampling is observed
  * deterministic for identical inputs (probed at 200k rows × 32
  * partitions); (c) because (b) is an observation, not a Spark contract,
  * the offsets carry each partition's [min, max] order-key span and every
  * output row VALIDATES its key against the span it joined — divergence
  * raises an error instead of silently mis-joining offsets (the guard
  * requires plain ascending order columns; with explicit SortOrder keys
  * it degrades to the unguarded join).
  *
  * AQE coalescing merges only ADJACENT shuffle partitions, so even where
  * coalescing applies, coalesced range partitions remain contiguous key
  * ranges and pid stays monotone in the key order.
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
  private val OFF = "__gw_off__"
  private val OFFCNT = "__gw_offcnt__"
  private val KLO = "__gw_klo__"
  private val KHI = "__gw_khi__"

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

    // The divergence guard compares the row's order key against its
    // partition's key span, which needs a comparable struct — only
    // buildable from plain (ascending) columns, not SortOrder wrappers.
    // Spark 4 Columns wrap internal ColumnNodes; a `.desc`/`.asc` key is a
    // SortOrder NODE (the catalyst SortOrder only appears post-conversion).
    val guardable =
      orderBy.forall(c => !org.apache.spark.sql.graft.ColumnShim.isSortOrder(c))
    def keyStruct: Column = struct(orderBy: _*)

    // Pass 2: one total per partition (P rows), exclusive prefix-sum over
    // those P rows (a single-partition window over P values is fine —
    // that's the point of the rewrite), broadcast the offsets back.
    // No driver collect; the whole thing is one lazy plan.
    val pw = Window.orderBy(col(PID))
      .rowsBetween(Window.unboundedPreceding, -1)
    val baseAggs = Seq(
      coalesce(sum(col(valueCol).cast(DoubleType)), lit(0.0)).as("psum"),
      count(col(valueCol)).as("pcnt"))
    val spanAggs = if (guardable)
      Seq(min(keyStruct).as(KLO), max(keyStruct).as(KHI)) else Nil
    val offsetDf = ranged.groupBy(col(PID))
      .agg((baseAggs ++ spanAggs).head, (baseAggs ++ spanAggs).tail: _*)
      .withColumn(OFF, coalesce(sum(col("psum")).over(pw), lit(0.0)))
      .withColumn(OFFCNT, coalesce(sum(col("pcnt")).over(pw), lit(0L)))
      .select((Seq(col(PID), col(OFF), col(OFFCNT)) ++
        (if (guardable) Seq(col(KLO), col(KHI)) else Nil)): _*)

    // LEFT join + validation: if the two branches ever disagreed on pid
    // assignment, a row would land on a missing pid or outside its
    // partition's key span — raise instead of silently mis-summing.
    val joined = swept.join(broadcast(offsetDf), Seq(PID), "left")
    val result = if (guardable) {
      val diverged = col(OFF).isNull ||
        keyStruct < col(KLO) || keyStruct > col(KHI)
      joined.withColumn(outCol,
        when(diverged, raise_error(concat(
          lit("GlobalWindow: range-partition assignment diverged between " +
            "the sweep and offset branches at pid "),
          col(PID).cast("string"))).cast(DoubleType))
        .when(col(CNT) + col(OFFCNT) > 0,
          coalesce(col(LOC), lit(0.0)) + col(OFF)))
    } else {
      joined.withColumn(outCol, when(col(CNT) + col(OFFCNT) > 0,
        coalesce(col(LOC), lit(0.0)) + col(OFF)))
    }
    result.drop(PID, LOC, CNT, OFF, OFFCNT, KLO, KHI)
  }
}
