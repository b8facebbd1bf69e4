package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (build brief: "skewed keys → salting or AQE
  * skew-join").
  *
  * AQE (on by default in Spark 4) re-plans skewed SORT-MERGE JOINS at
  * runtime, but a skewed AGGREGATION still funnels every row of a hot key
  * through one task. Salting is the standard fix: split each key into
  * `nSalts` subkeys, aggregate partially per subkey (parallel), then
  * aggregate the subtotals (tiny). This composes exactly like map-side
  * partial aggregation, one level deeper.
  */
object SkewOps {

  private val SALT = "__salt__"

  /** Two-stage salted aggregation for algebraic aggregates.
    *
    * @param partials stage-1 aggregates per (keys, salt) — e.g.
    *                 `Seq(sum($"v").as("s"), count(lit(1)).as("n"))`
    * @param finals   stage-2 re-aggregates over the salt subtotals, in
    *                 terms of the stage-1 names — e.g.
    *                 `Seq(sum($"s").as("total"), sum($"n").as("cnt"))`
    *
    * Correct for any aggregate expressible as a commutative monoid over
    * partials (sum, count, min, max, and means/variances via their
    * (sum, count[, m2]) decompositions) — the same contract map-side
    * partial aggregation already imposes.
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], nSalts: Int)(
      partials: Seq[Column], finals: Seq[Column]): DataFrame = {
    require(nSalts > 0, "nSalts must be positive")
    df.withColumn(SALT, pmod(spark_partition_id()
        + monotonically_increasing_id(), lit(nSalts)))
      .groupBy((keys.map(col) :+ col(SALT)): _*)
      .agg(partials.head, partials.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(finals.head, finals.tail: _*)
  }
}
