package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime re-planning evidence (build brief: "salting for skew, AQE for
  * runtime re-plan"). SkewOps covers the manual salting half; this spec
  * pins the AQE half — a skewed sort-merge join is split at runtime
  * without any query rewrite, which is the zero-code path production
  * jobs rely on before reaching for salts.
  */
class AqeSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get

  test("AQE splits a skewed sort-merge join partition at runtime") {
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force SMJ
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // shrink thresholds so a ~MB hot partition counts as skewed
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // 200k rows, ~95% on ONE key → one shuffle partition dwarfs the rest
      val big = spark.range(200000).select(
        when(col("id") % 20 =!= 0, lit(7L)).otherwise(col("id") % 50)
          .as("k"),
        concat(lit("payload-payload-payload-"), col("id")).as("pay"))
      val dim = spark.range(50).select(col("id").as("k"),
        concat(lit("dim"), col("id")).as("d"))
      val j = big.join(dim, Seq("k"))
      // collect() executes j's OWN queryExecution (count() would build a
      // separate aggregate plan and leave this one un-finalized)
      assert(j.collect().length == 200000)
      val finalPlan = j.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n$finalPlan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("join_aqe_skew's driver collect fails loudly past the row cap") {
    val key = graft.queries.ExtendedQueries.AqeSkewCollectCapConf
    val prev = spark.conf.getOption(key)
    try {
      spark.conf.set(key, "100") // sf0.001 output is ~6k rows >> 100
      val ex = intercept[IllegalArgumentException] {
        graft.SparkEntry.queries("join_aqe_skew")(
          spark, "/root/testdata/sf0.001").collect()
      }
      assert(ex.getMessage.contains(key),
        s"guard message should name the cap conf: ${ex.getMessage}")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
    // and at the default cap the key still runs green
    val out = graft.SparkEntry.queries("join_aqe_skew")(
      spark, "/root/testdata/sf0.001")
    assert(out.count() > 0)
  }
}
