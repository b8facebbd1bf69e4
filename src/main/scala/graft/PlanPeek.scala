package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan inspector for the edit→explain loop:
  * `sbt "runMain graft.PlanPeek <key> [sfDir]"` prints the formatted
  * physical plan of one inventory key without regenerating PLANS.md.
  * Session confs mirror the fingerprint generator (4 cores / 4 shuffle
  * partitions) so shapes match the committed ledger. */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: runMain graft.PlanPeek <key> [sfDir]")
      sys.exit(2)
    }
    if (!SparkEntry.queries.contains(args(0))) {
      val near = SparkEntry.queries.keys.filter(_.contains(
        args(0).take(6))).take(5).mkString(", ")
      System.err.println(s"unknown key '${args(0)}'" +
        (if (near.nonEmpty) s"; nearest: $near" else ""))
      sys.exit(2)
    }
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(args(0))(spark,
      args.lift(1).getOrElse("/root/testdata/sf0.001"))
    df.explain("formatted")
    // optional second arg "exec": run the query and print the FINAL
    // adaptive plan (AQE stage reuse — ReusedExchange/ReusedQueryStage —
    // only appears at runtime, never in the static explain)
    if (args.contains("exec")) {
      df.collect(): Unit // drive THIS plan instance to its final form
      println("=== executed (isFinalPlan) ===")
      println(df.queryExecution.executedPlan.toString.take(120000))
    }
    spark.stop()
  }
}
