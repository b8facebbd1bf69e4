package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan inspector for the edit→explain loop:
  * `sbt "runMain graft.PlanPeek <key> [sfDir]"` prints the formatted
  * physical plan of one inventory key without regenerating PLANS.md.
  * Session confs mirror the fingerprint generator (4 cores / 4 shuffle
  * partitions) so shapes match the committed ledger. */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(args(0))(spark,
      args.lift(1).getOrElse("/root/testdata/sf0.001"))
    df.explain("formatted")
    spark.stop()
  }
}
