package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiler for dedup_stream_exact's r07→r08 +0.62 s regression
  * (round-9 verdict item 3): times the key N times in one session at
  * sf0.1, optionally overriding the scoped stream shuffle-partition
  * count, to separate micro-batch machinery variance from plan cost. */
object SProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm (codegen + fixture staging) at the small sf, like Bench
    SparkEntry.queries("dedup_stream_exact")(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      SparkEntry.queries("dedup_stream_exact")(spark, dir)
        .write.format("noop").mode("overwrite").save()
      System.err.println(f"[sprobe] run $i  ${(System.nanoTime() - t0) / 1e9}%6.2fs")
    }
    spark.stop()
  }
}
