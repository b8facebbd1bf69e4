package graft

import org.apache.spark.sql.SparkSession

/** Round-18 scratch matrix probe: times one streaming key under
  * combinations of the scoped stream-partition count and state-store
  * format validation. Dev tool, not part of the query surface. */
object StreamMatrixProbe {
  def main(args: Array[String]): Unit = {
    val key = args.headOption.getOrElse("join_stream_stream_louter")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try SparkEntry.queries(key)(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    catch { case e: Throwable => System.err.println(s"warm failed: $e") }
    for {
      parts <- Seq("4", "2", "1", "4", "2", "1")
      fmtVal <- Seq("true", "false")
    } {
      spark.conf.set("spark.graft.stream.shufflePartitions", parts)
      spark.conf.set(
        "spark.sql.streaming.stateStore.formatValidation.enabled", fmtVal)
      val t0 = System.nanoTime()
      SparkEntry.queries(key)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      System.err.println(f"[smx] $key parts=$parts fmtVal=$fmtVal  " +
        f"${(System.nanoTime() - t0) / 1e9}%6.2fs")
    }
    spark.stop()
  }
}
