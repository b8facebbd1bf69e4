package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiler for the suffix-array pipeline (dev tool, not part
  * of the query surface). */
object SaProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .appName("sa-profile").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.graft.sa.debugTiming", "true")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[saprof] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warm the session
    time("warm")(docs.count())
    time("suffixRanks total") {
      val r = graft.operators.SuffixArray.suffixRanks(docs)
      println("rows=" + r.count())
    }
    time("suffixRanks again") {
      val r = graft.operators.SuffixArray.suffixRanks(docs)
      println("rows=" + r.count())
    }
    spark.stop()
  }
}
