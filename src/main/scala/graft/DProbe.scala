package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for dedup_corpus_keep's cross-round bench movement
  * (round-13, r12 verdict item 5: 1.09 → 1.43 s at sf0.1 with the key's
  * code unchanged). Runs the full key N times in ONE session after a
  * warmup, then times each pipeline stage in isolation — the
  * join_interval_overlap variance discipline. Dev-only; not in the
  * driver contract. */
object DProbe {
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

    def time(name: String)(thunk: => Unit): Double = {
      val t0 = System.nanoTime()
      thunk
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[dprobe] $name%-34s $dt%7.2fs")
      dt
    }
    def sink(d: org.apache.spark.sql.DataFrame): Unit =
      d.write.format("noop").mode("overwrite").save()

    def full() = sink(
      graft.queries.CurationQueries.queries("dedup_corpus_keep")(spark, dir))
    // warmup (codegen/JIT, parquet footer cache)
    full()

    val fulls = (1 to reps).map(i => time(s"full #$i")(full()))

    // stage decomposition (same construction as the key)
    val d = spark.read.parquet(s"$dir/documents.parquet")
    time("stage: jaccardPairs") {
      sink(graft.operators.Dedup.jaccardPairs(
        d, "doc_id", "text", n = 3, minJaccard = 0.5))
    }
    time("stage: pairs+clusters") {
      val pairs = graft.operators.Dedup.jaccardPairs(
        d, "doc_id", "text", n = 3, minJaccard = 0.5)
      sink(graft.operators.Dedup.duplicateClusters(pairs))
    }
    System.err.println(f"[dprobe] full min=${fulls.min}%.2f " +
      f"max=${fulls.max}%.2f spread=${fulls.max - fulls.min}%.2f")
    spark.stop()
  }
}
