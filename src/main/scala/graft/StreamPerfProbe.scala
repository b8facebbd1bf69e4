package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Scratch profiler for the streaming keys (round 18): runs a key N
  * times and prints each micro-batch's durationMs breakdown
  * (triggerExecution / queryPlanning / getBatch / walCommit /
  * addBatch / commitOffsets) plus state-store commit times from the
  * progress events — separates data cost from micro-batch machinery.
  * Dev tool, not part of the query surface. */
object StreamPerfProbe {
  def main(args: Array[String]): Unit = {
    val key = args.headOption.getOrElse("join_stream_stream_louter")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val d = p.durationMs
        val st = p.stateOperators.map(s =>
          s"rows=${s.numRowsTotal} commit=${s.commitTimeMs}ms").mkString(";")
        lines.add(f"batch=${p.batchId}%3d rows=${p.numInputRows}%6d " +
          s"trigger=${d.get("triggerExecution")}ms " +
          s"plan=${d.getOrDefault("queryPlanning", -1L)}ms " +
          s"getBatch=${d.getOrDefault("getBatch", -1L)}ms " +
          s"wal=${d.getOrDefault("walCommit", -1L)}ms " +
          s"addBatch=${d.getOrDefault("addBatch", -1L)}ms " +
          s"commit=${d.getOrDefault("commitOffsets", -1L)}ms " +
          s"state[$st]")
      }
    })
    // warm at the small sf like Bench
    try SparkEntry.queries(key)(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    catch { case e: Throwable => System.err.println(s"warm failed: $e") }
    lines.clear()
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      SparkEntry.queries(key)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      System.err.println(
        f"[sperf] $key run $i  ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      var l = lines.poll()
      while (l != null) { System.err.println("  " + l); l = lines.poll() }
    }
    spark.stop()
  }
}
