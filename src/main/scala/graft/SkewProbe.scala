package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** `join_aqe_skew` sf1-ratio decomposition (round-11, r10 verdict
  * item 5): the key's Sf1Probe ratio (2.99× at 10× data in r9/r10)
  * needed a diagnosis — plan regression, or gate overhead?
  *
  * The gate (ExtendedQueries."join_aqe_skew") must COLLECT its joined
  * output to the driver: AQE finalizes the adaptive plan only on the
  * frame's own action, and the driver hashes the rows that the
  * skew-split execution actually produced (the snapshot pattern). That
  * collect is capped (2M rows) and exists only for the fixture gate —
  * a production skew join writes distributed. So the probe times, at
  * sf0.1 AND sf1 in one session, with the key's exact conf recipe and
  * frame construction:
  *
  *   1. `join+noop, skew ON`  — the distributed cost a deployment pays;
  *   2. `join+noop, skew OFF` — same plan minus the AQE skew split
  *      (isolates the split machinery itself);
  *   3. `gate collect, skew ON` — the shipped key's form (collectAsList
  *      of every joined row: 100k rows at sf0.1, 1M at sf1).
  *
  * If (1) scales ~linearly and (3)−(1) grows with the collected row
  * count, the 2.99 is snapshot-gate overhead, not a plan regression —
  * the README quotes the measured split. Run AFTER Sf1Probe (needs the
  * /tmp/graft_sf1 fixture): `sbt "runMain graft.SkewProbe"`. */
object SkewProbe {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf1 = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/tmp/graft_sf1")
    require(new java.io.File(sf1, "_READY").isFile,
      s"sf1 fixture missing at $sf1 — run graft.Sf1Probe/Sf1Build first")

    // the key's exact conf recipe (ExtendedQueries."join_aqe_skew");
    // skewOn toggles ONLY the skew-split rule
    def confs(skewOn: Boolean) = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> skewOn.toString,
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
        -> "4KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")

    // the key's exact frame construction: 95%-hot derived key over
    // events, multi-mapper map side, plain-shuffled 150-row dim
    def joined(dir: String): DataFrame = {
      val big = graft.queries.QueryUtil.events(spark, dir).select(
        when(col("user_id") % 20 =!= 0, lit(0L))
          .otherwise(col("user_id")).as("k"),
        col("event_id"), col("value"), col("props"))
        .repartition(32)
      val dim = spark.range(150).select(col("id").as("k"),
        (col("id") * 2 + 1).as("d"))
      big.join(dim, Seq("k"))
        .select(col("event_id"), col("k"), col("value"), col("d"))
    }

    def withConfs[A](skewOn: Boolean)(f: => A): A = {
      val cs = confs(skewOn)
      val prev = cs.map { case (k, _) => k -> spark.conf.getOption(k) }
      try { cs.foreach { case (k, v) => spark.conf.set(k, v) }; f }
      finally prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }

    def time(thunk: => Unit): Double = {
      val t0 = System.nanoTime(); thunk; (System.nanoTime() - t0) / 1e9
    }
    def best(thunk: => Unit): Double = {
      val a = time(thunk); val b = time(thunk); math.min(a, b)
    }

    // warmup: codegen/JIT at the smallest fixture
    withConfs(skewOn = true) {
      joined("/root/testdata/sf0.001").write
        .format("noop").mode("overwrite").save()
    }

    Seq("sf0.1" -> "/root/testdata/sf0.1", "sf1" -> sf1).foreach {
      case (tag, dir) =>
        val noopOn = withConfs(skewOn = true)(best(
          joined(dir).write.format("noop").mode("overwrite").save()))
        val noopOff = withConfs(skewOn = false)(best(
          joined(dir).write.format("noop").mode("overwrite").save()))
        var rows = 0
        val gate = withConfs(skewOn = true)(best {
          val j = joined(dir)
          rows = j.collectAsList().size()
          // the shipped key's require — the probe must measure the
          // plan shape the gate certifies
          require(j.queryExecution.executedPlan.toString
              .contains("skew=true"),
            "AQE did not mark the skewed join in the probe")
        })
        // the FULL shipped-key form as Sf1Probe times it: collect, wrap
        // the snapshot as a local frame, and write it back out — the
        // driver round-trip (collect + single-partition LocalTableScan
        // re-serialization) is the part the distributed arms above skip
        val snapshot = withConfs(skewOn = true)(best {
          val j = joined(dir)
          val r = j.collectAsList()
          spark.createDataFrame(r, j.schema)
            .write.format("noop").mode("overwrite").save()
        })
        println(f"[skewprobe] $tag%-6s join+noop skewON ${noopOn}%6.2fs  " +
          f"skewOFF ${noopOff}%6.2fs  gateCollect ${gate}%6.2fs  " +
          f"fullSnapshot ${snapshot}%6.2fs  ($rows%,d rows to driver)")
    }
    spark.stop()
  }
}
