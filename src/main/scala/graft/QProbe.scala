package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for window_range_months_median's cost structure at
  * sf1 (round-9). Times each constituent of the mutateW months path in
  * isolation on the sf1 events fixture. Dev-only; not in the driver
  * contract. */
object QProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{CalendarWindow, Frame, TidierOps}
    import graft.operators.CalendarWindow.{MonthsAggSpec, MonthsOp}
    import TidierOps._

    def time(name: String)(thunk: => Unit): Unit = {
      val t0 = System.nanoTime()
      thunk
      System.err.println(
        f"[qprobe] $name%-44s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
    }
    def sink(d: org.apache.spark.sql.DataFrame): Unit =
      d.write.format("noop").mode("overwrite").save()

    val tsDate = expr("cast(timestamp_micros(ts div 1000) as date)")
    def ev = graft.queries.QueryUtil.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("value"),
        tsDate.as("d"))
    sink(ev) // warm scan

    // pieces
    time("scan only") { sink(ev) }
    time("daily agg (collect_list)") {
      sink(ev.groupBy(col("user_id"), col("d"))
        .agg(collect_list(col("value").cast("double")).as("ql"),
          count(lit(1)).as("c")))
    }
    time("monthsAgg median only") {
      sink(CalendarWindow.monthsAgg(ev, Seq("user_id"), col("d"),
        Seq(MonthsAggSpec("med_v", MonthsOp.Quantile(0.5), "value")),
        before = 1, after = 0))
    }
    time("monthsAgg countAll only") {
      sink(CalendarWindow.monthsAgg(ev, Seq("user_id"), col("d"),
        Seq(MonthsAggSpec("n_all", MonthsOp.CountAll, "value")),
        before = 1, after = 0))
    }
    time("monthsAgg median+countAll") {
      sink(CalendarWindow.monthsAgg(ev, Seq("user_id"), col("d"),
        Seq(MonthsAggSpec("med_v", MonthsOp.Quantile(0.5), "value"),
          MonthsAggSpec("n_all", MonthsOp.CountAll, "value")),
        before = 1, after = 0))
    }
    time("monthsAgg + rename dance + key select") {
      val res = CalendarWindow.monthsAgg(ev, Seq("user_id"),
        col("d").cast(org.apache.spark.sql.types.DateType),
        Seq(MonthsAggSpec("__tidier_mout_0__", MonthsOp.Quantile(0.5),
            "value"),
          MonthsAggSpec("__tidier_mout_1__", MonthsOp.CountAll, "value")),
        before = 1, after = 0)
        .withColumn("med_v", col("__tidier_mout_0__"))
        .drop("__tidier_mout_0__")
        .withColumn("n_all", col("__tidier_mout_1__"))
        .drop("__tidier_mout_1__")
      sink(res.select(col("event_id"), col("med_v"), col("n_all")))
    }
    time("full mutateW key (default restore=false)") {
      sink(ev.mutateW("med_v" -> median(col("value")),
          "n_all" -> count(lit(1)))(
        by = Seq(col("user_id")),
        frame = Some(Frame.months(1, 0)),
        index = Some(col("d"))))
    }
    time("full mutateW key, second run") {
      sink(ev.mutateW("med_v" -> median(col("value")),
          "n_all" -> count(lit(1)))(
        by = Seq(col("user_id")),
        frame = Some(Frame.months(1, 0)),
        index = Some(col("d"))))
    }
    time("general path (old route) median+countAll") {
      sink(CalendarWindow.monthsAggGeneral(
        ev.withColumn("__one", lit(1)), Seq("user_id"), col("d"),
        Seq("med_v" -> expr("median(value)"),
          "n_all" -> count(col("__one"))),
        before = 1, after = 0))
    }
    spark.stop()
  }
}
