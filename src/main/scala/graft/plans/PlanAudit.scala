package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Scale-smell linter for physical plans — the PlanSpec discipline as a
  * user-facing library feature. A correct result off a bad plan is a
  * latent scale bug: at gate size everything fits, at 100 TB a
  * cartesian product, an unpartitioned window, or an unpushed filter is
  * the job. `audit(df)` walks the executed plan (unwrapping AQE) and
  * returns typed findings; CI can fail on severity >= Error the same
  * way the repo's own PlanSpec does, without hand-writing per-query
  * asserts.
  *
  * Checks are heuristic by design (a plan LINTER, not a verifier):
  * every rule names the 100 TB failure mode it guards. Intentional
  * exceptions (a capped brute-force baseline, a broadcast-scalar cross
  * join) are allowed via `allow`.
  */
object PlanAudit {

  sealed trait Severity
  case object Info extends Severity
  case object Warn extends Severity
  case object Error extends Severity

  /** One lint finding: rule id, severity, human message, offending
    * plan-node class name. */
  final case class Finding(rule: String, severity: Severity,
      message: String, node: String)

  /** Audit a DataFrame's EXECUTED plan (AQE wrappers unwrapped to the
    * current physical plan).
    *
    * @param allow rule ids to suppress (declared-intentional shapes)
    */
  def audit(df: DataFrame, allow: Set[String] = Set.empty): Seq[Finding] = {
    val all = scala.collection.mutable.ArrayBuffer.empty[Finding]

    def walk(p: SparkPlan): Unit = {
      val cls = p.getClass.getSimpleName
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case _: CartesianProductExec =>
          all += Finding("cartesian", Error,
            "cartesian product: |L|x|R| pairs materialize; at scale " +
              "this is the whole job — add an equi-condition, a bin " +
              "join (RangeJoin), or a candidate filter (LSH/prefix)", cls)
        case _: BroadcastNestedLoopJoinExec =>
          all += Finding("bnl_join", Warn,
            "broadcast nested-loop join: per-row rescan of the " +
              "broadcast side; fine for a scalar/1-row side, fatal for " +
              "a real table — check the broadcast side is O(1) rows", cls)
        case w: WindowExec if w.partitionSpec.isEmpty =>
          all += Finding("global_window", Warn,
            "window without partitionBy: the whole dataset sorts " +
              "into ONE task; use GlobalWindow's two-pass rewrite " +
              "for global running aggregates", cls)
        case other =>
          val s = other.simpleStringWithNodeId()
          if (s.contains("UDF") && cls.contains("Project"))
            all += Finding("scala_udf", Warn,
              "Scala UDF in projection: breaks whole-stage codegen " +
                "and null-tracking; prefer " +
                "org.apache.spark.sql.functions or a custom codegen " +
                "Expression", cls)
      }
      p.children.foreach(walk)
      p.subqueries.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)

    // filter-above-scan with no pushed filters: the predicate did not
    // reach the parquet reader (casts and UDFs block pushdown)
    val planStr = df.queryExecution.executedPlan.toString
    if (planStr.contains("PushedFilters: []") &&
        planStr.contains("Filter "))
      all += Finding("unpushed_filter", Info,
        "a scan has PushedFilters: [] while the plan filters rows — " +
          "check the predicate is expressible on the scan (casts and " +
          "UDFs block pushdown)", "FileSourceScanExec")

    all.toSeq.filterNot(f => allow.contains(f.rule))
  }

  /** True when the plan carries no Error-severity finding. */
  def clean(df: DataFrame, allow: Set[String] = Set.empty): Boolean =
    audit(df, allow).forall(_.severity != Error)
}
