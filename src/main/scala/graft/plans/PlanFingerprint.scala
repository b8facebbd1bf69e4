package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Normalized operator-tree SHAPE of a physical plan — the plan-snapshot
  * fingerprint gate (round-11, r9 verdict item 8 / r10 item 6).
  *
  * [[PlanAudit]] fires on the anti-pattern shapes it NAMES (cartesian,
  * unpushed filter, per-row window buffers…); this module catches the
  * regressions no lint rule names: an extra exchange from a dropped
  * co-partitioning, a broadcast join silently degrading to
  * sort-merge, a scan-count change from a lost plan reuse. The shape
  * is the operator-class tree rendered as a parenthesized string —
  * `Sort(Exchange(HashAggregate(HashAggregate(Scan))))` — with
  * everything value-like normalized away:
  *
  *   - node identity = class simple name, `Exec` suffix stripped (no
  *     expression ids, literals, paths, codegen stage ids);
  *   - codegen wrappers (`WholeStageCodegen`/`InputAdapter`) elided —
  *     span boundaries shift with Janino inlining heuristics across
  *     Spark point releases, while the operator tree is the contract;
  *   - AQE wrappers unwrapped to their current plan (fingerprints are
  *     taken pre-execution, so this is the deterministic initial plan
  *     — the PlanAudit convention);
  *   - subqueries (scalar, DPP/InSubquery) appended in `[...]` so a
  *     lost pushed-down subquery changes the shape.
  *
  * `PLAN_FINGERPRINTS.json` (repo root) pins the shape of every
  * [[graft.Plans.headline]] key; PlanFingerprintSpec recomputes and
  * diffs. Regenerate after an INTENTIONAL plan change with
  * `sbt "runMain graft.PlanFingerprints"` and review the diff like any
  * other — the file is the reviewable plan-shape ledger. */
object PlanFingerprint {

  def shape(plan: SparkPlan): String = plan match {
    case a: AdaptiveSparkPlanExec => shape(a.executedPlan)
    case q: QueryStageExec => shape(q.plan)
    case p if p.getClass.getSimpleName == "WholeStageCodegenExec" ||
        p.getClass.getSimpleName == "InputAdapter" =>
      shape(p.children.head)
    case p =>
      val name = p.getClass.getSimpleName.stripSuffix("$").stripSuffix("Exec")
      val subs = p.subqueries.map(s => shape(s))
      val subStr = if (subs.isEmpty) "" else subs.mkString("[", ",", "]")
      val kids = p.children
      if (kids.isEmpty) name + subStr
      else name + subStr + kids.map(shape).mkString("(", ",", ")")
  }

  def of(df: DataFrame): String = shape(df.queryExecution.executedPlan)
}
