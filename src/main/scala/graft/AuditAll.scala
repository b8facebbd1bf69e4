package graft

import org.apache.spark.sql.SparkSession
import graft.plans.{AuditInventory, PlanAudit}

/** Sweeps PlanAudit over the full non-streaming inventory and prints a
  * findings report — the ops-side twin of PlanAuditSpec's gate. Run it
  * after any operator change to see which plans now raise which rules:
  *
  *   sbt "runMain graft.AuditAll [sfDir]"
  *
  * Exit code 1 if any key raises a Warn/Error finding that is not in
  * `AuditInventory.declaredAllows` (same contract the spec asserts).
  */
object AuditAll {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    var undeclared = 0
    AuditInventory.sweepKeys.foreach { key =>
      val findings =
        try PlanAudit.audit(SparkEntry.queries(key)(spark, sfDir))
        catch { case e: Exception =>
          println(s"[audit] $key BUILD-ERROR ${e.getMessage}")
          undeclared += 1; Nil
        }
      val gating = findings.filter(_.severity != PlanAudit.Info)
      val allowed = AuditInventory.declaredAllows.getOrElse(key, Set.empty)
      findings.foreach { f =>
        val tag =
          if (f.severity == PlanAudit.Info) "info"
          else if (allowed.contains(f.rule)) "allowed"
          else { "UNDECLARED" }
        println(s"[audit] $key ${f.rule} ${f.severity} $tag")
      }
      undeclared += gating.count(f => !allowed.contains(f.rule))
    }
    println(s"[audit] swept ${AuditInventory.sweepKeys.size} keys, " +
      s"$undeclared undeclared gating findings")
    spark.stop()
    if (undeclared > 0) sys.exit(1)
  }
}
