package graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** One shared walk of the full query registry at sf0.01: every registered
  * face is constructed once and its OPTIMIZED logical plan cached, so each
  * standing plan guard ([[WindowGuardSpec]], [[PlanGuardSpec]]) audits the
  * same 296 plans without paying the construction cost per suite (a few
  * faces run real jobs at construction time — the JDBC landing, the
  * mongoimport round-trip, the iterative graph faces — so the walk is the
  * dominant cost of a guard and must not be duplicated).
  *
  * sf0.01, not sf0.001: the guards separate "bounded metadata frame" from
  * "data-sized frame" by row count, and sf0.001's fact tables are small
  * enough to slip under any bound a metadata frame clears (see the ceiling
  * rationale in WindowGuardSpec).
  */
object RegistryPlans {
  val sfDir = "/root/testdata/sf0.01"

  lazy val plans: Seq[(String, LogicalPlan)] = {
    val spark = SparkSpec.spark
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val plan =
        try fn(spark, sfDir).queryExecution.optimizedPlan
        catch {
          case e: Throwable =>
            throw new AssertionError(s"$name failed to plan: ${e.getMessage}", e)
        }
      name -> plan
    }
  }
}
