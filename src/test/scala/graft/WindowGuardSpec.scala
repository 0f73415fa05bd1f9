package graft

import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window => LWindow}
import org.apache.spark.sql.classic.GraftPlanShim
import org.scalatest.funsuite.AnyFunSuite

/** Standing guard against the single worst scale-killer a declarative plan
  * can hide: an UNPARTITIONED window over a data-sized frame, which funnels
  * every row through one task regardless of cluster size (the r11 sf10
  * flag — `rel_minmax_prune`'s global `row_number()` over orders — was
  * exactly this shape, in a query that was green at every smaller scale).
  *
  * The guard walks every registered query's optimized logical plan at
  * sf0.01, collects each `Window` whose partition spec is empty, and
  * row-count-probes the window's INPUT frame. Unpartitioned windows are
  * legitimate only over bounded metadata frames — per-bucket offset
  * prefix-sums, decile cuts, per-day counts — whose size is O(buckets),
  * not O(corpus): all such frames in the repo are ≤ ~2.4 k rows at any SF,
  * while the smallest fact table at sf0.01 is ~15 k rows, so a 4096-row
  * bound separates the two regimes with ≥ 1.7× slack on either side.
  * (The probe runs at sf0.01, not the cheaper sf0.001, precisely because
  * sf0.001's facts dip under any bound a metadata frame clears.)
  */
class WindowGuardSpec extends AnyFunSuite with SparkSpec {

  /** Bounded-metadata ceiling: generous vs every offsets/cuts frame
    * (≤ ~2.4 k per-day rows), well under every sf0.01 fact table. */
  private val MetadataRowBound = 4096L

  test("no registered query windows an unpartitioned data-sized frame") {
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    for ((name, plan) <- RegistryPlans.plans) {
      val children: Seq[LogicalPlan] = plan.collect {
        case w: LWindow if w.partitionSpec.isEmpty => w.child
      }
      children.foreach { child =>
        val rows = GraftPlanShim.ofRows(spark, child).count()
        if (rows > MetadataRowBound)
          offenders +=
            s"$name: unpartitioned Window over $rows rows (> $MetadataRowBound)"
      }
    }
    assert(offenders.isEmpty,
      "unpartitioned windows over data-sized frames:\n" +
        offenders.mkString("\n"))
  }
}
