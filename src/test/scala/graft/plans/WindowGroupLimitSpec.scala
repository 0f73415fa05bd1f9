package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** rel_topk_per_group's scale contract: the `row_number <= k` window idiom
  * must plan as Spark's partial/final WindowGroupLimit pair, so at most k
  * rows per group per map partition reach the shuffle. If a Spark upgrade
  * ever stops inferring the group limit, this spec fails and the query
  * needs a custom operator instead — that's the signal, not a perf cliff
  * in production. */
class WindowGroupLimitSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("row_number <= k plans as partial+final WindowGroupLimit") {
    val df = Seq(("a", 1, 30.0), ("a", 2, 10.0), ("b", 3, 5.0))
      .toDF("grp", "id", "score")
    val w = Window.partitionBy($"grp").orderBy($"score".desc, $"id")
    val q = df.select($"grp", $"id", row_number().over(w).as("rn"))
      .filter($"rn" <= 2)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$plan")
    assert(plan.contains("Partial") && plan.contains("Final"),
      s"expected map-side partial + reduce-side final pair:\n$plan")
  }

  test("rel_topk_per_group returns rn 1..2 per order with prices non-increasing") {
    val rows = graft.relational.RelationalQueries
      .topkPerGroup(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    val byOrder = rows.groupBy(_.getLong(0))
    byOrder.values.foreach { rs =>
      val sorted = rs.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).toSeq == (1 to sorted.length))
      val prices = sorted.map(_.getDouble(2)).toSeq
      assert(prices == prices.sorted(Ordering[Double].reverse))
      assert(rs.length <= 2)
    }
  }
}
