package graft.transit

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Exactness of the grid-cell blocking: the blocked nearest-neighbor join
  * must return exactly what the definitional all-pairs computation returns
  * (any ≤R neighbor lies in the 3×3 cell neighborhood when cell edge = R). */
class SpatialSpec extends SparkSpec {

  test("grid-blocked NN join equals brute-force all-pairs NN (sf0.001)") {
    val t = TransitTables.fromTpch(spark, "/root/testdata/sf0.001")
    val r = 0.05
    val grid = Queries.stopNearestNeighbor(t, r).collect().toSeq

    val pts = t.stops.select(col("stop_id"),
      round(col("stop_lat"), 6).as("lat"), round(col("stop_lon"), 6).as("lon"))
    val other = pts.select(col("stop_id").as("b_id"),
      col("lat").as("b_lat"), col("lon").as("b_lon"))
    val d2 = (col("lat") - col("b_lat")) * (col("lat") - col("b_lat")) +
      (col("lon") - col("b_lon")) * (col("lon") - col("b_lon"))
    val brute = pts.crossJoin(other)
      .filter(col("b_id") =!= col("stop_id"))
      .withColumn("d2", d2)
      .filter(col("d2") <= lit(r) * lit(r))
      .groupBy(col("stop_id"))
      .agg(min(struct(col("d2"), col("b_id"))).as("nn"))
      .select(col("stop_id"), col("nn.b_id").as("nn_stop_id"),
        round(col("nn.d2"), 10).as("nn_d2"))
      .orderBy(col("stop_id"))
      .collect().toSeq

    assert(grid.nonEmpty && grid == brute)
  }

  test("the candidate join is cell-keyed, not a cross product") {
    val t = TransitTables.fromTpch(spark, "/root/testdata/sf0.001")
    val p = Queries.stopNearestNeighbor(t).queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }
}
