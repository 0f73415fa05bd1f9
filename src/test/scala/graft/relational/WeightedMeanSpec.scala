package graft.relational

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** The typed Aggregator must agree with the expression-form weighted mean
  * (same Σxw/Σw association up to partial/final merge order — both are
  * sum-of-doubles in group order, so on identical partials the results
  * match to rounding). */
class WeightedMeanSpec extends AnyFunSuite with SparkSpec {

  test("typed Aggregator equals the expression-form weighted mean") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.01"
    val per = graft.sources.Tables.customer(spark, sf)
      .groupBy(col("c_nationkey"))
      .agg(avg(col("c_acctbal")).as("avg_bal"), count(lit(1)).as("n"))
    val typed = per.select(col("avg_bal"), col("n")).as[(Double, Long)]
      .select(WeightedMeanAgg.toColumn.name("w"))
      .head()
    val expr = RelationalQueries.weightedMean(spark, sf)
      .head().getDouble(0)
    // the expression form rounds to 4 dp; compare at that precision
    assert(math.abs(typed - expr) < 5e-5, s"typed=$typed expr=$expr")
  }

  test("Aggregator state is mergeable: any partition split gives the same result") {
    import spark.implicits._
    val rows = Seq.tabulate(50)(i => (i * 1.5, (i % 7 + 1).toLong))
    val one = rows.toDS().repartition(1).select(WeightedMeanAgg.toColumn).head()
    val many = rows.toDS().repartition(13).select(WeightedMeanAgg.toColumn).head()
    val want = rows.map { case (x, w) => x * w }.sum / rows.map(_._2).sum
    assert(math.abs(one - want) < 1e-9)
    assert(math.abs(many - want) < 1e-9) // merge order may differ → tiny fp slack
  }
}
