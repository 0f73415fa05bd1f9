package graft.tools

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Scratch decomposition of rel_approx_agg's cost (local iteration only). */
object AggTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[agg] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    val li = Tables.lineitem(spark, sfDir)
    time("count")(li.count())
    val g = li.groupBy(col("l_returnflag"))
    def noop(df: org.apache.spark.sql.DataFrame) =
      df.write.format("noop").mode("overwrite").save()
    time("countDistinct only")(noop(g.agg(countDistinct(col("l_orderkey")))))
    time("approx_cd only")(noop(g.agg(approx_count_distinct(col("l_orderkey"), 0.02))))
    time("exact percentile only")(noop(g.agg(expr("percentile(l_extendedprice, 0.5)"))))
    time("approx_percentile only")(noop(g.agg(expr("approx_percentile(l_extendedprice, 0.5, 1000)"))))
    time("cd + approx_cd")(noop(g.agg(countDistinct(col("l_orderkey")),
      approx_count_distinct(col("l_orderkey"), 0.02))))
    time("percentiles pair")(noop(g.agg(expr("percentile(l_extendedprice, 0.5)"),
      expr("approx_percentile(l_extendedprice, 0.5, 1000)"))))
    time("full combo (current)")(noop(g.agg(
      countDistinct(col("l_orderkey")),
      approx_count_distinct(col("l_orderkey"), 0.02),
      expr("percentile(l_extendedprice, 0.5)"),
      expr("approx_percentile(l_extendedprice, 0.5, 1000)"),
      count(lit(1)))))
    time("full combo again (warm)")(noop(g.agg(
      countDistinct(col("l_orderkey")),
      approx_count_distinct(col("l_orderkey"), 0.02),
      expr("percentile(l_extendedprice, 0.5)"),
      expr("approx_percentile(l_extendedprice, 0.5, 1000)"),
      count(lit(1)))))
    def split() = {
      val orders = li.groupBy(col("l_returnflag"), col("l_orderkey"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("exact_orders"),
          approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"),
          sum(col("c")).as("n_rows"))
      val exactMed = li.groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_extendedprice, 0.5)").as("exact_median_raw"))
      val approxMed = li.groupBy(col("l_returnflag"))
        .agg(expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("approx_median_raw"))
      orders.join(exactMed, "l_returnflag").join(approxMed, "l_returnflag")
    }
    time("split 3-agg + join")(noop(split()))
    time("split 3-agg + join (warm)")(noop(split()))
    spark.stop()
  }
}
