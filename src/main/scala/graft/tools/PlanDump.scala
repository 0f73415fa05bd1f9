package graft.tools
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.sql.autoBroadcastJoinThreshold","64m")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(args(0))(spark, args.lift(1).getOrElse("/root/testdata/sf0.001"))
    df.collect()
    println(df.queryExecution.executedPlan.toString.take(12000))
  }
}
