package graft.tools
object CheckPlan {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(args.headOption.getOrElse("dedup_minhash_pairs"))(spark, "/root/testdata/sf0.001")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    println("[plan] documents scans: " + "documents.parquet".r.findAllIn(p).length)
    println("[plan] ReusedExchange: " + "ReusedExchange".r.findAllIn(p).length)
  }
}
