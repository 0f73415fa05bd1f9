package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, TextHash}

/** Ad-hoc column-cost profiler for local iteration (not part of the driver
  * contract). Times one narrow projection per named expression over the
  * documents table. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      // mirror Bench's session config exactly — a different broadcast
      // threshold changes join strategies and invalidates the comparison
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val cases: Seq[(String, Column)] = Seq(
      "md5" -> md5(col("text").cast("binary")),
      "rollHash" -> TextHash.rollHash(col("text")),
      "tokens" -> size(TextHash.tokens(col("text"))),
      "tokenHashes" -> size(TextHash.tokenHashes(col("text"))),
      "simhash_native" -> GraftFunctions.simhash32(spark, TextHash.tokenHashes(col("text"))),
      "simhash_interp" -> TextHash.simhash32(TextHash.tokenHashes(col("text"))))
    if (args.isEmpty) {
      for ((name, c) <- cases) {
        val t0 = System.nanoTime()
        docs.select(c.as("x")).write.format("noop").mode("overwrite").save()
        println(f"[profile] $name%-16s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
    }
    // args = registered query names: run each twice (cold, warm)
    for (q <- args; i <- 1 to 2) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"[profile] $q%-28s run$i ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    spark.stop()
  }
}
