package graft.tools

import org.apache.spark.sql.SparkSession

/** Leg decomposition for the `transit_gtfs_corrupt` adjudication (VERDICT
  * r15 ask #2): times the census's WRITE leg (mangled-feed text sink) and
  * READ leg (PERMISSIVE full-row re-parse + class aggregate) separately,
  * three reps each in one JVM, under whatever corrupt-fixture lever the
  * environment sets (`SPARK_GRAFT_CORRUPT_CLASSES=4` restores the r14
  * four-class fixture). The interleaved whole-face A/B established the
  * fifth class costs ~2x; this attributes the cost to a leg. */
object GtfsCorruptAb {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val fixture = sys.env.getOrElse("SPARK_GRAFT_CORRUPT_CLASSES", "5(default)")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Scale.tuneSessionGrid(spark, sfDir)
    def timed(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[gtfs_ab] classes=$fixture%-10s $label ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    var feed: String = null
    for (i <- 1 to 3)
      timed(s"write rep$i") {
        feed = graft.sources.GtfsWriter.writeCorruptFeed(spark, sfDir)
      }
    for (i <- 1 to 3)
      timed(s"scan  rep$i") {
        graft.sources.GtfsWriter.censusScan(spark, feed)
          .write.format("noop").mode("overwrite").save()
      }
    spark.stop()
  }
}
