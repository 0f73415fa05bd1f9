package graft.tools

import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, TextHash}
import graft.sources.Tables
import graft.transit.{Timetable, TransitTables}

/** Scratch stage-by-stage timing for the dedup hot paths (local iteration
  * only; not part of the driver contract). */
object StageTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import TextHash._

    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      val extra = r match { case l: Long => s" -> $l rows"; case _ => "" }
      println(f"[stage] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s$extra")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // pair volumes
    val sh = Tables.documents(spark, sfDir).select(
      col("doc_id"),
      GraftFunctions.simhash32(spark, tokenHashes(col("text"))).as("sh"))
    val slices = sh.select(col("doc_id"), col("sh"),
      posexplode(let(col("sh"))(s => transform(sequence(lit(0), lit(3)),
        k => (s.cast("double") / pow(lit(2.0), k * 8)).cast("long") % 256L))))
      .toDF("doc_id", "sh", "k", "slice")
      .repartition(col("k"), col("slice"))
    val joined = slices.as("a").join(slices.as("b"),
      col("a.k") === col("b.k") && col("a.slice") === col("b.slice") &&
        col("a.doc_id") < col("b.doc_id"))
    time("simhash join rows")(joined.count())
    time("simhash distinct pairs")(joined
      .select(col("a.doc_id"), col("b.doc_id")).distinct().count())

    val ss = Tables.documents(spark, sfDir).select(
      col("doc_id"), shingleSet(col("text")).as("shs"))
    val ex = ss.select(col("doc_id"), size(col("shs")).as("n"), explode(col("shs")).as("s"))
    val jj = ex.as("a").join(ex.as("b"),
      col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
    time("ngram join rows")(jj.count())

    // timetable breakdown
    for (i <- 1 to 2) {
      val t = TransitTables.fromTpch(spark, sfDir)
      time("st+trips+routes join")(noop(t.stopTimes.join(t.trips, "trip_id")
        .join(broadcast(t.routes), Seq("route_id"))))
      val built = Timetable.buildStopTimetables(t)
      time("build nested")(noop(built))
      time("build+flatten (no sort)")(noop(
        built.select(col("stop_id"), explode(col("upcoming_services")))))
      time("timetable_flat full")(noop(
        graft.SparkEntry.queries("transit_timetable_flat")(spark, sfDir)))
      println(s"[stage] ---- iter $i done ----")
    }
    spark.stop()
  }
}
