package graft.tools

import org.apache.spark.sql.functions._
import graft.functions.GtfsTime
import graft.transit.TransitTables

/** Scratch decomposition of transit_timetable_flat's cost (local iteration
  * only; not part of the driver contract): where does the global sort's
  * range-sampling double-eval land at sf0.1? */
object FlatTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Scale.tuneSessionGrid(spark, sfDir)

    def time(name: String)(f: => Any): Unit = {
      // min of two warm passes after one cold
      f
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[flat] $name%-34s ${ts.min}%8.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame) =
      df.write.format("noop").mode("overwrite").save()

    val t = TransitTables.fromTpch(spark, sfDir)
    val joined = t.stopTimes
      .join(t.trips, "trip_id")
      .join(broadcast(t.routes), Seq("route_id"))
      .join(broadcast(t.stops.select(col("stop_id"), col("stop_name"))), Seq("stop_id"))
    val rendered = joined.select(
      col("stop_id"), col("stop_name"), col("trip_id"), col("stop_sequence"),
      col("route_id"), col("route_long_name"), col("route_short_name"),
      col("trip_headsign"), col("service_id"), col("direction_id"),
      col("dep_secs"),
      GtfsTime.displayString(col("arr_secs")).as("arrival_time"),
      GtfsTime.displayString(col("dep_secs")).as("departure_time"))

    time("join only")(noop(joined))
    time("join+render, no sort")(noop(rendered))
    time("current: render then sort")(noop(
      rendered.orderBy(col("stop_id"), col("trip_id"), col("stop_sequence"))))
    time("sort narrow, render after")(noop(
      joined.orderBy(col("stop_id"), col("trip_id"), col("stop_sequence"))
        .select(
          col("stop_id"), col("stop_name"), col("trip_id"), col("stop_sequence"),
          col("route_id"), col("route_long_name"), col("route_short_name"),
          col("trip_headsign"), col("service_id"), col("direction_id"),
          col("dep_secs"),
          GtfsTime.displayString(col("arr_secs")).as("arrival_time"),
          GtfsTime.displayString(col("dep_secs")).as("departure_time"))))
    time("barrier(repart stop_id)+sort")(noop(
      rendered.repartition(col("stop_id"))
        .orderBy(col("stop_id"), col("trip_id"), col("stop_sequence"))))
    spark.stop()
  }
}
