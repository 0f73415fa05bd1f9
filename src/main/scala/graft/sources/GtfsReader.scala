package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.GtfsTime
import graft.transit.TransitTables

/** GTFS feed source: headered CSV `.txt` files with explicit schemas — no
  * runtime inference in the engine proper (SURVEY §1.4). The reference loads
  * these via MySQL's import wizard (reference `README.md:104-105`); here one
  * reader produces the [[TransitTables]] bundle directly.
  *
  * GTFS TIME strings may exceed 24:00:00; they parse to seconds ints at scan
  * time (`GtfsTime.gtfsSeconds`, pure codegen'd expressions) and the string
  * form is dropped from the hot path.
  */
object GtfsReader {

  /** Explicit GTFS schemas (reference `SQL/transit schema.sql:16-95`; ids are
    * strings, never ints). */
  val schemas: Map[String, StructType] = Map(
    // day flags are GTFS "1"/"0" (the reference's TINYINT(1)); dates are
    // GTFS yyyyMMdd — readTable sets the matching dateFormat
    "calendar" -> StructType(Seq(
      StructField("service_id", StringType, nullable = false),
      StructField("monday", ShortType), StructField("tuesday", ShortType),
      StructField("wednesday", ShortType), StructField("thursday", ShortType),
      StructField("friday", ShortType), StructField("saturday", ShortType),
      StructField("sunday", ShortType),
      StructField("start_date", DateType), StructField("end_date", DateType))),
    "routes" -> StructType(Seq(
      StructField("route_id", StringType, nullable = false),
      StructField("agency_id", StringType),
      StructField("route_short_name", StringType),
      StructField("route_long_name", StringType),
      StructField("route_desc", StringType),
      StructField("route_type", ShortType),
      StructField("route_color", StringType))),
    "trips" -> StructType(Seq(
      StructField("trip_id", StringType, nullable = false),
      StructField("route_id", StringType, nullable = false),
      StructField("service_id", StringType, nullable = false),
      StructField("trip_headsign", StringType),
      StructField("direction_id", ShortType),
      StructField("wheelchair_accessible", ShortType),
      StructField("bikes_allowed", ShortType),
      StructField("shape_id", StringType))),
    "stops" -> StructType(Seq(
      StructField("stop_id", StringType, nullable = false),
      StructField("stop_code", StringType),
      StructField("stop_name", StringType, nullable = false),
      StructField("stop_desc", StringType),
      StructField("stop_lat", FloatType, nullable = false),
      StructField("stop_lon", FloatType, nullable = false),
      StructField("zone_id", StringType),
      StructField("wheelchair_boarding", ShortType))),
    "stop_times" -> StructType(Seq(
      StructField("trip_id", StringType, nullable = false),
      StructField("arrival_time", StringType),
      StructField("departure_time", StringType),
      StructField("stop_id", StringType, nullable = false),
      StructField("stop_sequence", IntegerType, nullable = false),
      StructField("stop_headsign", StringType),
      StructField("pickup_type", ShortType),
      StructField("drop_off_type", ShortType),
      StructField("shape_dist_traveled", FloatType))))

  def readTable(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("dateFormat", "yyyyMMdd") // GTFS date encoding (calendar)
      .schema(schemas(name))
      .csv(s"$dir/$name.txt")

  /** Read a feed directory into the engine's table bundle. */
  def readFeed(spark: SparkSession, dir: String): TransitTables = {
    val st = readTable(spark, dir, "stop_times").select(
      col("trip_id"), col("stop_id"), col("stop_sequence"),
      GtfsTime.gtfsSeconds(col("departure_time")).as("dep_secs"),
      GtfsTime.gtfsSeconds(col("arrival_time")).as("arr_secs"),
      col("shape_dist_traveled").cast("double").as("shape_dist"))
    val trips = readTable(spark, dir, "trips")
      .select("trip_id", "route_id", "service_id", "trip_headsign", "direction_id")
    val stops = readTable(spark, dir, "stops")
      .select(col("stop_id"), col("stop_name"), col("stop_code"),
        col("stop_lat").cast("double").as("stop_lat"),
        col("stop_lon").cast("double").as("stop_lon"))
    val routes = readTable(spark, dir, "routes")
      .select("route_id", "route_long_name", "route_short_name")
    TransitTables(st, trips, stops, routes)
  }

  /** The one semantic the `calendar` table enables (reference
    * `SQL/transit schema.sql:16-28`; no reference query touches it, but
    * the data model declares it): which service_ids run on a given date —
    * the day-of-week flag is set AND the date falls in
    * [start_date, end_date]. */
  def servicesActiveOn(calendar: DataFrame, date: java.time.LocalDate): DataFrame = {
    val flag = Seq("monday", "tuesday", "wednesday", "thursday",
      "friday", "saturday", "sunday")(date.getDayOfWeek.getValue - 1)
    val d = lit(java.sql.Date.valueOf(date))
    calendar
      .filter(col(flag) === 1 && d.between(col("start_date"), col("end_date")))
      .select("service_id")
      .orderBy("service_id")
  }

}
