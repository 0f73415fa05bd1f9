package graft

import org.apache.spark.sql.functions._
import graft.sources.MongoExport
import graft.transit.TransitTables

/** The document-store wire format: mongoimport-ready JSONL with the
  * reference's per-stop document shape (`Mongo/denormalization.py:106-131`).
  */
class MongoExportSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("one document per stop, keyed by string _id, GeoJSON location") {
    val d = MongoExport.docs(TransitTables.fromTpch(spark, sf))
    val n = d.count()
    assert(n === d.select("_id").distinct().count())
    val row = d.filter(col("stop_id") === 42L).collect().head
    assert(row.getAs[String]("_id") === "42")
    val loc = row.getAs[org.apache.spark.sql.Row]("location")
    assert(loc.getAs[String]("type") === "Point")
    assert(loc.getAs[Seq[Double]]("coordinates").size === 2)
  }

  test("upcoming_services arrays are departure-sorted (the reference's extraction order)") {
    val d = MongoExport.docs(TransitTables.fromTpch(spark, sf))
    val unsorted = d.select(col("stop_id"),
        (col("upcoming_services") === array_sort(col("upcoming_services")))
          .as("ok"))
      .filter(!col("ok")).count()
    assert(unsorted === 0L)
  }

  test("written lines are standalone JSON documents mongoimport accepts") {
    val (dir, _) = MongoExport.writeDocs(spark, sf)
    val line = spark.read.text(dir).limit(1).collect().head.getString(0)
    // plain JSON, object per line, _id present, no Extended-JSON needed
    assert(line.startsWith("{") && line.endsWith("}"))
    assert(line.contains("\"_id\":\""))
    assert(line.contains("\"upcoming_services\":["))
    // jackson-parseable (Spark's own JSON reader with no schema infers it)
    assert(spark.read.json(spark.createDataset(Seq(line))(
      org.apache.spark.sql.Encoders.STRING)).count() === 1L)
  }

  test("flatten of the read-back equals the direct relational flatten") {
    val back = MongoExport.roundtripFlat(spark, sf)
    val t = TransitTables.fromTpch(spark, sf)
    val direct = t.stopTimes
      .join(t.trips, "trip_id").join(t.routes, "route_id").join(t.stops, "stop_id")
      .select(col("stop_id"), col("stop_name"), col("stop_code"),
        round(col("stop_lon"), 6).as("stop_lon"),
        round(col("stop_lat"), 6).as("stop_lat"),
        col("trip_id"), col("stop_sequence"), col("route_id"),
        col("route_long_name"), col("route_short_name"),
        col("trip_headsign"), col("service_id"), col("direction_id"),
        col("dep_secs"),
        graft.functions.GtfsTime.displayString(col("arr_secs")).as("arrival_time"),
        graft.functions.GtfsTime.displayString(col("dep_secs")).as("departure_time"))
    assert(back.exceptAll(direct).isEmpty && direct.exceptAll(back).isEmpty)
    assert(back.count() === t.stopTimes.count())
  }
}
