package graft.transit

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TimetableSpec extends SparkSpec {
  private lazy val docs = Timetable.buildStopTimetables(GtfsFixture.tables(spark)).cache()

  test("one document per served stop; unused stop E absent") {
    val ids = docs.select("stop_id").collect().map(_.getString(0)).sorted.toSeq
    assert(ids == Seq("A", "B", "C", "D", "HUB"))
  }

  test("upcoming_services sorted by departure seconds; GeoJSON location") {
    val a = docs.filter(col("stop_id") === "A").collect()(0)
    val svcs = a.getSeq[org.apache.spark.sql.Row](a.fieldIndex("upcoming_services"))
    assert(svcs.map(_.getAs[String]("trip_id")) == Seq("T1", "T2", "T3", "T4", "T8"))
    val loc = a.getStruct(a.fieldIndex("location"))
    assert(loc.getString(0) == "Point")
    // coordinates are [lon, lat] per GeoJSON
    val coords = loc.getSeq[Double](1)
    assert(coords(0) < 0 && coords(1) > 0)
  }

  test(">24h departure renders wrapped display string (reference day-strip)") {
    val hub = docs.filter(col("stop_id") === "HUB").collect()(0)
    val svcs = hub.getSeq[org.apache.spark.sql.Row](hub.fieldIndex("upcoming_services"))
    val t5 = svcs.find(_.getAs[String]("trip_id") == "T5").get
    assert(t5.getAs[String]("departure_time") == "01:45:00")
    assert(t5.getAs[Long]("dep_secs") == 25L * 3600 + 45 * 60)
  }

  test("getStops: projection sorted by name") {
    val got = Timetable.getStops(docs).collect().map(_.getString(1)).toSeq
    assert(got == Seq("Alpha", "Bravo", "Charlie", "Delta", "Hub Central"))
  }

  test("getRoutesForStop: drops NOT IN SERVICE and null short names") {
    val got = Timetable.getRoutesForStop(docs, "HUB").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == Seq(("300", "Night Owl"), ("504", "Downtown")))
  }

  test("getArrivalsGrouped: null-short-name group kept, NOT IN SERVICE dropped") {
    // default = whole week: all public services {1,2,3} included
    val wk = Timetable.getArrivalsGrouped(docs, "HUB").collect()
      .map(r => (Option(r.getString(0)), r.getString(1), r.getLong(2), r.getString(3))).toSeq
    assert(wk == Seq(
      (None, "Beaches", 1L, "12:00:00"),
      (Some("300"), "Night Owl", 1L, "01:45:00"),
      (Some("504"), "Downtown", 4L, "08:05:00,09:06:00,10:10:00,11:08:00")))
    val wd = Timetable.getArrivalsGrouped(docs, "HUB", ServiceFilter.Weekday).collect()
      .map(r => (Option(r.getString(0)), r.getString(1), r.getLong(2), r.getString(3))).toSeq
    assert(wd == Seq(
      (None, "Beaches", 1L, "12:00:00"),
      (Some("300"), "Night Owl", 1L, "01:45:00"),
      (Some("504"), "Downtown", 2L, "08:05:00,09:06:00")))
  }

  test("getTimetable: whole document grouped, NO service or headsign filtering") {
    val got = Timetable.getTimetable(docs, "HUB").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(3))).toSeq
    // NOT IN SERVICE and all services included (unlike arrivals endpoints);
    // T5's 25:45 renders day-stripped as 01:45:00 and string-sorts first
    assert(got == Seq(
      ("KING", "Downtown", "08:05:00,09:06:00,10:10:00,11:08:00"),
      ("NIGHT", "Night Owl", "01:45:00"),
      ("QUEEN", "Beaches", "12:00:00"),
      ("QUEEN", "NOT IN SERVICE", "13:00:00")))
  }

  test("getArrivalsFlat: filtered, time-sorted list") {
    val got = Timetable.getArrivalsFlat(docs, "A", "504", "Downtown", ServiceFilter.Weekday)
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("08:00:00", "09:00:00", "14:00:00"))
  }

  test("flattened round trip preserves row count") {
    val flat = Timetable.flattened(docs)
    assert(flat.count() == 18L) // all stop_times rows
  }

  test("flattenedFromTables (codegen render path) ≡ flattened(rendered store)") {
    val t = GtfsFixture.tables(spark)
    val fast = Timetable.flattenedFromTables(t)
    val slow = Timetable.flattened(Timetable.buildStopTimetables(t))
    assert(fast.columns.toSeq == slow.columns.toSeq)
    assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty)
  }
}
