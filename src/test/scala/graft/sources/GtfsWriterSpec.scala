package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec
import graft.transit.{Queries, ServiceFilter, TransitTables}

/** GTFS round trip (S1+S4): writing the bundle as a real feed and reading
  * it back must be lossless for every column Q1–Q4 consume — same rows,
  * same values, including >24h times and null stop_code/route_short_name. */
class GtfsWriterSpec extends AnyFunSuite with SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val direct = TransitTables.fromTpch(spark, sfDir)
  private lazy val rt = GtfsWriter.roundtrip(spark, sfDir)

  test("stop_times round-trip preserves ids, sequence, and >24h seconds") {
    val cols = Seq("trip_id", "stop_id", "stop_sequence", "dep_secs", "arr_secs")
    assert(rt.stopTimes.select(cols.map(org.apache.spark.sql.functions.col): _*)
      .exceptAll(direct.stopTimes.select(cols.map(org.apache.spark.sql.functions.col): _*))
      .isEmpty)
    assert(rt.stopTimes.count() == direct.stopTimes.count())
    // sf0.001's derived times all land under 24h, so prove the >24h leg
    // (gtfsString -> CSV text -> gtfsSeconds) directly: 25:45:00 = 92700
    import org.apache.spark.sql.functions._
    import graft.functions.GtfsTime
    val wrapped = spark.range(1)
      .select(GtfsTime.gtfsSeconds(GtfsTime.gtfsString(lit(92700L))).as("s"))
      .head().getLong(0)
    assert(wrapped == 92700L)
  }

  test("trips/stops/routes round-trip preserves join keys and nullable names") {
    assert(rt.trips.exceptAll(direct.trips).isEmpty &&
      direct.trips.exceptAll(rt.trips).isEmpty)
    import org.apache.spark.sql.functions._
    val stopCols = Seq("stop_id", "stop_name", "stop_code").map(col)
    assert(rt.stops.select(stopCols: _*)
      .exceptAll(direct.stops.select(stopCols: _*)).isEmpty)
    assert(rt.stops.filter(col("stop_code").isNull).count() ==
      direct.stops.filter(col("stop_code").isNull).count())
    assert(rt.routes.exceptAll(direct.routes).isEmpty)
  }

  test("Q4 over the round-tripped feed equals Q4 over the direct derivation") {
    val viaFeed = Queries.q4ServiceFrequency(rt, ServiceFilter.Weekday)
    val directQ4 = Queries.q4ServiceFrequency(direct, ServiceFilter.Weekday)
    assert(viaFeed.collect().toSeq == directQ4.collect().toSeq)
  }

  test("corrupt census: planted damage counted, clean rows survive exact") {
    import org.apache.spark.sql.functions._
    val census = GtfsWriter.corruptCensus(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // expected classes from the clean derivation, same exclusive moduli
    val st = direct.stopTimes.select(col("trip_id"))
    val n101 = st.filter(col("trip_id") % 101 === 0).count()
    val nCorrupt = st.filter(col("trip_id") % 101 =!= 0 &&
      (col("trip_id") % 103 === 0 || col("trip_id") % 107 === 0 ||
        col("trip_id") % 109 === 0 || col("trip_id") % 113 === 0)).count()
    val n113 = st.filter(col("trip_id") % 101 =!= 0 &&
      col("trip_id") % 103 =!= 0 && col("trip_id") % 107 =!= 0 &&
      col("trip_id") % 109 =!= 0 && col("trip_id") % 113 === 0).count()
    val total = st.count()
    assert(n101 > 0 && nCorrupt > 0, "fixture must plant both damage kinds")
    assert(n113 > 0, "fixture must plant the NULL-through-gtfsString class " +
      "(r14 ask #3) — a fixture where no trip_id hits %113 would leave the " +
      "guard unexercised again")
    assert(census("bad_time")._1 == n101)
    assert(census("corrupt")._1 == nCorrupt)
    assert(census("good")._1 == total - n101 - nCorrupt)
  }

  test("feed upsert: diff applied to landed v1 equals a fresh v2 load") {
    import org.apache.spark.sql.functions._
    val merged = Queries.feedUpsert(spark, sfDir)
    val v1 = direct.stopTimes
      .groupBy(col("trip_id"), col("stop_id"), col("stop_sequence").as("seq"))
      .agg(min(col("dep_secs")).as("dep_secs"))
    val freshV2 = v1.filter(col("trip_id") % 13 =!= 0)
      .withColumn("dep_secs", when(col("trip_id") % 7 === 0,
        col("dep_secs") + 300L).otherwise(col("dep_secs")))
      .unionByName(v1.filter(col("trip_id") % 11 === 0)
        .withColumn("trip_id", -col("trip_id")))
    assert(merged.exceptAll(freshV2).isEmpty && freshV2.exceptAll(merged).isEmpty)
    assert(merged.count() == freshV2.count())
  }
}
