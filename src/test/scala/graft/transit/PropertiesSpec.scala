package graft.transit

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** SURVEY §5 property-based tests over generated GTFS-shaped data.
  * Plain ScalaCheck generators sampled with fixed seeds (the
  * scalatest-scalacheck bridge isn't in the offline dependency set). */
class PropertiesSpec extends AnyFunSuite with SparkSpec {

  private case class St(tripId: Long, stopId: Long, seq: Int, dep: Long)

  private val genData: Gen[(Seq[(Long, Long, String)], Seq[St])] = for {
    nTrips <- Gen.choose(3, 25)
    trips = (1L to nTrips).map(t => (t, t % 5, ((t % 3) + 1).toString))
    stopTimes <- Gen.sequence[List[St], St](
      trips.toList.flatMap { case (t, _, _) =>
        (1 to 4).map(seq => for {
          stop <- Gen.choose(0L, 8L)
          dep <- Gen.choose(0L, 100000L) // may exceed 86400 (>24h GTFS times)
        } yield St(t, stop, seq, dep))
      })
  } yield (trips, stopTimes)

  private def samples(n: Int): Seq[(Seq[(Long, Long, String)], Seq[St])] =
    (1 to n).flatMap(i => genData.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def tables(trips: Seq[(Long, Long, String)], sts: Seq[St]): TransitTables = {
    import spark.implicits._
    TransitTables(
      stopTimes = sts.map(s => (s.tripId, s.stopId, s.seq, s.dep, s.dep + 60L, 1.0))
        .toDF("trip_id", "stop_id", "stop_sequence", "dep_secs", "arr_secs", "shape_dist"),
      trips = trips.map { case (t, r, sid) => (t, r, sid, "HS", 0) }
        .toDF("trip_id", "route_id", "service_id", "trip_headsign", "direction_id"),
      stops = (0L to 8L).map(s => (s, s"S$s", s"C$s", 43.0, -79.0))
        .toDF("stop_id", "stop_name", "stop_code", "stop_lat", "stop_lon"),
      routes = (0L to 4L).map(r => (r, s"R$r", r.toString))
        .toDF("route_id", "route_long_name", "route_short_name"))
  }

  test("Q1 whole-week count >= every per-service count, and equals their sum") {
    for ((trips, sts) <- samples(4)) {
      val t = tables(trips, sts)
      def totals(f: ServiceFilter): Map[Long, Long] =
        Queries.q1BusiestStops(t, f, Limit.All).collect()
          .map(r => r.getAs[Long]("stop_id") -> r.getAs[Long]("total_trip_events")).toMap
      val week = totals(ServiceFilter.WholeWeek)
      val perService = Seq(ServiceFilter.Weekday, ServiceFilter.Saturday,
        ServiceFilter.Sunday).map(totals)
      for (stop <- week.keys) {
        val parts = perService.map(_.getOrElse(stop, 0L))
        assert(parts.forall(_ <= week(stop)))
        assert(parts.sum == week(stop), s"stop $stop: $parts vs ${week(stop)}")
      }
    }
  }

  test("Q3 output rows all have num_unique_routes >= 2") {
    for ((trips, sts) <- samples(4)) {
      val rows = Queries.q3TransferPoints(tables(trips, sts),
        ServiceFilter.WholeWeek, Limit.All).collect()
      assert(rows.forall(_.getAs[Long]("num_unique_routes") >= 2))
    }
  }

  test("timetable arrays are sorted and cover exactly the joined rows") {
    for ((trips, sts) <- samples(3)) {
      val t = tables(trips, sts)
      val tt = Timetable.buildStopTimetables(t)
      val arrays = tt.select(col("stop_id"),
        col("upcoming_services.dep_secs").as("deps")).collect()
      for (r <- arrays) {
        val deps = r.getSeq[Long](1)
        assert(deps == deps.sorted, s"unsorted deps for stop ${r.get(0)}")
      }
      val nested = tt.select(explode(col("upcoming_services"))).count()
      assert(nested == sts.size) // every stop_time row lands in exactly one doc
    }
  }
}
