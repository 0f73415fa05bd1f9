package graft.transit

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class TypedQueriesSpec extends AnyFunSuite with SparkSpec {

  private lazy val t = TransitTables.fromTpch(spark, "/root/testdata/sf0.001")

  test("typed faces deserialize with correct nullability semantics") {
    val q1 = TypedQueries.q1(t, ServiceFilter.Weekday).collect()
    assert(q1.nonEmpty && q1.length <= 20)
    assert(q1.exists(_.stop_code.isEmpty)) // stop_id % 10 == 0 → null code
    assert(q1.forall(r => r.total_trip_events >= r.num_unique_routes))

    val q2w = TypedQueries.q2(t, ServiceFilter.WholeWeek).collect()
    assert(q2w.forall(_.duration_stddev_min.isEmpty)) // whole-week: stddev NULL
    val q2d = TypedQueries.q2(t, ServiceFilter.Weekday).collect()
    assert(q2d.exists(_.duration_stddev_min.isDefined))

    val q4 = TypedQueries.q4(t, ServiceFilter.Weekday, Limit.TopN(5)).collect()
    assert(q4.length == 5)
    // hourly profile is "h:n | h:n | ..." ascending by hour
    val hours = q4.head.hourly_profile.split(" \\| ").map(_.split(":")(0).toInt)
    assert(hours.toSeq == hours.sorted.toSeq)
  }
}
