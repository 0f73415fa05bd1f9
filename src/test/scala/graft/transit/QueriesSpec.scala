package graft.transit

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Golden tests for Q1–Q4 over the hand-computed micro-fixture — every
  * SURVEY §7.4 trap has an exact expected value here. */
class QueriesSpec extends SparkSpec {
  private def t = GtfsFixture.tables(spark)

  private def rows(df: org.apache.spark.sql.DataFrame, cols: String*): Seq[Seq[Any]] =
    df.select(cols.head, cols.tail: _*).collect().toSeq.map(_.toSeq)

  test("Q1 weekday: event counts, distinct routes, tie-break order") {
    val got = rows(Queries.q1BusiestStops(t, ServiceFilter.Weekday),
      "stop_id", "total_trip_events", "num_unique_routes")
    assert(got == Seq(
      Seq("HUB", 5L, 3L),
      Seq("A", 3L, 1L),
      Seq("B", 3L, 1L),
      Seq("C", 2L, 2L),
      Seq("D", 1L, 1L)))
  }

  test("Q2 path: longest trip of a route by stop count, trip_id tie-break") {
    // QUEEN (R2) weekday trips: T6 (HUB,C) and T7 (HUB,D) both have 2
    // stops → tie-break picks T6; path ordered by stop_sequence
    val got = rows(Queries.q2TripPath(t, "QUEEN"), "stop_sequence", "stop_lat")
    assert(got.map(_.head) == Seq(1, 2))
    // KING (R1) longest weekday trip is any 3-stop trip; T1 wins the tie
    val king = Queries.q2TripPath(t, "KING").collect()
    assert(king.length == 3 && king.map(_.getInt(2)).toSeq == Seq(1, 2, 3))
  }

  test("Q4 nested: per-service pivot, FIXED /3.0 average, global >24h max_hour") {
    val got = rows(Queries.q4Nested(t),
      "route_id", "total_daily_trips", "trips_weekday", "trips_saturday",
      "trips_sunday", "average_daily_trips", "hourly_profile", "max_hour")
    assert(got == Seq(
      Seq("R1", 5L, 3L, 1L, 1L, 5 / 3.0, "8:1 | 9:1 | 10:1 | 11:1 | 14:1", 26L),
      // R2 runs weekdays only: the average still divides by 3, not by the
      // number of services present (the reference's fixed denominator)
      Seq("R2", 2L, 2L, 0L, 0L, 2 / 3.0, "12:1 | 13:1", 26L),
      // T5 spans hours 25 and 26 (>24h GTFS times stay unwrapped)
      Seq("R3", 2L, 2L, 0L, 0L, 2 / 3.0, "25:1 | 26:1", 26L)))
  }

  test("Q1 whole-week = unfiltered (trip event counts once)") {
    val got = rows(Queries.q1BusiestStops(t, ServiceFilter.WholeWeek),
      "stop_id", "total_trip_events")
    assert(got == Seq(Seq("HUB", 7L), Seq("A", 5L), Seq("B", 3L), Seq("C", 2L), Seq("D", 1L)))
  }

  test("Q1 propagates null stop_code and rounds lat/lon to 6 dp") {
    val byId = Queries.q1BusiestStops(t, ServiceFilter.Weekday)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(byId("B").isNullAt(1)) // stop_code null
    val expLat = BigDecimal(43.6532985f.toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(byId("C").getDouble(3) == expLat)
  }

  test("Q2 weekday: null-skipping avg, stddev_pop, HAVING>60 drops T6") {
    val got = rows(Queries.q2RouteStats(t, ServiceFilter.Weekday),
      "route_long_name", "num_trips", "avg_trip_distance_km",
      "avg_duration_min", "duration_stddev_min", "avg_speed_kmh")
    assert(got == Seq(
      Seq("QUEEN", 1L, 3.0, 30.0, 0.0, 6.0),   // T6 (45s) excluded, T7 counted
      Seq("NIGHT", 1L, 10.0, 25.0, 0.0, 24.0), // >24h times still 25 min
      Seq("KING", 3L, 5.5, 14.0, 4.3205, 30.0))) // dist skips T8 null; stddev_pop
  }

  test("Q2 whole-week: trip-weighted means, stddev NULL") {
    val got = Queries.q2RouteStats(t, ServiceFilter.WholeWeek).collect()
    val king = got.find(_.getString(1) == "KING").get
    assert(king.getLong(3) == 5L) // 3 weekday + sat + sun
    assert(king.getDouble(5) == 12.0) // (14*3 + 10 + 8) / 5
    assert(king.getDouble(4) == 5.1) // (5.5*3 + 5 + 4) / 5
    assert(king.isNullAt(6)) // duration_stddev_min NULL on '4' rows
    assert(king.getDouble(7) == 30.0)
  }

  test("Q2 overall banner: trip-count-weighted across routes") {
    val overall = Queries.q2Overall(Queries.q2RouteStats(t, ServiceFilter.Weekday)).collect()(0)
    // (30*1 + 25*1 + 14*3) / 5 = 97/5
    assert(overall.getDouble(0) == 19.4)
  }

  test("Q3: transfer points need >= 2 distinct routes; whole-week unfiltered") {
    val wd = rows(Queries.q3TransferPoints(t, ServiceFilter.Weekday),
      "stop_id", "num_unique_routes")
    assert(wd == Seq(Seq("HUB", 3L), Seq("C", 2L)))
    val wk = rows(Queries.q3TransferPoints(t, ServiceFilter.WholeWeek),
      "stop_id", "num_unique_routes")
    assert(wk == wd) // services 2/3 add no new (stop, route) pairs
  }

  test("Q4 weekday: hour buckets pass 24h unwrapped; ordered profile string") {
    val got = rows(Queries.q4ServiceFrequency(t, ServiceFilter.Weekday),
      "route_long_name", "total_daily_trips", "hourly_profile")
    assert(got == Seq(
      Seq("KING", 3L, "8:1 | 9:1 | 14:1"),
      Seq("QUEEN", 2L, "12:1 | 13:1"),
      Seq("NIGHT", 2L, "25:1 | 26:1"))) // hours 25/26, never wrapped
  }

  test("Q4 whole-week: per-hour SUM across services") {
    val got = rows(Queries.q4ServiceFrequency(t, ServiceFilter.WholeWeek),
      "route_long_name", "total_daily_trips", "hourly_profile")
    assert(got.head == Seq("KING", 5L, "8:1 | 9:1 | 10:1 | 11:1 | 14:1"))
  }

  test("headways: hand-computed gaps per route on the micro-feed") {
    // service-1 departures — R1/KING: A {8:00,9:00,14:00}, HUB {8:05,9:06},
    // B {8:10,9:12,14:20}; R2/QUEEN: HUB {12:00,13:00}; R3: single trip (no gap)
    val got = rows(Queries.headways(t),
      "route_id", "n_gaps", "avg_headway_s", "min_headway_s", "max_headway_s")
    assert(got == Seq(
      Seq("R1", 5L, (3600 + 18000 + 3660 + 3720 + 18480) / 5.0, 3600L, 18480L),
      Seq("R2", 1L, 3600.0, 3600L, 3600L)))
  }

  test("reachability: BFS hop labels on the micro-feed, isolated stop excluded") {
    // from A: ride R1 to {A,HUB,B}; transfer at HUB to R2/R3 for {C,D};
    // E has no service at all -> absent
    val got = rows(Queries.reachability(t, "A"), "stop_id", "min_rides")
    assert(got == Seq(
      Seq("A", 0), Seq("B", 1), Seq("C", 2), Seq("D", 2), Seq("HUB", 1)))
  }

  test("reachability fixpoint generalizes: k=1 horizon, k=3 saturates") {
    // k=1: only the first ride's stops, no transfers
    val k1 = rows(Queries.reachability(t, "A", maxRides = 1), "stop_id", "min_rides")
    assert(k1 == Seq(Seq("A", 0), Seq("B", 1), Seq("HUB", 1)))
    // the micro-feed is fully reached within 2 rides, so a deeper horizon
    // must change nothing (labels are MIN-folded, settled stops never relabel)
    val k2 = rows(Queries.reachability(t, "A", maxRides = 2), "stop_id", "min_rides")
    val k3 = rows(Queries.reachability(t, "A", maxRides = 3), "stop_id", "min_rides")
    assert(k3 == k2)
  }

  test("stop pairs: hand-counted direct connections, deterministic tie order") {
    // all services: A->HUB on T1-T4; A->B on T1,T2,T8; HUB->B on T1,T2;
    // HUB->C on T5,T6; HUB->D on T7
    val got = rows(Queries.stopPairsDirect(t),
      "from_stop", "to_stop", "n_direct_trips")
    assert(got == Seq(
      Seq("A", "HUB", 4L), Seq("A", "B", 3L), Seq("HUB", "B", 2L),
      Seq("HUB", "C", 2L), Seq("HUB", "D", 1L)))
  }

  test("Q4 nested map: real {service → {hour → trips}} column, canonical JSON") {
    import org.apache.spark.sql.types.{MapType, StringType}
    val df = Queries.q4NestedMap(t)
    val mt = df.schema("by_service").dataType.asInstanceOf[MapType]
    assert(mt.keyType == StringType && mt.valueType.isInstanceOf[MapType])
    val r1 = df.filter(org.apache.spark.sql.functions.col("route_id") === "R1")
      .collect()(0)
    val m = r1.getAs[Map[String, Map[Long, Long]]]("by_service")
    // weekday trips T1/T2/T8 at hours 8/9/14, Saturday T3 at 10, Sunday T4 at 11
    assert(m("1") == Map(8L -> 1L, 9L -> 1L, 14L -> 1L))
    assert(m("2") == Map(10L -> 1L))
    assert(m("3") == Map(11L -> 1L))
    assert(r1.getAs[String]("by_service_json") ==
      """{"1":{"8":1,"9":1,"14":1},"2":{"10":1},"3":{"11":1}}""")
  }

  test("param sanitization mirrors the reference API") {
    assert(ServiceFilter.fromParam(Some("2")) == ServiceFilter.Saturday)
    assert(ServiceFilter.fromParam(Some("4")) == ServiceFilter.WholeWeek)
    assert(ServiceFilter.fromParam(Some("")) == ServiceFilter.WholeWeek)
    assert(ServiceFilter.fromParam(None) == ServiceFilter.WholeWeek)
    assert(Limit.fromParam(Some("all")) == Limit.All)
    assert(Limit.fromParam(Some("50")) == Limit.TopN(50))
    assert(Limit.fromParam(Some("0")) == Limit.TopN(20))
    assert(Limit.fromParam(Some("garbage")) == Limit.TopN(20))
    assert(Limit.fromParam(None) == Limit.TopN(20))
  }

  test("bunching: counts tie to headways, share/median/cv within their bounds") {
    import org.apache.spark.sql.functions._
    val tt = TransitTables.fromTpch(spark, "/root/testdata/sf0.01")
    val b = Queries.bunching(tt).collect()
    // the gap universe is exactly headways': per-route counts must agree
    val hw = Queries.headways(tt).collect()
      .map(r => r.getAs[Long]("route_id") -> r.getAs[Long]("n_gaps")).toMap
    b.foreach { r =>
      val route = r.getAs[Long]("route_id")
      assert(r.getAs[Long]("n_gaps") == hw(route), s"route $route: gap count")
      val (n, med, bn) = (r.getAs[Long]("n_gaps"), r.getAs[Long]("med_gap"),
        r.getAs[Long]("n_bunched"))
      assert(med >= 0 && bn <= n)
      // under half the MEDIAN, so bunched gaps are a strict minority side:
      // at most floor((n-1)/2) values sit strictly below the lower median
      assert(bn <= (n - 1) / 2 + 1, s"route $route: $bn bunched of $n")
      val share = r.getAs[Double]("bunch_share")
      assert(share >= 0.0 && share <= 1.0)
      assert(math.abs(share - bn.toDouble / n) < 1e-6)
      val cv = r.getAs[Double]("cv")
      // CV of n non-negative values is bounded by sqrt(n-1)
      assert(cv >= 0.0 && cv * cv <= n - 1 + 1e-9, s"route $route: cv=$cv")
    }
    assert(b.exists(_.getAs[Long]("n_bunched") > 0),
      "fixture should exhibit bunched headways")
  }

  test("core layers: peel reaches its fixpoint inside the horizon; census is total") {
    val tt = TransitTables.fromTpch(spark, "/root/testdata/sf0.01")
    val at6 = Queries.coreLayers(tt, 6).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val at7 = Queries.coreLayers(tt, 7).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // one extra round changes nothing → round 6 already was the fixpoint
    assert(at6 == at7)
    assert(at6.values.sum == 500L, "every stop lands in exactly one layer")
    assert(at6.keys.count(_ > 0) >= 2, "peeling must cascade over ≥2 rounds")
  }

  test("trip patterns: exact ordered-sequence grouping, per-route rank, cross-route fp") {
    val got = Queries.tripPatterns(t).collect()
      .map(r => (r.getAs[String]("route_id"), r.getAs[Int]("pattern_rank"),
        r.getAs[String]("pattern_fp"), r.getAs[Long]("n_trips"),
        r.getAs[Long]("n_stops"), r.getAs[String]("first_stop"),
        r.getAs[String]("last_stop")))
    // R1: T1,T2 share A>HUB>B; T3,T4 share A>HUB; T8 alone on A>B —
    // the two 2-trip patterns take ranks 1–2, the singleton rank 3
    val r1 = got.filter(_._1 == "R1")
    assert(r1.length == 3)
    assert(r1.filter(_._4 == 2L).map(p => (p._5, p._6, p._7)).toSet ==
      Set((3L, "A", "B"), (2L, "A", "HUB")))
    assert(r1.filter(_._4 == 2L).map(_._2).toSet == Set(1, 2))
    assert(r1.find(_._2 == 3).map(p => (p._4, p._5, p._6, p._7)) ==
      Some((1L, 2L, "A", "B")))
    // R2: HUB>C (T6) and HUB>D (T7), one trip each
    val r2 = got.filter(_._1 == "R2")
    assert(r2.map(p => (p._4, p._6, p._7)).toSet ==
      Set((1L, "HUB", "C"), (1L, "HUB", "D")))
    // R3's single pattern (T5: HUB>C) has the SAME fingerprint as R2's
    // HUB>C — the fp is a pure function of the stop sequence, patterns
    // are per-route rows
    val r3 = got.filter(_._1 == "R3")
    assert(r3.length == 1 && r3.head._4 == 1L)
    assert(r2.exists(p => p._7 == "C" && p._3 == r3.head._3))
  }
}
