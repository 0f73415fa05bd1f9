package graft.transit

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

/** Typed result rows (SURVEY §3.1: the API layer consumes
  * `Dataset[CaseClass]` per endpoint, serialization handled by the case
  * classes — no hand-rolled JSON-safe conversion layer like the
  * reference's numpy→native shim at `SQL/app.py:35-56`). */
final case class Q1Row(
    stop_id: Long, stop_code: Option[String], stop_name: String,
    stop_lat: Double, stop_lon: Double,
    total_trip_events: Long, num_unique_routes: Long)

final case class Q2RouteStats(
    route_id: Long, route_long_name: String, route_short_name: Option[String],
    num_trips: Long, avg_trip_distance_km: Double, avg_duration_min: Double,
    duration_stddev_min: Option[Double], avg_speed_kmh: Double)

final case class Q3Row(
    stop_id: Long, stop_name: String, stop_lat: Double, stop_lon: Double,
    num_unique_routes: Long)

final case class Q4Route(
    route_id: Long, route_long_name: String, route_short_name: Option[String],
    total_daily_trips: Long, hourly_profile: String)

/** Typed faces over the DataFrame plans in [[Queries]] — same Catalyst
  * plans (as[] only changes the deserializer at the boundary), so the
  * oracle checks on the untyped faces cover these too. */
object TypedQueries {

  private implicit val q1Enc: Encoder[Q1Row] = Encoders.product[Q1Row]
  private implicit val q2Enc: Encoder[Q2RouteStats] = Encoders.product[Q2RouteStats]
  private implicit val q3Enc: Encoder[Q3Row] = Encoders.product[Q3Row]
  private implicit val q4Enc: Encoder[Q4Route] = Encoders.product[Q4Route]

  def q1(t: TransitTables, service: ServiceFilter,
      limit: Limit = Limit.default): Dataset[Q1Row] =
    Queries.q1BusiestStops(t, service, limit).as[Q1Row]

  def q2(t: TransitTables, service: ServiceFilter,
      limit: Limit = Limit.default): Dataset[Q2RouteStats] =
    Queries.q2RouteStats(t, service, limit).as[Q2RouteStats]

  def q3(t: TransitTables, service: ServiceFilter,
      limit: Limit = Limit.default): Dataset[Q3Row] =
    Queries.q3TransferPoints(t, service, limit).as[Q3Row]

  def q4(t: TransitTables, service: ServiceFilter,
      limit: Limit = Limit.default): Dataset[Q4Route] =
    Queries.q4ServiceFrequency(t, service, limit).as[Q4Route]
}
