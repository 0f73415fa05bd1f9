package graft.transit

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** GTFS-shaped tables for the transit engine.
  *
  * The engine proper (`Views`, `Queries`, `Timetable`) operates on this
  * bundle and is storage-agnostic: feed it real GTFS CSVs via
  * `graft.sources.GtfsReader`, or the deterministic derivation from the
  * driver's TPC-H-ish parquet via [[TransitTables.fromTpch]].
  *
  * Schema follows the reference DDL (reference `SQL/transit schema.sql:16-95`):
  * ids are strings-or-ints (we keep the TPC-H longs; semantics unaffected),
  * GTFS times are **seconds-since-midnight ints that may exceed 86400**
  * (0–28+h, reference `SQL/Q4 Create View.sql:2`) — never TimestampType.
  */
final case class TransitTables(
    stopTimes: DataFrame, // trip_id, stop_id, stop_sequence, dep_secs, arr_secs, shape_dist
    trips: DataFrame,     // trip_id, route_id, service_id, trip_headsign, direction_id
    stops: DataFrame,     // stop_id, stop_name, stop_code, stop_lat, stop_lon
    routes: DataFrame)    // route_id, route_long_name, route_short_name

object TransitTables {

  /** Deterministic GTFS derivation from the TPC-H-ish test tables.
    *
    * Every expression here is pure integer/double arithmetic so the DuckDB
    * oracle ([[sqlPrelude]]) reproduces it bit-for-bit. Mapping:
    *  - lineitem → stop_times (l_orderkey=trip, l_partkey%500=stop — the
    *    modulus creates hub-stop skew like the reference's busiest stops),
    *  - orders → trips (o_orderkey%3+1 = service_id ∈ {'1','2','3'}),
    *  - stops/routes are key-derived dims (names functionally dependent on
    *    the id, so join+group-by-name semantics are exercised losslessly).
    */
  def fromTpch(spark: SparkSession, sfDir: String): TransitTables = {
    import graft.sources.Tables
    val li = Tables.lineitem(spark, sfDir)
    val ord = Tables.orders(spark, sfDir)

    val depSecs = (col("l_suppkey") * 97L + col("l_linenumber") * 601L) % 100000L
    val stopTimes = li.select(
      col("l_orderkey").as("trip_id"),
      (col("l_partkey") % 500L).as("stop_id"),
      col("l_linenumber").as("stop_sequence"),
      depSecs.as("dep_secs"),
      (depSecs + col("l_partkey") % 240L + 61L).as("arr_secs"),
      col("l_extendedprice").as("shape_dist"))

    val trips = ord.select(
      col("o_orderkey").as("trip_id"),
      (col("o_custkey") % 100L).as("route_id"),
      (col("o_orderkey") % 3L + 1L).cast("string").as("service_id"),
      col("o_orderpriority").as("trip_headsign"),
      (col("o_orderkey") % 2L).cast("int").as("direction_id"))

    val stops = li.select((col("l_partkey") % 500L).as("stop_id")).distinct().select(
      col("stop_id"),
      concat(lit("STOP_"), col("stop_id").cast("string")).as("stop_name"),
      when(col("stop_id") % 10L === 0L, lit(null).cast("string"))
        .otherwise(concat(lit("SC"), col("stop_id").cast("string"))).as("stop_code"),
      (lit(43.0) + col("stop_id") * 0.01).as("stop_lat"),
      (lit(-79.0) - col("stop_id") * 0.01).as("stop_lon"))

    val routes = ord.select((col("o_custkey") % 100L).as("route_id")).distinct().select(
      col("route_id"),
      concat(lit("ROUTE_"), col("route_id").cast("string")).as("route_long_name"),
      when(col("route_id") % 17L === 0L, lit(null).cast("string"))
        .otherwise(col("route_id").cast("string")).as("route_short_name"))

    TransitTables(stopTimes, trips, stops, routes)
  }

  /** DuckDB CTE prelude mirroring [[fromTpch]] expression-for-expression.
    * Prepended to every transit oracle query. */
  val sqlPrelude: String =
    """WITH stop_times AS (
      |  SELECT l_orderkey AS trip_id,
      |         l_partkey % 500 AS stop_id,
      |         l_linenumber AS stop_sequence,
      |         (l_suppkey * 97 + l_linenumber * 601) % 100000 AS dep_secs,
      |         (l_suppkey * 97 + l_linenumber * 601) % 100000 + l_partkey % 240 + 61 AS arr_secs,
      |         l_extendedprice AS shape_dist
      |  FROM lineitem),
      |trips AS (
      |  SELECT o_orderkey AS trip_id,
      |         o_custkey % 100 AS route_id,
      |         CAST(o_orderkey % 3 + 1 AS VARCHAR) AS service_id,
      |         o_orderpriority AS trip_headsign,
      |         CAST(o_orderkey % 2 AS INT) AS direction_id
      |  FROM orders),
      |stops AS (
      |  SELECT stop_id,
      |         'STOP_' || CAST(stop_id AS VARCHAR) AS stop_name,
      |         CASE WHEN stop_id % 10 = 0 THEN NULL
      |              ELSE 'SC' || CAST(stop_id AS VARCHAR) END AS stop_code,
      |         43.0 + stop_id * 0.01 AS stop_lat,
      |         -79.0 - stop_id * 0.01 AS stop_lon
      |  FROM (SELECT DISTINCT l_partkey % 500 AS stop_id FROM lineitem)),
      |routes AS (
      |  SELECT route_id,
      |         'ROUTE_' || CAST(route_id AS VARCHAR) AS route_long_name,
      |         CASE WHEN route_id % 17 = 0 THEN NULL
      |              ELSE CAST(route_id AS VARCHAR) END AS route_short_name
      |  FROM (SELECT DISTINCT o_custkey % 100 AS route_id FROM orders))
      |""".stripMargin
}
