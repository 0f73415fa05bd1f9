package graft.transit

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.Writers

/** Serving layer (SURVEY §4 R3/R4) — the engine analog of the reference's
  * two result-reuse mechanisms:
  *
  *  - **R3, materialized view reuse**: the reference auto-creates
  *    `vw_hourly_frequency` once and serves every Q4 variant from it
  *    (`SQL/sql_utils.py:46-70`, `SQL/Q4 Create View.sql:3-14`). Here
  *    [[hourlyFrequencyView]] is the cached hourly aggregate; both Q4
  *    faces and BOTH sub-aggregations of the nested face read the cache
  *    (`InMemoryTableScan`) instead of re-scanning the fact table.
  *  - **R4, result-snapshot fast path**: the reference pre-computes one
  *    CSV per query holding the UNLIMITED per-service rows ('1','2','3')
  *    plus the whole-week '4' rows, and the API serves by slicing that
  *    file when it exists, falling back to live SQL otherwise
  *    (`SQL/generate_csv.py:17-125`, `SQL/app.py:61-89`,
  *    `SQL/csv_backend.py:42-58`). Here [[QueryService.buildAnalyticsSnapshots]]
  *    writes the same superset as parquet PARTITIONED BY the service tag —
  *    so a served request reads exactly one partition (partition pruning,
  *    not a file-wide scan) — and [[q1]]/[[q2]]/[[q3]]/[[q4]] dispatch
  *    snapshot-first with the live plan as fallback.
  *
  * At 100 TB the snapshot is the only sane serving path: the live plans
  * scan the fact table, the snapshots are a few thousand pre-aggregated
  * rows keyed by the request's service filter.
  */
final class QueryService(val t: TransitTables, snapshotDir: Option[String] = None,
    cacheSnapshots: Boolean = false) {
  import QueryService._

  private val spark = t.stopTimes.sparkSession

  /** Resident-process mode ([[graft.tools.ServeDaemon]]): each snapshot
    * table is read ONCE and pinned in executor memory, so a request is a
    * filter+sort+limit over an `InMemoryTableScan` — no per-request
    * parquet footer reads. Off by default: one-shot callers (Verify's
    * snapshot round trips) measure the real read-back path. */
  private val snapCache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  /** R3: the cached `vw_hourly_frequency` analog. Spark caching is lazy —
    * the first Q4 call materializes it; every later call (and the second
    * sub-aggregation inside the same nested plan) hits the cache. */
  lazy val hourlyFrequencyView: DataFrame = Queries.hourlyFrequency(t).cache()

  private def snapshot(name: String): Option[DataFrame] =
    snapshotDir
      .map(d => s"$d/$name")
      // local-FS existence probe mirrors the reference's `_has_csv`; on a
      // cluster this becomes a Hadoop FileSystem.exists against the store
      .filter(p => new java.io.File(p).exists)
      .map { p =>
        if (cacheSnapshots)
          snapCache.computeIfAbsent(name, _ => spark.read.parquet(p).cache())
        else spark.read.parquet(p)
      }

  /** Snapshot slice: prune to the requested service partition, restore the
    * query's canonical presentation (column order, sort, limit). */
  private def slice(df: DataFrame, service: ServiceFilter, cols: Seq[String],
      sort: Seq[org.apache.spark.sql.Column], limit: Limit): DataFrame =
    df.filter(col(TAG).cast("string") === serviceTag(service))
      .select(cols.map(col): _*)
      .orderBy(sort: _*)
      .transform(limit.apply)

  def q1(service: ServiceFilter, limit: Limit = Limit.default): DataFrame =
    snapshot(Q1).map(slice(_, service,
        Seq("stop_id", "stop_code", "stop_name", "stop_lat", "stop_lon",
          "total_trip_events", "num_unique_routes"),
        Seq(col("total_trip_events").desc, col("stop_id")), limit))
      .getOrElse(Queries.q1BusiestStops(t, service, limit))

  def q2(service: ServiceFilter, limit: Limit = Limit.default): DataFrame =
    snapshot(Q2).map(slice(_, service,
        Seq("route_id", "route_long_name", "route_short_name", "num_trips",
          "avg_trip_distance_km", "avg_duration_min", "duration_stddev_min",
          "avg_speed_kmh"),
        Seq(col("avg_duration_min").desc, col("route_id")), limit))
      .getOrElse(Queries.q2RouteStats(t, service, limit))

  def q3(service: ServiceFilter, limit: Limit = Limit.default): DataFrame =
    snapshot(Q3).map(slice(_, service,
        Seq("stop_id", "stop_name", "stop_lat", "stop_lon", "num_unique_routes"),
        Seq(col("num_unique_routes").desc, col("stop_id")), limit))
      .getOrElse(Queries.q3TransferPoints(t, service, limit))

  def q4(service: ServiceFilter, limit: Limit = Limit.default): DataFrame =
    snapshot(Q4).map(slice(_, service,
        Seq("route_id", "route_long_name", "route_short_name",
          "total_daily_trips", "hourly_profile"),
        Seq(col("total_daily_trips").desc, col("route_id")), limit))
      .getOrElse(
        Queries.q4ServiceFrequencyFrom(hourlyFrequencyView, t.routes, service, limit))

  /** The nested Q4 response face always serves live off the cached view
    * (the reference has no CSV for it either — `SQL/app.py:118-125`). */
  def q4Nested(limit: Limit = Limit.default): DataFrame =
    Queries.q4NestedFrom(hourlyFrequencyView, t.routes, limit)
}

object QueryService {

  /** F6, the 2-dp DISPLAY rounding: the reference serializes Q2's metric
    * columns through `float(f"{v:.2f}")` (`SQL/sql_utils.py:172-175`,
    * `SQL/csv_backend.py:96-100`) — round-half-even on the EXACT binary
    * double. Neither Spark built-in matches: `round` is HALF_UP, and both
    * `round`/`bround` operate on the shortest-decimal rendering
    * (bround(2.675, 2) = 2.68 where CPython gives 2.67), so this is the
    * native [[graft.functions.PyRoundExpr]]. Applied at the serialization
    * edge only; engine/oracle forms stay 4-dp (re-rounding a 4-dp value
    * can differ from rounding the raw value only within 5e-5 of a .005
    * boundary — inherent double-rounding, the reference's CSV path carries
    * the same caveat). */
  def round2(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df)((d, c) =>
      d.withColumn(c, graft.functions.GraftFunctions.pyRound(d.sparkSession, col(c), 2)))

  /** Q2's serialization face: the four metric columns the reference runs
    * through `_round2`. */
  def q2Display(df: DataFrame): DataFrame =
    round2(df, Seq("avg_trip_distance_km", "avg_duration_min",
      "duration_stddev_min", "avg_speed_kmh"))

  /** Snapshot partition key: '1'/'2'/'3' per-service, '4' whole-week —
    * the reference's service_id sentinel encoding (`SQL/csv_backend.py:44`). */
  private val TAG = "service_id_tag"
  val Q1 = "q1_busiest_stops"
  val Q2 = "q2_avg_duration_speed"
  val Q3 = "q3_transfer_points"
  val Q4 = "q4_service_frequency"

  private def serviceTag(s: ServiceFilter): String = s.sid.getOrElse("4")

  /** One tagged superset frame per query: per-service rows ('1'/'2'/'3')
    * plus the whole-week '4' rows, UNLIMITED — serving slices later,
    * exactly like `SQL/generate_csv.py` concatenating the four frames.
    * Whole-week is its own DERIVATION because its semantics are not a
    * rollup of the per-service ROWS (trichotomy per SURVEY §1.5) — but
    * all four tags ARE exact re-aggregations of one per-service base
    * frame, so the build is ONE linear pipeline (r16, guide §1.2/§2.4):
    * each base row explodes into (its own service tag, '4') and a single
    * grouped pass per level computes every tag's aggregate. The shapes
    * this replaces, both measured worse:
    *  - the r15 per-tag union re-planned AND re-scanned the fact table
    *    once per tag (24 parquet scans / 24–29 exchanges in the before
    *    plans) because each tag's filter sits below its own aggregation;
    *  - filtering a shared base per tag does NOT fix that — the tag
    *    filter is on the base's GROUP KEY, so Catalyst pushes it through
    *    the aggregate back into four separate fact scans (verified in the
    *    executed AQE plan: only the dim broadcast was reused);
    *  - an eager `localCheckpoint` on the base does force one scan, but
    *    the materialization barrier serializes the build and cost ~+0.5 s
    *    per face at sf0.1 vs the union it replaced.
    * Exploding the TAG as data instead of encoding it as plan structure
    * gives the one fact scan without a barrier, and the explode sits
    * above the base aggregation so it multiplies ~50 k aggregated rows,
    * not the fact table. Values are identical to the per-tag plans':
    * per-service tags aggregate single-row groups (integer sums are
    * exact; doubles pass through `max` over one row bit-identically),
    * whole-week tags use the live WholeWeek paths' own expressions. The
    * exploded tag domain is exactly {'1','2','3','4'} because
    * `TransitTables.fromTpch` pins service_id = o_orderkey%3+1. Per-tag
    * ORDER is dropped: the write is partitioned parquet (order never
    * survives) and every serve re-sorts its slice ([[slice]]). */
  private def taggedQ1(t: TransitTables): DataFrame = {
    val counts = Queries.q1ServiceStopRouteCounts(t)
      .select(explode(array(col("service_id"), lit("4"))).as(TAG),
        col("stop_id"), col("route_id"), col("c"))
      .groupBy(col(TAG), col("stop_id"), col("route_id"))
      .agg(sum(col("c")).as("c2"))
      .groupBy(col(TAG), col("stop_id"))
      .agg(sum(col("c2")).as("total_trip_events"),
        count(lit(1)).as("num_unique_routes"))
    Queries.q1FromCounts(counts, t.stops, Seq(TAG))
  }

  private def taggedQ2(t: TransitTables): DataFrame = {
    val isWeek = col(TAG) === "4"
    val stats = Queries.q2PerServiceStats(t)
      .select(explode(array(col("service_id"), lit("4"))).as(TAG),
        col("route_id"), col("num_trips"), col("avg_trip_distance_km"),
        col("avg_duration_min"), col("duration_stddev_min"), col("avg_speed_kmh"))
      .groupBy(col(TAG), col("route_id"))
      .agg(
        sum(col("num_trips")).as("num_trips"),
        // whole-week legs: q2WeekWeighted's trip-count-weighted means,
        // expression-for-expression
        (sum(col("avg_trip_distance_km") * col("num_trips")) / sum(col("num_trips"))).as("w_km"),
        (sum(col("avg_duration_min") * col("num_trips")) / sum(col("num_trips"))).as("w_dur"),
        (sum(col("avg_speed_kmh") * col("num_trips")) / sum(col("num_trips"))).as("w_speed"),
        // per-service legs: the group holds exactly ONE base row (key was
        // (route_id, service_id)), so max() is a bit-exact pass-through
        max(col("avg_trip_distance_km")).as("p_km"),
        max(col("avg_duration_min")).as("p_dur"),
        max(col("duration_stddev_min")).as("p_sd"),
        max(col("avg_speed_kmh")).as("p_speed"))
      .select(col(TAG), col("route_id"), col("num_trips"),
        when(isWeek, col("w_km")).otherwise(col("p_km")).as("avg_trip_distance_km"),
        when(isWeek, col("w_dur")).otherwise(col("p_dur")).as("avg_duration_min"),
        // whole-week stddev is NULL by spec (reference generate_csv.py)
        when(isWeek, lit(null).cast("double")).otherwise(col("p_sd")).as("duration_stddev_min"),
        when(isWeek, col("w_speed")).otherwise(col("p_speed")).as("avg_speed_kmh"))
    Queries.q2FromStats(stats, t.routes, Seq(TAG))
  }

  private def taggedQ3(t: TransitTables): DataFrame = {
    val counts = Queries.q1ServiceStopRouteCounts(t)
      .select(explode(array(col("service_id"), lit("4"))).as(TAG),
        col("stop_id"), col("route_id"))
      .distinct()
      .groupBy(col(TAG), col("stop_id"))
      .agg(count(col("route_id")).as("num_unique_routes"))
    Queries.q3FromCounts(counts, t.stops, Seq(TAG))
  }

  private def taggedQ4(t: TransitTables): DataFrame = {
    val perHour = Queries.hourlyFrequency(t)
      .select(explode(array(col("service_id"), lit("4"))).as(TAG),
        col("route_id"), col("hour_of_day"), col("trips_per_hour"))
      .groupBy(col(TAG), col("route_id"), col("hour_of_day"))
      .agg(sum(col("trips_per_hour")).as("trips_per_hour"))
    Queries.q4Rollup(perHour, t.routes, Seq(TAG))
  }

  /** The R4 batch job (`SQL/generate_csv.py:main`): materialize all four
    * analytics snapshots, partitioned by the service tag so serving prunes
    * to one partition. Overwrite-mode — rerunnable on feed refresh. */
  def buildAnalyticsSnapshots(t: TransitTables, dir: String): Unit =
    Seq(Q1, Q2, Q3, Q4).foreach(buildSnapshot(t, dir, _))

  /** The tagged frame one snapshot build writes — exposed (package-
    * private) so plan-evidence tooling (`tools.PlanSnap`) can explain the
    * build itself, not just the read-back face. */
  private[graft] def snapshotFrame(t: TransitTables, name: String): DataFrame =
    name match {
      case Q1 => taggedQ1(t)
      case Q2 => taggedQ2(t)
      case Q3 => taggedQ3(t)
      case Q4 => taggedQ4(t)
      case other => throw new IllegalArgumentException(s"no snapshot named $other")
    }

  /** Snapshot build for ONE query — each registered read-back face uses
    * this so its measured cost is one snapshot's ETL, not all four. */
  def buildSnapshot(t: TransitTables, dir: String, name: String): Unit =
    Writers.snapshotParquet(snapshotFrame(t, name), s"$dir/$name", Seq(TAG))

  def buildQ1Snapshot(t: TransitTables, dir: String): Unit =
    buildSnapshot(t, dir, Q1)
}
