package graft

import org.apache.spark.sql.functions._
import graft.sources.JdbcStore
import graft.transit.{Queries, ServiceFilter, TransitTables}

/** S2's optional live-JDBC parity path (embedded Derby): the landed bundle
  * must read back bit-exact, the fact scan must be partitioned (the one
  * non-splittable source here), and the engine's predicates must push into
  * the database query. */
class JdbcStoreSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private lazy val jdbc = JdbcStore.landAndRead(spark, sf)
  private lazy val sliced = {
    val t = TransitTables.fromTpch(spark, sf)
    TransitTables(
      t.stopTimes.filter(col("trip_id") % JdbcStore.SliceMod === 0L),
      t.trips.filter(col("trip_id") % JdbcStore.SliceMod === 0L),
      t.stops, t.routes)
  }

  test("fact read-back fans out across stride partitions") {
    assert(jdbc.stopTimes.rdd.getNumPartitions === JdbcStore.FactPartitions)
  }

  test("landed bundle reads back bit-exact vs the sliced parquet derivation") {
    // exceptAll both ways = multiset equality, NULL-safe
    assert(jdbc.stopTimes.exceptAll(sliced.stopTimes).isEmpty &&
      sliced.stopTimes.exceptAll(jdbc.stopTimes).isEmpty)
    assert(jdbc.trips.exceptAll(sliced.trips).isEmpty &&
      sliced.trips.exceptAll(jdbc.trips).isEmpty)
    assert(jdbc.stops.exceptAll(sliced.stops).isEmpty &&
      sliced.stops.exceptAll(jdbc.stops).isEmpty)
    assert(jdbc.routes.exceptAll(sliced.routes).isEmpty &&
      sliced.routes.exceptAll(jdbc.routes).isEmpty)
  }

  test("equality predicates push down into the database scan") {
    val filtered = jdbc.trips.filter(col("service_id") === "1")
    val p = filtered.queryExecution.executedPlan.toString
    // JDBCRelation renders pushed predicates as PushedFilters on the scan;
    // without VARCHAR columns (CLOB default) Derby would reject this `=`
    assert(p.contains("PushedFilters") && p.contains("service_id"),
      s"service filter did not reach the JDBC scan:\n${p.take(800)}")
    assert(filtered.count() > 0)
  }

  test("Q1 over the JDBC bundle matches Q1 over the sliced parquet bundle") {
    val viaJdbc = Queries.q1BusiestStops(jdbc, ServiceFilter.Weekday).collect()
    val direct = Queries.q1BusiestStops(sliced, ServiceFilter.Weekday).collect()
    assert(viaJdbc.toSeq === direct.toSeq)
  }
}
