package graft.relational

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Consistency of the column profiler with directly-computed statistics. */
class ProfileSpec extends AnyFunSuite with SparkSpec {

  test("profile rows agree with direct per-column aggregates") {
    val sf = "/root/testdata/sf0.01"
    val o = graft.sources.Tables.orders(spark, sf)
    val n = o.count()
    val p = RelationalQueries.profile(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p.keySet == Set("o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice"))
    p.values.foreach(r => assert(r.getLong(1) == n))
    // keys: no nulls, orderkey unique
    assert(p("o_orderkey").getLong(2) == 0)
    assert(p("o_orderkey").getLong(3) == n)
    // string column carries no numeric bounds; numeric ones do
    assert(p("o_orderpriority").isNullAt(4) && p("o_orderpriority").isNullAt(5))
    import org.apache.spark.sql.functions._
    val Array(mn, mx) = o.agg(min("o_totalprice"), max("o_totalprice"))
      .collect().map(r => Array(r.getDouble(0), r.getDouble(1))).head
    assert(p("o_totalprice").getDouble(4) == mn)
    assert(p("o_totalprice").getDouble(5) == mx)
  }
}
