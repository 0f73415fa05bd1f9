package graft.transit

import graft.SparkSpec

/** The SQL-text face must be row-for-row identical to the DataFrame face —
  * they are two parses of the same declarative semantics. */
class SqlFaceSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("spark.sql Q1 text equals the DataFrame Q1 plan") {
    val t = TransitTables.fromTpch(spark, dir)
    val sql = SqlFace.q1Weekday(spark, t).collect().toSeq
    val df = Queries.q1BusiestStops(t, ServiceFilter.Weekday).collect().toSeq
    assert(sql == df)
  }

  test("spark.sql Q4 text equals the DataFrame Q4 plan") {
    val t = TransitTables.fromTpch(spark, dir)
    val sql = SqlFace.q4Weekday(spark, t).collect().toSeq
    val df = Queries.q4ServiceFrequency(t, ServiceFilter.Weekday).collect().toSeq
    assert(sql == df)
  }
}
