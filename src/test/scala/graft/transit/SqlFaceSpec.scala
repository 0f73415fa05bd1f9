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

  // The one-dir-per-session contract (VERDICT r13 ask #4), previously
  // documented-only: register records the dirs a bundle's file scans read
  // and throws on a rebind to a DIFFERENT dir in the same session.
  test("register throws on a second data dir in one session; newSession() escapes") {
    val s1 = spark.newSession() // session under test: don't bind the shared one
    SqlFace.register(TransitTables.fromTpch(s1, dir))
    // same dir again: idempotent, no throw
    SqlFace.register(TransitTables.fromTpch(s1, dir))
    val other = "/root/testdata/sf0.01"
    val ex = intercept[IllegalStateException] {
      SqlFace.register(TransitTables.fromTpch(s1, other))
    }
    assert(ex.getMessage.contains("newSession"), "error must name the escape hatch")
    assert(ex.getMessage.contains("sf0.01") && ex.getMessage.contains("sf0.001"),
      "error must name both dirs")
    // the escape hatch: a fresh session binds the second dir cleanly and
    // the SQL face runs against it
    val s2 = s1.newSession()
    val t2 = TransitTables.fromTpch(s2, other)
    assert(SqlFace.q1Weekday(s2, t2).limit(1).count() == 1)
  }

  test("sessionFor caches one child per (parent, dir) and isolates dirs") {
    val parent = spark.newSession()
    val a1 = SqlFace.sessionFor(parent, dir)
    val a2 = SqlFace.sessionFor(parent, dir)
    val b = SqlFace.sessionFor(parent, "/root/testdata/sf0.01")
    assert(a1 eq a2, "same (parent, dir) must reuse the child session")
    assert(!(a1 eq b) && !(a1 eq parent) && !(b eq parent))
    // the child plans like the parent: post-builder runtime conf copied
    parent.conf.set("spark.sql.shuffle.partitions", "7")
    val c = SqlFace.sessionFor(parent, "/root/testdata/sf0.1")
    assert(c.conf.get("spark.sql.shuffle.partitions") == "7")
  }

  test("the SQL-running session must own the bundle's frames") {
    val s1 = spark.newSession()
    val t = TransitTables.fromTpch(s1, dir)
    intercept[IllegalArgumentException] {
      SqlFace.q1Weekday(spark, t) // parent runs SQL, child owns frames
    }
  }
}
