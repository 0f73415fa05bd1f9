package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** The native merge-scan as-of join: edge semantics on a constructed
  * fixture, equivalence with both the window-composed face and (via the
  * driver) the DuckDB ASOF oracle, and the physical plan shape. */
class AsOfJoinSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  // left: (key, lid, t) — right: (rkey, rid, rt)
  private lazy val left = Seq(
    ("u1", 1L, 100L), // exact-tie timestamp with a view at 100 (inclusive)
    ("u1", 2L, 50L),  // before every view -> null
    ("u1", 3L, 250L), // picks the latest of several (200)
    ("u2", 4L, 10L),  // key with no right rows at all -> null
    (null.asInstanceOf[String], 5L, 10L) // null key never matches
  ).toDF("key", "lid", "t")

  private lazy val right = Seq(
    ("u1", 10L, 100L), ("u1", 11L, 150L), ("u1", 12L, 200L),
    ("u3", 13L, 5L), // key only on the right: ignored
    ("u1", 14L, 9999L) // after every click: never consumed into a match
  ).toDF("rkey", "rid", "rt")

  private lazy val joined = AsOfJoin.backward(left, right,
    Seq(left("key")), Seq(right("rkey")), left("t"), right("rt"))

  test("backward-inclusive semantics incl. nulls, ties, missing keys") {
    val got = joined.select($"lid", $"rid", $"rt")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getLong(1))).toSet
    assert(got == Set(
      (1L, 10L),  // t=100 matches rt=100 inclusively
      (2L, null), // nothing at or before 50
      (3L, 12L),  // latest of {100,150,200} <= 250
      (4L, null), // no u2 on the right
      (5L, null)  // null key
    ))
  }

  test("physical plan is the custom exec over sorted, clustered children") {
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"missing AsOfJoinExec:\n$plan")
    assert(plan.contains("Sort"), s"children must be (key, time)-sorted:\n$plan")
  }

  test("operator ≡ window-composed face on real events (sf0.001 and sf0.01)") {
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val native = graft.relational.RelationalQueries.asofJoinNative(spark, sf)
      val windowed = graft.relational.RelationalQueries.asofJoin(spark, sf)
      assert(native.columns.toSeq == windowed.columns.toSeq)
      assert(native.exceptAll(windowed).isEmpty &&
        windowed.exceptAll(native).isEmpty, s"mismatch at $sf")
    }
  }

  test("left rows with null time get no match") {
    val l = Seq(("u1", 1L, Some(100L)), ("u1", 2L, None))
      .toDF("key", "lid", "t")
    val got = AsOfJoin.backward(l, right,
        Seq(l("key")), Seq(right("rkey")), l("t"), right("rt"))
      .select($"lid", $"rid").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (2L, null)))
  }
}
