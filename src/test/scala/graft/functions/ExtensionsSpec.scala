package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions wiring must make the native functions
  * available through plain SQL with no explicit registration call. */
class ExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions injects graft functions into a fresh session") {
    // force a genuinely new session (getOrCreate would hand back the shared
    // test session, silently skipping extension application)
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    // withExtensions == what `--conf spark.sql.extensions=graft.functions.
    // GraftSparkExtensions` does at submit time; the conf route only applies
    // when the SparkContext itself carries it, which a shared test JVM can't.
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new GraftSparkExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val r = s.sql(
        "SELECT graft_simhash32(array(CAST(5 AS BIGINT))) AS sh, " +
          "graft_dot(array(CAST(1.5 AS FLOAT)), array(CAST(2.0 AS FLOAT))) AS d")
        .collect().head
      assert(r.getLong(0) == 5L) // single hash: its own bits vote positive
      assert(r.getDouble(1) == 3.0)
      // the WHOLE registry must be injected — the extensions class used to
      // hand-copy 7 entries and silently drop the other 10 from SQL-only
      // sessions (graft_pii_scan, the sketch aggs, …); it now iterates
      // GraftFunctions.fns, and this pins every name as resolvable
      for (name <- GraftFunctions.fns.map(_._1))
        assert(s.sessionState.functionRegistry.functionExists(
          org.apache.spark.sql.catalyst.FunctionIdentifier(name)),
          s"$name not injected by GraftSparkExtensions")
      // the whole-operator strategy rides the same wiring: present in the
      // fresh session's planner without any AsOfJoin.enable call
      assert(s.sessionState.planner.strategies
        .contains(graft.plans.AsOfJoinStrategy))
    } finally {
      // restore the shared session for sibling suites (don't stop the
      // context — it's process-wide)
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
