package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver-contract shape of the registry itself (no Spark session —
  * pure map checks, runs in milliseconds).
  *
  * The driver downgrades any `queries` entry without a matching
  * `oracleSql` entry to a rows-only check — a silent correctness-coverage
  * loss if a refactor drops or renames one side. The registry has been
  * 1:1 (every query DuckDB-verified) since r10; pin it.
  *
  * The size pin works both directions: a drop loses a certified operator,
  * and growth is only intentional when it closes a named gap (the r12
  * verdict's "hold the registry at 296") — either way the change should
  * be deliberate enough to update this number alongside SURVEY §2.
  */
class RegistryContractSpec extends AnyFunSuite {

  test("every registered query has a DuckDB oracle, and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty,
      s"queries without an oracle (driver would downgrade to rows-only): ${(q -- o).toSeq.sorted.mkString(", ")}")
    assert((o -- q).isEmpty,
      s"oracles without a query (dead SQL the driver never runs): ${(o -- q).toSeq.sorted.mkString(", ")}")
  }

  test("registry holds at 296 certified faces") {
    assert(SparkEntry.queries.size == 296,
      s"registry size moved to ${SparkEntry.queries.size} — update this pin " +
        "and SURVEY §2 together if the change is deliberate")
  }

  test("no oracle is blank and every oracle reads at least one table") {
    val bad = SparkEntry.oracleSql.filter { case (_, sql) =>
      sql.trim.isEmpty || !sql.toLowerCase.contains("from")
    }
    assert(bad.isEmpty, s"degenerate oracle SQL: ${bad.keys.toSeq.sorted.mkString(", ")}")
  }
}
