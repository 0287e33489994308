package graft

/** Guards the correctness-gate registry: every query either has a DuckDB
  * oracle or is on the explicit rows-only allowlist; no orphan oracles;
  * bench names resolve.
  */
class RegistrySpec extends SparkSpec {

  /** Queries deliberately without an oracle (engine-specific sketches). */
  private val rowsOnly = Set("q18_approx_distinct")

  test("every query has an oracle or a documented rows-only exemption") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  test("no orphan oracles") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without query: $orphans")
  }

  test("bench names resolve to queries") {
    val bad = SparkEntry.benchQueries.toSet -- SparkEntry.queries.keySet
    assert(bad.isEmpty, s"bench names not in queries: $bad")
    assert(SparkEntry.benchQueries.distinct.size == SparkEntry.benchQueries.size)
  }

  test("flagship entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
