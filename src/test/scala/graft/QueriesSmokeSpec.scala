package graft

/** Every registered query must run and (for analytic queries that are
  * non-empty by construction at sf0.001) return rows. Value-level
  * correctness is checked against the DuckDB oracle by tools/check.py
  * and the driver's harness.
  */
class QueriesSmokeSpec extends SparkSpec {
  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      df.count() // must execute without error
    }
  }
}
