package graft

/** Every SparkEntry query runs at sf0.001 and yields rows with the
  * declared deterministic ordering intact. (Value-level correctness
  * is the driver's DuckDB oracle — tools/check.py locally.) */
class QueriesSpec extends SparkSpec {

  test("entry() flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has oracle SQL — no rows-only keys remain") {
    // the rows-only whitelist emptied in round 11: qa01/qa02 were
    // re-expressed on the engine's own oracle-gated sketches
    // (d02_production left in round 9 via md5-prefix term ids)
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty, s"queries without oracle SQL: $noOracle")
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs and returns rows at sf0.001") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("q01 is stable across runs (deterministic plan)") {
    val a = SparkEntry.queries("q01_pricing_summary")(spark, sf).collect()
    val b = SparkEntry.queries("q01_pricing_summary")(spark, sf).collect()
    assert(a.sameElements(b))
  }
}
