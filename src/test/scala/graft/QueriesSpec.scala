package graft

/** Every SparkEntry query runs at sf0.001 and yields rows with the
  * declared deterministic ordering intact. (Value-level correctness
  * is the driver's DuckDB oracle — tools/check.py locally.) */
class QueriesSpec extends SparkSpec {

  test("entry() flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle or is documented rows-only") {
    // qa01/qa02: sketch internals have no cross-engine oracle (qa02
    // is drift-bounded against the exact q31 in Analytics3Spec);
    // d02_production: xxhash64 ids are Spark-specific (the banding
    // math is oracle-checked via d02_minhash_lsh, the pipeline via
    // NearDupStreamSpec)
    val rowsOnly = Set("qa01_approx_sketches", "qa02_approx_robust",
      "d02_production")
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
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
