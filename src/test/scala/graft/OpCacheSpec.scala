package graft

import graft.operators.OpCache

/** Release discipline for operator-scoped persists: repeated calls
  * of the self-join operators on one session must not grow
  * block-manager storage (each call used to pin a FRESH cache entry
  * for the session lifetime; Bench/Verify hid it with clearCache()),
  * and an explicit release must return storage to baseline. */
class OpCacheSpec extends SparkSpec {

  private def run(name: String): Unit = {
    SparkEntry.queries(name)(spark, sf).count(); ()
  }

  test("repeated d02/d05/s01 calls reuse entries instead of growing storage") {
    OpCache.release(spark)
    spark.catalog.clearCache()
    for (name <- Seq("d02_minhash_lsh", "d05_embedding_neardup", "s01_ann_brute"))
      run(name)
    val afterFirst = OpCache.liveEntries(spark)
    // compare persisted-RDD ID SETS, not raw counts (round 16: the
    // full-suite run shares one session, and earlier suites' lazy
    // localCheckpoint blocks are released asynchronously by the
    // ContextCleaner — a count can legitimately DROP mid-test; the
    // contract here is only that repeats pin nothing NEW)
    val idsFirst = spark.sparkContext.getRDDStorageInfo.map(_.id).toSet
    for (_ <- 1 to 3;
         name <- Seq("d02_minhash_lsh", "d05_embedding_neardup", "s01_ann_brute"))
      run(name)
    assert(OpCache.liveEntries(spark) == afterFirst,
      "repeat calls must hit existing entries, not register new ones")
    val idsAfter = spark.sparkContext.getRDDStorageInfo.map(_.id).toSet
    assert((idsAfter -- idsFirst).isEmpty,
      s"repeat calls must not pin additional persisted RDDs: ${idsAfter -- idsFirst}")
  }

  test("repeated t07/t08 calls (round-5 OpCache converts) do not grow storage") {
    OpCache.release(spark)
    spark.catalog.clearCache()
    for (name <- Seq("t07_boilerplate", "t08_unigram_lm")) run(name)
    val afterFirst = OpCache.liveEntries(spark)
    val idsFirst = spark.sparkContext.getRDDStorageInfo.map(_.id).toSet
    for (_ <- 1 to 3; name <- Seq("t07_boilerplate", "t08_unigram_lm")) run(name)
    assert(OpCache.liveEntries(spark) == afterFirst,
      "repeat t07/t08 calls must hit existing entries")
    val idsAfter = spark.sparkContext.getRDDStorageInfo.map(_.id).toSet
    assert((idsAfter -- idsFirst).isEmpty,
      s"repeat t07/t08 calls must not pin additional persisted RDDs: ${idsAfter -- idsFirst}")
    OpCache.release(spark)
    assert(OpCache.liveEntries(spark) == 0,
      "release must drop the t07/t08 entries too")
  }

  test("release() returns block-manager storage to baseline") {
    run("d02_minhash_lsh")
    assert(OpCache.liveEntries(spark) > 0, "d02 should register cached inputs")
    OpCache.release(spark)
    assert(OpCache.liveEntries(spark) == 0)
    // unpersist is async (blocking=false); the registry being empty is
    // the contract — rerun still correct, storage re-registers
    run("d02_minhash_lsh")
    assert(OpCache.liveEntries(spark) > 0)
    OpCache.release(spark)
  }

  test("an external clearCache() degrades to recompute, not wrong results") {
    val before = SparkEntry.queries("d02_minhash_lsh")(spark, sf)
      .collect().map(_.toString).toSeq
    spark.catalog.clearCache() // drops the cached blocks behind the registry's back
    val after = SparkEntry.queries("d02_minhash_lsh")(spark, sf)
      .collect().map(_.toString).toSeq
    assert(before == after)
  }

  test("the entry cap evicts least-recently-used entries") {
    OpCache.release(spark)
    // synthetic frames with distinct plans exhaust the cap
    val frames = (0 until OpCache.MaxEntries + 5)
      .map(i => spark.range(100 + i).toDF("n"))
    frames.foreach(f => OpCache.cached(f).count())
    assert(OpCache.liveEntries(spark) == OpCache.MaxEntries,
      "cap must bound live entries")
    OpCache.release(spark)
  }
}
