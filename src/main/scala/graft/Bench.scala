package graft


/** Driver-run benchmark: times the headline queries on
  * SPARK_GRAFT_SF_DIR and prints one JSON line. */
object Bench {

  /** Representative mix: scan-agg, fact-fact join, window, sessionize,
    * maillog parse+merge, dedup (exact + LSH), ANN, text stats. */
  val headline: Seq[String] = Seq(
    "q01_pricing_summary", "q03_join_revenue", "q07_window_running",
    "q09_sessionize", "m01_parse_logs", "m03_messages",
    "d01_exact_dedup", "d02_minhash_lsh", "d02_production",
    "d05_embedding_neardup", "s01_ann_brute", "t01_token_stats",
    // round 3: stacked partitioned windows + full-outer SMJ diff
    "q32_scd2", "q33_snapshot_diff",
    // round 4: increment-vs-corpus band probe + two-phase LM rank
    "d15_incremental_dedup", "t15_lm_buckets",
    // round 5: content-band bounded fuzzy NN + frozen-corpus span screen
    "d09_production", "d17_incremental_spans")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cores = cpus, appName = "graft-bench")

    // JVM/codegen warm-up outside the timed region
    SparkEntry.queries("q01_pricing_summary")(spark, sfDir).count()

    // contention sentinel: the box's 1-min load average at each pass
    // (VERDICT r4 #3 — BENCH_r04 recorded a 2.08s d02 median that an
    // idle-box re-run read as 0.78s; per-pass loads make a contended
    // median machine-distinguishable from a plan regression)
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    def loadNow(): Double = osBean.getSystemLoadAverage

    def timeOnce(name: String): Option[(Double, Double)] = {
      val fn = SparkEntry.queries(name)
      val ld = loadNow()
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        Some(((System.nanoTime() - t0) / 1e9, ld))
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          None
      }
    }
    // m-queries share the synthesized maillog corpus; materialize it
    // outside the timed region so the bench measures the operator,
    // not the fixture generator
    def prepare(name: String): Unit =
      // every maillog query (m01..m12) shares the synthesized corpus;
      // NOT the mm* multimodal queries
      if (name.startsWith("m") && !name.startsWith("mm"))
        graft.operators.MaillogOps.materializeCorpus(spark, sfDir)
    // median of 3 timed passes after one warm pass (±30% run-to-run
    // variance on this box makes single timings meaningless). A
    // failing query reports -1 (and stderr), never a fake time.
    // Per-pass times (warm pass included, first) are emitted in the
    // artifact so an outlier pass — a cold recompute where the warm
    // cache should have been reused — is visible instead of silently
    // inflating the median (the r3 d02 7.4s-vs-0.8s bimodality).
    val results = headline.map { name =>
      prepare(name)
      val warm = timeOnce(name) // warm this query's codegen/broadcast paths
      val times = Seq(timeOnce(name), timeOnce(name), timeOnce(name)).flatten
      // median of exactly 3 passes; ANY failed pass reports -1 rather
      // than a statistic over the survivors (a min-of-two would let a
      // flaky-slow query masquerade as fast and break cross-round
      // comparability)
      val t = if (times.length < 3) -1.0 else times.map(_._1).sorted.apply(1)
      // operators register self-join inputs in the bounded OpCache;
      // drop them so later queries aren't timed against a polluted
      // block manager
      graft.operators.OpCache.release(spark)
      spark.catalog.clearCache()
      val all = warm.toSeq ++ times
      (name, t, all.map(x => f"${x._1}%.3f"), all.map(x => f"${x._2}%.2f"))
    }
    val qs = results.map { case (k, v, _, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val pp = results.map { case (k, _, ts, _) =>
      "\"" + k + "\":[" + ts.mkString(",") + "]" }.mkString("{", ",", "}")
    // per-pass 1-min load averages, parallel to `passes`
    val lds = results.map { case (k, _, _, ls) =>
      "\"" + k + "\":[" + ls.mkString(",") + "]" }.mkString("{", ",", "}")
    // failures (-1 sentinels) must not shrink the total they failed in
    val errors = results.count(_._2 < 0)
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"passes":$pp,"loads":$lds,"errors":$errors,"sf":"$sfDir"}""")
    spark.stop()
  }
}
