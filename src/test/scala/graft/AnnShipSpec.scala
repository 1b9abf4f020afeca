package graft

import graft.functions.TextFns.{qnorm2, quantize}
import graft.operators.{Dedup, Similarity}
import graft.sources.{AnnIndexStore, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Ship/load of the frozen similarity index (VERDICT r8 #3): a
  * deployment freezes cells/codes/codebook once per corpus snapshot;
  * a FRESH session must search the loaded index without rebuilding —
  * and get exactly the in-memory rows — with the corpus-scale
  * candidates⋈codes join planning shuffle-free off the bucketed
  * layout. */
class AnnShipSpec extends SparkSpec {

  private def physical(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }

  private def expanded(p: SparkPlan): Seq[SparkPlan] = {
    val self = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => q.plan
      case x => x
    }
    val nested = self.collect {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => q.plan
    }
    val cached = self.collect {
      case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        s.relation.cachedPlan
    }
    self +: (nested ++ cached).flatMap(expanded)
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("frozen IVFPQ index: write, load in a NEW session, search identically") {
    Similarity.shipIvfpqIndex(spark, sf, "ship_ivfpq", buckets = 4)

    // the in-memory answers, computed before any loaded plan exists
    val wantS13 = rows(Similarity.s13AnnIvfPq(spark, sf))
    val wantS15 = rows(Similarity.s15FilteredIvfPq(spark, sf))
    spark.sharedState.cacheManager.clearCache() // no cross-path cache reuse

    // a FRESH session (own session state; shared catalog — exactly
    // what a new driver process sees through the metastore)
    val s2 = spark.newSession()
    try {
      val gotS13 = Similarity.searchFrozenIvfpq(s2, sf, "ship_ivfpq")
      assert(rows(gotS13) == wantS13,
        "frozen-index s13 search must equal the in-memory rows")
      val gotS15 = Similarity.searchFrozenIvfpq(s2, sf, "ship_ivfpq",
        probeFine = 4, labelFiltered = true)
      assert(rows(gotS15) == wantS15,
        "frozen-index s15 search must equal the in-memory rows")

      // the corpus-scale candidate⋈codes join must NOT shuffle the
      // bucketed codes table: every path from a ShuffleExchange down
      // to the codes scan must pass through a JOIN first — i.e. the
      // codes rows reached their join (and the map-side ADC
      // aggregation) straight off the bucketed scan. Downstream
      // exchanges (the q_id top-k windows over query-sized frames)
      // legitimately contain the scan transitively — they are above
      // the join, which is exactly the allowed shape.
      def codesShuffledRaw(p: SparkPlan): Boolean = p match {
        case _: org.apache.spark.sql.execution.joins.BaseJoinExec => false
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.tableIdentifier.exists(_.table.contains("ship_ivfpq_codes"))
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          codesShuffledRaw(q.plan)
        case a: AdaptiveSparkPlanExec => codesShuffledRaw(a.executedPlan)
        case other => other.children.exists(codesShuffledRaw)
      }
      val search = Similarity.searchFrozenIvfpq(s2, sf, "ship_ivfpq")
      search.collect() // materialize so AQE's final plan is inspectable
      val offenders = expanded(physical(search))
        .flatMap(_.collect { case e: ShuffleExchangeExec => e })
        .filter(e => codesShuffledRaw(e.child))
      assert(offenders.isEmpty,
        "the bucketed codes table must reach its join without a shuffle")
    } finally AnnIndexStore.drop(spark, "ship_ivfpq")
  }

  test("bucketed assign/codes: the ADC-shaped join+aggregate plans exchange-free") {
    Similarity.shipIvfpqIndex(spark, sf, "ship_frag", buckets = 4)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val idx = AnnIndexStore.load(spark, "ship_frag")
      val frag = idx.assign.join(idx.codes, "vec_id")
        .groupBy("vec_id", "m").agg(count(lit(1)).as("n"))
      frag.collect()
      val ex = expanded(physical(frag))
        .flatMap(_.collect { case e: ShuffleExchangeExec => e })
      assert(ex.isEmpty,
        s"bucketed join+agg must not shuffle:\n${physical(frag)}")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      AnnIndexStore.drop(spark, "ship_frag")
    }
  }

  test("shipped refined centroids equal a fresh two-round Lloyd build") {
    Similarity.shipIvfpqIndex(spark, sf, "ship_ref", buckets = 4)
    try {
      val e = Tables.embeddings(spark, sf)
        .select(col("vec_id"), col("label"), quantize(col("embedding")).as("qv"))
        .withColumn("nrm", qnorm2(col("qv")))
      val want = Similarity.refinedCents(e).orderBy("c_id")
      val got = AnnIndexStore.load(spark, "ship_ref").refined.orderBy("c_id")
      assert(got.count() > 0 && got.count() <= 64)
      assert(rows(got) == rows(want),
        "loaded refined centroids must equal the fresh build")
    } finally AnnIndexStore.drop(spark, "ship_ref")
  }

  test("append routes arrivals through the frozen quantizers; post-append search == in-memory union") {
    val basePred = col("vec_id") % 10 < 8
    Similarity.shipIvfpqIndex(spark, sf, "ship_app", buckets = 4,
      corpusPred = basePred)
    try {
      val arrivals = Tables.embeddings(spark, sf).filter(!basePred)
        .select("vec_id", "label", "embedding")
      assert(arrivals.count() > 0)
      Similarity.appendToFrozenIndex(arrivals, "ship_app")

      // expected: the SAME algebra in memory — base-corpus quantizers
      // (frozen at ship time), full-corpus membership
      val eAll = Tables.embeddings(spark, sf)
        .select(col("vec_id"), col("label"), quantize(col("embedding")).as("qv"))
        .withColumn("nrm", qnorm2(col("qv")))
      val eBase = eAll.filter(basePred)
      val (coarse, f2c, assignBase) = Similarity.ivf2Index(eBase)
      val assignUnion = assignBase.select("vec_id", "label", "cell")
        .union(Similarity.assignCells(eAll.filter(!basePred), coarse, f2c)
          .join(eAll.select("vec_id", "label"), "vec_id")
          .select("vec_id", "label", "cell"))
      val cb = Similarity.boundedSeeds(eBase).select("vec_id", "qv", "nrm")
      val codesUnion = Similarity.pqDistances(eAll, cb)
        .groupBy("vec_id", "m")
        .agg(min(struct(col("d2"), col("cw_id"))).as("best"))
        .select(col("vec_id"), col("m"), col("best.cw_id").as("cw_id"))
      val qp = col("vec_id") % 20 === 0
      val adcTab = Similarity.pqDistances(eAll.filter(qp), cb)
        .select(col("vec_id").as("q_id"), col("m"), col("cw_id"),
          col("d2").as("qd2"))
      val want = rows(Similarity.ivfpqSearch(eAll, coarse, f2c, assignUnion,
        codesUnion, adcTab, qp, probeFine = 2, labelFiltered = false))
      spark.sharedState.cacheManager.clearCache()

      val s2 = spark.newSession()
      val got = rows(Similarity.searchFrozenIvfpq(s2, sf, "ship_app"))
      assert(got == want,
        "post-append frozen search must equal the in-memory union " +
          "through identical frozen quantizers")

      // bucket spec survived the append: the ADC-shaped fragment
      // still plans exchange-free over BOTH file sets
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val idx = AnnIndexStore.load(spark, "ship_app")
        val frag = idx.assign.join(idx.codes, "vec_id")
          .groupBy("vec_id", "m").agg(count(lit(1)).as("n"))
        frag.collect()
        val ex = expanded(physical(frag))
          .flatMap(_.collect { case e: ShuffleExchangeExec => e })
        assert(ex.isEmpty, "append must preserve the bucket layout")
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

      // COMPACTION: the append left >1 file in at least one bucket
      // (one file set per write); compact() must collapse to exactly
      // one file per non-empty bucket, preserve rows, and keep the
      // exchange-free layout
      def dataFiles(t: String): Seq[java.io.File] = {
        val loc = spark.sessionState.catalog
          .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(t))
          .location
        new java.io.File(loc).listFiles().toSeq
          .filter(f => f.getName.startsWith("part-"))
      }
      assert(dataFiles("ship_app_assign").length > 4,
        "append should have landed a second file generation")
      val before = rows(spark.table("ship_app_assign").orderBy("vec_id"))
      AnnIndexStore.compact(spark, "ship_app")
      assert(dataFiles("ship_app_assign").length <= 4,
        "compaction must land at most one file per bucket: " +
          dataFiles("ship_app_assign").map(_.getName).sorted.mkString(", "))
      assert(rows(spark.table("ship_app_assign").orderBy("vec_id")) == before,
        "compaction must preserve rows")
      val postCompact = rows(Similarity.searchFrozenIvfpq(spark.newSession(),
        sf, "ship_app"))
      assert(postCompact == want, "post-compaction search unchanged")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val idx2 = AnnIndexStore.load(spark, "ship_app")
        val frag2 = idx2.assign.join(idx2.codes, "vec_id")
          .groupBy("vec_id", "m").agg(count(lit(1)).as("n"))
        frag2.collect()
        val ex2 = expanded(physical(frag2))
          .flatMap(_.collect { case e: ShuffleExchangeExec => e })
        assert(ex2.isEmpty, "compaction must preserve the bucket layout")
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    } finally AnnIndexStore.drop(spark, "ship_app")
  }

  test("ship overwrites an orphaned warehouse directory from a dead JVM") {
    // the hazard: warehouse dirs persist across JVMs while the
    // session catalog is in-memory — a process that died between
    // write and drop leaves a location the next catalog doesn't own,
    // and saveAsTable then throws LOCATION_ALREADY_EXISTS instead of
    // overwriting (the bench hit exactly this on its second run)
    val loc = new java.io.File(spark.sessionState.catalog.defaultTablePath(
      org.apache.spark.sql.catalyst.TableIdentifier("ship_orphan_coarse")))
    loc.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(loc, "junk.parquet").toPath, "not parquet".getBytes)
    try {
      Similarity.shipIvfpqIndex(spark, sf, "ship_orphan", buckets = 2)
      assert(Similarity.searchFrozenIvfpq(spark, sf, "ship_orphan").count() > 0)
    } finally AnnIndexStore.drop(spark, "ship_orphan")
    assert(!loc.exists() || loc.listFiles().isEmpty)
  }

  test("compaction crash mid-swap self-heals; consistency audit flags a half-append") {
    Similarity.shipIvfpqIndex(spark, sf, "ship_crash", buckets = 2)
    try {
      val want = rows(spark.table("ship_crash_assign").orderBy("vec_id"))
      // simulate a JVM death between the two renames: the live table
      // is gone, only the _precompact copy survives
      spark.sql("ALTER TABLE ship_crash_assign RENAME TO ship_crash_assign_precompact")
      AnnIndexStore.recover(spark, "ship_crash")
      assert(rows(spark.table("ship_crash_assign").orderBy("vec_id")) == want,
        "recover() must restore the pre-compaction table")
      // and a full compact() over the recovered freeze still works
      // (it runs the same recovery at start)
      spark.sql("ALTER TABLE ship_crash_assign RENAME TO ship_crash_assign_precompact")
      AnnIndexStore.compact(spark, "ship_crash")
      assert(rows(spark.table("ship_crash_assign").orderBy("vec_id")) == want,
        "compact() must self-heal before rewriting")

      // consistency audit: whole index reads 4 codes per assigned
      // vector; a half-append (codes committed, assign not) shows up
      val (na, nc, ok) = AnnIndexStore.verifyConsistency(spark, "ship_crash")
      assert(ok && nc == 4 * na)
      // plant the half-append: 4 orphan code rows, no assignment
      // (detached copies — appending a self-read would race the scan)
      val codesTab = spark.table("ship_crash_codes")
      val orphan = spark.createDataFrame(
        spark.sparkContext.parallelize(codesTab.limit(4).collect().toSeq),
        codesTab.schema)
      val assignEmpty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        spark.table("ship_crash_assign").schema)
      AnnIndexStore.append(assignEmpty, orphan, "ship_crash")
      val (_, _, ok2) = AnnIndexStore.verifyConsistency(spark, "ship_crash")
      assert(!ok2, "the audit must flag codes without matching assignment")
    } finally AnnIndexStore.drop(spark, "ship_crash")
  }

  test("frozen Bloom screen: a new session's verdicts equal d19") {
    Dedup.shipBloomIndex(spark, sf, "ship_bloom")
    val want = rows(Dedup.d19BloomScreen(spark, sf))
    spark.sharedState.cacheManager.clearCache()
    val s2 = spark.newSession()
    try {
      assert(rows(Dedup.d19ScreenFrozen(s2, sf, "ship_bloom")) == want,
        "frozen-filter screen must equal the in-memory d19 verdicts")
    } finally Seq("geom", "words", "hash").foreach { p =>
      spark.sql(s"DROP TABLE IF EXISTS ship_bloom_$p")
    }
  }
}
