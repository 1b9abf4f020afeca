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
    "d09_production", "d17_incremental_spans",
    // round 6: composed IVFPQ (coarse->fine routing + ADC in-cell)
    "s13_ann_ivfpq",
    // round 8: the same composition's SEARCH phase over a prebuilt
    // index (build cache-materialized by the warm pass) — the hot
    // path a deployment actually repeats, as a stable r-over-r signal
    "s13_search_phase",
    // round 8b: the bloom ingest screen (the production screen path)
    // and the quantizer training step (3 bounded-k assignment passes
    // + 2 mean aggregates — the per-freeze build cost)
    "d19_bloom_screen", "s18_kmeans_refine",
    // round 8c: the asymmetric containment screen (rare-shingle pair
    // join — the newest corpus-scale dedup path) and the HLL sketch
    // build (one map-side-combinable groupBy over the token stream —
    // the cheap-sketch floor the other entries are read against)
    "d20_containment", "qa07_hll_distinct",
    // round 8d: postings-pruned ranked retrieval (broadcast query
    // frame + two-phase top-k) and the 4-iteration integer TextRank
    // (one corpus aggregation + bounded iterative joins)
    "t18_bm25", "t19_textrank",
    // round 8e: degree-oriented triangle counting (edge-iterator —
    // sf0.1: 1.2M edges, 1.88M triangles through √m-bounded
    // adjacency intersections) and the TPC-H Q5-shape snowflake join
    // (selective-dimension-first join order)
    "g01_triangles", "q43_local_supplier",
    // the HAVING-filtered aggregate join-back (group-prune BEFORE
    // corpus joins), moved HERE from its round-9b slot after
    // s13_frozen_search (VERDICT r13 #7: it flagged starved on the
    // driver box in two of three rounds while reading <1s idle — it
    // ran immediately after the s13 family's heavy cache churn;
    // beside its q43 sibling the adjacency is a light scan-agg)
    "q45_big_orders",
    // round 8e cont.: the one-pass second-moment aggregate (native
    // long[] buffer — the cheap-exact-summary floor beside qa07)
    "s20_gram_matrix",
    // round 9: the iterative-join family (VERDICT r8 #4 — the newest
    // plan shape had no round-over-round signal): corpus-scale
    // PageRank (4 hint-free rank-join iterations) and the
    // increment-vs-frozen-corpus triangle accounting
    "g03_pagerank", "g04_incremental_triangles",
    // round 9b: the DISK-backed frozen-index search — the deployment
    // read path (bucketed parquet assign/codes off the catalog, no
    // rebuild, no cache), beside s13_search_phase's cache-backed
    // attribution; the index ships once in prepare(), untimed
    "s13_frozen_search",
    // round 11: the MAILLOG DAEMON itself — the component closest to
    // the reference's real workload (tail→parse→4 stateful tables):
    // one full AvailableNow run over a pre-spooled text corpus, all
    // four streams, parquet sinks. Lines/sec = spooled line count
    // (printed to stderr at prepare) / this median
    "maillog_daemon",
    // round 11: the media E2E pipeline (resize→aHash→band-join) over
    // a rendered PNG corpus — decode-heavy mapPartitions stages whose
    // shuffle mass is count-scaled (two longs/image), never
    // byte-scaled
    "mm10_media_pipeline",
    // round 11b: the FROZEN media match — the incremental read path
    // (arrivals decode+hash+match against the shipped hash index;
    // the corpus decodes ONCE at freeze, untimed here): the
    // O(arrivals) claim beside mm10's full-corpus pass
    "mm11_frozen_match",
    // round 11c: the widest join tree of the new decision-support
    // family (lineitem ⋈ pruned part ⋈ supplier→nation with a
    // DECIMAL(18,4) two-factor measure) — the classic multi-leg
    // star-join aggregate as a round-over-round signal
    "q57_profit",
    // round 11c: the pipeline family's first bench entry — the
    // composed ingest DAG (p19 chunk explode + p02's bucketed
    // two-phase prefix-sum pack), the machinery every p-key shares
    "p20_chunk_pack",
    // round 12: the retrieval half of context assembly — chunk
    // explode + chunk-granular BM25 (tf/df groupBys + broadcast
    // query frame + two-phase top-k) + the budget prefix sum; the
    // live twin the frozen text index is pinned against
    "p21_context_assembly",
    // round 12: the frozen-text-index read path — same ranking rows
    // as p21's retrieval core (TextIndexSpec pins it) but served off
    // the shipped postings with the tokenize+tf pass amortized out
    // and `term IN (query terms)` pushed into the bucketed scans:
    // the sparse sibling of s13_frozen_search / mm11_frozen_match
    "p21_frozen_search",
    // round 13: the tenant-filtered frozen ANN read path (VERDICT r12
    // #1) — s15's (cell, label)-tightened candidate join served off
    // the shipped bucketed index, beside the unfiltered
    // s13_frozen_search; the index ships once in prepare(), untimed
    "s15_frozen_filtered",
    // round 13: the graph family's frozen read path — arriving
    // orders' increment edges probe the SHIPPED corpus edge index
    // (g04's 1-new-edge category off bucketed parquet; the corpus
    // pair fan-out ran once at the untimed freeze): the fourth
    // family's sibling of s13_frozen_search / mm11_frozen_match /
    // p21_frozen_search
    "g04_frozen_probe",
    // round 14: the HYBRID dense+sparse serving read path (VERDICT
    // r13 #2) — one query batch searching BOTH shipped indexes
    // (doc-granular Bm25IndexStore postings + the IVFPQ
    // AnnIndexStore) and fusing by RRF; both ships run in prepare(),
    // untimed — the timed work is posting-list-scaled text IO +
    // probed-cell ADC + a ≤20-rows/query fusion
    "t22_hybrid_frozen",
    // round 14: the graph family's RE-RANK read path (VERDICT r13
    // #6) — arrival weighted pairs + the (x, y) merge against the
    // SHIPPED weighted edge index + one damped rank chain over the
    // merge; the corpus pair fan-out and freeze ran in prepare(),
    // untimed (beside g04_frozen_probe's closure read path)
    "g07_rerank_phase",
    // round 15: graph communities — the driver-loop contraction
    // family's bench signal (alternating star rounds to a fixpoint
    // over the weight-screened edge set, then node-scaled aggregates)
    "g08_communities",
    // round 16: the trained-tokenizer serving read path — per-doc
    // token counts folded under the SHIPPED merge table (12 collected
    // rows of control state + per-row literal-replace Column algebra
    // inside the scan's codegen stage; training ran at prepare,
    // untimed): the tokenizer family's sibling of s13_frozen_search /
    // p21_frozen_search / mm11_frozen_match
    "t31_frozen_serve",
    // round 17: the ALL-FROZEN curation nightly (p29's serve path —
    // classifier gate + bloom exact screen + banded near screen +
    // frozen-tokenizer pack, every stage off a SHIPPED artifact; the
    // four freezes run at prepare, untimed): the composed read path
    // a 100 TB deployment executes per arrival batch
    "p29_frozen_serve",
    // round 18: night 2 of the absorb-composed nightly (p30) — the
    // same serve path AGAINST THE ABSORBED generation (prepare +
    // night 1 + the survivor absorb run untimed): the steady-state
    // read a deployment executes every night after the first
    "p30_night2_serve")

  /** Bench-local entries — NOT driver correctness keys: compositions
    * whose COST ATTRIBUTION differs from a SparkEntry query while
    * the rows are identical (s13_search_phase == s13_ann_ivfpq;
    * AnnQualitySpec pins the equality, so this measures the same
    * computation with the index build amortized out). */
  private val benchRoot = "/tmp/graft-bench-media"
  private def daemonRoot = "/tmp/graft-bench-daemon"
  private def slug(dir: String) = dir.replaceAll("[^A-Za-z0-9.]", "_")
  private def daemonSpool(dir: String) = s"$daemonRoot/spool-${slug(dir)}"
  private def pngCorpus(dir: String) = s"$benchRoot/png-${slug(dir)}"

  val benchOnly: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] =
    Map("s13_search_phase" -> (graft.operators.Similarity.s13SearchPhase _),
      "s13_frozen_search" -> ((s: org.apache.spark.sql.SparkSession, dir: String) =>
        graft.operators.Similarity.searchFrozenIvfpq(s, dir, "bench_frozen")),
      // the label-filtered frozen read (rows == live s15): same
      // shipped index, candidate join tightened to (cell, label),
      // fine probes at 4 (the nprobe-under-filter rule)
      "s15_frozen_filtered" -> ((s: org.apache.spark.sql.SparkSession, dir: String) =>
        graft.operators.Similarity.searchFrozenIvfpq(s, dir, "bench_frozen",
          probeFine = 4, labelFiltered = true)),
      "p21_frozen_search" -> ((s: org.apache.spark.sql.SparkSession, dir: String) =>
        graft.sources.Bm25IndexStore.searchFrozen(s, "bench_text",
          graft.operators.TextAnalysis.Bm25Queries)),
      // the incremental-PageRank read path: arrival weighted pairs +
      // merge against the shipped weighted edges + one rank chain
      // (GraphShipSpec pins g07 against the storeless twin)
      "g07_rerank_phase" -> ((s: org.apache.spark.sql.SparkSession, dir: String) =>
        graft.operators.Graph.rerankFrozen(s, dir, "bench_graph_w")),
      // the hybrid serving read path: frozen BM25 search + frozen
      // IVFPQ search + the shared RRF fusion (HybridShipSpec pins the
      // rows against the storeless live twin)
      "t22_hybrid_frozen" -> ((s: org.apache.spark.sql.SparkSession, dir: String) =>
        graft.operators.TextAnalysis.hybridFrozenSearch(s, dir,
          "bench_hybrid_text", "bench_hybrid_ann")),
      // the frozen graph probe: timed work = the arrival slice's own
      // pair fan-out + the two adjacency-scaled probe joins against
      // the shipped edge table (the corpus fan-out ran at prepare)
      "g04_frozen_probe" -> ((s: org.apache.spark.sql.SparkSession, dir: String) => {
        val li = graft.sources.Tables.lineitem(s, dir)
          .select("l_orderkey", "l_partkey")
        val inc = graft.operators.Graph.orderPairs(
            li.filter(org.apache.spark.sql.functions.col("l_orderkey") % 10 >= 8))
          .join(graft.sources.GraphIndexStore.edges(s, "bench_graph"),
            Seq("x", "y"), "left_anti")
        graft.sources.GraphIndexStore.closedFrozen(s, inc, "bench_graph")
      }),
      // one full AvailableNow daemon run per pass: fresh checkpoint +
      // output dirs (the run IS the measured work — parse cascade,
      // watermarked log dedup, two transformWithState upserts,
      // delivery parse, four parquet sinks off one shared source
      // scan); the returned frame reads the landed logs table so the
      // timed count also proves the run produced rows
      "maillog_daemon" -> ((s: org.apache.spark.sql.SparkSession, dir: String) => {
        val runDir = s"$daemonRoot/run-${java.lang.System.nanoTime()}"
        val qs = graft.streaming.MaillogDaemon.start(s,
          args = Array("-maillog", daemonSpool(dir),
            "-out", s"$runDir/out", "-checkpoint", s"$runDir/ckpt",
            "-year", "2024"),
          trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
        qs.foreach(_.awaitTermination())
        s.read.parquet(s"$runDir/out/pfmaillog2db_logs")
      }),
      // the media E2E pipeline over the rendered PNG corpus: real
      // imageio decode + resize + aHash in mapPartitions, then the
      // banded pair join — shuffle mass is two longs per image
      "mm10_media_pipeline" -> ((s: org.apache.spark.sql.SparkSession, dir: String) =>
        graft.operators.Multimodal.mediaPipeline(
          s.read.parquet(pngCorpus(dir)))),
      // the trained-tokenizer serving read path: fold the corpus
      // under the merge table frozen at prepare (12 rows of control
      // state collected, then per-row Column algebra — t31's key
      // with the training amortized out)
      "t31_frozen_serve" -> ((s: org.apache.spark.sql.SparkSession, dir: String) =>
        graft.sources.TokenizerStore.tokenCountsFrozen(s,
          graft.sources.Tables.documents(s, dir), "bench_tokenizer")),
      // the incremental media read path: arriving images (the %8 ∈
      // {6,7} variants) decode+hash inside their partitions and match
      // against the index frozen at prepare — the timed work is
      // arrival-scaled; the corpus was decoded once, untimed
      "mm11_frozen_match" -> ((s: org.apache.spark.sql.SparkSession, dir: String) =>
        graft.sources.MediaIndexStore.matchFrozen(s,
          graft.operators.Multimodal.mediaHashes(
            s.read.parquet(pngCorpus(dir))
              .filter(org.apache.spark.sql.functions.col("doc_id") % 8 >= 6)),
          "bench_media")),
      // the all-frozen curation nightly: the timed work is the
      // arrival-scaled serve only — gate scoring (arrival-token ⋈
      // 64-row weights), bloom word probes, the banded near probe
      // against the frozen buckets, and the survivor pack; all four
      // artifacts froze at prepare
      "p29_frozen_serve" -> ((s: org.apache.spark.sql.SparkSession, dir: String) =>
        graft.operators.Pipeline.p29ServeFrozen(s, dir, ns = "bench_p29")),
      // night 2 of the absorb-composed nightly: the timed work is
      // the night-2 serve alone — gate + both screens against the
      // ABSORBED (corpus ∪ night-1 survivors) generation + the pack;
      // prepare, night 1's serve and the survivor absorb all ran
      // untimed at fixture time
      "p30_night2_serve" -> ((s: org.apache.spark.sql.SparkSession, dir: String) =>
        graft.operators.Pipeline.p30Night2Serve(s, dir, ns = "bench_p30")))

  /** Land the UNTIMED fixture an entry reads — shared by the bench
    * sweep/retries AND [[Explain]] (ADVICE round 14: Explain carried
    * a verbatim copy of two of these blocks and silently lacked the
    * other four, so it either drifted from the benched fixture
    * recipe or threw on the uncovered entries). */
  def prepareFixture(spark: org.apache.spark.sql.SparkSession,
                     sfDir: String, name: String): Unit = {
      // every maillog BATCH query (m01..m13) shares the synthesized
      // corpus; NOT the mm* multimodal queries, NOT the daemon run
      // (which reads its own spool)
      if (name.startsWith("m") && !name.startsWith("mm") &&
          name != "maillog_daemon")
        graft.operators.MaillogOps.materializeCorpus(spark, sfDir)
      // the frozen-search entry reads a shipped index: ship it here,
      // UNTIMED, overwriting any previous run's freeze (a stale
      // freeze from another SF would silently change the measured
      // candidate mass)
      if (name == "s13_frozen_search" || name == "s15_frozen_filtered")
        graft.operators.Similarity.shipIvfpqIndex(spark, sfDir, "bench_frozen")
      // freeze the corpus edge set, UNTIMED (the one corpus pair
      // fan-out per freeze — the probe entry times the arrival-scaled
      // path only)
      if (name == "g04_frozen_probe") {
        graft.sources.GraphIndexStore.drop(spark, "bench_graph")
        graft.sources.GraphIndexStore.freeze(
          graft.operators.Graph.corpusEdgeIndex(spark, sfDir), "bench_graph")
      }
      // freeze the inverted text index over the corpus chunks,
      // UNTIMED (the one tokenize+tf pass per freeze — the search
      // entry times only the posting-list-scaled read)
      if (name == "p21_frozen_search") {
        graft.sources.Bm25IndexStore.drop(spark, "bench_text")
        graft.sources.Bm25IndexStore.freeze(
          graft.operators.Pipeline.chunkFrame(
            graft.sources.Tables.documents(spark, sfDir)), "bench_text")
      }
      // freeze the WEIGHTED corpus edges, UNTIMED (the one corpus
      // pair fan-out per freeze — the re-rank entry times the
      // arrival-scaled merge + one rank chain only)
      if (name == "g07_rerank_phase") {
        graft.sources.GraphIndexStore.drop(spark, "bench_graph_w")
        graft.sources.GraphIndexStore.freeze(
          graft.operators.Graph.corpusWeightedEdges(spark, sfDir),
          "bench_graph_w")
      }
      // ship BOTH hybrid indexes, UNTIMED (the serving entry times
      // search+fuse only — the ship cost is the families' existing
      // freeze entries' story)
      if (name == "t22_hybrid_frozen") {
        graft.sources.Bm25IndexStore.drop(spark, "bench_hybrid_text")
        graft.sources.Bm25IndexStore.freeze(
          graft.operators.TextAnalysis.docChunkFrame(spark, sfDir),
          "bench_hybrid_text")
        graft.operators.Similarity.shipIvfpqIndex(spark, sfDir, "bench_hybrid_ann")
      }
      // freeze all four curation artifacts (classifier, bloom,
      // near-dup bands, tokenizer), UNTIMED — the p29 serve entry
      // times the composed arrival-scaled read path only
      if (name == "p29_frozen_serve")
        graft.operators.Pipeline.p29Prepare(spark, sfDir, ns = "bench_p29")
      // freeze the four artifacts, serve night 1 and ABSORB its
      // survivors, all UNTIMED — the p30 entry times night 2's
      // serve against the absorbed generation only
      if (name == "p30_night2_serve") {
        graft.operators.Pipeline.p29Prepare(spark, sfDir, ns = "bench_p30")
        graft.operators.Pipeline.p30Night1Absorb(spark, sfDir, ns = "bench_p30")
      }
      // train + freeze the tokenizer artifact, UNTIMED (the one
      // corpus word-frequency groupBy + 12 vocab-scaled argmax
      // rounds per freeze — the serving entry times the per-doc
      // fold only)
      if (name == "t31_frozen_serve") {
        graft.sources.TokenizerStore.drop(spark, "bench_tokenizer")
        graft.sources.TokenizerStore.freeze(
          graft.sources.Tables.documents(spark, sfDir)
            .select("doc_id", "text"),
          "bench_tokenizer")
        ()
      }
      // spool the synthesized maillog corpus as text files, UNTIMED
      // (the daemon bench measures the streaming engine, not fixture
      // synthesis); sweep previous runs' per-pass dirs first
      if (name == "maillog_daemon") {
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(daemonRoot))
        graft.sources.Maillog.synthesizeLines(spark, sfDir)
          .select(org.apache.spark.sql.functions.col("line").as("value"))
          .coalesce(8)
          .write.mode("overwrite").text(daemonSpool(sfDir))
        val n = spark.read.text(daemonSpool(sfDir)).count()
        System.err.println(s"[bench] maillog_daemon: $n spooled input lines" +
          " (lines/sec = this count / the median seconds)")
      }
      // render the deterministic PNG corpus, UNTIMED (real imageio
      // encode — the pipeline bench should time decode+resize+hash,
      // not fixture rendering)
      if (name == "mm10_media_pipeline") {
        graft.operators.Multimodal.syntheticPngCorpus(spark, sfDir)
          .write.mode("overwrite").parquet(pngCorpus(sfDir))
        val n = spark.read.parquet(pngCorpus(sfDir)).count()
        System.err.println(s"[bench] mm10_media_pipeline: $n rendered PNGs")
      }
      // freeze the media-hash index over the corpus slice, UNTIMED
      // (the one corpus decode+hash pass happens once per freeze —
      // the match entry times only the arrival-scaled path);
      // re-renders the PNG corpus if mm10's prepare didn't run
      if (name == "mm11_frozen_match") {
        if (!new java.io.File(pngCorpus(sfDir)).exists())
          graft.operators.Multimodal.syntheticPngCorpus(spark, sfDir)
            .write.mode("overwrite").parquet(pngCorpus(sfDir))
        graft.sources.MediaIndexStore.drop(spark, "bench_media")
        graft.sources.MediaIndexStore.freeze(
          graft.operators.Multimodal.mediaHashes(
            spark.read.parquet(pngCorpus(sfDir))
              .filter(org.apache.spark.sql.functions.col("doc_id") % 8 < 6)),
          "bench_media")
        val n = spark.read.parquet(pngCorpus(sfDir))
          .filter(org.apache.spark.sql.functions.col("doc_id") % 8 >= 6).count()
        System.err.println(s"[bench] mm11_frozen_match: $n arriving images")
      }
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cores = cpus, appName = "graft-bench")

    // JVM/codegen warm-up outside the timed region — DEDICATED
    // queries spanning the machinery classes (scan-agg, join, window,
    // text explode), not just q01 (VERDICT r12 #2: q01 doubled as
    // warm-up and first timed entry, so its timed passes kept
    // absorbing residual whole-JVM compilation and flagging starved)
    Seq("q01_pricing_summary", "q03_join_revenue", "q07_window_running",
        "t01_token_stats")
      .foreach(q => SparkEntry.queries(q)(spark, sfDir).count())
    graft.operators.OpCache.release(spark)
    spark.catalog.clearCache()

    // contention sentinel: the box's 1-min load average at each pass
    // (VERDICT r4 #3 — BENCH_r04 recorded a 2.08s d02 median that an
    // idle-box re-run read as 0.78s; per-pass loads make a contended
    // median machine-distinguishable from a plan regression)
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    def loadNow(): Double = osBean.getSystemLoadAverage
    // process-CPU time is the contention signal loadavg can't fake
    // (VERDICT r6 #1: this container reports the HOST's loadavg, so
    // the load sentinel sat under threshold while the host stole
    // ~3.8× of s13's wall time): when the host steals cores, the
    // CPU-seconds THIS process gets per wall-second drops, and that
    // ratio is measured from inside the process
    val sunBean = osBean match {
      case b: com.sun.management.OperatingSystemMXBean => Some(b)
      case _ => None
    }
    def procCpuNs(): Long = sunBean.map(_.getProcessCpuTime).getOrElse(-1L)

    // act on the sentinel, not just record it (VERDICT r5 #2: two
    // rounds running, the official artifact's medians were contended
    // outliers): before each timed pass, wait — bounded — for the
    // 1-min load to drop below the threshold; a pass that still
    // starts hot is marked so the MEDIAN can be flagged `contended`
    // and round-over-round comparisons skip it instead of reading a
    // loaded box as a plan regression. The threshold is external load
    // ON TOP of our own just-finished passes' contribution to the
    // 1-min average, so it is deliberately not tight.
    val loadMax = sys.env.getOrElse("SPARK_GRAFT_LOAD_MAX", "3.0").toDouble
    // TOTAL wait budget across the whole run (0 disables waiting): a
    // per-pass budget on a genuinely-contended box would stretch an
    // 18-query × 4-pass run by an hour; a shared budget fixes the
    // common case (residual load from whatever ran just before the
    // bench) and degrades to flagged-but-untimed-waits past it
    var waitBudgetNs =
      sys.env.getOrElse("SPARK_GRAFT_LOAD_WAIT_SEC", "300").toLong * 1000000000L
    def awaitIdle(): Double = {
      var ld = loadNow()
      while (ld > loadMax && waitBudgetNs > 0) {
        Thread.sleep(5000)
        waitBudgetNs -= 5000000000L
        ld = loadNow()
      }
      ld
    }

    // per pass: (wall sec, max(load at start, load at end), cpu frac)
    // — the end-of-pass load sample closes ADVICE r6's mid-pass blind
    // spot (start-only sampling let a pass that became contended
    // mid-run supply an unflagged median); cpuFrac = process CPU
    // seconds per wall second, comparable ACROSS passes of the same
    // query (the work is identical, so a starved pass shows a lower
    // fraction)
    def timeOnce(name: String): Option[(Double, Double, Double)] = {
      val fn = benchOnly.getOrElse(name, SparkEntry.queries(name))
      val ld0 = awaitIdle()
      val cpu0 = procCpuNs()
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        val wallNs = System.nanoTime() - t0
        val ld = math.max(ld0, loadNow())
        val cpuFrac =
          if (cpu0 < 0) -1.0 else (procCpuNs() - cpu0).toDouble / wallNs
        Some((wallNs / 1e9, ld, cpuFrac))
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          None
      }
    }
    // m-queries share the synthesized maillog corpus; materialize it
    // outside the timed region so the bench measures the operator,
    // not the fixture generator
    def prepare(name: String): Unit = Bench.prepareFixture(spark, sfDir, name)
    // median of 3 timed passes after one warm pass (±30% run-to-run
    // variance on this box makes single timings meaningless). A
    // failing query reports -1 (and stderr), never a fake time.
    // Per-pass times (warm pass included, first) are emitted in the
    // artifact so an outlier pass — a cold recompute where the warm
    // cache should have been reused — is visible instead of silently
    // inflating the median (the r3 d02 7.4s-vs-0.8s bimodality).
    // optional name filter (local probing only — the driver passes no
    // args, so the artifact always covers the full headline set)
    val toRun = if (args.nonEmpty) headline.filter(args.toSet) else headline

    // PER-ENTRY REFERENCE BANDS (VERDICT r13 #1): the committed
    // artifact's medians were environmentally polluted three rounds
    // running, and the noise flags (contended/unstable/starved) are
    // relative or per-pass — a box that is UNIFORMLY 3–5× slow
    // defeats all three (r13: mm10 5.14s vs 1.74s judge-idle,
    // unflagged). The band is the reference point noise detection
    // can't supply: min of the last 3 rounds' UNFLAGGED driver
    // headline medians (tools/make_bands.py regenerates the file
    // from the BENCH_r*.json artifacts each round). Any median > 2×
    // its band flags `overband` REGARDLESS of cpuFrac/load/spread,
    // and the retry budget is spent in band-deviation order (below).
    // Bands apply only at the SF they were measured at; entries new
    // this round have no band until the next regeneration.
    val bandsPath = sys.env.getOrElse("SPARK_GRAFT_BANDS", "docs/bench_bands.json")
    val bands: Map[String, Double] = try {
      val txt = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(bandsPath)), "UTF-8")
      val sfOk = """"sf"\s*:\s*"([^"]*)"""".r.findFirstMatchIn(txt)
        .exists(_.group(1) == sfDir)
      if (!sfOk) {
        System.err.println(s"[bench] bands at $bandsPath are for a " +
          s"different SF than $sfDir — overband flagging disabled")
        Map.empty
      } else {
        val body = txt.drop(txt.indexOf("\"bands\""))
        """"([A-Za-z0-9_]+)"\s*:\s*([0-9][0-9.]*)""".r.findAllMatchIn(body)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      }
    } catch {
      case _: java.io.IOException =>
        System.err.println(s"[bench] no bands file at $bandsPath — " +
          "overband flagging disabled")
        Map.empty
    }

    // one measurement attempt: a warm pass + 3 timed passes + the
    // three contention flags over ITS OWN passes + the absolute
    // band check
    case class Attempt(median: Double, passes: Seq[(Double, Double, Double)],
                       contended: Boolean, unstable: Boolean, starved: Boolean,
                       overband: Boolean) {
      def flagged: Boolean =
        median >= 0 && (contended || unstable || starved || overband)
      def tags: String = Seq(
        if (contended) Some("contended") else None,
        if (unstable) Some("unstable") else None,
        if (starved) Some("starved") else None,
        if (overband) Some("overband") else None).flatten.mkString("+")
    }
    def attempt(name: String): Attempt = {
      val warm = timeOnce(name) // warm this query's codegen/broadcast paths
      val times = Seq(timeOnce(name), timeOnce(name), timeOnce(name)).flatten
      // median of exactly 3 passes; ANY failed pass reports -1 rather
      // than a statistic over the survivors (a min-of-two would let a
      // flaky-slow query masquerade as fast and break cross-round
      // comparability)
      val t = if (times.length < 3) -1.0 else times.map(_._1).sorted.apply(1)
      // contended = the pass that SUPPLIED the median got markedly
      // less CPU per wall-second than this query's best pass (the
      // host-loadavg blind spot: this container reads the HOST's
      // 1-min load, which can sit under threshold while the host
      // steals our cores — but it cannot fake our own process-CPU
      // ratio), or ran above the load threshold WITH a depressed
      // ratio corroborating (round 9: load alone no longer flags —
      // the bench's own 13–22-core passes push the 1-min average
      // past any fixed threshold near the end of the suite, so an
      // idle run was flagging its heaviest healthy queries; and the
      // pure relative check is guarded to medians ≥ 1s wall because
      // sub-second queries read pass-1 cache builds as frac spread).
      // Either way a flagged median is a contention artifact, not a
      // plan measurement, and downstream comparisons should skip it
      // (per-pass `loads`/`cpus` stay in the artifact to audit).
      val medianPass = if (times.length == 3) Some(times.sortBy(_._1).apply(1)) else None
      val maxFrac = times.map(_._3).foldLeft(-1.0)(math.max)
      def fracLow(p: (Double, Double, Double), r: Double): Boolean =
        p._3 >= 0 && maxFrac > 0 && p._3 < r * maxFrac
      val contended = medianPass.exists { p =>
        p._1 >= 1.0 && (fracLow(p, 0.5) || (p._2 > loadMax && fracLow(p, 0.75)))
      }
      // unstable = the timed passes themselves disagree by > 2× — a
      // deterministic plan re-run on identical cached inputs doesn't
      // do that on an idle box, so the spread IS the contention tell
      // even when every load sample looked calm (the r6 s13 artifact:
      // passes 16.7/11.7/4.7, contended:false, median 3.8× inflated)
      val wallsSorted = times.map(_._1).sorted
      val unstable = times.length == 3 && wallsSorted.head > 0 &&
        wallsSorted.last / wallsSorted.head > 2.0
      // starved = the ABSOLUTE floor the two relative flags can't
      // supply (VERDICT r8 #1: a host that steals cores EQUALLY on
      // every pass defeats both — passes agree, and the cpuFrac
      // comparison is within-query relative; BENCH_r08 shipped d20 at
      // 16.26s vs an idle 0.97s with every flag false). When the
      // median pass's process-CPU seconds per wall second sits below
      // a fixed fraction of the cores this run was GRANTED, the box
      // is being starved no matter how self-consistent the passes
      // look. Guarded to medians ≥ 1s wall, and the floor sits at 5%
      // of granted cores: the original 8% (2.56 of 32) was calibrated
      // when the lowest healthy ≥1s entry was s13_search_phase at
      // cpuFrac 4.4–6.3 — but t18_bm25 (added r8d) runs HEALTHY at
      // 2.2–3.1 (stage-latency-bound postings query; idle-box r11
      // runs kept flagging it, and force-spreading its scan to raise
      // the fraction made the query 40% slower — the fraction is the
      // query's nature, not starvation). The r8 starvation artifact
      // class (d20 16.8× inflated) lands near 0.7–1.0, so 0.05·cpus
      // = 1.6 still splits artifact from healthy with margin on both
      // sides (see docs/PLANS.md bench notes).
      val starveFloor =
        sys.env.getOrElse("SPARK_GRAFT_STARVE_FRAC", "0.05").toDouble * cpus
      val starved = medianPass.exists { p =>
        p._1 >= 1.0 && p._3 >= 0 && p._3 < starveFloor
      }
      // overband = the ABSOLUTE reference check (VERDICT r13 #1):
      // median more than 2× this entry's cross-round floor band —
      // regardless of cpuFrac, load, or pass agreement, because a
      // uniformly-starved box keeps all three relative signals calm
      val overband = t >= 0 && bands.get(name).exists(b => t > 2.0 * b)
      Attempt(t, warm.toSeq ++ times, contended, unstable, starved, overband)
    }

    // PHASE 1 — the sweep: one attempt per entry, roster order.
    // Retries no longer run inline (VERDICT r13 #1: the shared
    // waitBudget drained in roster order, so q45 — flagged, late in
    // the roster — shipped its polluted 8.52s headline unretried
    // while earlier, milder flags spent the budget).
    val sweep = toRun.map { name =>
      prepare(name)
      val first = attempt(name)
      // operators register self-join inputs in the bounded OpCache;
      // drop them so later queries aren't timed against a polluted
      // block manager
      graft.operators.OpCache.release(spark)
      spark.catalog.clearCache()
      (name, first)
    }
    // PHASE 2 — SELF-HEALING RETRIES, worst band-deviation first
    // (VERDICT r12 #2 + r13 #1): every flagged entry queues; the
    // queue is ordered by median/band descending (an entry with no
    // band sorts at deviation 2.0 — behind any real overband, ahead
    // of nothing banded-and-healthy), and each retry waits the load
    // out, re-prepares its fixture (idempotent, untimed) and
    // re-measures ONCE while budget remains. The headline median is
    // the unflagged attempt's (if both stay flagged, the smaller —
    // less polluted — wins); the displaced first median is recorded
    // in `retried` so nothing is hidden. Forced-load demo: docs/
    // PLANS.md round-14 notes.
    // The retry phase gets its own budget FLOOR (round 14): a sweep
    // that drains the shared pool waiting out mid-run load leaves
    // ZERO retries for the queue — observed live this round (three
    // flagged entries, empty `retried`), the same shape as r13's
    // q45 even after deviation ordering, because ordering can't help
    // an empty pool. Topping the budget back up to the reserve keeps
    // sweep waits bounded while guaranteeing the heal pass runs.
    // An EXPLICIT SPARK_GRAFT_LOAD_WAIT_SEC is honored as the retry
    // floor too (ADVICE r14: the old floor only honored the literal
    // "0", so a user capping total waits at e.g. 30s still got up to
    // 120s of retry waiting); the 120s default applies only when
    // neither knob is set. SPARK_GRAFT_RETRY_WAIT_SEC still overrides
    // both when set explicitly.
    val retryReserveNs = sys.env.get("SPARK_GRAFT_RETRY_WAIT_SEC")
      .orElse(sys.env.get("SPARK_GRAFT_LOAD_WAIT_SEC"))
      .map(_.toLong)
      .getOrElse(120L) * 1000000000L
    waitBudgetNs = math.max(waitBudgetNs, retryReserveNs)
    val byName = scala.collection.mutable.LinkedHashMap[
      String, (Attempt, Seq[(Double, Double, Double)], Option[Double])]()
    sweep.foreach { case (n, a) => byName(n) = (a, a.passes, None) }
    val retryQueue = sweep
      .filter { case (_, a) => a.flagged }
      .sortBy { case (n, a) =>
        -bands.get(n).map(b => a.median / b).getOrElse(2.0) }
    retryQueue.foreach { case (name, first) =>
      if (waitBudgetNs > 0) {
        System.err.println(f"[bench] retrying $name (flags=${first.tags}, " +
          f"median=${first.median}%.2fs, band=${bands.get(name).map(b => f"$b%.2f").getOrElse("none")})")
        awaitIdle()
        prepare(name)
        val second = attempt(name)
        graft.operators.OpCache.release(spark)
        spark.catalog.clearCache()
        val pick =
          if (!second.flagged && second.median >= 0) second
          else if (second.median >= 0 &&
            (first.median < 0 || second.median < first.median)) second
          else first
        byName(name) = (pick, first.passes ++ second.passes, Some(first.median))
      }
    }
    val results = toRun.map { name =>
      val (a, ps, retriedFrom) = byName(name)
      (name, a, ps, retriedFrom)
    }
    val qs = results.map { case (k, a, _, _) => "\"" + k + "\":" + a.median }
      .mkString("{", ",", "}")
    // per-pass walls (warm pass first; a retried entry's 8 passes are
    // first attempt then second — the audit keeps both attempts)
    val pp = results.map { case (k, _, ps, _) =>
      "\"" + k + "\":[" + ps.map(x => f"${x._1}%.3f").mkString(",") + "]" }
      .mkString("{", ",", "}")
    // per-pass 1-min load averages, parallel to `passes`
    val lds = results.map { case (k, _, ps, _) =>
      "\"" + k + "\":[" + ps.map(x => f"${x._2}%.2f").mkString(",") + "]" }
      .mkString("{", ",", "}")
    val cont = results.map { case (k, a, _, _) =>
      "\"" + k + "\":" + a.contended }.mkString("{", ",", "}")
    // per-pass process-CPU-per-wall-second fractions, parallel to
    // `passes` (-1 when the JVM doesn't expose process CPU time)
    val cpuJson = results.map { case (k, _, ps, _) =>
      "\"" + k + "\":[" + ps.map(x => f"${x._3}%.3f").mkString(",") + "]" }
      .mkString("{", ",", "}")
    val unst = results.map { case (k, a, _, _) =>
      "\"" + k + "\":" + a.unstable }.mkString("{", ",", "}")
    val strv = results.map { case (k, a, _, _) =>
      "\"" + k + "\":" + a.starved }.mkString("{", ",", "}")
    val over = results.map { case (k, a, _, _) =>
      "\"" + k + "\":" + a.overband }.mkString("{", ",", "}")
    // sparse: the reference band each entry was checked against (the
    // audit for the overband verdicts; entries new this round are
    // absent until tools/make_bands.py regenerates the file)
    val bnds = results.collect { case (k, _, _, _) if bands.contains(k) =>
      "\"" + k + "\":" + bands(k) }.mkString("{", ",", "}")
    // sparse: entries whose first attempt was flagged and re-measured
    // — value is the DISPLACED first-attempt median (the headline
    // `queries` value is the chosen attempt's)
    val retr = results.collect { case (k, _, _, Some(m)) =>
      "\"" + k + "\":" + m }.mkString("{", ",", "}")
    // failures (-1 sentinels) must not shrink the total they failed in
    val errors = results.count(_._2.median < 0)
    val total = results.map(_._2.median).filter(_ >= 0).sum
    // full audit line first (per-pass walls/loads/cpu fractions) …
    // both lines carry metric:"total" for driver compatibility; the
    // "kind" discriminator (ADVICE r9) lets a consumer keying on the
    // metric name tell the truncation-prone audit line from the
    // authoritative compact one instead of double-counting
    println(s"""{"metric":"total","kind":"audit","value":$total,"unit":"sec","queries":$qs,"passes":$pp,"loads":$lds,"cpus":$cpuJson,"contended":$cont,"unstable":$unst,"starved":$strv,"overband":$over,"bands":$bnds,"retried":$retr,"errors":$errors,"sf":"$sfDir"}""")
    // … and a COMPACT medians-only line LAST (VERDICT r8 #1: the
    // driver captures only the TAIL of sbt output, and with the
    // verbose line first, BENCH_r08's artifact lost the medians for
    // the first 18 entries — this line is small enough to survive any
    // truncation window, and carries the flags SPARSELY (only flagged
    // queries appear in "flagged") so growth in the suite can't push
    // it past the capture).
    // SIZE BUDGET (VERDICT r18 #1: at 48 entries × 9-decimal doubles
    // + full-word flags + valued retries the line grew to ~2.4 KB and
    // fell out of the driver's 2000-char tail capture TWO ROUNDS
    // RUNNING — r17 and r18 both parsed null): medians print as %.3f
    // (ms precision — the audit line above keeps full precision),
    // `retried` carries KEYS ONLY (the displaced medians live in the
    // audit line), and flag tags compress to first letters
    // (c=contended, u=unstable, s=starved, o=overband, "+"-joined).
    // The flagged map is additionally CAPPED at 12 entries (worst
    // band-deviation first, `nflags` carries the true total — a
    // 23-flag loaded-box run measured this session still printed a
    // 1.92 KB line uncapped, 7 chars from the cliff; capped it reads
    // ~1.65 KB). The full flag detail always lives in the audit line
    // and the committed run logs.
    val flaggedAll = results.collect {
      case (k, a, _, _) if a.flagged =>
        (k, a.tags.split("\\+").map(_.take(1)).mkString("+"),
          bands.get(k).map(b => a.median / b).getOrElse(2.0))
    }
    val flagged = flaggedAll.sortBy(-_._3).take(12)
      .map { case (k, t, _) => "\"" + k + "\":\"" + t + "\"" }
      .mkString("{", ",", "}")
    val qs3 = results.map { case (k, a, _, _) =>
      "\"" + k + "\":" + f"${a.median}%.3f" }.mkString("{", ",", "}")
    val retrKeys = results.collect { case (k, _, _, Some(_)) =>
      "\"" + k + "\"" }.mkString("[", ",", "]")
    println(s"""{"metric":"total","kind":"final","value":${f"$total%.3f"},"unit":"sec","queries":$qs3,"flagged":$flagged,"nflags":${flaggedAll.length},"retried":$retrKeys,"errors":$errors,"sf":"$sfDir"}""")
    // the artifact lines are printed; nothing after this point may
    // flip the exit code. One observed run SIGABRTed (exit 134)
    // during JVM shutdown AFTER a clean 9-minute pass — a streaming
    // state-store maintenance thread racing SparkEnv teardown (the
    // daemon entry leaves those threads armed by design). Graceful
    // stop stays best-effort for temp-dir cleanup; halt() then pins
    // exit 0 without running another round of shutdown hooks.
    System.out.flush()
    try spark.stop() catch { case _: Throwable => () }
    // exit code agrees with the artifact (ADVICE r11): a run whose
    // queries errored must not report success to an exit-code-reading
    // caller; halt (not exit) still skips the shutdown-hook race
    Runtime.getRuntime.halt(if (errors > 0) 1 else 0)
  }
}
