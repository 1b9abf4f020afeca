package graft.operators

import graft.functions.TextFns._
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines.
  *
  * Scale design: none of these enumerate the O(n²) pair space.
  *  - d01 is a hash groupBy (one shuffle).
  *  - d02 generates candidates through MinHash-LSH banding: only
  *    documents sharing a band bucket are joined.
  *  - d03 band-buckets SimHash by the pigeonhole principle: hamming
  *    ≤ 3 on 32 bits ⟹ one of 4 byte-bands equal, so the bucket
  *    join finds every qualifying pair without a cross join.
  *  - d04/d05 restrict the quadratic verify to small blocking groups
  *    (source / label) — the standard blocked-verification shape.
  */
object Dedup {

  /** d01: exact dedup by content hash; keeper = min doc_id. */
  def d01ExactDedup(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("keep_doc_id"),
           count(lit(1)).as("n_copies"),
           min(col("n_chars")).as("n_chars"))
      .orderBy("h")

  /** d13: normalization-based "fuzzy-exact" dedup (the CCNet/Gopher
    * pre-pass): lowercase, strip non-alphanumerics, collapse runs of
    * whitespace, THEN hash — so case, punctuation and spacing
    * variants of the same document collapse to one group where d01's
    * raw-byte hash keeps them apart. Same single-hash-groupBy scale
    * shape as d01 (per-row normalization is free inside codegen;
    * one shuffle on the 16-byte hash). */
  /** The d13 normalization, exposed for the spec's variant test. */
  private[graft] def normText(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", " "), "  *", " "))

  def d13NormDedup(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .select(col("doc_id"), md5(normText(col("text"))).as("norm_hash"))
      .groupBy("norm_hash")
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))
      .orderBy("norm_hash")
  }

  /** MinHash signatures, one wide row per doc (sig_0..sig_15): all 16
    * mins fall out of a single groupBy over the shingle-id set — no
    * 16× row explosion, one shuffle. Persisted: consumed by banding
    * and both pair sides. */
  private def signatures(spark: SparkSession, dir: String): DataFrame =
    // persist the shingle projection: vocab() scans it twice (counts
    // + rank) and the id join a third time — without this the
    // corpus's most expensive projection (tokenize+shingle+distinct)
    // re-runs per scan
    signaturesFrom(OpCache.cached(docShingles(Tables.documents(spark, dir))))

  private def signaturesFrom(sh: DataFrame): DataFrame = {
    val st = sh.join(vocab(sh), "term").select("doc_id", "tid")
    val aggs = (0 until 16).map(i => min(affineHash(lit(i), col("tid"))).as(s"sig_$i"))
    OpCache.cached(st.groupBy("doc_id").agg(aggs.head, aggs.tail: _*))
  }

  /** d02: MinHash-LSH near-dup candidates (8 bands × 2 rows) with
    * estimated Jaccard from signature agreement. Band keys and the
    * agreement count are computed straight off the wide signature
    * row; only the 8-per-doc band table is exploded. */
  def d02MinhashLsh(spark: SparkSession, dir: String): DataFrame =
    d02From(signatures(spark, dir))

  /** (doc_id, band, bandkey) — 8 bands × 2 signature rows per doc,
    * the LSH bucketing shared by d02's pair search and d15's
    * increment-vs-corpus probe. */
  private def bandsOf(sig: DataFrame): DataFrame = {
    val bandStructs = array((0 until 8).map { b =>
      struct(lit(b).as("band"),
        concat_ws(",", col(s"sig_${2 * b}").cast("string"),
          col(s"sig_${2 * b + 1}").cast("string")).as("bandkey"))
    }: _*)
    sig.select(col("doc_id"), explode(bandStructs).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.bandkey").as("bandkey"))
  }

  private def d02From(sig: DataFrame): DataFrame = {
    val bands = bandsOf(sig)
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bandkey") === col("b.bandkey") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val sa = sig.toDF("doc_a" +: (0 until 16).map(i => s"a_sig_$i"): _*)
    val sb = sig.toDF("doc_b" +: (0 until 16).map(i => s"b_sig_$i"): _*)
    val agree = (0 until 16)
      .map(i => when(col(s"a_sig_$i") === col(s"b_sig_$i"), 1).otherwise(0))
      .reduce(_ + _)
    cand.join(sa, "doc_a").join(sb, "doc_b")
      .select(col("doc_a"), col("doc_b"), (agree / 16.0).as("est_jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** 32-bit SimHash per document over its shingle set: all 32 bit
    * sums in one wide groupBy (no 32× explosion), then the hash is
    * assembled from the signs. Persisted: banding + both pair sides. */
  private def simhashes(spark: SparkSession, dir: String): DataFrame = {
    // persist: vocab's two passes + the id join (see signatures)
    val sh = OpCache.cached(docShingles(Tables.documents(spark, dir)))
    val st = sh.join(vocab(sh), "term").select("doc_id", "tid")
    val aggs = (0 until 32).map(j =>
      sum((affineHash(lit(j), col("tid")) % 2) * 2 - 1).as(s"s_$j"))
    val bits = (0 until 32).map(j => when(col(s"s_$j") > 0, lit(1L << j)).otherwise(0L))
    OpCache.cached(st.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"), bits.reduce(_ + _).as("simhash")))
  }

  /** d03: SimHash near-dup pairs (hamming ≤ 3) found via pigeonhole
    * byte-band bucketing — no cross join. */
  def d03Simhash(spark: SparkSession, dir: String): DataFrame = {
    val simh = simhashes(spark, dir)
    val bandStructs = array((0 until 4).map { b =>
      struct(lit(b).as("band"),
        ((col("simhash") / lit(1L << (8 * b))).cast("long") % 256).as("bandval"))
    }: _*)
    val bb = simh.select(col("doc_id"), explode(bandStructs).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.bandval").as("bandval"))
    val cand = bb.as("a").join(bb.as("b"),
        col("a.band") === col("b.band") && col("a.bandval") === col("b.bandval") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val ha = simh.select(col("doc_id").as("doc_a"), col("simhash").as("sh_a"))
    val hb = simh.select(col("doc_id").as("doc_b"), col("simhash").as("sh_b"))
    cand.join(ha, "doc_a").join(hb, "doc_b")
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long").as("hamming"))
      .filter(col("hamming") <= 3)
      .orderBy("doc_a", "doc_b")
  }

  /** d04: exact word-3-gram Jaccard for same-source pairs sharing at
    * least one shingle (blocked verification). */
  def d04NgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val sh = OpCache.cached(docShingles(docs)
      .join(docs.select("doc_id", "source"), "doc_id")) // per-doc counts + both pair sides
    val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val a = sh.select(col("doc_id").as("doc_a"), col("term"), col("source"))
    val b = sh.select(col("doc_id").as("doc_b"), col("term"), col("source"))
    val inter = a.join(b, Seq("term", "source"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("inter"))
    inter
      .join(cnt.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(cnt.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("inter"),
        (col("na") + col("nb") - col("inter")).as("un"),
        (col("inter").cast("double") / (col("na") + col("nb") - col("inter"))).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** d20: CONTAINMENT near-dup — the asymmetric overlap symmetric
    * Jaccard is blind to: a short document pasted wholesale into a
    * long one (quote farms, boilerplate inclusion, concatenated
    * dumps) shares nearly ALL of the SHORT side's shingles, but the
    * union is dominated by the long side, so Jaccard stays low and
    * the d02/d04 screens never fire. containment = |A∩B| / min(|A|,
    * |B|); pairs at containment ≥ 0.8 ship, with a `jaccard_blind`
    * flag for the ones Jaccard < 0.5 would have missed — the
    * operator's whole reason to exist, visible per row.
    *
    * All measures are over the RARE-shingle space (document
    * frequency ≤ 50, the d10-class screen, applied consistently to
    * intersection AND per-doc sizes so the ratio is well-defined):
    * without the screen a stopword shingle pairs quadratically; with
    * it the equi-join fan-out is ≤ 50 docs per shingle at any corpus
    * size. Thresholds evaluate as exact integer comparisons
    * (n_common·10 ≥ n_small·8); the two floats are single divisions
    * of exact counts. */
  def d20Containment(spark: SparkSession, dir: String): DataFrame =
    d20From(Tables.documents(spark, dir))

  /** d20's core over any (doc_id, text) frame — Round8Spec plants a
    * short-doc-inside-long-doc pair the Jaccard operators miss. */
  private[graft] def d20From(docs: DataFrame): DataFrame = {
    val sh = OpCache.cached(docShingles(docs))
    val rare = sh.groupBy("term").agg(count(lit(1)).as("df"))
      .filter(col("df") <= 50).select("term")
    // hint-free: the rare-shingle table grows with the corpus —
    // Catalyst broadcasts while it fits, shuffles beyond
    val ss = OpCache.cached(sh.join(rare, "term"))
    val cnt = ss.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = ss.select(col("doc_id").as("doc_a"), col("term"))
      .join(ss.select(col("doc_id").as("doc_b"), col("term")), "term")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_common"))
    inter
      .join(cnt.select(col("doc_id").as("doc_a"), col("n").as("n_a")), "doc_a")
      .join(cnt.select(col("doc_id").as("doc_b"), col("n").as("n_b")), "doc_b")
      .filter(col("n_common") * 10 >= least(col("n_a"), col("n_b")) * 8)
      .select(col("doc_a"), col("doc_b"), col("n_common"), col("n_a"), col("n_b"),
        (col("n_common").cast("double") / least(col("n_a"), col("n_b")))
          .as("containment"),
        (col("n_common").cast("double") / (col("n_a") + col("n_b") - col("n_common")))
          .as("jaccard"),
        (col("n_common") * 2 < col("n_a") + col("n_b") - col("n_common"))
          .as("jaccard_blind"))
      .orderBy("doc_a", "doc_b")
  }

  /** d05: embedding near-dup — exact quantized-integer cosine ≥ 0.3
    * within label blocks. */
  def d05EmbeddingNeardup(spark: SparkSession, dir: String): DataFrame = {
    val e = OpCache.cached(Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), quantize(col("embedding")).as("qv"))
      .withColumn("nrm", qnorm2(col("qv")))) // both pair sides
    val a = e.select(col("vec_id").as("vec_a"), col("label"), col("qv").as("qv_a"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("vec_b"), col("label"), col("qv").as("qv_b"), col("nrm").as("nb"))
    a.join(b, "label")
      .filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"), col("label"),
        qcos(qdot(col("qv_a"), col("qv_b")), col("na"), col("nb")).as("cos"))
      .filter(col("cos") >= 0.3)
      .orderBy("vec_a", "vec_b")
  }

  /** d06: train/test contamination — test-split documents sharing
    * enough 3-gram shingles with any train-split document (the
    * decontamination check run before training). Uses the q20 split
    * hash; the shingle equi-join bounds candidates exactly like d04. */
  def d06Contamination(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .withColumn("split", graft.functions.Fns.splitOf(col("doc_id")))
    val sh = docShingles(docs).join(docs.select("doc_id", "split"), "doc_id")
    val test = sh.filter(col("split") === "test")
      .select(col("doc_id").as("test_doc"), col("term"))
    val train = sh.filter(col("split") === "train")
      .select(col("doc_id").as("train_doc"), col("term"))
    val testSize = test.groupBy("test_doc").agg(count(lit(1)).as("n_test"))
    test.join(train, "term")
      .groupBy("test_doc", "train_doc")
      .agg(count(lit(1)).as("overlap"))
      .join(testSize, "test_doc")
      .withColumn("contamination", col("overlap").cast("double") / col("n_test"))
      .filter(col("contamination") >= 0.5)
      .select("test_doc", "train_doc", "overlap", "n_test", "contamination")
      .orderBy("test_doc", "train_doc")
  }

  /** d12: decontamination EXECUTION — d06 measures train/test
    * contamination; this emits the train-side removal list a pipeline
    * actually acts on: every train document that contaminates at
    * least one test document (≥ 0.5 shingle overlap), with how many
    * test documents it hits and its worst overlap. The removal is
    * `train EXCEPT this list` — one more semi-join. Same bounded
    * candidate generation as d06 (shingle equi-join); one extra
    * groupBy on the (small) contaminated-pair set. */
  def d12Decontaminate(spark: SparkSession, dir: String): DataFrame =
    d06Contamination(spark, dir)
      .groupBy(col("train_doc"))
      .agg(count(lit(1)).as("n_test_hits"),
        max(col("contamination")).as("worst_overlap"))
      .orderBy("train_doc")

  /** d07: near-duplicate CLUSTERS — connected components over the
    * MinHash-LSH candidate pairs (d02), so a pipeline can keep one
    * canonical document per cluster instead of reasoning about raw
    * pairs. cluster_id = min doc_id reachable through the pair graph.
    *
    * Plan: iterative min-label propagation — each round is one
    * equi-join + groupBy over the pair-graph node set (orders of
    * magnitude smaller than the corpus: only docs with ≥1 near-dup
    * candidate appear). Rounds = component diameter, bounded at 64;
    * near-dup components are shallow stars in practice. The driver
    * loop only orchestrates distributed rounds (Pregel-style) and
    * moves one Boolean per round, not data. At extreme scale the
    * same contract can be served by the alternating large-star/
    * small-star CC algorithm; the output (doc → min reachable id)
    * is identical. */
  def d07DedupClusters(spark: SparkSession, dir: String): DataFrame = {
    val pairs = d02MinhashLsh(spark, dir).select("doc_a", "doc_b")
    // Components.propagate: rounds = component diameter, fails loudly
    // past its cap rather than returning a truncated fixpoint that
    // LOOKS like clusters. Near-dup components are shallow stars;
    // a chain-shaped corpus would swap in
    // Components.starContraction (O(log n) rounds, same contract,
    // equivalence-tested in ComponentsSpec).
    val labels = Components.propagate(pairs)
    val sizes = labels.groupBy("label").agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "label")
      .select(col("node").as("doc_id"), col("label").as("cluster_id"),
        col("cluster_size"))
      .orderBy("doc_id")
  }

  /** d02 on the PRODUCTION id path: per-row md5-prefix term ids
    * instead of the rank vocabulary — no distinct-term join, no rank
    * window, pure per-row signature algebra before the band join
    * (the plan a 100 TB deployment runs; the rank vocabulary exists
    * only so d02's est_jaccard stays a small-integer agreement
    * count). Round 9 swapped the ids from xxhash64 (Spark-specific)
    * to the 60-bit md5-prefix family qa07/d19 already replay in
    * DuckDB, so this key is now FULLY oracle-checked
    * (rows+schema+hash) — and NearDupStreamSpec still ties the exact
    * same pipeline to the streaming operator's state-based replay. */
  def d02Production(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.NearDupStream.batchCandidates(
      Tables.documents(spark, dir).select("doc_id", "text"))
      .orderBy("doc_a", "doc_b")

  /** d15: INCREMENTAL dedup — screen a new ingest batch against the
    * already-accepted corpus (the shape every production pipeline
    * actually runs day-to-day: the corpus is frozen, only the
    * increment needs verdicts). The "increment" is the deterministic
    * doc_id % 10 ∈ {8,9} slice (~20% of the table) so both engines
    * agree on the fixture; a deployment substitutes its arrival
    * partition.
    *
    * Two screens, mirroring d01 + d02:
    *  - exact:   md5(text) present in the corpus → drop_exact;
    *  - near:    shares a MinHash band bucket with a corpus document
    *             (d02's 8×2 banding) → drop_near;
    *  - otherwise keep. Matches report the smallest corpus doc_id
    *    (deterministic evidence row).
    *
    * Scale shape: signatures/bands come from the SAME pipeline d02
    * uses (shared OpCache entry); both screens are equi-joins keyed
    * by hash/bandkey — cost O(increment + collisions), never a pass
    * over corpus×increment. The corpus side of both joins carries no
    * broadcast hint (it grows with the accepted corpus). */
  def d15IncrementalDedup(spark: SparkSession, dir: String): DataFrame =
    d15From(Tables.documents(spark, dir))

  /** The screen over any (doc_id, text) frame — also driven at
    * replicated scale by [[graft.Stress]]. The shingle projection is
    * the same OpCache entry d02 shares when the input plan matches. */
  private[graft] def d15From(documents: DataFrame): DataFrame = {
    val docs = documents.select(col("doc_id"), md5(col("text")).as("h"))
    val isInc = col("doc_id") % 10 >= 8
    val incDocs = docs.filter(isInc)
    val corpHash = docs.filter(!isInc)
      .groupBy("h").agg(min(col("doc_id")).as("exact_match"))
    val nearMatch = d15NearMatches(documents)
    incDocs.join(corpHash, Seq("h"), "left")
      .join(nearMatch, Seq("doc_id"), "left")
      .select(col("doc_id"), col("exact_match"), col("near_match"),
        when(col("exact_match").isNotNull, "drop_exact")
          .when(col("near_match").isNotNull, "drop_near")
          .otherwise("keep").as("verdict"))
      .orderBy("doc_id")
  }

  /** d15's NEAR screen alone — one (doc_id, near_match) row per
    * arrival document that shares a MinHash band bucket with a corpus
    * document (d02's 8×2 banding; the match is the smallest colliding
    * corpus doc_id). The shingle→signature pipeline is the shared
    * OpCache entry; the band join is an equi-join — cost
    * O(increment + collisions), never corpus×increment. NOTE: these
    * rank-vocabulary ids are arrival-dependent (the tid ranking
    * shifts as arrivals add shingles), so this screen re-bands the
    * corpus per call — the frozen serving variant is
    * [[nearMatchesFrozen]] on the production md5-prefix path. */
  private[graft] def d15NearMatches(documents: DataFrame): DataFrame = {
    val isInc = col("doc_id") % 10 >= 8
    val bands = bandsOf(signaturesFrom(OpCache.cached(docShingles(documents))))
    bands.filter(isInc)
      .join(bands.filter(!isInc)
        .select(col("doc_id").as("corp_doc"), col("band"), col("bandkey")),
        Seq("band", "bandkey"))
      .groupBy("doc_id").agg(min(col("corp_doc")).as("near_match"))
  }

  /** SHIP the frozen NEAR-DUP band index (round 17, for p29's
    * all-frozen nightly): the corpus slice's MinHash band buckets on
    * the PRODUCTION id path (d02_production / stream_neardup's
    * algebra — term ids are the vocab-free 60-bit md5-prefix hash,
    * so a corpus row's signature NEVER moves as arrivals land; the
    * rank-vocabulary ids d02/d15 use for oracle smallness are
    * arrival-DEPENDENT and cannot freeze). One (band, bandkey) →
    * min corpus doc_id row per occupied bucket, saved under the
    * [[shipBloomIndex]] versioning mechanism (atomic pointer flip,
    * superseded generation retained one freeze). The serving probe
    * ([[nearMatchesFrozen]]) is then ARRIVAL-scaled end-to-end:
    * per-row signature algebra + one hint-free equi-join against the
    * frozen buckets — the corpus is never re-banded per nightly. */
  private val NearParts = Seq("bands", "members")

  /** Band rows of a (doc_id, text) frame on the production id path —
    * ONE definition for the freeze, the frozen probe, the staleness
    * monitor and the absorb (per-row Column algebra; no corpus
    * dependence, so frozen and arriving rows band identically by
    * construction). */
  private[graft] def prodBandRows(docs: DataFrame): DataFrame =
    graft.streaming.NearDupStream
      .banded(graft.streaming.NearDupStream.withSignatures(docs)).toDF()
      .select("band", "bandkey", "doc_id")

  /** One generation's bucket table from member band rows: per
    * occupied (band, bandkey), the smallest member doc (the probe's
    * evidence row) and the occupancy (the staleness monitor's
    * hot-bucket signal — the mm12 `max_corp_occ` role). */
  private def nearBuckets(bandRows: DataFrame): DataFrame =
    bandRows.groupBy("band", "bandkey")
      .agg(min(col("doc_id")).as("corp_doc"), count(lit(1)).as("occ"))

  private def writeNearGen(spark: SparkSession, name: String, gen: Long,
                           buckets: DataFrame, members: DataFrame): Unit = {
    import graft.sources.{Bucketing, FreezeStore}
    Bucketing.resetTable(spark, FreezeStore.genTable(name, gen, "bands"))
    buckets.withColumn("gen", lit(gen)).write.mode("overwrite")
      .format("parquet").saveAsTable(FreezeStore.genTable(name, gen, "bands"))
    Bucketing.resetTable(spark, FreezeStore.genTable(name, gen, "members"))
    members.withColumn("gen", lit(gen)).write.mode("overwrite")
      .format("parquet").saveAsTable(FreezeStore.genTable(name, gen, "members"))
    FreezeStore.flipPtr(spark, name, gen, Seq(0L))
    val prev = gen - 1
    if (prev - 1 >= 1) NearParts.foreach(p =>
      Bucketing.resetTable(spark, FreezeStore.genTable(name, prev - 1, p)))
  }

  def shipNearDupIndex(spark: SparkSession, dir: String, name: String): Unit =
    graft.sources.FreezeStore.withFamilyLease(spark, name) {
      val prev = graft.sources.FreezeStore.readPtr(spark, name)
        .map(_._1).getOrElse(0L)
      val corpus = Tables.documents(spark, dir)
        .filter(!bloomArrival).select("doc_id", "text")
      writeNearGen(spark, name, prev + 1,
        nearBuckets(prodBandRows(corpus)), corpus.select("doc_id"))
    }

  /** Drop a shipped near-dup index — pointer and all generations. */
  def dropNearDupIndex(spark: SparkSession, name: String): Unit =
    graft.sources.FreezeStore.dropAll(spark, name)

  /** The near screen off the FROZEN band index: arriving (doc_id,
    * text) rows band through the literal production signature
    * algebra (per-row Column algebra, no corpus dependence) and
    * probe the shipped buckets — one (doc_id, near_match) row per
    * arrival that shares a bucket with a corpus document (the match
    * is the smallest colliding corpus doc_id, d15's evidence rule).
    * Pointer resolved ONCE per call (wholly-one-generation). */
  def nearMatchesFrozen(spark: SparkSession, arrivals: DataFrame,
                        name: String): DataFrame = {
    import graft.sources.FreezeStore
    val (gen, _) = FreezeStore.readPtr(spark, name).getOrElse(
      throw new IllegalStateException(s"no frozen near-dup index named $name"))
    val corpBands = spark.table(FreezeStore.genTable(name, gen, "bands"))
      .select("band", "bandkey", "corp_doc")
    // cost note (round-17 ProfilePasses read): ~1.5s of this probe's
    // ~1.9s wall at sf0.1 is QUERY PLANNING on the 16-lambda
    // signature expression tree (measured: .rdd conversion alone
    // costs the same as the executed count, and the wall is invariant
    // to both data size and partitioning) — per-invocation driver
    // overhead the d02_production/stream_neardup family already pays,
    // amortized to nothing at real batch sizes. A spreadSmallScan on
    // the arrival side was A/B-measured to buy nothing here for the
    // same reason (the map stage is not the cost).
    prodBandRows(arrivals)
      .join(corpBands, Seq("band", "bandkey"))
      .groupBy("doc_id").agg(min(col("corp_doc")).as("near_match"))
  }

  /** The band-drift aggregate — ONE definition for the hash-gated
    * d21 monitor key and the store-backed staleness read
    * ([[nearDupStaleness]]), the mm12 algebra on text bands: per band
    * of the 8×2 banding, the corpus bucket population (count + the
    * hottest bucket — the degenerate-text flood signal), the arrival
    * bucket counts, how many arrival buckets the corpus has never
    * seen (those arrivals cannot candidate-join at all — the probe's
    * recall proxy WITHOUT ground truth), and the arrival-row hit
    * share (ONE division of exact counts). Two map-side-combinable
    * bucket aggregates + one bucket-bounded left join → 8 rows at
    * any corpus size. */
  private[graft] def bandDriftFrom(arrBands: DataFrame,
                                   corpBuckets: DataFrame): DataFrame = {
    val cbo = corpBuckets.select("band", "bandkey", "occ")
    val abo = arrBands.groupBy("band", "bandkey").agg(count(lit(1)).as("n"))
    val cagg = cbo.groupBy("band")
      .agg(count(lit(1)).as("n_corp_buckets"), max(col("occ")).as("max_corp_occ"))
    val aagg = abo
      .join(cbo.select(col("band"), col("bandkey"), lit(1L).as("hit")),
        Seq("band", "bandkey"), "left")
      .groupBy("band")
      .agg(count(lit(1)).as("n_arr_buckets"),
        sum(when(col("hit").isNull, 1L).otherwise(0L)).as("n_new_buckets"),
        sum(col("n")).as("n_arr_rows"),
        sum(when(col("hit").isNotNull, col("n")).otherwise(0L)).as("n_arr_hit"))
    cagg.join(aagg, "band")
      .select(col("band").cast("long").as("band"),
        col("n_corp_buckets"), col("max_corp_occ"),
        col("n_arr_buckets"), col("n_new_buckets"),
        col("n_arr_rows"), col("n_arr_hit"),
        (col("n_arr_hit").cast("double") / col("n_arr_rows")).as("hit_share"))
      .orderBy("band")
  }

  /** d21: NEAR-DUP BAND DRIFT (round 17 — the text band index's
    * member of the hash-gated monitor lattice, mm12's role for the
    * d02_production banding: qa04 watches the semantic cells, mm12
    * the media bands, t20 the sparse vocabulary, t32 the tokenizer,
    * g05/g09 the graph — the near-dup screen's frozen buckets were
    * the one frozen artifact graded only inside p29's composition):
    * the arrival slice's band rows vs the corpus slice's bucket
    * population, [[bandDriftFrom]] per band. A deployment schedules
    * [[refreezeNearDupIfStale]] on rising `n_new_buckets` /falling
    * `hit_share`. All decision columns exact counts; the banding is
    * the production md5-prefix path, so the oracle replays every
    * signature verbatim. */
  def d21BandDrift(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val bands = OpCache.cached(prodBandRows(docs))
    bandDriftFrom(bands.filter(bloomArrival),
      nearBuckets(bands.filter(!bloomArrival)))
  }

  /** STALENESS of the frozen near-dup band index against an arriving
    * (doc_id, text) batch — the LITERAL d21 aggregate with the
    * corpus side read from the SHIPPED bucket table (occupancy was
    * baked at freeze, so the monitor never re-bands the corpus).
    * Arrival-scaled: per-row banding + one bucket-bounded join. */
  def nearDupStaleness(spark: SparkSession, arrivals: DataFrame,
                       name: String): DataFrame = {
    import graft.sources.FreezeStore
    val (gen, _) = FreezeStore.readPtr(spark, name).getOrElse(
      throw new IllegalStateException(s"no frozen near-dup index named $name"))
    bandDriftFrom(prodBandRows(arrivals),
      spark.table(FreezeStore.genTable(name, gen, "bands")).drop("gen"))
  }

  /** CLOSE THE DRIFT→REFREEZE LOOP for the band index: when the
    * arrivals' unseen-bucket share exceeds `maxNewShare` (exact
    * cross-multiplied integers over the per-band sums — no float
    * edge), ABSORB the arrivals and flip the pointer. UNLIKE the
    * tokenizer/classifier (whose state chains and must fully
    * retrain), band state is MERGEABLE: each document's band rows
    * depend only on its own text (the md5-prefix id property), so
    * the absorb is one bucket-table merge — old buckets ∪ the FRESH
    * arrivals' buckets, min(corp_doc) + occupancy addition — plus a
    * members append; the corpus text is NEVER re-read. Already-
    * absorbed arrivals drop at the members anti-join (the
    * Bm25IndexStore double-submission guard), so a replayed batch
    * cannot inflate occupancy. ONE lease hold across staleness read
    * → merge → flip (the r13 lost-update rule). Returns the new
    * generation when it fired. */
  def refreezeNearDupIfStale(spark: SparkSession, arrivals: DataFrame,
                             name: String,
                             maxNewShare: Double = 0.2): Option[Long] = {
    import graft.sources.FreezeStore
    FreezeStore.withFamilyLease(spark, name) {
      val s = nearDupStaleness(spark, arrivals, name)
        .agg(coalesce(sum(col("n_new_buckets")), lit(0L)).as("nb"),
          coalesce(sum(col("n_arr_buckets")), lit(0L)).as("ab")).head()
      val (nb, ab) = (s.getLong(0), s.getLong(1))
      val bp = math.round(maxNewShare * 10000)
      // ab == 0 is ambiguous (ADVICE r17): the drift aggregate
      // inner-joins corpus-band and arrival-band rows, so it is empty
      // BOTH when the arrivals band to nothing (nothing to absorb —
      // stay None) AND when the shipped bucket table itself is empty
      // (index shipped from an empty/bandless corpus — every arrival
      // bucket is unseen, i.e. MAXIMALLY stale; without this branch
      // the index stayed permanently empty because the guard could
      // never fire). One arrival-scaled banding pass disambiguates.
      val stale =
        if (ab > 0) nb * 10000 > bp * ab
        else !prodBandRows(arrivals).isEmpty
      if (!stale) None
      else absorbNearDupArrivals(spark, arrivals, name)
    }
  }

  /** ABSORB arrivals into the frozen band index UNCONDITIONALLY —
    * the mergeable-absorb step alone, factored out of
    * [[refreezeNearDupIfStale]] (round 18: the p29 nightly composes
    * serve → absorb SURVIVORS → serve, and the nightly admits what
    * it accepted regardless of any drift threshold — the staleness
    * guard is the MONITOR-driven refreeze policy, not the admission
    * path). Band state is MERGEABLE (each document's band rows
    * depend only on its own text — the md5-prefix id property), so
    * the absorb is one bucket-table merge (min corp_doc + occupancy
    * addition) plus a members append; the corpus text is NEVER
    * re-read. Already-absorbed docs drop at the members anti-join
    * (the Bm25IndexStore double-submission guard), so a replayed
    * batch cannot inflate occupancy; when NOTHING fresh remains the
    * absorb is a no-op None (no pointless generation). ONE lease
    * hold across read → merge → flip. */
  def absorbNearDupArrivals(spark: SparkSession, arrivals: DataFrame,
                            name: String): Option[Long] = {
    import graft.sources.FreezeStore
    FreezeStore.withFamilyLease(spark, name) {
      val (gen, _) = FreezeStore.readPtr(spark, name).getOrElse(
        throw new IllegalStateException(s"no frozen near-dup index named $name"))
      val members = spark.table(FreezeStore.genTable(name, gen, "members"))
        .select("doc_id")
      // one row per FRESH doc (round-17 review): the members
      // anti-join only guards against PRIOR generations, so an
      // at-least-once batch carrying the same row twice would bake
      // doubled occupancy into every later generation — the
      // groupBy collapses intra-batch replays deterministically
      // (min over a replayed identical text is that text). The
      // lazy checkpoint stops the anti-join re-running for each of
      // its THREE consumers (the isEmpty probe, the bucket merge and
      // the members append) — the absorbBloomArrivals rule.
      val fresh = arrivals.select("doc_id", "text")
        .join(members, Seq("doc_id"), "left_anti")
        .groupBy("doc_id").agg(min(col("text")).as("text"))
        .localCheckpoint(false)
      if (fresh.isEmpty) None
      else {
        val merged = spark.table(FreezeStore.genTable(name, gen, "bands"))
          .select("band", "bandkey", "corp_doc", "occ")
          .unionByName(nearBuckets(prodBandRows(fresh))
            .select("band", "bandkey", "corp_doc", "occ"))
          .groupBy("band", "bandkey")
          .agg(min(col("corp_doc")).as("corp_doc"), sum(col("occ")).as("occ"))
        writeNearGen(spark, name, gen + 1, merged,
          members.unionByName(fresh.select("doc_id")))
        Some(gen + 1)
      }
    }
  }

  /** Bloom hash family: k = 3 pairwise-independent (a·x + b) mod p
    * hashes over the 60-bit md5 prefix, same LCG-seeded family style
    * as the MinHash signatures so the DuckDB oracle replays the
    * constants verbatim (they are interpolated into the SQL from
    * THIS sequence — one definition). */
  private[graft] val BloomP = 2147483647L
  private[graft] val BloomHashes: Seq[(Long, Long)] =
    (1 to 3).map(i =>
      ((1103515245L * i + 12345L) % BloomP, (69069L * i + 1234567L) % BloomP))

  /** d19: BLOOM-FILTER pre-screen for incremental exact dedup — the
    * ship-a-filter-instead-of-joining-the-corpus pattern d15's exact
    * screen upgrades to at deployment scale. The frozen corpus's
    * content hashes are folded into a Bloom filter sized at 10 bits
    * per corpus document (k = 3 ⟹ ~1.8% false positives); an
    * arriving document tests its 3 bit positions against the filter
    * and ONLY the hits proceed to the exact corpus-hash join —
    * 'screened' rows (the vast majority of a dedup-light stream)
    * never touch corpus-sized state. Output per increment doc:
    * bloom_hit, the exact corpus match for hits, and the outcome
    * taxonomy (screened / dup / false_positive) — the FP column IS
    * the filter-calibration measurement (d11's role for banding).
    *
    * Why this matters at 100 TB: d15's exact screen joins every
    * arriving batch against a corpus-hash table that weighs ≥16
    * bytes per corpus doc and lives across executors; the Bloom
    * filter carries the same no-false-negative guarantee (spec-
    * pinned) at 1.25 bytes/doc packed into ≤ m/60 int64 words — the
    * probe is an equi-join against that words table, hint-free, so
    * Catalyst broadcasts it while it fits and shuffles on `word`
    * when a trillion-doc filter outgrows a broadcast. The exact join
    * that remains sees only hit rows: its input shrinks by the
    * screen's pass rate, not by engineering effort.
    *
    * Cross-engine exactness: positions are pure int64 arithmetic on
    * ('0x'‖md5-prefix)::int64 (Spark `conv`, DuckDB hex cast — both
    * nonnegative 60-bit), the filter words are bit_or aggregates of
    * pow(2, pos mod 60) masks (exact doubles ≤ 2⁵⁹, the simhash
    * precedent), and the filter SIZE derives from the corpus count
    * alone (m_words = n·10 div 60 + 1 — both engines floor-divide
    * identical integers), so filter layout is data-derived but
    * deterministic. Bits 60..63 stay unused: DuckDB errors on
    * 1<<63 where Spark wraps, so the word payload stays clear of
    * the sign bit on both engines. */
  def d19BloomScreen(spark: SparkSession, dir: String): DataFrame =
    d19From(Tables.documents(spark, dir))

  /** d19's core over any (doc_id, text) frame — [[graft.Stress]]
    * drives it at replicated scale; Round8Spec pins the
    * no-false-negative guarantee and the FP-rate envelope.
    * `bitsPerElem` sizes the filter (default 10 — k=3 ⟹ ~1.8% FP);
    * qa05 sweeps it for the calibration curve. The algebra below is
    * factored so the streaming twin ([[graft.streaming.BloomStream]])
    * composes the LITERAL same column definitions over a
    * stream-static join. */
  /** The fixture's arrival slice (doc_id % 10 ∈ {8,9}) — ONE
    * definition for d19From, the ship path and the frozen screen
    * (review r9: it was restated three times; the frozen screen's
    * verdicts equal d19's only while these stay in lockstep). */
  private[graft] def bloomArrival: Column = col("doc_id") % 10 >= 8

  /** Filter geometry from the corpus's DISTINCT-hash count alone
    * (frozen-index rule: nothing about the filter shifts as
    * increments arrive) — shared by the live screen, the ship path
    * AND the saturation rebuild, so every generation sits at the same
    * bits-per-element design point. Per distinct hash is the textbook
    * convention (ADVICE r17: the first cut sized the ship per corpus
    * DOC but the rebuild per stored hash — on a corpus with many
    * exact-duplicate texts the rebuilt filter came out denser than a
    * fresh ship at the same bitsPerElem; inserting a duplicate hash
    * sets no new bits, so the element count that determines fill IS
    * the distinct-hash count). */
  private[graft] def bloomGeom(corpusBase: DataFrame,
                               bitsPerElem: Long): DataFrame = {
    import graft.functions.Fns.floorDiv
    corpusBase.select("h").distinct()
      .agg(floorDiv(count(lit(1)) * bitsPerElem, 60L).as("mwm1"))
      .select(((col("mwm1") + 1L) * 60L).as("mbits"))
  }

  private[graft] def d19From(documents: DataFrame,
      bitsPerElem: Long = 10L): DataFrame = {
    val isInc = bloomArrival
    val base = bloomBase(documents)
    val geom = bloomGeom(base.filter(!isInc), bitsPerElem)
    val posed = bloomPosed(base.crossJoin(broadcast(geom)))
    val corpBits = bloomWords(posed.filter(!isInc))
    val corpHash = base.filter(!isInc)
      .groupBy("h").agg(min(col("doc_id")).as("exact_match"))
    bloomVerdicts(posed.filter(isInc), corpBits, corpHash)
      .orderBy("doc_id")
  }

  /** xm from a content hash — the ONE definition of the 60-bit
    * hex-prefix parse (round-17 review: the absorb and the geometry
    * rebuild re-derive xm from STORED hashes, and each restated the
    * formula; a drifted copy would silently desynchronize rebuilt
    * bit positions from the probe's). */
  private[graft] def xmOf(h: Column): Column =
    conv(substring(h, 1, 15), 16, 10).cast("long") % BloomP

  /** (doc_id, h = md5, xm = 60-bit hex-parsed prefix mod p). */
  private[graft] def bloomBase(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"), md5(col("text")).as("h"))
      .withColumn("xm", xmOf(col("h")))

  /** The k = 3 bit positions; expects an `mbits` column (batch: a
    * broadcast 1-row cross join; stream: a shipped literal). */
  private[graft] def bloomPosed(withM: DataFrame): DataFrame = {
    def pos(i: Int): Column = {
      val (a, b) = BloomHashes(i)
      (lit(a) * col("xm") + lit(b)) % BloomP % col("mbits")
    }
    withM.select(col("doc_id"), col("h"),
      pos(0).as("p1"), pos(1).as("p2"), pos(2).as("p3"))
  }

  private[graft] def bloomMask(p: Column): Column =
    pow(lit(2.0), p % 60L).cast("long")

  /** Filter build: 3 positions per corpus doc → ≤ m/60 (word, bits)
    * rows; the groupBy is map-side combinable down to the word
    * count. OpCache'd: the three per-hash probe joins would
    * otherwise each rebuild it (the alias-renamed broadcast builds
    * defeat Spark's ReuseExchange — plan-audited), turning one
    * corpus-sized filter build into three; the filter IS the frozen
    * artifact, built once per corpus freeze. */
  private[graft] def bloomWords(posedCorp: DataFrame): DataFrame = {
    import graft.functions.Fns.floorDiv
    OpCache.cached(posedCorp
      .select(explode(array(col("p1"), col("p2"), col("p3"))).as("p"))
      .select(floorDiv(col("p"), 60L).as("word"), bloomMask(col("p")).as("m"))
      .groupBy("word").agg(expr("bit_or(m)").as("bits")))
  }

  /** Probe + verdict over positioned increment rows: three hint-free
    * equi-joins on word (broadcast while the filter fits — or
    * stream-static), bit tests in the join projection, and ONLY hits
    * reach the exact corpus join — that asymmetry IS the operator;
    * misses carry a null without touching corpus-sized state. */
  private[graft] def bloomVerdicts(posedInc: DataFrame, corpBits: DataFrame,
      corpHash: DataFrame): DataFrame = {
    import graft.functions.Fns.floorDiv
    def bw(i: Int): DataFrame =
      corpBits.select(col("word").as(s"w$i"), col("bits").as(s"bits$i"))
    val probed = posedInc
      .join(bw(1), floorDiv(col("p1"), 60L) === col("w1"), "left")
      .join(bw(2), floorDiv(col("p2"), 60L) === col("w2"), "left")
      .join(bw(3), floorDiv(col("p3"), 60L) === col("w3"), "left")
      .withColumn("bloom_hit",
        (coalesce(col("bits1"), lit(0L)).bitwiseAND(bloomMask(col("p1"))) =!= 0L) &&
        (coalesce(col("bits2"), lit(0L)).bitwiseAND(bloomMask(col("p2"))) =!= 0L) &&
        (coalesce(col("bits3"), lit(0L)).bitwiseAND(bloomMask(col("p3"))) =!= 0L))
      .select("doc_id", "h", "bloom_hit")
    val hits = probed.filter(col("bloom_hit"))
      .join(corpHash, Seq("h"), "left")
    val misses = probed.filter(!col("bloom_hit"))
      .withColumn("exact_match", lit(null).cast("long"))
    hits.unionByName(misses)
      .select(col("doc_id"), col("bloom_hit"), col("exact_match"),
        when(!col("bloom_hit"), "screened")
          .when(col("exact_match").isNotNull, "dup")
          .otherwise("false_positive").as("outcome"))
  }

  /** SHIP the frozen Bloom screen — d19's corpus-side artifacts
    * (filter geometry, filter words, exact corpus-hash table) as
    * managed tables, so later sessions screen arrivals WITHOUT
    * re-folding the corpus (the shipIvfpqIndex rule applied to the
    * membership screen; at 100 TB the filter build is one corpus
    * pass per freeze, the probe path is arrival-scaled only). The
    * words table is ≤ mbits/60 rows (1.25 bytes/corpus-doc of
    * payload) — broadcast-sized until a trillion-doc corpus, and the
    * probe joins are hint-free so Catalyst shuffles on `word` when
    * it outgrows one.
    *
    * VERSIONED (VERDICT r9 #1, the AnnIndexStore mechanism): the
    * three components land under `<name>_g<N>_<part>` and commit via
    * one atomic pointer flip, so a re-freeze concurrent with a live
    * screen is wholly-old or wholly-new, never a mixed filter (a new
    * geometry probed against old words would silently mis-position
    * every bit test). The superseded generation is retained for live
    * readers and retired by the freeze after next. */
  private val BloomParts = Seq("geom", "words", "hash")

  def shipBloomIndex(spark: SparkSession, dir: String, name: String,
                     bitsPerElem: Long = 10L): Unit =
    graft.sources.FreezeStore.withFamilyLease(spark, name) {
      val prev = graft.sources.FreezeStore.readPtr(spark, name)
        .map(_._1).getOrElse(0L)
      val base = bloomBase(Tables.documents(spark, dir)).filter(!bloomArrival)
      val geom = bloomGeom(base, bitsPerElem)
      writeBloomGen(spark, name, prev + 1, geom,
        bloomWords(bloomPosed(base.crossJoin(broadcast(geom)))),
        base.groupBy("h").agg(min(col("doc_id")).as("exact_match")))
    }

  /** Drop a shipped Bloom screen — pointer and all generations. */
  def dropBloomIndex(spark: SparkSession, name: String): Unit =
    graft.sources.FreezeStore.dropAll(spark, name)

  /** The saturation aggregate — ONE definition for the hash-gated
    * d22 monitor key and the store-backed read
    * ([[bloomSaturationFrozen]]): given the filter's word table, its
    * geometry and the loaded distinct-hash count, ONE row — occupied
    * words, exact set-bit mass (`bit_count` — identical two's-
    * complement semantics on both engines for these nonnegative
    * sub-2⁶⁰ payloads), the fill share (one division of exact
    * integers) and the k=3 predicted false-positive rate (fill³ — a
    * product of three identical doubles, so the hash gate holds).
    * Word-table-scaled: never a corpus pass. */
  private[graft] def bloomSaturationFrom(words: DataFrame, geom: DataFrame,
                                         nHashes: DataFrame): DataFrame =
    words.agg(count(lit(1)).as("n_words"),
        coalesce(sum(bit_count(col("bits")).cast("long")), lit(0L))
          .as("bits_set"))
      .crossJoin(broadcast(geom))
      .crossJoin(broadcast(nHashes))
      .select(col("n_hashes"), col("mbits"), col("n_words"), col("bits_set"),
        (col("bits_set").cast("double") / col("mbits")).as("fill_share"),
        (col("bits_set").cast("double") / col("mbits") *
          (col("bits_set").cast("double") / col("mbits")) *
          (col("bits_set").cast("double") / col("mbits"))).as("est_fp_rate"))

  /** d22: BLOOM-FILTER SATURATION (round 17 — the membership
    * screen's member of the hash-gated monitor lattice; qa05 grades
    * filter SIZING before a freeze, THIS grades the live filter's
    * remaining headroom as absorbs accumulate): the corpus-slice
    * filter's fill share and the k=3 predicted FP rate it implies.
    * The WHEN-to-rebuild signal for a geometry that was sized at
    * freeze time: absorbed arrivals keep OR-ing bits into a FIXED
    * mbits, fill climbs, and past the design point (10 bits/doc ⟹
    * fill ≈ 0.26, FP ≈ 1.8%) every additional absorb degrades the
    * screen quadratically — a deployment rebuilds the geometry
    * ([[refreezeBloomIfSaturated]]) before that. */
  def d22BloomSaturation(spark: SparkSession, dir: String): DataFrame = {
    val base = bloomBase(Tables.documents(spark, dir)).filter(!bloomArrival)
    val geom = bloomGeom(base, 10L)
    bloomSaturationFrom(
      bloomWords(bloomPosed(base.crossJoin(broadcast(geom)))),
      geom,
      base.select("h").distinct().agg(count(lit(1)).as("n_hashes")))
  }

  /** STALENESS of the frozen Bloom screen — the LITERAL d22
    * aggregate over the SHIPPED components (geometry, words, hash
    * table): word-table-scaled, no corpus pass, the pointer resolved
    * once. */
  def bloomSaturationFrozen(spark: SparkSession, name: String): DataFrame = {
    import graft.sources.FreezeStore
    val (gen, _) = FreezeStore.readPtr(spark, name).getOrElse(
      throw new IllegalStateException(s"no frozen bloom screen named $name"))
    def part(p: String) = spark.table(FreezeStore.genTable(name, gen, p))
      .drop("gen")
    bloomSaturationFrom(part("words"), part("geom"),
      part("hash").agg(count(lit(1)).as("n_hashes")))
  }

  /** ABSORB accepted arrivals into the frozen Bloom screen — the
    * band store's mergeable-absorb story for the membership filter:
    * Bloom words are bit_or-MERGEABLE and the hash table unions, so
    * the absorb is one word-table merge + a hash append under the
    * FROZEN geometry — never a corpus re-read. The hash part IS the
    * membership list, so the double-submission guard is a plain h
    * anti-join (a replayed batch adds nothing). Returns the new
    * generation (no-op None when nothing fresh arrived). */
  def absorbBloomArrivals(spark: SparkSession, arrivals: DataFrame,
                          name: String): Option[Long] = {
    import graft.sources.FreezeStore
    FreezeStore.withFamilyLease(spark, name) {
      val (gen, _) = FreezeStore.readPtr(spark, name).getOrElse(
        throw new IllegalStateException(s"no frozen bloom screen named $name"))
      def part(p: String) = spark.table(FreezeStore.genTable(name, gen, p))
        .drop("gen")
      // checkpoint the anti-joined batch (round-17 review): THREE
      // actions read it (the isEmpty probe and both part writes) —
      // re-evaluating a membership-scaled anti-join per action is
      // 3× the absorb's cost, and a source that changed between the
      // jobs could compute the words and hash parts from DIFFERENT
      // row sets, breaking the no-false-negative guarantee
      val fresh = bloomBase(arrivals)
        .groupBy("h").agg(min(col("doc_id")).as("exact_match"))
        .join(part("hash").select("h"), Seq("h"), "left_anti")
        .localCheckpoint(false)
      if (fresh.isEmpty) None
      else {
        val geom = part("geom")
        val freshWords = bloomWords(bloomPosed(
          fresh.select(col("exact_match").as("doc_id"), col("h"),
              xmOf(col("h")).as("xm"))
            .crossJoin(broadcast(geom))))
        val mergedWords = part("words").unionByName(freshWords)
          .groupBy("word").agg(expr("bit_or(bits)").as("bits"))
        val mergedHash = part("hash")
          .unionByName(fresh.select("h", "exact_match"))
        writeBloomGen(spark, name, gen + 1, geom, mergedWords, mergedHash)
        Some(gen + 1)
      }
    }
  }

  /** CLOSE THE SATURATION→REBUILD LOOP: when the live filter's fill
    * share exceeds `maxFill` (exact cross-multiplied integers —
    * bits_set·10⁴ vs bp·mbits, no float edge), rebuild the geometry
    * sized to the GROWN hash count and re-position every stored hash
    * — entirely from the shipped hash part (xm re-derives from h),
    * so even the full rebuild never touches corpus text: the whole
    * lifecycle is hash-part-scaled. ONE lease hold across read →
    * rebuild → flip. Returns the new generation when it fired. */
  def refreezeBloomIfSaturated(spark: SparkSession, name: String,
                               maxFill: Double = 0.35,
                               bitsPerElem: Long = 10L): Option[Long] = {
    import graft.sources.FreezeStore
    FreezeStore.withFamilyLease(spark, name) {
      val s = bloomSaturationFrozen(spark, name)
        .select("bits_set", "mbits").head()
      val bp = math.round(maxFill * 10000)
      if (s.getLong(0) * 10000 <= bp * s.getLong(1)) None
      else {
        val (gen, _) = FreezeStore.readPtr(spark, name).get
        val hash = spark.table(FreezeStore.genTable(name, gen, "hash"))
          .drop("gen")
        // the ONE sizing definition (ADVICE r17): the hash part's
        // rows are already distinct, so bloomGeom's distinct pass is
        // a no-op semantically — the rebuild and a fresh ship land on
        // identical geometry for the same membership set
        val geom = bloomGeom(hash, bitsPerElem)
        val words = bloomWords(bloomPosed(
          hash.select(col("exact_match").as("doc_id"), col("h"),
              xmOf(col("h")).as("xm"))
            .crossJoin(broadcast(geom))))
        writeBloomGen(spark, name, gen + 1, geom, words, hash)
        Some(gen + 1)
      }
    }
  }

  private def writeBloomGen(spark: SparkSession, name: String, gen: Long,
      geom: DataFrame, words: DataFrame, hash: DataFrame): Unit = {
    import graft.sources.{Bucketing, FreezeStore}
    def save(df: DataFrame, p: String): Unit = {
      Bucketing.resetTable(spark, FreezeStore.genTable(name, gen, p))
      df.withColumn("gen", lit(gen)).write.mode("overwrite").format("parquet")
        .saveAsTable(FreezeStore.genTable(name, gen, p))
    }
    // materialize merged parts BEFORE any reset could touch inputs:
    // all three read the SUPERSEDED generation's tables, which stay
    // in place (only gen-2-back retires), so plain writes are safe
    save(geom, "geom"); save(words, "words"); save(hash, "hash")
    FreezeStore.flipPtr(spark, name, gen, Seq(0L))
    val prev = gen - 1
    if (prev - 1 >= 1) BloomParts.foreach(p =>
      Bucketing.resetTable(spark, FreezeStore.genTable(name, prev - 1, p)))
  }

  /** d19's screen over the arrival slice against a FROZEN filter
    * shipped by [[shipBloomIndex]] — the literal bloomPosed/
    * bloomVerdicts algebra over loaded tables (rows identical to
    * d19BloomScreen when the freeze covers the same corpus;
    * AnnShipSpec pins it across a fresh session). The pointer is
    * resolved ONCE here, so all three components come from one
    * generation. */
  def d19ScreenFrozen(spark: SparkSession, dir: String,
                      name: String): DataFrame =
    bloomScreenFrozen(spark,
      Tables.documents(spark, dir).filter(bloomArrival), name)
      .orderBy("doc_id")

  /** The frozen screen over ANY arriving (doc_id, text) frame —
    * [[d19ScreenFrozen]] with the arrival batch as a parameter
    * (round 18: the p29 nightly serves per-night batches, not the
    * fixture slice). Same wholly-one-generation read: the pointer
    * resolves ONCE and all three components come off it. */
  def bloomScreenFrozen(spark: SparkSession, arrivals: DataFrame,
                        name: String): DataFrame = {
    import graft.sources.FreezeStore
    val (gen, _) = FreezeStore.readPtr(spark, name).getOrElse(
      throw new IllegalStateException(s"no frozen bloom screen named $name"))
    def part(p: String) = spark.table(FreezeStore.genTable(name, gen, p))
      .drop("gen")
    val inc = bloomBase(arrivals)
    bloomVerdicts(bloomPosed(inc.crossJoin(broadcast(part("geom")))),
      part("words"), part("hash"))
  }

  /** qa05's swept filter sizes (bits per corpus element). Also
    * interpolated into the generated oracle SQL — the grid cannot
    * drift (the s14 pattern). 10 is d19's production setting. */
  private[graft] val BloomBitsGrid: Seq[Long] = Seq(2L, 5L, 10L, 20L)

  /** qa05: Bloom-filter CALIBRATION CURVE — d19's screen swept over
    * [[BloomBitsGrid]] filter sizes, reporting per setting the
    * outcome mass (screened / dup / false-positive) and the realized
    * FP rate over the non-duplicate arrivals. The memory/selectivity
    * trade a deployment tunes: at 2 bits/doc the filter saturates
    * and nearly everything false-hits (the exact join does all the
    * work — the filter bought nothing); at 10 the hit path is ~2%;
    * at 20 it halves again at twice the broadcast. d11 plays this
    * calibration role for MinHash banding, s12/s16 for probe depth —
    * this is the same measurement for the membership screen.
    *
    * The dup count is invariant across settings (no false negatives
    * at ANY size — spec-pinned), so the curve isolates exactly the
    * FP term. Cost: |grid| passes of a linear screen, each
    * independent — the sweep is an eval-time tool; production runs
    * one setting. */
  def qa05BloomCurve(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    BloomBitsGrid.map { b =>
      d19From(docs, b)
        .agg(
          sum(when(col("outcome") === "screened", 1L).otherwise(0L)).as("n_screened"),
          sum(when(col("outcome") === "dup", 1L).otherwise(0L)).as("n_dup"),
          sum(when(col("outcome") === "false_positive", 1L).otherwise(0L)).as("n_fp"))
        .select(lit(b).as("bits_per_elem"), col("n_screened"), col("n_dup"),
          col("n_fp"),
          (col("n_fp").cast("double") / (col("n_screened") + col("n_fp")))
            .as("fp_rate"))
    }.reduce(_ unionByName _).orderBy("bits_per_elem")
  }

  /** d18: INCREMENTAL semantic dedup — d15's increment-vs-frozen-
    * corpus discipline applied to d08's embedding modality,
    * completing the incremental family (d15 hash+band, d17 verbatim
    * spans, d18 embeddings): each new-batch vector (vec_id % 10 ∈
    * {8,9}, d15's deterministic arrival slice) is screened against
    * the FROZEN corpus through the corpus's own IVF cells — assigned
    * to its nearest frozen centroid, compared only against that
    * cell's corpus members, verdict drop_near when its best corpus
    * cosine reaches d08's 0.3 threshold, with the nearest corpus
    * vector reported either way. Catches the arriving paraphrase of
    * an existing document that d15's hash/band screens cannot see.
    *
    * Frozen-index rules (nothing shifts as increments arrive): the
    * bounded-k centroid stride derives from the CORPUS id range
    * alone, and cells/occupants are corpus-only — a deployment
    * prebuilds both at corpus freeze (the d17 seed-index pattern).
    *
    * Scale shape: two linear bounded-k broadcast assignments (corpus
    * n×k once at freeze, increment m×k per batch); ONE equi-join on
    * cell between the increment and the corpus assignment — the
    * corpus side carries no broadcast hint (it grows with the
    * accepted corpus); the per-vector argmax is a map-side
    * min(struct) groupBy, no window. Cost per batch is
    * O(m×k + m×occupancy), never O(corpus). */
  def d18IncrementalSemdedup(spark: SparkSession, dir: String): DataFrame =
    d18From(Tables.embeddings(spark, dir).select("vec_id", "embedding"))

  /** The frozen semantic-index pair d18 screens against — (bounded-k
    * centroids, cell-assigned corpus) — as a standalone build step: a
    * deployment prebuilds both at corpus freeze (the d17 seed-index
    * pattern) and hands them to batch d18 or to the streaming twin
    * ([[graft.streaming.SemStream]]). */
  private[graft] def semFrozenIndex(corpusVecs: DataFrame): (DataFrame, DataFrame) = {
    val corp = corpusVecs
      .select(col("vec_id"), quantize(col("embedding")).as("qv"))
      .withColumn("nrm", qnorm2(col("qv")))
    val cents = Similarity.boundedCents(corp)
    val corpAssign = cellAssignment(corp, cents)
      .select(col("vec_id").as("corp_id"), col("cell"),
        col("qv").as("qv_c"), col("nrm").as("nc"))
    (cents, corpAssign)
  }

  /** d18's core over any (vec_id, embedding) frame — also driven at
    * replicated scale by [[graft.Stress]]. */
  private[graft] def d18From(vecs: DataFrame): DataFrame = {
    val isInc = col("vec_id") % 10 >= 8
    val (cents, corpAssign) = semFrozenIndex(vecs.filter(!isInc))
    val incAssign = cellAssignment(
        vecs.filter(isInc)
          .select(col("vec_id"), quantize(col("embedding")).as("qv"))
          .withColumn("nrm", qnorm2(col("qv"))),
        cents)
      .select(col("vec_id"), col("cell"), col("qv").as("qv_i"), col("nrm").as("ni"))
    // nearest same-cell corpus member per increment vector, as a
    // TWO-PHASE argmax (max cosine, then min corp_id among the
    // exact-double-equality ties — d09's deterministic rule): a
    // min(struct) single pass would force a SortAggregate over the
    // full pair set (structs are not hash-aggregable), which at a
    // duplicate-heavy 40× stress point means sorting tens of
    // millions of rows — measured 50s of a 61s total. Two plain
    // hash aggregates + one broadcastable increment-sized join keep
    // every stage codegen'd and map-side combinable; the pair
    // cosines are evaluated twice, but LongArrayDot pairs are ~5×
    // cheaper than the sort they replace.
    val pair = incAssign.join(corpAssign, Seq("cell"))
      .select(col("vec_id"), col("corp_id"),
        qcos(qdot(col("qv_i"), col("qv_c")), col("ni"), col("nc")).as("cos"))
    val bestCos = pair.groupBy("vec_id").agg(max(col("cos")).as("nearest_cos"))
    // cos === nearest_cos is exact: both sides are the same double
    // arithmetic over the same operands (no re-rounding anywhere)
    val best = pair.join(bestCos, "vec_id")
      .filter(col("cos") === col("nearest_cos"))
      .groupBy("vec_id").agg(min(col("corp_id")).as("nearest_corp"),
        max(col("nearest_cos")).as("nearest_cos"))
    // left join: an increment landing in a cell whose corpus members
    // are all elsewhere (duplicate-centroid edge) keeps NULLs → keep
    incAssign.select("vec_id", "cell").join(best, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"), col("nearest_corp"), col("nearest_cos"),
        when(col("nearest_cos") >= 0.3, "drop_near").otherwise("keep").as("verdict"))
      .orderBy("vec_id")
  }

  /** d16: cross-source CONTENT-overlap matrix — for every source
    * pair, the Jaccard similarity of their distinct word-3-gram
    * shingle sets (the provenance diagnostic run before mixing
    * corpora: two crawls of the same site share phrasing long before
    * they share byte-identical documents; this makes that overlap a
    * number per pair).
    *
    * Scale shape: one distinct to (term, source) granularity — the
    * self-join runs on that DEDUPLICATED table keyed on the shingle
    * term, so its cost is Σ sources-per-term² (bounded by |sources|²
    * per term, never corpus²); per-source set sizes come from one
    * tiny groupBy and the output is ≤ C(|sources|, 2) rows. */
  def d16SourceOverlap(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val ss = OpCache.cached(
      docShingles(docs).join(docs.select("doc_id", "source"), "doc_id")
        .select("term", "source").distinct())
    val sz = ss.groupBy("source").agg(count(lit(1)).as("n"))
    val a = ss.select(col("term"), col("source").as("source_a"))
    val b = ss.select(col("term"), col("source").as("source_b"))
    a.join(b, "term")
      .filter(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("inter"))
      .join(broadcast(sz.select(col("source").as("source_a"), col("n").as("na"))), "source_a")
      .join(broadcast(sz.select(col("source").as("source_b"), col("n").as("nb"))), "source_b")
      .select(col("source_a"), col("source_b"), col("inter"),
        (col("na") + col("nb") - col("inter")).as("un"),
        (col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
          .as("jaccard"))
      .orderBy("source_a", "source_b")
  }

  /** d08: SEMANTIC dedup (SemDeDup-style) — embedding-space
    * near-duplicate clusters: vectors are blocked into their nearest
    * IVF cell (s03's deterministic every-50th centroids), exact
    * cosine pairs ≥ 0.3 are enumerated only WITHIN a cell, and
    * connected components over those pairs yield one keeper per
    * semantic cluster. The method that catches paraphrase/translation
    * duplicates exact and token-shingle dedup (d01/d02) cannot see.
    *
    * Scale shape: cell assignment is n×k broadcast cosines (no corpus
    * shuffle) with the argmax as ONE map-side `min(struct)` groupBy —
    * no window over the corpus; the quadratic verify is bounded per
    * cell (cells ~ n/50 keep occupancy flat as the corpus grows, the
    * IVF property); clustering runs over the tiny pair graph only.
    * Cosines are exact int64 arithmetic (LongArrayDot), bit-equal in
    * the oracle. */
  def d08SemanticDedup(spark: SparkSession, dir: String): DataFrame =
    semanticClustersFrom(
      Tables.embeddings(spark, dir).select("vec_id", "embedding"))

  /** d08 on the PRODUCTION centroid rule (fixed k — see
    * [[Similarity.boundedCents]]): constant-size centroid broadcast
    * and a linear n×k assignment at any corpus size, where the
    * every-50th oracle rule grows k with n. Cell occupancy grows
    * n/k, so a deployment scales k (~√n, SemDeDup-style tens of
    * thousands) to keep the within-cell verify bounded; the rule is
    * the same deterministic arithmetic either way. */
  def d08Production(spark: SparkSession, dir: String): DataFrame =
    semanticClustersFrom(
      Tables.embeddings(spark, dir).select("vec_id", "embedding"),
      boundedK = true)

  /** d08's core over any (vec_id, embedding) frame — also driven at
    * replicated scale by [[graft.Stress]]. */
  def semanticClustersFrom(vecs: DataFrame, boundedK: Boolean = false): DataFrame = {
    val e = vecs
      .select(col("vec_id"), quantize(col("embedding")).as("qv"))
      .withColumn("nrm", qnorm2(col("qv")))
      .persist() // assignment + both pair sides
    // oracle path: same deterministic every-Nth "training" rule as
    // s03/s04 — keep the constant in ONE place (the DuckDB oracles
    // encode it too); production path: fixed-k bounded rule
    val cents =
      if (boundedK) Similarity.boundedCents(e)
      else e.filter(col("vec_id") % Similarity.CentroidStride === 0)
        .select(col("vec_id").as("c_id"), col("qv").as("c_qv"), col("nrm").as("c_nrm"))
    val assign = cellAssignment(e, cents)
      .persist() // both pair sides: the n×k assignment runs ONCE
    val a = assign.select(col("vec_id").as("vec_a"), col("cell"),
      col("qv").as("qv_a"), col("nrm").as("na"))
    val b = assign.select(col("vec_id").as("vec_b"), col("cell"),
      col("qv").as("qv_b"), col("nrm").as("nb"))
    val pairs = a.join(b, "cell")
      .filter(col("vec_a") < col("vec_b"))
      .filter(qcos(qdot(col("qv_a"), col("qv_b")), col("na"), col("nb")) >= 0.3)
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
    // star contraction, not propagation: a cosine-threshold graph is
    // chain-prone (A≈B≈C without A≈C), so rounds must be O(log n),
    // not O(diameter) — same (node → min reachable id) contract,
    // equivalence-tested in ComponentsSpec
    val labels = Components.starContraction(pairs)
    // the contraction loop checkpoints its node and edge frames and
    // materializes both before returning (the round-16 shape: lazy
    // checkpoints forced by the loop's own count actions), so nothing
    // lazy references e/assign anymore — release their executor
    // storage (a long-lived session calling this repeatedly must not
    // pin one corpus copy per call)
    assign.unpersist()
    e.unpersist()
    val sizes = labels.groupBy("label").agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "label")
      .select(col("node").as("vec_id"), col("label").as("cluster_id"),
        col("cluster_size"), (col("node") === col("label")).as("is_keeper"))
      .orderBy("vec_id")
  }

  /** The d08 assignment stage alone — nearest-centroid cell per
    * vector via the argmax-as-min(struct) map-side groupBy (no
    * window over the corpus). Exposed for [[graft.Stress]]'s
    * linearity probe: at fixed k the cost is n×k cosines. */
  private[graft] def cellAssignment(e: DataFrame, cents: DataFrame): DataFrame =
    e.crossJoin(broadcast(cents))
      .select(col("vec_id"),
        struct((lit(0.0) - qcos(qdot(col("qv"), col("c_qv")), col("nrm"), col("c_nrm")))
          .as("nc"), col("c_id").as("c")).as("cand"))
      .groupBy("vec_id")
      .agg(min(col("cand")).as("m"))
      .select(col("vec_id"), col("m.c").as("cell"))
      .join(e, "vec_id")

  /** [[cellAssignment]] keeping the WINNING cosine: (vec_id, cell,
    * cos-to-own-centroid). The double negation is exact, so `cos` is
    * bit-identical to the oracle's ranked c_cos. */
  private[graft] def cellFit(e: DataFrame, cents: DataFrame): DataFrame =
    e.crossJoin(broadcast(cents))
      .select(col("vec_id"),
        struct((lit(0.0) - qcos(qdot(col("qv"), col("c_qv")), col("nrm"), col("c_nrm")))
          .as("nc"), col("c_id").as("c")).as("cand"))
      .groupBy("vec_id")
      .agg(min(col("cand")).as("m"))
      .select(col("vec_id"), col("m.c").as("cell"),
        (lit(0.0) - col("m.nc")).as("cos"))

  /** qa04: FROZEN-INDEX staleness monitor — the re-freeze trigger
    * the incremental family (d15/d17/d18) was missing: those
    * operators assume the frozen index stays representative of what
    * keeps arriving, and nothing measured WHEN that stops being
    * true. Per frozen cell, this reports both drift signals a
    * deployment schedules a re-cluster on:
    *
    *  - occupancy skew: the increment population's share of the cell
    *    minus the corpus's own share (`occ_skew`) — increments
    *    crowding into few cells mean the quantizer no longer spreads
    *    arriving data (cell imbalance degrades every d18 screen that
    *    joins on cell);
    *  - fit drift: mean cosine-to-own-centroid of the increment side
    *    minus the corpus's own (`fit_drift_micro`, in micro-cosine
    *    units) — increments sitting systematically farther from
    *    their best centroid than the corpus does mean the centroids
    *    no longer describe the arriving distribution.
    *
    * Oracle parity: cosines are the exact d08 machinery; per-side
    * MEANS are sums of floor(cos·1e6) BIGINTs (floor is exact on
    * both engines; a raw double sum would be summation-order-
    * dependent) divided by exact counts — identical operands,
    * identical doubles. Shares divide two exact counts.
    *
    * Scale shape: two bounded-k broadcast assignments (the d18
    * frames), two map-side-combinable groupBys on cell, one
    * full-outer join of k-row aggregates plus a 1-row totals
    * broadcast (the q19 pattern) — no corpus-sized shuffle, no
    * window, cost O(n×k) like the screens it monitors.
    *
    * RE-FREEZE CADENCE (ADVICE r10): when this monitor TRIPS a
    * refresh, mind the frozen store's retention contract — a reader
    * bound to generation N survives exactly `retain` (default 1)
    * subsequent re-freezes ([[graft.sources.AnnIndexStore.write]]).
    * So the minimum safe interval between staleness-triggered
    * re-freezes is the longest-running search you allow, or raise
    * `retain` to cover the expected trip frequency; the per-batch
    * streaming reader ([[graft.streaming.AnnStream]]) re-binds every
    * micro-batch and is safe at any cadence. */
  def qa04IndexStaleness(spark: SparkSession, dir: String): DataFrame =
    qa04From(Tables.embeddings(spark, dir).select("vec_id", "embedding"))

  /** qa04's core over any (vec_id, embedding) frame — PropertySpec
    * injects a drifted increment batch to show the metrics move. */
  private[graft] def qa04From(vecs: DataFrame): DataFrame = {
    val isInc = col("vec_id") % 10 >= 8
    def quant(df: DataFrame): DataFrame = df
      .select(col("vec_id"), quantize(col("embedding")).as("qv"))
      .withColumn("nrm", qnorm2(col("qv")))
    val corp = quant(vecs.filter(!isInc))
    val incE = quant(vecs.filter(isInc))
    val cents = Similarity.boundedCents(corp)
    def fitAgg(e: DataFrame, nCol: String, sumCol: String): DataFrame =
      cellFit(e, cents)
        .select(col("cell"), floor(col("cos") * 1000000.0).as("cm"))
        .groupBy("cell")
        .agg(count(lit(1)).as(nCol), sum("cm").as(sumCol))
    val corpFit = fitAgg(corp, "n_corp", "corp_cos_sum")
    val incFit = fitAgg(incE, "n_inc", "inc_cos_sum")
    val totals = corp.agg(count(lit(1)).as("tot_corp"))
      .crossJoin(incE.agg(count(lit(1)).as("tot_inc")))
    corpFit.join(incFit, Seq("cell"), "full_outer")
      .crossJoin(broadcast(totals))
      .select(col("cell"),
        coalesce(col("n_corp"), lit(0L)).as("n_corp"),
        coalesce(col("n_inc"), lit(0L)).as("n_inc"),
        (coalesce(col("n_corp"), lit(0L)).cast("double") / col("tot_corp"))
          .as("corp_share"),
        (coalesce(col("n_inc"), lit(0L)).cast("double") / col("tot_inc"))
          .as("inc_share"),
        (col("corp_cos_sum").cast("double") / col("n_corp"))
          .as("corp_mean_cos_micro"),
        (col("inc_cos_sum").cast("double") / col("n_inc"))
          .as("inc_mean_cos_micro"))
      .withColumn("occ_skew", col("inc_share") - col("corp_share"))
      .withColumn("fit_drift_micro",
        col("inc_mean_cos_micro") - col("corp_mean_cos_micro"))
      .orderBy("cell")
  }

  /** d09: fuzzy nearest neighbor by edit distance — for each document,
    * the closest other document of its (source, length-band) block by
    * Levenshtein distance on the 120-char prefix. The char-level
    * fuzzy-match stage that catches OCR/typo near-dups token shingles
    * miss.
    *
    * Scale shape: candidate pairs exist only within (source,
    * n_chars÷32) blocks — the standard length-band blocking that
    * keeps the quadratic verify bounded per block (edit distance ≤
    * band width is impossible to satisfy across distant bands for
    * full texts; the prefix distance inherits the blocking as its
    * candidate policy). The per-doc argmin is one map-side
    * min(struct) groupBy, no window. */
  def d09EditDistance(spark: SparkSession, dir: String): DataFrame = {
    val docs = OpCache.cached(Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        (col("n_chars") / 32).cast("long").as("band"),
        substring(col("text"), 1, 120).as("pfx"))) // both self-join sides
    val a = docs.select(col("doc_id").as("doc_a"), col("source"),
      col("band"), col("pfx").as("pfx_a"))
    val b = docs.select(col("doc_id").as("doc_b"), col("source"),
      col("band"), col("pfx").as("pfx_b"))
    a.join(b, Seq("source", "band"))
      .filter(col("doc_a") =!= col("doc_b"))
      .select(col("doc_a"),
        struct(levenshtein(col("pfx_a"), col("pfx_b")).cast("long").as("d"),
          col("doc_b").as("n")).as("cand"))
      .groupBy("doc_a")
      .agg(min(col("cand")).as("m"))
      .select(col("doc_a"), col("m.n").as("nn_doc"), col("m.d").as("edit_dist"))
      .orderBy("doc_a")
  }

  /** d09 on the PRODUCTION candidate policy: the (source, length-band)
    * block is further sub-blocked by CONTENT, so the per-block
    * Levenshtein verify stays bounded at any corpus size (the
    * d02/d08/s03_production precedent — d09EditDistance remains the
    * oracle-parity exact twin of the all-pairs-within-block policy).
    *
    * Candidate policy: the 120-char prefix is cut into eight 15-char
    * position-aligned chunks; two documents are candidates iff they
    * agree on at least one (position, chunk) key inside their
    * (source, length-band) block — the pigeonhole screen for
    * substitution-dominated (OCR/typo) near-dups: ≤ 7 substitutions
    * in the prefix leave at least one of the 8 chunks untouched. A
    * pair differing in every chunk is not a near-dup and is exactly
    * what the screen should drop (position-shifting insertions can
    * break chunk alignment — the documented recall trade; d02's
    * token shingles catch those). Chunk keys
    * occurring > [[D09MaxChunkFreq]] times in their block are
    * screened out BEFORE the pair join (d14's seed-frequency
    * precedent: a boilerplate prefix shared by thousands of docs
    * would otherwise re-create the quadratic block this operator
    * exists to remove), so candidate pairs per key are ≤ freq² with
    * freq bounded — sub-quadratic growth under replication, probed
    * by [[graft.Stress]].
    *
    * Sub-8-char chunks (the tail of prefixes shorter than the chunk
    * grid) are dropped from the KEY set only: near-empty keys
    * degenerate to "everyone in the block matches". Documents whose
    * every chunk is screened out produce no verdict row — the
    * documented recall trade of the production screen. */
  def d09Production(spark: SparkSession, dir: String): DataFrame =
    d09ProductionFrom(Tables.documents(spark, dir))

  /** Chunk occurrence cap for the d09 production screen — also
    * hardcoded in the DuckDB oracle (`f <= 100`); change BOTH. */
  private[graft] val D09MaxChunkFreq = 100L

  /** d09_production's core over any (doc_id, source, n_chars, text)
    * frame — also driven at replicated scale by [[graft.Stress]]. */
  private[graft] def d09ProductionFrom(documents: DataFrame): DataFrame = {
    val docs = OpCache.cached(documents
      .select(col("doc_id"), col("source"),
        (col("n_chars") / 32).cast("long").as("band"),
        substring(col("text"), 1, 120).as("pfx"))) // chunk keys + both verify sides
    val chunks = docs.select(col("doc_id"), col("source"), col("band"),
        explode(array((0 until 8).map(j =>
          struct(lit(j).as("j"), substring(col("pfx"), j * 15 + 1, 15).as("chunk"))): _*)).as("c"))
      .select(col("doc_id"), col("source"), col("band"),
        col("c.j").as("j"), col("c.chunk").as("chunk"))
      .filter(length(col("chunk")) >= 8)
    val blockKey = Seq("source", "band", "j", "chunk")
    // the frequency table grows with the corpus — no broadcast hint
    // (the d10 span-df convention); Catalyst broadcasts while small
    val freq = chunks.groupBy(blockKey.head, blockKey.tail: _*)
      .agg(count(lit(1)).as("f"))
    val ok = chunks.join(freq, blockKey).filter(col("f") <= D09MaxChunkFreq)
    val cand = ok.select(col("doc_id").as("doc_a"), col("source"), col("band"),
        col("j"), col("chunk"))
      .join(ok.select(col("doc_id").as("doc_b"), col("source"), col("band"),
        col("j"), col("chunk")), blockKey)
      .filter(col("doc_a") =!= col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct() // a pair can agree on several chunk positions
    cand
      .join(docs.select(col("doc_id").as("doc_a"), col("pfx").as("pfx_a")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("pfx").as("pfx_b")), "doc_b")
      .select(col("doc_a"),
        struct(levenshtein(col("pfx_a"), col("pfx_b")).cast("long").as("d"),
          col("doc_b").as("n")).as("cand"))
      .groupBy("doc_a")
      .agg(min(col("cand")).as("m"))
      .select(col("doc_a"), col("m.n").as("nn_doc"), col("m.d").as("edit_dist"))
      .orderBy("doc_a")
  }

  /** d10: exact duplicated-span coverage — the share of each
    * document's 8-token spans that appear verbatim in at least one
    * other span occurrence corpus-wide (the exact-substring
    * duplication signal; a full suffix-array pass generalizes the
    * span length, the fixed-n profile is the scalable screen run
    * first).
    *
    * Scale shape: span df is one groupBy over the distinct span set;
    * the spans⋈df join carries NO broadcast hint — unlike t07's
    * df≥8% boilerplate set, the span-frequency table grows with the
    * corpus, so the hint is left to Catalyst: it broadcasts at small
    * scale and falls back to a shuffle join on `term` (reusing the
    * aggregate's partitioning) when the table outgrows the
    * threshold. The per-doc rollup is a second groupBy. */
  def d10DupSpans(spark: SparkSession, dir: String): DataFrame = {
    val sh = OpCache.cached(docShingles(Tables.documents(spark, dir), 8))
    val dfreq = sh.groupBy("term").agg(count(lit(1)).as("df"))
    sh.join(dfreq, "term")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_spans"),
        coalesce(sum(when(col("df") >= 2, 1L)), lit(0L)).as("n_dup_spans"))
      .select(col("doc_id"), col("n_spans"), col("n_dup_spans"),
        (col("n_dup_spans").cast("double") / col("n_spans")).as("dup_span_ratio"))
      .orderBy("doc_id")
  }

  /** d14: MAXIMAL verbatim shared spans — the variable-length
    * generalization of d10's fixed-8-token screen (the
    * suffix-array-style "dedup training data" measurement, e.g. Lee
    * et al. 2021, computed with relational algebra instead of a
    * suffix array): for every document pair, every maximal token
    * span ≥ 12 tokens that appears verbatim in both.
    *
    * Seed-and-extend on the diagonal: a shared verbatim span of
    * length L ≥ 8 contains L−7 matching 8-gram seed positions with
    * the SAME position offset (diagonal = pos_a − pos_b), so maximal
    * spans are exactly the maximal runs of consecutive seed
    * positions per (doc_a, doc_b, diagonal) — the gaps-and-islands
    * trick (pos − row_number) merges each run in one partitioned
    * window, and run_len + 7 recovers the span length.
    *
    * Scale shape: seeds with occurrence count > 50 are screened out
    * BEFORE the pair join (boilerplate 8-grams would make the join
    * quadratic; a span whose EVERY seed is that common is boilerplate
    * by definition — d10/t07 measure those). What remains joins on
    * the seed equi-key exactly like d04/d06, and the island window
    * partitions by (pair, diagonal) — thin slices of the match
    * table, never the corpus. */
  def d14DupSpanPairs(spark: SparkSession, dir: String): DataFrame =
    spanPairsFrom(Tables.documents(spark, dir))

  /** d14's core over any (doc_id, text) frame — also driven at
    * replicated scale by [[graft.Stress]]. */
  private[graft] def spanPairsFrom(docs: DataFrame, minSpan: Int = 12,
                                   maxSeedFreq: Long = 50L): DataFrame = {
    val seeds = spanSeeds(docs)
    val freq = seeds.groupBy("term").agg(count(lit(1)).as("f"))
    val ok = seeds.join(freq, "term").filter(col("f") <= maxSeedFreq)
      .select("doc_id", "pos", "term")
    val pr = ok.as("a").join(ok.as("b"),
        col("a.term") === col("b.term") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.pos").as("ia"), col("b.pos").as("ib"),
        (col("a.pos") - col("b.pos")).as("diag"))
    val w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("ia")
    pr.withColumn("grp", col("ia") - row_number().over(w))
      .groupBy("doc_a", "doc_b", "diag", "grp")
      .agg(min(col("ia")).as("a_start"), min(col("ib")).as("b_start"),
        (count(lit(1)) + 7).as("span_tokens"))
      .filter(col("span_tokens") >= minSpan)
      .select("doc_a", "doc_b", "a_start", "b_start", "span_tokens")
      .orderBy("doc_a", "doc_b", "a_start", "b_start")
  }

  /** Positioned 8-gram seed table (doc_id, pos, term) — d14's seed
    * stage, shared with d17's increment-vs-corpus screen (same
    * OpCache entry when the input plan matches). */
  private[graft] def spanSeeds(docs: DataFrame): DataFrame =
    OpCache.cached(spanSeedsRaw(docs))

  /** The seed explode WITHOUT the cache wrapper — usable on a
    * STREAMING frame (graft.streaming.SpanStream), where persisting
    * is illegal; batch callers go through [[spanSeeds]]. */
  private[graft] def spanSeedsRaw(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), tokens(col("text")).as("t"))
    toks.filter(size(col("t")) >= 8)
      .select(col("doc_id"), explode(transform(sequence(lit(1), size(col("t")) - 7),
        i => struct(i.cast("long").as("pos"),
          concat_ws(" ", (0 until 8).map(k => element_at(col("t"), i + k)): _*).as("term"))))
        .as("s"))
      .select(col("doc_id"), col("s.pos").as("pos"), col("s.term").as("term"))
  }

  /** The frozen-corpus seed index d17 screens against, as a
    * standalone build step: positioned seeds of the CORPUS docs with
    * the ≤ maxSeedFreq occurrence screen applied (frequency computed
    * over the corpus alone — the index does not shift as increments
    * arrive). Output (doc_corp, ib, term). A deployment builds this
    * once per corpus freeze and hands it to batch d17 or to the
    * streaming twin ([[graft.streaming.SpanStream]]) as a static
    * side. */
  private[graft] def corpusSeedIndex(corpusDocs: DataFrame,
                                     maxSeedFreq: Long = 50L): DataFrame = {
    val corp = spanSeeds(corpusDocs)
    val corpFreq = corp.groupBy("term").agg(count(lit(1)).as("f"))
    corp.join(corpFreq, "term").filter(col("f") <= maxSeedFreq)
      .select(col("doc_id").as("doc_corp"), col("pos").as("ib"), col("term"))
  }

  /** d17: INCREMENTAL span screen — d15's increment-vs-corpus
    * discipline applied to d14's verbatim-span measurement: every
    * maximal token span ≥ 12 tokens that a new-batch document shares
    * verbatim with any frozen-corpus document. The increment is the
    * same deterministic doc_id % 10 ∈ {8,9} slice d15 uses; a
    * deployment substitutes its arrival partition and a prebuilt
    * corpus seed index.
    *
    * Why this exists: d14's pairwise form needs unbounded streaming
    * state (any past doc can pair with any future one), so it has no
    * streaming twin. Screening an increment against a FROZEN corpus
    * index is the boundable middle ground: seed join cost is
    * O(increment seeds × matched corpus seeds), islands run only on
    * increment-touched (pair, diagonal) slices, and the corpus side
    * is never rescanned per batch.
    *
    * Scale shape: the corpus seed index carries d14's ≤ 50
    * occurrence screen (computed over the corpus side alone — the
    * frozen index is built once and does not shift as increments
    * arrive), which bounds the per-seed fan-out of the join; the
    * corpus side of the join carries no broadcast hint (it grows
    * with the accepted corpus). The island window partitions by
    * (doc_inc, doc_corp, diag) — thin slices of the match table. */
  def d17IncrementalSpans(spark: SparkSession, dir: String): DataFrame =
    incrementalSpansFrom(Tables.documents(spark, dir))

  /** d17's core over any (doc_id, text) frame — also driven at
    * replicated scale by [[graft.Stress]]. */
  private[graft] def incrementalSpansFrom(documents: DataFrame,
                                          minSpan: Int = 12,
                                          maxSeedFreq: Long = 50L): DataFrame = {
    val seeds = spanSeeds(documents)
    val isInc = col("doc_id") % 10 >= 8
    val corp = seeds.filter(!isInc)
    val corpFreq = corp.groupBy("term").agg(count(lit(1)).as("f"))
    val corpIdx = corp.join(corpFreq, "term").filter(col("f") <= maxSeedFreq)
      .select(col("doc_id").as("doc_corp"), col("pos").as("ib"), col("term"))
    val inc = seeds.filter(isInc)
      .select(col("doc_id").as("doc_inc"), col("pos").as("ia"), col("term"))
    val pr = inc.join(corpIdx, "term")
      .select(col("doc_inc"), col("doc_corp"), col("ia"), col("ib"),
        (col("ia") - col("ib")).as("diag"))
    val w = Window.partitionBy("doc_inc", "doc_corp", "diag").orderBy("ia")
    pr.withColumn("grp", col("ia") - row_number().over(w))
      .groupBy("doc_inc", "doc_corp", "diag", "grp")
      .agg(min(col("ia")).as("inc_start"), min(col("ib")).as("corp_start"),
        (count(lit(1)) + 7).as("span_tokens"))
      .filter(col("span_tokens") >= minSpan)
      .select("doc_inc", "doc_corp", "inc_start", "corp_start", "span_tokens")
      .orderBy("doc_inc", "doc_corp", "inc_start", "corp_start")
  }

  /** d11: LSH estimate quality — for every d02 candidate pair, the
    * MinHash-estimated Jaccard next to the EXACT shingle Jaccard and
    * the signed estimation error: the calibration measurement that
    * tells a pipeline where to put its banding threshold (the dedup
    * analog of s05's ANN recall).
    *
    * Plan shape: the expensive parts are reused — d02's persisted
    * signatures produce the candidates and estimates; the exact
    * verify joins the shingle table ONLY through the candidate pair
    * list (two semi-join-shaped hash joins on doc id + one groupBy
    * per pair), so the exact Jaccard is computed for |candidates|
    * pairs, never the O(n²) pair space. */
  def d11LshQuality(spark: SparkSession, dir: String): DataFrame = {
    // ONE shingle pass feeds both the signature path (candidates +
    // estimates) and the exact verify — not a second corpus scan
    val sh = OpCache.cached(docShingles(Tables.documents(spark, dir)))
    val est = d02From(signaturesFrom(sh))
    // exact-verify shape shared with d04 (cnt + bounded pair
    // intersection + inter/(na+nb-inter)); the pair source differs:
    // d04 enumerates blocked pairs from the shingle self-join, d11
    // restricts to the LSH candidate list
    val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = est.select("doc_a", "doc_b")
      .join(sh.select(col("doc_id").as("doc_a"), col("term")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("term")), Seq("doc_b", "term"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("inter"))
    est.join(inter, Seq("doc_a", "doc_b"), "left")
      .join(cnt.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(cnt.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .withColumn("inter", coalesce(col("inter"), lit(0L)))
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"),
        (col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
          .as("exact_jaccard"))
      .withColumn("err", col("est_jaccard") - col("exact_jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  // Oracle CTE fragments shared with the pipeline oracle (Pipeline.scala)
  private[operators] val shCte =
      """sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS term
        |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i
        |        FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents) d0
        |        WHERE len(t) >= 3) d),
        |v AS (SELECT term, CAST(row_number() OVER (ORDER BY term) AS BIGINT) AS tid
        |      FROM (SELECT DISTINCT term FROM sh) x),
        |st AS (SELECT doc_id, tid FROM sh JOIN v USING (term))""".stripMargin
  private[operators] val sigCte =
      """sig AS (SELECT doc_id, i,
        |  min((((1103515245 * (i + 1) + 12345) % 2147483647) * tid + ((69069 * (i + 1) + 1234567) % 2147483647)) % 2147483647) AS sig
        |  FROM st, generate_series(0, 15) g(i) GROUP BY doc_id, i)""".stripMargin
  private[operators] val candCte =
      """bands AS (SELECT doc_id, i // 2 AS band, string_agg(CAST(sig AS VARCHAR), ',' ORDER BY i) AS bandkey
        |          FROM sig GROUP BY doc_id, i // 2),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |         FROM bands a JOIN bands b ON a.band = b.band AND a.bandkey = b.bandkey AND a.doc_id < b.doc_id)""".stripMargin
  private[operators] val simhCte =
      """simh AS (SELECT doc_id, CAST(SUM(bit * CAST(pow(2, j) AS BIGINT)) AS BIGINT) AS simhash
        |  FROM (SELECT doc_id, j,
        |    CASE WHEN SUM(2 * (((((1103515245 * (j + 1) + 12345) % 2147483647) * tid + ((69069 * (j + 1) + 1234567) % 2147483647)) % 2147483647) % 2) - 1) > 0
        |         THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS bit
        |    FROM st, generate_series(0, 31) g(j) GROUP BY doc_id, j) b
        |  GROUP BY doc_id)""".stripMargin

  /** min-reachable-label closure over the candidate-pair graph
    * (requires WITH RECURSIVE). */
  private[operators] val clusterCte =
    """edges AS (SELECT doc_a AS src, doc_b AS dst FROM cand
      |          UNION ALL SELECT doc_b, doc_a FROM cand),
      |walk(node, reach) AS (
      |  SELECT DISTINCT src, src AS reach FROM edges
      |  UNION
      |  SELECT w.node, e.dst FROM walk w JOIN edges e ON e.src = w.reach),
      |lab AS (SELECT node AS doc_id, MIN(reach) AS cluster_id FROM walk GROUP BY node)""".stripMargin

  val oracles: Map[String, String] = {
    // d19's hash constants AND qa05's bits grid are interpolated
    // from BloomHashes/BloomBitsGrid — Spark side and oracle cannot
    // drift; the whole CTE chain is ONE builder reused (suffixed)
    // for every swept filter size
    val Seq((ba1, bb1), (ba2, bb2), (ba3, bb3)) = BloomHashes
    def bloomCtes(bits: Long, s: String): String =
      s"""x$s AS (SELECT doc_id, md5(text) AS h,
         |    ('0x' || substr(md5(text), 1, 15))::BIGINT % $BloomP AS xm
         |  FROM documents),
         |par$s AS (SELECT (((SELECT COUNT(DISTINCT h) FROM x$s WHERE doc_id % 10 < 8) * $bits) // 60 + 1) * 60 AS mbits),
         |pos$s AS (SELECT doc_id, h,
         |    (($ba1 * xm + $bb1) % $BloomP) % mbits AS p1,
         |    (($ba2 * xm + $bb2) % $BloomP) % mbits AS p2,
         |    (($ba3 * xm + $bb3) % $BloomP) % mbits AS p3
         |  FROM x$s CROSS JOIN par$s),
         |cb$s AS (SELECT p // 60 AS word, bit_or(CAST(pow(2, p % 60) AS BIGINT)) AS bits
         |  FROM (SELECT p1 AS p FROM pos$s WHERE doc_id % 10 < 8
         |        UNION ALL SELECT p2 FROM pos$s WHERE doc_id % 10 < 8
         |        UNION ALL SELECT p3 FROM pos$s WHERE doc_id % 10 < 8) t
         |  GROUP BY p // 60),
         |corph$s AS (SELECT h, MIN(doc_id) AS exact_match FROM x$s WHERE doc_id % 10 < 8 GROUP BY h),
         |probe$s AS (SELECT i.doc_id, i.h,
         |    (COALESCE(b1.bits, 0) & CAST(pow(2, i.p1 % 60) AS BIGINT)) <> 0
         |    AND (COALESCE(b2.bits, 0) & CAST(pow(2, i.p2 % 60) AS BIGINT)) <> 0
         |    AND (COALESCE(b3.bits, 0) & CAST(pow(2, i.p3 % 60) AS BIGINT)) <> 0 AS bloom_hit
         |  FROM pos$s i
         |  LEFT JOIN cb$s b1 ON b1.word = i.p1 // 60
         |  LEFT JOIN cb$s b2 ON b2.word = i.p2 // 60
         |  LEFT JOIN cb$s b3 ON b3.word = i.p3 // 60
         |  WHERE i.doc_id % 10 >= 8),
         |scr$s AS (SELECT p.doc_id, p.bloom_hit,
         |    CASE WHEN p.bloom_hit THEN c.exact_match END AS exact_match,
         |    CASE WHEN NOT p.bloom_hit THEN 'screened'
         |         WHEN c.exact_match IS NOT NULL THEN 'dup'
         |         ELSE 'false_positive' END AS outcome
         |  FROM probe$s p LEFT JOIN corph$s c USING (h))""".stripMargin
    val qa05Branches = BloomBitsGrid.map { b =>
      s"""SELECT $b AS bits_per_elem,
         |  COUNT(*) FILTER (outcome = 'screened') AS n_screened,
         |  COUNT(*) FILTER (outcome = 'dup') AS n_dup,
         |  COUNT(*) FILTER (outcome = 'false_positive') AS n_fp,
         |  CAST(COUNT(*) FILTER (outcome = 'false_positive') AS DOUBLE)
         |    / (COUNT(*) FILTER (outcome = 'screened') + COUNT(*) FILTER (outcome = 'false_positive')) AS fp_rate
         |FROM scr_$b""".stripMargin
    }.mkString("\nUNION ALL\n")
    Map(
      "d19_bloom_screen" ->
        ("WITH " + bloomCtes(10L, "") + """
          |SELECT doc_id, bloom_hit, exact_match, outcome FROM scr
          |ORDER BY doc_id""".stripMargin),

      "qa05_bloom_curve" ->
        ("WITH " + BloomBitsGrid.map(b => bloomCtes(b, s"_$b")).mkString(",\n") + "\n" +
          qa05Branches + "\nORDER BY bits_per_elem"),

      // d22: the filter's saturation read off the same builder — the
      // probe/screen CTEs go unreferenced and prune away
      "d22_bloom_saturation" ->
        ("WITH " + bloomCtes(10L, "") + """,
          |sat AS (SELECT
          |    (SELECT COUNT(DISTINCT h) FROM x WHERE doc_id % 10 < 8) AS n_hashes,
          |    (SELECT mbits FROM par) AS mbits,
          |    (SELECT COUNT(*) FROM cb) AS n_words,
          |    (SELECT CAST(SUM(bit_count(bits)) AS BIGINT) FROM cb) AS bits_set)
          |SELECT n_hashes, mbits, n_words, bits_set,
          |  CAST(bits_set AS DOUBLE) / mbits AS fill_share,
          |  (CAST(bits_set AS DOUBLE) / mbits) * (CAST(bits_set AS DOUBLE) / mbits)
          |    * (CAST(bits_set AS DOUBLE) / mbits) AS est_fp_rate
          |FROM sat""".stripMargin),
      // d08's quantization CTEs split corpus/increment on the d15
      // arrival rule; the centroid stride derives from the CORPUS id
      // range only (frozen-index rule)
      // d18's corpus/increment/centroid CTEs; each side's assignment
      // keeps its winning cosine, per-side means are exact BIGINT
      // sums of floor(cos·1e6) over the assigned cell
      "qa04_index_staleness" ->
        """WITH q AS (SELECT vec_id,
          |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qv
          |  FROM embeddings),
          |n AS (SELECT vec_id, qv,
          |    CAST(list_aggregate(list_transform(qv, x -> x * x), 'sum') AS BIGINT) AS nrm FROM q),
          |corp AS (SELECT * FROM n WHERE vec_id % 10 < 8),
          |inc AS (SELECT * FROM n WHERE vec_id % 10 >= 8),
          |cents AS (SELECT vec_id AS c_id, qv AS c_qv, nrm AS c_nrm FROM corp
          |          WHERE vec_id % ((SELECT MAX(vec_id) // 64 FROM corp) + 1) = 0),
          |cscored AS (SELECT v.vec_id, c.c_id,
          |    CAST((SELECT SUM(v.qv[i] * c.c_qv[i]) FROM generate_series(1, 64) g(i)) AS BIGINT)
          |      / (sqrt(CAST(v.nrm AS DOUBLE)) * sqrt(CAST(c.c_nrm AS DOUBLE))) AS c_cos
          |  FROM corp v CROSS JOIN cents c),
          |cfit AS (SELECT cell, COUNT(*) AS n_corp,
          |    CAST(SUM(CAST(floor(c_cos * 1000000.0) AS BIGINT)) AS BIGINT) AS corp_cos_sum
          |  FROM (SELECT vec_id, c_id AS cell, c_cos,
          |      row_number() OVER (PARTITION BY vec_id ORDER BY c_cos DESC, c_id) AS crn FROM cscored) t
          |  WHERE crn = 1 GROUP BY cell),
          |iscored AS (SELECT v.vec_id, c.c_id,
          |    CAST((SELECT SUM(v.qv[i] * c.c_qv[i]) FROM generate_series(1, 64) g(i)) AS BIGINT)
          |      / (sqrt(CAST(v.nrm AS DOUBLE)) * sqrt(CAST(c.c_nrm AS DOUBLE))) AS c_cos
          |  FROM inc v CROSS JOIN cents c),
          |ifit AS (SELECT cell, COUNT(*) AS n_inc,
          |    CAST(SUM(CAST(floor(c_cos * 1000000.0) AS BIGINT)) AS BIGINT) AS inc_cos_sum
          |  FROM (SELECT vec_id, c_id AS cell, c_cos,
          |      row_number() OVER (PARTITION BY vec_id ORDER BY c_cos DESC, c_id) AS crn FROM iscored) t
          |  WHERE crn = 1 GROUP BY cell),
          |tot AS (SELECT (SELECT COUNT(*) FROM corp) AS tot_corp, (SELECT COUNT(*) FROM inc) AS tot_inc)
          |SELECT cell,
          |  COALESCE(c.n_corp, 0) AS n_corp,
          |  COALESCE(i.n_inc, 0) AS n_inc,
          |  CAST(COALESCE(c.n_corp, 0) AS DOUBLE) / t.tot_corp AS corp_share,
          |  CAST(COALESCE(i.n_inc, 0) AS DOUBLE) / t.tot_inc AS inc_share,
          |  CAST(c.corp_cos_sum AS DOUBLE) / c.n_corp AS corp_mean_cos_micro,
          |  CAST(i.inc_cos_sum AS DOUBLE) / i.n_inc AS inc_mean_cos_micro,
          |  CAST(COALESCE(i.n_inc, 0) AS DOUBLE) / t.tot_inc - CAST(COALESCE(c.n_corp, 0) AS DOUBLE) / t.tot_corp AS occ_skew,
          |  CAST(i.inc_cos_sum AS DOUBLE) / i.n_inc - CAST(c.corp_cos_sum AS DOUBLE) / c.n_corp AS fit_drift_micro
          |FROM cfit c FULL OUTER JOIN ifit i USING (cell) CROSS JOIN tot t
          |ORDER BY cell""".stripMargin,

      "d18_incremental_semdedup" ->
        """WITH q AS (SELECT vec_id,
          |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qv
          |  FROM embeddings),
          |n AS (SELECT vec_id, qv,
          |    CAST(list_aggregate(list_transform(qv, x -> x * x), 'sum') AS BIGINT) AS nrm FROM q),
          |corp AS (SELECT * FROM n WHERE vec_id % 10 < 8),
          |inc AS (SELECT * FROM n WHERE vec_id % 10 >= 8),
          |cents AS (SELECT vec_id AS c_id, qv AS c_qv, nrm AS c_nrm FROM corp
          |          WHERE vec_id % ((SELECT MAX(vec_id) // 64 FROM corp) + 1) = 0),
          |cscored AS (SELECT v.vec_id, v.qv, v.nrm, c.c_id,
          |    CAST((SELECT SUM(v.qv[i] * c.c_qv[i]) FROM generate_series(1, 64) g(i)) AS BIGINT)
          |      / (sqrt(CAST(v.nrm AS DOUBLE)) * sqrt(CAST(c.c_nrm AS DOUBLE))) AS c_cos
          |  FROM corp v CROSS JOIN cents c),
          |cassign AS (SELECT vec_id AS corp_id, qv AS qv_c, nrm AS nc, c_id AS cell FROM (
          |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY c_cos DESC, c_id) AS crn FROM cscored) t
          |  WHERE crn = 1),
          |iscored AS (SELECT v.vec_id, v.qv, v.nrm, c.c_id,
          |    CAST((SELECT SUM(v.qv[i] * c.c_qv[i]) FROM generate_series(1, 64) g(i)) AS BIGINT)
          |      / (sqrt(CAST(v.nrm AS DOUBLE)) * sqrt(CAST(c.c_nrm AS DOUBLE))) AS c_cos
          |  FROM inc v CROSS JOIN cents c),
          |iassign AS (SELECT vec_id, qv AS qv_i, nrm AS ni, c_id AS cell FROM (
          |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY c_cos DESC, c_id) AS crn FROM iscored) t
          |  WHERE crn = 1),
          |pair AS (SELECT i.vec_id, c.corp_id,
          |    CAST((SELECT SUM(i.qv_i[k] * c.qv_c[k]) FROM generate_series(1, 64) g(k)) AS BIGINT)
          |      / (sqrt(CAST(i.ni AS DOUBLE)) * sqrt(CAST(c.nc AS DOUBLE))) AS cos
          |  FROM iassign i JOIN cassign c USING (cell)),
          |best AS (SELECT vec_id, corp_id AS nearest_corp, cos AS nearest_cos FROM (
          |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, corp_id) AS rn FROM pair) t
          |  WHERE rn = 1)
          |SELECT i.vec_id, i.cell, b.nearest_corp, b.nearest_cos,
          |  CASE WHEN b.nearest_cos >= 0.3 THEN 'drop_near' ELSE 'keep' END AS verdict
          |FROM iassign i LEFT JOIN best b USING (vec_id) ORDER BY i.vec_id""".stripMargin,

      "d11_lsh_quality" ->
        ("WITH " + shCte + ",\n" + sigCte + ",\n" + candCte + """,
          |est AS (SELECT doc_a, doc_b,
          |    CAST(SUM(CASE WHEN sa.sig = sb.sig THEN 1 ELSE 0 END) AS BIGINT) / 16.0 AS est_jaccard
          |  FROM cand JOIN sig sa ON sa.doc_id = doc_a JOIN sig sb ON sb.doc_id = doc_b AND sb.i = sa.i
          |  GROUP BY doc_a, doc_b),
          |cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
          |itr AS (SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
          |        FROM cand c JOIN sh a ON a.doc_id = c.doc_a
          |          JOIN sh b ON b.doc_id = c.doc_b AND b.term = a.term
          |        GROUP BY c.doc_a, c.doc_b)
          |SELECT e.doc_a, e.doc_b, est_jaccard,
          |  CAST(COALESCE(itr.inter, 0) AS DOUBLE) / (ca.n + cb.n - COALESCE(itr.inter, 0)) AS exact_jaccard,
          |  est_jaccard - CAST(COALESCE(itr.inter, 0) AS DOUBLE) / (ca.n + cb.n - COALESCE(itr.inter, 0)) AS err
          |FROM est e LEFT JOIN itr ON itr.doc_a = e.doc_a AND itr.doc_b = e.doc_b
          |JOIN cnt ca ON ca.doc_id = e.doc_a JOIN cnt cb ON cb.doc_id = e.doc_b
          |ORDER BY e.doc_a, e.doc_b""".stripMargin),

      // identical clustering semantics to d08; only the centroid
      // rule differs (fixed k=64 via the id-range stride)
      "d08_production" ->
        """WITH RECURSIVE q AS (SELECT vec_id,
          |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qv
          |  FROM embeddings),
          |n AS (SELECT vec_id, qv,
          |    CAST(list_aggregate(list_transform(qv, x -> x * x), 'sum') AS BIGINT) AS nrm FROM q),
          |cents AS (SELECT vec_id AS c_id, qv AS c_qv, nrm AS c_nrm FROM n
          |          WHERE vec_id % ((SELECT MAX(vec_id) // 64 FROM n) + 1) = 0),
          |scored AS (SELECT v.vec_id, v.qv, v.nrm, c.c_id,
          |    CAST((SELECT SUM(v.qv[i] * c.c_qv[i]) FROM generate_series(1, 64) g(i)) AS BIGINT)
          |      / (sqrt(CAST(v.nrm AS DOUBLE)) * sqrt(CAST(c.c_nrm AS DOUBLE))) AS c_cos
          |  FROM n v CROSS JOIN cents c),
          |assign AS (SELECT vec_id, qv, nrm, c_id AS cell FROM (
          |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY c_cos DESC, c_id) AS crn FROM scored) t
          |  WHERE crn = 1),
          |cand AS (SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
          |  FROM assign a JOIN assign b ON a.cell = b.cell AND a.vec_id < b.vec_id
          |  WHERE CAST((SELECT SUM(a.qv[i] * b.qv[i]) FROM generate_series(1, 64) g(i)) AS BIGINT)
          |      / (sqrt(CAST(a.nrm AS DOUBLE)) * sqrt(CAST(b.nrm AS DOUBLE))) >= 0.3),
          |edges AS (SELECT doc_a AS src, doc_b AS dst FROM cand
          |          UNION ALL SELECT doc_b, doc_a FROM cand),
          |walk(node, reach) AS (
          |  SELECT DISTINCT src, src AS reach FROM edges
          |  UNION
          |  SELECT w.node, e.dst FROM walk w JOIN edges e ON e.src = w.reach),
          |lab AS (SELECT node AS vec_id, MIN(reach) AS cluster_id FROM walk GROUP BY node),
          |sz AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM lab GROUP BY cluster_id)
          |SELECT vec_id, cluster_id, cluster_size, vec_id = cluster_id AS is_keeper
          |FROM lab JOIN sz USING (cluster_id) ORDER BY vec_id""".stripMargin,

      "d08_semantic_dedup" ->
        """WITH RECURSIVE q AS (SELECT vec_id,
          |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qv
          |  FROM embeddings),
          |n AS (SELECT vec_id, qv,
          |    CAST(list_aggregate(list_transform(qv, x -> x * x), 'sum') AS BIGINT) AS nrm FROM q),
          |cents AS (SELECT vec_id AS c_id, qv AS c_qv, nrm AS c_nrm FROM n WHERE vec_id % 50 = 0),
          |scored AS (SELECT v.vec_id, v.qv, v.nrm, c.c_id,
          |    CAST((SELECT SUM(v.qv[i] * c.c_qv[i]) FROM generate_series(1, 64) g(i)) AS BIGINT)
          |      / (sqrt(CAST(v.nrm AS DOUBLE)) * sqrt(CAST(c.c_nrm AS DOUBLE))) AS c_cos
          |  FROM n v CROSS JOIN cents c),
          |assign AS (SELECT vec_id, qv, nrm, c_id AS cell FROM (
          |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY c_cos DESC, c_id) AS crn FROM scored) t
          |  WHERE crn = 1),
          |cand AS (SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
          |  FROM assign a JOIN assign b ON a.cell = b.cell AND a.vec_id < b.vec_id
          |  WHERE CAST((SELECT SUM(a.qv[i] * b.qv[i]) FROM generate_series(1, 64) g(i)) AS BIGINT)
          |      / (sqrt(CAST(a.nrm AS DOUBLE)) * sqrt(CAST(b.nrm AS DOUBLE))) >= 0.3),
          |edges AS (SELECT doc_a AS src, doc_b AS dst FROM cand
          |          UNION ALL SELECT doc_b, doc_a FROM cand),
          |walk(node, reach) AS (
          |  SELECT DISTINCT src, src AS reach FROM edges
          |  UNION
          |  SELECT w.node, e.dst FROM walk w JOIN edges e ON e.src = w.reach),
          |lab AS (SELECT node AS vec_id, MIN(reach) AS cluster_id FROM walk GROUP BY node),
          |sz AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM lab GROUP BY cluster_id)
          |SELECT vec_id, cluster_id, cluster_size, vec_id = cluster_id AS is_keeper
          |FROM lab JOIN sz USING (cluster_id) ORDER BY vec_id""".stripMargin,

      "d09_edit_distance" ->
        """WITH d AS (SELECT doc_id, source, n_chars // 32 AS band,
          |             substr(text, 1, 120) AS pfx FROM documents),
          |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          |        CAST(levenshtein(a.pfx, b.pfx) AS BIGINT) AS d
          |      FROM d a JOIN d b ON a.source = b.source AND a.band = b.band
          |        AND a.doc_id <> b.doc_id)
          |SELECT doc_a, doc_b AS nn_doc, d AS edit_dist FROM (
          |  SELECT *, row_number() OVER (PARTITION BY doc_a ORDER BY d, doc_b) AS rn FROM p) t
          |WHERE rn = 1 ORDER BY doc_a""".stripMargin,

      // identical verify + argmin semantics to d09; only the
      // candidate policy differs (shared-chunk sub-blocking with the
      // f <= 100 occurrence screen)
      "d09_production" ->
        """WITH d AS (SELECT doc_id, source, n_chars // 32 AS band,
          |             substr(text, 1, 120) AS pfx FROM documents),
          |ch AS (SELECT doc_id, source, band, j, substr(pfx, j * 15 + 1, 15) AS chunk
          |       FROM d, generate_series(0, 7) g(j)
          |       WHERE length(substr(pfx, j * 15 + 1, 15)) >= 8),
          |fr AS (SELECT source, band, j, chunk, COUNT(*) AS f
          |       FROM ch GROUP BY 1, 2, 3, 4),
          |ok AS (SELECT ch.* FROM ch JOIN fr USING (source, band, j, chunk)
          |       WHERE f <= 100),
          |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          |         FROM ok a JOIN ok b ON a.source = b.source AND a.band = b.band
          |           AND a.j = b.j AND a.chunk = b.chunk AND a.doc_id <> b.doc_id),
          |p AS (SELECT doc_a, doc_b,
          |        CAST(levenshtein(da.pfx, db.pfx) AS BIGINT) AS d
          |      FROM cand JOIN d da ON da.doc_id = doc_a
          |        JOIN d db ON db.doc_id = doc_b)
          |SELECT doc_a, doc_b AS nn_doc, d AS edit_dist FROM (
          |  SELECT *, row_number() OVER (PARTITION BY doc_a ORDER BY d, doc_b) AS rn FROM p) t
          |WHERE rn = 1 ORDER BY doc_a""".stripMargin,

      // d14's seed/island pipeline with the join sides split on the
      // d15 increment rule; the seed screen runs on the corpus side
      // alone (the frozen index)
      "d17_incremental_spans" ->
        """WITH tk AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
          |sd AS (SELECT doc_id, i AS pos,
          |    t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' ||
          |    t[i+4] || ' ' || t[i+5] || ' ' || t[i+6] || ' ' || t[i+7] AS term
          |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 7)) AS i
          |        FROM tk WHERE len(t) >= 8) x),
          |cs AS (SELECT doc_id, pos, term FROM sd WHERE doc_id % 10 < 8),
          |cf AS (SELECT term, COUNT(*) AS f FROM cs GROUP BY term),
          |ci AS (SELECT cs.doc_id AS doc_corp, cs.pos AS ib, cs.term
          |       FROM cs JOIN cf USING (term) WHERE f <= 50),
          |pr AS (SELECT a.doc_id AS doc_inc, ci.doc_corp, a.pos AS ia, ci.ib,
          |         a.pos - ci.ib AS diag
          |       FROM sd a JOIN ci USING (term) WHERE a.doc_id % 10 >= 8),
          |isl AS (SELECT *, ia - row_number() OVER (PARTITION BY doc_inc, doc_corp, diag ORDER BY ia) AS grp
          |        FROM pr)
          |SELECT doc_inc, doc_corp, CAST(MIN(ia) AS BIGINT) AS inc_start,
          |  CAST(MIN(ib) AS BIGINT) AS corp_start,
          |  CAST(COUNT(*) + 7 AS BIGINT) AS span_tokens
          |FROM isl GROUP BY doc_inc, doc_corp, diag, grp
          |HAVING COUNT(*) + 7 >= 12
          |ORDER BY doc_inc, doc_corp, inc_start, corp_start""".stripMargin,

      "d10_dup_spans" ->
        """WITH sh AS (SELECT DISTINCT doc_id,
          |    t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' ||
          |    t[i+4] || ' ' || t[i+5] || ' ' || t[i+6] || ' ' || t[i+7] AS term
          |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 7)) AS i
          |        FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents) d0
          |        WHERE len(t) >= 8) d),
          |dfreq AS (SELECT term, COUNT(*) AS df FROM sh GROUP BY term)
          |SELECT doc_id, COUNT(*) AS n_spans,
          |  CAST(COALESCE(SUM(CASE WHEN df >= 2 THEN 1 END), 0) AS BIGINT) AS n_dup_spans,
          |  CAST(CAST(COALESCE(SUM(CASE WHEN df >= 2 THEN 1 END), 0) AS BIGINT) AS DOUBLE) / COUNT(*) AS dup_span_ratio
          |FROM sh JOIN dfreq USING (term)
          |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

      "d14_dup_span_pairs" ->
        """WITH tk AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
          |sd AS (SELECT doc_id, i AS pos,
          |    t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' ||
          |    t[i+4] || ' ' || t[i+5] || ' ' || t[i+6] || ' ' || t[i+7] AS term
          |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 7)) AS i
          |        FROM tk WHERE len(t) >= 8) x),
          |cf AS (SELECT term, COUNT(*) AS f FROM sd GROUP BY term),
          |ok AS (SELECT sd.doc_id, sd.pos, sd.term FROM sd JOIN cf USING (term) WHERE f <= 50),
          |pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS ia, b.pos AS ib,
          |         a.pos - b.pos AS diag
          |       FROM ok a JOIN ok b ON a.term = b.term AND a.doc_id < b.doc_id),
          |isl AS (SELECT *, ia - row_number() OVER (PARTITION BY doc_a, doc_b, diag ORDER BY ia) AS grp
          |        FROM pr)
          |SELECT doc_a, doc_b, CAST(MIN(ia) AS BIGINT) AS a_start,
          |  CAST(MIN(ib) AS BIGINT) AS b_start,
          |  CAST(COUNT(*) + 7 AS BIGINT) AS span_tokens
          |FROM isl GROUP BY doc_a, doc_b, diag, grp
          |HAVING COUNT(*) + 7 >= 12
          |ORDER BY doc_a, doc_b, a_start, b_start""".stripMargin,

      "d01_exact_dedup" ->
        """SELECT md5(text) AS h, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies, MIN(n_chars) AS n_chars
          |FROM documents GROUP BY md5(text) ORDER BY h""".stripMargin,

      // increment = doc_id % 10 IN (8, 9); same shingle/signature
      // pipeline as d02, same banding — only the join sides differ
      "d15_incremental_dedup" ->
        ("WITH " + shCte + ",\n" + sigCte + ",\n" + candCte + """,
          |dh AS (SELECT doc_id, md5(text) AS h FROM documents),
          |corp AS (SELECT h, MIN(doc_id) AS exact_match FROM dh
          |         WHERE doc_id % 10 < 8 GROUP BY h),
          |nearm AS (SELECT a.doc_id, MIN(b.doc_id) AS near_match
          |          FROM bands a JOIN bands b
          |            ON a.band = b.band AND a.bandkey = b.bandkey
          |           AND a.doc_id % 10 >= 8 AND b.doc_id % 10 < 8
          |          GROUP BY a.doc_id)
          |SELECT i.doc_id, corp.exact_match, nearm.near_match,
          |  CASE WHEN corp.exact_match IS NOT NULL THEN 'drop_exact'
          |       WHEN nearm.near_match IS NOT NULL THEN 'drop_near'
          |       ELSE 'keep' END AS verdict
          |FROM dh i LEFT JOIN corp USING (h) LEFT JOIN nearm USING (doc_id)
          |WHERE i.doc_id % 10 >= 8
          |ORDER BY i.doc_id""".stripMargin),

      "d16_source_overlap" ->
        ("WITH " + shCte + """,
          |ss AS (SELECT DISTINCT term, source
          |       FROM sh JOIN documents USING (doc_id)),
          |sz AS (SELECT source, COUNT(*) AS n FROM ss GROUP BY source),
          |ov AS (SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS inter
          |       FROM ss a JOIN ss b ON a.term = b.term AND a.source < b.source
          |       GROUP BY 1, 2)
          |SELECT source_a, source_b, inter,
          |  za.n + zb.n - inter AS un,
          |  CAST(inter AS DOUBLE) / (za.n + zb.n - inter) AS jaccard
          |FROM ov JOIN sz za ON za.source = source_a JOIN sz zb ON zb.source = source_b
          |ORDER BY source_a, source_b""".stripMargin),

      "d13_norm_dedup" ->
        """WITH n AS (SELECT doc_id,
          |    md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), '  *', ' ', 'g'))) AS norm_hash
          |  FROM documents)
          |SELECT norm_hash, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
          |FROM n GROUP BY norm_hash ORDER BY norm_hash""".stripMargin,

      "d02_minhash_lsh" ->
        ("WITH " + shCte + ",\n" + sigCte + ",\n" + candCte + """
          |SELECT doc_a, doc_b,
          |  CAST(SUM(CASE WHEN sa.sig = sb.sig THEN 1 ELSE 0 END) AS BIGINT) / 16.0 AS est_jaccard
          |FROM cand JOIN sig sa ON sa.doc_id = doc_a JOIN sig sb ON sb.doc_id = doc_b AND sb.i = sa.i
          |GROUP BY doc_a, doc_b ORDER BY doc_a, doc_b""".stripMargin),

      // the PRODUCTION id path: identical shingle/signature/banding
      // algebra to d02, but term ids are the vocab-free 60-bit
      // md5-prefix hash mod P (the qa07/d19 cross-engine family)
      // instead of the rank vocabulary — st swaps its definition, the
      // sig/band CTEs are the shared fragments verbatim
      "d02_production" ->
        (raw"""WITH sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS term
          |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i
          |        FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents) d0
          |        WHERE len(t) >= 3) d),
          |st AS (SELECT doc_id, ('0x' || substr(md5(term), 1, 15))::BIGINT % 2147483647 AS tid FROM sh),
          |""".stripMargin + sigCte + ",\n" + candCte + """
          |SELECT doc_a, doc_b FROM cand ORDER BY doc_a, doc_b""".stripMargin),

      // d21: the mm12 band-drift aggregate over d02_production's
      // banding — corpus-slice buckets (count + occupancy) vs the
      // arrival slice's band rows
      "d21_band_drift" ->
        (raw"""WITH sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS term
          |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i
          |        FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents) d0
          |        WHERE len(t) >= 3) d),
          |st AS (SELECT doc_id, ('0x' || substr(md5(term), 1, 15))::BIGINT % 2147483647 AS tid FROM sh),
          |""".stripMargin + sigCte + ",\n" + candCte + """,
          |cbo AS (SELECT band, bandkey, COUNT(*) AS occ FROM bands
          |        WHERE doc_id % 10 < 8 GROUP BY 1, 2),
          |abo AS (SELECT band, bandkey, COUNT(*) AS n FROM bands
          |        WHERE doc_id % 10 >= 8 GROUP BY 1, 2),
          |cagg AS (SELECT band, COUNT(*) AS n_corp_buckets,
          |           CAST(MAX(occ) AS BIGINT) AS max_corp_occ
          |         FROM cbo GROUP BY 1),
          |aagg AS (SELECT a.band, COUNT(*) AS n_arr_buckets,
          |           CAST(SUM(CASE WHEN c.bandkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_new_buckets,
          |           CAST(SUM(a.n) AS BIGINT) AS n_arr_rows,
          |           CAST(SUM(CASE WHEN c.bandkey IS NOT NULL THEN a.n ELSE 0 END) AS BIGINT) AS n_arr_hit
          |         FROM abo a LEFT JOIN cbo c
          |           ON a.band = c.band AND a.bandkey = c.bandkey
          |         GROUP BY 1)
          |SELECT CAST(band AS BIGINT) AS band, n_corp_buckets, max_corp_occ,
          |  n_arr_buckets, n_new_buckets, n_arr_rows, n_arr_hit,
          |  CAST(n_arr_hit AS DOUBLE) / n_arr_rows AS hit_share
          |FROM cagg JOIN aagg USING (band) ORDER BY band""".stripMargin),

      // reachability closure over the candidate-pair graph; MIN over
      // the reachable set = the same min-label fixpoint the Spark
      // side converges to
      "d07_dedup_clusters" ->
        ("WITH RECURSIVE " + shCte + ",\n" + sigCte + ",\n" + candCte + ",\n" + clusterCte + """,
          |sz AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM lab GROUP BY cluster_id)
          |SELECT doc_id, cluster_id, cluster_size FROM lab JOIN sz USING (cluster_id)
          |ORDER BY doc_id""".stripMargin),

      "d03_simhash" ->
        ("WITH " + shCte + ",\n" + simhCte + """,
          |bb AS (SELECT doc_id, simhash, band, (simhash // CAST(pow(2, 8 * band) AS BIGINT)) % 256 AS bandval
          |       FROM simh, generate_series(0, 3) g(band)),
          |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          |         FROM bb a JOIN bb b ON a.band = b.band AND a.bandval = b.bandval AND a.doc_id < b.doc_id)
          |SELECT doc_a, doc_b, CAST(bit_count(xor(sa.simhash, sb.simhash)) AS BIGINT) AS hamming
          |FROM cand JOIN simh sa ON sa.doc_id = doc_a JOIN simh sb ON sb.doc_id = doc_b
          |WHERE bit_count(xor(sa.simhash, sb.simhash)) <= 3
          |ORDER BY doc_a, doc_b""".stripMargin),

      "d20_containment" ->
        raw"""WITH sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS term
          |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i
          |        FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents) d0
          |        WHERE len(t) >= 3) d),
          |rare AS (SELECT term FROM sh GROUP BY term HAVING COUNT(*) <= 50),
          |ss AS (SELECT doc_id, term FROM sh JOIN rare USING (term)),
          |cnt AS (SELECT doc_id, COUNT(*) AS n FROM ss GROUP BY doc_id),
          |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
          |          FROM ss a JOIN ss b ON a.term = b.term AND a.doc_id < b.doc_id
          |          GROUP BY 1, 2)
          |SELECT doc_a, doc_b, n_common, ca.n AS n_a, cb.n AS n_b,
          |  CAST(n_common AS DOUBLE) / least(ca.n, cb.n) AS containment,
          |  CAST(n_common AS DOUBLE) / (ca.n + cb.n - n_common) AS jaccard,
          |  n_common * 2 < ca.n + cb.n - n_common AS jaccard_blind
          |FROM inter JOIN cnt ca ON ca.doc_id = doc_a JOIN cnt cb ON cb.doc_id = doc_b
          |WHERE n_common * 10 >= least(ca.n, cb.n) * 8
          |ORDER BY doc_a, doc_b""".stripMargin,

      "d04_ngram_jaccard" ->
        ("WITH " + shCte + """,
          |shs AS (SELECT sh.doc_id, term, source FROM sh JOIN documents USING (doc_id)),
          |cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
          |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
          |          FROM shs a JOIN shs b ON a.term = b.term AND a.source = b.source AND a.doc_id < b.doc_id
          |          GROUP BY 1, 2)
          |SELECT doc_a, doc_b, inter, ca.n + cb.n - inter AS un,
          |  CAST(inter AS DOUBLE) / (ca.n + cb.n - inter) AS jaccard
          |FROM inter JOIN cnt ca ON ca.doc_id = doc_a JOIN cnt cb ON cb.doc_id = doc_b
          |ORDER BY doc_a, doc_b""".stripMargin),

      "d12_decontaminate" ->
        ("WITH " + shCte + """,
          |ds AS (SELECT doc_id,
          |  CASE WHEN ((doc_id * 2654435761) % 4294967296) % 10 = 0 THEN 'test'
          |       WHEN ((doc_id * 2654435761) % 4294967296) % 10 = 1 THEN 'val'
          |       ELSE 'train' END AS split
          |  FROM documents),
          |shs AS (SELECT sh.doc_id, term, split FROM sh JOIN ds USING (doc_id)),
          |tst AS (SELECT doc_id AS test_doc, term FROM shs WHERE split = 'test'),
          |trn AS (SELECT doc_id AS train_doc, term FROM shs WHERE split = 'train'),
          |sz AS (SELECT test_doc, COUNT(*) AS n_test FROM tst GROUP BY 1),
          |ov AS (SELECT test_doc, train_doc, COUNT(*) AS overlap
          |       FROM tst JOIN trn USING (term) GROUP BY 1, 2),
          |cont AS (SELECT test_doc, train_doc,
          |    CAST(overlap AS DOUBLE) / n_test AS contamination
          |  FROM ov JOIN sz USING (test_doc)
          |  WHERE CAST(overlap AS DOUBLE) / n_test >= 0.5)
          |SELECT train_doc, COUNT(*) AS n_test_hits,
          |  MAX(contamination) AS worst_overlap
          |FROM cont GROUP BY train_doc ORDER BY train_doc""".stripMargin),

      "d06_contamination" ->
        ("WITH " + shCte + """,
          |ds AS (SELECT doc_id,
          |  CASE WHEN ((doc_id * 2654435761) % 4294967296) % 10 = 0 THEN 'test'
          |       WHEN ((doc_id * 2654435761) % 4294967296) % 10 = 1 THEN 'val'
          |       ELSE 'train' END AS split
          |  FROM documents),
          |shs AS (SELECT sh.doc_id, term, split FROM sh JOIN ds USING (doc_id)),
          |tst AS (SELECT doc_id AS test_doc, term FROM shs WHERE split = 'test'),
          |trn AS (SELECT doc_id AS train_doc, term FROM shs WHERE split = 'train'),
          |sz AS (SELECT test_doc, COUNT(*) AS n_test FROM tst GROUP BY 1),
          |ov AS (SELECT test_doc, train_doc, COUNT(*) AS overlap
          |       FROM tst JOIN trn USING (term) GROUP BY 1, 2)
          |SELECT test_doc, train_doc, overlap, n_test,
          |  CAST(overlap AS DOUBLE) / n_test AS contamination
          |FROM ov JOIN sz USING (test_doc)
          |WHERE CAST(overlap AS DOUBLE) / n_test >= 0.5
          |ORDER BY test_doc, train_doc""".stripMargin),

      "d05_embedding_neardup" ->
        """WITH q AS (SELECT vec_id, label,
          |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qv
          |  FROM embeddings),
          |n AS (SELECT vec_id, label, qv,
          |    CAST(list_aggregate(list_transform(qv, x -> x * x), 'sum') AS BIGINT) AS nrm FROM q)
          |SELECT vec_a, vec_b, label, cos FROM (
          |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
          |    CAST((SELECT SUM(a.qv[i] * b.qv[i]) FROM generate_series(1, 64) g(i)) AS BIGINT)
          |      / (sqrt(CAST(a.nrm AS DOUBLE)) * sqrt(CAST(b.nrm AS DOUBLE))) AS cos
          |  FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id) t
          |WHERE cos >= 0.3 ORDER BY vec_a, vec_b""".stripMargin
    )
  }
}
