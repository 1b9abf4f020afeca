package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end corpus curation: the composition a real training-data
  * pipeline runs before a corpus ships, proving the individual
  * operators compose into one DataFrame plan.
  *
  * p01 stages (all semantics identical to the standalone operators):
  *  1. quality gate  — t02's score, keep `quality >= 0.5`;
  *  2. exact dedup   — keep the min doc_id of each md5(text) group
  *                     (d01's keeper rule);
  *  3. near-dup canonicalization — keep a document iff it is its
  *     d07 cluster's canonical (cluster_id == doc_id) or it has no
  *     near-dup candidate at all;
  *  4. split assignment — q20's multiplicative-hash 80/10/10.
  *
  * Scale shape: stages 1–2 are one projection + one hash groupBy;
  * stage 3 joins against the (tiny) cluster-membership table; stage
  * 4 is per-row arithmetic. No stage widens the data — the pipeline
  * is exactly as scalable as its narrowest operator (d07's label
  * propagation over the pair graph).
  */
object Pipeline {

  def p01Curation(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val qual = TextAnalysis.t02Quality(spark, dir).select("doc_id", "quality")
    val keepers = docs.groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
    val clusters = Dedup.d07DedupClusters(spark, dir)
      .select("doc_id", "cluster_id")
    docs.select("doc_id", "n_chars")
      .join(qual, "doc_id")
      .join(keepers, Seq("doc_id"), "left_semi")
      // hint-free: the cluster map is O(near-dup docs), data-dependent
      .join(clusters, Seq("doc_id"), "left")
      .filter(col("quality") >= 0.5)
      .filter(col("cluster_id").isNull || col("cluster_id") === col("doc_id"))
      .withColumn("split", graft.functions.Fns.splitOf(col("doc_id")))
      .select("doc_id", "n_chars", "quality", "split")
      .orderBy("doc_id")
  }

  /** Range-bucket width for the two-phase prefix sums below: one
    * bucket covers 65536 consecutive doc_ids, so the per-bucket
    * offsets aggregate is ≥65536× smaller than the corpus. */
  private val PrefixBucketWidth = 65536L

  /** Distributed running sum of `value` per source in `order` order
    * WITHOUT a whole-source window sort (a real pretraining corpus
    * has a handful of mega-sources, so `Window.partitionBy("source")`
    * would sort ~the entire corpus in a few tasks).
    *
    * Two-phase prefix sum: rows are range-bucketed by `bucket` — any
    * monotone non-decreasing function of the leading order key, so
    * bucket order is consistent with row order — the within-bucket
    * running sum is a window partitioned by (source, bucket)
    * [parallelism = sources × buckets, grows with the corpus], and
    * the cross-bucket offsets are an exclusive running sum over the
    * per-bucket TOTALS aggregate (bucket-width× smaller than the
    * corpus; recurse the same trick if even that outgrows one task).
    * The offsets join back on (source, bucket) hint-free — Catalyst
    * broadcasts while the bucket table fits. Exact int64 sums make
    * the two-phase result bit-identical to the single-window form at
    * any bucket width (PartitionInvarianceSpec pins this). */
  private def bucketedPrefixSum(df: DataFrame, bucket: Column,
      order: Seq[Column], value: String, includeCurrent: Boolean,
      outName: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hi = if (includeCurrent) 0L else -1L
    val b = df.withColumn("_bkt", bucket)
    val wIn = Window.partitionBy(col("source"), col("_bkt"))
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, hi)
    val inner = b.withColumn("_in", coalesce(sum(col(value)).over(wIn), lit(0L)))
    val wOff = Window.partitionBy("source").orderBy("_bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = b.groupBy(col("source"), col("_bkt"))
      .agg(sum(col(value)).as("_bt"))
      .withColumn("_off", coalesce(sum(col("_bt")).over(wOff), lit(0L)))
      .select(col("source"), col("_bkt"), col("_off"))
    inner.join(offsets, Seq("source", "_bkt"))
      .withColumn(outName, col("_off") + col("_in"))
      .drop("_bkt", "_in", "_off", "_bt")
  }

  /** p02: sequence packing — lay documents head-to-tail into
    * fixed-size token windows (the batch-construction step of an LLM
    * training pipeline; documents span bin boundaries, GPT-style).
    * Packing order is (source, doc_id): the bucketed two-phase
    * prefix sum gives each document its global token offset within
    * its source stream, and integer division by the context length
    * yields the bin — parallel even for a single-mega-source corpus,
    * pure integer arithmetic, bit-for-bit in the oracle. */
  /** p02's packing WITHOUT the presentation sort — consumed by p10
    * (EliminateSorts cannot remove a Sort below p10's explode
    * Generate, so inheriting p02's orderBy would range-shuffle the
    * whole packed table for nothing). */
  private def packCore(spark: SparkSession, dir: String,
                       contextLen: Long): DataFrame =
    packTokens(Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        size(graft.functions.TextFns.tokens(col("text"))).cast("long").as("n_tokens")),
      contextLen)

  /** The packing over any (doc_id, source, n_tokens) frame — also
    * driven at replicated single-source scale by [[graft.Stress]].
    * `extra` names pass-through payload columns (p29 carries the
    * gate's score beside the bin coordinates). */
  private[graft] def packTokens(docs: DataFrame, contextLen: Long,
                                extra: Seq[String] = Nil): DataFrame =
    bucketedPrefixSum(docs, expr(s"doc_id div $PrefixBucketWidth"),
        Seq(col("doc_id")), "n_tokens", includeCurrent = false, "start_tok")
      .select(Seq(col("doc_id"), col("source")) ++ extra.map(col) ++ Seq(
        col("n_tokens"),
        // integer division (`div`), not double-divide-then-cast:
        // exact at any magnitude, and identical to DuckDB's `//` for
        // the NON-NEGATIVE token offsets here (div truncates, //
        // floors — they differ on negatives)
        expr(s"start_tok div $contextLen").as("bin_id"),
        (col("start_tok") % contextLen).as("bin_offset")): _*)

  def p02SequencePack(spark: SparkSession, dir: String,
                      contextLen: Long = 2048L): DataFrame =
    packCore(spark, dir, contextLen).orderBy("doc_id")

  /** p14: sequence packing on TOKENIZER-faithful budgets — p02's
    * bucketed two-phase packing driven by t16's mini-BPE token count
    * instead of the whitespace-word count (real context windows are
    * tokenizer-token windows; a word-budget pack misplaces every bin
    * boundary by the corpus's fertility ratio). The BPE fold runs
    * inside the scan's codegen (13 regexp_replace calls, no shuffle
    * added), and the packing itself is byte-identical machinery to
    * p02 — only the budget column changes. The composition was
    * previously pinned only by PropertySpec; this registers it under
    * the driver's full-oracle gate (VERDICT r5 #6), with the oracle's
    * token count generated from the SAME merge table (t16 precedent,
    * so the two engines cannot drift). */
  def p14BpePack(spark: SparkSession, dir: String,
                 contextLen: Long = 2048L): DataFrame =
    packTokens(Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        Quality.bpeTokenCount(col("text")).as("n_tokens")),
      contextLen).orderBy("doc_id")

  /** p27: SEQUENCE PACKING UNDER THE TRAINED TOKENIZER (round 15 —
    * the t28→t29→budget composition landing in the packing path:
    * p14 budgets with the hand-fixed merge table; this is the same
    * oracle-gated packer with the IN-ENGINE-TRAINED table in the
    * slot — what a production pipeline actually does once its
    * tokenizer is trained on its own corpus). The 12 learned merges
    * re-derive through the one t28 definition, collect as bounded
    * control state (the t27 rule), and the per-doc counts fold
    * through the literal [[Quality.bpeTokenCountWith]]; packing is
    * the p02/p14 bucketed two-phase prefix sum. The oracle prefixes
    * the training chain and folds with scalar subqueries over ITS
    * OWN chain — the t29 train→apply pin extended through the
    * packing arithmetic. */
  def p27TrainedPack(spark: SparkSession, dir: String,
                     contextLen: Long = 2048L): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val trained = Quality.trainBpeMerges(spark,
      docs.select("doc_id", "text"), Quality.BpeTrainRounds)
    packTokens(docs
      .select(col("doc_id"), col("source"),
        Quality.bpeTokenCountWith(trained)(col("text")).as("n_tokens")),
      contextLen).orderBy("doc_id")
  }

  /** p28: SEQUENCE PACKING UNDER THE FROZEN TOKENIZER (round 16 —
    * p27's serving twin, the VERDICT r15 #1 frozen variant: p27
    * retrains the merge table on every invocation; this freezes it
    * through [[graft.sources.TokenizerStore]] and packs under the
    * FROZEN generation — what a production pipeline runs between
    * tokenizer refreshes). The key runs freeze→serve (the
    * Verify-fresh g06/g07 rule); the counts fold through the one
    * literal bpeTokenCountWith definition with the frozen table
    * collected as bounded control state, and packing is the p02/p14
    * bucketed two-phase prefix sum. Oracle: training is
    * deterministic, so frozen == retrained on the same corpus —
    * p27's oracle verbatim, routed through the persisted artifact. */
  def p28FrozenPack(spark: SparkSession, dir: String,
                    contextLen: Long = 2048L): DataFrame = {
    val docs = Tables.documents(spark, dir)
    graft.sources.TokenizerStore.freeze(
      docs.select("doc_id", "text"), "p28_frozen")
    val m = graft.sources.TokenizerStore.mergesFrozen(spark, "p28_frozen")
    packTokens(docs
      .select(col("doc_id"), col("source"),
        Quality.bpeTokenCountWith(m)(col("text")).as("n_tokens")),
      contextLen).orderBy("doc_id")
  }

  /** p29: THE ALL-FROZEN CURATION PIPELINE (round 17, VERDICT r16 #3)
    * — the production nightly composed as ONE read-path key whose
    * every screening stage reads a SHIPPED artifact (p26/p09
    * re-derive their gates in-key; a 100 TB deployment trains once
    * and serves):
    *
    *  1. learned gate — arrivals score against the FROZEN pocket
    *     classifier ([[graft.sources.ClassifierStore.scoreFrozen]],
    *     trained on the corpus slice), keep = the trained sign rule;
    *  2. exact screen — the FROZEN Bloom filter + corpus-hash table
    *     ([[Dedup.d19ScreenFrozen]]) drops arrivals the corpus
    *     already carries (no false negatives — spec-pinned);
    *  3. near screen — the FROZEN MinHash band index
    *     ([[Dedup.nearMatchesFrozen]], d02_production's md5-prefix
    *     id path — the one signature family whose corpus rows are
    *     arrival-independent and can therefore freeze);
    *  4. pack — survivors lay head-to-tail under the FROZEN merge
    *     table ([[graft.sources.TokenizerStore]], p28's fold) via
    *     the p02 bucketed two-phase prefix sum.
    *
    * The corpus/arrival split is the d15/d19 fixture convention
    * (doc_id % 10 ≥ 8 arrives); all three artifacts freeze on the
    * CORPUS slice — arrivals only read them. Oracle: every stage's
    * CTE chain is already hash-gated standalone (t27 training ⟹
    * frozen == re-derived, the p28 precedent; d15/d19 screens; p02
    * packing arithmetic) — p29's oracle is their literal composition
    * over the corpus-trained relations.
    *
    * Scale shape: freezes are one corpus pass each, amortized into
    * prepare (the bench times [[p29ServeFrozen]] alone); the serving
    * path is ARRIVAL-scaled end-to-end — gate = arrival-token ⋈
    * 64-row weights, exact = 3 word-keyed probes + a hit-only hash
    * join, near = banded equi-join (collisions only), pack = the
    * two-phase prefix sum over survivors. No stage rescans the
    * corpus; no global sort (the PlanShapeSpec ban). */
  def p29FrozenCuration(spark: SparkSession, dir: String): DataFrame = {
    p29Prepare(spark, dir)
    p29ServeFrozen(spark, dir)
  }

  /** Freeze the three artifacts the nightly serves from — the
    * classifier gate and the tokenizer train on the CORPUS slice,
    * the Bloom screen folds the corpus-slice hashes (its fixed
    * convention). One corpus pass each; runs untimed at bench
    * prepare (the t31/s13 freeze-amortization rule). */
  def p29Prepare(spark: SparkSession, dir: String,
                 ns: String = "p29"): Unit = {
    val corpus = Tables.documents(spark, dir)
      .filter(!Dedup.bloomArrival).select("doc_id", "text")
    graft.sources.ClassifierStore.freeze(corpus, s"${ns}_cls")
    Dedup.shipBloomIndex(spark, dir, s"${ns}_bloom")
    Dedup.shipNearDupIndex(spark, dir, s"${ns}_near")
    graft.sources.TokenizerStore.freeze(corpus, s"${ns}_tok")
    ()
  }

  /** The served nightly over the arrival slice — every stage reads
    * the generation [[p29Prepare]] shipped. Survivors carry the
    * gate's exact score beside the frozen-tokenizer budget and their
    * packed bin coordinates. */
  def p29ServeFrozen(spark: SparkSession, dir: String,
                     contextLen: Long = 256L,
                     ns: String = "p29"): DataFrame =
    p29ServeBatch(spark,
      Tables.documents(spark, dir).filter(Dedup.bloomArrival),
      contextLen, ns)

  /** The served nightly over ANY arriving (doc_id, source, text)
    * batch — [[p29ServeFrozen]] with the arrival frame as a
    * parameter (round 18, VERDICT r17 #1: consecutive nightlies
    * serve DIFFERENT batches against the same store family, with
    * [[p29Absorb]] between them). Every stage reads the live frozen
    * generation; the plan shape is unchanged from p29ServeFrozen. */
  def p29ServeBatch(spark: SparkSession, batch: DataFrame,
                    contextLen: Long = 256L,
                    ns: String = "p29"): DataFrame = {
    val arrivals = batch
    val gated = graft.sources.ClassifierStore
      .scoreFrozen(spark, arrivals.select("doc_id", "text"), s"${ns}_cls")
      .filter(col("keep")).select("doc_id", "score")
    val exactDups = Dedup.bloomScreenFrozen(spark,
      arrivals.select("doc_id", "text"), s"${ns}_bloom")
      .filter(col("outcome") === "dup").select("doc_id")
    val nearDups = Dedup.nearMatchesFrozen(spark,
      arrivals.select("doc_id", "text"), s"${ns}_near").select("doc_id")
    val m = graft.sources.TokenizerStore.mergesFrozen(spark, s"${ns}_tok")
    // the pack's two-phase prefix sum references its input TWICE (the
    // within-bucket window and the offsets aggregate), and exchange
    // reuse across branches is unreliable (the mm10/mm11 lesson) —
    // the lazy checkpoint guarantees the gate+screen+fold subtree
    // runs once per serve. (At sf0.1 the serve wall is dominated by
    // per-invocation planning overhead, so this is a scale guard,
    // not a local bench win — the subtree it de-duplicates grows
    // with arrivals.) Blocks are survivor-count-scaled (four scalars
    // + source per row) and stay pinned until ContextCleaner
    // collects the plan — the mediaPipeline trade, acceptable for a
    // per-nightly call.
    val survivors = arrivals.select(col("doc_id"), col("source"),
        Quality.bpeTokenCountWith(m)(col("text")).as("n_tokens"))
      .join(gated, "doc_id")
      .join(exactDups, Seq("doc_id"), "left_anti")
      .join(nearDups, Seq("doc_id"), "left_anti")
      .localCheckpoint(false)
    packTokens(survivors, contextLen, extra = Seq("score"))
      .select("doc_id", "source", "score", "n_tokens", "bin_id", "bin_offset")
      .orderBy("doc_id")
  }

  /** ABSORB a served batch's ACCEPTED SURVIVORS into the nightly's
    * frozen stores — the serve → absorb → serve edge that closes the
    * lifecycle graph (round 18, VERDICT r17 #1: without it,
    * consecutive nightlies re-admit a duplicate of yesterday's
    * survivor because the screens only know the corpus freeze).
    * Exactly the two MERGEABLE families absorb: the Bloom screen
    * (word-OR + hash append under frozen geometry —
    * [[Dedup.absorbBloomArrivals]]) and the band index (bucket merge
    * + members append — [[Dedup.absorbNearDupArrivals]]); the
    * classifier and tokenizer stay refreeze-only BY DESIGN (their
    * state chains — gradient epochs / merge rounds — so admission
    * does not move them; the drift monitors own that loop). Each
    * absorb holds its own family lease; both are replay-exact, so an
    * at-least-once nightly scheduler cannot double-admit. Input:
    * the survivors' (doc_id, text). Returns the new (bloom, near)
    * generations (None per store when nothing fresh). */
  def p29Absorb(spark: SparkSession, survivors: DataFrame,
                ns: String = "p29"): (Option[Long], Option[Long]) =
    (Dedup.absorbBloomArrivals(spark, survivors, s"${ns}_bloom"),
      Dedup.absorbNearDupArrivals(spark, survivors, s"${ns}_near"))

  /** MAINTAIN the nightly's four frozen families — the ops loop's
    * third verb (round 18; SERVE = [[p29ServeBatch]], ADMIT =
    * [[p29Absorb]], MAINTAIN = this): run each family's OWN
    * staleness policy — the four drift→refreeze loops the monitor
    * lattice already ships — and refreeze exactly the stale ones.
    * Per family the policy is the audited one, unchanged:
    * classifier unseen-token share → full retrain (state chains);
    * tokenizer compression drift → full retrain (state chains);
    * Bloom fill share → geometry rebuild from the hash part;
    * band-index unseen-bucket share → mergeable absorb. Each runs
    * under its own family lease — the families are independent
    * artifacts and a global lock would serialize four unrelated
    * freezes (a reader is wholly-one-generation PER FAMILY either
    * way, the store contract).
    *
    * Returns the deployment's log row per family: (family, refroze,
    * new_gen — null when the policy held). Control-plane frame (4
    * driver-built rows); every data-plane pass inside the policies
    * is arrival- or artifact-scaled, never a corpus read outside a
    * fired retrain. */
  def p29Maintain(spark: SparkSession, dir: String, arrivals: DataFrame,
                  ns: String = "p29",
                  maxUnseenShare: Double = 0.2,
                  maxRatioDrift: Double = 0.10,
                  maxFill: Double = 0.35,
                  maxNewShare: Double = 0.2): DataFrame = {
    import spark.implicits._
    val corpus = Tables.documents(spark, dir)
      .filter(!Dedup.bloomArrival).select("doc_id", "text")
    val a = arrivals.select("doc_id", "text")
    val report = Seq(
      ("classifier", graft.sources.ClassifierStore.refreezeIfStale(
        spark, corpus, a, s"${ns}_cls", maxUnseenShare)),
      ("tokenizer", graft.sources.TokenizerStore.refreezeIfStale(
        spark, corpus, a, s"${ns}_tok", maxRatioDrift)),
      ("bloom", Dedup.refreezeBloomIfSaturated(
        spark, s"${ns}_bloom", maxFill)),
      ("neardup", Dedup.refreezeNearDupIfStale(
        spark, a, s"${ns}_near", maxNewShare)))
    report.map { case (f, g) => (f, g.isDefined, g) }
      .toDF("family", "refroze", "new_gen")
  }

  /** p30: TWO CONSECUTIVE NIGHTLIES with the absorb between — the
    * full production loop p29 serves one night of: prepare freezes
    * the four artifacts on the corpus slice; NIGHT 1 (the
    * doc_id % 10 = 8 half of the arrival slice) serves through the
    * all-frozen path; night 1's accepted survivors ABSORB into the
    * Bloom screen and the band index ([[p29Absorb]]); NIGHT 2 (the
    * % 10 = 9 half) then serves against the ABSORBED generation —
    * its exact screen drops any replay of a night-1 survivor (the
    * hash now sits in the filter + hash table) and its near screen
    * drops near-dups of night-1 survivors (their buckets now sit in
    * the band table). Returns night 2's packed output — the rows
    * whose oracle composes the p29 chain for night 1 with the
    * corpus ∪ survivor screens for night 2.
    *
    * Scale shape: both serves are arrival-scaled (the p29 story);
    * the absorb is SURVIVOR-scaled — a words-table merge + hash
    * append and a bucket merge + members append, never a corpus
    * pass. At 100 TB the nightly loop's only corpus passes remain
    * the initial freezes, amortized across every later night. */
  def p30NightlyAbsorb(spark: SparkSession, dir: String): DataFrame = {
    p29Prepare(spark, dir, ns = "p30")
    p30Night1Absorb(spark, dir, ns = "p30")
    p30Night2Serve(spark, dir, ns = "p30")
  }

  /** Night 1 of [[p30NightlyAbsorb]]: serve the % 10 = 8 batch off
    * the fresh corpus freeze and absorb its survivors. Split out so
    * the bench can run prepare + night 1 UNTIMED and time night 2's
    * serve alone (the read path a deployment repeats). */
  def p30Night1Absorb(spark: SparkSession, dir: String,
                      ns: String = "p30"): Unit = {
    val night1 = Tables.documents(spark, dir)
      .filter(col("doc_id") % 10 === 8)
      .select("doc_id", "source", "text")
    val s1 = p29ServeBatch(spark, night1, ns = ns)
    p29Absorb(spark,
      night1.select("doc_id", "text").join(s1.select("doc_id"), "doc_id"),
      ns)
    ()
  }

  /** Night 2 of [[p30NightlyAbsorb]]: the % 10 = 9 batch served
    * against whatever generation is live — after night 1's absorb,
    * that is corpus ∪ night-1 survivors for the two mergeable
    * screens and the corpus freeze for the classifier/tokenizer. */
  def p30Night2Serve(spark: SparkSession, dir: String,
                     ns: String = "p30"): DataFrame =
    p29ServeBatch(spark,
      Tables.documents(spark, dir).filter(col("doc_id") % 10 === 9)
        .select("doc_id", "source", "text"),
      ns = ns)

  /** p03: token-budget selection — keep the highest-quality documents
    * of each source until that source's running token count exceeds
    * the budget (the mixture-construction step: every source gets a
    * fixed token allowance, filled best-first).
    *
    * Plan shape: t02's per-row quality scores (no shuffle) feed the
    * bucketed two-phase prefix sum in (quality desc, doc_id) order —
    * the bucket is `floor((1-quality)·256)`, a monotone
    * NON-INCREASING map of quality, so ascending bucket order is
    * consistent with descending quality order; the cumulative token
    * count is exact int64 and the budget test a per-row filter. A
    * single mega-source stays 256-way parallel instead of one
    * whole-source sort task.
    */
  def p03TokenBudget(spark: SparkSession, dir: String,
                     budget: Long = 500L): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val qual = TextAnalysis.t02Quality(spark, dir)
      .select(col("doc_id"), col("nt").as("n_tokens"), col("quality"))
    val joined = docs.select(col("doc_id"), col("source")).join(qual, "doc_id")
    bucketedPrefixSum(joined,
        least(lit(255L), greatest(lit(0L),
          floor((lit(1.0) - col("quality")) * 256).cast("long"))),
        Seq(col("quality").desc, col("doc_id")), "n_tokens",
        includeCurrent = true, "cum_tokens")
      .filter(col("cum_tokens") <= budget)
      .select("doc_id", "source", "n_tokens", "quality", "cum_tokens")
      .orderBy("doc_id")
  }

  /** p04: output-shard manifest — deterministic multiplicative-hash
    * assignment of documents to 16 output shards (the WebDataset/
    * tar-shard layout step after packing) plus the per-shard manifest
    * a loader needs: doc count, token mass, byte mass, id range.
    * Per-row hash + ONE groupBy(shard); the same hash family as the
    * q20 split keeps shard membership stable across reruns. */
  def p04ShardManifest(spark: SparkSession, dir: String,
                       shards: Int = 16): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"),
        size(graft.functions.TextFns.tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("shard", graft.functions.Fns.splitHash(col("doc_id")) % shards)
    docs.groupBy("shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"),
        sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .orderBy("shard")
  }

  /** p05: packing-efficiency report over p02's bins — per source:
    * bin count, full-bin count, the tail bin's occupancy, and the
    * fill ratio (tokens per provisioned context window). Because p02
    * packs head-to-tail, a source's occupied bins are EXACTLY
    * 0..ceil(total/L)-1, so n_bins is integer arithmetic on the token
    * total (a countDistinct(bin_id) would undercount when one long
    * document spans a bin no other document starts in, pushing
    * fill_ratio past 1.0). One groupBy over p02's (already
    * single-shuffle) output. */
  def p05PackingStats(spark: SparkSession, dir: String,
                      contextLen: Long = 2048L): DataFrame = {
    // EliminateSorts would drop p02's orderBy under this Aggregate
    // anyway; consume the sortless core for clarity
    val packed = packCore(spark, dir, contextLen)
    packed.groupBy("source")
      .agg(sum(col("n_tokens")).as("total_tokens"))
      .select(col("source"), col("total_tokens"),
        expr(s"(total_tokens + $contextLen - 1) div $contextLen").as("n_bins"),
        expr(s"total_tokens div $contextLen").as("full_bins"),
        (col("total_tokens") % contextLen).as("tail_tokens"),
        (col("total_tokens").cast("double") /
          (expr(s"(total_tokens + $contextLen - 1) div $contextLen") * contextLen))
          .as("fill_ratio"))
      .orderBy("source")
  }

  /** p06: mixture resampling — materialize a training mixture whose
    * per-source weights differ from the raw corpus: weight < 1
    * downsamples (deterministic multiplicative-hash acceptance, the
    * q17/q20 family), weight > 1 upsamples by emitting integer
    * epochs (the "2.3 epochs of books" construction: every doc gets
    * floor(w) copies, a hash-chosen fraction gets one more).
    *
    * Weights are derived deterministically from the source name
    * (w×100 = 50 + 37·len(source) mod 200, i.e. 0.5×–2.49×) so both
    * engines compute them from the data alone. Scale shape: per-row
    * arithmetic + an explode whose output size is exactly the target
    * mixture's token mass — no shuffle, no window, no driver state. */
  def p06MixtureResample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    docs.select(col("doc_id"), col("source"),
        (lit(50) + (length(col("source")) * 37) % 200).cast("long").as("w100"),
        graft.functions.Fns.splitHash(col("doc_id")).as("h"))
      .withColumn("n_reps",
        expr("w100 div 100") +
          when(col("h") % 100 < col("w100") % 100, 1L).otherwise(0L))
      .filter(col("n_reps") >= 1) // Spark sequence(1,0) would DESCEND
      .withColumn("epoch", explode(sequence(lit(1L), col("n_reps"))))
      .select("doc_id", "source", "w100", "n_reps", "epoch")
      .orderBy("doc_id", "epoch")
  }

  /** p09: STRICT curation — p01's curated corpus minus the d12
    * decontamination removal list: quality gate → exact dedup →
    * near-dup canonicalization → split → drop every train document
    * that contaminates a test document. The corpus that actually
    * ships. The removal list is hint-free: it is O(contaminating
    * train docs) and data-dependent, so a forced broadcast would OOM
    * the driver on a heavily contaminated corpus — Catalyst
    * broadcasts while the list fits and shuffles past the threshold
    * (same convention as d10/t08/t11, pinned by NoBroadcastSpec);
    * d12's list contains only train-split ids by construction, so a
    * plain left-anti is exactly "decontaminate the train split". */
  /** p26: CLASSIFIER-GATED CURATION (VERDICT r13 #3's composition
    * step) — p01's rule-based curation pipeline with t23's
    * model-based quality gate composed in, the way a production
    * pretraining pipeline actually stacks them: heuristics first
    * (cheap, high-recall), the learned classifier as the final
    * keep/drop authority. The gate is LITERALLY
    * [[Quality.classifierScores]] (one definition with the t23 key
    * and the streaming twin); the output carries the classifier's
    * exact score and margin beside the rule-based quality so a
    * curation audit sees both signals per surviving document.
    * Plan: p01's plan + one classifier aggregate + a doc_id
    * equi-join — no new corpus-scale shape. */
  def p26ClassifierCuration(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val tok = docs.select(col("doc_id"),
      explode(graft.functions.TextFns.tokens(col("text"))).as("term"))
    val cls = Quality.classifierScores(tok, graft.functions.TextFns.vocab(tok))
      .select(col("doc_id"), col("score"), col("margin"), col("keep"))
    p01Curation(spark, dir)
      .join(cls, "doc_id")
      .filter(col("keep"))
      .select("doc_id", "n_chars", "quality", "score", "margin", "split")
      .orderBy("doc_id")
  }

  def p09CurationStrict(spark: SparkSession, dir: String): DataFrame = {
    val removal = Dedup.d12Decontaminate(spark, dir)
      .select(col("train_doc").as("doc_id"))
    p01Curation(spark, dir)
      .join(removal, Seq("doc_id"), "left_anti")
      .orderBy("doc_id")
  }

  /** p08: source datasheet — the one-row-per-source "dataset card" a
    * corpus release ships with: document/char/token mass, vocabulary
    * health (types, TTR), exact-duplicate count, majority predicted
    * language, and the low-quality share. A composition of t10, t13,
    * t02 and d01 signals joined on the tiny source key.
    *
    * Determinism note: every aggregate here is integer-derived (or a
    * division of identical integer operands) — a MEAN over the double
    * quality scores would depend on Spark's partial-sum order, so the
    * datasheet reports the (order-independent) below-threshold COUNT
    * instead. */
  def p08SourceDatasheet(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val base = docs.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        (count(lit(1)) - countDistinct(md5(col("text")))).as("n_exact_dups"))
    val vocabStats = Quality.t10VocabStats(spark, dir)
      .select("source", "n_tokens", "n_types", "type_token_ratio")
    val topLang = TextAnalysis.t13LangMix(spark, dir)
      .groupBy("source")
      .agg(min(struct((lit(0L) - col("n_docs")).as("neg"),
        col("pred_lang").as("l"))).as("m"))
      .select(col("source"), col("m.l").as("top_lang"))
    val lowq = TextAnalysis.t02Quality(spark, dir)
      .join(docs.select("doc_id", "source"), "doc_id")
      .groupBy("source")
      .agg(coalesce(sum(when(col("quality") < 0.5, 1L)), lit(0L)).as("n_low_quality"))
    base.join(vocabStats, "source").join(topLang, "source").join(lowq, "source")
      .select("source", "n_docs", "sum_chars", "n_tokens", "n_types",
        "type_token_ratio", "n_exact_dups", "top_lang", "n_low_quality")
      .orderBy("source")
  }

  /** End-to-end SHIP step: curate (p01), keep the train split, assign
    * p04's hash shards, and materialize one Hive partition directory
    * per shard (the WebDataset-style layout a loader mounts), plus a
    * read-back manifest. Returns the manifest (shard → doc/char
    * mass) computed from the files actually written — the
    * write-audit a production pipeline stores next to the output.
    * The write is one narrow pass over the curated survivors; the
    * partitionBy column has fixed cardinality (`shards`), so the
    * directory fan-out stays flat no matter the corpus size. */
  def writeTrainingShards(spark: SparkSession, dir: String, outPath: String,
                          shards: Int = 16): DataFrame = {
    val train = p01Curation(spark, dir)
      .filter(col("split") === "train").select("doc_id")
    Tables.documents(spark, dir)
      .join(train, Seq("doc_id"), "left_semi")
      .withColumn("shard", graft.functions.Fns.splitHash(col("doc_id")) % shards)
      .write.mode("overwrite").partitionBy("shard").parquet(outPath)
    spark.read.parquet(outPath)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
      .orderBy("shard")
  }

  /** JSONL variant of the ship step — the interchange format most
    * training stacks mount directly (WebDataset/HF loaders): same
    * curate → train-split → hash-shard derivation as
    * [[writeTrainingShards]], landed as one `shard=N` partition
    * directory of line-delimited JSON each, plus the same read-back
    * manifest. Schema note: JSON carries no long/int distinction, so
    * the manifest recomputes its masses from the read-back frame with
    * explicit casts — the spec pins byte-format round-trip equality
    * against the parquet ship. */
  def writeJsonlShards(spark: SparkSession, dir: String, outPath: String,
                       shards: Int = 16): DataFrame = {
    val train = p01Curation(spark, dir)
      .filter(col("split") === "train").select("doc_id")
    Tables.documents(spark, dir)
      .join(train, Seq("doc_id"), "left_semi")
      .withColumn("shard", graft.functions.Fns.splitHash(col("doc_id")) % shards)
      .write.mode("overwrite").partitionBy("shard").json(outPath)
    spark.read.json(outPath)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars").cast("long")).as("sum_chars"),
        min(col("doc_id").cast("long")).as("min_doc"),
        max(col("doc_id").cast("long")).as("max_doc"))
      .select(col("shard").cast("long").as("shard"), col("n_docs"),
        col("sum_chars"), col("min_doc"), col("max_doc"))
      .orderBy("shard")
  }

  /** p07: training-order shuffle — a reproducible random READ ORDER
    * for the corpus without any global sort rank: an affine hash
    * sends each document to one of 64 "shuffle shards", and the
    * within-shard position is a rank over the hash. A loader
    * consuming shards in (shard, pos) order sees a deterministic
    * permutation that is decorrelated from doc_id (and from the q20
    * split hash — different hash family).
    *
    * Scale shape: the only wide operation is a window PARTITIONED BY
    * shard — 64-way parallel rank, never a single global sort (the
    * "shuffled shards" trick every epoch-shuffling data loader
    * uses).
    *
    * Id domain: the multiplicative-hash family used across the
    * split/sample/shard operators (q17/q20/p01/p04/p06/p07) computes
    * `id · C` in int64, which bounds ids to |id| < 2^63 / C ≈ 3.5e9
    * (8.4e9 here) — beyond that the product overflows (ANSI error on
    * Spark, out-of-range in DuckDB). Catalogs with wider ids should
    * hash `xxhash64(id)`'s low 32 bits first; the rational-constant
    * form exists for cross-engine oracle parity. */
  def p07ShuffleOrder(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("shard").orderBy("h", "doc_id")
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        ((col("doc_id") * 1103515245L + 12345L) % 2147483647L).as("h"))
      .withColumn("shard", col("h") % 64)
      .withColumn("pos", row_number().over(w).cast("long"))
      .select("doc_id", "h", "shard", "pos")
      .orderBy("shard", "pos")
  }

  /** p10: packed-bin boundary index — for every (source, bin) of
    * p02's packing, the token spans each document occupies in
    * BIN-LOCAL coordinates, with start/end flags for documents that
    * span bin boundaries. This is the attention-mask / loss-mask
    * input a trainer needs to keep cross-document attention off
    * inside a packed context window.
    *
    * Scale shape: p02's partitioned running sum + a per-row explode
    * over the (usually 1) bins a document touches — output rows =
    * segments, never tokens; no extra shuffle beyond p02's window. */
  def p10PackBoundaries(spark: SparkSession, dir: String,
                        contextLen: Long = 2048L): DataFrame = {
    val packed = packCore(spark, dir, contextLen)
      .filter(col("n_tokens") >= 1)
      .withColumn("start_tok", col("bin_id") * contextLen + col("bin_offset"))
      .withColumn("end_tok", col("start_tok") + col("n_tokens") - 1)
    packed
      .withColumn("bin",
        explode(sequence(col("bin_id"), expr(s"end_tok div $contextLen"))))
      .select(col("source"), col("bin").as("bin_id"), col("doc_id"),
        (greatest(col("start_tok"), col("bin") * contextLen)
          - col("bin") * contextLen).as("seg_start"),
        (least(col("end_tok"), col("bin") * contextLen + (contextLen - 1))
          - greatest(col("start_tok"), col("bin") * contextLen) + 1).as("seg_len"),
        (col("start_tok") >= col("bin") * contextLen).as("starts_here"),
        (col("end_tok") <= col("bin") * contextLen + (contextLen - 1)).as("ends_here"))
      .orderBy("source", "bin_id", "seg_start")
  }

  /** p11: CURRICULUM training order — documents banded into phases
    * by quality (cleanest first, the curriculum-learning schedule),
    * with p07's shuffled-shard permutation WITHIN each phase so a
    * loader reading (phase, shard, pos) order sees easy→hard
    * progression but no intra-phase ordering bias.
    *
    * Phase bounds compare the t02 quality score directly — safe
    * cross-engine because the score is identical double arithmetic
    * over identical integer operands in both (the p01 `quality >=
    * 0.5` precedent). Scale shape: per-row quality + hash, ONE
    * window partitioned by (phase, shard) — 3×64-way parallel rank,
    * never a global sort. */
  def p11CurriculumOrder(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qual = TextAnalysis.t02Quality(spark, dir).select("doc_id", "quality")
    val w = Window.partitionBy("phase", "shard").orderBy("h", "doc_id")
    qual
      .withColumn("phase",
        when(col("quality") >= 0.55, 1L)
          .when(col("quality") >= 0.45, 2L)
          .otherwise(3L))
      .withColumn("h", ((col("doc_id") * 1103515245L + 12345L) % 2147483647L))
      .withColumn("shard", col("h") % 64)
      .withColumn("pos", row_number().over(w).cast("long"))
      .select("doc_id", "quality", "phase", "shard", "pos")
      .orderBy("phase", "shard", "pos")
  }

  /** p12: TEMPERATURE-scaled mixture (the mT5/multilingual-sampling
    * α=0.5 rule): per-source sampling rates ∝ n^α / n flatten the
    * source distribution — big sources are downsampled hard, small
    * sources barely — without the per-language hand-tuned weight
    * table p06 models. The whole computation is EXACT integer
    * arithmetic so both engines agree bit-for-bit:
    *
    *  - weight w = ⌊√n⌋ (α = 0.5; floor(sqrt(double)) is exact for
    *    n < 2⁵² — the true root is never within half an ulp of the
    *    crossing integer);
    *  - doc budget B = ⌊total/2⌋, source target t = ⌊B·w/Σw⌋;
    *  - acceptance threshold per source = min(10⁶, ⌊t·10⁶/n⌋),
    *    tested against the q17/q20 split hash mod 10⁶ — the SAME
    *    hash family as the shipped split, so resampling composes
    *    with decontamination. The two-step form is deliberate
    *    overflow discipline for the 10¹²-doc design point: the
    *    single-expression ⌊10⁶·B·w/(Σw·n)⌋ builds 10⁶·B·w ≈ 10²³
    *    and Σw·n ≈ 10¹⁹ intermediates (int64 overflow — a silent
    *    wrap in Spark, an error in the oracle), while B·w ≤ ~10¹⁸
    *    and t·10⁶ ≤ B·10⁶ stay in range because t ≤ B by w ≤ Σw.
    *
    * Scale shape: one groupBy(source) builds the (bounded, ≤|sources|
    * rows) rate table; the totals fold in as a broadcast 1-row agg;
    * acceptance is a per-row codegen'd filter — no window, no second
    * shuffle of the corpus. */
  def p12TemperatureMix(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    val per = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
      .withColumn("w", floor(sqrt(col("n_docs").cast("double"))).cast("long"))
    val tot = per.agg(sum(col("n_docs")).as("total"), sum(col("w")).as("denom"))
    // per-source table: cardinality = |sources|, broadcast by right
    val thr = per.crossJoin(broadcast(tot))
      .withColumn("target", expr("((total div 2) * w) div denom"))
      .withColumn("thr1e6", least(lit(1000000L),
        expr("(target * 1000000) div n_docs")))
      .select("source", "n_docs", "w", "thr1e6")
    val kept = docs.join(broadcast(thr.select("source", "thr1e6")), "source")
      .filter(graft.functions.Fns.splitHash(col("doc_id")) % 1000000 < col("thr1e6"))
      .groupBy("source").agg(count(lit(1)).as("n_kept"))
    thr.join(kept, Seq("source"), "left")
      .withColumn("n_kept", coalesce(col("n_kept"), lit(0L)))
      .select(col("source"), col("n_docs"), col("w"), col("thr1e6"), col("n_kept"),
        (col("n_kept").cast("double") / col("n_docs")).as("kept_share"))
      .orderBy("source")
  }

  /** p13: data-parallel RANK balance — assign p02's packed bins to
    * `world` data-parallel ranks by a deterministic hash (how a
    * sharded loader distributes work) and report each rank's load:
    * bin count, doc count, token mass attributed by start-bin, and
    * the load ratio vs the ideal equal share. The pre-flight check
    * that a 1000-GPU run won't be gated by one overloaded reader.
    *
    * Scale shape: p02's single-shuffle packing → one groupBy to bin
    * granularity (corpus/context_len rows) → one groupBy(rank). The
    * grand total folds in as a broadcast 1-row agg (q19 pattern). */
  def p13RankBalance(spark: SparkSession, dir: String, world: Int = 64,
                     contextLen: Long = 2048L): DataFrame = {
    // dense 0-based source index via a non-equi join over the tiny
    // distinct-source set (|sources|² pairs — bounded): a string
    // length or prefix would collide for same-shaped source names
    // and starve most ranks of work
    val srcs = Tables.documents(spark, dir).select("source").distinct()
    val si = srcs.alias("x")
      .join(srcs.select(col("source").as("s2")), col("s2") < col("x.source"), "left")
      .groupBy(col("x.source").as("source")).agg(count(col("s2")).as("si"))
    val bins = packCore(spark, dir, contextLen)
      .groupBy("source", "bin_id")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("bin_tokens"))
      .join(broadcast(si), "source")
      .withColumn("rank_id",
        graft.functions.Fns.splitHash(col("bin_id") * 8192L + col("si")) % world)
    // reduce to the `world`-row per-rank frame FIRST and cache it —
    // deriving the grand total from `bins` directly would evaluate
    // the whole pack pipeline a second time just to sum one column
    val perRank = OpCache.cached(bins.groupBy("rank_id")
      .agg(count(lit(1)).as("n_bins"), sum(col("n_docs")).as("n_docs"),
        sum(col("bin_tokens")).as("sum_tokens")))
    val tot = perRank.agg(sum(col("sum_tokens")).as("total"))
    perRank.crossJoin(broadcast(tot))
      .select(col("rank_id"), col("n_bins"), col("n_docs"), col("sum_tokens"),
        ((col("sum_tokens") * world).cast("double") / col("total")).as("load_ratio"))
      .orderBy("rank_id")
  }

  /** p15: LEAKAGE-SAFE split — split assignment keyed on the near-dup
    * CLUSTER id instead of the document id. q20/p01 hash each doc_id
    * independently, so two near-duplicates (the same article from two
    * crawls) can land one in train and one in test — contamination
    * d12 then detects and removes AFTER the fact. Hashing the d07
    * canonical cluster id makes the straddle impossible by
    * construction: every member of a near-dup cluster rides one
    * hash. Docs with no near-dup candidate keep their own id (their
    * cluster IS themselves — same hash, same split q20 assigns, so
    * the rule only moves docs that had a leak risk). Output per doc:
    * the cluster-keyed split, the naive doc-keyed split it replaces,
    * and `straddled` — whether the naive rule WOULD have split this
    * doc's cluster across ≥2 assignments (the measured leak rate the
    * operator closes; ClusterSplitSpec pins split-constant-per-
    * cluster and the q20 tie-back for singleton docs).
    *
    * Scale shape: d07's candidate/contraction machinery (banded,
    * never O(n²)), one hint-free left join of the O(near-dup-docs)
    * cluster map onto the corpus, one groupBy(cluster_id) counting
    * distinct naive splits, one hint-free join back. No window, no
    * corpus-sized broadcast. */
  def p15ClusterSplit(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select("doc_id")
    val clusters = Dedup.d07DedupClusters(spark, dir)
      .select("doc_id", "cluster_id")
    val assigned = docs
      .join(clusters, Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("split", graft.functions.Fns.splitOf(col("cluster_id")))
      .withColumn("naive_split", graft.functions.Fns.splitOf(col("doc_id")))
    val strad = assigned.groupBy("cluster_id")
      .agg((countDistinct(col("naive_split")) > 1).as("straddled"))
    assigned.join(strad, "cluster_id")
      .select("doc_id", "cluster_id", "split", "naive_split", "straddled")
      .orderBy("doc_id")
  }

  /** p16: SPLIT-BALANCE audit — what p15's leakage-safety costs in
    * share drift. The cluster-keyed rule moves whole clusters
    * between splits, so per-source train/val/test shares drift off
    * the doc-keyed rule's (and off the 80/10/10 design point) by an
    * amount that grows with cluster mass; a release pipeline gates
    * on this report before accepting the safe split (large drift =
    * a mega-cluster landed in val/test — worth a look, not an
    * automatic pass). Per (source, split): doc count and share under
    * the cluster rule, under the naive rule, and the drift between
    * them; shares divide exact counts (identical operands both
    * engines). Output ≤ sources × 3 rows; cost = p15 + three
    * bounded groupBys + two k-row joins, no window. */
  def p16SplitBalance(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select("doc_id", "source")
    val j = docs.join(
      p15ClusterSplit(spark, dir).select("doc_id", "split", "naive_split"),
      "doc_id")
    val tot = j.groupBy("source").agg(count(lit(1)).as("n_src"))
    val cur = j.groupBy("source", "split").agg(count(lit(1)).as("n_docs"))
    val nai = j.select(col("source"), col("naive_split").as("split"))
      .groupBy("source", "split").agg(count(lit(1)).as("n_naive"))
    cur.join(nai, Seq("source", "split"), "full_outer")
      .join(tot, "source")
      .select(col("source"), col("split"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("n_naive"), lit(0L)).as("n_naive"),
        (coalesce(col("n_docs"), lit(0L)).cast("double") / col("n_src"))
          .as("share"),
        (coalesce(col("n_naive"), lit(0L)).cast("double") / col("n_src"))
          .as("naive_share"))
      .withColumn("drift", col("share") - col("naive_share"))
      .orderBy("source", "split")
  }

  /** p17: MULTI-EPOCH token schedule — the table a training run
    * derives before launch: given per-source token mass, sqrt-damped
    * mixture weights (p12's temperature rule applied to tokens) and
    * a global token budget (3× the corpus here), how many FULL
    * epochs of each source the run consumes, the partial-epoch
    * remainder, and the repetition-risk flag (target > 4 epochs —
    * the data-constrained-scaling rule of thumb that repeating past
    * ~4 epochs stops paying). Everything is exact integer
    * arithmetic off one ≤|sources|-row aggregate: target = (budget ×
    * w) div Σw, epochs = target div n_tokens, remainder = target mod
    * n_tokens; the ONE float column is a single division of exact
    * operands. floor(sqrt()) is the p12-proven portable weight.
    *
    * Plan shape (100 TB): one map-side-combinable groupBy(source)
    * over the token counts, a 1-row total broadcast onto the
    * ≤|sources|-row frame — no window, no second corpus pass; the
    * schedule is a driver-sized artifact derived wholly on
    * executors. */
  def p17EpochPlan(spark: SparkSession, dir: String,
                   budgetMult: Long = 3L): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val per = docs
      .select(col("source"),
        size(graft.functions.TextFns.tokens(col("text"))).cast("long").as("nt"))
      .groupBy("source").agg(sum(col("nt")).as("n_tokens"))
      .withColumn("w", floor(sqrt(col("n_tokens").cast("double"))).cast("long"))
    val tot = per.agg(sum(col("n_tokens")).as("total"), sum(col("w")).as("denom"))
    per.crossJoin(broadcast(tot))
      .withColumn("budget", col("total") * budgetMult)
      .withColumn("target_tokens", expr("(budget * w) div denom"))
      .withColumn("n_full_epochs", expr("target_tokens div n_tokens"))
      .withColumn("rem_tokens", expr("target_tokens % n_tokens"))
      .withColumn("epochs_frac",
        col("target_tokens").cast("double") / col("n_tokens"))
      .withColumn("over4", col("target_tokens") > col("n_tokens") * 4)
      .select("source", "n_tokens", "w", "target_tokens",
        "n_full_epochs", "rem_tokens", "epochs_frac", "over4")
      .orderBy("source")
  }

  /** p18: EPOCH-ROTATED dataloader read plan — the artifact a
    * training launcher actually consumes: for each epoch (p17's
    * 3×-budget multiple) and data-parallel rank, WHICH of p04's
    * shards the rank reads and the doc/token mass that implies.
    * Shard s in epoch e goes to rank (s + e) mod world — the
    * rotation re-deals shards every epoch, so ranks see different
    * data slices across epochs WITHOUT any data movement (the
    * shuffle-between-epochs that would otherwise be a full corpus
    * re-write is a mod in the read path). Within an epoch every
    * shard is read exactly once (spec-pinned), and the per-rank
    * token share quantifies the balance the hash sharding bought.
    *
    * Plan shape: runs entirely on p04's ≤|shards|-row manifest — one
    * explode to epochs × shards rows, one groupBy, a 1-row total
    * broadcast; the corpus is touched once (inside p04). */
  def p18ReadPlan(spark: SparkSession, dir: String,
                  epochs: Long = 3L, world: Long = 8L): DataFrame = {
    val m = p04ShardManifest(spark, dir)
    val tot = m.agg(sum(col("sum_tokens")).as("total_tokens"))
    m.withColumn("epoch", explode(sequence(lit(1L), lit(epochs))))
      .withColumn("rank_id", (col("shard") + col("epoch")) % world)
      .groupBy("epoch", "rank_id")
      .agg(count(lit(1)).as("n_shards"), sum(col("n_docs")).as("n_docs"),
        sum(col("sum_tokens")).as("n_tokens"))
      .crossJoin(broadcast(tot))
      .select(col("epoch"), col("rank_id"), col("n_shards"), col("n_docs"),
        col("n_tokens"),
        (col("n_tokens").cast("double") / col("total_tokens")).as("token_share"))
      .orderBy("epoch", "rank_id")
  }

  /** p19: OVERLAPPING CONTEXT WINDOWS — the long-document →
    * training-context split (and the RAG passage chunker): each
    * document becomes ⌈(n−W)/S⌉+1 windows of W tokens at stride S
    * (overlap W−S), the last window short only by the document's own
    * tail. Where p02 PACKS many docs into one context, this SPLITS
    * one doc across many — the two halves of context assembly.
    *
    * Chunk boundaries are pure integer algebra on the token count
    * (ceil via (n−W+S−1) div S — positive operands, floor division
    * identical in both engines), and the chunk text re-joins the
    * SAME whitespace token array both engines split (1-based slice,
    * mirroring the oracle's list_slice) — no float anywhere.
    *
    * Scale shape: a pure per-row explode — no join, no aggregate, no
    * window; the only exchange is the final presentation sort. Chunk
    * rows never leave their partition during construction, so the
    * operator is embarrassingly parallel at any corpus size (the
    * mapPartitions-free way to say mapPartitions). */
  def p19ChunkWindows(spark: SparkSession, dir: String,
                      window: Long = 32L, stride: Long = 24L): DataFrame =
    p19From(Tables.documents(spark, dir), window, stride)

  private[graft] def p19From(docs: DataFrame, window: Long = 32L,
                             stride: Long = 24L): DataFrame =
    chunkCore(docs, window, stride).orderBy("doc_id", "chunk_id")

  /** The sortless chunking core — ONE definition for the batch key
    * (p19, which adds only the presentation sort) and the streaming
    * twin ([[graft.streaming.QualityStream.chunkWindows]]): a
    * stateless per-row explode, so batch and per-micro-batch rows
    * are identical by construction. */
  private[graft] def chunkCore(docs: DataFrame, window: Long = 32L,
                               stride: Long = 24L): DataFrame = {
    // both reachable from the public Graft.chunkWindows/chunkPack API
    // (ADVICE r11): stride ≤ 0 divides by zero in n_chunks; stride >
    // window makes the last chunk's n_tok non-positive, where Spark's
    // slice() and DuckDB's list_slice diverge (the phashPairs
    // maxHamming require precedent)
    require(window >= 1 && stride >= 1 && stride <= window,
      s"chunk windows need window >= 1 and 1 <= stride <= window " +
        s"(got window=$window, stride=$stride)")
    val d = docs
      .select(col("doc_id"),
        graft.functions.TextFns.tokens(col("text")).as("t"))
      .withColumn("n", size(col("t")).cast("long"))
    d.withColumn("n_chunks",
        when(col("n") <= window, 1L)
          .otherwise(expr(s"(n - $window + $stride - 1) div $stride") + 1L))
      .withColumn("chunk_id", explode(sequence(lit(0L), col("n_chunks") - 1)))
      .withColumn("start_tok", col("chunk_id") * stride)
      .withColumn("n_tok", least(lit(window), col("n") - col("start_tok")))
      .select(col("doc_id"), col("chunk_id"), col("n_chunks"),
        col("start_tok"), col("n_tok"),
        array_join(slice(col("t"), (col("start_tok") + 1).cast("int"),
          col("n_tok").cast("int")), " ").as("chunk_text"))
  }

  /** The dense (doc, chunk) → int64 key shared by p20's packing and
    * p21's retrieval ranking: doc_id·2²⁰ + chunk_id — unique and
    * order-preserving under the documented bound, which is ENFORCED
    * (ADVICE r11): a document past 2²⁰ chunks or a doc_id ≥ 2⁴³
    * would silently corrupt ordering and the div/mod reconstruction
    * — fail loudly per offending row instead (the Similarity
    * qv_c.isNull raise_error precedent). Expects doc_id / n_chunks /
    * chunk_id columns in scope. */
  private def chunkKey: Column =
    when(col("n_chunks") >= lit(1048576L) ||
        col("doc_id") < 0L || col("doc_id") >= lit(8796093022208L),
        raise_error(concat(
          lit("chunk packing key out of range: doc_id="),
          col("doc_id").cast("string"),
          lit(" n_chunks="), col("n_chunks").cast("string"),
          lit(" — needs doc_id in [0, 2^43) and < 2^20 chunks/doc"))))
      .otherwise(col("doc_id") * lit(1048576L) + col("chunk_id"))

  /** p20: CHUNK-THEN-PACK — the ingest DAG composed end-to-end:
    * every document splits into p19's overlapping context windows
    * and the CHUNKS pack into contextLen-token bins per source
    * through p02's bucketed two-phase prefix sum, machinery
    * verbatim. This is what a pretraining loader actually consumes:
    * long documents window-split first (so no chunk straddles a
    * document boundary), then bins filled in (doc, chunk) reading
    * order.
    *
    * The packing key is doc_id·2²⁰ + chunk_id — dense, unique, and
    * order-preserving as long as a document stays under 2²⁰ chunks
    * (a ~25M-token document at the default stride; the fixture peaks
    * at 4). Pure integer algebra both ways (key div/mod 2²⁰
    * reconstructs the pair), so the oracle composes the two gated
    * CTEs with no new float surface.
    *
    * Scale shape: p19's per-row explode + ONE doc_id equi-join to
    * carry `source` + p02's two-phase prefix sum — no new shuffle
    * class; everything downstream of the chunker is chunk-count-
    * scaled, never byte-scaled. */
  def p20ChunkPack(spark: SparkSession, dir: String,
                   window: Long = 32L, stride: Long = 24L,
                   contextLen: Long = 2048L): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val packed = packTokens(
      chunkCore(docs, window, stride)
        .join(docs.select(col("doc_id"), col("source")), "doc_id")
        .select(chunkKey.as("doc_id"),
          col("source"), col("n_tok").as("n_tokens")),
      contextLen)
    packed.select(expr("doc_id div 1048576").as("doc_id"),
        (col("doc_id") % 1048576L).as("chunk_id"), col("source"),
        col("n_tokens").as("n_tok"), col("bin_id"), col("bin_offset"))
      .orderBy("doc_id", "chunk_id")
  }

  /** p21: CONTEXT ASSEMBLY — the retrieval half of the ingest DAG
    * (p19/p20 are the chunker half): for each query, rank the
    * corpus's context-window chunks by BM25 AT CHUNK GRANULARITY and
    * assemble the top chunks IN RANK ORDER under a token budget —
    * exactly what a RAG prompt builder / retrieval-augmented
    * pretraining mix does between the chunk store and the model:
    * retrieve, rank, cut at the context budget.
    *
    * Composition is literal, not parallel re-implementation: the
    * chunks are [[chunkCore]] (p19's gated explode, keyed by the
    * shared p20 packing key), the ranking is t18's gated Okapi
    * algebra ([[TextAnalysis.Bm25Queries]] — the one query set, and
    * the identical float discipline: rational idf, literal 2.2/1.2
    * constants, per-term floor to micro-units, integer per-chunk
    * sums) with chunk df / chunk length standing in for document df
    * / length (n_tok IS the chunk length — no re-count), and the
    * budget cut is one running sum over the ≤10 ranked rows.
    *
    * Oracle parity: every score is the t18-gated float shape; the
    * assembly is pure integers (prefix sum of n_tok, cum ≤ budget).
    *
    * Scale shape: chunk tf/df are map-side-combinable token
    * groupBys; the query-term frame is BOUNDED (≤ queries×terms
    * rows, broadcast); the top-10 is the t18 two-phase rank —
    * (query, hash-bucket) window then the ≤ 10·32-row final rank,
    * both PARTITIONED (no global window, PlanShapeSpec's sweep);
    * the budget walk touches ≤ 10 rows/query. Nothing downstream of
    * the chunker is byte-scaled. */
  def p21ContextAssembly(spark: SparkSession, dir: String,
                         window: Long = 32L, stride: Long = 24L,
                         budget: Long = 96L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget >= 1, s"context budget must be positive (got $budget)")
    val wCum = Window.partitionBy(col("query_id")).orderBy(col("rank"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    chunkBm25Ranked(chunkFrame(Tables.documents(spark, dir), window, stride))
      .withColumn("cum_tok", sum(col("n_tok")).over(wCum))
      .filter(col("cum_tok") <= budget)
      .select(col("query_id"), col("rank"),
        expr("ck div 1048576").as("doc_id"),
        (col("ck") % 1048576L).as("chunk_id"),
        col("n_tok"), col("cum_tok"), col("n_terms_hit"), col("score_micro"))
      .orderBy("query_id", "rank")
  }

  /** p23: DIVERSE CONTEXT — p21's assembly with the DIVERSITY CUT a
    * production RAG prompt builder applies between ranking and the
    * budget (overlapping windows of one document otherwise fill the
    * whole context with near-identical text): keep each query's best
    * chunk PER DOCUMENT, re-rank the survivors densely, then cut at
    * the token budget. Pure composition — [[chunkBm25Ranked]]'s
    * gated top-10 in, two query-partitioned row_numbers (≤ 10 rows
    * per partition by construction) and the integer prefix sum out.
    *
    * Scale shape: identical to p21 up to the ranking; everything
    * after operates on ≤ 10 rows/query (bounded windows, never
    * corpus-scaled). */
  def p23DiverseContext(spark: SparkSession, dir: String,
                        window: Long = 32L, stride: Long = 24L,
                        budget: Long = 96L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget >= 1, s"context budget must be positive (got $budget)")
    val ranked = chunkBm25Ranked(
      chunkFrame(Tables.documents(spark, dir), window, stride))
    val wD = Window.partitionBy(col("query_id"), expr("ck div 1048576"))
      .orderBy(col("rank"))
    val wQ = Window.partitionBy(col("query_id")).orderBy(col("rank"))
    val wCum = Window.partitionBy(col("query_id")).orderBy(col("new_rank"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked
      .withColumn("dr", row_number().over(wD)).filter(col("dr") === 1)
      .withColumn("new_rank", row_number().over(wQ))
      .withColumn("cum_tok", sum(col("n_tok")).over(wCum))
      .filter(col("cum_tok") <= budget)
      .select(col("query_id"), col("new_rank").cast("long").as("rank"),
        expr("ck div 1048576").as("doc_id"),
        (col("ck") % 1048576L).as("chunk_id"),
        col("n_tok"), col("cum_tok"), col("n_terms_hit"), col("score_micro"))
      .orderBy("query_id", "rank")
  }

  /** p24: CROSS-DOCUMENT DIVERSE CONTEXT (VERDICT r12 #3) — p23's
    * diversity cut dedups per (query, document), but near-identical
    * text in DIFFERENT documents (mirrors, boilerplate — exactly what
    * d02/d13 find) still floods a context with one passage repeated
    * under distinct doc_ids. This adds the CONTENT cut: collapse
    * ranked chunks sharing a d13-normalized content hash
    * ([[Dedup.normText]] + md5 over the chunk text — the CCNet-style
    * fuzzy-exact key, ONE definition with d13) alongside the per-doc
    * cut, both computed on the original rank (keep a chunk iff it is
    * the best of its document AND the best of its content group),
    * re-rank the survivors densely, cut at the token budget.
    *
    * The corpus is documents ∪ an exact MIRROR of the doc_id%10==3
    * slice under doc_id+1,000,000 (the p22 injectArrivals pattern —
    * the fixture's documents table has no byte-identical cross-doc
    * pairs at gate SF, and a diversity cut proven on a corpus where
    * it cannot fire proves nothing; a crawl's mirror sites are
    * exactly this shape). The mirrored copy of a top-ranked chunk
    * ties its original's score and lands adjacent in the top-10 —
    * the content cut visibly collapses it at BOTH gate SFs.
    *
    * Scale shape: identical to p21/p23 up to the ranking; the content
    * keys come from the chunker's frame (per-row md5, no new shuffle
    * class) and join the ≤ 10·|queries|-row BROADCAST ranked frame —
    * everything after the join operates on ≤ 10 rows/query (bounded
    * windows, never corpus-scaled). */
  def p24CrossdocContext(spark: SparkSession, dir: String,
                         window: Long = 32L, stride: Long = 24L,
                         budget: Long = 96L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget >= 1, s"context budget must be positive (got $budget)")
    val base = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val docs = base.unionByName(base.filter(col("doc_id") % 10 === 3)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    val ranked = chunkBm25Ranked(chunkFrame(docs, window, stride))
    val keys = chunkCore(docs, window, stride)
      .select(chunkKey.as("ck"),
        md5(Dedup.normText(col("chunk_text"))).as("content_key"))
    val wD = Window.partitionBy(col("query_id"), expr("ck div 1048576"))
      .orderBy(col("rank"))
    val wC = Window.partitionBy(col("query_id"), col("content_key"))
      .orderBy(col("rank"))
    val wQ = Window.partitionBy(col("query_id")).orderBy(col("rank"))
    val wCum = Window.partitionBy(col("query_id")).orderBy(col("new_rank"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    keys.join(broadcast(ranked), "ck")
      .withColumn("dr", row_number().over(wD))
      .withColumn("cr", row_number().over(wC))
      .filter(col("dr") === 1 && col("cr") === 1)
      .withColumn("new_rank", row_number().over(wQ))
      .withColumn("cum_tok", sum(col("n_tok")).over(wCum))
      .filter(col("cum_tok") <= budget)
      .select(col("query_id"), col("new_rank").cast("long").as("rank"),
        expr("ck div 1048576").as("doc_id"),
        (col("ck") % 1048576L).as("chunk_id"),
        col("n_tok"), col("cum_tok"), col("n_terms_hit"), col("score_micro"))
      .orderBy("query_id", "rank")
  }

  /** MMR pick count — generated into both engines' unrolled greedy
    * rounds (the PageRankIters one-constant rule). */
  private[graft] val MmrPicks = 5

  /** p25: MMR CONTEXT — maximal marginal relevance (Carbonell &
    * Goldstein), THE diversity standard a production RAG assembler
    * applies when near-identical passages crowd a ranking: greedily
    * pick, from p21's top-10 candidates per query, the chunk
    * maximizing relevance − redundancy, where redundancy is the max
    * token-set Jaccard similarity to the chunks ALREADY PICKED.
    * Where p23/p24 CUT duplicates by identity keys (doc, normalized
    * content), MMR trades off graded near-duplication against
    * relevance — overlapping windows of one document survive the
    * identity cuts yet score sim ≈ 0.7–0.9 here and get pushed down
    * (measured at sf0.01: 21 of 30 pick positions differ from plain
    * rank order).
    *
    * EXACT ARITHMETIC throughout (the iterative-algorithm rule —
    * t19/g03's integer micro-units applied to greedy selection):
    * relevance is the gated score_micro long; pairwise similarity is
    * floor(1e6·|A∩B|/|A∪B|) over distinct-token sets (ONE floored
    * division of exact counts); the greedy objective is a LONG
    * subtraction (λ=1 in micro units); every argmax tie-breaks on
    * ck. The [[MmrPicks]] rounds are unrolled in both engines from
    * the same constant — no float edge, no iteration drift.
    *
    * Scale shape: candidates are ≤10/query (bounded by the gated
    * two-phase top-k), so the pair similarity table is ≤|cand|²
    * GLOBAL rows over ≤60 distinct chunks, each round a micro-join +
    * one bounded-partition argmax window. Everything past the
    * ranking is candidate-scaled, never corpus-scaled. */
  def p25MmrContext(spark: SparkSession, dir: String,
                    window: Long = 32L, stride: Long = 24L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val chunks = chunkFrame(Tables.documents(spark, dir), window, stride)
    val ranked = OpCache.cached(chunkBm25Ranked(chunks)
      .select("query_id", "rank", "ck", "score_micro"))
    // distinct-token sets of the CANDIDATE chunks only (≤60 rows'
    // worth of tokens — the broadcast side is the candidate list)
    val cdt = chunks
      .join(broadcast(ranked.select("ck").distinct()), "ck")
      .select(col("ck"), explode(array_distinct(col("t"))).as("term"))
    val sz = cdt.groupBy("ck").agg(count(lit(1)).as("n"))
    val co = cdt.as("x").join(cdt.as("y"),
        col("x.term") === col("y.term") && col("x.ck") =!= col("y.ck"))
      .groupBy(col("x.ck").as("cka"), col("y.ck").as("ckb"))
      .agg(count(lit(1)).as("i"))
    val sim = OpCache.cached(co
      .join(sz.select(col("ck").as("cka"), col("n").as("na")), "cka")
      .join(sz.select(col("ck").as("ckb"), col("n").as("nb")), "ckb")
      .select(col("cka"), col("ckb"),
        floor(lit(1000000.0) * col("i") / (col("na") + col("nb") - col("i")))
          .cast("long").as("sim_micro")))
    // GREEDY STATE IS BOUNDED AND COLLECTED (the SemStream ≤k-rows
    // precedent — control decisions, never data): each round picks ≤1
    // row per query, and feeding the picks back as LAZY frames makes
    // the logical plan double per round (rem and presim both read the
    // previous selection) — measured at sf0.1: 75s warm and a
    // driver OOM on the second action for 30 output rows, execution
    // caching notwithstanding, because the OPTIMIZER re-walks the
    // exponentially-nested tree per action. The collected literal
    // (≤ queries·round rows) resets the lineage each round; every
    // scan/join still runs on executors over the cached candidate
    // and similarity frames.
    import spark.implicits._
    var picks = ranked.filter(col("rank") === 1)
      .select(col("query_id"), col("ck"), col("score_micro"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), 0L, 1L)).toSeq
    for (r <- 2 to MmrPicks) {
      val selAll = picks.map(p => (p._1, p._2)).toDF("query_id", "ck")
      val rem = ranked.join(broadcast(selAll), Seq("query_id", "ck"), "left_anti")
        .select("query_id", "ck", "score_micro")
      val presim = sim.join(broadcast(selAll.withColumnRenamed("ck", "ckb")),
          Seq("ckb"))
        .select(col("query_id"), col("cka").as("ck"), col("sim_micro"))
      val sm = rem.join(presim, Seq("query_id", "ck"), "left")
        .groupBy("query_id", "ck", "score_micro")
        .agg(coalesce(max(col("sim_micro")), lit(0L)).as("simmax_micro"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy((col("score_micro") - col("simmax_micro")).desc, col("ck"))
      picks = picks ++ sm.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("query_id"), col("ck"), col("score_micro"),
          col("simmax_micro"))
        .collect()
        .map(x => (x.getInt(0), x.getLong(1), x.getLong(2), x.getLong(3),
          r.toLong)).toSeq
    }
    picks.toDF("query_id", "ck", "score_micro", "simmax_micro", "pick")
      .select(col("query_id"), col("pick"),
        expr("ck div 1048576").as("doc_id"),
        (col("ck") % 1048576L).as("chunk_id"),
        col("score_micro"), col("simmax_micro"),
        (col("score_micro") - col("simmax_micro")).as("mmr_micro"))
      .orderBy("query_id", "pick")
  }

  /** p22: INCREMENTAL BM25 — the frozen-IDF append semantics as an
    * oracle key (the mm11 role for sparse retrieval): a corpus is
    * frozen, the derived `inject` arrival batch lands afterwards
    * ([[TextAnalysis.injectArrivals]] — t20's mild regime), and the
    * ranking runs over corpus ∪ arrival postings UNDER FREEZE-TIME
    * WEIGHTS — df and corpus stats computed from the corpus alone,
    * exactly what [[graft.sources.Bm25IndexStore.append]] +
    * [[graft.sources.Bm25IndexStore.searchFrozen]] serve (known-term
    * arrival chunks searchable immediately with slightly stale
    * weights; unseen-vocabulary postings drop at the df join — the
    * documented frozen-IDF consequence, visible here as the `nv…`
    * tokens never scoring). TextIndexSpec pins this key row-for-row
    * against a REAL freeze → append → searchFrozen lifecycle over
    * the same corpus — the store's whole incremental read path is
    * thereby oracle-hash-gated, not just spec-fixture-gated.
    *
    * Composition is literal: [[bm25Rank]] (THE ranking core the live
    * p21 and the frozen search also run) under corpus-only
    * df/stats, merged tf, merged lengths.
    *
    * Scale shape: ONE cached corpus posting pass feeds df/stats and
    * the merged frame; arrivals contribute O(arrival tokens); the
    * rank is the two-phase partitioned top-k. Never a corpus
    * re-tokenize, never all-pairs. */
  def p22IncrementalBm25(spark: SparkSession, dir: String,
                         window: Long = 32L, stride: Long = 24L): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val ctf = OpCache.cached(chunkFrame(docs, window, stride)
      .select(col("ck"), explode(col("t")).as("term"))
      .groupBy("ck", "term").agg(count(lit(1)).as("tf")))
    // cached like ctf: `merged` is read twice (tf join + lengths) —
    // without the cache each read re-tokenizes the arrival slice
    val atf = OpCache.cached(
      chunkFrame(TextAnalysis.injectArrivals(docs), window, stride)
        .select(col("ck"), explode(col("t")).as("term"))
        .groupBy("ck", "term").agg(count(lit(1)).as("tf")))
    val dfreq = ctf.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = ctf.groupBy("ck").agg(sum(col("tf")).as("dl"))
      .agg(count(lit(1)).as("n_chunks_tot"), sum(col("dl")).as("sum_dl"))
      .withColumn("avgdl", col("sum_dl").cast("double") / col("n_chunks_tot"))
      .select("n_chunks_tot", "avgdl")
    val merged = ctf.unionByName(atf)
    val dl = merged.groupBy("ck").agg(sum(col("tf")).as("dl"))
    val q = TextAnalysis.Bm25Queries
      .flatMap { case (qid, ts) => ts.map(t => (qid, t)) }
      .toDF("query_id", "term")
    bm25Rank(merged, dl, dfreq, stats, q)
  }

  /** The (ck, n_tok, t) chunk frame p21 ranks and the frozen text
    * index ([[graft.sources.Bm25IndexStore.freeze]]) persists — ONE
    * definition of chunk identity (the shared packing key) and chunk
    * tokenization, so the live and frozen retrieval paths cannot
    * drift. */
  private[graft] def chunkFrame(docs: DataFrame, window: Long = 32L,
                                stride: Long = 24L): DataFrame =
    chunkCore(docs, window, stride)
      .select(chunkKey.as("ck"), col("n_tok"),
        graft.functions.TextFns.tokens(col("chunk_text")).as("t"))

  /** p21's ranked-retrieval core over any (ck, n_tok, t) chunk
    * frame: top-10 chunks per [[TextAnalysis.Bm25Queries]] query by
    * the t18-gated Okapi algebra at chunk granularity. Returns
    * (query_id, rank, ck, n_tok, n_terms_hit, score_micro), total
    * order (query_id, rank). Also the LIVE twin the frozen text
    * index's search is spec-pinned against (TextIndexSpec). */
  private[graft] def chunkBm25Ranked(chunks: DataFrame): DataFrame = {
    val spark = chunks.sparkSession
    import spark.implicits._
    // ONE tokenize pass: the posting frame is cached and everything
    // else derives from it — dfreq re-aggregates it, chunk length is
    // Σtf per chunk (EXACTLY n_tok: every token of the chunk is
    // counted once), stats re-aggregate the lengths. The naive shape
    // (dl/stats each re-reading the chunk frame) re-tokenized the
    // corpus 4× — at 100 TB that is 3 extra corpus passes for data
    // the postings already contain.
    val tok = chunks.select(col("ck"), explode(col("t")).as("term"))
    val tf = OpCache.cached(
      tok.groupBy("ck", "term").agg(count(lit(1)).as("tf")))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val dl = tf.groupBy("ck").agg(sum(col("tf")).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_chunks_tot"),
        sum(col("dl")).as("sum_dl"))
      .withColumn("avgdl", col("sum_dl").cast("double") / col("n_chunks_tot"))
      .select("n_chunks_tot", "avgdl")
    val q = TextAnalysis.Bm25Queries
      .flatMap { case (qid, ts) => ts.map(t => (qid, t)) }
      .toDF("query_id", "term")
    bm25Rank(tf, dl, dfreq, stats, q)
  }

  /** THE ranking core — one definition of "score postings under
    * these weights and take the two-phase top-k" shared by the live
    * p21 ranking (self-derived weights), the incremental p22 key
    * (frozen corpus weights over merged postings) and the frozen
    * index's search ([[graft.sources.Bm25IndexStore.searchFrozen]]
    * over the persisted tables): tf (ck, term, tf) ⋈ the bounded
    * (query ⋈ df ⋈ stats) broadcast frame before anything wide, the
    * hint-free dl join, the t18-gated micro-unit Okapi score, and
    * the two-phase PARTITIONED top-k (local top-k in 32 hash
    * partitions of chunk space → top-k of the ≤ k·32 survivors — no
    * reducer ever sees a query's full match list). Expects columns:
    * tf (ck, term, tf), dl (ck, dl), dfreq (term, df), stats
    * (n_chunks_tot, avgdl) — ONE row, q (query_id, term). */
  private[graft] def bm25Rank(tf: DataFrame, dl: DataFrame,
                              dfreq: DataFrame, stats: DataFrame,
                              q: DataFrame, topK: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qdf = dfreq.join(broadcast(q), "term").crossJoin(broadcast(stats))
    // dl rides THROUGH the aggregate (max of a per-ck constant —
    // dl is one row per chunk in every consumer: the live per-ck
    // aggregate, the store's lens table, p22's merged lens) instead
    // of re-joining the length frame onto the ≤ k·|queries| winners
    // at the end (r18 opt pass): the old tail join re-derived /
    // re-read the CORPUS-scale length frame — one full postings
    // shuffle at 100 TB — to attach one column to a bounded result.
    // Rows are identical; only the attachment path changed.
    val scored = tf.join(broadcast(qdf), Seq("term"))
      .join(dl, "ck")
      .select(col("query_id"), col("ck"), col("dl"), bm25Micro.as("micro"))
      .groupBy("query_id", "ck")
      .agg(count(lit(1)).as("n_terms_hit"), sum(col("micro")).as("score_micro"),
        max(col("dl")).as("n_tok"))
    val ord = Seq(col("score_micro").desc, col("ck").asc)
    val w1 = Window.partitionBy(col("query_id"), col("p")).orderBy(ord: _*)
    val w2 = Window.partitionBy(col("query_id")).orderBy(ord: _*)
    scored.withColumn("p", pmod(xxhash64(col("ck")), lit(32)).cast("int"))
      .withColumn("r1", row_number().over(w1)).filter(col("r1") <= topK)
      .withColumn("rank", row_number().over(w2)).filter(col("rank") <= topK)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("ck"), col("n_tok"), col("n_terms_hit"), col("score_micro"))
      .orderBy("query_id", "rank")
  }

  /** The t18-gated Okapi per-term score in exact micro-units —
    * literal constants, rational idf, ONE floor — over columns
    * (tf, df, dl, n_chunks_tot, avgdl) in scope. ONE definition for
    * the live ranking above and the frozen index's search
    * ([[graft.sources.Bm25IndexStore.searchFrozen]]). */
  private[graft] def bm25Micro: Column = {
    val idf = ((col("n_chunks_tot") - col("df")).cast("double") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5))
    val den = col("tf").cast("double") + lit(1.2) *
      (lit(0.25) + lit(0.75) * (col("dl").cast("double") / col("avgdl")))
    floor(idf * ((col("tf").cast("double") * lit(2.2)) / den) *
      lit(1000000.0)).cast("long")
  }

  /** The VOCAB-DRIFT row — ONE definition for the live monitor
    * (t20, [[graft.operators.TextAnalysis.t20VocabDrift]]) and the
    * frozen text index's staleness read
    * ([[graft.sources.Bm25IndexStore.staleness]] — same algebra over
    * the persisted dfreq/stats instead of the live corpus): over an
    * arrival chunk frame (ck, n_tok, t), a vocabulary frame (term)
    * and a one-row (frozen_avgdl) frame, count arrival postings
    * whose term the vocabulary has never seen (those chunks cannot
    * be retrieved BY those terms until a re-freeze) plus the
    * arrivals' length drift vs the frozen average. All counts exact;
    * each share/average is ONE division of exact integers (oracle-
    * identical doubles). Cost: arrival-token-scale ⋈ vocab — never a
    * corpus pass. */
  private[graft] def vocabDriftRow(arrivals: DataFrame, vocab: DataFrame,
                                   frozenAvgdl: DataFrame): DataFrame = {
    val tf = arrivals.select(col("ck"), explode(col("t")).as("term"))
      .groupBy("ck", "term").agg(count(lit(1)).as("tf"))
    tf.join(vocab.select(col("term"), lit(1L).as("seen")), Seq("term"), "left")
      .agg(count(lit(1)).as("n_postings"),
        sum(when(col("seen").isNull, 1L).otherwise(0L)).as("n_unseen"))
      .crossJoin(broadcast(arrivals.agg(count(lit(1)).as("n_arr_chunks"),
        (sum(col("n_tok")).cast("double") / count(lit(1))).as("arr_avgdl"))))
      .crossJoin(broadcast(frozenAvgdl.select(col("frozen_avgdl"))))
      .select(col("n_arr_chunks"), col("n_postings"), col("n_unseen"),
        (col("n_unseen").cast("double") / col("n_postings")).as("unseen_share"),
        col("arr_avgdl"), col("frozen_avgdl"))
  }

  /** The shared chunk-rank CTE chain (everything through the top-10
    * `rk` frame) p21 and p23 both open with — the query VALUES are
    * generated from the SAME Seq the Column plans read (the t18
    * rule: the query set exists in one place). */
  private lazy val p21RankCtes: String = {
    val values = TextAnalysis.Bm25Queries.flatMap { case (qid, ts) =>
      ts.map(t => s"($qid, '$t')") }.mkString(", ")
    raw"""WITH d AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
       |s AS (SELECT doc_id, t, CAST(len(t) AS BIGINT) AS n,
       |    CAST(CASE WHEN len(t) <= 32 THEN 1
       |         ELSE (len(t) - 32 + 23) // 24 + 1 END AS BIGINT) AS n_chunks
       |  FROM d),
       |c AS (SELECT doc_id, t, n,
       |    unnest(generate_series(0, n_chunks - 1)) AS chunk_id FROM s),
       |ck AS (SELECT doc_id * 1048576 + chunk_id AS ck,
       |    CAST(least(32, n - chunk_id * 24) AS BIGINT) AS n_tok,
       |    string_split_regex(trim(array_to_string(list_slice(t, chunk_id * 24 + 1,
       |      chunk_id * 24 + least(32, n - chunk_id * 24)), ' ')), '\s+') AS ct
       |  FROM c),
       |tok AS (SELECT ck, unnest(ct) AS term FROM ck),
       |tf AS (SELECT ck, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
       |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
       |st AS (SELECT n_chunks_tot, CAST(sum_dl AS DOUBLE) / n_chunks_tot AS avgdl FROM (
       |  SELECT COUNT(*) AS n_chunks_tot, CAST(SUM(n_tok) AS BIGINT) AS sum_dl FROM ck) s0),
       |q AS (SELECT * FROM (VALUES $values) AS v(query_id, term)),
       |qdf AS (SELECT query_id, term, df FROM q JOIN dfreq USING (term)),
       |dl AS (SELECT ck, n_tok AS dl FROM ck),
       |ts AS (SELECT query_id, tf.ck,
       |  CAST(floor(((CAST(n_chunks_tot - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
       |    * ((CAST(tf AS DOUBLE) * 2.2) / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / avgdl))))
       |    * 1000000.0) AS BIGINT) AS micro
       |  FROM tf JOIN qdf USING (term) JOIN dl ON dl.ck = tf.ck CROSS JOIN st),
       |scored AS (SELECT query_id, ck, COUNT(*) AS n_terms_hit,
       |  CAST(SUM(micro) AS BIGINT) AS score_micro FROM ts GROUP BY 1, 2),
       |rk AS (SELECT * FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score_micro DESC, ck) AS rank
       |  FROM scored) r0 WHERE rank <= 10),""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "p22_incremental_bm25" -> {
      val values = TextAnalysis.Bm25Queries.flatMap { case (qid, ts) =>
        ts.map(t => s"($qid, '$t')") }.mkString(", ")
      raw"""WITH d AS (SELECT doc_id, text FROM documents),
         |arr AS (SELECT doc_id + 1000000 AS doc_id,
         |    'nv' || CAST(doc_id AS VARCHAR) || ' ' || text AS text
         |  FROM d WHERE doc_id % 10 = 8),
         |cd AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM d),
         |cs AS (SELECT doc_id, t, CAST(len(t) AS BIGINT) AS n,
         |    CAST(CASE WHEN len(t) <= 32 THEN 1
         |         ELSE (len(t) - 32 + 23) // 24 + 1 END AS BIGINT) AS n_chunks
         |  FROM cd),
         |cc AS (SELECT doc_id, t, n,
         |    unnest(generate_series(0, n_chunks - 1)) AS chunk_id FROM cs),
         |cck AS (SELECT doc_id * 1048576 + chunk_id AS ck,
         |    CAST(least(32, n - chunk_id * 24) AS BIGINT) AS n_tok,
         |    string_split_regex(trim(array_to_string(list_slice(t, chunk_id * 24 + 1,
         |      chunk_id * 24 + least(32, n - chunk_id * 24)), ' ')), '\s+') AS ct
         |  FROM cc),
         |ctok AS (SELECT ck, unnest(ct) AS term FROM cck),
         |ctf AS (SELECT ck, term, COUNT(*) AS tf FROM ctok GROUP BY 1, 2),
         |dfreq AS (SELECT term, COUNT(*) AS df FROM ctf GROUP BY 1),
         |st AS (SELECT n_chunks_tot, CAST(sum_dl AS DOUBLE) / n_chunks_tot AS avgdl FROM (
         |  SELECT COUNT(*) AS n_chunks_tot, CAST(SUM(n_tok) AS BIGINT) AS sum_dl FROM cck) s0),
         |ad AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM arr),
         |asx AS (SELECT doc_id, t, CAST(len(t) AS BIGINT) AS n,
         |    CAST(CASE WHEN len(t) <= 32 THEN 1
         |         ELSE (len(t) - 32 + 23) // 24 + 1 END AS BIGINT) AS n_chunks
         |  FROM ad),
         |ac AS (SELECT doc_id, t, n,
         |    unnest(generate_series(0, n_chunks - 1)) AS chunk_id FROM asx),
         |ack AS (SELECT doc_id * 1048576 + chunk_id AS ck,
         |    CAST(least(32, n - chunk_id * 24) AS BIGINT) AS n_tok,
         |    string_split_regex(trim(array_to_string(list_slice(t, chunk_id * 24 + 1,
         |      chunk_id * 24 + least(32, n - chunk_id * 24)), ' ')), '\s+') AS ct
         |  FROM ac),
         |atok AS (SELECT ck, unnest(ct) AS term FROM ack),
         |atf AS (SELECT ck, term, COUNT(*) AS tf FROM atok GROUP BY 1, 2),
         |tf AS (SELECT * FROM ctf UNION ALL SELECT * FROM atf),
         |dl AS (SELECT ck, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
         |q AS (SELECT * FROM (VALUES $values) AS v(query_id, term)),
         |qdf AS (SELECT query_id, q.term, df FROM q JOIN dfreq ON q.term = dfreq.term),
         |ts AS (SELECT query_id, tf.ck,
         |  CAST(floor(((CAST(n_chunks_tot - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
         |    * ((CAST(tf AS DOUBLE) * 2.2) / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / avgdl))))
         |    * 1000000.0) AS BIGINT) AS micro
         |  FROM tf JOIN qdf ON tf.term = qdf.term JOIN dl ON dl.ck = tf.ck CROSS JOIN st),
         |scored AS (SELECT query_id, ck, COUNT(*) AS n_terms_hit,
         |  CAST(SUM(micro) AS BIGINT) AS score_micro FROM ts GROUP BY 1, 2),
         |rk AS (SELECT * FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score_micro DESC, ck) AS rank
         |  FROM scored) r0 WHERE rank <= 10)
         |SELECT query_id, CAST(rank AS BIGINT) AS rank, rk.ck, dl.dl AS n_tok,
         |  n_terms_hit, score_micro
         |FROM rk JOIN dl ON dl.ck = rk.ck
         |ORDER BY query_id, rank""".stripMargin
    },

    "p21_context_assembly" ->
      raw"""${p21RankCtes}
         |asm AS (SELECT rk.query_id, rk.rank, rk.ck, rk.n_terms_hit, rk.score_micro,
         |  dl.dl AS n_tok,
         |  CAST(SUM(dl.dl) OVER (PARTITION BY rk.query_id ORDER BY rk.rank
         |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tok
         |  FROM rk JOIN dl ON dl.ck = rk.ck)
         |SELECT query_id, CAST(rank AS BIGINT) AS rank, ck // 1048576 AS doc_id,
         |  ck % 1048576 AS chunk_id, n_tok, cum_tok, n_terms_hit, score_micro
         |FROM asm WHERE cum_tok <= 96 ORDER BY query_id, rank""".stripMargin,

    "p23_diverse_context" ->
      raw"""${p21RankCtes}
         |dv AS (SELECT * FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id, ck // 1048576
         |    ORDER BY rank) AS dr FROM rk) d0 WHERE dr = 1),
         |rr AS (SELECT query_id, ck, n_terms_hit, score_micro,
         |  row_number() OVER (PARTITION BY query_id ORDER BY rank) AS rank FROM dv),
         |asm AS (SELECT rr.query_id, rr.rank, rr.ck, rr.n_terms_hit, rr.score_micro,
         |  dl.dl AS n_tok,
         |  CAST(SUM(dl.dl) OVER (PARTITION BY rr.query_id ORDER BY rr.rank
         |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tok
         |  FROM rr JOIN dl ON dl.ck = rr.ck)
         |SELECT query_id, CAST(rank AS BIGINT) AS rank, ck // 1048576 AS doc_id,
         |  ck % 1048576 AS chunk_id, n_tok, cum_tok, n_terms_hit, score_micro
         |FROM asm WHERE cum_tok <= 96 ORDER BY query_id, rank""".stripMargin,

    // the MMR rounds are GENERATED from the same MmrPicks constant
    // the Column loop unrolls (the g03/t19 one-fragment rule); the
    // chain through `rk` is p21's shared CTE set
    "p25_mmr_context" -> {
      val rounds = (2 to MmrPicks).map { r =>
        s"""rem$r AS (SELECT rk.query_id, rk.ck, rk.score_micro FROM rk
           |  WHERE NOT EXISTS (SELECT 1 FROM selall${r - 1} s
           |    WHERE s.query_id = rk.query_id AND s.ck = rk.ck)),
           |presim$r AS (SELECT p.query_id, sim.cka AS ck, sim.sim_micro
           |  FROM sim JOIN selall${r - 1} p ON p.ck = sim.ckb),
           |sm$r AS (SELECT m.query_id, m.ck, m.score_micro,
           |  CAST(COALESCE(MAX(ps.sim_micro), 0) AS BIGINT) AS simmax_micro
           |  FROM rem$r m LEFT JOIN presim$r ps
           |    ON ps.query_id = m.query_id AND ps.ck = m.ck
           |  GROUP BY 1, 2, 3),
           |pick$r AS (SELECT query_id, ck, score_micro, simmax_micro,
           |  CAST($r AS BIGINT) AS pick FROM (
           |    SELECT *, row_number() OVER (PARTITION BY query_id
           |      ORDER BY score_micro - simmax_micro DESC, ck) AS rn FROM sm$r) t
           |  WHERE rn = 1),
           |selall$r AS (SELECT query_id, ck FROM selall${r - 1}
           |  UNION ALL SELECT query_id, ck FROM pick$r)""".stripMargin
      }.mkString(",\n")
      val unionAll = (1 to MmrPicks)
        .map(r => s"SELECT * FROM pick$r").mkString(" UNION ALL ")
      raw"""${p21RankCtes}
         |cdt AS (SELECT DISTINCT c2.ck, unnest(c2.ct) AS term
         |  FROM ck c2 JOIN (SELECT DISTINCT ck FROM rk) r USING (ck)),
         |sz AS (SELECT ck, COUNT(*) AS n FROM cdt GROUP BY 1),
         |co AS (SELECT x.ck AS cka, y.ck AS ckb, COUNT(*) AS i
         |  FROM cdt x JOIN cdt y ON x.term = y.term AND x.ck <> y.ck GROUP BY 1, 2),
         |sim AS (SELECT cka, ckb,
         |  CAST(floor(1000000.0 * co.i / (sa.n + sb.n - co.i)) AS BIGINT) AS sim_micro
         |  FROM co JOIN sz sa ON sa.ck = co.cka JOIN sz sb ON sb.ck = co.ckb),
         |pick1 AS (SELECT query_id, ck, score_micro, CAST(0 AS BIGINT) AS simmax_micro,
         |  CAST(1 AS BIGINT) AS pick FROM rk WHERE rank = 1),
         |selall1 AS (SELECT query_id, ck FROM pick1),
         |$rounds
         |SELECT query_id, pick, ck // 1048576 AS doc_id, ck % 1048576 AS chunk_id,
         |  score_micro, simmax_micro, score_micro - simmax_micro AS mmr_micro
         |FROM ($unionAll) u
         |ORDER BY query_id, pick""".stripMargin
    },

    // the content key is the d13 normalization verbatim (lower →
    // strip non-alphanumerics → collapse spaces → md5), applied to
    // the same joined chunk text both engines slice; the corpus is
    // documents ∪ the %10==3 mirror slice (standalone CTE chain —
    // p21RankCtes reads the raw table), so the chain through `rk`
    // is p21's with `d` swapped for the mirrored `d0`
    "p24_crossdoc_context" -> {
      val values = TextAnalysis.Bm25Queries.flatMap { case (qid, ts) =>
        ts.map(t => s"($qid, '$t')") }.mkString(", ")
      raw"""WITH d0 AS (SELECT doc_id, text FROM documents
         |     UNION ALL
         |     SELECT doc_id + 1000000 AS doc_id, text FROM documents
         |     WHERE doc_id % 10 = 3),
         |d AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM d0),
         |s AS (SELECT doc_id, t, CAST(len(t) AS BIGINT) AS n,
         |    CAST(CASE WHEN len(t) <= 32 THEN 1
         |         ELSE (len(t) - 32 + 23) // 24 + 1 END AS BIGINT) AS n_chunks
         |  FROM d),
         |c AS (SELECT doc_id, t, n,
         |    unnest(generate_series(0, n_chunks - 1)) AS chunk_id FROM s),
         |ck AS (SELECT doc_id * 1048576 + chunk_id AS ck,
         |    CAST(least(32, n - chunk_id * 24) AS BIGINT) AS n_tok,
         |    string_split_regex(trim(array_to_string(list_slice(t, chunk_id * 24 + 1,
         |      chunk_id * 24 + least(32, n - chunk_id * 24)), ' ')), '\s+') AS ct
         |  FROM c),
         |tok AS (SELECT ck, unnest(ct) AS term FROM ck),
         |tf AS (SELECT ck, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
         |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
         |st AS (SELECT n_chunks_tot, CAST(sum_dl AS DOUBLE) / n_chunks_tot AS avgdl FROM (
         |  SELECT COUNT(*) AS n_chunks_tot, CAST(SUM(n_tok) AS BIGINT) AS sum_dl FROM ck) s0),
         |q AS (SELECT * FROM (VALUES $values) AS v(query_id, term)),
         |qdf AS (SELECT query_id, term, df FROM q JOIN dfreq USING (term)),
         |dl AS (SELECT ck, n_tok AS dl FROM ck),
         |ts AS (SELECT query_id, tf.ck,
         |  CAST(floor(((CAST(n_chunks_tot - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
         |    * ((CAST(tf AS DOUBLE) * 2.2) / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / avgdl))))
         |    * 1000000.0) AS BIGINT) AS micro
         |  FROM tf JOIN qdf USING (term) JOIN dl ON dl.ck = tf.ck CROSS JOIN st),
         |scored AS (SELECT query_id, ck, COUNT(*) AS n_terms_hit,
         |  CAST(SUM(micro) AS BIGINT) AS score_micro FROM ts GROUP BY 1, 2),
         |rk AS (SELECT * FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score_micro DESC, ck) AS rank
         |  FROM scored) r0 WHERE rank <= 10),
         |nk AS (SELECT doc_id * 1048576 + chunk_id AS ck,
         |  md5(trim(regexp_replace(regexp_replace(lower(array_to_string(list_slice(t, chunk_id * 24 + 1,
         |    chunk_id * 24 + least(32, n - chunk_id * 24)), ' ')), '[^a-z0-9 ]', ' ', 'g'), '  *', ' ', 'g'))) AS content_key
         |  FROM c),
         |dv AS (SELECT * FROM (
         |  SELECT rk.*, nk.content_key,
         |    row_number() OVER (PARTITION BY query_id, rk.ck // 1048576 ORDER BY rank) AS dr,
         |    row_number() OVER (PARTITION BY query_id, nk.content_key ORDER BY rank) AS cr
         |  FROM rk JOIN nk ON nk.ck = rk.ck) d0 WHERE dr = 1 AND cr = 1),
         |rr AS (SELECT query_id, ck, n_terms_hit, score_micro,
         |  row_number() OVER (PARTITION BY query_id ORDER BY rank) AS rank FROM dv),
         |asm AS (SELECT rr.query_id, rr.rank, rr.ck, rr.n_terms_hit, rr.score_micro,
         |  dl.dl AS n_tok,
         |  CAST(SUM(dl.dl) OVER (PARTITION BY rr.query_id ORDER BY rr.rank
         |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tok
         |  FROM rr JOIN dl ON dl.ck = rr.ck)
         |SELECT query_id, CAST(rank AS BIGINT) AS rank, ck // 1048576 AS doc_id,
         |  ck % 1048576 AS chunk_id, n_tok, cum_tok, n_terms_hit, score_micro
         |FROM asm WHERE cum_tok <= 96 ORDER BY query_id, rank""".stripMargin
    },

    "p20_chunk_pack" ->
      raw"""WITH d AS (SELECT doc_id, source,
         |    string_split_regex(trim(text), '\s+') AS t FROM documents),
         |s AS (SELECT doc_id, source, t, CAST(len(t) AS BIGINT) AS n,
         |    CAST(CASE WHEN len(t) <= 32 THEN 1
         |         ELSE (len(t) - 32 + 23) // 24 + 1 END AS BIGINT) AS n_chunks
         |  FROM d),
         |ch AS (SELECT doc_id, source, n,
         |    unnest(generate_series(0, n_chunks - 1)) AS chunk_id FROM s),
         |ck AS (SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id, source,
         |    CAST(least(32, n - chunk_id * 24) AS BIGINT) AS n_tok,
         |    doc_id * 1048576 + chunk_id AS pk FROM ch),
         |c AS (SELECT *, CAST(COALESCE(SUM(n_tok) OVER (PARTITION BY source
         |    ORDER BY pk ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |    0) AS BIGINT) AS start_tok FROM ck)
         |SELECT doc_id, chunk_id, source, n_tok,
         |  start_tok // 2048 AS bin_id, start_tok % 2048 AS bin_offset
         |FROM c ORDER BY doc_id, chunk_id""".stripMargin,

    "p19_chunk_windows" ->
      raw"""WITH d AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
         |s AS (SELECT doc_id, t, CAST(len(t) AS BIGINT) AS n,
         |    CAST(CASE WHEN len(t) <= 32 THEN 1
         |         ELSE (len(t) - 32 + 23) // 24 + 1 END AS BIGINT) AS n_chunks
         |  FROM d),
         |c AS (SELECT doc_id, t, n, n_chunks,
         |    unnest(generate_series(0, n_chunks - 1)) AS chunk_id FROM s)
         |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id, n_chunks,
         |  CAST(chunk_id * 24 AS BIGINT) AS start_tok,
         |  CAST(least(32, n - chunk_id * 24) AS BIGINT) AS n_tok,
         |  array_to_string(list_slice(t, chunk_id * 24 + 1,
         |    chunk_id * 24 + least(32, n - chunk_id * 24)), ' ') AS chunk_text
         |FROM c ORDER BY doc_id, chunk_id""".stripMargin,

    "p18_read_plan" ->
      raw"""WITH d AS (SELECT doc_id,
         |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
         |    ((doc_id * 2654435761) % 4294967296) % 16 AS shard
         |  FROM documents),
         |sh AS (SELECT shard, COUNT(*) AS n_docs,
         |    CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens FROM d GROUP BY 1),
         |tot AS (SELECT CAST(SUM(sum_tokens) AS BIGINT) AS total_tokens FROM sh),
         |pl AS (SELECT shard, n_docs, sum_tokens,
         |    unnest(generate_series(1, 3)) AS epoch FROM sh)
         |SELECT CAST(epoch AS BIGINT) AS epoch,
         |  (shard + epoch) % 8 AS rank_id,
         |  COUNT(*) AS n_shards,
         |  CAST(SUM(n_docs) AS BIGINT) AS n_docs,
         |  CAST(SUM(sum_tokens) AS BIGINT) AS n_tokens,
         |  CAST(SUM(sum_tokens) AS DOUBLE) / total_tokens AS token_share
         |FROM pl, tot
         |GROUP BY epoch, (shard + epoch) % 8, total_tokens
         |ORDER BY epoch, rank_id""".stripMargin,

    "p17_epoch_plan" ->
      raw"""WITH t AS (SELECT source,
         |    CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS n_tokens
         |  FROM documents GROUP BY source),
         |w AS (SELECT source, n_tokens,
         |    CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS w FROM t),
         |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total,
         |    CAST(SUM(w) AS BIGINT) AS denom FROM w),
         |p AS (SELECT source, n_tokens, w,
         |    ((total * 3) * w) // denom AS target_tokens
         |  FROM w, tot)
         |SELECT source, n_tokens, w, target_tokens,
         |  target_tokens // n_tokens AS n_full_epochs,
         |  target_tokens % n_tokens AS rem_tokens,
         |  CAST(target_tokens AS DOUBLE) / n_tokens AS epochs_frac,
         |  target_tokens > n_tokens * 4 AS over4
         |FROM p ORDER BY source""".stripMargin,

    "p16_split_balance" ->
      ("WITH RECURSIVE " + Dedup.shCte + ",\n" + Dedup.sigCte + ",\n" +
        Dedup.candCte + ",\n" + Dedup.clusterCte + """,
        |ac AS (SELECT d.doc_id, COALESCE(lab.cluster_id, d.doc_id) AS cluster_id
        |       FROM documents d LEFT JOIN lab ON lab.doc_id = d.doc_id),
        |sp AS (SELECT doc_id,
        |  CASE WHEN ((cluster_id * 2654435761) % 4294967296) % 10 = 0 THEN 'test'
        |       WHEN ((cluster_id * 2654435761) % 4294967296) % 10 = 1 THEN 'val'
        |       ELSE 'train' END AS split,
        |  CASE WHEN ((doc_id * 2654435761) % 4294967296) % 10 = 0 THEN 'test'
        |       WHEN ((doc_id * 2654435761) % 4294967296) % 10 = 1 THEN 'val'
        |       ELSE 'train' END AS naive_split
        |  FROM ac),
        |jj AS (SELECT d.source, sp.split, sp.naive_split
        |       FROM sp JOIN documents d USING (doc_id)),
        |tot16 AS (SELECT source, COUNT(*) AS n_src FROM jj GROUP BY source),
        |cur16 AS (SELECT source, split, COUNT(*) AS n_docs FROM jj GROUP BY 1, 2),
        |nai16 AS (SELECT source, naive_split AS split, COUNT(*) AS n_naive FROM jj GROUP BY 1, 2)
        |SELECT source, split,
        |  COALESCE(n_docs, 0) AS n_docs,
        |  COALESCE(n_naive, 0) AS n_naive,
        |  CAST(COALESCE(n_docs, 0) AS DOUBLE) / t.n_src AS share,
        |  CAST(COALESCE(n_naive, 0) AS DOUBLE) / t.n_src AS naive_share,
        |  CAST(COALESCE(n_docs, 0) AS DOUBLE) / t.n_src
        |    - CAST(COALESCE(n_naive, 0) AS DOUBLE) / t.n_src AS drift
        |FROM cur16 c FULL OUTER JOIN nai16 USING (source, split)
        |JOIN tot16 t USING (source)
        |ORDER BY source, split""".stripMargin),

    "p15_cluster_split" ->
      ("WITH RECURSIVE " + Dedup.shCte + ",\n" + Dedup.sigCte + ",\n" +
        Dedup.candCte + ",\n" + Dedup.clusterCte + """,
        |ac AS (SELECT d.doc_id, COALESCE(lab.cluster_id, d.doc_id) AS cluster_id
        |       FROM documents d LEFT JOIN lab ON lab.doc_id = d.doc_id),
        |sp AS (SELECT doc_id, cluster_id,
        |  CASE WHEN ((cluster_id * 2654435761) % 4294967296) % 10 = 0 THEN 'test'
        |       WHEN ((cluster_id * 2654435761) % 4294967296) % 10 = 1 THEN 'val'
        |       ELSE 'train' END AS split,
        |  CASE WHEN ((doc_id * 2654435761) % 4294967296) % 10 = 0 THEN 'test'
        |       WHEN ((doc_id * 2654435761) % 4294967296) % 10 = 1 THEN 'val'
        |       ELSE 'train' END AS naive_split
        |  FROM ac),
        |stc AS (SELECT cluster_id, COUNT(DISTINCT naive_split) > 1 AS straddled
        |        FROM sp GROUP BY cluster_id)
        |SELECT sp.doc_id, sp.cluster_id, sp.split, sp.naive_split, stc.straddled
        |FROM sp JOIN stc USING (cluster_id)
        |ORDER BY doc_id""".stripMargin),

    "p12_temperature_mix" ->
      """WITH per AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
        |pw AS (SELECT source, n_docs,
        |    CAST(FLOOR(SQRT(CAST(n_docs AS DOUBLE))) AS BIGINT) AS w FROM per),
        |tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total,
        |               CAST(SUM(w) AS BIGINT) AS denom FROM pw),
        |thr AS (SELECT source, n_docs, w,
        |    LEAST(1000000, ((((total // 2) * w) // denom) * 1000000) // n_docs) AS thr1e6
        |  FROM pw CROSS JOIN tot),
        |kept AS (SELECT d.source, COUNT(*) AS n_kept
        |         FROM documents d JOIN thr USING (source)
        |         WHERE ((d.doc_id * 2654435761) % 4294967296) % 1000000 < thr1e6
        |         GROUP BY d.source)
        |SELECT thr.source, n_docs, w, thr1e6,
        |  CAST(COALESCE(n_kept, 0) AS BIGINT) AS n_kept,
        |  CAST(COALESCE(n_kept, 0) AS DOUBLE) / n_docs AS kept_share
        |FROM thr LEFT JOIN kept USING (source) ORDER BY source""".stripMargin,

    "p13_rank_balance" ->
      """WITH d AS (SELECT doc_id, source,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (SELECT doc_id, source, n_tokens,
        |    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
        |  FROM d),
        |si AS (SELECT source, CAST(row_number() OVER (ORDER BY source) - 1 AS BIGINT) AS si
        |       FROM (SELECT DISTINCT source FROM documents) s),
        |bins AS (SELECT source, start_tok // 2048 AS bin_id,
        |    COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
        |  FROM c GROUP BY 1, 2),
        |rb AS (SELECT (((bin_id * 8192 + si) * 2654435761) % 4294967296) % 64 AS rank_id,
        |    n_docs, bin_tokens FROM bins JOIN si USING (source)),
        |tot AS (SELECT CAST(SUM(bin_tokens) AS BIGINT) AS total FROM rb)
        |SELECT rank_id, COUNT(*) AS n_bins, CAST(SUM(n_docs) AS BIGINT) AS n_docs,
        |  CAST(SUM(bin_tokens) AS BIGINT) AS sum_tokens,
        |  CAST(SUM(bin_tokens) * 64 AS DOUBLE) / total AS load_ratio
        |FROM rb CROSS JOIN tot GROUP BY rank_id, total ORDER BY rank_id""".stripMargin,

    "p11_curriculum_order" ->
      ("WITH " + TextAnalysis.qualityCtes + """,
        |ph AS (SELECT doc_id, quality,
        |    CASE WHEN quality >= 0.55 THEN 1
        |         WHEN quality >= 0.45 THEN 2 ELSE 3 END AS phase,
        |    (doc_id * 1103515245 + 12345) % 2147483647 AS h
        |  FROM qq),
        |sh11 AS (SELECT doc_id, quality, CAST(phase AS BIGINT) AS phase, h, h % 64 AS shard FROM ph)
        |SELECT doc_id, quality, phase, shard,
        |  CAST(row_number() OVER (PARTITION BY phase, shard ORDER BY h, doc_id) AS BIGINT) AS pos
        |FROM sh11 ORDER BY phase, shard, pos""".stripMargin),

    "p10_pack_boundaries" ->
      """WITH d AS (SELECT doc_id, source,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (SELECT doc_id, source, n_tokens,
        |    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
        |  FROM d),
        |s AS (SELECT doc_id, source, start_tok,
        |    start_tok + n_tokens - 1 AS end_tok FROM c WHERE n_tokens >= 1),
        |x AS (SELECT *, unnest(generate_series(start_tok // 2048, end_tok // 2048)) AS bin FROM s)
        |SELECT source, bin AS bin_id, doc_id,
        |  GREATEST(start_tok, bin * 2048) - bin * 2048 AS seg_start,
        |  LEAST(end_tok, bin * 2048 + 2047) - GREATEST(start_tok, bin * 2048) + 1 AS seg_len,
        |  (start_tok >= bin * 2048) AS starts_here,
        |  (end_tok <= bin * 2048 + 2047) AS ends_here
        |FROM x ORDER BY source, bin_id, seg_start""".stripMargin,

    "p08_source_datasheet" ->
      ("WITH " + TextAnalysis.qualityCtes + """,
        |base AS (SELECT source, COUNT(*) AS n_docs,
        |    CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |    COUNT(*) - COUNT(DISTINCT md5(text)) AS n_exact_dups
        |  FROM documents GROUP BY source),
        |tf8 AS (SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS term FROM documents),
        |c8 AS (SELECT source, term, COUNT(*) AS cf FROM tf8 GROUP BY 1, 2),
        |vs8 AS (SELECT source, CAST(SUM(cf) AS BIGINT) AS n_tokens, COUNT(*) AS n_types,
        |    CAST(COUNT(*) AS DOUBLE) / CAST(SUM(cf) AS BIGINT) AS type_token_ratio
        |  FROM c8 GROUP BY source),
        |d8 AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
        |m8 AS (SELECT doc_id,
        |  len(list_filter(t, x -> list_contains(['the','a','of'], x))) AS s_en,
        |  len(list_filter(t, x -> list_contains(['el','la','de'], x))) AS s_es,
        |  len(list_filter(t, x -> list_contains(['der','die','das'], x))) AS s_de,
        |  len(list_filter(t, x -> list_contains(['le','les','une'], x))) AS s_fr
        |FROM d8),
        |p8 AS (SELECT doc_id,
        |  CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
        |       WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
        |       WHEN s_de >= s_fr THEN 'de' ELSE 'fr' END AS pred_lang
        |FROM m8),
        |lm8 AS (SELECT source, pred_lang, COUNT(*) AS n
        |  FROM p8 JOIN documents USING (doc_id) GROUP BY 1, 2),
        |tl8 AS (SELECT source, pred_lang AS top_lang FROM (
        |    SELECT *, row_number() OVER (PARTITION BY source ORDER BY n DESC, pred_lang) AS rn
        |    FROM lm8) t WHERE rn = 1),
        |lq8 AS (SELECT source,
        |    CAST(COALESCE(SUM(CASE WHEN quality < 0.5 THEN 1 END), 0) AS BIGINT) AS n_low_quality
        |  FROM qq JOIN documents USING (doc_id) GROUP BY source)
        |SELECT source, n_docs, sum_chars, n_tokens, n_types, type_token_ratio,
        |  CAST(n_exact_dups AS BIGINT) AS n_exact_dups, top_lang, n_low_quality
        |FROM base JOIN vs8 USING (source) JOIN tl8 USING (source) JOIN lq8 USING (source)
        |ORDER BY source""".stripMargin),

    "p07_shuffle_order" ->
      """WITH d AS (SELECT doc_id,
        |    (doc_id * 1103515245 + 12345) % 2147483647 AS h
        |  FROM documents),
        |s AS (SELECT doc_id, h, h % 64 AS shard FROM d)
        |SELECT doc_id, h, shard,
        |  CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS BIGINT) AS pos
        |FROM s ORDER BY shard, pos""".stripMargin,

    "p06_mixture_resample" ->
      """WITH d AS (SELECT doc_id, source,
        |    CAST(50 + (length(source) * 37) % 200 AS BIGINT) AS w100,
        |    (doc_id * 2654435761) % 4294967296 AS h
        |  FROM documents),
        |r AS (SELECT doc_id, source, w100,
        |    w100 // 100 + CASE WHEN h % 100 < w100 % 100 THEN 1 ELSE 0 END AS n_reps
        |  FROM d),
        |e AS (SELECT doc_id, source, w100, CAST(n_reps AS BIGINT) AS n_reps,
        |    unnest(generate_series(1, CAST(n_reps AS BIGINT))) AS epoch
        |  FROM r WHERE n_reps >= 1)
        |SELECT doc_id, source, w100, n_reps, CAST(epoch AS BIGINT) AS epoch
        |FROM e ORDER BY doc_id, epoch""".stripMargin,

    "p05_packing_stats" ->
      """WITH d AS (SELECT doc_id, source,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |t AS (SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
        |      FROM d GROUP BY source)
        |SELECT source, total_tokens,
        |  (total_tokens + 2047) // 2048 AS n_bins,
        |  total_tokens // 2048 AS full_bins,
        |  total_tokens % 2048 AS tail_tokens,
        |  CAST(total_tokens AS DOUBLE) / (((total_tokens + 2047) // 2048) * 2048) AS fill_ratio
        |FROM t ORDER BY source""".stripMargin,

    "p04_shard_manifest" ->
      """WITH d AS (SELECT doc_id, n_chars,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        |    ((doc_id * 2654435761) % 4294967296) % 16 AS shard
        |  FROM documents)
        |SELECT shard, COUNT(*) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
        |FROM d GROUP BY shard ORDER BY shard""".stripMargin,

    "p03_token_budget" ->
      ("WITH " + TextAnalysis.qualityCtes + """,
        |c AS (SELECT qq.doc_id, source, CAST(mq.nt AS BIGINT) AS n_tokens, quality,
        |  CAST(SUM(mq.nt) OVER (PARTITION BY source ORDER BY quality DESC, qq.doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
        |FROM qq JOIN mq USING (doc_id) JOIN documents USING (doc_id))
        |SELECT doc_id, source, n_tokens, quality, cum_tokens
        |FROM c WHERE cum_tokens <= 500 ORDER BY doc_id""".stripMargin),

    // p02's packing with the budget column swapped for the generated
    // mini-BPE count (same merge table as t16's oracle)
    "p27_trained_pack" ->
      raw"""WITH ${Quality.BpeTrainW0},
         |${Quality.bpeTrainCtes(withTokensAfter = false)},
         |d AS (SELECT doc_id, source,
         |    CAST(length(regexp_replace(${Quality.bpeTrainedFoldSql("lower(text)")}, '\s+', '', 'g')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |c AS (SELECT doc_id, source, n_tokens,
         |    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
         |  FROM d)
         |SELECT doc_id, source, n_tokens,
         |  start_tok // 2048 AS bin_id,
         |  start_tok % 2048 AS bin_offset
         |FROM c ORDER BY doc_id""".stripMargin,

    // p28's oracle is p27's VERBATIM (round 16): training is
    // deterministic, so the frozen table == the retrained one on the
    // same corpus -- the hash gate pins the store round-trip
    "p28_frozen_pack" ->
      raw"""WITH ${Quality.BpeTrainW0},
         |${Quality.bpeTrainCtes(withTokensAfter = false)},
         |d AS (SELECT doc_id, source,
         |    CAST(length(regexp_replace(${Quality.bpeTrainedFoldSql("lower(text)")}, '\s+', '', 'g')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |c AS (SELECT doc_id, source, n_tokens,
         |    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
         |  FROM d)
         |SELECT doc_id, source, n_tokens,
         |  start_tok // 2048 AS bin_id,
         |  start_tok % 2048 AS bin_offset
         |FROM c ORDER BY doc_id""".stripMargin,

    // p29's oracle is the literal COMPOSITION of the already-gated
    // chains (round 17): the t27 pocket training over the CORPUS
    // slice (frozen == re-derived, the p28 precedent) + the
    // frozen-scores serving algebra + d19's exact screen +
    // d02_production's md5-prefix banding (the freezable near
    // screen) + the b-prefixed corpus-trained BPE chain + p02's
    // packing arithmetic over the survivors
    "p29_frozen_curation" -> {
      val corpusRel =
        "(SELECT doc_id, text FROM documents WHERE doc_id % 10 < 8) corp29"
      val bfold = Quality.bpeTrainedFoldSql("lower(text)", pfx = "b")
      raw"""WITH ${Quality.pocketTrainCtes(corpusRel)},
         |wp29 AS MATERIALIZED (SELECT f, w FROM rows27 CROSS JOIN p27 WHERE epoch = pe),
         |${Quality.bpeTrainW0Of(corpusRel, pfx = "b")},
         |${Quality.bpeTrainCtes(withTokensAfter = false, pfx = "b")},
         |sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS term
         |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i
         |        FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents) d0
         |        WHERE len(t) >= 3) d),
         |st AS (SELECT doc_id, ('0x' || substr(md5(term), 1, 15))::BIGINT % 2147483647 AS tid FROM sh),
         |${Dedup.sigCte},
         |${Dedup.candCte},
         |ad29 AS (SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS t, text
         |  FROM documents WHERE doc_id % 10 >= 8),
         |ant29 AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS nt FROM ad29),
         |atok29 AS (SELECT doc_id, unnest(t) AS term FROM ad29),
         |afeat29 AS (SELECT atok29.doc_id, tid % ${Quality.ClassifierDim} AS f, COUNT(*) AS cnt
         |  FROM atok29 JOIN v27 USING (term) GROUP BY 1, 2),
         |ax29 AS (SELECT afeat29.doc_id, f, (cnt * 1000000) // nt AS x
         |  FROM afeat29 JOIN ant29 ON ant29.doc_id = afeat29.doc_id),
         |as29 AS (SELECT ax29.doc_id, CAST(SUM(x * w) AS BIGINT) AS s
         |  FROM ax29 JOIN wp29 USING (f) GROUP BY 1),
         |gate29 AS (SELECT ant29.doc_id, CAST(COALESCE(s, 0) AS BIGINT) AS score
         |  FROM ant29 LEFT JOIN as29 USING (doc_id) WHERE COALESCE(s, 0) >= 0),
         |dh29 AS (SELECT doc_id, md5(text) AS h FROM documents),
         |corph29 AS (SELECT h FROM dh29 WHERE doc_id % 10 < 8 GROUP BY h),
         |ex29 AS (SELECT dh29.doc_id FROM dh29 JOIN corph29 USING (h) WHERE doc_id % 10 >= 8),
         |nearm29 AS (SELECT a.doc_id FROM bands a JOIN bands b
         |  ON a.band = b.band AND a.bandkey = b.bandkey
         |  AND a.doc_id % 10 >= 8 AND b.doc_id % 10 < 8 GROUP BY a.doc_id),
         |surv29 AS (SELECT ad29.doc_id, source, score,
         |    CAST(length(regexp_replace($bfold, '\s+', '', 'g')) AS BIGINT) AS n_tokens
         |  FROM ad29 JOIN gate29 USING (doc_id)
         |  WHERE ad29.doc_id NOT IN (SELECT doc_id FROM ex29)
         |    AND ad29.doc_id NOT IN (SELECT doc_id FROM nearm29)),
         |pk29 AS (SELECT doc_id, source, score, n_tokens,
         |    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
         |  FROM surv29)
         |SELECT doc_id, source, score, n_tokens,
         |  start_tok // 256 AS bin_id,
         |  start_tok % 256 AS bin_offset
         |FROM pk29 ORDER BY doc_id""".stripMargin
    },

    // p30's oracle is p29's composition run TWICE with the absorb
    // between, stated as set algebra (round 18): night 1 (the
    // % 10 = 8 half) screens against the corpus alone and its
    // survivors s1 are EXACTLY what the Spark path absorbs into the
    // Bloom hash part and the band bucket table; night 2 (the
    // % 10 = 9 half) therefore screens against corpus ∪ s1 on both
    // mergeable screens — the exact screen because absorb appends
    // the survivor hashes (no false negatives under the frozen
    // geometry, spec-pinned), the near screen because absorb merges
    // the survivor band buckets. The classifier gate and the
    // tokenizer fold stay corpus-trained on BOTH nights (their state
    // chains; admission never moves them — refreeze-only by design).
    "p30_nightly_absorb" -> {
      val corpusRel =
        "(SELECT doc_id, text FROM documents WHERE doc_id % 10 < 8) corp30"
      val bfold = Quality.bpeTrainedFoldSql("lower(text)", pfx = "b")
      raw"""WITH ${Quality.pocketTrainCtes(corpusRel)},
         |wp30 AS MATERIALIZED (SELECT f, w FROM rows27 CROSS JOIN p27 WHERE epoch = pe),
         |${Quality.bpeTrainW0Of(corpusRel, pfx = "b")},
         |${Quality.bpeTrainCtes(withTokensAfter = false, pfx = "b")},
         |sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS term
         |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i
         |        FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents) d0
         |        WHERE len(t) >= 3) d),
         |st AS (SELECT doc_id, ('0x' || substr(md5(term), 1, 15))::BIGINT % 2147483647 AS tid FROM sh),
         |${Dedup.sigCte},
         |${Dedup.candCte},
         |ad30 AS (SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS t, text
         |  FROM documents WHERE doc_id % 10 >= 8),
         |ant30 AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS nt FROM ad30),
         |atok30 AS (SELECT doc_id, unnest(t) AS term FROM ad30),
         |afeat30 AS (SELECT atok30.doc_id, tid % ${Quality.ClassifierDim} AS f, COUNT(*) AS cnt
         |  FROM atok30 JOIN v27 USING (term) GROUP BY 1, 2),
         |ax30 AS (SELECT afeat30.doc_id, f, (cnt * 1000000) // nt AS x
         |  FROM afeat30 JOIN ant30 ON ant30.doc_id = afeat30.doc_id),
         |as30 AS (SELECT ax30.doc_id, CAST(SUM(x * w) AS BIGINT) AS s
         |  FROM ax30 JOIN wp30 USING (f) GROUP BY 1),
         |gate30 AS (SELECT ant30.doc_id, CAST(COALESCE(s, 0) AS BIGINT) AS score
         |  FROM ant30 LEFT JOIN as30 USING (doc_id) WHERE COALESCE(s, 0) >= 0),
         |dh30 AS (SELECT doc_id, md5(text) AS h FROM documents),
         |ex1 AS (SELECT a.doc_id FROM dh30 a WHERE a.doc_id % 10 = 8 AND EXISTS (
         |  SELECT 1 FROM dh30 c WHERE c.h = a.h AND c.doc_id % 10 < 8)),
         |near1 AS (SELECT a.doc_id FROM bands a JOIN bands b
         |  ON a.band = b.band AND a.bandkey = b.bandkey
         |  AND a.doc_id % 10 = 8 AND b.doc_id % 10 < 8 GROUP BY a.doc_id),
         |sv1 AS (SELECT doc_id FROM gate30 WHERE doc_id % 10 = 8
         |  AND doc_id NOT IN (SELECT doc_id FROM ex1)
         |  AND doc_id NOT IN (SELECT doc_id FROM near1)),
         |ex2 AS (SELECT a.doc_id FROM dh30 a WHERE a.doc_id % 10 = 9 AND EXISTS (
         |  SELECT 1 FROM dh30 c WHERE c.h = a.h
         |    AND (c.doc_id % 10 < 8 OR c.doc_id IN (SELECT doc_id FROM sv1)))),
         |near2 AS (SELECT a.doc_id FROM bands a JOIN bands b
         |  ON a.band = b.band AND a.bandkey = b.bandkey
         |  AND a.doc_id % 10 = 9
         |  AND (b.doc_id % 10 < 8 OR b.doc_id IN (SELECT doc_id FROM sv1))
         |  GROUP BY a.doc_id),
         |surv30 AS (SELECT ad30.doc_id, source, score,
         |    CAST(length(regexp_replace($bfold, '\s+', '', 'g')) AS BIGINT) AS n_tokens
         |  FROM ad30 JOIN gate30 USING (doc_id)
         |  WHERE ad30.doc_id % 10 = 9
         |    AND ad30.doc_id NOT IN (SELECT doc_id FROM ex2)
         |    AND ad30.doc_id NOT IN (SELECT doc_id FROM near2)),
         |pk30 AS (SELECT doc_id, source, score, n_tokens,
         |    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
         |  FROM surv30)
         |SELECT doc_id, source, score, n_tokens,
         |  start_tok // 256 AS bin_id,
         |  start_tok % 256 AS bin_offset
         |FROM pk30 ORDER BY doc_id""".stripMargin
    },

    "p14_bpe_pack" ->
      raw"""WITH d AS (SELECT doc_id, source,
         |    CAST(length(regexp_replace(${Quality.bpeMergeSql("lower(text)")}, '\s+', '', 'g')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |c AS (SELECT doc_id, source, n_tokens,
         |    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
         |  FROM d)
         |SELECT doc_id, source, n_tokens,
         |  start_tok // 2048 AS bin_id,
         |  start_tok % 2048 AS bin_offset
         |FROM c ORDER BY doc_id""".stripMargin,

    "p02_sequence_pack" ->
      """WITH d AS (SELECT doc_id, source,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (SELECT doc_id, source, n_tokens,
        |    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
        |  FROM d)
        |SELECT doc_id, source, n_tokens,
        |  start_tok // 2048 AS bin_id,
        |  start_tok % 2048 AS bin_offset
        |FROM c ORDER BY doc_id""".stripMargin,

    "p09_curation_strict" ->
      ("WITH RECURSIVE " + Dedup.shCte + ",\n" + Dedup.sigCte + ",\n" +
        Dedup.candCte + ",\n" + Dedup.clusterCte + ",\n" +
        TextAnalysis.qualityCtes + """,
        |ds9 AS (SELECT doc_id,
        |  CASE WHEN ((doc_id * 2654435761) % 4294967296) % 10 = 0 THEN 'test'
        |       WHEN ((doc_id * 2654435761) % 4294967296) % 10 = 1 THEN 'val'
        |       ELSE 'train' END AS split
        |  FROM documents),
        |shs9 AS (SELECT sh.doc_id, term, split FROM sh JOIN ds9 USING (doc_id)),
        |tst9 AS (SELECT doc_id AS test_doc, term FROM shs9 WHERE split = 'test'),
        |trn9 AS (SELECT doc_id AS train_doc, term FROM shs9 WHERE split = 'train'),
        |sz9 AS (SELECT test_doc, COUNT(*) AS n_test FROM tst9 GROUP BY 1),
        |ov9 AS (SELECT test_doc, train_doc, COUNT(*) AS overlap
        |       FROM tst9 JOIN trn9 USING (term) GROUP BY 1, 2),
        |rm9 AS (SELECT DISTINCT train_doc AS doc_id FROM ov9 JOIN sz9 USING (test_doc)
        |        WHERE CAST(overlap AS DOUBLE) / n_test >= 0.5),
        |keep AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text))
        |SELECT d0.doc_id, d0.n_chars, qq.quality,
        |  CASE WHEN (d0.doc_id * 2654435761) % 4294967296 % 10 = 0 THEN 'test'
        |       WHEN (d0.doc_id * 2654435761) % 4294967296 % 10 = 1 THEN 'val'
        |       ELSE 'train' END AS split
        |FROM documents d0
        |JOIN qq USING (doc_id)
        |JOIN keep USING (doc_id)
        |LEFT JOIN lab ON lab.doc_id = d0.doc_id
        |WHERE qq.quality >= 0.5
        |  AND (lab.cluster_id IS NULL OR lab.cluster_id = d0.doc_id)
        |  AND d0.doc_id NOT IN (SELECT doc_id FROM rm9)
        |ORDER BY doc_id""".stripMargin),

    "p26_classifier_curation" ->
      ("WITH RECURSIVE " + Dedup.shCte + ",\n" + Dedup.sigCte + ",\n" +
        Dedup.candCte + ",\n" + Dedup.clusterCte + ",\n" +
        TextAnalysis.qualityCtes + s""",
        |ctok AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term FROM documents),
        |cvoc AS (SELECT term, row_number() OVER (ORDER BY term) AS tid FROM (SELECT DISTINCT term FROM ctok) x),
        |cfeat AS (SELECT doc_id, tid % ${Quality.ClassifierDim} AS f, COUNT(*) AS cnt
        |          FROM ctok JOIN cvoc USING (term) GROUP BY 1, 2),
        |ccls AS (SELECT doc_id,
        |           CAST(SUM(cnt * ((1103515245 * (f + 1) + 12345) % 197 - 98)) AS BIGINT) AS score,
        |           CAST(SUM(cnt) AS BIGINT) AS ntk
        |         FROM cfeat GROUP BY 1),
        |keep AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text))
        |SELECT d0.doc_id, d0.n_chars, qq.quality, ccls.score,
        |  CAST(ccls.score AS DOUBLE) / ccls.ntk AS margin,
        |  CASE WHEN (d0.doc_id * 2654435761) % 4294967296 % 10 = 0 THEN 'test'
        |       WHEN (d0.doc_id * 2654435761) % 4294967296 % 10 = 1 THEN 'val'
        |       ELSE 'train' END AS split
        |FROM documents d0
        |JOIN qq USING (doc_id)
        |JOIN keep USING (doc_id)
        |JOIN ccls ON ccls.doc_id = d0.doc_id
        |LEFT JOIN lab ON lab.doc_id = d0.doc_id
        |WHERE qq.quality >= 0.5
        |  AND (lab.cluster_id IS NULL OR lab.cluster_id = d0.doc_id)
        |  AND ccls.score >= 0
        |ORDER BY doc_id""".stripMargin),

    "p01_curation" ->
      ("WITH RECURSIVE " + Dedup.shCte + ",\n" + Dedup.sigCte + ",\n" +
        Dedup.candCte + ",\n" + Dedup.clusterCte + ",\n" +
        TextAnalysis.qualityCtes + """,
        |keep AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text))
        |SELECT d0.doc_id, d0.n_chars, qq.quality,
        |  CASE WHEN (d0.doc_id * 2654435761) % 4294967296 % 10 = 0 THEN 'test'
        |       WHEN (d0.doc_id * 2654435761) % 4294967296 % 10 = 1 THEN 'val'
        |       ELSE 'train' END AS split
        |FROM documents d0
        |JOIN qq USING (doc_id)
        |JOIN keep USING (doc_id)
        |LEFT JOIN lab ON lab.doc_id = d0.doc_id
        |WHERE qq.quality >= 0.5
        |  AND (lab.cluster_id IS NULL OR lab.cluster_id = d0.doc_id)
        |ORDER BY doc_id""".stripMargin))
}
