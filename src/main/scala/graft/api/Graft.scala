package graft.api

import graft.GraftSession
import graft.operators._
import graft.sources.{Maillog, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Typed records for the user-facing API. */
case class Doc(doc_id: Long, text: String, lang: String, source: String, n_chars: Long)
case class Embedding(vec_id: Long, embedding: Seq[Float], label: Int)
case class DupGroup(h: String, keep_doc_id: Long, n_copies: Long, n_chars: Long)
case class NearDupPair(doc_a: Long, doc_b: Long, est_jaccard: Double)
case class Neighbor(q_id: Long, rank: Int, cand_id: Long, cos: Double)
case class DupCluster(doc_id: Long, cluster_id: Long, cluster_size: Long)
case class RedactedDoc(doc_id: Long, n_emails: Long, n_ips: Long,
                       n_phones: Long, red_hash: String, n_red_chars: Long)
case class CuratedDoc(doc_id: Long, n_chars: Long, quality: Double, split: String)
case class SemCluster(vec_id: Long, cluster_id: Long, cluster_size: Long, is_keeper: Boolean)
case class PackedDoc(doc_id: Long, source: String, n_tokens: Long, bin_id: Long, bin_offset: Long)
case class ScdState(user_id: Long, version: Long, state: String,
                    valid_from: java.sql.Timestamp,
                    valid_to: Option[java.sql.Timestamp], is_current: Boolean)
case class NormDupGroup(norm_hash: String, keep_doc_id: Long, n_copies: Long)
case class PackSegment(source: String, bin_id: Long, doc_id: Long,
                       seg_start: Long, seg_len: Long,
                       starts_here: Boolean, ends_here: Boolean)

/** The front door for library users: typed `Dataset` views of the
  * tables plus the operator families, bound to a session + data dir.
  *
  * A maillog2db user migrates like this:
  *  - daemon: `graft.streaming.MaillogDaemon` (same flags);
  *  - batch replay of an existing log: `maillogTables("/logs/dir")`;
  *  - everything else (dedup/ANN/text/analytics) is gravy the Go
  *    daemon never had.
  */
class Graft(val spark: SparkSession, dir: String) {
  GraftSession.prepare(spark)
  import spark.implicits._

  def documents: Dataset[Doc] = Tables.documents(spark, dir).as[Doc]
  def embeddings: Dataset[Embedding] = Tables.embeddings(spark, dir).as[Embedding]
  def events: DataFrame = Tables.events(spark, dir)

  /** The reference's four tables from a real maillog file/dir.
    * `year` fills the year Postfix timestamps omit (defaults to the
    * wall clock, like the reference daemon).
    *
    * Batch replay uses the batch merge operators (one groupBy per
    * table) — the stateful streaming processors are the wrong tool
    * here: batch `transformWithState` drags in a per-task RocksDB
    * store and requires streaming-side RPC plumbing, where a plain
    * aggregation merges in one shuffle. Same merge semantics
    * (last-write-wins per field, deterministic (timestamp, raw line)
    * order); the messages schema reports per-branch counts
    * (n_qmgr/n_smtpd/n_cleanup) instead of the daemon's single
    * n_lines. */
  def maillogTables(logPath: String,
                    year: Int = 0): Map[String, DataFrame] = {
    // cached via OpCache (not a bare persist): the four returned
    // tables each materialize this same read+regex projection — on a
    // real multi-GB maillog the parse is the dominant cost and would
    // otherwise run four times — and the registry's LRU/release
    // discipline keeps a long-lived job server from pinning one
    // parsed corpus per call
    val parsed = OpCache.cached(
      Maillog.parsed(Maillog.readLines(spark, logPath), year))
    Map(
      "logs" -> parsed.distinct(),
      "clients" -> MaillogOps.clientsFrom(parsed),
      "messages" -> MaillogOps.messagesFrom(parsed),
      "deliveries" -> graft.streaming.MaillogDaemon.deliveryRows(parsed).distinct())
  }

  def exactDuplicates: Dataset[DupGroup] =
    Dedup.d01ExactDedup(spark, dir).as[DupGroup]

  def nearDuplicates: Dataset[NearDupPair] =
    Dedup.d02MinhashLsh(spark, dir).as[NearDupPair]

  def nearestNeighbors: Dataset[Neighbor] =
    Similarity.s01AnnBrute(spark, dir).as[Neighbor]

  def textQuality: DataFrame = TextAnalysis.t02Quality(spark, dir)

  /** Near-duplicate clusters (one canonical doc per cluster). */
  def dedupClusters: Dataset[DupCluster] =
    Dedup.d07DedupClusters(spark, dir).as[DupCluster]

  /** PII counts + redacted-text digests. */
  def piiRedacted: Dataset[RedactedDoc] =
    TextAnalysis.t06PiiRedact(spark, dir).as[RedactedDoc]

  /** The full curation pipeline: quality-gated, exact- and near-dup
    * canonicalized, split-assigned corpus. */
  def curated: Dataset[CuratedDoc] =
    Pipeline.p01Curation(spark, dir).as[CuratedDoc]

  /** Per-source best-first selection under a token budget. */
  def tokenBudget(budget: Long = 500L): DataFrame =
    Pipeline.p03TokenBudget(spark, dir, budget)

  /** Unigram corpus-frequency quality scores. */
  def unigramLmScores: DataFrame = Quality.t08UnigramLm(spark, dir)

  /** ANN index quality: recall@5 of LSH/IVF vs brute force. */
  def annRecall: DataFrame = Similarity.s05AnnRecall(spark, dir)

  /** Embedding outlier scores: cosine to own-label centroid. */
  def centroidCosines: DataFrame = Similarity.s06LabelCentroids(spark, dir)

  /** Incremental near-dup candidates over a (doc_id, text) STREAM —
    * see [[graft.streaming.NearDupStream]]. */
  def streamingNearDup(docStream: DataFrame,
                       stateTtlMs: Long = 0L): Dataset[graft.streaming.NearDupStream.CandPair] =
    graft.streaming.NearDupStream.candidates(docStream, stateTtlMs)

  /** Incremental exact dedup over a (doc_id, text) STREAM — emits
    * each content hash's first-seen (min doc_id) document. */
  def streamingExactDedup(docStream: DataFrame): Dataset[graft.streaming.NearDupStream.HashedDoc] =
    graft.streaming.NearDupStream.exactDedup(docStream)

  /** Output-shard assignment + per-shard manifest. */
  def shardManifest(shards: Int = 16): DataFrame =
    Pipeline.p04ShardManifest(spark, dir, shards)

  /** Verbatim duplicated-span coverage per document. */
  def dupSpans: DataFrame = Dedup.d10DupSpans(spark, dir)

  /** Per-source vocabulary health (token/type/hapax, TTR). */
  def vocabStats: DataFrame = Quality.t10VocabStats(spark, dir)

  /** Semantic (embedding-space) dedup clusters with one keeper per
    * cluster — the SemDeDup pass (d08). */
  def semanticDedup: Dataset[SemCluster] =
    Dedup.d08SemanticDedup(spark, dir).as[SemCluster]

  /** Documents packed head-to-tail into fixed context-length bins. */
  def sequencePack(contextLen: Long = 2048L): Dataset[PackedDoc] =
    Pipeline.p02SequencePack(spark, dir, contextLen).as[PackedDoc]

  /** Packing-efficiency report over [[sequencePack]]'s bins. */
  def packingStats(contextLen: Long = 2048L): DataFrame =
    Pipeline.p05PackingStats(spark, dir, contextLen)

  /** Weighted training mixture (hash-downsample / epoch-upsample). */
  def mixtureResample: DataFrame = Pipeline.p06MixtureResample(spark, dir)

  /** Gopher-style character-class quality profile. */
  def charProfile: DataFrame = Quality.t12CharProfile(spark, dir)

  /** Per-frame index of the (binary) media column. */
  def frameIndex: DataFrame = Multimodal.mm03FrameIndex(spark, dir)

  /** LSH calibration: estimated vs exact Jaccard per candidate pair. */
  def lshCalibration: DataFrame = Dedup.d11LshQuality(spark, dir)

  /** Train-side decontamination removal list (acts on d06's signal). */
  def decontaminationList: DataFrame = Dedup.d12Decontaminate(spark, dir)

  /** Reproducible shuffled-shard training read order. */
  def shuffleOrder: DataFrame = Pipeline.p07ShuffleOrder(spark, dir)

  /** Per-source dataset card (mass, vocab health, dups, language,
    * low-quality share). */
  def sourceDatasheet: DataFrame = Pipeline.p08SourceDatasheet(spark, dir)

  /** Curate → train split → hash shards → Hive dirs; returns the
    * read-back manifest. */
  def shipTrainingShards(outPath: String, shards: Int = 16): DataFrame =
    Pipeline.writeTrainingShards(spark, dir, outPath, shards)

  /** JSONL variant of the ship step (line-delimited interchange
    * format; same sharding + manifest contract). */
  def shipJsonlShards(outPath: String, shards: Int = 16): DataFrame =
    Pipeline.writeJsonlShards(spark, dir, outPath, shards)

  /** Cohort retention matrix (first-seen-day cohorts, offsets 0–14). */
  def retention: DataFrame = Analytics3.q29Retention(spark, dir)

  /** Zero-filled hourly (hour, type) series over the full span. */
  def gapFilledHourly: DataFrame = Analytics3.q30GapFill(spark, dir)

  /** Per-type median/MAD + robust outlier counts (exact integer
    * decision arithmetic). */
  def madOutliers: DataFrame = Analytics3.q31MadOutliers(spark, dir)

  /** Type-2 state history per user (batch reconstruction). */
  def scd2History: Dataset[ScdState] =
    Analytics3.q32Scd2(spark, dir).as[ScdState]

  /** Incremental SCD2 over a streaming event frame: emits each
    * interval as it closes (see `EventStream.scd2`). */
  def streamingScd2(eventStream: DataFrame): Dataset[graft.streaming.EventStream.ScdRow] =
    graft.streaming.EventStream.scd2(eventStream)

  /** ORDERED-source SCD2 (per-key ordered CDC input, pre-1970 safe;
    * see `EventStream.scd2Ordered` for the contract). */
  def streamingScd2Ordered(eventStream: DataFrame): Dataset[graft.streaming.EventStream.ScdRow] =
    graft.streaming.EventStream.scd2Ordered(eventStream)

  /** Normalization-based fuzzy-exact duplicate groups (case /
    * punctuation / whitespace variants collapse). */
  def normDuplicates: Dataset[NormDupGroup] =
    Dedup.d13NormDedup(spark, dir).as[NormDupGroup]

  /** Maximal verbatim token spans (≥ 12 tokens) shared between
    * document pairs — the variable-length exact-substring dedup
    * signal (d14). */
  def sharedSpans: DataFrame = Dedup.d14DupSpanPairs(spark, dir)

  /** Semantic dedup on the PRODUCTION centroid rule (fixed k —
    * constant-size broadcast, linear assignment; see d08_production). */
  def semanticDedupProduction: Dataset[SemCluster] =
    Dedup.d08Production(spark, dir).as[SemCluster]

  /** Per-document keep/drop verdicts for a NEW ingest batch screened
    * against the frozen corpus — exact-hash and MinHash-band matches
    * with evidence rows (d15). */
  def incrementalDedup: DataFrame = Dedup.d15IncrementalDedup(spark, dir)

  /** Bloom-filter pre-screen of a new ingest batch against the
    * frozen corpus's content hashes — d15's exact screen at 1.25
    * bytes per corpus doc of broadcastable filter state, with the
    * outcome taxonomy (screened / dup / false_positive) doubling as
    * the filter-calibration report (d19). */
  def bloomScreen: DataFrame = Dedup.d19BloomScreen(spark, dir)

  /** FP-rate-vs-filter-size calibration curve for the bloom screen
    * (qa05) — the memory/selectivity trade a deployment tunes. */
  def bloomCurve: DataFrame = Dedup.qa05BloomCurve(spark, dir)

  /** Leakage-safe train/val/test assignment keyed on the near-dup
    * CLUSTER id — near-duplicates can never straddle splits, with
    * the would-have-straddled audit flag per document (p15). */
  def clusterSplit: DataFrame = Pipeline.p15ClusterSplit(spark, dir)

  /** Per-(source, split) share drift of the cluster-keyed split vs
    * the naive rule — the balance audit gating p15 (p16). */
  def splitBalance: DataFrame = Pipeline.p16SplitBalance(spark, dir)

  /** Two Lloyd rounds refining the bounded-k coarse quantizer, with
    * per-cell occupancy + member-fit before/after — the train-the-
    * quantizer step run at corpus freeze (s18). */
  def kmeansRefine: DataFrame = Similarity.s18KmeansRefine(spark, dir)

  /** Per-query recall@5 of seed-vs-refined quantizer IVF search at
    * equal probes — the retrieval-metric check on whether s18's
    * training paid (s19). */
  def refinedRecall: DataFrame = Similarity.s19RefinedRecall(spark, dir)

  /** Cross-source 3-gram Jaccard overlap matrix — the provenance
    * diagnostic run before mixing corpora (d16). */
  def sourceOverlap: DataFrame = Dedup.d16SourceOverlap(spark, dir)

  /** CCNet-style head/middle/tail LM-quality tiers per language
    * (t15). */
  def lmBuckets: DataFrame = Quality.t15LmBuckets(spark, dir)

  /** α=0.5 temperature-scaled per-source sampling rates and realized
    * keeps, all-integer arithmetic (p12). */
  def temperatureMix: DataFrame = Pipeline.p12TemperatureMix(spark, dir)

  /** Packed-bin → data-parallel-rank assignment with per-rank load
    * report (p13). */
  def rankBalance(world: Int = 64, contextLen: Long = 2048L): DataFrame =
    Pipeline.p13RankBalance(spark, dir, world, contextLen)

  /** Metadata-filtered ANN: per-query top-5 among same-label
    * candidates (s09). */
  def filteredAnn: DataFrame = Similarity.s09FilteredAnn(spark, dir)

  /** Filtered IVF: the label pre-filter composed with the bounded-k
    * cells — the production filtered-search shape (s10). */
  def filteredIvf: DataFrame = Similarity.s10FilteredIvf(spark, dir)

  /** RFC 3463 DSN-class delivery taxonomy per relay (m13). */
  def dsnTaxonomy: DataFrame = MaillogOps.m13DsnTaxonomy(spark, dir)

  /** Bounded fuzzy nearest neighbor on the production candidate
    * policy — content-band sub-blocking + occurrence screen, the
    * any-scale form of the Levenshtein near-dup search (d09_production). */
  def fuzzyNearDupsProduction: DataFrame = Dedup.d09Production(spark, dir)

  /** Maximal verbatim spans a NEW ingest batch shares with the
    * frozen corpus — d14's measurement in d15's increment-vs-corpus
    * shape (d17). */
  def incrementalSpans: DataFrame = Dedup.d17IncrementalSpans(spark, dir)

  /** Filtered HIERARCHICAL IVF: the label filter composed with the
    * two-level routing, fine probes at 4 (s11). */
  def filteredIvf2: DataFrame = Similarity.s11FilteredIvf2(spark, dir)

  /** Recall@5 vs brute truth per (probe_coarse, probe_fine) setting
    * of the hierarchical index — the probe-tuning curve (s12). */
  def probeRecallSweep: DataFrame = Similarity.s12ProbeRecall(spark, dir)

  /** Deterministic mini-BPE tokenizer-token counts next to the
    * whitespace-word count (t16). */
  def bpeTokenStats: DataFrame = Quality.t16BpeTokens(spark, dir)

  /** Stateless streaming quality gate over a (doc_id, text) stream —
    * t14's shared rule set as per-row array algebra, no state or
    * watermark ([[graft.streaming.QualityStream]]). */
  def streamingQualityGate(docStream: DataFrame): DataFrame =
    graft.streaming.QualityStream.qualityVerdicts(docStream)

  /** Frozen bloom-filter state for the streaming screen: (words,
    * corpus-hash, mbits) built once at corpus freeze
    * ([[graft.streaming.BloomStream]]). */
  def bloomFrozenFilter(bitsPerElem: Long = 10L)
      : (DataFrame, DataFrame, Long) =
    graft.streaming.BloomStream.frozenFilter(
      documents.toDF().select("doc_id", "text"), bitsPerElem)

  /** Per-item scene segmentation over the frame index — scene/
    * static-frame counts and longest run (mm06). */
  def sceneIndex: DataFrame = Multimodal.mm06SceneIndex(spark, dir)

  /** Count-Min sketch accuracy report: exact top-20 token counts vs
    * the 4×1024 relational sketch's estimates (qa06). */
  def cmsAccuracy: DataFrame = Quality.qa06CmsAccuracy(spark, dir)

  /** Running Count-Min counters over a (text) document stream —
    * Complete-mode agg, state bounded at the sketch geometry
    * ([[graft.streaming.QualityStream.cmsCounters]]). */
  def streamingCmsCounters(docStream: DataFrame): DataFrame =
    graft.streaming.QualityStream.cmsCounters(docStream)

  /** Asymmetric containment near-dups — short-inside-long pairs
    * symmetric Jaccard misses, with the jaccard_blind flag (d20). */
  def containmentPairs: DataFrame = Dedup.d20Containment(spark, dir)

  /** HyperLogLog distinct-count report: exact distinct vs the
    * 64-register relational sketch (with oracle-visible per-source
    * max-merge) (qa07). */
  def hllDistinct: DataFrame = Quality.qa07HllDistinct(spark, dir)

  /** Running HyperLogLog registers over a (text) document stream —
    * Complete-mode agg, state bounded at m = 64 rows
    * ([[graft.streaming.QualityStream.hllRegisters]]). */
  def streamingHllRegisters(docStream: DataFrame): DataFrame =
    graft.streaming.QualityStream.hllRegisters(docStream)

  /** Scene-aware frame-sample manifest: the first frame of every
    * scene with fetch coordinates and saved-frame counts (mm07). */
  def sceneSample: DataFrame = Multimodal.mm07SceneSample(spark, dir)

  /** Silence segmentation over windowed audio energy — utterance
    * count, longest gap, speech ratio per clip (mm08). */
  def silenceSegments: DataFrame = Multimodal.mm08SilenceSegments(spark, dir)

  /** Multi-epoch token schedule for a 3×-corpus budget under
    * sqrt-damped source weights (p17). */
  def epochPlan(budgetMult: Long = 3L): DataFrame =
    Pipeline.p17EpochPlan(spark, dir, budgetMult)

  /** Daily user-growth curve — actives, first-timers, users-to-date
    * (q36). */
  def userGrowth: DataFrame = Analytics3.q36UserGrowth(spark, dir)

  /** Per-user EWMA spike report — smoothed baseline + overshoot
    * flag, exact binary-fraction weights (q35). */
  def ewmaSpikes: DataFrame = Analytics3.q35EwmaSpikes(spark, dir)

  /** Streaming EWMA spikes over an event stream — watermark-buffered,
    * O(1) per-user ring state; replay == batch q35 bit-for-bit
    * ([[graft.streaming.EventStream.ewmaSpikes]]). */
  def streamingEwmaSpikes(eventStream: DataFrame):
      Dataset[graft.streaming.EventStream.EwmaRow] =
    graft.streaming.EventStream.ewmaSpikes(eventStream)

  /** Epoch-rotated per-rank shard read plan over the p04 manifest
    * (p18). */
  def readPlan(epochs: Long = 3L, world: Long = 8L): DataFrame =
    Pipeline.p18ReadPlan(spark, dir, epochs, world)

  /** Per-document token-diversity Gini profile (t17). */
  def tokenGini: DataFrame = Quality.t17TokenGini(spark, dir)

  /** CMS width calibration curve — overestimate vs counter width
    * {16, 64, 1024}, the d×w sizing table (qa11). */
  def cmsWidthCurve: DataFrame = Quality.qa11CmsWidthCurve(spark, dir)

  /** Per-group HLL distinct estimates vs exact (qa10). */
  def hllBySource: DataFrame = Quality.qa10HllBySource(spark, dir)

  /** Bottom-k (KMV) distinct sample + cardinality cross-check —
    * uniform, deterministic, mergeable over distinct items (qa09). */
  def bottomkSample: DataFrame = Quality.qa09BottomkSample(spark, dir)

  /** Histogram-quantile sketch accuracy report: 256-bin per-type
    * histogram estimates vs exact percentiles (qa08). */
  def histogramQuantiles: DataFrame = Analytics3.qa08HistogramQuantiles(spark, dir)

  /** Running histogram counters over an event stream against a
    * frozen per-type geometry — Complete-mode, state ≤ |types|×256
    * ([[graft.streaming.EventStream.histogramCounters]]). */
  def streamingHistogram(evStream: DataFrame, geometry: DataFrame): DataFrame =
    graft.streaming.EventStream.histogramCounters(evStream, geometry)

  /** Per-row streaming token-diversity profile — stateless twin of
    * t17 ([[graft.streaming.QualityStream.giniProfile]]). */
  def streamingGiniProfile(docStream: DataFrame): DataFrame =
    graft.streaming.QualityStream.giniProfile(docStream)

  /** Stateless streaming bloom screen over a (doc_id, text) stream —
    * d19's shared probe/verdict algebra against the frozen filter,
    * no state or watermark ([[graft.streaming.BloomStream]]). */
  def streamingBloomScreen(docStream: DataFrame, words: DataFrame,
      corpHash: DataFrame, mbits: Long): DataFrame =
    graft.streaming.BloomStream.verdicts(docStream, words, corpHash, mbits)

  /** Composed IVFPQ: hierarchical coarse→fine routing + product-
    * quantization ADC inside the probed cells, exact rerank of the
    * top-20 — the M-bytes-per-vector searched-index shape (s13). */
  def ivfpq: DataFrame = Similarity.s13AnnIvfPq(spark, dir)

  /** Tenant-scoped IVFPQ: s13's memory shape with the label filter
    * tightening only the candidate join key — the index (cells,
    * codes) stays label-agnostic and shared across tenants (s15). */
  def filteredIvfpq: DataFrame = Similarity.s15FilteredIvfPq(spark, dir)

  /** Recall@5 of the full IVFPQ pipeline vs brute-force truth per
    * fine-probe depth — the ADC-loss-vs-probe-depth tuning curve
    * (s16). */
  def ivfpqRecallSweep: DataFrame = Similarity.s16IvfpqRecall(spark, dir)

  /** Recall of the label-FILTERED IVFPQ pipeline vs exact-filtered
    * truth per fine-probe depth — the tenant-scoped tuning curve,
    * completing the {routing, IVFPQ} × {unfiltered, filtered}
    * matrix (s17). */
  def filteredIvfpqRecallSweep: DataFrame =
    Similarity.s17FilteredIvfpqRecall(spark, dir)

  /** Recall@5 of the FILTERED hierarchical IVF vs the exact-filtered
    * truth per fine-probe depth — the nprobe-under-filter tuning
    * curve (s14). */
  def filteredRecallSweep: DataFrame = Similarity.s14FilteredRecall(spark, dir)

  /** Sequence packing on tokenizer-faithful mini-BPE budgets instead
    * of whitespace words (p14). */
  def bpePack(contextLen: Long = 2048L): Dataset[PackedDoc] =
    Pipeline.p14BpePack(spark, dir, contextLen).as[PackedDoc]

  /** Frozen-corpus seed index for the span screen — build once per
    * corpus freeze; feeds batch d17 and [[streamingSpans]]. */
  def corpusSeedIndex: DataFrame =
    Dedup.corpusSeedIndex(documents.toDF().select("doc_id", "text"))

  /** Streaming twin of [[incrementalSpans]]: maximal verbatim spans
    * each ARRIVING doc shares with the frozen corpus index
    * ([[graft.streaming.SpanStream]]; replay == batch, spec-pinned). */
  def streamingSpans(docStream: DataFrame, corpusIdx: DataFrame):
      Dataset[graft.streaming.SpanStream.Span] =
    graft.streaming.SpanStream.spans(docStream, corpusIdx)

  /** Incremental SEMANTIC dedup: each new-batch vector screened
    * against the frozen corpus through the corpus's own IVF cells —
    * verdict + nearest corpus neighbor (d18; completes the
    * incremental family: hash/band d15, spans d17, embeddings
    * here). */
  def incrementalSemanticDedup: DataFrame =
    Dedup.d18IncrementalSemdedup(spark, dir)

  /** Per-frozen-cell staleness report for the incremental screens —
    * increment-vs-corpus occupancy skew and mean-fit drift, the
    * metrics a deployment schedules an index re-freeze on (qa04). */
  def indexStaleness: DataFrame = Dedup.qa04IndexStaleness(spark, dir)

  /** Streaming twin of the staleness monitor's increment side:
    * running per-cell occupancy + fit counters over an arriving
    * (vec_id, embedding) stream — Complete-mode output, state
    * bounded at ≤ k cells by construction; join against the static
    * corpus baselines for the continuous drift dashboard. */
  def streamingStaleness(vecStream: DataFrame,
      cents: Seq[graft.streaming.SemStream.Centroid]): DataFrame =
    graft.streaming.SemStream.stalenessCounters(vecStream, cents)

  /** Frozen semantic index for the embedding screen — the collected
    * bounded-k coarse quantizer plus the cell-assigned corpus, built
    * ONCE per corpus freeze (the embedding-modality analog of
    * [[corpusSeedIndex]]). Hand both to [[streamingSemanticDedup]];
    * the centroid Seq is ≤ k rows by construction (safe to collect
    * and ship as literals — the FAISS distribute-the-quantizer
    * pattern). */
  def semanticFrozenIndex:
      (Seq[graft.streaming.SemStream.Centroid], DataFrame) = {
    val (cents, corpusIdx) = Dedup.semFrozenIndex(
      embeddings.toDF().select("vec_id", "embedding"))
    (graft.streaming.SemStream.frozenCentroids(cents), corpusIdx)
  }

  /** Streaming twin of [[incrementalSemanticDedup]]: arriving
    * (vec_id, embedding) rows screened against the frozen semantic
    * index — build `(cents, corpusIdx)` once at corpus freeze via
    * [[semanticFrozenIndex]]; replay == batch, spec-pinned. */
  def streamingSemanticDedup(vecStream: DataFrame, corpusIdx: DataFrame,
      cents: Seq[graft.streaming.SemStream.Centroid]):
      Dataset[graft.streaming.SemStream.SemVerdict] =
    graft.streaming.SemStream.verdicts(vecStream, corpusIdx, cents)

  /** Real pure-JDK image decode over a binary media column — the
    * production decoder of the decodeBatch seam ([[Multimodal]]). */
  def decodeImages(media: DataFrame, idCol: String = "doc_id",
                   binCol: String = "media"): DataFrame =
    Multimodal.decodeBatch(media, idCol, binCol, Multimodal.imageDecode)

  /** Release this session's operator-scoped caches (job-server
    * hygiene; see [[graft.operators.OpCache]]). Results stay correct
    * afterwards — dropped entries degrade to recompute. */
  def releaseCaches(): Unit = graft.operators.OpCache.release(spark)

  /** Bin-local document spans of the packed corpus (attention-mask
    * input; docs spanning bins appear once per touched bin). */
  def packBoundaries(contextLen: Long = 2048L): Dataset[PackSegment] =
    Pipeline.p10PackBoundaries(spark, dir, contextLen).as[PackSegment]

  /** Per-queue delivery lifecycle (attempts, deferrals, retry span,
    * final status). */
  def queueAging: DataFrame = MaillogOps.m12QueueAging(spark, dir)

  /** Skew-salted fact⋈dim revenue rollup (q37). */
  def saltedRevenue: DataFrame = Skew.q37SaltedJoin(spark, dir)

  /** BM25 ranked retrieval over the documents corpus (t18). */
  def bm25Search: DataFrame = TextAnalysis.t18Bm25(spark, dir)

  /** TextRank keyword extraction (t19). */
  def textrankKeywords: DataFrame = TextAnalysis.t19Textrank(spark, dir)

  /** Market-basket association rules over event-type baskets (q38). */
  def associationRules: DataFrame = Analytics3.q38AssocRules(spark, dir)

  /** First-order event-type transition matrix (q39). */
  def transitionMatrix: DataFrame = Analytics3.q39Transitions(spark, dir)

  /** One-pass column profile of the lineitem table (q41). */
  def columnProfile: DataFrame = Analytics3.q41Profile(spark, dir)

  /** Seasonal day-of-week anomaly screen over events (q42). */
  def seasonalAnomalies: DataFrame = Analytics3.q42Seasonal(spark, dir)

  /** Per-brand triangle participation in the co-purchase graph (g01). */
  def copurchaseTriangles: DataFrame = Graph.g01Triangles(spark, dir)

  /** Related parts by co-purchase Jaccard (g02). */
  def relatedParts: DataFrame = Graph.g02CopurchaseJaccard(spark, dir)

  /** Weighted PageRank over the co-purchase graph (g03). */
  def partPagerank: DataFrame = Graph.g03Pagerank(spark, dir)

  /** Incremental triangle accounting for arriving orders (g04). */
  def incrementalTriangles: DataFrame = Graph.g04IncrementalTriangles(spark, dir)

  /** Streaming corpus-closing triangle screen (twin of g04's
    * 1-new-edge category) over an edge stream. */
  def streamingTriangles(edgeStream: DataFrame, corpusEdges: DataFrame): DataFrame =
    graft.streaming.TriStream.closedTriangles(edgeStream, corpusEdges)

  /** The frozen co-purchase edge index the triangle stream probes. */
  def corpusEdgeIndex: DataFrame = Graph.corpusEdgeIndex(spark, dir)

  /** Banded degree-drift monitor for the graph corpus — the
    * WHEN-to-refreeze signal for the edge index (g05). */
  def graphDegreeDrift: DataFrame = Graph.g05DegreeDrift(spark, dir)

  /** Freeze a canonical (x < y) edge frame as a versioned named
    * index; probe arriving edges against it without rebuilding the
    * corpus pair fan-out; absorb them with O(batch) appends. */
  def freezeGraphIndex(edges: DataFrame, name: String, buckets: Int = 8,
                       retain: Int = 1): Long =
    graft.sources.GraphIndexStore.freeze(edges, name, buckets, retain)

  /** Triangles arriving edges close against a frozen edge index
    * (the g04 1-new-edge / TriStream probe algebra, served off the
    * shipped bucketed table). */
  def probeFrozenGraph(probe: DataFrame, name: String): DataFrame =
    graft.sources.GraphIndexStore.closedFrozen(spark, probe, name)

  def appendGraphIndex(newEdges: DataFrame, name: String): Unit =
    graft.sources.GraphIndexStore.append(newEdges, name)

  /** g05's banded drift over the PERSISTED corpus edges. */
  def graphStaleness(arrivals: DataFrame, name: String): DataFrame =
    graft.sources.GraphIndexStore.staleness(spark, arrivals, name)

  /** The automated drift→refreeze loop for the frozen edge index:
    * trips integer-exactly on the arrivals' unseen-endpoint share. */
  def refreezeGraphIfStale(arrivals: DataFrame, name: String,
      maxUnseenShare: Double = 0.2, buckets: Int = 8,
      retain: Int = 1): Option[Long] =
    graft.sources.GraphIndexStore.refreezeIfStale(spark, arrivals, name,
      maxUnseenShare, buckets, retain)

  /** Freeze the community view of raw weighted co-purchase pairs:
    * pairs persist unscreened, the g08 contraction's labels persist
    * beside them (round 15 — the g08/g09 lifecycle's persistence
    * step). */
  def freezeCommunities(pairs: DataFrame, name: String): Long =
    graft.sources.GraphIndexStore.freezeCommunities(pairs, name)

  /** g09's bridge monitor served off the shipped community labels. */
  def communityBridgesFrozen(arrivals: DataFrame, name: String): DataFrame =
    graft.sources.GraphIndexStore.communityBridges(spark, arrivals, name)

  /** The automated drift→refreeze loop for the community view:
    * re-contract over the weight-merged pair multiset when the
    * arrivals' non-intra share trips. */
  def refreezeCommunitiesIfStale(arrivals: DataFrame, name: String,
      maxOutsideShare: Double = 0.5): Option[Long] =
    graft.sources.GraphIndexStore.refreezeCommunitiesIfStale(spark,
      arrivals, name, maxOutsideShare)

  /** Streaming twin of the community-bridge monitor: per micro-batch
    * bands against the live frozen labels. */
  def streamingCommunityBridges(pairStream: DataFrame, name: String,
      outDir: String, checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    graft.streaming.GraphStream.bridgesStream(pairStream, name, outDir,
      checkpoint)

  /** Compact the edge index's live generation (lease-held crash-safe
    * rewrite — see [[graft.sources.GraphIndexStore.compact]]). */
  def compactGraphIndex(name: String, vacuumOrphans: Boolean = false): Unit =
    graft.sources.GraphIndexStore.compact(spark, name, vacuumOrphans)

  /** Streaming probe against a frozen edge index (per-micro-batch
    * pointer binding; idempotent per-batch-id sink). */
  def streamingGraphProbe(edgeStream: DataFrame, name: String,
      outDir: String, checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    graft.streaming.GraphStream.probeStream(edgeStream, name, outDir, checkpoint)

  /** Streaming g05 drift monitor against a frozen edge index. */
  def streamingGraphDrift(edgeStream: DataFrame, name: String,
      outDir: String, checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    graft.streaming.GraphStream.driftStream(edgeStream, name, outDir, checkpoint)

  /** Reciprocal-rank fusion of the BM25 and TF-IDF document rankings
    * (t21) — the hybrid-retrieval serving shape. */
  def rrfFusion: DataFrame = TextAnalysis.t21RrfFusion(spark, dir)

  /** Incremental PageRank on the frozen co-purchase graph (g07):
    * freeze→append→re-derive with the rank drift vs the frozen
    * corpus. */
  def incrementalPagerank: DataFrame =
    graft.operators.Graph.g07IncrementalPagerank(spark, dir)

  /** Communities of the weight-≥2 co-purchase graph (g08): connected
    * components by alternating star contraction, with per-community
    * size / edge mass / dominant-brand outputs. */
  def communities: DataFrame = graft.operators.Graph.g08Communities(spark, dir)

  /** In-engine BPE merge-table induction (t28): the learned ranked
    * table and its training curve, all exact integers. */
  def trainBpe: DataFrame = Quality.t28TrainBpe(spark, dir)

  /** Token counts under the t28-trained merge table beside the fixed
    * t16 table (t29) — the trained tokenizer applied as a budget. */
  def trainedTokens: DataFrame = Quality.t29TrainedTokens(spark, dir)

  /** Hybrid dense+sparse retrieval: BM25 document ranks fused with
    * exact-cosine dense ranks by reciprocal-rank fusion (t22). */
  def hybridFusion: DataFrame = TextAnalysis.t22HybridFusion(spark, dir)

  /** The FROZEN hybrid serving path (t22's production shape): both
    * shipped indexes searched and fused — ships on first call, pass
    * ship=false to serve off an existing freeze. */
  def hybridFrozenFusion(textName: String = "t22_text",
      annName: String = "t22_ann", ship: Boolean = true): DataFrame =
    TextAnalysis.hybridFrozen(spark, dir, textName, annName, ship)

  /** Tenant-filtered hybrid fusion (t25): label-scoped dense + BM25
    * candidates fused by RRF — the s15 key-tightening rule applied
    * to the hybrid path. */
  def filteredHybridFusion: DataFrame = TextAnalysis.t25FilteredHybrid(spark, dir)

  /** Model-based quality classifier over hashed token features (t23)
    * — score, margin, keep/drop verdict and top contributing
    * features per document. */
  def qualityClassifier: DataFrame = Quality.t23QualityClassifier(spark, dir)

  /** Classifier-gated curation (p26): p01's rule pipeline with the
    * t23 learned gate as the final keep/drop authority. */
  def classifierCuration: DataFrame = Pipeline.p26ClassifierCuration(spark, dir)

  /** Classifier threshold-sweep calibration (t24): keep mass and
    * rule-gate agreement per candidate margin threshold. */
  def gateCalibration: DataFrame = Quality.t24GateCalibration(spark, dir)

  /** In-engine classifier training (t27): pocket batch perceptron
    * over the hashed-feature space — the training curve and the
    * pocket-flagged weight artifact, all exact integers. */
  def trainClassifier: DataFrame = Quality.t27TrainClassifier(spark, dir)

  /** Classifier score-drift monitor (t26): unseen-token share and
    * mean-margin drift of derived arrival regimes vs the corpus —
    * the WHEN-to-recalibrate signal for the frozen gate. */
  def scoreDrift: DataFrame = Quality.t26ScoreDrift(spark, dir)

  /** Train on the given corpus and FREEZE the pocket classifier
    * artifact (vocabulary + weights + drift baseline) as a new
    * generation of the named family (round 15 — the t27→serve loop's
    * persistence step). */
  def freezeClassifier(docs: DataFrame, name: String): Long =
    graft.sources.ClassifierStore.freeze(docs, name)

  /** Score (doc_id, text) rows against the live frozen classifier
    * artifact — the serving read path. */
  def scoreClassifierFrozen(docs: DataFrame, name: String): DataFrame =
    graft.sources.ClassifierStore.scoreFrozen(spark, docs, name)

  /** Threshold-sweep calibration of the live frozen artifact (the
    * t24 role on the frozen path). */
  def calibrateClassifierFrozen(docs: DataFrame, name: String): DataFrame =
    graft.sources.ClassifierStore.calibrateFrozen(spark, docs, name)

  /** The automated drift→refreeze loop for the learned gate: grade
    * arrivals against the frozen artifact (unseen-token share +
    * score drift vs the stored corpus baseline), RETRAIN on corpus ∪
    * arrivals and flip the pointer when the vocabulary went stale.
    * Returns the new generation when it fired (RefreezeLoopSpec). */
  def refreezeClassifierIfStale(corpus: DataFrame, arrivals: DataFrame,
      name: String, maxUnseenShare: Double = 0.2): Option[Long] =
    graft.sources.ClassifierStore.refreezeIfStale(spark, corpus, arrivals,
      name, maxUnseenShare)

  /** Train the BPE merge table on the given corpus and FREEZE it as
    * a new generation of the named tokenizer family (round 16 — the
    * t28→serve loop's persistence step; t29/p27's per-call retrain
    * becomes train-once-serve-many). */
  def freezeTokenizer(docs: DataFrame, name: String,
      rounds: Int = graft.operators.Quality.BpeTrainRounds): Long =
    graft.sources.TokenizerStore.freeze(docs, name, rounds)

  /** Tokenize (doc_id, text) rows under the live frozen merge table —
    * the serving read path (per-row fold, arrival-scaled). */
  def tokenizeFrozen(docs: DataFrame, name: String): DataFrame =
    graft.sources.TokenizerStore.tokenCountsFrozen(spark, docs, name)

  /** Compression-ratio drift of an arriving batch vs the frozen
    * tokenizer's stored training baseline — the WHEN-to-retrain
    * signal for the merge table. */
  def tokenizerStaleness(arrivals: DataFrame, name: String): DataFrame =
    graft.sources.TokenizerStore.staleness(spark, arrivals, name)

  /** The automated drift→refreeze loop for the tokenizer: retrain on
    * corpus ∪ arrivals and flip the pointer when the arrivals stop
    * compressing under the frozen rules. Returns the new generation
    * when it fired (RefreezeLoopSpec). */
  def refreezeTokenizerIfStale(corpus: DataFrame, arrivals: DataFrame,
      name: String, maxRatioDrift: Double = 0.10): Option[Long] =
    graft.sources.TokenizerStore.refreezeIfStale(spark, corpus, arrivals,
      name, maxRatioDrift)

  /** Tokenizer merge-count calibration curve (t30): compression vs
    * table size from one training run. */
  def mergeCalibration: DataFrame = Quality.t30MergeCalibration(spark, dir)

  /** Streaming hybrid search: arriving (terms + vector) queries
    * search both shipped indexes per micro-batch and fuse by RRF. */
  def streamingHybridSearch(queries: DataFrame, corpus: DataFrame,
      textName: String, annName: String, outDir: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    graft.streaming.HybridStream.searchStream(queries, corpus,
      textName, annName, outDir, checkpoint)

  /** Streaming twin of the t23 classifier: score arriving documents
    * against a frozen vocabulary artifact, per-micro-batch. */
  def streamingClassifier(docStream: DataFrame, vocab: DataFrame,
      outDir: String, checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    graft.streaming.QualityStream.classifierStream(docStream, vocab,
      outDir, checkpoint)

  /** Streaming serving of the TRAINED frozen classifier artifact:
    * each micro-batch scores through the store's serving read, with
    * the pointer re-bound per batch (a mid-stream refreeze lands
    * between batches). */
  def streamingClassifierFrozen(docStream: DataFrame, name: String,
      outDir: String, checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    graft.streaming.QualityStream.frozenClassifierStream(docStream, name,
      outDir, checkpoint)

  /** Streaming serving of the TRAINED frozen tokenizer artifact:
    * each micro-batch tokenizes through the store's serving read,
    * pointer re-bound per batch. */
  def streamingTokenizerFrozen(docStream: DataFrame, name: String,
      outDir: String, checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    graft.streaming.QualityStream.frozenTokenizerStream(docStream, name,
      outDir, checkpoint)

  /** CONTINUOUS drift monitor for the frozen classifier (round 17):
    * one staleness row per arriving micro-batch, graded against the
    * live generation's stored baseline. */
  def streamingClassifierDrift(docStream: DataFrame, name: String,
      outDir: String, checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    graft.streaming.QualityStream.classifierDriftStream(docStream, name,
      outDir, checkpoint)

  /** CONTINUOUS drift monitor for the frozen tokenizer (round 17):
    * one compression-drift row per arriving micro-batch. */
  def streamingTokenizerDrift(docStream: DataFrame, name: String,
      outDir: String, checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    graft.streaming.QualityStream.tokenizerDriftStream(docStream, name,
      outDir, checkpoint)

  /** Ship the corpus slice's MinHash band buckets on the production
    * md5-prefix id path (round 17) — the freezable near-dup screen
    * p29's nightly probes. */
  def shipNearDupBands(name: String): Unit =
    Dedup.shipNearDupIndex(spark, dir, name)

  /** Near matches of arriving (doc_id, text) rows against a frozen
    * band index — arrival-scaled, collisions only. */
  def nearMatchesAgainstFrozen(arrivals: DataFrame, name: String): DataFrame =
    Dedup.nearMatchesFrozen(spark, arrivals, name)

  /** Band-drift staleness of a frozen near-dup index against an
    * arriving batch — the d21 aggregate off the shipped buckets. */
  def nearDupStaleness(arrivals: DataFrame, name: String): DataFrame =
    Dedup.nearDupStaleness(spark, arrivals, name)

  /** The automated drift→refreeze loop for the band index: absorb
    * the arrivals by ONE bucket-table merge (band state is mergeable
    * — no corpus re-read) when their unseen-bucket share trips.
    * Returns the new generation when it fired. */
  def refreezeNearDupIfStale(arrivals: DataFrame, name: String,
      maxNewShare: Double = 0.2): Option[Long] =
    Dedup.refreezeNearDupIfStale(spark, arrivals, name, maxNewShare)

  /** Streaming serving of the frozen near-dup screen: per-batch
    * probes of the shipped buckets, pointer re-bound per batch. */
  def streamingNearMatch(docStream: DataFrame, name: String,
      outDir: String, checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    graft.streaming.NearDupStream.matchFrozenStream(docStream, name,
      outDir, checkpoint)

  /** CONTINUOUS drift monitor for the frozen near-dup index. */
  def streamingNearDupDrift(docStream: DataFrame, name: String,
      outDir: String, checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    graft.streaming.NearDupStream.indexDriftStream(docStream, name,
      outDir, checkpoint)

  /** The ALL-FROZEN curation nightly (p29, round 17): freeze the
    * gate/screen/tokenizer artifacts on the corpus slice, then run
    * arrivals through gate → exact screen → near screen → pack with
    * every stage reading a shipped artifact. */
  def frozenCuration: DataFrame = Pipeline.p29FrozenCuration(spark, dir)

  /** p29's freeze step alone (the amortized prepare). */
  def frozenCurationPrepare(ns: String = "p29"): Unit =
    Pipeline.p29Prepare(spark, dir, ns)

  /** p29's serve step alone — the arrival-scaled nightly read path. */
  def frozenCurationServe(contextLen: Long = 256L,
                          ns: String = "p29"): DataFrame =
    Pipeline.p29ServeFrozen(spark, dir, contextLen, ns)

  /** The nightly's serve over an explicit arrival batch (round 18 —
    * consecutive nightlies serve different batches). */
  def frozenCurationServeBatch(batch: DataFrame, contextLen: Long = 256L,
                               ns: String = "p29"): DataFrame =
    Pipeline.p29ServeBatch(spark, batch, contextLen, ns)

  /** ADMIT a served batch's accepted survivors into the nightly's
    * two mergeable stores (Bloom screen + band index) — the
    * serve → absorb → serve loop's middle edge (round 18). Input:
    * the survivors' (doc_id, text). */
  def frozenCurationAbsorb(survivors: DataFrame,
                           ns: String = "p29"): (Option[Long], Option[Long]) =
    Pipeline.p29Absorb(spark, survivors, ns)

  /** TWO consecutive nightlies with the absorb between (p30): night
    * 2's screens drop replays and near-dups of night 1's accepted
    * survivors. Returns night 2's packed output. */
  def nightlyAbsorb: DataFrame = Pipeline.p30NightlyAbsorb(spark, dir)

  /** The nightly loop as a CONTINUOUS stream: per micro-batch,
    * serve → pack under the batch id → absorb survivors, with
    * exactly-once admission under checkpoint replays (the committed
    * pack is the canonical survivor set). */
  def streamingNightly(docStream: DataFrame, ns: String, outDir: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    graft.streaming.NightlyStream.nightlyStream(docStream, ns, outDir,
      checkpoint)

  /** Unconditional band-index absorb of arriving documents (the
    * mergeable-absorb step without the staleness gate). */
  def absorbNearDupIndex(arrivals: DataFrame, name: String): Option[Long] =
    Dedup.absorbNearDupArrivals(spark, arrivals, name)

  /** MAINTAIN the nightly's four frozen families — run each
    * family's own drift→refreeze policy against the arrivals and
    * refreeze exactly the stale ones; one log row per family. The
    * ops loop's third verb (serve → admit → maintain). */
  def frozenCurationMaintain(arrivals: DataFrame,
                             ns: String = "p29"): DataFrame =
    Pipeline.p29Maintain(spark, dir, arrivals, ns)

  /** Maximal-marginal-relevance context selection over the ranked
    * chunks (p25) — graded diversity between ranking and assembly. */
  def mmrContext(window: Long = 32L, stride: Long = 24L): DataFrame =
    Pipeline.p25MmrContext(spark, dir, window, stride)

  /** Exact Gram (second-moment) matrix of the embedding corpus (s20). */
  def gramMatrix: DataFrame = Similarity.s20GramMatrix(spark, dir)

  /** Supplier-nation yearly market share, TPC-H Q8 shape (q44). */
  def marketShare: DataFrame = Analytics3.q44MarketShare(spark, dir)

  /** Streaming horizon-windowed dedup (twin of q34): closed
    * suppression windows under the watermark. */
  def streamingWindowedDedup(eventStream: DataFrame,
                             watermark: String = "0 seconds"):
      Dataset[graft.streaming.EventStream.WinDedupRow] =
    graft.streaming.EventStream.windowedDedup(eventStream, watermark)

  /** Streaming first-order transition edges (twin of q39). */
  def streamingTransitions(eventStream: DataFrame):
      Dataset[graft.streaming.EventStream.TransRow] =
    graft.streaming.EventStream.transitions(eventStream)

  /** TPC-H Q5-shape local-supplier revenue rollup (q43). */
  def localSupplierRevenue: DataFrame = Analytics3.q43LocalSupplier(spark, dir)

  /** Join-key skew audit for salting decisions (qa12). */
  def skewAudit: DataFrame = Analytics3.qa12SkewAudit(spark, dir)

  /** Customer order-count distribution incl. the zero bucket, TPC-H
    * Q13 shape (q50). */
  def orderCountDistribution: DataFrame = Analytics4.q50OrderCounts(spark, dir)

  /** Revenue carried by under-fifth-of-average-quantity lines per
    * brand, TPC-H Q17 shape (q51). */
  def smallQuantityRevenue: DataFrame = Analytics4.q51SmallQtyRevenue(spark, dir)

  /** Top-20 customers by returned-item revenue, TPC-H Q10 shape (q52). */
  def returnedRevenue: DataFrame = Analytics4.q52ReturnedRevenue(spark, dir)

  /** Monthly promo revenue share, TPC-H Q14 shape (q53). */
  def promoShare: DataFrame = Analytics4.q53PromoShare(spark, dir)

  /** Quarterly max-revenue supplier(s), TPC-H Q15 shape (q54). */
  def topSupplier: DataFrame = Analytics4.q54TopSupplier(spark, dir)

  /** Distinct-supplier variety per part attribute, TPC-H Q16 shape (q55). */
  def partVariety: DataFrame = Analytics4.q55PartVariety(spark, dir)

  /** Disjunctive bracket revenue, TPC-H Q19 shape (q56). */
  def bracketRevenue: DataFrame = Analytics4.q56BracketRevenue(spark, dir)

  /** Profit by supplier nation and ship year, TPC-H Q9 shape (q57). */
  def profitByNation: DataFrame = Analytics4.q57Profit(spark, dir)

  /** Parts above a global value fraction, TPC-H Q11 shape (q58). */
  def importantParts: DataFrame = Analytics4.q58ImportantParts(spark, dir)

  /** Top-10 unshipped-backlog orders, TPC-H Q3 shape (q59). */
  def unshippedBacklog: DataFrame = Analytics4.q59UnshippedBacklog(spark, dir)

  /** Cheapest supplier per part, TPC-H Q2 shape (q60). */
  def cheapestSupplier: DataFrame = Analytics4.q60CheapestSupplier(spark, dir)

  /** Late-shipped order counts per priority (q61 — the Q4-shape
    * decorrelated inequality EXISTS). */
  def lateOrders: DataFrame = Analytics4.q61LateOrders(spark, dir)

  /** Urgent-vs-rest late-shipment counts per line status (q62 — the
    * Q12-shape conditional count pair). */
  def prioritySplit: DataFrame = Analytics4.q62PrioritySplit(spark, dir)

  /** Contrastive-training hard negatives: per query, the top-5
    * different-label neighbors with their margin below the nearest
    * positive (s21). */
  def hardNegatives: DataFrame = Similarity.s21HardNegatives(spark, dir)

  /** Overlapping context windows — the long-document training/RAG
    * chunker (p19): W-token windows at stride S with exact coverage. */
  def chunkWindows(window: Long = 32L, stride: Long = 24L): DataFrame =
    Pipeline.p19ChunkWindows(spark, dir, window, stride)

  /** The composed ingest DAG: chunk every document, pack the chunks
    * into context-length bins per source (p20). */
  def chunkPack(window: Long = 32L, stride: Long = 24L,
                contextLen: Long = 2048L): DataFrame =
    Pipeline.p20ChunkPack(spark, dir, window, stride, contextLen)

  /** Context assembly — the retrieval half of the ingest DAG (p21):
    * rank the corpus's context-window chunks per query by BM25 at
    * chunk granularity and assemble the top chunks in rank order
    * under a token budget (the RAG prompt-builder step). */
  def contextAssembly(window: Long = 32L, stride: Long = 24L,
                      budget: Long = 96L): DataFrame =
    Pipeline.p21ContextAssembly(spark, dir, window, stride, budget)

  /** Vocabulary drift of derived arrival regimes against this
    * corpus's vocabulary (t20) — the text family's WHEN-to-refreeze
    * monitor run live, one row per regime. */
  def vocabDrift: DataFrame =
    graft.operators.TextAnalysis.t20VocabDrift(spark, dir)

  /** Diverse context assembly (p23): p21's retrieval with the
    * best-chunk-per-document diversity cut before the token budget
    * (the RAG near-duplicate-context guard). */
  def diverseContext(window: Long = 32L, stride: Long = 24L,
                     budget: Long = 96L): DataFrame =
    Pipeline.p23DiverseContext(spark, dir, window, stride, budget)

  /** Incremental BM25 (p22): rank corpus ∪ derived arrivals under
    * freeze-time weights — the frozen-IDF append semantics run live
    * (row-for-row what a freeze → append → searchFrozen lifecycle
    * serves; TextIndexSpec pins it). */
  def incrementalBm25: DataFrame =
    Pipeline.p22IncrementalBm25(spark, dir)

  /** Streaming twin of [[chunkWindows]] — p19's literal core over an
    * arriving (doc_id, text) stream (stateless, append mode). */
  def streamingChunkWindows(docStream: DataFrame, window: Long = 32L,
                            stride: Long = 24L): DataFrame =
    graft.streaming.QualityStream.chunkWindows(docStream, window, stride)

  /** Streaming twin of [[hardNegatives]]: arriving query vectors
    * mine their confusable negatives per micro-batch against the
    * at-rest corpus (idempotent by-batch sink). */
  def streamingHardNegatives(queryStream: DataFrame, outDir: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    graft.streaming.AnnStream.mineStream(queryStream,
      graft.streaming.AnnStream.corpusFrame(spark, dir), outDir, checkpoint)

  /** Batch nearest-neighbor image resize over a binary media column
    * (deterministic pure-JDK — see [[Multimodal.imageResize]]). */
  def resizeImages(media: DataFrame, width: Int, height: Int,
                   idCol: String = "doc_id", binCol: String = "media"):
      Dataset[Multimodal.ResizedMedia] =
    Multimodal.resizeBatch(media, width, height, idCol, binCol)

  /** Batch integer-factor WAV decimation over a binary audio column
    * (deterministic — see [[Multimodal.wavDecimate]]). */
  def decimateAudio(media: DataFrame, factor: Int,
                    idCol: String = "doc_id", binCol: String = "media"):
      Dataset[Multimodal.ResampledAudio] =
    Multimodal.decimateBatch(media, factor, idCol, binCol)

  /** Perceptual average-hash per media item (mm09). */
  def perceptualHashes: DataFrame = Multimodal.mm09Phash(spark, dir)

  /** Banded near-dup pairs over a (doc_id, h_hi, h_lo) hash frame.
    * `maxBandOccupancy` > 0 caps degenerate hot buckets (see
    * [[Multimodal.phashPairs]] for the exactness trade). */
  def perceptualPairs(hashes: DataFrame, maxHamming: Int = 3,
                      maxBandOccupancy: Long = 0L): DataFrame =
    Multimodal.phashPairs(hashes, maxHamming, maxBandOccupancy)

  /** Freeze the IVFPQ similarity index to bucketed managed tables —
    * later sessions search it via [[searchFrozenAnn]] without
    * rebuilding cells/codes. */
  def shipAnnIndex(name: String, buckets: Int = 8): Unit =
    Similarity.shipIvfpqIndex(spark, dir, name, buckets)

  /** Append arriving vectors to a frozen index through its frozen
    * quantizers (bucket layout preserved — AnnShipSpec). */
  def appendToAnnIndex(newVecs: DataFrame, name: String): Unit =
    Similarity.appendToFrozenIndex(newVecs, name)

  /** Compact the ANN index's live generation after a run of appends
    * (one sorted file per bucket again — crash-safe rewrite, whole
    * window under the family lease so a racing append blocks or
    * fails loudly; `vacuumOrphans` folds crashed appends' invisible
    * rows — see [[graft.sources.AnnIndexStore.compact]]). */
  def compactAnnIndex(name: String, vacuumOrphans: Boolean = false): Unit =
    graft.sources.AnnIndexStore.compact(spark, name, vacuumOrphans)

  /** Search a frozen index shipped by [[shipAnnIndex]] — rows equal
    * the in-memory ivfpq/filteredIvfpq (AnnShipSpec). */
  def searchFrozenAnn(name: String, probeFine: Int = 2,
                      labelFiltered: Boolean = false): DataFrame =
    Similarity.searchFrozenIvfpq(spark, dir, name,
      probeFine = probeFine, labelFiltered = labelFiltered)

  /** Freeze d19's Bloom screen artifacts (geometry, filter words,
    * corpus hashes) for rebuild-free arrival screening. */
  def shipBloomFilter(name: String, bitsPerElem: Long = 10L): Unit =
    Dedup.shipBloomIndex(spark, dir, name, bitsPerElem)

  /** Screen the arrival slice against a frozen Bloom filter. */
  def screenAgainstFrozenBloom(name: String): DataFrame =
    Dedup.d19ScreenFrozen(spark, dir, name)

  /** Saturation of the frozen Bloom filter — the d22 aggregate off
    * the shipped components (fill share + predicted FP rate). */
  def bloomSaturation(name: String): DataFrame =
    Dedup.bloomSaturationFrozen(spark, name)

  /** Absorb accepted arrivals into the frozen filter by ONE
    * word-OR merge + hash append under the frozen geometry. */
  def absorbIntoBloom(arrivals: DataFrame, name: String): Option[Long] =
    Dedup.absorbBloomArrivals(spark, arrivals, name)

  /** Rebuild the filter geometry from the shipped hash part when the
    * fill share trips — never a corpus re-read. */
  def refreezeBloomIfSaturated(name: String, maxFill: Double = 0.35,
      bitsPerElem: Long = 10L): Option[Long] =
    Dedup.refreezeBloomIfSaturated(spark, name, maxFill, bitsPerElem)

  /** Streaming absorb-and-monitor loop for the frozen filter: each
    * micro-batch absorbs (replay-exact via the hash guard) and lands
    * its post-absorb saturation row. */
  def streamingBloomAbsorb(docStream: DataFrame, name: String,
      outDir: String, checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    graft.streaming.BloomStream.absorbStream(docStream, name,
      outDir, checkpoint)

  /** Horizon-windowed event dedup — batch twin of the stream's
    * watermark-bounded exact dedup (q34). */
  def windowedDedup: DataFrame = Analytics3.q34WindowedDedup(spark, dir)

  /** Time-decayed top-k users per event type (q40). */
  def decayedTopk: DataFrame = Analytics3.q40DecayedTopk(spark, dir)

  /** The media E2E dedup pipeline over a binary image frame:
    * resize → perceptual hash → banded near-dup pairs (mm10). */
  def mediaPipeline(media: DataFrame, tw: Int = 32, th: Int = 32,
                    maxHamming: Int = 3): DataFrame =
    Multimodal.mediaPipeline(media, tw, th, maxHamming)

  /** Incremental media match: arriving re-encoded copies matched
    * back to their corpus originals (mm11). */
  def incrementalMediaMatch: DataFrame =
    Multimodal.mm11IncrementalMatch(spark, dir)

  /** Band-drift staleness monitor for the media index — the
    * re-freeze trigger (mm12). */
  def mediaBandDrift: DataFrame = Multimodal.mm12BandDrift(spark, dir)

  /** Freeze a perceptual-hash corpus as a versioned named index;
    * match arriving hash batches against it without re-hashing the
    * corpus; absorb them with O(batch) appends. */
  def freezeMediaIndex(hashes: DataFrame, name: String,
                       retain: Int = 1, maxBandOccupancy: Long = 0L): Long =
    graft.sources.MediaIndexStore.freeze(hashes, name, retain, maxBandOccupancy)

  def matchFrozenMedia(arrivalHashes: DataFrame, name: String,
                       maxHamming: Int = 3): DataFrame =
    graft.sources.MediaIndexStore.matchFrozen(spark, arrivalHashes, name, maxHamming)

  def appendMediaIndex(hashes: DataFrame, name: String): Unit =
    graft.sources.MediaIndexStore.append(hashes, name)

  /** Compact the media index's live generation after a run of
    * appends (crash-safe rewrite, lease-held window — see
    * [[graft.sources.MediaIndexStore.compact]]). */
  def compactMediaIndex(name: String, files: Int = 8,
                        vacuumOrphans: Boolean = false): Unit =
    graft.sources.MediaIndexStore.compact(spark, name, files, vacuumOrphans)

  /** Streaming media match against a frozen index (per-micro-batch
    * pointer binding; idempotent per-batch-id sink). */
  def streamingMediaMatch(mediaStream: DataFrame, name: String,
      outDir: String, checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    graft.streaming.MediaStream.matchStream(mediaStream, name, outDir, checkpoint)

  /** Continuous band-occupancy counters (mm12's streaming twin —
    * state bounded by the banding geometry). */
  def streamingBandCounters(hashStream: DataFrame): DataFrame =
    graft.streaming.MediaStream.bandCounters(hashStream)

  /** The automated drift→refreeze loop for the media-hash index:
    * grade an arriving hash batch with the mm12 drift algebra and
    * re-freeze over corpus ∪ arrivals when the aggregate band hit
    * share falls below `minHitShare` (integer-exact compare). Returns
    * the new generation when it fired; bound readers survive the
    * flip for `retain` further refreezes (RefreezeLoopSpec). */
  def refreezeMediaIfStale(arrivalHashes: DataFrame, name: String,
      minHitShare: Double = 0.5, retain: Int = 1,
      maxBandOccupancy: Long = 0L): Option[Long] =
    graft.sources.MediaIndexStore.refreezeIfStale(spark, arrivalHashes,
      name, minHitShare, retain, maxBandOccupancy)

  /** Freeze the chunk-granular inverted text index over this
    * corpus's p19 context windows — sparse retrieval's frozen index
    * (postings + frozen IDF; see
    * [[graft.sources.Bm25IndexStore]]). */
  def freezeTextIndex(name: String, window: Long = 32L,
                      stride: Long = 24L, buckets: Int = 8,
                      retain: Int = 1): Long =
    graft.sources.Bm25IndexStore.freeze(
      Pipeline.chunkFrame(Tables.documents(spark, dir), window, stride),
      name, buckets, retain)

  /** Rank chunks against a frozen text index (term-pushed posting
    * reads; scores identical to the live p21 ranking core). */
  def searchTextIndex(name: String, queries: Seq[(Int, Seq[String])],
                      topK: Int = 10): DataFrame =
    graft.sources.Bm25IndexStore.searchFrozen(spark, name, queries, topK)

  /** Append arriving documents' chunks to a frozen text index
    * (frozen-IDF semantics — known terms searchable immediately,
    * unseen vocabulary waits for the next freeze). */
  def appendTextIndex(newDocs: DataFrame, name: String,
                      window: Long = 32L, stride: Long = 24L): Unit =
    graft.sources.Bm25IndexStore.append(
      Pipeline.chunkFrame(newDocs, window, stride), name)

  /** Compact the text index's live generation after a run of appends
    * (restores one sorted file per postings bucket — crash-safe
    * rewrite, lease-held window — see
    * [[graft.sources.Bm25IndexStore.compact]]). */
  def compactTextIndex(name: String, vacuumOrphans: Boolean = false): Unit =
    graft.sources.Bm25IndexStore.compact(spark, name, vacuumOrphans)

  /** Vocabulary staleness of a frozen text index against arriving
    * documents — the WHEN-to-refreeze monitor (t20's algebra over
    * the persisted vocabulary; one row: unseen-posting share +
    * length drift vs the frozen average). */
  def textStaleness(newDocs: DataFrame, name: String,
                    window: Long = 32L, stride: Long = 24L): DataFrame =
    graft.sources.Bm25IndexStore.staleness(spark,
      Pipeline.chunkFrame(newDocs, window, stride), name)

  /** The automated drift→refreeze loop for the frozen text index:
    * re-freeze when arrivals' unseen-vocabulary share trips the
    * threshold (integer-exact compare). */
  def refreezeTextIfStale(newDocs: DataFrame, name: String,
                          maxUnseenShare: Double = 0.2,
                          window: Long = 32L, stride: Long = 24L,
                          buckets: Int = 8, retain: Int = 1): Option[Long] =
    graft.sources.Bm25IndexStore.refreezeIfStale(spark,
      Pipeline.chunkFrame(newDocs, window, stride), name,
      maxUnseenShare, buckets, retain)

  /** Streaming frozen-text-index search over an arriving
    * (query_id, term) stream (per-micro-batch pointer binding;
    * idempotent per-batch-id sink). */
  def streamingTextSearch(queryStream: DataFrame, name: String,
      outDir: String, checkpoint: String,
      topK: Int = 10): org.apache.spark.sql.streaming.StreamingQuery =
    graft.streaming.Bm25Stream.searchStream(queryStream, name, outDir,
      checkpoint, topK)

  /** Continuous vocabulary-drift monitor over an arriving
    * (doc_id, text) stream — one staleness row per micro-batch
    * against the live frozen generation (t20's role run
    * continuously; pointer re-binds per trigger). */
  def streamingTextDrift(docStream: DataFrame, name: String,
      outDir: String, checkpoint: String, window: Long = 32L,
      stride: Long = 24L): org.apache.spark.sql.streaming.StreamingQuery =
    graft.streaming.Bm25Stream.driftStream(docStream, name, outDir,
      checkpoint, window, stride)

  /** The automated drift→refreeze loop for the frozen ANN index:
    * grade arrivals' fit against the LIVE generation's frozen fine
    * centroids (qa04's signal) and re-freeze over corpus ∪ arrivals
    * when the mean fit drops more than `maxFitDriftMicro`
    * micro-cosines below the corpus's own (BigInt-exact compare).
    * Returns the new generation when it fired. */
  def refreezeAnnIfStale(corpus: DataFrame, arrivals: DataFrame,
      name: String, maxFitDriftMicro: Long = 100000L,
      buckets: Int = 8): Option[Long] =
    Similarity.refreezeIfStale(corpus, arrivals, name, maxFitDriftMicro, buckets)

  /** SQL front door: register every source table as a temp view
    * (`graft_documents`, `graft_events`, …) and the custom
    * expressions (`regexp_extract_groups`, `long_array_dot`) in the
    * function registry, so a pure-SQL caller can drive the engine:
    *
    *   g.registerSql()
    *   spark.sql("SELECT source, count(*) FROM graft_documents GROUP BY 1")
    *
    * Views are lazy plans over the parquet sources — registering
    * costs nothing and every SQL query still gets pushdown/pruning. */
  def registerSql(prefix: String = "graft_"): Unit = {
    graft.plans.GraftExtensions.register(spark)
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "documents", "embeddings").foreach { t =>
      Tables.load(spark, dir, t).createOrReplaceTempView(prefix + t)
    }
    Tables.events(spark, dir).createOrReplaceTempView(prefix + "events")
  }
}
