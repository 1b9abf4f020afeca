package graft

import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Every `queries` key returns a deterministic, totally-ordered
  * DataFrame; `oracleSql` holds the DuckDB-equivalent SQL the driver
  * hash-compares against. Column names/aliases are kept identical on
  * both sides.
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.q01PricingSummary(spark, "/root/testdata/sf0.001")

  /** DuckDB view of `events` normalised to µs — matches
    * [[graft.sources.Tables.events]] exactly (both truncate nanos). */
  private val evCte =
    "SELECT event_id, make_timestamp(epoch_us(ts)) AS ts, user_id, event_type, value, props FROM events"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (Analytics.q01PricingSummary _),
    "q02_topk_per_group" -> (Analytics.q02TopkPerGroup _),
    "q03_join_revenue" -> (Analytics.q03JoinRevenue _),
    "q04_filter_pushdown" -> (Analytics.q04FilterPushdown _),
    "q05_distinct_agg" -> (Analytics.q05DistinctAgg _),
    "q06_rollup" -> (Analytics.q06Rollup _),
    "q07_window_running" -> (Analytics.q07WindowRunning _),
    "q08_semi_anti" -> (Analytics.q08SemiAnti _),
    "q09_sessionize" -> (Analytics.q09Sessionize _),
    "q10_pivot" -> (Analytics.q10Pivot _),
    "q11_asof_join" -> (Analytics.q11AsofJoin _),
    "q12_percentiles" -> (Analytics.q12Percentiles _),
    "q13_json_extract" -> (Analytics.q13JsonExtract _),
    "q14_tumbling_window" -> (Analytics2.q14TumblingWindow _),
    "q15_interval_join" -> (Analytics2.q15IntervalJoin _),
    "q16_set_ops" -> (Analytics2.q16SetOps _),
    "q17_sample" -> (Analytics2.q17Sample _),
    "q18_cube" -> (Analytics2.q18Cube _),
    "q19_above_avg" -> (Analytics2.q19AboveAvg _),
    "q20_dataset_split" -> (Analytics2.q20DatasetSplit _),
    "q21_sliding_window" -> (Analytics2.q21SlidingWindow _),
    "q22_grouping_sets" -> (Analytics2.q22GroupingSets _),
    "q23_window_ranks" -> (Analytics2.q23WindowRanks _),
    "q24_range_window" -> (Analytics2.q24RangeWindow _),
    "d09_edit_distance" -> (Dedup.d09EditDistance _),
    "d09_production" -> (Dedup.d09Production _),
    "d17_incremental_spans" -> (Dedup.d17IncrementalSpans _),
    "d10_dup_spans" -> (Dedup.d10DupSpans _),
    "d11_lsh_quality" -> (Dedup.d11LshQuality _),
    "d12_decontaminate" -> (Dedup.d12Decontaminate _),
    "m07_queue_latency" -> (MaillogOps.m07QueueLatency _),
    "qa01_approx_sketches" -> (Analytics2.qa01ApproxSketches _),
    "t05_tfidf" -> (TextAnalysis.t05TfIdf _),
    "t06_pii_redact" -> (TextAnalysis.t06PiiRedact _),
    "t07_boilerplate" -> (TextAnalysis.t07Boilerplate _),
    "t08_unigram_lm" -> (Quality.t08UnigramLm _),
    "t09_rep_ngrams" -> (Quality.t09RepNgrams _),
    "t10_vocab_stats" -> (Quality.t10VocabStats _),
    "t11_bigram_lm" -> (Quality.t11BigramLm _),
    "t12_char_profile" -> (Quality.t12CharProfile _),
    "t14_quality_filter" -> (Quality.t14QualityFilter _),
    "t13_lang_mix" -> (TextAnalysis.t13LangMix _),
    "m01_parse_logs" -> (MaillogOps.m01ParseLogs _),
    "m02_clients" -> (MaillogOps.m02Clients _),
    "m03_messages" -> (MaillogOps.m03Messages _),
    "m04_deliveries" -> (MaillogOps.m04Deliveries _),
    "m05_delivery_stats" -> (MaillogOps.m05DeliveryStats _),
    "m06_top_clients" -> (MaillogOps.m06TopClients _),
    "m08_hourly_volume" -> (MaillogOps.m08HourlyVolume _),
    "m09_sender_scorecard" -> (MaillogOps.m09SenderScorecard _),
    "m10_parse_coverage" -> (MaillogOps.m10ParseCoverage _),
    "m11_relay_health" -> (MaillogOps.m11RelayHealth _),
    "t01_token_stats" -> (TextAnalysis.t01TokenStats _),
    "t02_quality" -> (TextAnalysis.t02Quality _),
    "t03_langid" -> (TextAnalysis.t03LangId _),
    "t04_fingerprint" -> (TextAnalysis.t04Fingerprint _),
    "d01_exact_dedup" -> (Dedup.d01ExactDedup _),
    "d02_minhash_lsh" -> (Dedup.d02MinhashLsh _),
    "d02_production" -> (Dedup.d02Production _),
    "d07_dedup_clusters" -> (Dedup.d07DedupClusters _),
    "d08_semantic_dedup" -> (Dedup.d08SemanticDedup _),
    "d03_simhash" -> (Dedup.d03Simhash _),
    "d04_ngram_jaccard" -> (Dedup.d04NgramJaccard _),
    "d05_embedding_neardup" -> (Dedup.d05EmbeddingNeardup _),
    "d06_contamination" -> (Dedup.d06Contamination _),
    "s01_ann_brute" -> (Similarity.s01AnnBrute _),
    "s02_ann_lsh" -> (Similarity.s02AnnLsh _),
    "s03_ann_ivf" -> (Similarity.s03AnnIvf _),
    "s03_production" -> (Similarity.s03Production _),
    "s04_production" -> (Similarity.s04Production _),
    "s08_ann_ivf2" -> (Similarity.s08AnnIvf2 _),
    "s09_filtered_ann" -> (Similarity.s09FilteredAnn _),
    "s10_filtered_ivf" -> (Similarity.s10FilteredIvf _),
    "s11_filtered_ivf2" -> (Similarity.s11FilteredIvf2 _),
    "s12_probe_recall" -> (Similarity.s12ProbeRecall _),
    "s13_ann_ivfpq" -> (Similarity.s13AnnIvfPq _),
    "s14_filtered_recall" -> (Similarity.s14FilteredRecall _),
    "s15_filtered_ivfpq" -> (Similarity.s15FilteredIvfPq _),
    "s16_ivfpq_recall" -> (Similarity.s16IvfpqRecall _),
    "s17_filtered_ivfpq_recall" -> (Similarity.s17FilteredIvfpqRecall _),
    "d08_production" -> (Dedup.d08Production _),
    "s04_ann_pq" -> (Similarity.s04AnnPq _),
    "s05_ann_recall" -> (Similarity.s05AnnRecall _),
    "s06_label_centroids" -> (Similarity.s06LabelCentroids _),
    "mm01_binary_meta" -> (Multimodal.mm01BinaryMeta _),
    "mm02_modality_stats" -> (Multimodal.mm02ModalityStats _),
    "mm03_frame_index" -> (Multimodal.mm03FrameIndex _),
    "p01_curation" -> (Pipeline.p01Curation _),
    "p02_sequence_pack" -> ((s: org.apache.spark.sql.SparkSession, d: String) => Pipeline.p02SequencePack(s, d)),
    "p03_token_budget" -> ((s: org.apache.spark.sql.SparkSession, d: String) => Pipeline.p03TokenBudget(s, d)),
    "p04_shard_manifest" -> ((s: org.apache.spark.sql.SparkSession, d: String) => Pipeline.p04ShardManifest(s, d)),
    "p05_packing_stats" -> ((s: org.apache.spark.sql.SparkSession, d: String) => Pipeline.p05PackingStats(s, d)),
    "p06_mixture_resample" -> (Pipeline.p06MixtureResample _),
    "p07_shuffle_order" -> (Pipeline.p07ShuffleOrder _),
    "p08_source_datasheet" -> (Pipeline.p08SourceDatasheet _),
    "p09_curation_strict" -> (Pipeline.p09CurationStrict _),
    "q25_histogram" -> (Analytics2.q25Histogram _),
    "q26_first_last" -> (Analytics2.q26FirstLast _),
    "q27_funnel" -> (Analytics2.q27Funnel _),
    "q28_share_of_total" -> (Analytics2.q28ShareOfTotal _),
    "q29_retention" -> (Analytics3.q29Retention _),
    "q30_gap_fill" -> (Analytics3.q30GapFill _),
    "q31_mad_outliers" -> (Analytics3.q31MadOutliers _),
    "q32_scd2" -> (Analytics3.q32Scd2 _),
    "q33_snapshot_diff" -> (Analytics3.q33SnapshotDiff _),
    "q34_windowed_dedup" -> (Analytics3.q34WindowedDedup _),
    "q40_decayed_topk" -> (Analytics3.q40DecayedTopk _),
    "q35_ewma_spikes" -> (Analytics3.q35EwmaSpikes _),
    "q36_user_growth" -> (Analytics3.q36UserGrowth _),
    "qa02_approx_robust" -> (Analytics3.qa02ApproxRobust _),
    "qa03_sample_topk" -> (Analytics3.qa03SampleTopkEval _),
    "qa08_histogram_quantiles" -> (Analytics3.qa08HistogramQuantiles _),
    "qa09_bottomk_sample" -> (Quality.qa09BottomkSample _),
    "qa10_hll_by_source" -> (Quality.qa10HllBySource _),
    "qa11_cms_width_curve" -> (Quality.qa11CmsWidthCurve _),
    "d13_norm_dedup" -> (Dedup.d13NormDedup _),
    "d14_dup_span_pairs" -> (Dedup.d14DupSpanPairs _),
    "d15_incremental_dedup" -> (Dedup.d15IncrementalDedup _),
    "d16_source_overlap" -> (Dedup.d16SourceOverlap _),
    "d18_incremental_semdedup" -> (Dedup.d18IncrementalSemdedup _),
    "d19_bloom_screen" -> (Dedup.d19BloomScreen _),
    "d20_containment" -> (Dedup.d20Containment _),
    "d21_band_drift" -> (Dedup.d21BandDrift _),
    "d22_bloom_saturation" -> (Dedup.d22BloomSaturation _),
    "p15_cluster_split" -> (Pipeline.p15ClusterSplit _),
    "s18_kmeans_refine" -> (Similarity.s18KmeansRefine _),
    "qa05_bloom_curve" -> (Dedup.qa05BloomCurve _),
    "s19_refined_recall" -> (Similarity.s19RefinedRecall _),
    "p16_split_balance" -> (Pipeline.p16SplitBalance _),
    "p17_epoch_plan" -> ((s: org.apache.spark.sql.SparkSession, d: String) => Pipeline.p17EpochPlan(s, d)),
    "p18_read_plan" -> ((s: org.apache.spark.sql.SparkSession, d: String) => Pipeline.p18ReadPlan(s, d)),
    "qa06_cms_accuracy" -> (Quality.qa06CmsAccuracy _),
    "qa07_hll_distinct" -> (Quality.qa07HllDistinct _),
    "mm06_scene_index" -> (Multimodal.mm06SceneIndex _),
    "mm07_scene_sample" -> (Multimodal.mm07SceneSample _),
    "mm08_silence_segments" -> (Multimodal.mm08SilenceSegments _),
    "qa04_index_staleness" -> (Dedup.qa04IndexStaleness _),
    "t15_lm_buckets" -> (Quality.t15LmBuckets _),
    "t16_bpe_tokens" -> (Quality.t16BpeTokens _),
    "t17_token_gini" -> (Quality.t17TokenGini _),
    "p12_temperature_mix" -> (Pipeline.p12TemperatureMix _),
    "p14_bpe_pack" -> ((s: org.apache.spark.sql.SparkSession, d: String) => Pipeline.p14BpePack(s, d)),
    "p13_rank_balance" -> ((s: org.apache.spark.sql.SparkSession, d: String) => Pipeline.p13RankBalance(s, d)),
    "s07_range_search" -> (Similarity.s07RangeSearch _),
    "mm04_frame_dedup" -> (Multimodal.mm04FrameDedup _),
    "mm05_audio_stats" -> (Multimodal.mm05AudioStats _),
    "p10_pack_boundaries" -> ((s: org.apache.spark.sql.SparkSession, d: String) => Pipeline.p10PackBoundaries(s, d)),
    "p11_curriculum_order" -> (Pipeline.p11CurriculumOrder _),
    "m12_queue_aging" -> (MaillogOps.m12QueueAging _),
    "m13_dsn_taxonomy" -> (MaillogOps.m13DsnTaxonomy _),
    "q37_salted_join" -> (Skew.q37SaltedJoin _),
    "t18_bm25" -> (TextAnalysis.t18Bm25 _),
    "t19_textrank" -> (TextAnalysis.t19Textrank _),
    "t20_vocab_drift" -> (TextAnalysis.t20VocabDrift _),
    "q38_assoc_rules" -> (Analytics3.q38AssocRules _),
    "q39_transitions" -> (Analytics3.q39Transitions _),
    "g01_triangles" -> (Graph.g01Triangles _),
    "g02_copurchase_jaccard" -> (Graph.g02CopurchaseJaccard _),
    "g03_pagerank" -> (Graph.g03Pagerank _),
    "q41_profile" -> (Analytics3.q41Profile _),
    "q42_seasonal" -> (Analytics3.q42Seasonal _),
    "mm09_phash" -> (Multimodal.mm09Phash _),
    "mm11_incremental_match" -> (Multimodal.mm11IncrementalMatch _),
    "mm12_band_drift" -> (Multimodal.mm12BandDrift _),
    "q43_local_supplier" -> (Analytics3.q43LocalSupplier _),
    "qa12_skew_audit" -> (Analytics3.qa12SkewAudit _),
    "g04_incremental_triangles" -> (Graph.g04IncrementalTriangles _),
    "g05_degree_drift" -> (Graph.g05DegreeDrift _),
    "g06_frozen_closures" -> (Graph.g06FrozenClosures _),
    "t21_rrf_fusion" -> (TextAnalysis.t21RrfFusion _),
    "s20_gram_matrix" -> (Similarity.s20GramMatrix _),
    "q44_market_share" -> (Analytics3.q44MarketShare _),
    "q45_big_orders" -> (Analytics3.q45BigOrders _),
    "q46_dormant_customers" -> (Analytics3.q46DormantCustomers _),
    "q47_sole_fault" -> (Analytics3.q47SoleFault _),
    "q48_dominant_supplier" -> (Analytics3.q48DominantSupplier _),
    "q49_trade_flows" -> (Analytics3.q49TradeFlows _),
    "q50_order_counts" -> (Analytics4.q50OrderCounts _),
    "q51_small_qty_revenue" -> (Analytics4.q51SmallQtyRevenue _),
    "q52_returned_revenue" -> (Analytics4.q52ReturnedRevenue _),
    "q53_promo_share" -> (Analytics4.q53PromoShare _),
    "q54_top_supplier" -> (Analytics4.q54TopSupplier _),
    "q55_part_variety" -> (Analytics4.q55PartVariety _),
    "q56_bracket_revenue" -> (Analytics4.q56BracketRevenue _),
    "q57_profit" -> (Analytics4.q57Profit _),
    "q58_important_parts" -> (Analytics4.q58ImportantParts _),
    "q59_unshipped_backlog" -> (Analytics4.q59UnshippedBacklog _),
    "q60_cheapest_supplier" -> (Analytics4.q60CheapestSupplier _),
    "q61_late_orders" -> (Analytics4.q61LateOrders _),
    "q62_priority_split" -> (Analytics4.q62PrioritySplit _),
    "s21_hard_negatives" -> (Similarity.s21HardNegatives _),
    "s22_frozen_filtered" -> (Similarity.s22FrozenFiltered _),
    "p19_chunk_windows" -> ((s, d) => Pipeline.p19ChunkWindows(s, d)),
    "p20_chunk_pack" -> ((s, d) => Pipeline.p20ChunkPack(s, d)),
    "p21_context_assembly" -> ((s, d) => Pipeline.p21ContextAssembly(s, d)),
    "p22_incremental_bm25" -> ((s, d) => Pipeline.p22IncrementalBm25(s, d)),
    "p23_diverse_context" -> ((s, d) => Pipeline.p23DiverseContext(s, d)),
    "p24_crossdoc_context" -> ((s, d) => Pipeline.p24CrossdocContext(s, d)),
    "p25_mmr_context" -> ((s, d) => Pipeline.p25MmrContext(s, d)),
    "t22_hybrid_fusion" -> (TextAnalysis.t22HybridFusion _),
    "t23_quality_classifier" -> (Quality.t23QualityClassifier _),
    "p26_classifier_curation" -> (Pipeline.p26ClassifierCuration _),
    "g07_incremental_pagerank" -> (Graph.g07IncrementalPagerank _),
    "t24_gate_calibration" -> (Quality.t24GateCalibration _),
    "t25_filtered_hybrid" -> (TextAnalysis.t25FilteredHybrid _),
    "t26_score_drift" -> (Quality.t26ScoreDrift _),
    "t27_train_classifier" -> (Quality.t27TrainClassifier _),
    "t28_train_bpe" -> (Quality.t28TrainBpe _),
    "t29_trained_tokens" -> (Quality.t29TrainedTokens _),
    "t30_merge_calibration" -> (Quality.t30MergeCalibration _),
    "t31_frozen_tokens" -> (Quality.t31FrozenTokens _),
    "t32_compression_drift" -> (Quality.t32CompressionDrift _),
    "g08_communities" -> (Graph.g08Communities _),
    "g09_community_bridges" -> (Graph.g09CommunityBridges _),
    "p27_trained_pack" -> ((s: org.apache.spark.sql.SparkSession, d: String) => Pipeline.p27TrainedPack(s, d)),
    "p28_frozen_pack" -> ((s: org.apache.spark.sql.SparkSession, d: String) => Pipeline.p28FrozenPack(s, d)),
    "p29_frozen_curation" -> (Pipeline.p29FrozenCuration _),
    "p30_nightly_absorb" -> (Pipeline.p30NightlyAbsorb _)
  )

  /** EVERY key carries oracle SQL (QueriesSpec enforces it). The
    * last rows-only keys retired in round 11: qa01/qa02 now run on
    * the engine's own oracle-gated sketches (the qa07/qa10 HLL
    * registers and qa08's histogram, integerized for qa02) instead
    * of Spark-internal approx_count_distinct / percentile_approx
    * bytes no second engine can replay. */
  def oracleSql: Map[String, String] = MaillogOracle.oracles ++
    TextAnalysis.oracles ++ Skew.oracles ++ Dedup.oracles ++ Similarity.oracles ++
    Multimodal.oracles ++ Analytics2.oracles ++ Analytics3.oracles ++
    Analytics4.oracles ++ Graph.oracles ++
    Pipeline.oracles ++
    Quality.oracles ++ Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
        |  COUNT(*) AS count_order,
        |  COUNT(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_topk_per_group" ->
      """SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_orderpriority, rn""".stripMargin,

    "q03_join_revenue" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q04_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_returnflag = 'R' AND l_quantity >= 45 AND l_shipdate >= TIMESTAMP '1997-01-01'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q05_distinct_agg" ->
      """SELECT c_nationkey, COUNT(*) AS n_cust,
        |  COUNT(DISTINCT c_mktsegment) AS n_segments,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    "q06_rollup" ->
      """SELECT COALESCE(r_name, 'ALL') AS region, COALESCE(n_name, 'ALL') AS nation,
        |  COUNT(*) AS n_cust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY region, nation""".stripMargin,

    "q07_window_running" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
        |  lag(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS price_rank
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q08_semi_anti" ->
      """SELECT 'has_f_order' AS bucket, c_nationkey, COUNT(*) AS n_cust
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
        |GROUP BY c_nationkey
        |UNION ALL
        |SELECT 'no_orders' AS bucket, c_nationkey, COUNT(*) AS n_cust
        |FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |GROUP BY c_nationkey
        |ORDER BY bucket, c_nationkey""".stripMargin,

    "q09_sessionize" ->
      s"""WITH ev AS ($evCte),
        |g AS (
        |  SELECT event_id, user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |         THEN 1 ELSE 0 END AS new_s,
        |    event_type
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT *, CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_id
        |  FROM g)
        |SELECT user_id, sess_id, COUNT(*) AS n_events,
        |  COUNT(DISTINCT event_type) AS n_types,
        |  (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) / 1000000.0 AS dur_s
        |FROM s GROUP BY user_id, sess_id ORDER BY user_id, sess_id""".stripMargin,

    "q10_pivot" ->
      s"""WITH ev AS ($evCte)
        |SELECT user_id,
        |  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
        |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
        |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
        |  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
        |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM ev GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q11_asof_join" ->
      s"""WITH ev AS ($evCte),
        |pv AS (SELECT event_id, user_id, event_type, ts FROM ev WHERE event_type IN ('purchase','view')),
        |w AS (
        |  SELECT event_id, user_id, event_type, ts,
        |    max(CASE WHEN event_type = 'view' THEN ts END) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_view_ts
        |  FROM pv)
        |SELECT event_id, user_id, ts AS purchase_ts, last_view_ts,
        |  (epoch_us(ts) - epoch_us(last_view_ts)) / 1000000.0 AS gap_s
        |FROM w WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,

    "q12_percentiles" ->
      s"""WITH ev AS ($evCte)
        |SELECT event_type,
        |  round(quantile_cont(value, 0.5), 6) AS p50,
        |  round(quantile_cont(value, 0.9), 6) AS p90,
        |  COUNT(*) AS n
        |FROM ev GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q13_json_extract" ->
      s"""WITH ev AS ($evCte)
        |SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(json_extract_string(props, '$$.k') AS INTEGER)) AS BIGINT) AS sum_k,
        |  COUNT(DISTINCT CAST(json_extract_string(props, '$$.k') AS INTEGER)) AS n_k
        |FROM ev GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
