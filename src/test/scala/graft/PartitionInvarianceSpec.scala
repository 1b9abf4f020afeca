package graft

import org.apache.spark.sql.DataFrame

/** Partition-count invariance: a distributed operator's RESULT must
  * not depend on how the data happens to be split — the property
  * that separates "works on my 32 partitions" from correct-anywhere.
  * Re-running order-sensitive queries (stacked windows, merges,
  * banding, packing) under a prime shuffle-partition count must
  * reproduce the default-run rows exactly. */
class PartitionInvarianceSpec extends SparkSpec {

  private def withShufflePartitions[A](n: Int)(f: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try f finally spark.conf.set(key, prev)
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  for (name <- Seq("q07_window_running", "q09_sessionize",
                   "d02_minhash_lsh", "d02_production",
                   "d08_semantic_dedup", "p02_sequence_pack",
                   "m03_messages", "q24_range_window",
                   // round 3: stacked lag/lead windows with tie-break,
                   // running-sum packing + explode, max(struct) argmax
                   "q32_scd2", "p10_pack_boundaries", "m12_queue_aging",
                   // round 4b: two-phase bucketed rank, band-join
                   // verdicts, hash thresholds, TakeOrdered top-k
                   "t15_lm_buckets", "d15_incremental_dedup",
                   "p12_temperature_mix", "p13_rank_balance",
                   "qa03_sample_topk",
                   // round 6: ADC sum + two window ranks over probed
                   // cells, the generated-grid sweep aggregate, and
                   // BPE-budget packing
                   "s13_ann_ivfpq", "s14_filtered_recall",
                   "p14_bpe_pack", "d18_incremental_semdedup",
                   // round 8: filtered ADC ranking, the IVFPQ sweep
                   // aggregate, full-outer cell-aggregate join with
                   // floored micro-cos sums, per-byte array folds
                   "s15_filtered_ivfpq", "s16_ivfpq_recall",
                   "qa04_index_staleness", "mm05_audio_stats",
                   // round 8b: the bit_or filter fold + hits-only
                   // union, truncated-mean Lloyd rounds, dual-arm
                   // ranked search, cluster-keyed split flags
                   "d19_bloom_screen", "s18_kmeans_refine",
                   "s19_refined_recall", "p15_cluster_split",
                   // round 8d: salted fact⋈dim aggregate, two-phase
                   // BM25 top-k, unrolled integer-PageRank iterations
                   "q37_salted_join", "t18_bm25", "t19_textrank",
                   // round 8e: adjacency-array intersections, banded
                   // degree orientation, hint-free rank iterations,
                   // multi-distinct Expand profile, block-bit packing
                   "g01_triangles", "g03_pagerank", "q41_profile",
                   "mm09_phash", "q43_local_supplier",
                   // round 8e cont.: incremental category joins +
                   // the native array-sum outer-product aggregate
                   "g04_incremental_triangles", "s20_gram_matrix",
                   "q44_market_share",
                   // round 9 (ADVICE r8): the five round-8 shuffle-
                   // heavy aggregates the sweep had omitted — basket
                   // pair join, lag-window transitions, dow-baseline
                   // ratio, top-10 skew audit, co-purchase jaccard
                   "q38_assoc_rules", "q39_transitions", "q42_seasonal",
                   "qa12_skew_audit", "g02_copurchase_jaccard",
                   // round 9 new keys: horizon-window dedup (lag +
                   // running sum + windowed-keeper groupBy), decayed
                   // top-k (1-row broadcast + rank over the bounded
                   // score aggregate)
                   "q34_windowed_dedup", "q40_decayed_topk",
                   // round 9b: HAVING-filtered aggregate join-back +
                   // the global-scalar/anti-join composite
                   "q45_big_orders", "q46_dormant_customers",
                   // round 11c: computed-measure TakeOrdered top-k
                   // (double sort keys), decimal max join-back, the
                   // global-fraction HAVING
                   "q52_returned_revenue", "q59_unshipped_backlog",
                   "q54_top_supplier", "q58_important_parts",
                   "q60_cheapest_supplier",
                   // round 15: the 12-round argmax training loop +
                   // its trained-fold application and packing, the
                   // contraction-labeled communities and their
                   // arrival-classify monitor
                   "t28_train_bpe", "t29_trained_tokens",
                   "p27_trained_pack", "g08_communities",
                   "g09_community_bridges",
                   // round 16: the calibration sweep's projection
                   // and the frozen-tokenizer serving path
                   "t30_merge_calibration", "t31_frozen_tokens",
                   "p28_frozen_pack", "t32_compression_drift")) {
    test(s"$name: identical results under 7 shuffle partitions") {
      val fn = SparkEntry.queries(name)
      val default = rows(fn(spark, sf))
      // drop every cached frame first: otherwise the rerun would read
      // the default run's InMemoryRelation bytes (e.g. d02's persisted
      // signatures) instead of re-executing the stage under the new
      // partition count — comparing a cache against itself proves
      // nothing
      spark.sharedState.cacheManager.clearCache()
      val reshuffled = withShufflePartitions(7)(rows(fn(spark, sf)))
      assert(default == reshuffled, s"$name depends on the partition count")
    }
  }
}
