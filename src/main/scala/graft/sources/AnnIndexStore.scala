package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The persisted components of a frozen IVFPQ similarity index —
  * what [[graft.operators.Similarity.shipIvfpqIndex]] writes and a
  * fresh session's `searchFrozenIvfpq` reads back.
  *
  * Split by scale class:
  *  - `coarse` / `f2c` / `codebook` / `refined` are CONSTANT-size
  *    (8 / 72 / 64 / ≤64 rows at any corpus size — the bounded-k
  *    rules) → plain managed tables; every search broadcasts them.
  *  - `assign` (vec_id → cell [+ label]) and `codes`
  *    (vec_id × 4 subspaces → codeword) are CORPUS-scale → bucketed
  *    on vec_id with one shared bucket count, so the search's
  *    candidates⋈codes equi-join and the ADC aggregate (grouping
  *    keys ⊇ vec_id) plan with no corpus-side shuffle exchange.
  *
  * Raw vectors deliberately do NOT ship: they stay at rest in the
  * embeddings table (an index that re-materializes its corpus
  * doubles 100 TB of vector storage); the exact rerank re-reads the
  * 20 rows/query it needs by id.
  */
case class FrozenAnnIndex(coarse: DataFrame, f2c: DataFrame,
                          codebook: DataFrame, refined: DataFrame,
                          assign: DataFrame, codes: DataFrame)

object AnnIndexStore {

  private val Small = Seq("coarse", "f2c", "codebook", "refined")
  private val Bucketed = Seq("assign", "codes")

  private def parts(idx: FrozenAnnIndex): Map[String, DataFrame] = Map(
    "coarse" -> idx.coarse, "f2c" -> idx.f2c, "codebook" -> idx.codebook,
    "refined" -> idx.refined, "assign" -> idx.assign, "codes" -> idx.codes)

  /** Persist every component under `<name>_<part>` managed tables.
    * Overwrites a previous freeze of the same name (the snapshot
    * semantics a scheduled re-freeze wants). */
  def write(idx: FrozenAnnIndex, name: String, buckets: Int = 8): Unit = {
    val p = parts(idx)
    Small.foreach { s =>
      // reset first: an orphaned warehouse dir from a previous JVM
      // fails saveAsTable with LOCATION_ALREADY_EXISTS (see
      // Bucketing.resetTable; writeBucketed resets internally)
      Bucketing.resetTable(p(s).sparkSession, s"${name}_$s")
      p(s).write.mode("overwrite").format("parquet")
        .saveAsTable(s"${name}_$s")
    }
    Bucketed.foreach { s =>
      Bucketing.writeBucketed(p(s), s"${name}_$s", "vec_id", buckets)
    }
  }

  /** Load a freeze back. Bucket metadata flows from the catalog
    * (`spark.table`), so the corpus-scale components come back with
    * their hash partitioning visible to Catalyst — a plain
    * `read.parquet` of the files would lose it and re-shuffle. */
  def load(spark: SparkSession, name: String): FrozenAnnIndex =
    FrozenAnnIndex(
      coarse = spark.table(s"${name}_coarse"),
      f2c = spark.table(s"${name}_f2c"),
      codebook = spark.table(s"${name}_codebook"),
      refined = spark.table(s"${name}_refined"),
      assign = spark.table(s"${name}_assign"),
      codes = spark.table(s"${name}_codes"))

  /** Append arrival rows to the two corpus-scale tables, RE-USING
    * each table's catalog bucket spec (a mismatched spec would
    * silently land unbucketed files and the shuffle-free candidate
    * join would quietly regress — the count is read back from the
    * metastore, never assumed). The constant-size quantizer tables
    * are immutable between freezes by design.
    *
    * CRASH-WINDOW DIRECTION (review r9): the two table appends are
    * not one atomic commit, so the order is chosen for the SAFE
    * failure mode — codes FIRST, assign second. A crash between
    * them leaves arrivals present in codes but absent from assign:
    * the search's candidate set comes from assign, so those
    * arrivals are simply NOT SEARCHED YET (re-run the append after
    * [[verifyConsistency]] flags the gap, or re-freeze). The
    * opposite order would leave arrivals in assign but not codes,
    * and the inner candidates⋈codes join would silently drop them
    * from ADC scoring — wrong top-k with no error. NOTE the re-run
    * contract: recovery from a half-append is verify → DROP the
    * freeze → re-ship (or restore from the snapshot before the
    * append); blindly re-appending the same batch would duplicate
    * the committed codes rows. */
  def append(assign: DataFrame, codes: DataFrame, name: String): Unit = {
    val spark = assign.sparkSession
    def bucketsOf(t: String): Int = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(t))
      .bucketSpec.map(_.numBuckets)
      .getOrElse(throw new IllegalStateException(s"$t is not bucketed"))
    codes.write.mode("append").format("parquet")
      .bucketBy(bucketsOf(s"${name}_codes"), "vec_id").sortBy("vec_id")
      .saveAsTable(s"${name}_codes")
    assign.write.mode("append").format("parquet")
      .bucketBy(bucketsOf(s"${name}_assign"), "vec_id").sortBy("vec_id")
      .saveAsTable(s"${name}_assign")
  }

  /** Audit a freeze's assign/codes consistency: every assigned
    * vector carries exactly M=4 code rows, so 4·|assign| = |codes|
    * when the index is whole; a half-append (see [[append]]) shows
    * up as extra codes. Two metadata-served parquet counts — cheap
    * at any scale. Returns (n_assign, n_codes, consistent). */
  def verifyConsistency(spark: SparkSession, name: String): (Long, Long, Boolean) = {
    val na = spark.table(s"${name}_assign").count()
    val nc = spark.table(s"${name}_codes").count()
    (na, nc, nc == 4L * na)
  }

  /** COMPACT the two corpus-scale tables after a run of appends:
    * each append lands one file per bucket, so a bucket accumulates
    * one file per batch — reads stay correct (bucket pruning is
    * per-directory-hash, not per-file) but the catalog can no longer
    * report the in-bucket SORT (Spark only trusts sortBy metadata
    * when a bucket is a single file), so sort-merge consumers
    * re-sort. One rewrite per table restores one sorted file per
    * bucket. The rewrite goes through a temp table + a RENAME chain
    * (Spark refuses to overwrite a table it is reading), keeping the
    * same bucket spec — AnnShipSpec pins rows + plan shape across
    * the compaction.
    *
    * CRASH SAFETY (review r9: the original DROP-then-RENAME had a
    * window where a dying JVM lost the live table with appended
    * arrivals recoverable only by hand): the swap is now
    * `t → t_precompact; t_compacting → t; DROP t_precompact`, so at
    * EVERY point either `t` exists or `t_precompact` does —
    * [[recover]] (run automatically at the START of compact) renames
    * a surviving `t_precompact` back when `t` is missing, making a
    * crashed compaction self-healing on the next attempt. */
  def compact(spark: SparkSession, name: String): Unit =
    Bucketed.foreach { s =>
      val t = s"${name}_$s"
      recoverTable(spark, t)
      val meta = spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(t))
      val buckets = meta.bucketSpec
        .map(_.numBuckets)
        .getOrElse(throw new IllegalStateException(s"$t is not bucketed"))
      // force the REAL bucketed scan for the rewrite: with
      // autoBucketedScan on, this plan hits a rule ordering trap —
      // EnsureRequirements first removes an explicit
      // repartition(buckets, vec_id) as redundant (the logical scan
      // still claims HashPartitioning), then
      // DisableUnnecessaryBucketedScan downgrades the scan to a
      // size-packed read (the write expresses no distribution
      // requirement), leaving mixed-bucket tasks that fan one file
      // into EVERY bucket they touch (measured: 4 tasks × 2 buckets
      // from an 8-file generation). Disabling autoBucketedScan pins
      // one partition per bucket, so the write lands exactly one
      // sorted file per bucket with NO shuffle at all.
      Bucketing.resetTable(spark, s"${t}_compacting")
      val k = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
      val prev = spark.conf.get(k)
      spark.conf.set(k, "false")
      try
        spark.table(t).write.mode("overwrite").format("parquet")
          .bucketBy(buckets, "vec_id").sortBy("vec_id")
          .saveAsTable(s"${t}_compacting")
      finally spark.conf.set(k, prev)
      Bucketing.resetTable(spark, s"${t}_precompact")
      spark.sql(s"ALTER TABLE $t RENAME TO ${t}_precompact")
      spark.sql(s"ALTER TABLE ${t}_compacting RENAME TO $t")
      spark.sql(s"DROP TABLE ${t}_precompact")
    }

  /** Self-healing for a compaction that died mid-swap: if `t` is
    * gone but `t_precompact` survives, rename it back (the
    * un-compacted data is complete — only the rewrite was lost). */
  private def recoverTable(spark: SparkSession, t: String): Unit = {
    val cat = spark.sessionState.catalog
    def exists(n: String) = cat.tableExists(
      org.apache.spark.sql.catalyst.TableIdentifier(n))
    if (!exists(t) && exists(s"${t}_precompact"))
      spark.sql(s"ALTER TABLE ${t}_precompact RENAME TO $t")
  }

  /** Restore every component of a freeze whose compaction crashed
    * mid-swap (see [[compact]]); a no-op on a healthy freeze. */
  def recover(spark: SparkSession, name: String): Unit =
    Bucketed.foreach(s => recoverTable(spark, s"${name}_$s"))

  /** Drop a freeze (test hygiene / retiring a snapshot) — including
    * any half-finished compaction temp and any orphaned warehouse
    * directories a dead JVM left behind. */
  def drop(spark: SparkSession, name: String): Unit =
    (Small ++ Bucketed).foreach { s =>
      Bucketing.resetTable(spark, s"${name}_$s")
      Bucketing.resetTable(spark, s"${name}_${s}_compacting")
      Bucketing.resetTable(spark, s"${name}_${s}_precompact")
    }
}
