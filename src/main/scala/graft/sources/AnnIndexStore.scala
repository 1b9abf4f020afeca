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
    * are immutable between freezes by design. */
  def append(assign: DataFrame, codes: DataFrame, name: String): Unit = {
    val spark = assign.sparkSession
    def bucketsOf(t: String): Int = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(t))
      .bucketSpec.map(_.numBuckets)
      .getOrElse(throw new IllegalStateException(s"$t is not bucketed"))
    assign.write.mode("append").format("parquet")
      .bucketBy(bucketsOf(s"${name}_assign"), "vec_id").sortBy("vec_id")
      .saveAsTable(s"${name}_assign")
    codes.write.mode("append").format("parquet")
      .bucketBy(bucketsOf(s"${name}_codes"), "vec_id").sortBy("vec_id")
      .saveAsTable(s"${name}_codes")
  }

  /** COMPACT the two corpus-scale tables after a run of appends:
    * each append lands one file per bucket, so a bucket accumulates
    * one file per batch — reads stay correct (bucket pruning is
    * per-directory-hash, not per-file) but the catalog can no longer
    * report the in-bucket SORT (Spark only trusts sortBy metadata
    * when a bucket is a single file), so sort-merge consumers
    * re-sort. One rewrite per table restores one sorted file per
    * bucket. The rewrite goes through a temp table + RENAME (Spark
    * refuses to overwrite a table it is reading), keeping the same
    * bucket spec — AnnShipSpec pins rows + plan shape across the
    * compaction. */
  def compact(spark: SparkSession, name: String): Unit =
    Bucketed.foreach { s =>
      val t = s"${name}_$s"
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
      spark.sql(s"DROP TABLE $t")
      spark.sql(s"ALTER TABLE ${t}_compacting RENAME TO $t")
    }

  /** Drop a freeze (test hygiene / retiring a snapshot) — including
    * any half-finished compaction temp and any orphaned warehouse
    * directories a dead JVM left behind. */
  def drop(spark: SparkSession, name: String): Unit =
    (Small ++ Bucketed).foreach { s =>
      Bucketing.resetTable(spark, s"${name}_$s")
      Bucketing.resetTable(spark, s"${name}_${s}_compacting")
    }
}
