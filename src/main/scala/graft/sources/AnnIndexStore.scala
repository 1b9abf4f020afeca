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

  /** Drop a freeze (test hygiene / retiring a snapshot). */
  def drop(spark: SparkSession, name: String): Unit =
    (Small ++ Bucketed).foreach { s =>
      spark.sql(s"DROP TABLE IF EXISTS ${name}_$s")
    }
}
