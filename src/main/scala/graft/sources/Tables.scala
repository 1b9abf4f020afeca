package graft.sources

import graft.GraftSession
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Schema'd loaders for the driver's star-schema testdata.
  *
  * All loaders are plain parquet scans so Catalyst pushdown (filters,
  * column pruning) reaches the file source untouched. `events` is the
  * one exception: its parquet carries INT64 nanosecond timestamps,
  * which we read as raw nanos and normalise to a microsecond
  * TimestampType column so downstream arithmetic matches the DuckDB
  * oracle's `epoch_us` exactly (both truncate toward zero).
  */
object Tables {

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  private[graft] def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    GraftSession.prepare(spark)
    spark.read.parquet(path(dir, name))
  }

  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Adaptive input-parallelism spread for scans whose file layout
    * under-splits the cluster: parquet never splits inside a row
    * group, so a corpus that arrives as a handful of small files (the
    * sf0.1 fixture's `documents` is ONE 584 KB file = one row group =
    * one scan partition) runs its entire map stage — tokenize,
    * explode, decode — on one core no matter how many the session
    * has. When the scan has fewer files than a quarter of the
    * session's cores, hash-repartition on `key` so the map stage
    * parallelizes; at production scale (thousands of files) the guard
    * is false and the plan is untouched — no shuffle is ever added to
    * a scan that is already wide. Values are unaffected either way
    * (hash partitioning is deterministic on `key`). Only worth it
    * when the map stage is genuinely CPU-heavy (image decode): for a
    * cheap map stage the added shuffle costs more than the
    * parallelism returns — measured on t18's tokenize (1.02s→1.41s
    * at sf0.1), which is why the text queries do NOT use this. */
  def spreadSmallScan(df: DataFrame, key: org.apache.spark.sql.Column): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (df.inputFiles.length * 4 < cores) df.repartition(cores, key) else df
  }

  /** events with `ts` as a microsecond TimestampType. The testdata
    * generator has shipped `ts` as INT64 nanos (read raw via the
    * nanosAsLong conf) and, newer, as native timestamp[us] (read as
    * TIMESTAMP_NTZ); both normalise to the same µs TimestampType —
    * NTZ→TZ cast is the identity under the UTC session timezone — so
    * downstream arithmetic matches the oracle's `epoch_us` exactly
    * regardless of which generation wrote the file. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
}
