package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Small-file compaction and multi-dimensional clustering for the
  * curated-output layout.
  *
  * A streaming ingest or a many-task write leaves thousands of small
  * files per table; at 100 TB that is a driver-side listing problem
  * and a per-task overhead problem (a 1000-executor scan of 4 KB
  * files is scheduler-bound, not I/O-bound). `compact` rewrites a
  * table into ~target-sized, globally range-sorted files:
  * `repartitionByRange` gives every file a non-overlapping key range
  * (so later key filters skip whole files via parquet min/max before
  * reading any data page), and `maxRecordsPerFile` hard-caps file
  * size without a second shuffle.
  *
  * `zorderKey` extends the same idea to TWO filter dimensions:
  * interleaving the bits of both keys (Morton order) makes file
  * ranges compact in BOTH dimensions at once, so filters on either
  * column — not just the leading sort key — prune files. This is the
  * standard lakehouse clustering trick (Delta/Iceberg `ZORDER BY`),
  * here as pure Column bit algebra, codegen'd, no UDF.
  */
object Compaction {

  /** Rewrite `df` as ~`targetRecordsPerFile`-sized parquet files,
    * globally range-partitioned and internally sorted on `sortCols`.
    * Returns the planned file count. The `count()` pre-pass costs one
    * extra scan — a maintenance job amortizes it; pass `expectedRows`
    * to skip it when the caller already knows the cardinality. */
  def compact(df: DataFrame, outPath: String, sortCols: Seq[String],
              targetRecordsPerFile: Long,
              expectedRows: Long = -1L): Long = {
    val n = if (expectedRows >= 0) expectedRows else df.count()
    val nFiles = math.max(1L, (n + targetRecordsPerFile - 1) / targetRecordsPerFile)
    require(nFiles <= Int.MaxValue,
      s"$nFiles planned files exceeds the partition-count range; raise targetRecordsPerFile")
    df.repartitionByRange(nFiles.toInt, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", targetRecordsPerFile)
      .parquet(outPath)
    nFiles
  }

  /** Spread the low 32 bits of a non-negative int64 into the even
    * bit positions (classic Morton magic-mask sequence). */
  private def spread(c: Column): Column = {
    val x0 = c.bitwiseAND(lit(0xffffffffL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 16)).bitwiseAND(lit(0x0000ffff0000ffffL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 8)).bitwiseAND(lit(0x00ff00ff00ff00ffL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 4)).bitwiseAND(lit(0x0f0f0f0f0f0f0f0fL))
    val x4 = x3.bitwiseOR(shiftleft(x3, 2)).bitwiseAND(lit(0x3333333333333333L))
    x4.bitwiseOR(shiftleft(x4, 1)).bitwiseAND(lit(0x5555555555555555L))
  }

  /** Morton (z-order) key of two non-negative int columns: bits of
    * `a` land in even positions, bits of `b` in odd ones. Sorting by
    * this key keeps file bounding boxes compact in both dimensions. */
  def zorderKey(a: Column, b: Column): Column =
    spread(a).bitwiseOR(shiftleft(spread(b), 1))

  /** Compact with two-dimensional z-order clustering on (a, b). The
    * clustering key is kept in the output as `_zkey` (it doubles as
    * the range-filter handle for later reads). */
  def compactZOrdered(df: DataFrame, outPath: String, a: String, b: String,
                      targetRecordsPerFile: Long,
                      expectedRows: Long = -1L): Long =
    compact(df.withColumn("_zkey", zorderKey(col(a), col(b))),
      outPath, Seq("_zkey"), targetRecordsPerFile, expectedRows)
}
