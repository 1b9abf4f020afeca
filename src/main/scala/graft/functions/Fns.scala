package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Column-level helpers shared by graft operators.
  *
  * Determinism rules (the DuckDB oracle must reproduce every value
  * bit-for-bit):
  *  - money/measure sums go through DECIMAL(18,2) casts (exact,
  *    order-independent in both engines), surfaced as DOUBLE;
  *  - ratios/averages are a single double division of exact operands;
  *  - every query ends in a total order on a unique key set.
  */
object Fns {

  /** Exact 2-decimal fixed-point view of a double measure. */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact decimal sum of a double measure, surfaced as double. */
  def dsum(c: Column): Column = sum(dec2(c)).cast("double")

  /** Microseconds since epoch of a TimestampType column (exact long). */
  def usecs(c: Column): Column = unix_micros(c)

  /** THE deterministic split hash (Knuth multiplicative, mod 2^32) —
    * the single definition behind every sampling/split/shard decision
    * (q17/q20/d06/d12/p01/p04/p06/p09/writeTrainingShards). One
    * shared helper, not per-file copies: the decontamination list is
    * computed against the SAME split that ships, and an edit here
    * changes all of them together (the oracles hardcode the formula —
    * change BOTH or the gate goes red, which is the point).
    *
    * Range note: for ids beyond ~3.5·10⁹ the multiply wraps mod 2⁶⁴
    * before the pmod — well-defined and perfectly fine AS A HASH in
    * Spark (wrap just permutes the mix), but DuckDB errors on int64
    * overflow rather than wrapping; the oracle only ever evaluates
    * fixture-scale ids, so the gate never reaches that divergence. */
  def splitHash(id: Column): Column =
    pmod(id * 2654435761L, lit(4294967296L))

  /** The 80/10/10 split derived from [[splitHash]]. */
  def splitOf(id: Column): Column =
    when(splitHash(id) % 10 === 0, "test")
      .when(splitHash(id) % 10 === 1, "val")
      .otherwise("train")

  /** Seconds-difference between two µs timestamps as double. */
  def secondsBetween(a: Column, b: Column): Column =
    (unix_micros(a) - unix_micros(b)) / lit(1000000.0)

  /** Exact FLOOR division of an int64 column by a positive constant.
    * CAUTION for oracle parity: DuckDB's `//` TRUNCATES toward zero
    * (measured: -7 // 2 = -3), so this matches `//` only for
    * NONNEGATIVE `a` (d19's bit positions); signed cross-engine
    * division must truncate on both sides instead (s18's rule). The
    * numerator `a - pmod(a, b)` is exactly divisible by `b`, so the
    * double division is exact while |a| < 2⁵³. */
  def floorDiv(a: Column, b: Long): Column =
    ((a - pmod(a, lit(b))) / lit(b)).cast("long")
}
