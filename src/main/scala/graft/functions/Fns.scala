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

  /** Seconds-difference between two µs timestamps as double. */
  def secondsBetween(a: Column, b: Column): Column =
    (unix_micros(a) - unix_micros(b)) / lit(1000000.0)
}
