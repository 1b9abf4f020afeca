package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic as-of join (a.k.a. point-in-time join).
  *
  * For each left row, attaches the payload of the latest right row
  * with the same key whose (time, tieBreak) is strictly before the
  * left row's (time, tieBreak).
  *
  * Implementation is the union+window trick rather than a range join:
  * tag both sides, union, and run one `last_value(..., ignoreNulls)`
  * window per key ordered by (time, tieBreak). This costs exactly one
  * shuffle on the key and never materialises the O(left × right)
  * candidate space a range-join would — the property that matters at
  * 100 TB. Requires `tieBreak` to be unique across the union (any
  * globally-unique id column works).
  */
object AsOf {

  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      timeCol: String,
      tieBreak: String,
      rightPayload: Seq[String],
      prefix: String = "asof_"): DataFrame = {

    val leftCols = left.columns
    val payloadOut = rightPayload.map(c => prefix + c)

    // the payload travels as ONE struct, filled atomically: a
    // per-column last(ignoreNulls) would compose a row that never
    // existed (each column independently reaching back to its own
    // latest non-null — and a NULL field of the true latest row
    // replaced by a stale older value)
    val payloadStruct = org.apache.spark.sql.types.StructType(
      rightPayload.map(c => right.schema(c)))
    val taggedLeft = left.withColumn("__side", lit(1))
      .withColumn("__asof", lit(null).cast(payloadStruct))
    val base = keys :+ timeCol :+ tieBreak
    val taggedRight = {
      val r0 = right.select((base ++ rightPayload).distinct.map(col): _*)
        .withColumn("__asof", struct(rightPayload.map(col): _*))
        .select((base.distinct :+ "__asof").map(col): _*)
      // left-only columns become typed nulls so the union lines up
      leftCols.filterNot(base.contains).foldLeft(r0.withColumn("__side", lit(0))) {
        case (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }
    }

    val unioned = taggedLeft.unionByName(taggedRight)
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol), col(tieBreak))
      .rowsBetween(Window.unboundedPreceding, -1)

    val filled = unioned.withColumn("__asof",
      last(col("__asof"), ignoreNulls = true).over(w))
    val unpacked = payloadOut.zip(rightPayload).foldLeft(filled) {
      case (df, (out, c)) => df.withColumn(out, col("__asof").getField(c))
    }
    unpacked.filter(col("__side") === 1).drop("__side", "__asof")
  }

  /** Convenience overload keeping all right columns as payload. */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               timeCol: String, tieBreak: String): DataFrame =
    asofJoin(left, right, keys, timeCol, tieBreak,
      right.columns.filterNot((keys :+ timeCol :+ tieBreak).contains).toSeq)
}
