package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join helper: salting.
  *
  * AQE's skew-join split handles most runtime skew; salting is the
  * static fallback for pathological keys (one key holding a double-
  * digit percentage of a 100 TB fact table). The hot side gets a
  * random-but-deterministic salt in [0, buckets); the small side is
  * replicated across all salt values; the join key becomes
  * (key, salt), spreading each hot key over `buckets` reducers.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, salted into `buckets`.
    * `small` is replicated `buckets`× — keep it the dimension side.
    * Deterministic: salt is a hash of the big side's whole row key
    * context, not an RNG. */
  private val BigSidePreserving =
    Set("inner", "left", "leftouter", "leftsemi", "leftanti", "semi", "anti")

  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 buckets: Int, joinType: String = "inner"): DataFrame = {
    require(buckets > 0)
    // the small side is replicated buckets×, so any join type that
    // preserves unmatched small-side rows would emit them per salt
    require(BigSidePreserving(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports big-side-preserving join types only, got $joinType")
    val salted = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col).toSeq: _*), lit(buckets)).cast("int"))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
      .withColumn("__salt", col("__salt").cast("int"))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Top-k hot keys of a column — used to decide what to salt. */
  def hotKeys(df: DataFrame, key: Column, k: Int = 10): DataFrame =
    df.groupBy(key.as("key")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc).limit(k)
}
