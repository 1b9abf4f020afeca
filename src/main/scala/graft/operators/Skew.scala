package graft.operators

import graft.functions.Fns.dec2
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** q37: the salted fact⋈dim join under the full-oracle gate —
    * salting is RESULT-INVARIANT (the salt widens the join key on
    * both sides identically and is dropped before the aggregate), so
    * the oracle is the plain unsalted SQL join. lineitem is the hot
    * side (its salt spreads every suppkey over 8 reducers); supplier
    * is replicated 8×, which stays broadcast-sized — the replication
    * factor multiplies the DIM side only, never the fact table.
    * Decimal→double handling mirrors q03 so the per-nation revenue
    * is bit-identical across engines. */
  def q37SaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_suppkey").as("suppkey"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"))
    val sup = Tables.supplier(spark, dir)
      .select(col("s_suppkey").as("suppkey"), col("s_nationkey"))
    val revenue = dec2(col("l_extendedprice")) *
      (lit(1).cast("decimal(18,2)") - dec2(col("l_discount")))
    saltedJoin(li, sup, "suppkey", buckets = 8)
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n_lines"),
        sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(revenue).cast("double").as("revenue"))
      .orderBy("s_nationkey")
  }

  val oracles: Map[String, String] = Map(
    "q37_salted_join" ->
      """SELECT s_nationkey, COUNT(*) AS n_lines,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin)
}
