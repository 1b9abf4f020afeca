package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Evidence that runtime skew is handled by AQE's skew-join split —
  * the mechanism SURVEY §4 relies on before the static salting
  * fallback (Skew.saltedJoin, covered by PropertySpec). One key holds
  * ~90% of the fact side; with splitting forced on at test-size
  * thresholds, AQE must mark the join as skew-handled and the answer
  * must match the non-adaptive plan. */
class AqeSkewSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits a pathologically skewed sort-merge join") {
    val pad = "x" * 64
    val hot = Seq.tabulate(40000)(i => (7L, s"$pad$i"))
    val rest = Seq.tabulate(4000)(i => ((i % 40).toLong, s"$pad$i"))
    val big = (hot ++ rest).toDF("k", "payload")
    val dim = (0L until 64L).map(k => (k, s"dim_$k")).toDF("k", "name")

    // the session is shared across suites — save/restore EVERY conf
    // this test touches, or the aggressive thresholds leak into
    // later suites' plan assertions
    val tuned = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force SMJ
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB")
    val prev = tuned.keys.map(k => k -> spark.conf.getOption(k)).toMap
    tuned.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // aggregate over payload too, so pruning can't drop the wide
      // column that makes the hot partition's bytes skewed
      val joined = big.join(dim, "k")
        .groupBy("name").agg(count(col("payload")).as("n"))
      val rows = joined.collect() // materialize so AQE finalizes
      val finalPlan = joined.queryExecution.executedPlan.collectFirst {
        case a: AdaptiveSparkPlanExec => a.executedPlan
      }.getOrElse(joined.queryExecution.executedPlan)
      assert(finalPlan.toString.contains("skew=true"),
        s"AQE must mark the skewed join, plan:\n$finalPlan")
      val expected = (("dim_7", 40000L + 100L) +:
        (0 until 40).filter(_ != 7).map(k => (s"dim_$k", 100L))).toMap
      assert(rows.map(r => r.getString(0) -> r.getLong(1)).toMap == expected)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
