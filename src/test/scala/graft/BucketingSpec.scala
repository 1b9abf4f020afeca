package graft

import graft.sources.{Bucketing, Tables}
import org.apache.spark.sql.functions._

/** Proves the bucketed layout delivers exchange-free plans: the
  * whole point of the write path is that repeat joins/aggregations
  * on the bucket key skip the shuffle. */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join and aggregate without a shuffle exchange") {
    val orders = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
    val lineitem = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    Bucketing.writeBucketed(orders, "b_orders", "o_orderkey", 4)
    Bucketing.writeBucketed(
      lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem", "o_orderkey", 4)

    val bo = Bucketing.readBucketed(spark, "b_orders")
    val bl = Bucketing.readBucketed(spark, "b_lineitem")

    // force the sort-merge path so an exchange (if any) must show up
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = bo.join(bl, "o_orderkey")
        .groupBy("o_orderkey")
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("qty"),
             first("o_totalprice").as("price"))
      val physical = joined.queryExecution.executedPlan.toString
      assert(!physical.contains("Exchange"),
        s"bucketed join+agg must not shuffle:\n$physical")

      // and the answer matches the plain-parquet plan
      val expected = orders.join(
          lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey")
        .groupBy("o_orderkey")
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("qty"),
             first("o_totalprice").as("price"))
      assert(joined.orderBy("o_orderkey").collect().toSeq ===
        expected.orderBy("o_orderkey").collect().toSeq)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("partitioned layout prunes directories at planning time") {
    val dir = java.nio.file.Files.createTempDirectory("part").toString
    val docs = Tables.documents(spark, sf)
    Bucketing.writePartitioned(docs, dir, "source")

    val filtered = Bucketing.readPartitioned(spark, dir)
      .filter(col("source") === "src3")
    val scan = filtered.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.metadata("PartitionFilters").contains("src3"),
      "source predicate must reach PartitionFilters, not PushedFilters")
    assert(scan.selectedPartitions.partitionCount == 1,
      s"exactly one of ${docs.select("source").distinct().count()} " +
        "directories may be read")

    val expected = docs.filter(col("source") === "src3")
      .select("doc_id").orderBy("doc_id").collect().toSeq
    assert(filtered.select("doc_id").orderBy("doc_id").collect().toSeq
      === expected)
  }
}
