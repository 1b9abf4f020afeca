package graft.operators

import graft.functions.Fns._
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core analytic operators over the star schema.
  *
  * Each query is a declarative DataFrame plan — Catalyst handles
  * pushdown/pruning/join selection; dimension joins are explicitly
  * broadcast. The trailing `orderBy` on a unique key set exists only
  * for the driver's deterministic oracle compare; a production caller
  * at scale would drop it.
  */
object Analytics {

  /** q01: grouped aggregation with exact decimal measures
    * (TPC-H Q1 shape; one shuffle, map-side partial aggregation). */
  def q01PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val discPrice = dec2(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec2(col("l_discount")))
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(discPrice).cast("double").as("sum_disc_price"),
        sum(discPrice.cast("decimal(18,4)") * (lit(1).cast("decimal(18,2)") + dec2(col("l_tax"))))
          .cast("double").as("sum_charge"),
        count(lit(1)).as("count_order"),
        countDistinct(col("l_orderkey")).as("n_orders"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** q02: top-k per group via ranking window (single shuffle on the
    * grouping key; no global sort until the final driver-compare). */
  def q02TopkPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    o.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_orderpriority", "rn", "o_orderkey", "o_totalprice")
      .orderBy("o_orderpriority", "rn")
  }

  /** q03: revenue by nation — fact-fact shuffle join with broadcast
    * dimensions (nation broadcast; AQE handles skew at scale). */
  def q03JoinRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val revenue = dec2(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec2(col("l_discount")))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(sum(revenue).cast("double").as("revenue"),
           count(lit(1)).as("n_lines"))
      .orderBy("n_name")
  }

  /** q04: selective filter + narrow projection — exercises parquet
    * predicate pushdown and column pruning (verify via explain). */
  def q04FilterPushdown(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R" &&
              col("l_quantity") >= 45 &&
              col("l_shipdate") >= lit("1997-01-01").cast("timestamp"))
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")

  /** q05: multi-distinct aggregation (expand + two-phase agg). */
  def q05DistinctAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .groupBy("c_nationkey")
      .agg(
        count(lit(1)).as("n_cust"),
        countDistinct(col("c_mktsegment")).as("n_segments"),
        dsum(col("c_acctbal")).as("sum_bal"))
      .orderBy("c_nationkey")

  /** q06: ROLLUP hierarchy (region → nation → total). NULL grouping
    * slots are coalesced to 'ALL' so every output row has a unique
    * natural key in both engines. */
  def q06Rollup(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("sum_bal"))
      .select(
        coalesce(col("r_name"), lit("ALL")).as("region"),
        coalesce(col("n_name"), lit("ALL")).as("nation"),
        col("n_cust"), col("sum_bal"))
      .orderBy("region", "nation")
  }

  /** q07: running/offset/rank window analytics per customer. */
  def q07WindowRunning(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val seq = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val run = seq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val byPrice = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    o.select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        sum(dec2(col("o_totalprice"))).over(run).cast("double").as("running_total"),
        lag(col("o_totalprice"), 1).over(seq).as("prev_price"),
        row_number().over(byPrice).as("price_rank"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** q08: left-semi (EXISTS) and left-anti (NOT EXISTS) per nation,
    * combined via a tagged union. */
  def q08SemiAnti(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    val fOrders = o.filter(col("o_orderstatus") === "F").select("o_custkey")
    val withF = c.join(fOrders, c("c_custkey") === fOrders("o_custkey"), "left_semi")
      .groupBy("c_nationkey").agg(count(lit(1)).as("n_cust"))
      .withColumn("bucket", lit("has_f_order"))
    val noOrders = c.join(o.select("o_custkey"), c("c_custkey") === o("o_custkey"), "left_anti")
      .groupBy("c_nationkey").agg(count(lit(1)).as("n_cust"))
      .withColumn("bucket", lit("no_orders"))
    withF.unionByName(noOrders)
      .select("bucket", "c_nationkey", "n_cust")
      .orderBy("bucket", "c_nationkey")
  }

  /** THE 30-minute-gap session-id assignment — the single definition
    * behind q09, the q27 funnel, and (semantically) the streaming
    * sessionizer: adds `sess_id` per user via one partitioned lag +
    * running sum. Shared so the funnel can never disagree with the
    * sessionization it rolls up. */
  private[operators] def sessionIds(ev: DataFrame): DataFrame = {
    val seq = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapUs = 30L * 60 * 1000000
    ev.withColumn("prev_ts", lag(col("ts"), 1).over(seq))
      .withColumn("new_s",
        when(col("prev_ts").isNull ||
             unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapUs, 1)
          .otherwise(0))
      .withColumn("sess_id",
        sum(col("new_s")).over(seq.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** q09: sessionization — 30-minute inactivity gap splits sessions;
    * one shuffle on user_id, two stacked windows, then a grouped agg. */
  def q09Sessionize(spark: SparkSession, dir: String): DataFrame = {
    val flagged = sessionIds(Tables.events(spark, dir))
    flagged.groupBy("user_id", "sess_id")
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_types"),
        secondsBetween(max(col("ts")), min(col("ts"))).as("dur_s"))
      .orderBy("user_id", "sess_id")
  }

  /** q10: pivot via conditional aggregation (single shuffle; avoids
    * the two-pass distinct-scan of the generic pivot operator). */
  def q10Pivot(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    def cnt(t: String) = sum(when(col("event_type") === t, 1).otherwise(0)).as(s"n_$t")
    ev.groupBy("user_id")
      .agg(cnt("view"), cnt("click"), cnt("purchase"), cnt("signup"), cnt("error"),
           dsum(col("value")).as("sum_value"))
      .orderBy("user_id")
  }

  /** q11: as-of join — each purchase matched to the user's latest
    * strictly-earlier view, via [[AsOf.asofJoin]] (union+window; one
    * shuffle, no range-join explosion). */
  def q11AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val views = ev.filter(col("event_type") === "view")
      .select("event_id", "user_id", "ts")
    AsOf.asofJoin(purchases, views, Seq("user_id"), "ts", "event_id", Seq("ts"))
      .select(
        col("event_id"), col("user_id"),
        col("ts").as("purchase_ts"),
        col("asof_ts").as("last_view_ts"),
        secondsBetween(col("ts"), col("asof_ts")).as("gap_s"))
      .orderBy("event_id")
  }

  /** q12: exact interpolated percentiles per group. */
  def q12Percentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(
        round(expr("percentile(value, 0.5)"), 6).as("p50"),
        round(expr("percentile(value, 0.9)"), 6).as("p90"),
        count(lit(1)).as("n"))
      .orderBy("event_type")

  /** q13: semi-structured extraction — JSON props field → typed
    * column → aggregation (per-row expression, no shuffle until agg). */
  def q13JsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        countDistinct(col("k")).as("n_k"))
      .orderBy("event_type")
}
