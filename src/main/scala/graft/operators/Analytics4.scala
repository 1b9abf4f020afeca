package graft.operators

import graft.functions.Fns._
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fourth batch of core operators: the remaining classic
  * decision-support join/aggregate shapes (TPC-H Q3/Q9/Q10/Q11/Q13/
  * Q14/Q15/Q16/Q17/Q19 silhouettes over this fixture's star schema)
  * — each one a distinct PLAN shape the engine hadn't exercised:
  * count-of-counts off a left join, a correlated per-group average
  * as a pruned aggregate join, global top-k by a computed measure,
  * conditional shares, max-of-aggregate join-back, distinct-count
  * variety with an anti-joined exclusion list, cross-table
  * disjunctive brackets, a two-sided expression aggregate, a
  * global-fraction HAVING, and the unshipped-backlog top-k.
  *
  * Float discipline throughout is the accumulated oracle-parity
  * rule set: money sums as DECIMAL(18,2) (exact, order-free),
  * two-factor products widened to DECIMAL(18,4) BEFORE summing,
  * thresholds cross-multiplied on decimals (never a float divide),
  * doubles only at the output edge, and every reported division is
  * ONE division of double casts of identical exact decimals.
  */
object Analytics4 {

  /** sum-able exact line revenue: price · (1 − discount), both
    * operands DECIMAL(18,2) (the q01 discipline). */
  private def lineRev: Column =
    dec2(col("l_extendedprice")) *
      (lit(1).cast("decimal(18,2)") - dec2(col("l_discount")))

  /** q50: ORDER-COUNT DISTRIBUTION (the TPC-H Q13 shape) — how many
    * customers placed exactly k qualifying orders, INCLUDING the
    * zero bucket (the left join is the point of the shape: customers
    * with no orders must survive to the distribution).
    *
    * Plan shape: aggregate-before-join — orders collapse to
    * (custkey, n) FIRST (map-side combinable), so the left join is
    * key×key on two corpus-scaled but already-reduced frames,
    * hint-free (Catalyst picks; NoBroadcastSpec class). The final
    * count-of-counts groups on the bounded order-count domain.
    * No window, no driver loop. */
  def q50OrderCounts(spark: SparkSession, dir: String): DataFrame = {
    val oc = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
      .groupBy("o_custkey").agg(count(lit(1)).as("n"))
    Tables.customer(spark, dir)
      .join(oc, col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("n"), lit(0L)).cast("long").as("c_count"))
      .groupBy("c_count").agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** q51: SMALL-QUANTITY REVENUE (the TPC-H Q17 shape) — for a
    * bounded brand set, the revenue carried by lineitems whose
    * quantity is under a FIFTH of their part's average quantity: the
    * correlated per-group average re-expressed as an aggregate join.
    *
    * Oracle parity: the average never materializes — the predicate
    * cross-multiplies exactly (5·qty·n < Σqty, quantities as
    * DECIMAL(18,2), n integral), so no float edge can flip a row.
    *
    * Scale shape: the brand filter lands on `part` first and
    * semi-joins the lineitem scan, so only the ~12% of lines that
    * can survive flow on (non-brand parts can't reach the output).
    * The per-part (n, Σqty) then comes from ONE window partitioned
    * on partkey — the classic Q17 aggregate-join form scans the
    * fact table TWICE (once for the per-part aggregate, once for the
    * probe; plan-audited here before the rewrite), and pinning the
    * joined frame instead would cache a corpus-scale slice; the
    * window computes both in a single scan + one hash exchange, with
    * partitions bounded by lines-per-part at any corpus size. */
  def q51SmallQtyRevenue(spark: SparkSession, dir: String): DataFrame =
    q51From(Tables.lineitem(spark, dir), Tables.part(spark, dir))

  private[graft] def q51From(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val brands = Seq("Brand#1", "Brand#2", "Brand#3")
    val bparts = part
      .filter(col("p_brand").isin(brands: _*))
      .select(col("p_partkey"), col("p_brand"))
    val w = Window.partitionBy(col("l_partkey"))
    lineitem.join(bparts, col("l_partkey") === col("p_partkey"))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("sq", sum(dec2(col("l_quantity"))).over(w))
      .filter(dec2(col("l_quantity")) * lit(5) * col("n") < col("sq"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_small"),
        sum(dec2(col("l_extendedprice"))).cast("double").as("rev_small"))
      .orderBy("p_brand")
  }

  /** q52: RETURNED-ITEM REVENUE (the TPC-H Q10 shape) — the top-20
    * customers by revenue lost to returns in a half-year window,
    * labelled with their nation.
    *
    * Scale shape: the returnflag + order-date predicates prune the
    * two fact scans BEFORE any join (pushed to parquet); the
    * customer/nation legs are the q43 broadcast-dimension class; the
    * global top-20 is sort+LIMIT — TakeOrderedAndProject, a per-
    * partition top-20 then a driver merge of 20·partitions rows,
    * never a global sort or an unpartitioned window (PlanShapeSpec's
    * ban). Ties can't reorder engines: the sort key closes with the
    * unique custkey. */
  def q52ReturnedRevenue(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"))
    Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .join(Tables.orders(spark, dir)
          .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-07-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy("c_custkey", "c_name", "n_name")
      .agg(count(lit(1)).as("n_lines"),
        sum(lineRev).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** q53: PROMO REVENUE SHARE (the TPC-H Q14 shape) — per month of
    * 1997, the fraction of revenue carried by promo-type parts: the
    * conditional-aggregate-over-a-join classic.
    *
    * Oracle parity: numerator and denominator are both exact decimal
    * sums (the CASE arm contributes an exact 0 decimal, so the
    * conditional sum stays order-free), and the share is ONE
    * division of their double casts — the q44 two-operand rule.
    * Plan: one hint-free corpus⋈part join, one map-side-combinable
    * groupBy on the bounded month key. */
  def q53PromoShare(spark: SparkSession, dir: String): DataFrame = {
    val promoRev = when(col("p_type") === "PROMO", lineRev)
      .otherwise(lit(0).cast("decimal(18,2)"))
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(Tables.part(spark, dir), col("l_partkey") === col("p_partkey"))
      .groupBy(month(col("l_shipdate")).cast("long").as("mo"))
      .agg(sum(promoRev).as("promo_dec"), sum(lineRev).as("tot_dec"))
      .select(col("mo"),
        col("promo_dec").cast("double").as("promo_rev"),
        col("tot_dec").cast("double").as("total_rev"),
        (col("promo_dec").cast("double") / col("tot_dec").cast("double"))
          .as("promo_share"))
      .orderBy("mo")
  }

  /** q54: TOP SUPPLIER (the TPC-H Q15 shape) — the supplier(s)
    * achieving the maximum quarterly revenue: max-of-aggregate
    * join-back, the one classic where the HAVING references a scalar
    * computed FROM the aggregate itself.
    *
    * Oracle parity: the max and the equality test stay in exact
    * decimals (double only at the output edge), so "equals the max"
    * can't miss by an ulp — the reason Q15's view is notorious with
    * float revenue is exactly what the decimal discipline removes.
    *
    * Scale shape: the per-supplier aggregate is OpCache-pinned for
    * its two consumers (the 1-row max and the filter join-back) —
    * plan-audited like q48: unpinned, both branches re-scan the
    * corpus. The max is a broadcast 1-row cross join; the supplier
    * dimension joins hint-free. */
  def q54TopSupplier(spark: SparkSession, dir: String): DataFrame =
    q54From(Tables.lineitem(spark, dir), Tables.supplier(spark, dir))

  private[graft] def q54From(lineitem: DataFrame, supplier: DataFrame): DataFrame = {
    val rev = OpCache.cached(lineitem
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .groupBy("l_suppkey").agg(sum(lineRev).as("r")))
    val mx = rev.agg(max(col("r")).as("mr"))
    rev.crossJoin(broadcast(mx))
      .filter(col("r") === col("mr"))
      .join(supplier, col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("r").cast("double").as("total_rev"))
      .orderBy("s_suppkey")
  }

  /** q55: PART-SUPPLIER VARIETY (the TPC-H Q16 shape) — distinct
    * supplier counts per (brand, type, size) for small parts,
    * EXCLUDING flagged suppliers (negative account balance stands in
    * for Q16's complaint filter) via a left-anti join on the
    * exclusion list.
    *
    * Scale shape: the (part, supplier) pair domain materializes once
    * (distinct — one shuffle, map-side combinable); the exclusion
    * list is a filtered dimension the anti join broadcasts; the
    * variety count groups on the bounded (brand, type, size) key.
    * The distinct-count is exact (count_distinct over the already-
    * distinct pair frame collapses to a count per group after the
    * part join). */
  def q55PartVariety(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
    val flagged = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    pairs
      .join(broadcast(flagged), col("l_suppkey") === col("s_suppkey"),
        "left_anti")
      .join(Tables.part(spark, dir)
          .filter(col("p_brand") =!= "Brand#1" && col("p_size") <= 25),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(count_distinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  /** q56: BRACKET REVENUE (the TPC-H Q19 shape) — revenue inside
    * three DISJUNCTIVE (brand, size-band, quantity-band) brackets,
    * reported per bracket. Q19's point is the OR-of-conjunctions
    * predicate spanning BOTH join sides: no single-table residual
    * can represent it, so the filter must run post-join — the shape
    * verifies the engine doesn't mis-push a cross-table disjunction.
    *
    * SCAN PRUNING (VERDICT r11 #1 — Catalyst cannot extract
    * single-table prefixes from inside a CASE, so the bare bracket
    * shape joined the FULL fact table to the FULL part table before
    * dropping ~everything): each side is pre-filtered with the UNION
    * of its bracket prefixes — `br IS NOT NULL` implies one bracket's
    * conjunction holds, which implies p_brand ∈ {1,2,3} ∧ p_size ∈
    * [1,50] on the part side and l_quantity ∈ [1,35] on the fact
    * side, so the pre-filters are semantics-preserving and land in
    * PushedFilters on BOTH parquet scans (PlanShapeSpec pins it).
    * The residual cross-table disjunction still runs post-join — the
    * only place it can.
    *
    * Parity: bracket membership compares doubles/ints to integer
    * constants (exact in both engines); revenue is the standard
    * decimal sum. The bracket id is the output key, cast long both
    * sides. */
  def q56BracketRevenue(spark: SparkSession, dir: String): DataFrame = {
    val br = when(col("p_brand") === "Brand#1" &&
        col("p_size").between(1, 10) && col("l_quantity").between(1, 15), 1L)
      .when(col("p_brand") === "Brand#2" &&
        col("p_size").between(11, 25) && col("l_quantity").between(10, 25), 2L)
      .when(col("p_brand") === "Brand#3" &&
        col("p_size").between(26, 50) && col("l_quantity").between(20, 35), 3L)
    Tables.lineitem(spark, dir)
      .filter(col("l_quantity").between(1, 35))
      .join(Tables.part(spark, dir)
          .filter(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3") &&
            col("p_size").between(1, 50)),
        col("l_partkey") === col("p_partkey"))
      .select(br.as("br"), col("l_extendedprice"), col("l_discount"))
      .filter(col("br").isNotNull)
      .groupBy("br")
      .agg(count(lit(1)).as("n_lines"), sum(lineRev).cast("double").as("revenue"))
      .orderBy("br")
  }

  /** q57: PROFIT BY NATION AND YEAR (the TPC-H Q9 shape) — margin
    * (revenue − cost) per supplier nation per ship year, over parts
    * whose name matches a token. No partsupp table in this fixture,
    * so cost is the part's retail price × quantity — the same
    * two-factor product class as Q9's ps_supplycost · l_quantity.
    *
    * Oracle parity: BOTH products widen to DECIMAL(18,4) before the
    * subtraction and the sum (the q01 sum_charge discipline — the
    * 2-decimal factors produce exact 4-decimal products), so profit
    * sums are exact and order-free even when negative.
    *
    * Scale shape: the name filter prunes `part` before its corpus
    * join; supplier→nation is the broadcast dimension leg; one
    * map-side-combinable groupBy on the bounded (nation, year) key. */
  def q57Profit(spark: SparkSession, dir: String): DataFrame = {
    val profit = (lineRev.cast("decimal(18,4)") -
      (dec2(col("p_retailprice")) * dec2(col("l_quantity")))
        .cast("decimal(18,4)"))
    val supp = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir).filter(col("p_name").contains("red")),
        col("l_partkey") === col("p_partkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("n_name"), year(col("l_shipdate")).cast("long").as("yr"))
      .agg(count(lit(1)).as("n_lines"), sum(profit).cast("double").as("profit"))
      .orderBy("n_name", "yr")
  }

  /** q58: IMPORTANT PARTS (the TPC-H Q11 shape) — parts whose
    * shipped value through one region's suppliers exceeds a fixed
    * fraction of the region's total: the global-fraction HAVING,
    * where the filter threshold is a scalar aggregate OF the grouped
    * frame itself.
    *
    * Oracle parity: the fraction never divides — `v · 2000 > total`
    * cross-multiplies exact decimals (value is the DECIMAL(18,4)
    * price·quantity product sum), so threshold membership is
    * bit-identical across engines.
    *
    * Scale shape: per-part values aggregate once (map-side
    * combinable); the total re-aggregates THAT frame (never a second
    * corpus pass — the q48 stacked-aggregate rule); the threshold is
    * a broadcast 1-row cross join. The region filter prunes the
    * supplier dimension before its corpus join. */
  def q58ImportantParts(spark: SparkSession, dir: String): DataFrame =
    q58From(Tables.lineitem(spark, dir), Tables.supplier(spark, dir),
      Tables.nation(spark, dir))

  private[graft] def q58From(lineitem: DataFrame, supplier: DataFrame,
                             nation: DataFrame): DataFrame = {
    val supp = supplier
      .join(broadcast(nation.filter(col("n_regionkey") === 2)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val value = (dec2(col("l_extendedprice")) * dec2(col("l_quantity")))
      .cast("decimal(18,4)")
    val vals = OpCache.cached(lineitem
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .groupBy("l_partkey").agg(sum(value).as("v")))
    val tot = vals.agg(sum(col("v")).as("tv"))
    vals.crossJoin(broadcast(tot))
      .filter(col("v") * lit(2000) > col("tv"))
      .select(col("l_partkey").as("p_partkey"),
        col("v").cast("double").as("value"))
      .orderBy("p_partkey")
  }

  /** q59: UNSHIPPED BACKLOG (the TPC-H Q3 shape) — the top-10
    * highest-revenue orders for one market segment that were placed
    * before a date but still have lines shipping after it: the
    * shipping-priority classic.
    *
    * Scale shape: both date predicates and the segment filter prune
    * their scans before the joins (segment via the customer
    * dimension leg); revenue aggregates per order (map-side
    * combinable on orderkey); the global top-10 is sort+LIMIT
    * (TakeOrderedAndProject), tie-closed on the unique orderkey. */
  def q59UnshippedBacklog(spark: SparkSession, dir: String): DataFrame = {
    val cut = lit("1998-01-01").cast("timestamp")
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > cut)
      .join(Tables.orders(spark, dir).filter(col("o_orderdate") < cut),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir)
          .filter(col("c_mktsegment") === "BUILDING"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_orderpriority"))
      .agg(sum(lineRev).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** q60: CHEAPEST SUPPLIER PER PART (the TPC-H Q2 shape adapted —
    * no partsupp table, so "supply cost" is the supplier's average
    * unit sale price for the part): for mid-size parts supplied
    * through one region, the supplier offering the per-part MINIMUM
    * unit price — the correlated `= (SELECT MIN …)` per-group
    * subquery re-expressed as a rank-1 window over the per-pair
    * aggregate, then dimension rehydration. The last of the classic
    * silhouettes (q54 does the GLOBAL max; this is the per-group
    * min with a join-back).
    *
    * Oracle parity: the unit price is never a float — both sums
    * leave their DECIMAL(18,2) aggregates as exact integer CENTS
    * (·100, cast long), and price_micro = (price_cents·10⁶) div
    * qty_cents is one integer floor division, identical in both
    * engines; ties close on suppkey. The ·10⁶ scale bounds
    * price_cents < 2⁴³ (~88 billion dollars per (part, supplier)
    * pair) before the multiply could overflow int64 — beyond that a
    * deployment widens to DECIMAL(38,0) (the mm09 precedent).
    *
    * Scale shape: the region filter prunes the supplier dimension
    * before its corpus join; ONE map-side-combinable groupBy on the
    * (part, supplier) pair key; the rank window partitions on
    * partkey (bounded by suppliers-per-part); the join-backs
    * rehydrate from the two dimensions, hint-free. */
  def q60CheapestSupplier(spark: SparkSession, dir: String): DataFrame = {
    val supp = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
          .filter(col("n_regionkey") === 3)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"))
    val ps = Tables.lineitem(spark, dir)
      .join(supp.select("s_suppkey"), col("l_suppkey") === col("s_suppkey"))
      .groupBy("l_partkey", "l_suppkey")
      .agg((sum(dec2(col("l_extendedprice"))) * 100).cast("long").as("price_cents"),
        (sum(dec2(col("l_quantity"))) * 100).cast("long").as("qty_cents"),
        count(lit(1)).as("n_lines"))
      .withColumn("price_micro", expr("(price_cents * 1000000) div qty_cents"))
    val w = Window.partitionBy(col("l_partkey"))
      .orderBy(col("price_micro"), col("l_suppkey"))
    ps.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .join(Tables.part(spark, dir).filter(col("p_size").between(10, 20)),
        col("l_partkey") === col("p_partkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .select(col("p_partkey"), col("p_brand"),
        col("l_suppkey").as("s_suppkey"), col("s_name"),
        col("price_micro"), col("n_lines"))
      .orderBy("p_partkey")
  }

  private val LineRevSql =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"

  /** q61: LATE-ORDER PRIORITY CHECK (the TPC-H Q4 shape) — per order
    * priority, how many of one quarter's orders had at least one
    * lineitem shipped more than 60 days after the order date: the
    * correlated EXISTS with a CROSS-TABLE INEQUALITY predicate
    * (q08's semi/anti family stops at equi-keys) — the classic probe
    * of whether an engine decorrelates instead of running a
    * per-order subquery.
    *
    * Oracle parity: pure integer counts over exact timestamp
    * comparisons (midnight-aligned whole-day arithmetic in both
    * engines) — no float surface.
    *
    * Scale shape: the quarter filter lands on the orders SCAN
    * (pushed); the fact side is pre-filtered by the DERIVABLE bound
    * l_shipdate > quarter_start + 60d — implied by the join
    * inequality but not extractable by Catalyst (the q56 lesson:
    * hand-push the single-table prefix) — then ONE left-semi hash
    * join on orderkey carries the residual inequality; the final
    * groupBy is over the bounded 5-value priority domain. Never a
    * per-order probe, never a full fact scan surviving to the join. */
  def q61LateOrders(spark: SparkSession, dir: String): DataFrame =
    q61From(Tables.orders(spark, dir), Tables.lineitem(spark, dir))

  /** q61's core over any (orders, lineitem) pair — the replication
    * stress probe reuses it verbatim. */
  private[graft] def q61From(orders: DataFrame,
                             lineitem: DataFrame): DataFrame = {
    val lo = lit("1995-03-01").cast("timestamp")
    val hi = lit("1995-06-01").cast("timestamp")
    val o = orders
      .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
    val l = lineitem
      .select("l_orderkey", "l_shipdate")
      .filter(col("l_shipdate") > lo + expr("INTERVAL 60 DAYS"))
    o.join(l, col("o_orderkey") === col("l_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
      "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")
  }

  /** q62: LATE-SHIPMENT PRIORITY SPLIT (the TPC-H Q12 shape) — per
    * line status, the two-branch conditional count (urgent/high vs
    * the rest) over one year's late-shipped lines: the
    * CASE-inside-SUM pivot device at fact scale (q53's conditional
    * share does revenue; this is Q12's canonical count pair over a
    * join).
    *
    * Oracle parity: pure integer counts; the late predicate is exact
    * midnight-aligned timestamp arithmetic.
    *
    * Scale shape: the year window lands on the lineitem SCAN plus
    * the derived l_shipdate > window_lo + 30d is subsumed by it (the
    * q61 bound discipline — here the window's own lower edge already
    * dominates); orders project to two columns before the join;
    * ONE equi-join with the residual inequality, then a
    * map-side-combinable conditional aggregate over the bounded
    * 2-value status domain. */
  def q62PrioritySplit(spark: SparkSession, dir: String): DataFrame = {
    val lo = lit("1996-01-01").cast("timestamp")
    val hi = lit("1997-01-01").cast("timestamp")
    val urgent = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    val l = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_shipdate", "l_linestatus")
      .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
    // derived single-table bound (the q61 discipline): the join
    // inequality implies o_orderdate < window_hi − 30d — pushed here
    // because Catalyst cannot extract it from the cross-table
    // predicate; prunes ~70% of the orders side pre-join
    val o = Tables.orders(spark, dir)
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
      .filter(col("o_orderdate") < hi - expr("INTERVAL 30 DAYS"))
    l.join(o, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"))
      .groupBy("l_linestatus")
      .agg(sum(when(urgent, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(urgent, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy("l_linestatus")
  }

  val oracles: Map[String, String] = Map(
    "q62_priority_split" ->
      raw"""SELECT l_linestatus,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem l JOIN orders o ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_shipdate > o_orderdate + INTERVAL 30 DAY
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q61_late_orders" ->
      raw"""SELECT o_orderpriority, COUNT(*) AS n_orders
        |FROM orders o
        |WHERE o.o_orderdate >= TIMESTAMP '1995-03-01'
        |  AND o.o_orderdate < TIMESTAMP '1995-06-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |    WHERE l.l_orderkey = o.o_orderkey
        |      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q50_order_counts" ->
      """WITH oc AS (SELECT o_custkey, COUNT(*) AS n FROM orders
        |  WHERE o_orderpriority <> '4-NOT SPECIFIED' GROUP BY 1)
        |SELECT c_count, COUNT(*) AS custdist FROM (
        |  SELECT c_custkey, CAST(COALESCE(n, 0) AS BIGINT) AS c_count
        |  FROM customer LEFT JOIN oc ON c_custkey = o_custkey) t
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q51_small_qty_revenue" ->
      """WITH pq AS (SELECT l_partkey, COUNT(*) AS n,
        |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sq
        |  FROM lineitem GROUP BY 1)
        |SELECT p_brand, COUNT(*) AS n_small,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev_small
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN pq USING (l_partkey)
        |WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
        |  AND CAST(l_quantity AS DECIMAL(18,2)) * 5 * n < sq
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q52_returned_revenue" ->
      s"""SELECT c_custkey, c_name, n_name, COUNT(*) AS n_lines,
        |  CAST(SUM($LineRevSql) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-07-01'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "q53_promo_share" ->
      s"""SELECT CAST(month(l_shipdate) AS BIGINT) AS mo,
        |  CAST(SUM(CASE WHEN p_type = 'PROMO' THEN $LineRevSql
        |               ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS promo_rev,
        |  CAST(SUM($LineRevSql) AS DOUBLE) AS total_rev,
        |  CAST(SUM(CASE WHEN p_type = 'PROMO' THEN $LineRevSql
        |               ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
        |    / CAST(SUM($LineRevSql) AS DOUBLE) AS promo_share
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q54_top_supplier" ->
      s"""WITH rev AS (SELECT l_suppkey, SUM($LineRevSql) AS r
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-04-01'
        |  GROUP BY 1),
        |mx AS (SELECT MAX(r) AS mr FROM rev)
        |SELECT s_suppkey, s_name, CAST(r AS DOUBLE) AS total_rev
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey CROSS JOIN mx
        |WHERE r = mr ORDER BY s_suppkey""".stripMargin,

    "q55_part_variety" ->
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        |SELECT p_brand, p_type, p_size,
        |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM ps
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1' AND p_size <= 25
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "q56_bracket_revenue" ->
      s"""SELECT br, COUNT(*) AS n_lines,
        |  CAST(SUM($LineRevSql) AS DOUBLE) AS revenue
        |FROM (
        |  SELECT CAST(CASE
        |    WHEN p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
        |      AND l_quantity BETWEEN 1 AND 15 THEN 1
        |    WHEN p_brand = 'Brand#2' AND p_size BETWEEN 11 AND 25
        |      AND l_quantity BETWEEN 10 AND 25 THEN 2
        |    WHEN p_brand = 'Brand#3' AND p_size BETWEEN 26 AND 50
        |      AND l_quantity BETWEEN 20 AND 35 THEN 3
        |    END AS BIGINT) AS br, l_extendedprice, l_discount
        |  FROM lineitem JOIN part ON l_partkey = p_partkey) t
        |WHERE br IS NOT NULL
        |GROUP BY br ORDER BY br""".stripMargin,

    "q57_profit" ->
      s"""SELECT n_name, CAST(year(l_shipdate) AS BIGINT) AS yr,
        |  COUNT(*) AS n_lines,
        |  CAST(SUM(CAST($LineRevSql AS DECIMAL(18,4))
        |    - CAST(CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(18,4))) AS DOUBLE) AS profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q58_important_parts" ->
      """WITH val AS (SELECT l_partkey,
        |    SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(18,4))) AS v
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_regionkey = 2
        |  GROUP BY 1),
        |tot AS (SELECT SUM(v) AS tv FROM val)
        |SELECT l_partkey AS p_partkey, CAST(v AS DOUBLE) AS value
        |FROM val CROSS JOIN tot
        |WHERE v * 2000 > tv
        |ORDER BY p_partkey""".stripMargin,

    "q60_cheapest_supplier" ->
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS price_cents,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) AS qty_cents,
        |    COUNT(*) AS n_lines
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_regionkey = 3
        |  GROUP BY 1, 2),
        |pm AS (SELECT l_partkey, l_suppkey, n_lines,
        |    (price_cents * 1000000) // qty_cents AS price_micro,
        |    row_number() OVER (PARTITION BY l_partkey
        |      ORDER BY (price_cents * 1000000) // qty_cents, l_suppkey) AS rn
        |  FROM ps)
        |SELECT p_partkey, p_brand, l_suppkey AS s_suppkey, s_name,
        |  price_micro, n_lines
        |FROM pm
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE rn = 1 AND p_size BETWEEN 10 AND 20
        |ORDER BY p_partkey""".stripMargin,

    "q59_unshipped_backlog" ->
      s"""SELECT l_orderkey,
        |  strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS o_orderdate,
        |  o_orderpriority,
        |  CAST(SUM($LineRevSql) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin)
}
