package graft

import org.apache.spark.sql.functions._

/** Scratch A/B timing for the r18 optimization pass (not part of the
  * driver contract): decomposes closedByCorpus-over-the-frozen-index
  * into its pieces and times each, both join directions. */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cores = cpus, appName = "graft-optprobe")
    spark.sparkContext.setLogLevel("ERROR")
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]

    def time(name: String, reps: Int = 3)(f: => Long): Unit = {
      (1 to reps).foreach { i =>
        val c0 = osBean.getProcessCpuTime
        val t0 = System.nanoTime()
        val n = f
        val w = (System.nanoTime() - t0) / 1e9
        val c = (osBean.getProcessCpuTime - c0) / 1e9
        println(f"[optprobe] $name%-38s pass$i wall=$w%6.2fs cpu=$c%7.2fs rows=$n")
      }
    }

    Bench.prepareFixture(spark, dir, "g04_frozen_probe")
    val li = graft.sources.Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_partkey")
    def probe() = graft.operators.Graph.orderPairs(
        li.filter(col("l_orderkey") % 10 >= 8))
      .join(graft.sources.GraphIndexStore.edges(spark, "bench_graph"),
        Seq("x", "y"), "left_anti")
    val corpus = graft.sources.GraphIndexStore.edges(spark, "bench_graph")
    def inc() = corpus.select(col("x").as("u"), col("y").as("w"))
      .unionAll(corpus.select(col("y").as("u"), col("x").as("w")))

    time("probe alone (anti-joined)")(probe().count())
    time("inc scan alone")(inc().count())
    // r19: probe-SIDE strategy A/B over the CACHED adjacency (the
    // adj aggregate is materialized once up front so every variant
    // measures join shape, not cache build — the shipped operator
    // caches it identically)
    val adj = graft.operators.OpCache.cached(inc().groupBy("u")
      .agg(sort_array(collect_list(col("w"))).as("nbrs")))
    adj.count() // warm the cache outside every variant's timing
    def closure(p: org.apache.spark.sql.DataFrame) = p
      .join(adj.select(col("u").as("x"), col("nbrs").as("na")), "x")
      .join(adj.select(col("u").as("y"), col("nbrs").as("nb")), "y")
      .select(col("x"), col("y"),
        explode(array_intersect(col("na"), col("nb"))).as("w"))
    time("adjX: broadcast(probe)")(closure(broadcast(probe())).count())
    time("adjX: repartition(probe,x)")(
      closure(probe().repartition(col("x"))).count())
    time("adjX: hint-free")(closure(probe()).count())
    graft.operators.OpCache.release(spark)
    // the r18 shipped shape (uncached adj, probe broadcast) for the
    // same-session reference
    def adjU() = inc().groupBy("u")
      .agg(sort_array(collect_list(col("w"))).as("nbrs"))
    def closureU(p: org.apache.spark.sql.DataFrame) = p
      .join(adjU().select(col("u").as("x"), col("nbrs").as("na")), "x")
      .join(adjU().select(col("u").as("y"), col("nbrs").as("nb")), "y")
      .select(col("x"), col("y"),
        explode(array_intersect(col("na"), col("nb"))).as("w"))
    time("adjX uncached: broadcast(probe)")(
      closureU(broadcast(probe())).count())
    time("adjX uncached: repartition(probe,x)")(
      closureU(probe().repartition(col("x"))).count())
    time("adjX uncached: hint-free")(closureU(probe()).count())
    spark.stop()
  }
}
