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
    // A: probe broadcast (current shape)
    def wedgesA() = broadcast(probe()).join(inc(), col("x") === col("u"))
      .select(col("x"), col("y"), col("w"))
    time("wedges: broadcast(probe) x inc")(wedgesA().count())
    // B: hint-free (the old shape — Catalyst picks)
    def wedgesB() = probe().join(inc(), col("x") === col("u"))
      .select(col("x"), col("y"), col("w"))
    time("wedges: hint-free")(wedgesB().count())
    // C: probe repartitioned by x, hint-free
    def wedgesC() = probe().repartition(col("x"))
      .join(inc(), col("x") === col("u"))
      .select(col("x"), col("y"), col("w"))
    time("wedges: repartition(probe) hint-free")(wedgesC().count())
    // full closure, both shapes
    def semi(w: org.apache.spark.sql.DataFrame) =
      w.join(corpus.select(col("x").as("ox"), col("y").as("oy")),
        least(col("y"), col("w")) === col("ox") &&
          greatest(col("y"), col("w")) === col("oy"), "left_semi")
    time("closure: broadcast(probe)")(semi(wedgesA()).count())
    time("closure: hint-free")(semi(wedgesB()).count())
    time("closure: repartition hint-free")(semi(wedgesC()).count())
    // D: adjacency-intersection (the g01 triangle shape): corpus
    // neighbor arrays once, then per probe edge adj(x) ∩ adj(y)
    def closureD() = {
      val adj = inc().groupBy("u")
        .agg(sort_array(collect_list(col("w"))).as("nbrs"))
      probe()
        .join(adj.select(col("u").as("x"), col("nbrs").as("na")), "x")
        .join(adj.select(col("u").as("y"), col("nbrs").as("nb")), "y")
        .select(col("x"), col("y"),
          explode(array_intersect(col("na"), col("nb"))).as("w"))
    }
    time("closure: adjacency intersect")(closureD().count())
    // E: same but the probe side broadcast through both joins
    def closureE() = {
      val adj = inc().groupBy("u")
        .agg(sort_array(collect_list(col("w"))).as("nbrs"))
      broadcast(broadcast(probe())
          .join(adj.select(col("u").as("x"), col("nbrs").as("na")), "x"))
        .join(adj.select(col("u").as("y"), col("nbrs").as("nb")), "y")
        .select(col("x"), col("y"),
          explode(array_intersect(col("na"), col("nb"))).as("w"))
    }
    time("closure: adjacency bcast-probe")(closureE().count())
    spark.stop()
  }
}
