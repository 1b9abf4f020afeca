package graft

import graft.operators.Graph
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HUB-SKEW stress for the adjacency-intersection closure (VERDICT
  * r18 #5 / ADVICE r18 hub-width): [[Graph.closedByCorpus]]'s adj
  * arrays carry each node's FULL undirected corpus degree — no g01
  * orientation cap, closure needs all common neighbors — so a
  * power-law hub concentrates one row of its whole neighborhood.
  * This probe replicates the frozen corpus slice N× (the Stress
  * shape), injects a SYNTHETIC HUB adjacent to half the corpus's
  * nodes, sends the fixed base arrival batch plus a slice of
  * hub-touching arrivals, and reads out:
  *   - closure wall + per-arrival cost over the hub-free corpus
  *     (the Stress baseline shape);
  *   - the same with the hub present and arrivals touching it —
  *     the "does the hub row dominate" measurement;
  *   - the hub row's array width (the 2 GiB-array / row-width
  *     headroom check);
  *   - row-equality against the wedge+semi-join REFERENCE spelling
  *     on both corpora, so the intersection path cannot silently
  *     drop or duplicate closures under skew.
  * Not part of the driver contract.
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.HubProbe [mult]
  */
object HubProbe {

  /** The pre-r18 wedge-then-semi-join spelling, kept here as the
    * row-equality reference: wedge (x, y, w) from x's incidence,
    * closed iff the (y, w) edge exists canonically in the corpus. */
  private def wedgeRef(probe: DataFrame, corpus: DataFrame): DataFrame = {
    val inc = corpus.select(col("x").as("u"), col("y").as("w"))
      .unionAll(corpus.select(col("y").as("u"), col("x").as("w")))
    probe
      .join(inc.withColumnRenamed("u", "x"), "x")
      .join(corpus.select(col("x").as("cx"), col("y").as("cy")),
        least(col("y"), col("w")) === col("cx") &&
          greatest(col("y"), col("w")) === col("cy"),
        "left_semi")
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = args.headOption.map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cores = cpus, appName = "graft-hubprobe")
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](name: String)(f: => A): Double = {
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[hub] $name%-36s $s%8.2fs")
      s
    }

    val lib = Tables.lineitem(spark, dir).select("l_orderkey", "l_partkey")
    require(lib.agg(max("l_partkey")).head.getLong(0) < 10000000L,
      "part id exceeds the replication stride")
    val lirep = (0 until mult).map { k =>
      lib.select((col("l_orderkey") + lit(k * 100000000L)).as("l_orderkey"),
        (col("l_partkey") + lit(k * 10000000L)).as("l_partkey"))
    }.reduce(_ union _)

    // the replicated frozen corpus + the FIXED base arrival batch —
    // exactly Stress's corpus-closing section
    val corpusRep = Graph.orderPairs(
      lirep.filter(col("l_orderkey") % 10 < 8)).persist()
    val nEdges = corpusRep.count()
    val incBase = Graph.orderPairs(lib.filter(col("l_orderkey") % 10 >= 8))
      .join(corpusRep, Seq("x", "y"), "left_anti").persist()
    val nArr = incBase.count()

    // warm pass, then the hub-free baseline
    graft.operators.Graph.closedByCorpus(incBase, corpusRep).count()
    var nClosedBase = 0L
    val tBase = time("closure, hub-free corpus") {
      nClosedBase = Graph.closedByCorpus(incBase, corpusRep).count()
    }
    graft.operators.OpCache.release(spark)

    // SYNTHETIC HUBS at two degrees: one fresh node H adjacent to
    // every `stride`-th corpus node. H is above every replica id, so
    // (u, H) is canonical and cannot collide with a replicated edge.
    // Two hub sizes separate the marginal hub-arrival cost's
    // dependence on HUB DEGREE (the hazard: pre-mitigation each
    // hub-touching arrival copied and scanned the hub's whole array)
    // from the fixed cost of hubby-mode routing.
    val hubId = (mult.toLong + 1L) * 10000000L
    val nodes = corpusRep.select(col("x").as("u"))
      .unionAll(corpusRep.select(col("y").as("u"))).distinct().persist()
    val nNodes = nodes.count()

    // arrivals that TOUCH the hub: every 97th odd node gains an edge
    // to H — absent from every hub corpus by parity, so the
    // closedByCorpus anti-join precondition holds
    val hubArr = nodes.filter(col("u") % 2 === 1 && col("u") % 97 === 1)
      .select(col("u").as("x"), lit(hubId).as("y"))
    val incHub = incBase.unionByName(hubArr).persist()
    val nArrHub = incHub.count()

    def hubRun(evenStride: Long, label: String): (Long, Long, Double, Double) = {
      val hubEdges = nodes.filter(col("u") % 2 === 0 &&
          col("u") % evenStride === 0)
        .select(col("u").as("x"), lit(hubId).as("y"))
      val corpusHub = corpusRep.unionByName(hubEdges).persist()
      val hubDeg = corpusHub.count() - nEdges
      Graph.closedByCorpus(incBase, corpusHub).count() // warm
      val tFixed = time(s"closure, $label hub, base arrivals")(
        Graph.closedByCorpus(incBase, corpusHub).count())
      var nClosedHub = 0L
      Graph.closedByCorpus(incHub, corpusHub).count() // warm
      val tHub = time(s"closure, $label hub + hub arrivals") {
        nClosedHub = Graph.closedByCorpus(incHub, corpusHub).count()
      }
      val ref = wedgeRef(incHub, corpusHub).count()
      require(ref == nClosedHub,
        s"$label hub closure diverged from the wedge reference: $nClosedHub vs $ref")
      graft.operators.OpCache.release(spark)
      corpusHub.unpersist()
      (hubDeg, nClosedHub, tFixed, tHub)
    }
    val (deg10, closed10, fixed10, hub10) = hubRun(20L, "10K-degree")
    val (deg100, closed100, fixed100, hub100) = hubRun(2L, "100K-degree")

    // row-equality vs the wedge reference on the hub-free corpus too
    val refBase = wedgeRef(incBase, corpusRep).count()
    require(refBase == nClosedBase,
      s"hub-free closure diverged from the wedge reference: $nClosedBase vs $refBase")

    val nHubArr = nArrHub - nArr
    println(s"""{"metric":"hub_probe","mult":$mult,"edges":$nEdges,"nodes":$nNodes,"arrivals":$nArr,"hub_arrivals":$nHubArr,"closed_base":$nClosedBase,"wall_base":${f"$tBase%.3f"},"hubs":[{"degree":$deg10,"closed":$closed10,"wall_fixed":${f"$fixed10%.3f"},"wall_hub_arrivals":${f"$hub10%.3f"},"marginal_ms_per_hub_arrival":${f"${(hub10 - fixed10) * 1000 / nHubArr}%.4f"}},{"degree":$deg100,"closed":$closed100,"wall_fixed":${f"$fixed100%.3f"},"wall_hub_arrivals":${f"$hub100%.3f"},"marginal_ms_per_hub_arrival":${f"${(hub100 - fixed100) * 1000 / nHubArr}%.4f"}}],"sf":"$dir"}""")
    spark.stop()
  }
}
