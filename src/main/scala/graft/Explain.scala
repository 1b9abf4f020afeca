package graft


/** Prints formatted physical plans for the headline queries — used to
  * audit pushdown/pruning/broadcast/codegen before benchmarking. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq else Bench.headline
    val spark = GraftSession.local(cores = 4, appName = "graft-explain")
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      println(s"\n===== $name =====")
      // frozen read-path entries (bench-only) need their fixture
      // shipped first — same fixtures Bench.prepare lands, untimed
      if (name == "t22_hybrid_frozen") {
        graft.sources.Bm25IndexStore.drop(spark, "bench_hybrid_text")
        graft.sources.Bm25IndexStore.freeze(
          graft.operators.TextAnalysis.docChunkFrame(spark, sfDir),
          "bench_hybrid_text")
        graft.operators.Similarity.shipIvfpqIndex(spark, sfDir, "bench_hybrid_ann")
      }
      if (name == "g07_rerank_phase") {
        graft.sources.GraphIndexStore.drop(spark, "bench_graph_w")
        graft.sources.GraphIndexStore.freeze(
          graft.operators.Graph.corpusWeightedEdges(spark, sfDir),
          "bench_graph_w")
      }
      Bench.benchOnly.getOrElse(name, SparkEntry.queries(name))(spark, sfDir)
        .explain("formatted")
    }
    spark.stop()
  }
}
