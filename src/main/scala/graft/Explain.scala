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
      // land the entry's fixture first — THE bench recipe, shared
      // (Explain used to carry a drifting copy of two of the blocks
      // and threw on the other fixture-dependent entries)
      Bench.prepareFixture(spark, sfDir, name)
      Bench.benchOnly.getOrElse(name, SparkEntry.queries(name))(spark, sfDir)
        .explain("formatted")
    }
    spark.stop()
  }
}
