package graft

/** Ad-hoc per-query timing: N passes of each named query with a
  * cache clear between passes (not part of the driver contract).
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.Probe q01_... d02_...
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "3").toInt
    val clear = sys.env.getOrElse("SPARK_GRAFT_CLEAR", "1") == "1"
    val spark = GraftSession.local(cores = cpus, appName = "graft-probe")
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      if (name.startsWith("m") && !name.startsWith("mm"))
        graft.operators.MaillogOps.materializeCorpus(spark, sfDir)
      val fn = SparkEntry.queries(name)
      (1 to passes).foreach { p =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        println(f"[probe] $name pass $p: ${(System.nanoTime() - t0) / 1e9}%6.2fs  rows=$n" +
          f"  storage=${spark.sparkContext.getRDDStorageInfo.length}")
        if (clear) spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
