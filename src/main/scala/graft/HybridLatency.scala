package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The HYBRID serving path's latency ops card (the [[Bm25Latency]] /
  * [[DaemonLatency]] sibling, round 14): arrival→fused-answer wall
  * time for a continuous [[graft.streaming.HybridStream]] at a
  * ProcessingTime trigger — the number a hybrid-search deployment
  * provisions against, covering BOTH frozen index reads (term-pushed
  * posting scans; IVFPQ route+ADC+rerank) plus the fusion and the
  * sink commit. Both indexes freeze once, untimed (the amortized
  * build). Wave 0 is the COLD number (stream boot + first codegen of
  * the widest plan in the library).
  *
  * Not part of the driver contract; a measurement main like
  * [[Probe]]/[[Stress]]. Prints ONE JSON line.
  *
  * Usage: runMain graft.HybridLatency [waves] [triggerSec]
  */
object HybridLatency {

  def main(args: Array[String]): Unit = {
    val waves = args.headOption.map(_.toInt).getOrElse(8)
    require(waves >= 1,
      "need at least one timed wave beyond the cold wave 0 — the " +
        "quantiles are over the steady-state waves only")
    val trigSec = args.drop(1).headOption.map(_.toInt).getOrElse(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = GraftSession.local(cores = cpus, appName = "graft-hybrid-latency")
    spark.sparkContext.setLogLevel("ERROR")

    val runDir = s"/tmp/graft-hybrid-latency-${java.lang.System.nanoTime()}"
    val qDir = s"$runDir/queries"
    val outDir = s"$runDir/out"
    Files.createDirectories(Paths.get(qDir))

    val (textName, annName) = ("lat_hybrid_text", "lat_hybrid_ann")
    graft.sources.Bm25IndexStore.drop(spark, textName)
    graft.sources.AnnIndexStore.drop(spark, annName)
    val tF = java.lang.System.nanoTime()
    graft.sources.Bm25IndexStore.freeze(
      graft.operators.TextAnalysis.docChunkFrame(spark, sfDir), textName)
    graft.operators.Similarity.shipIvfpqIndex(spark, sfDir, annName)
    val freezeSec = (java.lang.System.nanoTime() - tF) / 1e9

    // one wave = the 6 hybrid queries under fresh ids (the t22 query
    // shape: terms + the fixture's dense vector per query)
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"), col("embedding"))
    import spark.implicits._
    val baseQ = graft.operators.TextAnalysis.Bm25Queries
      .map { case (qid, ts) => (qid, ts, qid.toLong *
        graft.operators.TextAnalysis.HybridQueryVecStride) }
      .toDF("query_id", "terms", "vec_id")
      .join(emb, "vec_id")
      .select("query_id", "terms", "vec_id", "label", "embedding")
      .cache()
    baseQ.count()

    val qStream = spark.readStream.schema(baseQ.schema).parquet(qDir)
    val sq = streaming.HybridStream.searchStream(qStream,
      streaming.AnnStream.corpusFrame(spark, sfDir), textName, annName,
      outDir, s"$runDir/ckpt",
      trigger = Trigger.ProcessingTime(s"$trigSec seconds"))

    def visible(qidBase: Int): Boolean =
      try spark.read.parquet(s"$outDir/batch=*")
        .filter(col("query_id") === qidBase).limit(1).count() > 0
      catch { case scala.util.control.NonFatal(_) => false }

    val lats = scala.collection.mutable.ArrayBuffer[Double]()
    var cold = -1.0
    for (w <- 0 to waves) {
      // fresh ids per wave; vec_id (the dense self-exclusion id)
      // keeps the fixture rule so every wave's answers are identical
      val off = 1000 * (w + 1)
      val t0 = java.lang.System.nanoTime()
      baseQ.select((col("query_id") + off).as("query_id"), col("terms"),
          col("vec_id"), col("label"), col("embedding"))
        .coalesce(1).write.mode("append").parquet(qDir)
      val deadline = t0 + 180L * 1000000000L
      while (!visible(off + 1) && java.lang.System.nanoTime() < deadline)
        Thread.sleep(50)
      require(visible(off + 1), s"wave $w never answered")
      val sec = (java.lang.System.nanoTime() - t0) / 1e9
      if (w == 0) cold = sec else lats += sec
      System.err.println(f"[hybrid-latency] wave $w: $sec%.2fs" +
        (if (w == 0) " (cold)" else ""))
    }

    def q(v: Seq[Double], f: Double): Double = {
      val s = v.sorted
      s(math.min(s.size - 1, (f * s.size).toInt))
    }
    // "min" is the PHASE-ROBUST reading (round 18): each wave lands
    // its file at a random phase of the ProcessingTime trigger, so
    // every latency carries a uniform 0..trigger alignment term and
    // the MEDIAN of 8 waves bounces inside [proc, proc+trigger] —
    // the r17->r18 classifier "doubling" was two runs sampling
    // opposite ends of that band on IDENTICAL code (bisected to
    // prove it). min over the waves strips the alignment to
    // E[min of n uniforms] ~ trigger/(n+1); compare THAT
    // round-over-round, and the median only for end-to-end feel.
    println(f"""{"metric":"hybrid_latency","trigger":"ProcessingTime(${trigSec}s)","unit":"sec","sf":"$sfDir","waves":$waves,"freeze_sec":$freezeSec%.2f,"cold":$cold%.2f,"min":${lats.min}%.3f,"median":${q(lats.toSeq, 0.5)}%.3f,"p90":${q(lats.toSeq, 0.9)}%.3f}""")

    System.out.flush()
    try sq.stop() catch { case _: Throwable => () }
    graft.sources.Bm25IndexStore.drop(spark, textName)
    graft.sources.AnnIndexStore.drop(spark, annName)
    try spark.stop() catch { case _: Throwable => () }
    Runtime.getRuntime.halt(0)
  }
}
