package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The TRAINED-TOKENIZER serving path's latency ops card (the
  * [[Bm25Latency]] / [[DaemonLatency]] / [[HybridLatency]] /
  * [[ClassifierLatency]] sibling, round 16): arrival→token-count
  * wall time for a continuous
  * [[graft.streaming.QualityStream.frozenTokenizerStream]] at a
  * ProcessingTime trigger — the number an ingest-budgeting
  * deployment provisions against, covering the per-batch merge-table
  * read (rounds rows of control state), the per-row literal-replace
  * fold and the sink commit. The artifact trains+freezes once,
  * untimed (the amortized t28 build). Wave 0 is the COLD number
  * (stream boot + first codegen).
  *
  * Not part of the driver contract; a measurement main like
  * [[Probe]]/[[Stress]]. Prints ONE JSON line.
  *
  * Usage: runMain graft.TokenizerLatency [waves] [triggerSec]
  */
object TokenizerLatency {

  def main(args: Array[String]): Unit = {
    val waves = args.headOption.map(_.toInt).getOrElse(8)
    require(waves >= 1,
      "need at least one timed wave beyond the cold wave 0 — the " +
        "quantiles are over the steady-state waves only")
    val trigSec = args.drop(1).headOption.map(_.toInt).getOrElse(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = GraftSession.local(cores = cpus, appName = "graft-tokenizer-latency")
    spark.sparkContext.setLogLevel("ERROR")

    val runDir = s"/tmp/graft-tok-latency-${java.lang.System.nanoTime()}"
    val inDir = s"$runDir/in"
    val outDir = s"$runDir/out"
    Files.createDirectories(Paths.get(inDir))

    val name = "lat_tokenizer"
    graft.sources.TokenizerStore.drop(spark, name)
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text")
    val tF = java.lang.System.nanoTime()
    graft.sources.TokenizerStore.freeze(docs, name)
    val freezeSec = (java.lang.System.nanoTime() - tF) / 1e9

    // one wave = an arrival batch of 64 corpus documents under fresh
    // ids (in-distribution text — the steady-state serving regime;
    // the drifted regime is staleness/refreeze territory, not a
    // latency card)
    val baseArr = docs.limit(64).cache()
    baseArr.count()

    val stream = spark.readStream.schema(baseArr.schema)
      .parquet(inDir)
    val sq = streaming.QualityStream.frozenTokenizerStream(stream, name,
      outDir, s"$runDir/ckpt",
      trigger = Trigger.ProcessingTime(s"$trigSec seconds"))

    def visible(idBase: Long): Boolean =
      try spark.read.parquet(s"$outDir/batch=*")
        .filter(col("doc_id") === idBase).limit(1).count() > 0
      catch { case scala.util.control.NonFatal(_) => false }

    // loop-invariant, hoisted OUT of the timed window (the
    // ClassifierLatency rule)
    val minId = baseArr.select(min(col("doc_id"))).collect()(0).getLong(0)
    val lats = scala.collection.mutable.ArrayBuffer[Double]()
    var cold = -1.0
    for (w <- 0 to waves) {
      val off = 1000000L * (w + 1)
      val t0 = java.lang.System.nanoTime()
      baseArr.select((col("doc_id") + off).as("doc_id"), col("text"))
        .coalesce(1).write.mode("append").parquet(inDir)
      val probe = off + minId
      val deadline = t0 + 180L * 1000000000L
      while (!visible(probe) && java.lang.System.nanoTime() < deadline)
        Thread.sleep(50)
      require(visible(probe), s"wave $w never answered")
      val sec = (java.lang.System.nanoTime() - t0) / 1e9
      if (w == 0) cold = sec else lats += sec
      System.err.println(f"[tokenizer-latency] wave $w: $sec%.2fs" +
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
    println(f"""{"metric":"tokenizer_latency","trigger":"ProcessingTime(${trigSec}s)","unit":"sec","sf":"$sfDir","waves":$waves,"freeze_sec":$freezeSec%.2f,"cold":$cold%.2f,"min":${lats.min}%.3f,"median":${q(lats.toSeq, 0.5)}%.3f,"p90":${q(lats.toSeq, 0.9)}%.3f}""")

    System.out.flush()
    try sq.stop() catch { case _: Throwable => () }
    graft.sources.TokenizerStore.drop(spark, name)
    try spark.stop() catch { case _: Throwable => () }
    Runtime.getRuntime.halt(0)
  }
}
