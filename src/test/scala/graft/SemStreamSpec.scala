package graft

import graft.operators.Dedup
import graft.streaming.SemStream
import java.nio.file.Files
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType, StructField, StructType}

/** Streaming twin of d18: vectors arriving over two checkpointed
  * AvailableNow runs, screened against the frozen semantic index,
  * must reproduce the batch operator's verdict rows exactly. */
class SemStreamSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  test("two incremental runs reproduce batch d18's verdicts") {
    val dir = Files.createTempDirectory("sem-in").toFile
    val ckpt = Files.createTempDirectory("sem-ckpt").toString
    val out = Files.createTempDirectory("sem-out").toString

    val vecs = graft.sources.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding")
    val corpus = vecs.filter($"vec_id" % 10 < 8)
    val arrivals = vecs.filter($"vec_id" % 10 >= 8)
    val half1 = arrivals.filter($"vec_id" < 250)
    val half2 = arrivals.filter($"vec_id" >= 250)

    val (cents, corpusIdx) = Dedup.semFrozenIndex(corpus)
    val frozen = SemStream.frozenCentroids(cents)
    assert(frozen.nonEmpty && frozen.size <= 64)

    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema)
        .parquet(dir.getAbsolutePath + "/*")
      val q = SemStream.verdicts(stream, corpusIdx, frozen).toDF()
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .format("parquet")
        .option("path", out)
        .start()
      q.awaitTermination()
    }

    half1.coalesce(1).write.parquet(new java.io.File(dir, "chunk1").toString)
    runOnce()
    val firstRun = spark.read.parquet(out).as[SemStream.SemVerdict]
      .collect().map(v => (v.vec_id, v.cell, v.nearest_corp, v.nearest_cos,
        v.verdict)).toSet

    half2.coalesce(1).write.parquet(new java.io.File(dir, "chunk2").toString)
    runOnce()

    val streamed = spark.read.parquet(out).as[SemStream.SemVerdict]
      .collect().map(v => (v.vec_id, v.cell, v.nearest_corp, v.nearest_cos,
        v.verdict)).toSet
    val batch = Dedup.d18IncrementalSemdedup(spark, sf)
      .as[SemStream.SemVerdict]
      .collect().map(v => (v.vec_id, v.cell, v.nearest_corp, v.nearest_cos,
        v.verdict)).toSet

    assert(batch.nonEmpty, "fixture produced no increment vectors")
    assert(streamed == batch,
      s"streamed ${streamed.size} verdicts != batch ${batch.size}")
    assert(streamed.exists(_._5 == "drop_near") &&
      streamed.exists(_._5 == "keep"),
      "fixture must exercise both verdicts")

    // incrementality: the second run emitted only second-half docs
    val added = streamed -- firstRun
    assert(firstRun.nonEmpty && added.nonEmpty)
    assert(added.forall(_._1 >= 250))
  }

  test("replay-guard TTL keeps batch parity within the TTL window") {
    // the TTL knob bounds guard state on long-running streams by
    // narrowing the replay window — within the window semantics must
    // be IDENTICAL to TTL-off (a mis-wired TimeMode/TTLConfig pair
    // throws or double-emits; this pins the pass-through).
    //
    // TRIGGER/WAIT CHOICE IS LOAD-BEARING: TTL forces processing-
    // time mode, whose eviction timers keep scheduling empty
    // micro-batches as long as the query runs — so a TTL'd stream
    // NEVER quiesces: Trigger.AvailableNow never terminates
    // (measured: 4000+ empty commits) and even processAllAvailable()
    // never returns (measured: ~2 empty batches/s, 1700+ commits).
    // The only sound pattern is bounded OUTPUT polling: wait until
    // the sink holds the expected rows, then stop(). The same rule
    // is documented on SemStream.verdicts/SpanStream.spans.
    val dir = Files.createTempDirectory("semttl-in").toFile
    val ckpt = Files.createTempDirectory("semttl-ckpt").toString
    val out = Files.createTempDirectory("semttl-out").toString
    val vecs = graft.sources.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding")
    val (cents, corpusIdx) = Dedup.semFrozenIndex(vecs.filter($"vec_id" % 10 < 8))
    val frozen = SemStream.frozenCentroids(cents)
    vecs.filter($"vec_id" % 10 >= 8).coalesce(1)
      .write.parquet(new java.io.File(dir, "chunk1").toString)
    val stream = spark.readStream.schema(schema)
      .parquet(dir.getAbsolutePath + "/*")
    val batch = Dedup.d18IncrementalSemdedup(spark, sf)
      .as[SemStream.SemVerdict]
      .collect().map(v => (v.vec_id, v.cell, v.nearest_corp, v.nearest_cos,
        v.verdict)).toSet
    val q = SemStream.verdicts(stream, corpusIdx, frozen,
        stateTtlMs = 3600L * 1000L).toDF()
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .format("parquet")
      .option("path", out)
      .start()
    def sinkRows(): Long =
      try spark.read.parquet(out).count() catch { case _: Exception => 0L }
    try {
      val deadline = System.nanoTime() + 120L * 1000000000L
      while (sinkRows() < batch.size && System.nanoTime() < deadline)
        Thread.sleep(500)
    } finally q.stop()
    val streamed = spark.read.parquet(out).as[SemStream.SemVerdict]
      .collect().map(v => (v.vec_id, v.cell, v.nearest_corp, v.nearest_cos,
        v.verdict)).toSet
    assert(streamed == batch,
      s"TTL run ${streamed.size} verdicts != batch ${batch.size}")
  }

  test("streaming staleness counters: two-run replay totals equal batch qa04") {
    // the continuous drift dashboard: running per-cell occupancy +
    // floored micro-cos sums in Complete mode — state is ≤ k rows by
    // construction (one per frozen cell), so no watermark and no TTL
    // are needed, and AvailableNow replays terminate normally (no
    // processing-time timers — contrast the TTL test above)
    val dir = Files.createTempDirectory("stale-in").toFile
    val ckpt = Files.createTempDirectory("stale-ckpt").toString
    val vecs = graft.sources.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding")
    val (cents, _) = Dedup.semFrozenIndex(vecs.filter($"vec_id" % 10 < 8))
    val frozen = SemStream.frozenCentroids(cents)
    val arrivals = vecs.filter($"vec_id" % 10 >= 8)
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema)
        .parquet(dir.getAbsolutePath + "/*")
      val q = SemStream.stalenessCounters(stream, frozen)
        .writeStream
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .format("memory")
        .queryName("stale_counters")
        .start()
      q.awaitTermination()
    }
    arrivals.filter($"vec_id" < 250).coalesce(1)
      .write.parquet(new java.io.File(dir, "chunk1").toString)
    runOnce()
    arrivals.filter($"vec_id" >= 250).coalesce(1)
      .write.parquet(new java.io.File(dir, "chunk2").toString)
    runOnce()
    val streamed = spark.table("stale_counters")
      .select($"cell", $"n_inc", $"inc_cos_sum").as[(Long, Long, Long)]
      .collect().map(r => (r._1, (r._2, r._3))).toMap
    val batch = Dedup.qa04IndexStaleness(spark, sf)
      .filter($"n_inc" > 0)
      .select($"cell", $"n_inc", $"inc_mean_cos_micro").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(batch.nonEmpty, "fixture produced no increment cells")
    assert(streamed.keySet == batch.keySet,
      s"streamed cells ${streamed.keySet} != batch ${batch.keySet}")
    batch.foreach { case (cell, (n, mean)) =>
      val (sn, ssum) = streamed(cell)
      assert(sn == n, s"cell $cell: streamed count $sn != batch $n")
      // identical-operand double division — exact, no tolerance
      assert(ssum.toDouble / sn == mean,
        s"cell $cell: streamed mean ${ssum.toDouble / sn} != batch $mean")
    }
  }

  test("stateless routing equals the batch cell assignment") {
    val vecs = graft.sources.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding")
    val corpus = vecs.filter($"vec_id" % 10 < 8)
    val (cents, _) = Dedup.semFrozenIndex(corpus)
    val frozen = SemStream.frozenCentroids(cents)
    // literal-shipped routing of the CORPUS itself must agree with
    // the join-based batch assignment the frozen index was built with
    val routedCells = SemStream.routed(corpus, frozen)
      .select("vec_id", "cell").as[(Long, Long)].collect().toMap
    val batchCells = Dedup.semFrozenIndex(corpus)._2
      .select($"corp_id", $"cell").as[(Long, Long)].collect().toMap
    assert(routedCells == batchCells,
      "literal routing diverged from the batch assignment rule")
  }
}
