package graft

import graft.operators.Dedup
import graft.streaming.SpanStream
import java.nio.file.Files
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Streaming twin of d17: increment docs arriving over two
  * checkpointed AvailableNow runs, screened against the frozen
  * corpus seed index, must reproduce exactly the batch operator's
  * span set. */
class SpanStreamSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  test("replay-guard TTL keeps batch parity within the TTL window") {
    // same pin as SemStreamSpec's: the state-TTL knob (bounded guard
    // state for long-running streams) must not change span output
    // within the window — a mis-wired TimeMode/TTLConfig throws or
    // double-emits
    val dir = Files.createTempDirectory("spttl-in").toFile
    val ckpt = Files.createTempDirectory("spttl-ckpt").toString
    val out = Files.createTempDirectory("spttl-out").toString
    val docs = graft.sources.Tables.documents(spark, sf).select("doc_id", "text")
    val corpusIdx = Dedup.corpusSeedIndex(docs.filter($"doc_id" % 10 < 8))
    docs.filter($"doc_id" % 10 >= 8).coalesce(1)
      .write.json(new java.io.File(dir, "chunk1").toString)
    val stream = spark.readStream.schema(schema)
      .json(dir.getAbsolutePath + "/*")
    // a TTL'd stream never quiesces (processing-time eviction timers
    // schedule empty batches for the query's whole life), so neither
    // AvailableNow nor processAllAvailable() can end the wait — poll
    // the SINK for the expected row count, then stop (the measured
    // pathology is documented in SemStreamSpec's TTL test)
    val batch = Dedup.d17IncrementalSpans(spark, sf)
      .select($"doc_inc", $"doc_corp", $"inc_start", $"corp_start",
        $"span_tokens")
      .as[SpanStream.Span].collect().toSet
    val q = SpanStream.spans(stream, corpusIdx, stateTtlMs = 3600L * 1000L)
      .toDF()
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
    val streamed = spark.read.parquet(out)
      .as[SpanStream.Span].collect().toSet
    assert(streamed == batch,
      s"TTL run ${streamed.size} spans != batch ${batch.size}")
  }

  test("two incremental runs reproduce batch d17's span set") {
    val dir = Files.createTempDirectory("sp-in").toFile
    val ckpt = Files.createTempDirectory("sp-ckpt").toString
    val out = Files.createTempDirectory("sp-out").toString

    val docs = graft.sources.Tables.documents(spark, sf).select("doc_id", "text")
    // d17's fixture split: corpus = doc_id % 10 < 8, increment = the rest
    val corpus = docs.filter($"doc_id" % 10 < 8)
    val inc = docs.filter($"doc_id" % 10 >= 8)
    val half1 = inc.filter($"doc_id" < 250)
    val half2 = inc.filter($"doc_id" >= 250)
    val corpusIdx = Dedup.corpusSeedIndex(corpus)

    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema)
        .json(dir.getAbsolutePath + "/*")
      val q = SpanStream.spans(stream, corpusIdx).toDF()
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .format("parquet")
        .option("path", out)
        .start()
      q.awaitTermination()
    }

    half1.coalesce(1).write.json(new java.io.File(dir, "chunk1").toString)
    runOnce()
    val firstRun = spark.read.parquet(out)
      .as[SpanStream.Span].collect().toSet

    half2.coalesce(1).write.json(new java.io.File(dir, "chunk2").toString)
    runOnce()

    val streamed = spark.read.parquet(out)
      .as[SpanStream.Span].collect().toSet
    val batch = Dedup.d17IncrementalSpans(spark, sf)
      .select($"doc_inc", $"doc_corp", $"inc_start", $"corp_start",
        $"span_tokens")
      .as[SpanStream.Span].collect().toSet

    assert(batch.nonEmpty, "fixture produced no shared spans")
    assert(streamed == batch,
      s"streamed ${streamed.size} spans != batch ${batch.size}")

    // incrementality: the second run added only second-half docs'
    // spans — first-half results came from the committed first run,
    // not a re-measurement
    val added = streamed -- firstRun
    assert(firstRun.nonEmpty && added.nonEmpty,
      "both increments must contribute spans on this fixture")
    assert(added.forall(_.doc_inc >= 250))
  }
}
