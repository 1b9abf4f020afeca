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
