package graft

import graft.operators.Dedup
import graft.sources.Tables
import graft.streaming.BloomStream
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The streaming bloom screen must equal batch d19 row-for-row over
  * the same frozen corpus — the position/probe/verdict algebra is
  * literally shared, so this pins the ship-the-geometry literal and
  * the stream-static join composition, plus checkpointed-restart
  * replay (the plan is stateless, so replay safety is the sink's
  * dedup problem — here we just re-run AvailableNow over a split
  * input and check the union). */
class BloomStreamSpec extends SparkSpec {

  test("streamed bloom verdicts equal batch d19 on the fixture split") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val corpus = docs.filter(col("doc_id") % 10 < 8)
    val inc = docs.filter(col("doc_id") % 10 >= 8)
    val (words, corpHash, mbits) = BloomStream.frozenFilter(corpus)

    val dir = Files.createTempDirectory("bloomstream").toString
    inc.write.mode("overwrite").parquet(dir)
    val streamed = spark.readStream
      .schema(spark.read.parquet(dir).schema).parquet(dir)

    val q = BloomStream.verdicts(streamed, words, corpHash, mbits)
      .writeStream.outputMode("append")
      .format("memory").queryName("bloomv")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val got = spark.table("bloomv").orderBy("doc_id").collect()
    val want = Dedup.d19BloomScreen(spark, sf).collect()
    assert(got.length === want.length)
    assert(got.sameElements(want), "streamed bloom screen != batch d19")
  }

  test("two-checkpoint replay over a split arrival stream still equals batch") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val corpus = docs.filter(col("doc_id") % 10 < 8)
    val inc = docs.filter(col("doc_id") % 10 >= 8)
    val (words, corpHash, mbits) = BloomStream.frozenFilter(corpus)

    val in = Files.createTempDirectory("bloomsplit").toString
    val ckpt = Files.createTempDirectory("bloomckpt").toString
    val out = Files.createTempDirectory("bloomout").toString
    val half = inc.filter(col("doc_id") % 20 === 8)
    half.write.mode("overwrite").parquet(in)

    def runOnce(): Unit = {
      val streamed = spark.readStream
        .schema(spark.read.parquet(in).schema).parquet(in)
      val q = BloomStream.verdicts(streamed, words, corpHash, mbits)
        .writeStream.outputMode("append")
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runOnce()
    // second arrival wave lands, the query restarts from checkpoint
    inc.filter(col("doc_id") % 20 =!= 8)
      .write.mode("append").parquet(in)
    runOnce()

    val got = spark.read.parquet(out).orderBy("doc_id").collect()
    val want = Dedup.d19BloomScreen(spark, sf).collect()
    assert(got.length === want.length)
    assert(got.sameElements(want), "replayed bloom screen != batch d19")
  }
}
