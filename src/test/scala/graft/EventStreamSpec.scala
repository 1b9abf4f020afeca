package graft

import graft.sources.Tables
import graft.streaming.EventStream
import java.nio.file.Files
import org.apache.spark.sql.streaming.Trigger

/** Streaming windowed aggregation replays the events table as a file
  * stream and must converge to the batch answer. */
class EventStreamSpec extends SparkSpec {

  test("streaming windowed agg equals batch windowed agg") {
    // stage the events parquet as a streamed directory
    val dir = Files.createTempDirectory("evstream").toString
    val batchEvents = Tables.events(spark, sf)
    batchEvents.write.mode("overwrite").parquet(dir)

    val streamed = spark.readStream
      .schema(spark.read.parquet(dir).schema)
      .parquet(dir)

    val q = EventStream.windowedAgg(streamed)
      .writeStream.outputMode("complete")
      .format("memory").queryName("winagg")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val got = spark.table("winagg")
      .orderBy("w_start", "event_type").collect()
    val want = EventStream.windowedAgg(batchEvents)
      .orderBy("w_start", "event_type").collect()
    assert(got.length === want.length)
    assert(got.sameElements(want))
  }

  test("stream-stream interval join equals batch and the banded q15") {
    val dir = Files.createTempDirectory("evjoin").toString
    val batchEvents = Tables.events(spark, sf)
    batchEvents.write.mode("overwrite").parquet(dir)
    val streamed = spark.readStream
      .schema(spark.read.parquet(dir).schema)
      .parquet(dir)

    val q = EventStream.clickPurchaseJoin(streamed)
      .writeStream.outputMode("append")
      .format("memory").queryName("ssjoin")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val got = spark.table("ssjoin").orderBy("a_id", "b_id").collect()
    val batch = EventStream.clickPurchaseJoin(batchEvents)
      .orderBy("a_id", "b_id").collect()
    assert(got.sameElements(batch), "stream replay == batch")

    val banded = graft.operators.Analytics2.q15IntervalJoin(spark, sf)
      .select("a_id", "b_id", "user_id", "gap_s")
      .orderBy("a_id", "b_id").collect()
    assert(batch.sameElements(banded), "interval-join == banded q15 operator")
  }
}
