package graft.streaming

import graft.functions.Fns._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming analytics over an event stream: watermarked tumbling
  * windows. The aggregation body is identical to the batch
  * `Analytics2.q14TumblingWindow`, so a batch replay of the stream
  * produces the batch answer — the property the spec asserts. */
object EventStream {

  /** 1-hour tumbling window counts/sums with a late-data watermark.
    * Works on both batch and streaming DataFrames. */
  def windowedAgg(events: DataFrame, watermark: String = "2 hours"): DataFrame = {
    val src =
      if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("sum_value"))
  }
}
