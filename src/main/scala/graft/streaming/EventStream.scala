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

  /** Stream-stream interval join: clicks matched to the same user's
    * purchases within the next 10 minutes. Watermarks on both sides
    * bound the join state; the event-time range condition lets Spark
    * evict rows once the other side's watermark passes. Works on
    * batch DataFrames too (same rows as the banded q15 operator). */
  def clickPurchaseJoin(events: DataFrame, watermark: String = "1 hour"): DataFrame = {
    def side(t: String, idCol: String, tsCol: String): DataFrame = {
      val s = events.filter(col("event_type") === t)
        .select(col("event_id").as(idCol), col("user_id"), col("ts").as(tsCol))
      if (s.isStreaming) s.withWatermark(tsCol, watermark) else s
    }
    val clicks = side("click", "a_id", "a_ts")
    val purchases = side("purchase", "b_id", "b_ts").withColumnRenamed("user_id", "b_user")
    clicks.join(purchases,
        col("user_id") === col("b_user") &&
        col("b_ts") > col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr("INTERVAL 10 MINUTES"))
      .select(col("a_id"), col("b_id"), col("user_id"),
        ((unix_micros(col("b_ts")) - unix_micros(col("a_ts"))) / lit(1000000.0)).as("gap_s"))
  }
}
