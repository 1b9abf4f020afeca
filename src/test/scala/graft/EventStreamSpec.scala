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

  test("streaming histogram counters: two-checkpoint replay equals the batch sketch") {
    import spark.implicits._
    val ev = Tables.events(spark, sf).select("event_id", "event_type", "value")
    // geometry frozen ONCE from the full corpus (the frozen-index
    // rule) — both the batch sketch and the stream share it
    val geo = graft.operators.Analytics3.histGeometry(
      ev.select("event_type", "value"))
    val dir = Files.createTempDirectory("histin").toFile
    val ckpt = Files.createTempDirectory("histckpt").toString
    val schema = ev.schema
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema)
        .parquet(dir.getAbsolutePath + "/*")
      val q = EventStream.histogramCounters(stream, geo)
        .writeStream.outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .format("memory").queryName("hist_counters")
        .start()
      q.awaitTermination()
    }
    ev.filter($"event_id" % 2 === 0).coalesce(1)
      .write.parquet(new java.io.File(dir, "chunk1").toString)
    runOnce()
    ev.filter($"event_id" % 2 =!= 0).coalesce(1)
      .write.parquet(new java.io.File(dir, "chunk2").toString)
    runOnce()
    val streamed = spark.table("hist_counters")
      .as[(String, Long, Long)].collect()
      .map { case (t, b, c) => (t, b) -> c }.toMap
    val batch = graft.operators.Analytics3.histogramOf(
        ev.select("event_type", "value"), geo)
      .as[(String, Long, Long)].collect()
      .map { case (t, b, c) => (t, b) -> c }.toMap
    assert(batch.nonEmpty)
    assert(streamed === batch, "streamed histogram != batch sketch")
    // bounded-state claim: at most |types| x 256 cells, bins in range
    val nTypes = geo.count()
    assert(streamed.size <= nTypes * 256)
    assert(streamed.keys.forall { case (_, b) => b >= 0 && b <= 255 })
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

  test("streaming sessionization (event-time timers) equals batch q09") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = Files.createTempDirectory("evsess").toString
    val batchEvents = Tables.events(spark, sf)
    batchEvents.write.mode("overwrite").parquet(dir)
    // a far-future sentinel event for a dummy user pushes the GLOBAL
    // watermark 2h past every real event, so every real session's
    // close timer fires — no boundary ambiguity in the comparison
    val maxTs = batchEvents.agg(max("ts")).first().getTimestamp(0)
    batchEvents.limit(1)
      .withColumn("user_id", lit(-1L))
      .withColumn("event_id", lit(-1L))
      .withColumn("ts", lit(new java.sql.Timestamp(maxTs.getTime + 2L * 3600 * 1000)))
      .write.mode("append").parquet(dir)

    val streamed = spark.readStream
      .schema(spark.read.parquet(dir).schema).parquet(dir)
    val q = EventStream.sessionize(streamed)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val got = spark.table("sess").filter($"user_id" >= 0)
      .select($"user_id".cast("long"), $"sess_id".cast("long"),
        $"n_events".cast("long"), $"n_types".cast("long"), $"dur_s")
      .as[(Long, Long, Long, Long, Double)]
      .collect().sortBy(r => (r._1, r._2))
    val want = graft.operators.Analytics.q09Sessionize(spark, sf)
      .select(col("user_id").cast("long"), col("sess_id").cast("long"),
        col("n_events").cast("long"), col("n_types").cast("long"), col("dur_s"))
      .as[(Long, Long, Long, Long, Double)]
      .collect().sortBy(r => (r._1, r._2))
    assert(got.length === want.length,
      s"all ${want.length} batch sessions must close and emit (got ${got.length})")
    assert(got.sameElements(want), "streamed sessions == batch q09")
  }

  test("streamed sessions reproduce the batch funnel (q27)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = Files.createTempDirectory("evfunnel").toString
    val batchEvents = Tables.events(spark, sf)
    batchEvents.write.mode("overwrite").parquet(dir)
    val maxTs = batchEvents.agg(max("ts")).first().getTimestamp(0)
    batchEvents.limit(1)
      .withColumn("user_id", lit(-1L))
      .withColumn("event_id", lit(-1L))
      .withColumn("ts", lit(new java.sql.Timestamp(maxTs.getTime + 2L * 3600 * 1000)))
      .write.mode("append").parquet(dir)
    val streamed = spark.readStream
      .schema(spark.read.parquet(dir).schema).parquet(dir)
    val q = EventStream.sessionize(streamed)
      .writeStream.outputMode("append")
      .format("memory").queryName("sessfunnel")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    // stage flags straight off each closed session's type set
    def flag(t: String) = when(array_contains($"types", t), 1).otherwise(0)
    val got = spark.table("sessfunnel").filter($"user_id" >= 0)
      .select(flag("view").as("v"), flag("click").as("c"), flag("purchase").as("p"))
      .agg(count(lit(1)), sum($"v"), sum($"v" * $"c"), sum($"v" * $"c" * $"p"))
      .as[(Long, Long, Long, Long)].first()
    val want = graft.operators.Analytics2.q27Funnel(spark, sf)
      .select($"n_sessions", $"n_view", $"n_view_click", $"n_funnel")
      .as[(Long, Long, Long, Long)].first()
    assert(got === want, "streamed funnel == batch q27")
  }

  test("session counter survives a timer-closed session and a restart") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = Files.createTempDirectory("sessseq").toString
    val ckpt = Files.createTempDirectory("sessseq-ckpt").toString
    val out = Files.createTempDirectory("sessseq-out").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def writeBatch(rows: Seq[(Long, Long, java.sql.Timestamp, String)]): Unit =
      rows.toDF("user_id", "event_id", "ts", "event_type")
        .write.mode("append").parquet(dir)
    def runOnce(): Unit = {
      val streamed = spark.readStream
        .schema(spark.read.parquet(dir).schema).parquet(dir)
      val q = graft.streaming.EventStream.sessionize(streamed).toDF()
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.write.mode("append").parquet(out))
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    // run 1: one session for user 7, closed by the sentinel-advanced
    // watermark (timer path — the path that clears session state)
    writeBatch(Seq(
      (7L, 1L, ts("2024-01-01 00:00:00"), "view"),
      (7L, 2L, ts("2024-01-01 00:10:00"), "click"),
      (-1L, 3L, ts("2024-01-01 02:00:00"), "view")))
    runOnce()
    // run 2 (same checkpoint): a NEW session for user 7 hours later
    writeBatch(Seq(
      (7L, 4L, ts("2024-01-01 03:00:00"), "view"),
      (-1L, 5L, ts("2024-01-01 06:00:00"), "view")))
    runOnce()

    val sessions = spark.read.parquet(out)
      .filter($"user_id" === 7L)
      .select($"sess_id".cast("long"), $"n_events".cast("long"))
      .as[(Long, Long)].collect().sorted
    assert(sessions === Array((1L, 2L), (2L, 1L)),
      "second session must be numbered 2, not restart at 1")
  }

  test("a late event within the watermark can MERGE two apparent sessions") {
    import spark.implicits._
    val dir = Files.createTempDirectory("sesslate").toString
    val ckpt = Files.createTempDirectory("sesslate-ckpt").toString
    val out = Files.createTempDirectory("sesslate-out").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def writeBatch(rows: Seq[(Long, Long, java.sql.Timestamp, String)]): Unit =
      rows.toDF("user_id", "event_id", "ts", "event_type")
        .repartition(1).write.mode("append").parquet(dir)
    def runOnce(): Unit = {
      val streamed = spark.readStream
        .schema(spark.read.parquet(dir).schema).parquet(dir)
      val q = EventStream.sessionize(streamed, watermark = "1 hour").toDF()
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.write.mode("append").parquet(out))
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // batch 1: 10:00 and 11:00 look like TWO sessions (60-min gap) —
    // an eager in-batch close would emit {10:00} here, irrevocably
    writeBatch(Seq(
      (5L, 1L, ts("2024-01-01 10:00:00"), "view"),
      (5L, 2L, ts("2024-01-01 11:00:00"), "click")))
    runOnce()
    // batch 2: a LATE event (allowed by the 1-h watermark) at 10:30
    // bridges both gaps — the truth is ONE session
    writeBatch(Seq((5L, 3L, ts("2024-01-01 10:30:00"), "purchase")))
    runOnce()
    // batch 3: sentinel advances the watermark far enough to close
    writeBatch(Seq((-1L, 9L, ts("2024-01-01 15:00:00"), "view")))
    runOnce()
    val got = spark.read.parquet(out).filter($"user_id" === 5L)
      .select($"sess_id".cast("long"), $"n_events".cast("long"), $"dur_s")
      .as[(Long, Long, Double)].collect()
    assert(got.toSeq === Seq((1L, 3L, 3600.0)),
      "the late bridge event must merge the apparent sessions")
  }

  test("streaming windowed dedup replay equals batch q34") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = Files.createTempDirectory("evwdedup").toString
    val batchEvents = Tables.events(spark, sf)
    batchEvents.write.mode("overwrite").parquet(dir)
    val maxTs = batchEvents.agg(max("ts")).first().getTimestamp(0)
    batchEvents.limit(1)
      .withColumn("user_id", lit(-1L))
      .withColumn("event_id", lit(-1L))
      .withColumn("ts", lit(new java.sql.Timestamp(maxTs.getTime + 2L * 3600 * 1000)))
      .write.mode("append").parquet(dir)

    val streamed = spark.readStream
      .schema(spark.read.parquet(dir).schema).parquet(dir)
    val q = EventStream.windowedDedup(streamed)
      .writeStream.outputMode("append")
      .format("memory").queryName("wdedup")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val got = spark.table("wdedup").filter($"user_id" >= 0)
      .select($"user_id", $"event_type", $"win", $"keep_event_id",
        $"n_copies", $"span_s")
      .as[(Long, String, Long, Long, Long, Double)]
      .collect().sortBy(r => (r._1, r._2, r._3))
    val want = graft.operators.Analytics3.q34WindowedDedup(spark, sf)
      .select($"user_id".cast("long"), $"event_type", $"win".cast("long"),
        $"keep_event_id".cast("long"), $"n_copies".cast("long"), $"span_s")
      .as[(Long, String, Long, Long, Long, Double)]
      .collect().sortBy(r => (r._1, r._2, r._3))
    assert(got.length === want.length,
      s"all ${want.length} batch windows must close and emit (got ${got.length})")
    assert(got.sameElements(want), "streamed suppression windows == batch q34")
  }

  test("late copy bridges two apparent dedup windows into one") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = Files.createTempDirectory("wdlate").toString
    val ckpt = Files.createTempDirectory("wdlate-ckpt").toString
    val out = Files.createTempDirectory("wdlate-out").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def writeBatch(rows: Seq[(Long, Long, java.sql.Timestamp, String)]): Unit =
      rows.toDF("user_id", "event_id", "ts", "event_type")
        .repartition(1).write.mode("append").parquet(dir)
    def runOnce(): Unit = {
      val streamed = spark.readStream
        .schema(spark.read.parquet(dir).schema).parquet(dir)
      val q = EventStream.windowedDedup(streamed, watermark = "1 hour").toDF()
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.write.mode("append").parquet(out))
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // batch 1: copies at 10:00 and 10:15 look like TWO suppression
    // windows (15-min gap > the 10-min horizon) — an eager close
    // would emit {10:00} and keep a wrong keeper for the 10:15 copy
    writeBatch(Seq(
      (5L, 1L, ts("2024-01-01 10:00:00"), "view"),
      (5L, 2L, ts("2024-01-01 10:15:00"), "view")))
    runOnce()
    // batch 2: a LATE copy (allowed by the 1-h watermark) at 10:07
    // bridges the gap (7 then 8 minutes) — the truth is ONE window
    writeBatch(Seq((5L, 3L, ts("2024-01-01 10:07:00"), "view")))
    runOnce()
    // batch 3: sentinel closes the watermark
    writeBatch(Seq((-1L, 9L, ts("2024-01-01 15:00:00"), "view")))
    runOnce()
    val got = spark.read.parquet(out).filter($"user_id" === 5L)
      .select($"win", $"keep_event_id", $"n_copies", $"span_s")
      .as[(Long, Long, Long, Double)].collect()
    assert(got.toSeq === Seq((1L, 1L, 3L, 900.0)),
      "the late bridge copy must merge the apparent windows")
  }

  test("streaming EWMA replay equals batch q35 bit-for-bit") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = Files.createTempDirectory("evewma").toString
    val batchEvents = Tables.events(spark, sf)
    batchEvents.write.mode("overwrite").parquet(dir)
    // sentinel advances the watermark past every real event so the
    // whole buffered history applies
    val maxTs = batchEvents.agg(max("ts")).first().getTimestamp(0)
    batchEvents.limit(1)
      .withColumn("user_id", lit(-1L))
      .withColumn("event_id", lit(-1L))
      .withColumn("ts", lit(new java.sql.Timestamp(maxTs.getTime + 2L * 3600 * 1000)))
      .write.mode("append").parquet(dir)
    val streamed = spark.readStream
      .schema(spark.read.parquet(dir).schema).parquet(dir)
    val q = EventStream.ewmaSpikes(streamed)
      .writeStream.outputMode("append")
      .format("memory").queryName("ewma")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val got = spark.table("ewma").filter($"user_id" >= 0)
      .as[(Long, Long, Double, Double, Boolean)]
      .collect().sortBy(r => (r._1, r._2))
    val want = graft.operators.Analytics3.q35EwmaSpikes(spark, sf)
      .as[(Long, Long, Double, Double, Boolean)]
      .collect().sortBy(r => (r._1, r._2))
    assert(got.length === want.length && got.nonEmpty)
    // bit-for-bit: the ring applies the SAME fixed-order float sum
    assert(got.sameElements(want), "streamed EWMA == batch q35")
  }

  test("streaming SCD2 replay equals the batch q32 closed intervals") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = Files.createTempDirectory("evscd").toString
    val batchEvents = Tables.events(spark, sf)
    batchEvents.write.mode("overwrite").parquet(dir)
    // sentinel advances the watermark past every real transition so
    // the buffered prefix flushes; the final OPEN intervals stay open
    // (exactly the null-valid_to rows the compare excludes)
    val maxTs = batchEvents.agg(max("ts")).first().getTimestamp(0)
    batchEvents.limit(1)
      .withColumn("user_id", lit(-1L))
      .withColumn("event_id", lit(-1L))
      .withColumn("ts", lit(new java.sql.Timestamp(maxTs.getTime + 2L * 3600 * 1000)))
      .write.mode("append").parquet(dir)
    val streamed = spark.readStream
      .schema(spark.read.parquet(dir).schema).parquet(dir)
    val q = EventStream.scd2(streamed)
      .writeStream.outputMode("append")
      .format("memory").queryName("scd")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val got = spark.table("scd").filter($"user_id" >= 0)
      .select($"user_id", $"version", $"state", $"valid_from", $"valid_to")
      .as[(Long, Long, String, java.sql.Timestamp, java.sql.Timestamp)]
      .collect().sortBy(r => (r._1, r._2))
    val want = graft.operators.Analytics3.q32Scd2(spark, sf)
      .filter(col("valid_to").isNotNull)
      .select(col("user_id"), col("version"), col("state"),
        col("valid_from"), col("valid_to"))
      .as[(Long, Long, String, java.sql.Timestamp, java.sql.Timestamp)]
      .collect().sortBy(r => (r._1, r._2))
    assert(got.length === want.length)
    assert(got.sameElements(want), "streamed SCD2 == batch q32 closed rows")
  }

  test("SCD2 state merges consecutive dups across batches and restarts") {
    import spark.implicits._
    val dir = Files.createTempDirectory("scdinc").toString
    val ckpt = Files.createTempDirectory("scdinc-ckpt").toString
    val out = Files.createTempDirectory("scdinc-out").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def writeBatch(rows: Seq[(Long, Long, java.sql.Timestamp, String)]): Unit =
      rows.toDF("user_id", "event_id", "ts", "event_type")
        .repartition(1).write.mode("append").parquet(dir)
    def runOnce(): Unit = {
      val streamed = spark.readStream
        .schema(spark.read.parquet(dir).schema).parquet(dir)
      val q = EventStream.scd2(streamed).toDF()
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.write.mode("append").parquet(out))
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // run 1: open a 'view' interval
    writeBatch(Seq(
      (9L, 1L, ts("2024-01-01 00:00:00"), "view"),
      (9L, 2L, ts("2024-01-01 00:05:00"), "view")))
    runOnce()
    assert(spark.read.parquet(out).count() === 0,
      "no state change yet — nothing may be emitted")
    // run 2 (same checkpoint): another dup, THEN a change — the
    // closed interval must span back to the FIRST batch's open; the
    // sentinel advances the watermark past the closing click
    writeBatch(Seq(
      (9L, 3L, ts("2024-01-01 00:10:00"), "view"),
      (9L, 4L, ts("2024-01-01 00:20:00"), "click"),
      (-1L, 5L, ts("2024-01-01 01:00:00"), "view")))
    runOnce()
    val rows = spark.read.parquet(out).filter($"user_id" === 9L)
      .select($"user_id", $"version", $"state", $"valid_from", $"valid_to")
      .as[(Long, Long, String, java.sql.Timestamp, java.sql.Timestamp)]
      .collect()
    assert(rows.toSeq === Seq(
      (9L, 1L, "view", ts("2024-01-01 00:00:00"), ts("2024-01-01 00:20:00"))),
      "one closed interval, version 1, spanning both batches")
  }

  test("SCD2 absorbs cross-batch disorder inside the watermark") {
    import spark.implicits._
    val dir = Files.createTempDirectory("scdooo").toString
    val ckpt = Files.createTempDirectory("scdooo-ckpt").toString
    val out = Files.createTempDirectory("scdooo-out").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def writeBatch(rows: Seq[(Long, Long, java.sql.Timestamp, String)]): Unit =
      rows.toDF("user_id", "event_id", "ts", "event_type")
        .repartition(1).write.mode("append").parquet(dir)
    def runOnce(): Unit = {
      val streamed = spark.readStream
        .schema(spark.read.parquet(dir).schema).parquet(dir)
      val q = EventStream.scd2(streamed, watermark = "10 minutes").toDF()
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.write.mode("append").parquet(out))
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // batch 1: the LATER event arrives first
    writeBatch(Seq((11L, 2L, ts("2024-01-01 00:10:00"), "click")))
    runOnce()
    // batch 2: an EARLIER event lands within the 10-minute lateness —
    // the eager (unbuffered) design emitted an inverted interval
    // here; the buffered design must order it before the click
    writeBatch(Seq(
      (11L, 1L, ts("2024-01-01 00:05:00"), "view"),
      (11L, 3L, ts("2024-01-01 00:20:00"), "purchase"),
      (-1L, 9L, ts("2024-01-01 01:00:00"), "view")))
    runOnce()
    val rows = spark.read.parquet(out).filter($"user_id" === 11L)
      .select($"version", $"state", $"valid_from", $"valid_to")
      .as[(Long, String, java.sql.Timestamp, java.sql.Timestamp)]
      .collect().sortBy(_._1)
    assert(rows.toSeq === Seq(
      (1L, "view", ts("2024-01-01 00:05:00"), ts("2024-01-01 00:10:00")),
      (2L, "click", ts("2024-01-01 00:10:00"), ts("2024-01-01 00:20:00"))),
      "the late view must sort before the click — no inverted interval")
  }

  test("ordered SCD2 drops a stale event instead of inverting the interval") {
    import spark.implicits._
    val dir = Files.createTempDirectory("scdstale").toString
    val ckpt = Files.createTempDirectory("scdstale-ckpt").toString
    val out = Files.createTempDirectory("scdstale-out").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def writeBatch(rows: Seq[(Long, Long, java.sql.Timestamp, String)]): Unit =
      rows.toDF("user_id", "event_id", "ts", "event_type")
        .repartition(1).write.mode("append").parquet(dir)
    def runOnce(): Unit = {
      val streamed = spark.readStream
        .schema(spark.read.parquet(dir).schema).parquet(dir)
      val q = EventStream.scd2Ordered(streamed).toDF()
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.write.mode("append").parquet(out))
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    writeBatch(Seq((12L, 2L, ts("2024-01-01 00:10:00"), "click")))
    runOnce()
    // violates the ordered-input contract: must be DROPPED (lost
    // transition), never applied as an inverted close
    writeBatch(Seq(
      (12L, 1L, ts("2024-01-01 00:05:00"), "view"),
      (12L, 3L, ts("2024-01-01 00:20:00"), "purchase")))
    runOnce()
    val rows = spark.read.parquet(out).filter($"user_id" === 12L)
      .select($"version", $"state", $"valid_from", $"valid_to")
      .as[(Long, String, java.sql.Timestamp, java.sql.Timestamp)]
      .collect().sortBy(_._1)
    assert(rows.toSeq === Seq(
      (1L, "click", ts("2024-01-01 00:10:00"), ts("2024-01-01 00:20:00"))),
      "stale view dropped; click interval closes cleanly at the purchase")
  }

  test("SCD2 orders and round-trips pre-1970 fractional-second instants") {
    import spark.implicits._
    val dir = Files.createTempDirectory("scdneg").toString
    // -0.5s sorts BEFORE +0.5s; truncating epoch math would mirror it
    // to +0.5s, swap the two states and corrupt both interval bounds
    def tsMs(ms: Long) = new java.sql.Timestamp(ms)
    Seq(
      (3L, 1L, tsMs(-500L), "view"),
      (3L, 2L, tsMs(500L), "click"),
      (3L, 3L, tsMs(1500L), "purchase"))
      .toDF("user_id", "event_id", "ts", "event_type")
      .repartition(1).write.mode("append").parquet(dir)
    // the ORDERED variant: Spark's event-time path drops rows below
    // the initial epoch-0 watermark, so pre-1970 instants can only
    // ride the TimeMode.None processor
    val q = EventStream.scd2Ordered(spark.readStream
        .schema(spark.read.parquet(dir).schema).parquet(dir))
      .writeStream.outputMode("append")
      .format("memory").queryName("scdneg")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val rows = spark.table("scdneg").filter($"user_id" === 3L)
      .select($"version", $"state", $"valid_from", $"valid_to")
      .as[(Long, String, java.sql.Timestamp, java.sql.Timestamp)]
      .collect().sortBy(_._1)
    assert(rows.toSeq === Seq(
      (1L, "view", tsMs(-500L), tsMs(500L)),
      (2L, "click", tsMs(500L), tsMs(1500L))))
  }

  test("streaming transitions replay equals batch q39 counts") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = Files.createTempDirectory("evtrans").toString
    val batchEvents = Tables.events(spark, sf)
    batchEvents.write.mode("overwrite").parquet(dir)
    val maxTs = batchEvents.agg(max("ts")).first().getTimestamp(0)
    batchEvents.limit(1)
      .withColumn("user_id", lit(-1L))
      .withColumn("event_id", lit(-1L))
      .withColumn("ts", lit(new java.sql.Timestamp(maxTs.getTime + 2L * 3600 * 1000)))
      .write.mode("append").parquet(dir)
    val streamed = spark.readStream
      .schema(spark.read.parquet(dir).schema).parquet(dir)
    val q = EventStream.transitions(streamed)
      .writeStream.outputMode("append")
      .format("memory").queryName("trans")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("trans").filter($"user_id" >= 0)
      .groupBy($"from_type", $"to_type").agg(count(lit(1)).as("n"))
      .as[(String, String, Long)].collect().sortBy(r => (r._1, r._2))
    val want = graft.operators.Analytics3.q39Transitions(spark, sf)
      .select($"from_type", $"to_type", $"n")
      .as[(String, String, Long)].collect().sortBy(r => (r._1, r._2))
    assert(got.nonEmpty && got.sameElements(want),
      "streamed transition counts == batch q39")
  }

  test("late transition event threads through the lag chain correctly") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = Files.createTempDirectory("translate").toString
    val ckpt = Files.createTempDirectory("translate-ckpt").toString
    val out = Files.createTempDirectory("translate-out").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def writeBatch(rows: Seq[(Long, Long, java.sql.Timestamp, String)]): Unit =
      rows.toDF("user_id", "event_id", "ts", "event_type")
        .repartition(1).write.mode("append").parquet(dir)
    def runOnce(): Unit = {
      val streamed = spark.readStream
        .schema(spark.read.parquet(dir).schema).parquet(dir)
      val q = EventStream.transitions(streamed, watermark = "1 hour").toDF()
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.write.mode("append").parquet(out))
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // batch 1: view @10:00, purchase @12:00 — an eager apply would
    // emit view→purchase, irrevocably wrong
    writeBatch(Seq(
      (7L, 1L, ts("2024-01-01 10:00:00"), "view"),
      (7L, 2L, ts("2024-01-01 12:00:00"), "purchase")))
    runOnce()
    // batch 2: the LATE middle event @11:30 (allowed by the 1-h
    // watermark) — truth is view→click→purchase
    writeBatch(Seq((7L, 3L, ts("2024-01-01 11:30:00"), "click")))
    runOnce()
    // batch 3: sentinel closes the watermark
    writeBatch(Seq((-1L, 9L, ts("2024-01-01 18:00:00"), "view")))
    runOnce()
    val got = spark.read.parquet(out).filter($"user_id" === 7L)
      .select($"event_id", $"from_type", $"to_type")
      .as[(Long, String, String)].collect().sortBy(_._1)
    assert(got.toSeq === Seq((2L, "click", "purchase"), (3L, "view", "click")),
      "the late event must re-thread the lag chain")
  }
}
