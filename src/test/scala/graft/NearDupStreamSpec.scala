package graft

import graft.streaming.NearDupStream
import java.nio.file.Files
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Incremental streaming near-dup: two AvailableNow runs over one
  * checkpoint must together find exactly the batch candidate set —
  * with the second run touching only the NEW documents (history lives
  * in bucket state, not in re-reads). */
class NearDupStreamSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  test("two incremental runs reproduce the batch candidate set") {
    val dir = Files.createTempDirectory("nd-in").toFile
    val ckpt = Files.createTempDirectory("nd-ckpt").toString
    val out = Files.createTempDirectory("nd-out").toString

    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").filter($"doc_id" < 250)
    val half1 = docs.filter($"doc_id" < 125)
    val half2 = docs.filter($"doc_id" >= 125)
    half1.coalesce(1).write.json(new java.io.File(dir, "chunk1").toString)

    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema)
        .json(dir.getAbsolutePath + "/*")
      val q = NearDupStream.candidates(stream).toDF()
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .format("parquet")
        .option("path", out)
        .start()
      q.awaitTermination()
    }

    runOnce()
    val firstRunPairs = spark.read.parquet(out)
      .select("doc_a", "doc_b").distinct().as[(Long, Long)].collect().toSet

    half2.coalesce(1).write.json(new java.io.File(dir, "chunk2").toString)
    runOnce()

    val streamed = spark.read.parquet(out)
      .select("doc_a", "doc_b").distinct().as[(Long, Long)].collect().toSet
    val batch = NearDupStream.batchCandidates(docs)
      .as[(Long, Long)].collect().toSet

    assert(streamed == batch,
      s"streamed ${streamed.size} pairs != batch ${batch.size}")
    assert(batch.nonEmpty, "fixture produced no near-dup candidates")

    // incrementality: everything the second run added involves a
    // second-half doc — the first half was served from state alone
    val added = streamed -- firstRunPairs
    assert(added.nonEmpty, "second run found no cross-increment pairs")
    assert(added.forall { case (a, b) => a >= 125 || b >= 125 })

    // est_jaccard agrees with direct signature agreement per pair
    val est = spark.read.parquet(out)
      .select("doc_a", "doc_b", "est_jaccard").distinct()
    val sigs = NearDupStream.withSignatures(docs)
    val sigMap = sigs.collect()
      .map(r => r.getLong(0) -> (1 to 16).map(r.getLong).toSeq).toMap
    est.as[(Long, Long, Double)].collect().foreach { case (a, b, e) =>
      val expect = sigMap(a).zip(sigMap(b)).count { case (x, y) => x == y } / 16.0
      assert(e == expect, s"pair ($a,$b) est_jaccard $e != $expect")
    }
  }

  test("native MinhashSigs equals the 16-lambda Column spelling bit-for-bit") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFns
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text")
    // the legacy Column spelling (rounds 9–16) as the reference:
    // md5-prefix ids + 16 interpreted affine array-mins
    val legacySigCols = (0 until 16).map { i =>
      array_min(transform(col("ids"),
        x => TextFns.affineHash(lit(i), x))).as(s"sig_$i")
    }
    val legacy = docs
      .select(col("doc_id"), TextFns.tokens(col("text")).as("t"))
      .select(col("doc_id"), TextFns.shingleArray(col("t"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"),
        array_distinct(transform(col("sh"),
          s => conv(substring(md5(s), 1, 15), 16, 10).cast("long")
            % lit(TextFns.HashP))).as("ids"))
      .select(col("doc_id") +: legacySigCols: _*)
      .collect().map(_.toString).sorted.toSeq
    val native = NearDupStream.withSignatures(docs)
      .collect().map(_.toString).sorted.toSeq
    assert(native.nonEmpty && native == legacy,
      "the native expression must reproduce every signature bit-for-bit")
    // and through the SQL registration
    docs.createOrReplaceTempView("mh_docs")
    graft.plans.GraftExtensions.register(spark)
    val viaSql = spark.sql(
      """SELECT doc_id, minhash_sigs(filter(transform(sequence(1, size(t) - 2),
        |  i -> concat_ws(' ', element_at(t, i), element_at(t, i + 1), element_at(t, i + 2))),
        |  x -> true)) AS sigs
        |FROM (SELECT doc_id, split(trim(text), '\\s+') AS t FROM mh_docs)
        |WHERE size(t) >= 3""".stripMargin)
      .selectExpr("doc_id", "element_at(sigs, 1) AS sig_0")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nativeS0 = NearDupStream.withSignatures(docs)
      .select("doc_id", "sig_0")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql == nativeS0, "the SQL registration must serve the same values")
  }

  test("state TTL evicts bucket history between increments") {
    val dir = Files.createTempDirectory("ttl-in").toFile
    val ckpt = Files.createTempDirectory("ttl-ckpt").toString
    val out = Files.createTempDirectory("ttl-out").toString

    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").filter($"doc_id" < 250)
    val half1 = docs.filter($"doc_id" < 125)
    val half2 = docs.filter($"doc_id" >= 125)

    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema)
        .json(dir.getAbsolutePath + "/*")
      val q = NearDupStream.candidates(stream, stateTtlMs = 100L).toDF()
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .format("parquet").option("path", out)
        .start()
      NearDupStream.stopWhenDrained(Seq(q))
      q.awaitTermination()
    }

    half1.coalesce(1).write.json(new java.io.File(dir, "chunk1").toString)
    runOnce()
    Thread.sleep(1000) // let every chunk1 entry age past the 100ms TTL
    half2.coalesce(1).write.json(new java.io.File(dir, "chunk2").toString)
    runOnce()

    val streamed = spark.read.parquet(out)
      .select("doc_a", "doc_b").distinct().as[(Long, Long)].collect().toSet
    // cross-increment pairs are gone (history evicted) …
    assert(streamed.forall { case (a, b) => (a < 125) == (b < 125) },
      s"TTL must evict chunk1 state: ${streamed.filter { case (a, b) => (a < 125) != (b < 125) }}")
    // … while within-increment pairs of BOTH halves were still found
    val batchPerHalf = NearDupStream.batchCandidates(half1)
      .union(NearDupStream.batchCandidates(half2))
      .as[(Long, Long)].collect().toSet
    assert(streamed == batchPerHalf)
  }

  test("one growing JSONL corpus file feeds incremental near-dup via FileTailer") {
    val src = Files.createTempFile("docs", ".jsonl")
    val spool = Files.createTempDirectory("nd-spool").toString
    val ckpt = Files.createTempDirectory("ndt-ckpt").toString
    val out = Files.createTempDirectory("ndt-out").toString

    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").filter($"doc_id" < 120).orderBy("doc_id")
    val lines = docs.toJSON.collect()
    val (first, rest) = lines.splitAt(60)

    // first append ends mid-line: the tailer must withhold the
    // incomplete JSON document instead of spooling a corrupt row
    Files.write(src, (first.mkString("\n") + "\n" + rest.head.take(10)).getBytes)
    val tailer = new graft.streaming.FileTailer(src.toString, spool)
    tailer.poll()
    assert(spark.read.text(spool + "/*.log").count() === 60,
      "partial trailing line must not be spooled")

    def runOnce(): Unit = {
      val q = NearDupStream.candidates(
          spark.readStream.schema(schema).json(spool + "/*.log")).toDF()
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .format("parquet").option("path", out)
        .start()
      q.awaitTermination()
    }
    runOnce()

    // complete the partial line and append the remainder
    Files.write(src,
      (rest.head.drop(10) + "\n" + rest.tail.mkString("\n") + "\n").getBytes,
      java.nio.file.StandardOpenOption.APPEND)
    tailer.poll()
    tailer.close()
    runOnce()

    val streamed = spark.read.parquet(out)
      .select("doc_a", "doc_b").distinct().as[(Long, Long)].collect().toSet
    val batch = NearDupStream.batchCandidates(docs).as[(Long, Long)].collect().toSet
    assert(streamed == batch,
      "no line lost or duplicated across the partial-line boundary")
  }

  test("malformed and null-text rows are dropped, not crashed on") {
    val dir = Files.createTempDirectory("bad-in").toFile
    val ckpt = Files.createTempDirectory("bad-ckpt").toString
    val out = Files.createTempDirectory("bad-out").toString
    // two real near-dup docs, a null text, a short doc (no 3-shingle),
    // and a line that isn't JSON at all
    Files.write(new java.io.File(dir, "chunk.json").toPath,
      ("""{"doc_id": 1, "text": "a b c d e f g h"}""" + "\n" +
       """{"doc_id": 2, "text": "a b c d e f g h"}""" + "\n" +
       """{"doc_id": 3, "text": null}""" + "\n" +
       """{"doc_id": 4, "text": "xy"}""" + "\n" +
       """this is not json""").getBytes)
    val q = NearDupStream.candidates(
        spark.readStream.schema(schema).json(dir.getAbsolutePath)).toDF()
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .format("parquet").option("path", out)
      .start()
    q.awaitTermination()
    val pairs = spark.read.parquet(out)
      .select("doc_a", "doc_b").distinct().as[(Long, Long)].collect().toSet
    assert(pairs == Set(1L -> 2L),
      "identical docs pair up; null/short/corrupt rows are dropped")
  }

  test("watermark-bounded dedup: near-term copies suppressed, horizon-old copies re-emitted") {
    import org.apache.spark.sql.types.TimestampType
    val tsSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("ts", TimestampType)))
    val dir = Files.createTempDirectory("wm-in").toFile
    val ckpt = Files.createTempDirectory("wm-ckpt").toString
    val out = Files.createTempDirectory("wm-out").toString

    def iso(s: Long) = java.time.Instant.ofEpochSecond(s).toString
    def writeChunk(name: String, rows: Seq[(Long, String, Long)]): Unit =
      Files.write(new java.io.File(dir, name).toPath,
        rows.map { case (id, t, s) =>
          s"""{"doc_id": $id, "text": "$t", "ts": "${iso(s)}"}"""
        }.mkString("\n").getBytes)

    def runOnce(): Unit = {
      val q = NearDupStream.exactDedupWithinWatermark(
          spark.readStream.schema(tsSchema).json(dir.getAbsolutePath),
          "ts", "10 seconds")
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .format("parquet").option("path", out)
        .start()
      q.awaitTermination()
    }

    // two copies of A inside one horizon -> one emission (times sit
    // above epoch 0: the INITIAL watermark is the epoch, and events
    // at-or-before the watermark are discarded as late)
    writeChunk("c1", Seq((1L, "alpha", 100L), (2L, "alpha", 101L), (3L, "beta", 100L)))
    runOnce()
    // advances the watermark far past A's entry
    writeChunk("c2", Seq((4L, "gamma", 1100L)))
    runOnce()
    // A returns long past the horizon: state was evicted -> re-emit
    writeChunk("c3", Seq((5L, "alpha", 2100L)))
    runOnce()

    val counts = spark.read.parquet(out).groupBy("text").count()
      .as[(String, Long)].collect().toMap
    assert(counts == Map("alpha" -> 2L, "beta" -> 1L, "gamma" -> 1L),
      s"alpha once per horizon, others once: $counts")
  }

  test("streaming exact dedup suppresses copies across runs") {
    val dir = Files.createTempDirectory("ed-in").toFile
    val ckpt = Files.createTempDirectory("ed-ckpt").toString
    val out = Files.createTempDirectory("ed-out").toString

    def writeChunk(name: String, rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text").coalesce(1)
        .write.json(new java.io.File(dir, name).toString)

    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema)
        .json(dir.getAbsolutePath + "/*")
      val q = NearDupStream.exactDedup(stream)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .format("parquet").option("path", out)
        .start()
      q.awaitTermination()
    }

    writeChunk("c1", Seq(1L -> "alpha beta", 2L -> "alpha beta", 3L -> "gamma"))
    runOnce()
    writeChunk("c2", Seq(4L -> "alpha beta", 5L -> "gamma", 6L -> "delta"))
    runOnce()

    val emitted = spark.read.parquet(out)
      .select("doc_id", "text").as[(Long, String)].collect().toSet
    // deterministic keeper: the MIN doc_id of each hash's first batch
    // (1 beats its in-batch copy 2; 4/5 are cross-run copies served
    // from state; 6 is genuinely new)
    assert(emitted == Set(1L -> "alpha beta", 3L -> "gamma", 6L -> "delta"))
  }
}
