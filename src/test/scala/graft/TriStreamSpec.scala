package graft

import graft.operators.Graph
import graft.sources.Tables
import graft.streaming.TriStream
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The streaming corpus-closing triangle screen must equal the batch
  * category row-for-row over the same frozen graph — the probe/verify
  * join algebra is literally shared (Graph.closedByCorpus), so this
  * pins the stream-static composition and checkpointed-restart replay
  * (stateless plan — replay safety is the sink's dedup problem; we
  * re-run AvailableNow over a split arrival stream and check the
  * union). */
class TriStreamSpec extends SparkSpec {

  private def newEdges(corpus: org.apache.spark.sql.DataFrame) =
    Graph.orderPairs(Tables.lineitem(spark, sf)
        .filter(col("l_orderkey") % 10 >= 8)
        .select(col("l_orderkey"), col("l_partkey")))
      .join(corpus, Seq("x", "y"), "left_anti")

  test("streamed closed triangles equal the batch category and g04's count") {
    val corpus = Graph.corpusEdgeIndex(spark, sf)
    val inc = newEdges(corpus)

    val dir = Files.createTempDirectory("tristream").toString
    inc.write.mode("overwrite").parquet(dir)
    val streamed = spark.readStream
      .schema(spark.read.parquet(dir).schema).parquet(dir)

    val q = TriStream.closedTriangles(streamed, corpus)
      .writeStream.outputMode("append")
      .format("memory").queryName("triv")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val got = spark.table("triv").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val want = Graph.closedByCorpus(inc, corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(got.nonEmpty && got.sameElements(want),
      "streamed closed triangles != batch category")
    val g04 = Graph.g04IncrementalTriangles(spark, sf).head()
    assert(got.length.toLong === g04.getLong(1), "count != g04 tri_1_new")
  }

  test("two-checkpoint replay over a split arrival stream still equals batch") {
    val corpus = Graph.corpusEdgeIndex(spark, sf)
    val inc = newEdges(corpus)

    val in = Files.createTempDirectory("trisplit").toString
    val ckpt = Files.createTempDirectory("trickpt").toString
    val out = Files.createTempDirectory("triout").toString
    val half = inc.filter((col("x") + col("y")) % 2 === 0)
    half.write.mode("overwrite").parquet(in)

    def runOnce(): Unit = {
      val streamed = spark.readStream
        .schema(spark.read.parquet(in).schema).parquet(in)
      val q = TriStream.closedTriangles(streamed, corpus)
        .writeStream.outputMode("append")
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runOnce()
    inc.filter((col("x") + col("y")) % 2 === 1)
      .write.mode("append").parquet(in)
    runOnce()

    val got = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val want = Graph.closedByCorpus(inc, corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(got.nonEmpty && got.sameElements(want),
      "split-stream union != batch category")
  }
}
