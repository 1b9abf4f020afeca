package graft

import graft.operators.Pipeline
import org.apache.spark.sql.functions._

/** writeTrainingShards: the curate→shard→write ship step lands one
  * partition directory per shard and an accurate read-back manifest. */
class TrainingShardsSpec extends SparkSpec {

  test("curated train split ships as hash-sharded partition dirs") {
    val out = java.nio.file.Files.createTempDirectory("ship").toString + "/train"
    val manifest = Pipeline.writeTrainingShards(spark, sf, out).collect()

    val wantDocs = Pipeline.p01Curation(spark, sf)
      .filter(col("split") === "train").count()
    assert(manifest.map(_.getAs[Long]("n_docs")).sum == wantDocs,
      "manifest doc mass must equal the curated train split")

    // Hive layout: shard=N directories, prunable at planning time
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("shard=")).sorted
    assert(dirs.length == manifest.length)
    assert(dirs.forall(_.matches("shard=\\d+")))

    // shard membership is the p04 hash — stable across reruns
    val back = spark.read.parquet(out)
      .select(col("doc_id"), col("shard").cast("long").as("shard"))
    val bad = back.filter(
      pmod(col("doc_id") * 2654435761L, lit(4294967296L)) % 16 =!= col("shard"))
    assert(bad.isEmpty, "every row must sit in its hash shard")
  }
}
