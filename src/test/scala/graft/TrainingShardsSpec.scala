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

  test("JSONL ship step round-trips the same corpus as the parquet ship") {
    val base = java.nio.file.Files.createTempDirectory("shipj").toString
    val pq = Pipeline.writeTrainingShards(spark, sf, base + "/pq").collect()
    val jl = Pipeline.writeJsonlShards(spark, sf, base + "/jl").collect()
    assert(pq.map(_.toString).sorted.sameElements(jl.map(_.toString).sorted),
      "jsonl manifest must equal the parquet manifest")

    // the payload itself survives the text format byte-for-byte
    val a = spark.read.parquet(base + "/pq")
      .select(col("doc_id").cast("long"), col("text")).collect()
    val b = spark.read.json(base + "/jl")
      .select(col("doc_id").cast("long"), col("text")).collect()
    assert(a.map(_.toString).sorted.sameElements(b.map(_.toString).sorted))

    val files = new java.io.File(base + "/jl/shard=0").listFiles()
      .filter(_.getName.endsWith(".json"))
    assert(files.nonEmpty, "shard dirs must hold line-delimited json parts")
  }
}
