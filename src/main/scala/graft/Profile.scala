package graft

import graft.functions.TextFns._
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-timing for operator tuning (not part of the driver
  * contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.prepare(spark)

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }

    val docs = Tables.documents(spark, dir)
    time("docs.count")(docs.count())
    val sh = docShingles(docs)
    time("shingles.count")(sh.count())
    val sh2 = sh.persist()
    sh2.count()
    val v = vocab(sh2)
    time("vocab.count")(v.count())
    val st = sh2.join(v, "term").select("doc_id", "tid")
    time("st.count")(st.count())
    val sig = st.crossJoin(spark.range(16).select(col("id").cast("int").as("i")))
      .groupBy("doc_id", "i")
      .agg(min(affineHash(col("i"), col("tid"))).as("sig"))
    time("sig.count")(sig.count())
    val sigP = sig.persist()
    sigP.count()
    val bands = sigP.withColumn("band", expr("i div 2"))
      .groupBy("doc_id", "band")
      .agg(array_join(transform(array_sort(collect_list(struct(col("i"), col("sig")))),
        x => x.getField("sig").cast("string")), ",").as("bandkey"))
    time("bands.count")(bands.count())
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bandkey") === col("b.bandkey") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct()
    time("cand.count")(cand.count())
    val sa = sigP.select(col("doc_id").as("doc_a"), col("i"), col("sig").as("sig_a"))
    val sb = sigP.select(col("doc_id").as("doc_b"), col("i"), col("sig").as("sig_b"))
    val est = cand.join(sa, "doc_a").join(sb, Seq("doc_b", "i"))
      .groupBy("doc_a", "doc_b")
      .agg((sum(when(col("sig_a") === col("sig_b"), 1).otherwise(0)) / 16.0).as("est_jaccard"))
    time("est.count")(est.count())
    spark.stop()
  }
}

/** Warm-pass curve for one SparkEntry/bench query — the idle-drift
  * profiling recipe (PLANS round-13 #1): N passes with the OpCache
  * RETAINED across passes (bench-like adjacency), printing each wall
  * so a rising 3-pass median can be split into "descending JIT/cache
  * shoulder" vs genuine growth. Usage:
  * `runMain graft.ProfilePasses <query> [passes]` with
  * SPARK_GRAFT_SF_DIR set. Not part of the driver contract. */
/** Planning-vs-execution split for named queries — the round-17
  * diagnostic (a sub-second wall invariant to data size AND
  * partitioning is QUERY PLANNING, not execution) swept as a tool
  * (VERDICT r17 #3). Per query, after one warm pass:
  *  - `build`: constructing the DataFrame (includes any bounded
  *    control-state collects — t29's 12 merge rows, etc.);
  *  - `plan`: bare `.rdd` conversion on a fresh frame — full
  *    analysis/optimization/physical planning + RDD DAG, NO job;
  *  - `count`: a fresh frame executed end-to-end (re-plans, so
  *    exec-only ≈ count − plan).
  * Medians over `reps` fresh frames (each `count()` builds a NEW
  * plan — instance-level queryExecution caching never helps).
  * Usage: `runMain graft.PlanSplit <query> [query ...]` with
  * SPARK_GRAFT_SF_DIR set. Not part of the driver contract. */
object PlanSplit {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq
      else Seq("qa07_hll_distinct", "d03_simhash", "mm09_phash",
        "t29_trained_tokens", "t31_frozen_tokens")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(cores = 32, appName = "graft-plansplit")
    val reps = 5
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    names.foreach { name =>
      Bench.prepareFixture(spark, dir, name)
      val fn = Bench.benchOnly.getOrElse(name, SparkEntry.queries(name))
      fn(spark, dir).count() // warm: JIT, codegen cache, file listing
      val builds = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); fn(spark, dir)
        (System.nanoTime() - t0) / 1e9
      }
      val plans = (1 to reps).map { _ =>
        val df = fn(spark, dir)
        val t0 = System.nanoTime(); df.rdd
        (System.nanoTime() - t0) / 1e9
      }
      val counts = (1 to reps).map { _ =>
        val df = fn(spark, dir)
        val t0 = System.nanoTime(); df.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"""{"metric":"plan_split","query":"$name","sf":"$dir",${""
        }"build":${med(builds)}%.3f,"plan":${med(plans)}%.3f,${""
        }"count":${med(counts)}%.3f,"exec_est":${
        math.max(0.0, med(counts) - med(plans))}%.3f}""")
    }
    spark.stop()
  }
}

object ProfilePasses {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("p21_context_assembly")
    val passes = args.lift(1).map(_.toInt).getOrElse(8)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(cores = 32, appName = "graft-profile")
    // land the entry's untimed fixture exactly as the bench would
    // (round 15: fixture-dependent entries — frozen indexes, the PNG
    // corpus, the maillog spool — previously threw here)
    Bench.prepareFixture(spark, dir, name)
    val fn = Bench.benchOnly.getOrElse(name, SparkEntry.queries(name))
    val walls = (1 to passes).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"""{"metric":"pass_curve","query":"$name","sf":"$dir","walls":[${
      walls.map(w => f"$w%.3f").mkString(",")}]}""")
    spark.stop()
  }
}
