package graft

import org.apache.spark.sql.SparkSession

/** Session tuning applied by every graft entry point.
  *
  * Queries may be handed an externally-built `SparkSession` (the
  * driver's Verify/Bench harness), so tuning is applied idempotently
  * through runtime-settable confs rather than builder-time ones.
  */
object GraftSession {

  /** Confs every graft operator relies on. Safe to call repeatedly. */
  def prepare(spark: SparkSession): SparkSession = {
    // testdata events.parquet carries INT64 nanosecond timestamps,
    // which Spark only reads via this legacy conf (as raw nanos).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark
  }

  /** Local session for tests / ad-hoc runs. */
  def local(cores: Int = 4, appName: String = "graft"): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    prepare(spark)
  }
}
