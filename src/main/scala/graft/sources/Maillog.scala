package graft.sources

import graft.functions.MaillogParse
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Maillog text sources.
  *
  * Real deployments read log files (`readLines` batch /
  * `graft.streaming.MaillogStream` for tailing). The driver's testdata
  * has no maillog, so `synthesizeLines` renders deterministic
  * Postfix-format lines FROM the events table — one line per event,
  * branch chosen by event_type — exercising every parse branch of the
  * reference. The DuckDB oracle reproduces the identical rendering
  * (`MaillogOps.linesCte`), so synthesize→parse→aggregate is exactly
  * comparable across engines.
  */
object Maillog {

  /** Batch read of an existing maillog file/directory. Compressed
    * rotations (.gz etc.) are decoded transparently by the text
    * source. */
  def readLines(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path).withColumnRenamed("value", "line")

  /** JSON-lines-shipped logs (filebeat/journald export style): the
    * raw syslog line travels in `field`. */
  def readJsonLines(spark: SparkSession, path: String,
                    field: String = "message"): DataFrame =
    spark.read.json(path).select(col(field).as("line"))

  /** CSV-shipped logs with a header; the raw line in `field`. */
  def readCsvLines(spark: SparkSession, path: String,
                   field: String = "message"): DataFrame =
    spark.read.option("header", "true").csv(path).select(col(field).as("line"))

  /** One deterministic Postfix line per event. Queue ids are taken
    * mod 311 so ids recur across events and the message-merge
    * semantics (reference's upsert-by-queueid) actually merge. */
  def synthesizeLines(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val qid = lpad(hex(col("event_id") % 311), 6, "0")
    val host = concat(lit("mx"), (col("user_id") % 4).cast("string"))
    val pid = (lit(100) + col("user_id") % 50).cast("string")
    val tsStr = date_format(col("ts"), "MMM dd HH:mm:ss")
    val size = round(col("value") * 100).cast("long")
    val cents = round(col("value") * 7).cast("long")
    val delay = concat(floor(cents / 100).cast("long").cast("string"), lit("."),
      lpad((cents % 100).cast("string"), 2, "0"))
    val dsn = when(col("event_id") % 7 === 0, "4.0.0").otherwise("2.0.0")
    val status = when(col("event_id") % 7 === 0, "deferred").otherwise("sent")

    val process = concat(lit("postfix/"),
      when(col("event_type") === "signup", "smtpd")
        .when(col("event_type") === "purchase", "qmgr")
        .when(col("event_type") === "view", "smtp")
        .when(col("event_type") === "click", "cleanup")
        .otherwise("local"))

    val rest =
      when(col("event_type") === "signup",
        concat(qid, lit(": client=host"), col("user_id").cast("string"),
          lit(".example.com[10.0."), (col("user_id") % 256).cast("string"),
          lit("."), (col("event_id") % 256).cast("string"), lit("]")))
      .when(col("event_type") === "purchase",
        concat(qid, lit(": from=<user"), (col("user_id") % 20).cast("string"),
          lit("@example.com>, size="), size.cast("string"),
          lit(", nrcpt="), (lit(1) + col("event_id") % 3).cast("string"),
          lit(" (queue active)")))
      .when(col("event_type") === "view",
        concat(qid, lit(": to=<dest"), (col("user_id") % 30).cast("string"),
          lit("@example.org>, relay=relay"), (col("user_id") % 5).cast("string"),
          lit(".example.net[10.1.0."), (col("user_id") % 5).cast("string"),
          lit("]:25, delay="), delay,
          lit(", delays=0.01/0.02/0.03/0.04, dsn="), dsn,
          lit(", status="), status,
          lit(" (250 2.0.0 Ok: queued as "), qid, lit(")")))
      .when(col("event_type") === "click",
        concat(qid, lit(": message-id=<"), qid, lit("."),
          col("event_id").cast("string"), lit("@"), host, lit(">")))
      .otherwise(
        concat(lit("warning: process failed code="),
          (col("event_id") % 17).cast("string")))

    ev.select(concat(tsStr, lit(" "), host, lit(" "), process,
      lit("["), pid, lit("]: "), rest).as("line"))
  }

  /** Year the synthesized benchmark corpus lives in (events data is
    * 2024) — the oracle pins it for determinism. */
  val SynthYear = 2024

  /** Header-parse a `line` DataFrame; non-matching lines dropped
    * (reference skips them, maillog2db.go:181). Pure projection, one
    * regex pass per line via [[graft.plans.RegexpExtractGroups]].
    *
    * `year` fills the year Postfix omits. `0` (the default) means
    * "wall clock at parse time" — like the reference
    * (maillog2db.go:444), and evaluated per micro-batch in streaming
    * so a long-running daemon rolls over New Year correctly instead
    * of freezing on its startup year. Unlike the reference, the
    * rollover is applied per LINE with the standard syslog
    * heuristic: a stamped time more than 2 days in the FUTURE of the
    * wall clock gets the previous year. Without this, a Dec 31 line
    * parsed in a micro-batch that runs just after midnight Jan 1
    * would be stamped ~a year ahead — and one such line poisons the
    * daemon's event-time watermark a year forward, silently dropping
    * every subsequent on-time line for months. */
  /** The syslog year-rollover heuristic (year=0 path), with `now`
    * injected so both directions are testable at any wall-clock date:
    *  - a stamp >2 days in the FUTURE of `now` can only be LAST
    *    year's (a Dec 31 line parsed just after midnight Jan 1) —
    *    without the shift, one such line poisons the daemon's
    *    event-time watermark a year forward;
    *  - a stamp >330 days in the PAST is really a slightly-AHEAD
    *    source clock across New Year (a Jan 01 line parsed while this
    *    host still says Dec 31) — without the shift it is misdated a
    *    year back and watermark-dropped. The 330-day threshold keeps
    *    replays of months-old logs (a legitimate year=0 use)
    *    un-shifted. */
  private[graft] def yearRollover(ts0: Column, now: Column): Column =
    when(ts0 > now + expr("INTERVAL 2 DAYS"), ts0 - expr("INTERVAL 1 YEAR"))
      .when(ts0 < now - expr("INTERVAL 330 DAYS"), ts0 + expr("INTERVAL 1 YEAR"))
      .otherwise(ts0)

  def parsed(lines: DataFrame, year: Int = 0): DataFrame = {
    import graft.plans.RegexpExtractGroups.regexpGroups
    val yearCol =
      if (year > 0) lit(year.toString)
      else date_format(current_timestamp(), "yyyy")
    val stamped = lines
      .select(regexpGroups(col("line"), MaillogParse.HeaderRe).as("g"))
      .filter(col("g").isNotNull)
      .select(
        // try_: an impossible date ("Sep 31") must not throw under
        // ANSI mode — it parses to null and is dropped below (the
        // reference log.Fatal-s the whole daemon here, go:448)
        try_to_timestamp(
          concat(yearCol, lit(" "), col("g").getItem(1)),
          lit("yyyy MMM dd HH:mm:ss")).as("ts0"),
        col("g").getItem(2).as("log_mailhost"),
        col("g").getItem(3).as("log_process"),
        col("g").getItem(4).as("log_processid"),
        col("g").getItem(5).as("log_message"))
    val rolled =
      if (year > 0) stamped.withColumn("log_timestamp", col("ts0"))
      else stamped.withColumn("log_timestamp",
        yearRollover(col("ts0"), current_timestamp()))
    rolled
      .select("log_timestamp", "log_mailhost", "log_process",
        "log_processid", "log_message")
      .filter(col("log_timestamp").isNotNull)
  }
}
