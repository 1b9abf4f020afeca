package graft

import graft.sources.Maillog
import java.nio.file.Files
import java.util.zip.GZIPOutputStream

/** Log lines reach the parser from every shipping format a deployment
  * uses: plain text, gzipped rotations, JSON-lines, CSV. */
class SourcesSpec extends SparkSpec {

  private val line =
    "Jan 02 03:04:05 mx1 postfix/smtpd[101]: AB1: client=host1.example.com[10.0.0.1]"

  private def assertParses(df: org.apache.spark.sql.DataFrame): Unit = {
    val p = Maillog.parsed(df).collect()
    assert(p.length === 1)
    assert(p.head.getAs[String]("log_mailhost") === "mx1")
    assert(p.head.getAs[String]("log_processid") === "101")
  }

  test("plain text") {
    val f = Files.createTempFile("log", ".log")
    Files.write(f, line.getBytes)
    assertParses(Maillog.readLines(spark, f.toString))
  }

  test("gzipped rotation") {
    val f = Files.createTempFile("log", ".log.gz")
    val out = new GZIPOutputStream(Files.newOutputStream(f))
    out.write((line + "\n").getBytes)
    out.close()
    assertParses(Maillog.readLines(spark, f.toString))
  }

  test("json-lines shipping") {
    val f = Files.createTempFile("log", ".jsonl")
    Files.write(f,
      s"""{"host":"shipper1","message":"$line"}\n""".getBytes)
    assertParses(Maillog.readJsonLines(spark, f.toString))
  }

  test("csv shipping") {
    val f = Files.createTempFile("log", ".csv")
    Files.write(f, ("message\n\"" + line + "\"\n").getBytes)
    assertParses(Maillog.readCsvLines(spark, f.toString))
  }

  test("year=0 rollover: a far-future stamp gets the previous year") {
    import spark.implicits._
    // a line dated 10 days ahead of the wall clock can only be LAST
    // year's (syslog omits the year): e.g. a Dec 31 line parsed in a
    // micro-batch that runs after midnight Jan 1. Without the
    // rollover it would poison the daemon's watermark a year forward.
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("MMM dd HH:mm:ss", java.util.Locale.US)
    val now = java.time.ZonedDateTime.now(java.time.ZoneOffset.UTC)
    def render(t: java.time.ZonedDateTime) =
      s"${fmt.format(t)} mx1 postfix/smtpd[1]: Q: client=h[1.2.3.4]"
    val future = now.plusDays(10)
    val past = now.minusDays(1)
    val rows = Maillog.parsed(
        Seq(render(future), render(past)).toDF("line"))
      .select("log_timestamp").collect()
      .map(_.getTimestamp(0).toInstant).sortBy(_.toEpochMilli)
    assert(rows.length === 2)
    val nowMs = java.time.Instant.now()
    // both stamps must land in the past (within the last ~year)
    rows.foreach { t =>
      assert(t.isBefore(nowMs.plusSeconds(2 * 86400)),
        s"$t poisoned the event-time domain")
      assert(t.isAfter(nowMs.minusSeconds(367L * 86400)))
    }

    // both rollover directions, with `now` INJECTED (the mirror
    // branch is only reachable from a real wall clock near year-end:
    // it needs a stamp 330+ days behind in calendar order, which only
    // Dec-vs-Jan produces)
    import org.apache.spark.sql.functions.{col, lit, to_timestamp}
    def roll(stamp: String, now: String): java.sql.Timestamp =
      Seq((stamp, now)).toDF("s", "n")
        .select(Maillog.yearRollover(
          to_timestamp(col("s")), to_timestamp(col("n"))).as("t"))
        .head.getTimestamp(0)
    // Dec 31 line parsed just after midnight Jan 1 (stamped NEXT
    // year by the wall-clock year): back one year
    assert(roll("2027-12-31 23:59:58", "2027-01-01 00:00:05") ===
      java.sql.Timestamp.valueOf("2026-12-31 23:59:58"))
    // Jan 1 line from a slightly-ahead source clock parsed while this
    // host still says Dec 31 (stamped THIS year → ~364 days past):
    // forward one year
    assert(roll("2026-01-01 00:00:05", "2026-12-31 23:59:50") ===
      java.sql.Timestamp.valueOf("2027-01-01 00:00:05"))
    // a months-old replayed log line (within the 330-day window)
    // stays untouched
    assert(roll("2026-03-01 12:00:00", "2026-12-31 23:59:50") ===
      java.sql.Timestamp.valueOf("2026-03-01 12:00:00"))
  }
}
