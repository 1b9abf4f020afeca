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
}
