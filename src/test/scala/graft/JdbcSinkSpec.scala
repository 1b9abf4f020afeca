package graft

import graft.streaming.JdbcUpsertSink
import java.sql.DriverManager

/** Integration test of the executor-side JDBC write path against an
  * in-memory Derby database (no MySQL ships in this container; the
  * MySQL single-statement upsert SQL is covered by unit assertions in
  * MaillogStreamSpec). */
class JdbcSinkSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"

  test("generic-dialect upsert round-trips through a real database") {
    val conn = DriverManager.getConnection(url)
    conn.createStatement().execute(
      "CREATE TABLE messages (qid VARCHAR(16) PRIMARY KEY, sender VARCHAR(64), size_b BIGINT)")
    conn.close()

    val sink = new JdbcUpsertSink(url, "messages", Seq("qid"), "", "", dialect = "generic")

    sink.write(Seq(("AB1", "a@x.com", 100L), ("CD2", "b@y.com", 200L))
      .toDF("qid", "sender", "size_b"), 0L)
    // second batch: update AB1, insert EF3 — the reference's upsert
    sink.write(Seq(("AB1", "a@x.com", 150L), ("EF3", "c@z.com", 300L))
      .toDF("qid", "sender", "size_b"), 1L)

    val got = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "messages").load()
      .as[(String, String, Long)].collect().sortBy(_._1)
    assert(got === Array(("AB1", "a@x.com", 150L), ("CD2", "b@y.com", 200L),
      ("EF3", "c@z.com", 300L)))
  }

  test("all-columns-are-keys table deduplicates via exists-check") {
    val conn = DriverManager.getConnection(url)
    conn.createStatement().execute(
      "CREATE TABLE logs (host VARCHAR(32) NOT NULL, msg VARCHAR(128) NOT NULL, PRIMARY KEY (host, msg))")
    conn.close()

    val sink = new JdbcUpsertSink(url, "logs", Seq("host", "msg"), "", "", dialect = "generic")
    val rows = Seq(("mx1", "hello"), ("mx2", "world")).toDF("host", "msg")
    sink.write(rows, 0L)
    sink.write(rows, 1L) // replay: must not raise or duplicate

    val n = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "logs").load().count()
    assert(n === 2)
  }

  test("mysql dialect absorbs duplicates on all-columns-key tables") {
    val sink = new JdbcUpsertSink("jdbc:mysql://h/db", "logs", Seq("h", "m"), "u", "p")
    // a bare INSERT would raise on the duplicates the table dedups
    assert(sink.upsertSql(Seq("h", "m")) ===
      "INSERT INTO logs (h, m) VALUES (?, ?) ON DUPLICATE KEY UPDATE h=h")
  }
}
