package graft

import graft.streaming.{JdbcUpsertSink, MaillogDaemon}
import java.nio.file.Files
import org.apache.spark.sql.streaming.Trigger

/** End-to-end execution of the sink's MYSQL dialect — the
  * reference's actual sink (maillog2db.go:142-166 via GORM on MySQL)
  * — against [[MockMySql]], which implements MySQL's documented
  * `INSERT … ON DUPLICATE KEY UPDATE` semantics for the statement
  * shapes the sink generates. The generic dialect has real-database
  * coverage in JdbcSinkSpec (Derby); this closes the gap where the
  * single-statement batched ODKU branch never executed anywhere. */
class MySqlDialectSpec extends SparkSpec {
  import spark.implicits._

  MockMySql.init()
  private val url = MockMySql.UrlPrefix + "db"

  test("managed table: auto-create + batched ODKU upsert round-trips") {
    MockMySql.clear()
    val sink = new JdbcUpsertSink(url, "my_messages", Seq("qid"), "", "",
      dialect = "mysql")
    sink.write(Seq(("AB1", "a@x.com", 100L), ("CD2", "b@y.com", 200L))
      .toDF("qid", "sender", "size_b"), 0L)
    sink.write(Seq(("AB1", "a@x.com", 150L), ("EF3", "c@z.com", 300L))
      .toDF("qid", "sender", "size_b"), 1L)

    val rows = MockMySql.rowsOf("my_messages").sortBy(_("qid").toString)
    assert(rows.map(r => (r("qid"), r("sender"), r("size_b"))) === Seq(
      ("AB1", "a@x.com", 150L), ("CD2", "b@y.com", 200L), ("EF3", "c@z.com", 300L)))
    // bookkeeping parity with the reference schema (go:61-110):
    // auto-increment id, created/updated marks, the unique key hash
    val ab1 = rows.head
    assert(ab1("id").asInstanceOf[Long] > 0)
    assert(ab1("row_key_hash").toString.length === 64)
    val created = ab1("row_created_at").asInstanceOf[java.sql.Timestamp]
    val updated = ab1("row_updated_at").asInstanceOf[java.sql.Timestamp]
    assert(updated.after(created), "the ODKU update must advance row_updated_at only")
    val cd2 = rows(1)
    assert(cd2("row_updated_at").asInstanceOf[java.sql.Timestamp]
      .before(updated),
      "an untouched row keeps its original (older) marks")
  }

  test("merge policies through ODKU: coalesce keeps stored, max never regresses") {
    MockMySql.clear()
    // the TTL-eviction scenario (mirrors the Derby generic-dialect
    // test): a later batch re-emits a row rebuilt from EMPTY state
    val sink = new JdbcUpsertSink(url, "my_mp", Seq("qid"), "", "",
      dialect = "mysql",
      mergePolicy = Map("sender" -> "coalesce", "n_lines" -> "max"))
    sink.write(Seq(("AB1", Some("a@x.com"), 5L))
      .toDF("qid", "sender", "n_lines"), 0L)
    sink.write(Seq(("AB1", None: Option[String], 1L))
      .toDF("qid", "sender", "n_lines"), 1L)
    val got = MockMySql.rowsOf("my_mp")
      .map(r => (r("qid"), r("sender"), r("n_lines")))
    assert(got === Seq(("AB1", "a@x.com", 5L)),
      "null must not clobber, counter must not regress")
    sink.write(Seq(("AB1", Some("b@y.com"), 9L))
      .toDF("qid", "sender", "n_lines"), 2L)
    val got2 = MockMySql.rowsOf("my_mp").map(r => (r("sender"), r("n_lines")))
    assert(got2 === Seq(("b@y.com", 9L)))
  }

  test("managed all-columns-key table absorbs replays and in-batch duplicates") {
    MockMySql.clear()
    val sink = new JdbcUpsertSink(url, "my_logs", Seq("host", "msg"), "", "",
      dialect = "mysql")
    val rows = Seq(("mx1", "hello"), ("mx2", "world"), ("mx1", "hello"))
      .toDF("host", "msg")
    sink.write(rows, 0L)
    sink.write(rows, 1L) // replay: must not raise or duplicate
    assert(MockMySql.rowsOf("my_logs").size === 2)
  }

  test("external table: ODKU conflicts on the table's own unique key") {
    MockMySql.clear()
    // pre-existing table WITHOUT row_key_hash — the sink must fall
    // back to the external path and upsert on the natural key
    MockMySql.createTable("ext_msgs", Seq("qid", "sender", "size_b"),
      unique = Seq("qid"))
    val sink = new JdbcUpsertSink(url, "ext_msgs", Seq("qid"), "", "",
      dialect = "mysql")
    sink.write(Seq(("AB1", "a@x.com", 100L)).toDF("qid", "sender", "size_b"), 0L)
    sink.write(Seq(("AB1", "a@x.com", 150L)).toDF("qid", "sender", "size_b"), 1L)
    val rows = MockMySql.rowsOf("ext_msgs")
    assert(rows.map(r => (r("qid"), r("size_b"))) === Seq(("AB1", 150L)))
    assert(!rows.head.contains("row_key_hash"))
  }

  test("daemon fills all four reference tables through the mysql dialect") {
    MockMySql.clear()
    val dir = Files.createTempDirectory("maillog-mysql").toString
    val ckpt = Files.createTempDirectory("ckpt-mysql").toString
    Files.write(java.nio.file.Paths.get(dir, "maillog"),
      Seq(
        "Jan 02 03:04:05 mx1 postfix/smtpd[101]: AB1: client=host1.example.com[10.0.0.1]",
        "Jan 02 03:04:06 mx1 postfix/qmgr[102]: AB1: from=<a@example.com>, size=100, nrcpt=1 (queue active)",
        "Jan 02 03:04:07 mx1 postfix/smtp[103]: AB1: to=<b@example.org>, relay=r.example.net[10.1.0.1]:25, delay=1.5, delays=0.1/0.2/0.3/0.4, dsn=2.0.0, status=sent (250 ok)",
        "Jan 02 03:04:07 mx1 postfix/smtp[103]: AB1: to=<b@example.org>, relay=r.example.net[10.1.0.1]:25, delay=1.5, delays=0.1/0.2/0.3/0.4, dsn=2.0.0, status=sent (250 ok)"
      ).mkString("\n").getBytes)

    val qs = MaillogDaemon.start(spark,
      args = Array("-maillog", dir, "-checkpoint", ckpt,
        "-db-url", url, "-db-dialect", "mysql",
        "-dbuser", "", "-dbpass", "", "-year", "2024"),
      trigger = Trigger.AvailableNow())
    qs.foreach(_.awaitTermination())

    assert(MockMySql.rowsOf("pfmaillog2db_logs").size === 3,
      "in-stream full-tuple dedup drops the duplicated smtp line")
    val clients = MockMySql.rowsOf("pfmaillog2db_clients")
    assert(clients.size === 1)
    assert(clients.head("client_rdns") === "host1.example.com")
    val messages = MockMySql.rowsOf("pfmaillog2db_messages")
    assert(messages.size === 1)
    assert(messages.head("message_queueid") === "AB1")
    assert(messages.head("message_size") === 100L)
    val deliveries = MockMySql.rowsOf("pfmaillog2db_deliveries")
    assert(deliveries.size === 1,
      "duplicate delivery absorbed by the ODKU on the unique key hash")
    assert(deliveries.head("delivery_status") === "sent")
  }
}
