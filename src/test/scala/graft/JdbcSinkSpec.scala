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

  test("empty database: schema auto-created with bookkeeping columns, batched upsert") {
    // no CREATE TABLE here — the sink must do it (reference
    // AutoMigrate parity, maillog2db.go:163-166)
    val sink = new JdbcUpsertSink(url, "mgd_messages", Seq("qid"), "", "",
      dialect = "generic",
      createTypes = Map("qid" -> "VARCHAR(16)", "sender" -> "VARCHAR(64)"))

    sink.write(Seq(("AB1", "a@x.com", 100L), ("CD2", "b@y.com", 200L))
      .toDF("qid", "sender", "size_b"), 0L)
    sink.write(Seq(("AB1", "a@x.com", 150L), ("EF3", "c@z.com", 300L))
      .toDF("qid", "sender", "size_b"), 1L)

    val got = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "mgd_messages").load()
    assert(got.columns.map(_.toLowerCase).toSet ===
      Set("id", "qid", "sender", "size_b",
        "row_key_hash", "row_created_at", "row_updated_at"))
    val rows = got.collect().map(r => (
      r.getAs[String]("QID"), r.getAs[Long]("SIZE_B"),
      r.getAs[Long]("ID"), r.getAs[java.sql.Timestamp]("ROW_CREATED_AT"),
      r.getAs[java.sql.Timestamp]("ROW_UPDATED_AT")))
      .sortBy(_._1)
    assert(rows.map(t => (t._1, t._2)) ===
      Array(("AB1", 150L), ("CD2", 200L), ("EF3", 300L)),
      "second batch updates AB1 in place and inserts EF3")
    assert(rows.map(_._3).distinct.length === 3, "auto-increment ids distinct")
    assert(rows.forall(t => t._4 != null && t._5 != null),
      "bookkeeping timestamps populated")
    val ab1 = rows.find(_._1 == "AB1").get
    assert(!ab1._5.before(ab1._4),
      "row_updated_at advances (or equals) row_created_at on update")
  }

  test("managed all-columns-key table absorbs replays and in-batch duplicates") {
    val sink = new JdbcUpsertSink(url, "mgd_logs", Seq("host", "msg"), "", "",
      dialect = "generic",
      createTypes = Map("host" -> "VARCHAR(32)", "msg" -> "VARCHAR(128)"))
    // in-batch duplicate + cross-batch replay must both be absorbed
    val rows = Seq(("mx1", "hello"), ("mx1", "hello"), ("mx2", "world"))
      .toDF("host", "msg")
    sink.write(rows, 0L)
    sink.write(rows, 1L)
    val n = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "mgd_logs").load().count()
    assert(n === 2)
  }

  test("merge policies: coalesce keeps stored values, max never regresses") {
    // the TTL-eviction scenario: a later batch re-emits a row rebuilt
    // from EMPTY state (null payload, counter restarted at 1) — the
    // policies must keep the DB row intact
    val sink = new JdbcUpsertSink(url, "mp_msgs", Seq("qid"), "", "",
      dialect = "generic",
      mergePolicy = Map("sender" -> "coalesce", "n_lines" -> "max"))
    sink.write(Seq(("AB1", Some("a@x.com"), 5L))
      .toDF("qid", "sender", "n_lines"), 0L)
    sink.write(Seq(("AB1", None: Option[String], 1L))
      .toDF("qid", "sender", "n_lines"), 1L)
    val got = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "mp_msgs").load()
      .select("qid", "sender", "n_lines")
      .as[(String, Option[String], Long)].collect()
    assert(got.toSeq === Seq(("AB1", Some("a@x.com"), 5L)),
      "null must not clobber, counter must not regress")
    // a genuinely newer value still lands
    sink.write(Seq(("AB1", Some("b@y.com"), 9L))
      .toDF("qid", "sender", "n_lines"), 2L)
    val got2 = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "mp_msgs").load()
      .select("sender", "n_lines").as[(Option[String], Long)].collect()
    assert(got2.toSeq === Seq((Some("b@y.com"), 9L)))
  }

  test("merge-policy SQL is well-formed in both dialects") {
    val sink = new JdbcUpsertSink("jdbc:mysql://h/db", "t", Seq("k"), "u", "p",
      mergePolicy = Map("a" -> "coalesce", "b" -> "max"))
    val (mysql, update, _) = sink.managedSql(Seq("k", "a", "b"))
    assert(mysql.contains("a=COALESCE(VALUES(a), a)"))
    assert(mysql.contains(
      "b=CASE WHEN VALUES(b) IS NOT NULL AND (b IS NULL OR VALUES(b) > b) THEN VALUES(b) ELSE b END"))
    assert(update.contains("a = COALESCE(?, a)"))
    assert(update.contains(
      "b = CASE WHEN ? IS NOT NULL AND (b IS NULL OR ? > b) THEN ? ELSE b END"))
  }

  test("key hash distinguishes NULL from the string null and permuted tuples") {
    import org.apache.spark.sql.RowFactory
    val a = JdbcUpsertSink.keyHash(RowFactory.create(null, "x"), Seq(0, 1))
    val b = JdbcUpsertSink.keyHash(RowFactory.create("null", "x"), Seq(0, 1))
    val c = JdbcUpsertSink.keyHash(RowFactory.create("x", null), Seq(0, 1))
    val d = JdbcUpsertSink.keyHash(RowFactory.create("ab", "c"), Seq(0, 1))
    val e = JdbcUpsertSink.keyHash(RowFactory.create("a", "bc"), Seq(0, 1))
    assert(Set(a, b, c, d, e).size === 5)
    assert(a.length === 64 && a.forall(ch => ch.isDigit || ('a' to 'f').contains(ch)))
  }

  test("key hash separates mirrored pre/post-1970 fractional-second instants") {
    import org.apache.spark.sql.RowFactory
    // -0.5s and +0.5s around the epoch: truncating division would
    // encode both as ts:500000000 and collide them in the UNIQUE index
    def ts(millis: Long) = new java.sql.Timestamp(millis)
    val neg = JdbcUpsertSink.keyHash(RowFactory.create(ts(-500L)), Seq(0))
    val pos = JdbcUpsertSink.keyHash(RowFactory.create(ts(500L)), Seq(0))
    assert(neg !== pos)
    // and the encoding stays instant-based, not object-based
    assert(JdbcUpsertSink.keyHash(RowFactory.create(ts(500L)), Seq(0)) === pos)
  }

  test("duplicate-key detection matches SQLState class 23 across drivers") {
    import java.sql.{BatchUpdateException, SQLException, SQLIntegrityConstraintViolationException}
    assert(JdbcUpsertSink.isDuplicateKey(new SQLIntegrityConstraintViolationException("dup")))
    // PostgreSQL throws a plain SQLException subclass with state 23505
    assert(JdbcUpsertSink.isDuplicateKey(new SQLException("dup", "23505")))
    assert(JdbcUpsertSink.isDuplicateKey(
      new BatchUpdateException("dup", "23505", 0, Array[Int](), null)))
    assert(!JdbcUpsertSink.isDuplicateKey(new SQLException("syntax", "42X01")))
    // chained: outer exception generic, cause carried via next
    val outer = new SQLException("batch failed", "HY000")
    outer.setNextException(new SQLException("dup", "23505"))
    assert(JdbcUpsertSink.isDuplicateKey(outer))
  }
}
