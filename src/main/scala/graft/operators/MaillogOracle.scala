package graft.operators

import graft.functions.MaillogParse._

/** DuckDB oracle SQL mirroring [[MaillogOps]] exactly: identical line
  * synthesis (from events), identical regexes, identical merge rules.
  * Built with plain concatenation (regex literals contain `$`). */
object MaillogOracle {

  private val evCte =
    "SELECT event_id, make_timestamp(epoch_us(ts)) AS ts, user_id, event_type, value, props FROM events"

  private val qidSql = "lpad(hex(event_id % 311), 6, '0')"

  private val linesCte =
    "ln AS (SELECT\n" +
    "  strftime(ts, '%b %d %H:%M:%S') || ' mx' || (user_id % 4) || ' postfix/' ||\n" +
    "  (CASE event_type WHEN 'signup' THEN 'smtpd' WHEN 'purchase' THEN 'qmgr'" +
    " WHEN 'view' THEN 'smtp' WHEN 'click' THEN 'cleanup' ELSE 'local' END) ||\n" +
    "  '[' || (100 + user_id % 50) || ']: ' ||\n" +
    "  (CASE event_type\n" +
    "    WHEN 'signup' THEN " + qidSql + " || ': client=host' || user_id || '.example.com[10.0.' || (user_id % 256) || '.' || (event_id % 256) || ']'\n" +
    "    WHEN 'purchase' THEN " + qidSql + " || ': from=<user' || (user_id % 20) || '@example.com>, size=' || CAST(round(value * 100) AS BIGINT) || ', nrcpt=' || (1 + event_id % 3) || ' (queue active)'\n" +
    "    WHEN 'view' THEN " + qidSql + " || ': to=<dest' || (user_id % 30) || '@example.org>, relay=relay' || (user_id % 5) || '.example.net[10.1.0.' || (user_id % 5) || ']:25, delay=' ||" +
    " CAST(CAST(floor(CAST(round(value * 7) AS BIGINT) / 100) AS BIGINT) AS VARCHAR) || '.' || lpad(CAST(CAST(round(value * 7) AS BIGINT) % 100 AS VARCHAR), 2, '0') ||" +
    " ', delays=0.01/0.02/0.03/0.04, dsn=' || (CASE WHEN event_id % 7 = 0 THEN '4.0.0' ELSE '2.0.0' END) || ', status=' || (CASE WHEN event_id % 7 = 0 THEN 'deferred' ELSE 'sent' END) || ' (250 2.0.0 Ok: queued as ' || " + qidSql + " || ')'\n" +
    "    WHEN 'click' THEN " + qidSql + " || ': message-id=<' || " + qidSql + " || '.' || event_id || '@mx' || (user_id % 4) || '>'\n" +
    "    ELSE 'warning: process failed code=' || (event_id % 17)\n" +
    "  END) AS line\n" +
    "FROM ev)"

  private def re(pattern: String): String = "'" + pattern + "'"

  private val parsedCte =
    "parsed AS (SELECT\n" +
    "  strptime('2024 ' || regexp_extract(line, " + re(HeaderRe) + ", 1), '%Y %b %d %H:%M:%S') AS log_timestamp,\n" +
    "  regexp_extract(line, " + re(HeaderRe) + ", 2) AS log_mailhost,\n" +
    "  regexp_extract(line, " + re(HeaderRe) + ", 3) AS log_process,\n" +
    "  regexp_extract(line, " + re(HeaderRe) + ", 4) AS log_processid,\n" +
    "  regexp_extract(line, " + re(HeaderRe) + ", 5) AS log_message\n" +
    "FROM ln WHERE regexp_matches(line, " + re(HeaderRe) + "))"

  private val prefix = "WITH ev AS (" + evCte + "),\n" + linesCte + ",\n" + parsedCte

  /** Last-per-qid branch CTE (window mirror of MaillogOps.lastPerQid). */
  private def branch(name: String, raw: String): String =
    name + " AS (SELECT * EXCLUDE (rn) FROM (SELECT *, row_number() OVER " +
    "(PARTITION BY qid ORDER BY log_timestamp DESC, log_message DESC, log_mailhost DESC) AS rn, " +
    "COUNT(*) OVER (PARTITION BY qid) AS cnt FROM " + raw + " t0) t1 WHERE rn = 1)"

  private val qmRaw =
    "(SELECT log_timestamp, log_message, log_mailhost,\n" +
    "  regexp_extract(log_message, " + re(QmgrRe) + ", 1) AS qid,\n" +
    "  regexp_extract(log_message, " + re(QmgrRe) + ", 2) AS message_from,\n" +
    "  CAST(regexp_extract(log_message, " + re(QmgrRe) + ", 3) AS BIGINT) AS message_size,\n" +
    "  CAST(regexp_extract(log_message, " + re(QmgrRe) + ", 4) AS INTEGER) AS message_nrcpt,\n" +
    "  regexp_extract(log_message, " + re(QmgrRe) + ", 5) AS message_statusext\n" +
    "FROM parsed WHERE regexp_matches(log_message, " + re(QmgrRe) + "))"

  private val clRaw =
    "(SELECT log_timestamp, log_message, log_mailhost,\n" +
    "  regexp_extract(log_message, " + re(SmtpdRe) + ", 1) AS qid,\n" +
    "  regexp_extract(log_message, " + re(SmtpdRe) + ", 2) AS message_client\n" +
    "FROM parsed WHERE regexp_matches(log_message, " + re(SmtpdRe) + "))"

  private val midRaw =
    "(SELECT log_timestamp, log_message, log_mailhost,\n" +
    "  regexp_extract(log_message, " + re(CleanupRe) + ", 1) AS qid,\n" +
    "  regexp_extract(log_message, " + re(CleanupRe) + ", 2) AS message_id\n" +
    "FROM parsed WHERE regexp_matches(log_message, " + re(CleanupRe) + "))"

  private val deliveriesCte =
    "dl AS (SELECT DISTINCT log_timestamp AS delivery_timestamp,\n" +
    "  regexp_extract(log_message, " + re(SmtpRe) + ", 1) AS delivery_queueid,\n" +
    "  regexp_extract(log_message, " + re(SmtpRe) + ", 2) AS delivery_to,\n" +
    "  regexp_extract(log_message, " + re(SmtpRe) + ", 3) AS delivery_relay,\n" +
    "  regexp_extract(log_message, " + re(SmtpRe) + ", 4) AS delivery_delay,\n" +
    "  regexp_extract(log_message, " + re(SmtpRe) + ", 5) AS delivery_delays,\n" +
    "  regexp_extract(log_message, " + re(SmtpRe) + ", 6) AS delivery_dsn,\n" +
    "  regexp_extract(log_message, " + re(SmtpRe) + ", 7) AS delivery_status,\n" +
    "  regexp_extract(log_message, " + re(SmtpRe) + ", 8) AS delivery_statusext,\n" +
    "  CAST(CAST(regexp_extract(log_message, " + re(SmtpRe) + ", 4) AS DECIMAL(18,2)) AS DOUBLE) AS delivery_delay_s\n" +
    "FROM parsed WHERE regexp_matches(log_message, " + re(SmtpRe) + "))"

  private val messagesSelect =
    "SELECT qid AS message_queueid, message_timestamp, message_mailhost, message_from," +
    " message_size, message_nrcpt, message_statusext, message_client, message_id,\n" +
    "  COALESCE(n_qmgr, 0) AS n_qmgr, COALESCE(n_smtpd, 0) AS n_smtpd, COALESCE(n_cleanup, 0) AS n_cleanup\n" +
    "FROM qm FULL JOIN cl USING (qid) FULL JOIN mid USING (qid)"

  private val messagesCtes =
    branch("qm0", qmRaw) + ",\n" +
    "qm AS (SELECT qid, cnt AS n_qmgr, log_timestamp AS message_timestamp, log_mailhost AS message_mailhost," +
    " message_from, message_size, message_nrcpt, message_statusext FROM qm0),\n" +
    branch("cl0", clRaw) + ",\n" +
    "cl AS (SELECT qid, cnt AS n_smtpd, message_client FROM cl0),\n" +
    branch("mid0", midRaw) + ",\n" +
    "mid AS (SELECT qid, cnt AS n_cleanup, message_id FROM mid0)"

  val oracles: Map[String, String] = Map(
    "m01_parse_logs" -> (prefix + "\n" +
      "SELECT DISTINCT log_timestamp, log_mailhost, log_process, log_processid, log_message\n" +
      "FROM parsed ORDER BY 1, 2, 3, 4, 5"),

    "m02_clients" -> (prefix + ",\n" +
      "sm AS (SELECT log_timestamp, regexp_extract(log_message, " + re(SmtpdRe) + ", 2) AS cstr\n" +
      "  FROM parsed WHERE regexp_matches(log_message, " + re(SmtpdRe) + "))\n" +
      "SELECT regexp_extract(cstr, " + re(ClientSplitRe) + ", 0) AS client,\n" +
      "  regexp_extract(cstr, " + re(ClientSplitRe) + ", 1) AS client_rdns,\n" +
      "  regexp_extract(cstr, " + re(ClientSplitRe) + ", 2) AS client_addr,\n" +
      "  max(log_timestamp) AS client_lastseen, COUNT(*) AS n_seen\n" +
      "FROM sm GROUP BY 1, 2, 3 ORDER BY client"),

    "m03_messages" -> (prefix + ",\n" + messagesCtes + "\n" +
      messagesSelect + " ORDER BY message_queueid"),

    "m04_deliveries" -> (prefix + ",\n" + deliveriesCte + "\n" +
      "SELECT * FROM dl ORDER BY delivery_timestamp, delivery_queueid, delivery_to," +
      " delivery_relay, delivery_delay, delivery_delays, delivery_dsn, delivery_status, delivery_statusext"),

    "m05_delivery_stats" -> (prefix + ",\n" + deliveriesCte + "\n" +
      "SELECT delivery_status, delivery_dsn, COUNT(*) AS n,\n" +
      "  CAST(SUM(CAST(delivery_delay AS DECIMAL(18,2))) AS DOUBLE) AS sum_delay_s,\n" +
      "  COUNT(DISTINCT delivery_relay) AS n_relays, max(delivery_timestamp) AS last_seen\n" +
      "FROM dl GROUP BY 1, 2 ORDER BY 1, 2"),

    // TRY_CAST + NULLS FIRST: Spark's substring_index(...).cast("int")
    // yields NULL on a malformed dsn and sorts nulls first — both
    // engines must degrade identically if the parse rules ever
    // loosen (today delivery_dsn is a numeric regex capture, so the
    // branch is unreachable and the hash is unchanged)
    "m13_dsn_taxonomy" -> (prefix + ",\n" + deliveriesCte + ",\n" +
      "dc AS (SELECT *, TRY_CAST(split_part(delivery_dsn, '.', 1) AS INTEGER) AS dsn_class FROM dl)\n" +
      "SELECT delivery_relay AS relay, dsn_class,\n" +
      "  CASE dsn_class WHEN 2 THEN 'success' WHEN 4 THEN 'transient'\n" +
      "       WHEN 5 THEN 'permanent' ELSE 'other' END AS dsn_family,\n" +
      "  COUNT(*) AS n,\n" +
      "  CAST(SUM(CAST(delivery_delay AS DECIMAL(18,2))) AS DOUBLE) AS sum_delay_s,\n" +
      "  COUNT(DISTINCT delivery_queueid) AS n_queues, max(delivery_timestamp) AS last_seen\n" +
      "FROM dc GROUP BY 1, 2, 3 ORDER BY 1, 2 NULLS FIRST"),

    "m08_hourly_volume" -> (prefix + ",\n" + deliveriesCte + "\n" +
      "SELECT date_trunc('hour', delivery_timestamp) AS hour, delivery_status, COUNT(*) AS n,\n" +
      "  CAST(SUM(CAST(delivery_delay AS DECIMAL(18,2))) AS DOUBLE) AS sum_delay_s,\n" +
      "  COUNT(DISTINCT delivery_queueid) AS n_queues\n" +
      "FROM dl GROUP BY 1, 2 ORDER BY 1, 2"),

    "m07_queue_latency" -> (prefix + ",\n" + messagesCtes + ",\n" +
      deliveriesCte + ",\n" +
      "msgs AS (SELECT qid AS message_queueid, message_timestamp FROM qm WHERE message_timestamp IS NOT NULL)\n" +
      "SELECT delivery_status, COUNT(*) AS n,\n" +
      "  CAST(SUM(CAST(epoch_us(delivery_timestamp) - epoch_us(message_timestamp) AS DECIMAL(18,0))) AS DOUBLE) AS sum_latency_us,\n" +
      "  COUNT(DISTINCT message_queueid) AS n_queues\n" +
      "FROM msgs JOIN dl ON dl.delivery_queueid = msgs.message_queueid\n" +
      "GROUP BY delivery_status ORDER BY delivery_status"),

    "m11_relay_health" -> (prefix + ",\n" + deliveriesCte + "\n" +
      "SELECT delivery_relay AS relay, COUNT(*) AS n_attempts,\n" +
      "  CAST(COALESCE(SUM(CASE WHEN delivery_status = 'sent' THEN 1 END), 0) AS BIGINT) AS n_sent,\n" +
      "  CAST(COALESCE(SUM(CASE WHEN delivery_status = 'deferred' THEN 1 END), 0) AS BIGINT) AS n_deferred,\n" +
      "  CAST(COALESCE(SUM(CASE WHEN delivery_status = 'deferred' THEN 1 END), 0) AS DOUBLE) / COUNT(*) AS defer_ratio,\n" +
      "  CAST(SUM(CAST(delivery_delay AS DECIMAL(18,2))) AS DOUBLE) AS sum_delay_s,\n" +
      "  COUNT(DISTINCT delivery_queueid) AS n_queues\n" +
      "FROM dl GROUP BY delivery_relay ORDER BY relay"),

    "m12_queue_aging" -> (prefix + ",\n" + deliveriesCte + ",\n" +
      "fin AS (SELECT delivery_queueid, delivery_status AS final_status FROM (\n" +
      "    SELECT delivery_queueid, delivery_status, row_number() OVER (\n" +
      "      PARTITION BY delivery_queueid ORDER BY delivery_timestamp DESC,\n" +
      "        delivery_to DESC, delivery_relay DESC, delivery_dsn DESC,\n" +
      "        delivery_status DESC) AS rn FROM dl) t WHERE rn = 1)\n" +
      "SELECT d.delivery_queueid, COUNT(*) AS n_attempts,\n" +
      "  CAST(COALESCE(SUM(CASE WHEN d.delivery_status = 'deferred' THEN 1 END), 0) AS BIGINT) AS n_deferred,\n" +
      "  MIN(d.delivery_timestamp) AS first_ts, MAX(d.delivery_timestamp) AS last_ts,\n" +
      "  MIN(f.final_status) AS final_status,\n" +
      "  (epoch_us(MAX(d.delivery_timestamp)) - epoch_us(MIN(d.delivery_timestamp))) / 1000000.0 AS span_s\n" +
      "FROM dl d JOIN fin f USING (delivery_queueid)\n" +
      "GROUP BY d.delivery_queueid ORDER BY delivery_queueid"),

    "m10_parse_coverage" -> (prefix + ",\n" +
      "f AS (SELECT log_process,\n" +
      "  CASE WHEN regexp_matches(log_message, " + re(QmgrRe) + ") THEN 1 ELSE 0 END AS q,\n" +
      "  CASE WHEN regexp_matches(log_message, " + re(SmtpdRe) + ") THEN 1 ELSE 0 END AS c,\n" +
      "  CASE WHEN regexp_matches(log_message, " + re(CleanupRe) + ") THEN 1 ELSE 0 END AS m,\n" +
      "  CASE WHEN regexp_matches(log_message, " + re(SmtpRe) + ") THEN 1 ELSE 0 END AS s\n" +
      "FROM parsed)\n" +
      "SELECT log_process, COUNT(*) AS n_lines,\n" +
      "  CAST(SUM(q) AS BIGINT) AS n_qmgr, CAST(SUM(c) AS BIGINT) AS n_smtpd,\n" +
      "  CAST(SUM(m) AS BIGINT) AS n_cleanup, CAST(SUM(s) AS BIGINT) AS n_smtp,\n" +
      "  CAST(SUM(CASE WHEN q + c + m + s = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_unmatched\n" +
      "FROM f GROUP BY log_process ORDER BY log_process"),

    "m09_sender_scorecard" -> (prefix + ",\n" + messagesCtes + ",\n" +
      deliveriesCte + ",\n" +
      "m9 AS (SELECT qid, message_from FROM qm WHERE message_from IS NOT NULL)\n" +
      "SELECT message_from AS sender, COUNT(DISTINCT qid) AS n_msgs,\n" +
      "  COUNT(delivery_status) AS n_deliv,\n" +
      "  CAST(COALESCE(SUM(CASE WHEN delivery_status = 'sent' THEN 1 END), 0) AS BIGINT) AS n_sent,\n" +
      "  CAST(COALESCE(SUM(CASE WHEN delivery_status = 'deferred' THEN 1 END), 0) AS BIGINT) AS n_deferred,\n" +
      "  CASE WHEN COUNT(delivery_status) > 0 THEN\n" +
      "    CAST(COALESCE(SUM(CASE WHEN delivery_status = 'deferred' THEN 1 END), 0) AS DOUBLE) / COUNT(delivery_status)\n" +
      "  END AS defer_ratio,\n" +
      "  CAST(SUM(CAST(delivery_delay AS DECIMAL(18,2))) AS DOUBLE) AS sum_delay_s\n" +
      "FROM m9 LEFT JOIN dl ON dl.delivery_queueid = m9.qid\n" +
      "GROUP BY message_from ORDER BY sender"),

    "m06_top_clients" -> (prefix + ",\n" + messagesCtes + ",\n" +
      "msgs AS (" + messagesSelect + "),\n" +
      "clients AS (SELECT regexp_extract(cstr, " + re(ClientSplitRe) + ", 0) AS client,\n" +
      "    regexp_extract(cstr, " + re(ClientSplitRe) + ", 1) AS client_rdns,\n" +
      "    max(log_timestamp) AS client_lastseen\n" +
      "  FROM (SELECT log_timestamp, regexp_extract(log_message, " + re(SmtpdRe) + ", 2) AS cstr\n" +
      "        FROM parsed WHERE regexp_matches(log_message, " + re(SmtpdRe) + ")) s GROUP BY 1, 2),\n" +
      "agg AS (SELECT client_rdns, COUNT(*) AS n_messages," +
      " CAST(SUM(message_size) AS BIGINT) AS sum_size, max(client_lastseen) AS last_seen\n" +
      "  FROM msgs JOIN clients ON msgs.message_client = clients.client\n" +
      "  WHERE message_client IS NOT NULL GROUP BY client_rdns)\n" +
      "SELECT rank, client_rdns, n_messages, sum_size, last_seen FROM (\n" +
      "  SELECT *, row_number() OVER (ORDER BY n_messages DESC, client_rdns) AS rank FROM agg) t\n" +
      "WHERE rank <= 10 ORDER BY rank")
  )
}
