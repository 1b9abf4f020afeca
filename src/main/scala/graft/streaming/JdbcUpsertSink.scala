package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import java.sql.{Connection, DriverManager, PreparedStatement}

/** JDBC upsert sink for `foreachBatch` — the Spark analog of the
  * reference's gorm Save-or-update (maillog2db.go:142-166, 332-358).
  *
  * Plain `DataFrameWriter.jdbc` can only append/overwrite; upsert
  * semantics need dialect SQL, executed here per partition so each
  * executor writes its own split (the sink scales with the cluster
  * rather than funnelling through the driver).
  *
  * Dialects:
  *  - `mysql` (default, the reference's DB): single-statement
  *    `INSERT … ON DUPLICATE KEY UPDATE` with JDBC batching.
  *  - `generic`: ANSI update-then-insert per row (exists-check when
  *    every column is a key) — works on any JDBC database; used by
  *    the Derby-backed integration test since no MySQL ships in the
  *    test container.
  */
class JdbcUpsertSink(url: String, table: String, keyCols: Seq[String],
                     user: String, password: String,
                     dialect: String = "mysql") extends Serializable {
  require(Seq("mysql", "generic").contains(dialect), s"unknown dialect $dialect")

  /** MySQL upsert statement for the given column set. */
  def upsertSql(cols: Seq[String]): String = {
    require(keyCols.forall(cols.contains), s"key columns $keyCols must be in $cols")
    val updates = cols.filterNot(keyCols.contains)
      .map(c => s"$c=VALUES($c)").mkString(", ")
    s"INSERT INTO $table (${cols.mkString(", ")}) VALUES (${cols.map(_ => "?").mkString(", ")})" +
      (if (updates.nonEmpty) s" ON DUPLICATE KEY UPDATE $updates" else "")
  }

  /** ANSI statements for the generic dialect. */
  def genericSql(cols: Seq[String]): (Option[String], String, Option[String]) = {
    require(keyCols.forall(cols.contains), s"key columns $keyCols must be in $cols")
    val nonKeys = cols.filterNot(keyCols.contains)
    val where = keyCols.map(k => s"$k = ?").mkString(" AND ")
    val update =
      if (nonKeys.isEmpty) None
      else Some(s"UPDATE $table SET ${nonKeys.map(c => s"$c = ?").mkString(", ")} WHERE $where")
    val insert =
      s"INSERT INTO $table (${cols.mkString(", ")}) VALUES (${cols.map(_ => "?").mkString(", ")})"
    val exists =
      if (nonKeys.isEmpty) Some(s"SELECT 1 FROM $table WHERE $where") else None
    (update, insert, exists)
  }

  private def bindAll(ps: PreparedStatement, row: Row, idx: Seq[Int]): Unit = {
    var i = 0
    while (i < idx.length) {
      ps.setObject(i + 1, row.get(idx(i)))
      i += 1
    }
  }

  private def writeMysql(conn: Connection, cols: Seq[String], rows: Iterator[Row]): Unit = {
    val ps = conn.prepareStatement(upsertSql(cols))
    val all = cols.indices
    var n = 0
    rows.foreach { r =>
      bindAll(ps, r, all)
      ps.addBatch()
      n += 1
      if (n % 1000 == 0) ps.executeBatch()
    }
    ps.executeBatch()
  }

  private def writeGeneric(conn: Connection, cols: Seq[String], rows: Iterator[Row]): Unit = {
    val (updateSql, insertSql, existsSql) = genericSql(cols)
    val keyIdx = keyCols.map(cols.indexOf)
    val nonKeyIdx = cols.indices.filterNot(keyIdx.contains)
    val update = updateSql.map(conn.prepareStatement)
    val exists = existsSql.map(conn.prepareStatement)
    val insert = conn.prepareStatement(insertSql)
    rows.foreach { r =>
      val present = update match {
        case Some(u) =>
          bindAll(u, r, nonKeyIdx ++ keyIdx)
          u.executeUpdate() > 0
        case None =>
          val e = exists.get
          bindAll(e, r, keyIdx)
          val rs = e.executeQuery()
          try rs.next() finally rs.close()
      }
      if (!present) {
        bindAll(insert, r, cols.indices)
        insert.executeUpdate()
      }
    }
  }

  /** foreachBatch entry point. */
  def write(batch: DataFrame, batchId: Long): Unit = {
    val cols = batch.columns.toSeq
    val (u, p, t, d) = (user, password, url, dialect)
    val self = this
    batch.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) {
        val conn: Connection = DriverManager.getConnection(t, u, p)
        try {
          conn.setAutoCommit(false)
          if (d == "mysql") self.writeMysql(conn, cols, rows)
          else self.writeGeneric(conn, cols, rows)
          conn.commit()
        } finally conn.close()
      }
    }
  }
}

/** Parquet sink for environments without a database (tests, local). */
object ParquetSink {
  def apply(dir: String): (DataFrame, Long) => Unit =
    (batch, _) => batch.write.mode("append").parquet(dir)
}
