package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import java.sql.{Connection, DriverManager, PreparedStatement, SQLIntegrityConstraintViolationException}

/** JDBC upsert sink for `foreachBatch` — the Spark analog of the
  * reference's gorm Save-or-update (maillog2db.go:142-166, 332-358).
  *
  * Plain `DataFrameWriter.jdbc` can only append/overwrite; upsert
  * semantics need dialect SQL, executed here per partition so each
  * executor writes its own split (the sink scales with the cluster
  * rather than funnelling through the driver). Batches are
  * repartitioned by the key columns first, so one key is only ever
  * written by one partition of a micro-batch — no cross-connection
  * races on fresh keys.
  *
  * Dialects:
  *  - `mysql` (default, the reference's DB): single-statement
  *    `INSERT … ON DUPLICATE KEY UPDATE` with JDBC batching (a no-op
  *    self-assignment when every column is a key, so duplicates are
  *    absorbed rather than raised).
  *  - `generic`: ANSI exists-check then update/insert per row, with a
  *    duplicate-key fallback to update for replayed batches — works
  *    on any JDBC database; integration-tested against Derby.
  */
class JdbcUpsertSink(url: String, table: String, keyCols: Seq[String],
                     user: String, password: String,
                     dialect: String = "mysql") extends Serializable {
  require(Seq("mysql", "generic").contains(dialect), s"unknown dialect $dialect")

  /** MySQL upsert statement for the given column set. */
  def upsertSql(cols: Seq[String]): String = {
    require(keyCols.forall(cols.contains), s"key columns $keyCols must be in $cols")
    val nonKeys = cols.filterNot(keyCols.contains)
    // all-columns-key tables still need the upsert clause: a plain
    // INSERT would raise on the duplicates it exists to absorb
    val updates =
      if (nonKeys.isEmpty) s"${keyCols.head}=${keyCols.head}"
      else nonKeys.map(c => s"$c=VALUES($c)").mkString(", ")
    s"INSERT INTO $table (${cols.mkString(", ")}) VALUES (${cols.map(_ => "?").mkString(", ")})" +
      s" ON DUPLICATE KEY UPDATE $updates"
  }

  /** ANSI statements for the generic dialect:
    * (exists, update-or-None, insert). */
  def genericSql(cols: Seq[String]): (String, Option[String], String) = {
    require(keyCols.forall(cols.contains), s"key columns $keyCols must be in $cols")
    val nonKeys = cols.filterNot(keyCols.contains)
    val where = keyCols.map(k => s"$k = ?").mkString(" AND ")
    val exists = s"SELECT 1 FROM $table WHERE $where"
    val update =
      if (nonKeys.isEmpty) None
      else Some(s"UPDATE $table SET ${nonKeys.map(c => s"$c = ?").mkString(", ")} WHERE $where")
    val insert =
      s"INSERT INTO $table (${cols.mkString(", ")}) VALUES (${cols.map(_ => "?").mkString(", ")})"
    (exists, update, insert)
  }

  /** foreachBatch entry point. SQL is built (and key columns
    * validated) on the driver; the closure ships only strings and
    * index arrays. */
  def write(batch: DataFrame, batchId: Long): Unit = {
    val cols = batch.columns.toSeq
    val keyIdx: Seq[Int] = keyCols.map(cols.indexOf)
    val nonKeyIdx: Seq[Int] = cols.indices.filterNot(keyIdx.contains)
    val allIdx: Seq[Int] = cols.indices
    val mysqlSql = upsertSql(cols)
    val (existsSql, updateSql, insertSql) = genericSql(cols)
    val (jdbcUrl, jdbcUser, jdbcPass, d) = (url, user, password, dialect)

    def bind(ps: PreparedStatement, row: Row, idx: Seq[Int]): Unit = {
      var i = 0
      while (i < idx.length) {
        ps.setObject(i + 1, row.get(idx(i)))
        i += 1
      }
    }

    // same key -> same partition: no cross-connection insert races
    batch.repartition(keyCols.map(batch.col): _*)
      .foreachPartition { (rows: Iterator[Row]) =>
        if (rows.nonEmpty) {
          val conn: Connection = DriverManager.getConnection(jdbcUrl, jdbcUser, jdbcPass)
          try {
            conn.setAutoCommit(false)
            if (d == "mysql") {
              val ps = conn.prepareStatement(mysqlSql)
              var n = 0
              rows.foreach { r =>
                bind(ps, r, allIdx)
                ps.addBatch()
                n += 1
                if (n % 1000 == 0) ps.executeBatch()
              }
              ps.executeBatch()
            } else {
              val exists = conn.prepareStatement(existsSql)
              val update = updateSql.map(conn.prepareStatement)
              val insert = conn.prepareStatement(insertSql)
              rows.foreach { r =>
                bind(exists, r, keyIdx)
                val rs = exists.executeQuery()
                val present = try rs.next() finally rs.close()
                def doUpdate(): Unit = update.foreach { u =>
                  bind(u, r, nonKeyIdx ++ keyIdx)
                  u.executeUpdate()
                }
                if (present) doUpdate()
                else {
                  bind(insert, r, allIdx)
                  try insert.executeUpdate()
                  catch {
                    // lost a race with a replayed/concurrent writer:
                    // the row exists now, so apply the update instead
                    case _: SQLIntegrityConstraintViolationException => doUpdate()
                  }
                }
              }
            }
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
