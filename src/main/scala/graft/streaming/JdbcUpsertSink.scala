package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import java.sql.{Connection, DriverManager, PreparedStatement}

/** MySQL upsert sink for `foreachBatch` — the Spark analog of the
  * reference's gorm Save-or-update (maillog2db.go:142-166, 332-358).
  *
  * Plain `DataFrameWriter.jdbc` can only append/overwrite; upsert
  * semantics need `INSERT … ON DUPLICATE KEY UPDATE`, executed here
  * per partition with JDBC batching — each executor writes its own
  * partition, so the sink scales with the cluster rather than
  * funnelling through the driver. Connection parameters mirror the
  * reference's flags (dbhost/dbport/dbname/dbuser/dbpass).
  *
  * No database ships in this container; `upsertSql` and row binding
  * are unit-tested, the connection path is exercised only when a URL
  * is supplied.
  */
class JdbcUpsertSink(url: String, table: String, keyCols: Seq[String],
                     user: String, password: String) extends Serializable {

  /** MySQL upsert statement for the given column set. */
  def upsertSql(cols: Seq[String]): String = {
    require(keyCols.forall(cols.contains), s"key columns $keyCols must be in $cols")
    val updates = cols.filterNot(keyCols.contains)
      .map(c => s"$c=VALUES($c)").mkString(", ")
    s"INSERT INTO $table (${cols.mkString(", ")}) VALUES (${cols.map(_ => "?").mkString(", ")})" +
      (if (updates.nonEmpty) s" ON DUPLICATE KEY UPDATE $updates" else "")
  }

  private def bind(ps: PreparedStatement, row: Row): Unit = {
    var i = 0
    while (i < row.length) {
      ps.setObject(i + 1, row.get(i))
      i += 1
    }
  }

  /** foreachBatch entry point. */
  def write(batch: DataFrame, batchId: Long): Unit = {
    val cols = batch.columns.toSeq
    val sql = upsertSql(cols)
    val (u, p, t) = (user, password, url)
    batch.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) {
        val conn: Connection = DriverManager.getConnection(t, u, p)
        try {
          conn.setAutoCommit(false)
          val ps = conn.prepareStatement(sql)
          var n = 0
          rows.foreach { r =>
            bind(ps, r)
            ps.addBatch()
            n += 1
            if (n % 1000 == 0) ps.executeBatch()
          }
          ps.executeBatch()
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
