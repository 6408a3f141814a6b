package graft.sinks

import java.sql.{Connection, DriverManager, SQLException}

/** Real JDBC implementation of [[BatchedUpsertWriter.BatchExecutor]]:
  * one connection per Spark partition, `PreparedStatement` batch
  * inserts, transactional batches (rollback on failure so the
  * row-at-a-time fallback never double-inserts), and bounded retry
  * with backoff for transient connection errors — the reference's
  * `insert_batch` semantics (es_to_bytehouse.py:675-736) on a real
  * driver instead of a recording fake.
  *
  * The incoming INSERT prefix uses ClickHouse backtick quoting
  * (ClickHouseDdl.insertSql); identifiers are re-quoted with the
  * connection's own quote string so the same writer drives ClickHouse,
  * Derby, or any JDBC sink. Unit-tested against embedded Derby.
  *
  * Deterministic SQL errors (constraint violation, type mismatch) are
  * rethrown immediately — BatchedUpsertWriter then degrades to
  * row-at-a-time and keeps the survivors, like the reference.
  */
class JdbcBatchExecutor(
    url: String,
    maxAttempts: Int = 3,
    backoffMs: Long = 50L
) extends BatchedUpsertWriter.BatchExecutor {

  private lazy val conn: Connection = {
    val c = DriverManager.getConnection(url)
    c.setAutoCommit(false)
    c
  }

  private lazy val quote: String = {
    val q = conn.getMetaData.getIdentifierQuoteString
    if (q == null || q.trim.isEmpty) "" else q.trim
  }

  private def transient_(e: SQLException): Boolean = e match {
    case _: java.sql.SQLTransientException => true
    case _: java.sql.SQLRecoverableException => true
    case _: java.sql.SQLNonTransientConnectionException => true
    case _ => false
  }

  override def execute(insertSql: String, rows: Seq[Seq[Any]]): Unit = {
    if (rows.isEmpty) return
    val placeholders = "(" + Seq.fill(rows.head.size)("?").mkString(", ") + ")"
    val sql = insertSql.replace("`", quote) + " " + placeholders
    var attempt = 0
    while (true) {
      attempt += 1
      try {
        val ps = conn.prepareStatement(sql)
        try {
          rows.foreach { row =>
            row.zipWithIndex.foreach { case (v, i) => ps.setObject(i + 1, v) }
            ps.addBatch()
          }
          ps.executeBatch()
          conn.commit()
          return
        } finally ps.close()
      } catch {
        case e: SQLException =>
          try conn.rollback()
          catch { case _: SQLException => () }
          if (transient_(e) && attempt < maxAttempts)
            Thread.sleep(backoffMs * (1L << (attempt - 1)))
          else throw e
      }
    }
  }

  override def close(): Unit =
    try conn.close()
    catch { case _: SQLException => () }
}
