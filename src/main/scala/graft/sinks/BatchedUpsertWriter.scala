package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}

/** Batched INSERT writer for a JDBC-style sink with the reference's
  * failure semantics (es_to_bytehouse.py:675-736 `insert_batch`): try
  * the whole batch; if the batch fails, fall back to row-at-a-time and
  * keep the rows that succeed.
  *
  * The statement executor is injected (a thin wrapper over a JDBC
  * `PreparedStatement` in production; a recording fake in tests) so the
  * partition-parallel batching, ordering and fallback logic — the part
  * that matters at scale — is testable without a live database.
  * Executors run one per partition: writer parallelism == partition
  * count, exactly how a ClickHouse bulk load should be driven.
  */
object BatchedUpsertWriter {

  /** Executes one INSERT for a batch of rows. Implementations must be
    * serializable (constructed per partition via the factory).
    */
  trait BatchExecutor extends Serializable {
    def execute(insertSql: String, rows: Seq[Seq[Any]]): Unit
    def close(): Unit = ()
  }

  case class WriteStats(batches: Long, rows: Long, fallbackRows: Long, failedRows: Long)

  def write(
      df: DataFrame,
      db: String,
      table: String,
      batchSize: Int,
      executorFactory: () => BatchExecutor
  ): WriteStats = {
    val columns = df.columns.toIndexedSeq
    val sql = ClickHouseDdl.insertSql(db, table, columns)
    val counters = df.sparkSession.sparkContext.collectionAccumulator[(Long, Long, Long, Long)]("upsert_stats")
    df.foreachPartition { (rows: Iterator[Row]) =>
      val exec = executorFactory()
      var batches = 0L; var ok = 0L; var fallback = 0L; var failed = 0L
      try {
        rows.grouped(batchSize).foreach { group =>
          val batch = group.map(r => columns.indices.map(r.get))
          try {
            exec.execute(sql, batch)
            batches += 1
            ok += batch.size
          } catch {
            case _: Exception =>
              // reference behavior: degrade to row-at-a-time, keep survivors
              batch.foreach { row =>
                try { exec.execute(sql, Seq(row)); fallback += 1 }
                catch { case _: Exception => failed += 1 }
              }
          }
        }
      } finally exec.close()
      counters.add((batches, ok + fallback, fallback, failed))
    }
    val all = counters.value
    import scala.jdk.CollectionConverters._
    all.asScala.foldLeft(WriteStats(0, 0, 0, 0)) { case (a, (b, r, f, x)) =>
      WriteStats(a.batches + b, a.rows + r, a.fallbackRows + f, a.failedRows + x)
    }
  }
}
