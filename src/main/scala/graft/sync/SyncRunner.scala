package graft.sync

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Incremental
import graft.sinks.PartitionedUpsert

/** Sync orchestration — the reference's full/incremental/auto modes
  * (es_to_bytehouse.py:1153-1207 `run_full_sync`,
  * 1053-1102 `run_incremental`, README "auto 模式") over parquet
  * targets, with the `_sync_state` table persisted as parquet.
  *
  * auto mode: no state for the table → full sync, record state;
  * state present → incremental batch (time > last_sync), upsert-merge
  * into the target, advance state. Restart-safe: state is re-read from
  * storage each run, exactly like the reference.
  */
object SyncRunner {

  /** One `_sync_state` row (es_to_bytehouse.py:416-426). */
  case class SyncState(
      table_name: String,
      time_field: String,
      last_sync_us: Long,
      n_rows: Long,
      mode: String,
      updated_us: Long
  )

  def readState(spark: SparkSession, stateDir: String, table: String): Option[SyncState] = {
    import spark.implicits._
    val p = new Path(stateDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else
      spark.read
        .parquet(stateDir)
        .filter(col("table_name") === table)
        .orderBy(col("updated_us").desc)
        .limit(1)
        .as[SyncState]
        .collect()
        .headOption
  }

  def appendState(spark: SparkSession, stateDir: String, state: SyncState): Unit = {
    import spark.implicits._
    Seq(state).toDS().write.mode("append").parquet(stateDir)
  }

  /** Run one auto-mode sync pass for `source` into `targetDir`.
    * Returns the mode executed ("full" | "incremental") and rows
    * synced. `orderCols` breaks upsert ties (latest wins).
    *
    * With `partitionCol` set the target is laid out as a partitioned
    * parquet table and incremental batches merge ONLY the partitions
    * the delta lands in (graft.sinks.PartitionedUpsert) — the 100 TB
    * path. Without it the whole target is merged and swapped — fine
    * for small dimension tables only.
    */
  def autoSync(
      spark: SparkSession,
      source: DataFrame,
      table: String,
      keyCols: Seq[String],
      timeCol: String,
      orderCols: Seq[String],
      targetDir: String,
      stateDir: String,
      nowUs: Long,
      partitionCol: Option[String] = None
  ): (String, Long) = {
    val fs = new Path(targetDir).getFileSystem(spark.sparkContext.hadoopConfiguration)

    def maxUs(df: DataFrame): Long =
      df.agg(max(unix_micros(col(timeCol).cast("timestamp")))).collect()(0) match {
        case r if r.isNullAt(0) => Long.MinValue
        case r => r.getLong(0)
      }

    readState(spark, stateDir, table) match {
      case None =>
        val n = partitionCol match {
          case Some(p) =>
            val cached = source.persist()
            val c = cached.count()
            PartitionedUpsert.writeFull(cached, targetDir, p)
            cached.unpersist()
            c
          case None => writeSwap(spark, source, targetDir, fs)
        }
        appendState(spark, stateDir, SyncState(table, timeCol, maxUs(source), n, "full", nowUs))
        ("full", n)
      case Some(st) =>
        val delta = source.filter(unix_micros(col(timeCol).cast("timestamp")) > st.last_sync_us)
        val n = partitionCol match {
          case Some(p) =>
            PartitionedUpsert.merge(spark, delta, targetDir, keyCols, orderCols, p)
          case None =>
            val c = delta.count()
            if (c > 0) {
              val base = spark.read.parquet(targetDir)
              val merged = Incremental.mergeUpsert(base, delta, keyCols, orderCols)
              writeSwap(spark, merged, targetDir, fs)
            }
            c
        }
        if (n > 0) {
          appendState(spark, stateDir, SyncState(table, timeCol, maxUs(delta), n, "incremental", nowUs))
        }
        ("incremental", n)
    }
  }

  /** Sync every table under `srcDir` matching the wildcard pattern —
    * the reference's multi-index loop (`run_full_sync` /
    * `run_incremental` over `get_es_indices(pattern)`). Time field is
    * auto-detected (es_to_bytehouse.py:467-496); tables without one
    * fall back to full refresh every pass, exactly like the reference
    * warns-and-skips incremental. Key columns default to the first
    * column (the `_id` analogue) unless overridden.
    */
  def autoSyncAll(
      spark: SparkSession,
      srcDir: String,
      pattern: String,
      targetRoot: String,
      stateDir: String,
      nowUs: Long,
      keyOverrides: Map[String, Seq[String]] = Map.empty
  ): Map[String, (String, Long)] = {
    graft.sources.Catalog
      .selectTables(spark, srcDir, pattern)
      .map { table =>
        val df = graft.sources.Catalog.load(spark, srcDir, table)
        val keys = keyOverrides.getOrElse(table, Seq(df.columns.head))
        val target = s"$targetRoot/$table"
        val result = Incremental.detectTimeField(df.schema) match {
          case Some(timeCol) =>
            autoSync(spark, df, table, keys, timeCol, Seq(timeCol) ++ keys, target, stateDir, nowUs)
          case None =>
            val fs = new Path(target).getFileSystem(spark.sparkContext.hadoopConfiguration)
            val n = writeSwap(spark, df, target, fs)
            appendState(spark, stateDir, SyncState(table, "", Long.MinValue, n, "full", nowUs))
            ("full", n)
        }
        table -> result
      }
      .toMap
  }

  /** Atomic-ish replace of a parquet target: write temp, then a
    * checked swap (PartitionedUpsert.promote) that restores the old
    * target and throws on rename failure — so a failed swap never
    * advances sync state.
    */
  private def writeSwap(
      spark: SparkSession,
      df: DataFrame,
      targetDir: String,
      fs: org.apache.hadoop.fs.FileSystem
  ): Long = {
    val tmp = targetDir + "__tmp"
    val cached = df.persist()
    val n = cached.count()
    cached.write.mode("overwrite").parquet(tmp)
    cached.unpersist()
    PartitionedUpsert.promote(fs, tmp, targetDir)
    n
  }
}
