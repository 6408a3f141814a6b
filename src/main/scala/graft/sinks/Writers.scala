package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Parquet sink layouts for the synced tables.
  *
  * The layout IS the performance contract at 100 TB: directory
  * partitioning gives partition pruning on the sync watermark column;
  * sort-within-files gives parquet min/max row-group skipping on the
  * secondary key; `repartition` before `partitionBy` keeps one writer
  * task per output partition instead of #tasks × #partitions small
  * files.
  */
object Writers {

  def partitionedParquet(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      sortCols: Seq[String] = Nil
  ): Unit = {
    val arranged = df
      .repartition(partitionCols.map(col): _*)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
    arranged.write
      .mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** Bucketed managed table: rows hash-bucketed and sorted by the join
    * key. Two tables bucketed the same way join with NO shuffle on
    * either side — the layout that makes the recurring
    * orders⋈lineitem-class joins at 100 TB a local merge instead of a
    * cluster-wide exchange.
    */
  def bucketedTable(df: DataFrame, name: String, bucketCol: String, buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(name)

  /** Plain parquet with a bounded file count and in-file ordering. */
  def sortedParquet(df: DataFrame, path: String, sortCols: Seq[String], files: Int = 32): Unit =
    df.repartition(files, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write
      .mode("overwrite")
      .parquet(path)

  /** Small-file compaction for an incrementally-written parquet dir —
    * the maintenance job every continuous-upsert target needs (each
    * micro-batch/delta merge leaves files sized by the BATCH; scans
    * then pay per-file open/footer costs that dwarf the data). The
    * ClickHouse targets the reference writes to merge parts in the
    * background; a parquet lake needs this explicit pendant.
    *
    * Skips entirely (no read, no write, no churn) unless the dir holds
    * more files than `ceil(bytes / targetFileBytes)` AND at least
    * `minFiles` — so a scheduled sweep is idempotent and touches only
    * dirs that drifted. The rewrite goes through a hidden tmp dir and
    * [[PartitionedUpsert.promote]]'s checked rename, so a failed
    * compaction leaves the previous files in place.
    *
    * Returns (filesBefore, filesAfter).
    */
  def compact(
      spark: SparkSession,
      dir: String,
      targetFileBytes: Long = 128L << 20,
      minFiles: Int = 4
  ): (Int, Int) = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(p).filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val want = math.max(1, math.ceil(files.map(_.getLen).sum.toDouble / targetFileBytes).toInt)
    if (files.length <= want || files.length < minFiles) return (files.length, files.length)
    // hidden sibling (dot-prefixed: invisible to partition discovery)
    val tmp = new Path(p.getParent, s".${p.getName}__compact_tmp").toString
    spark.read.parquet(dir).repartition(want).write.mode("overwrite").parquet(tmp)
    PartitionedUpsert.promote(fs, tmp, dir)
    (files.length, want)
  }

  /** Compaction sweep over a directory-partitioned target: each
    * `col=value` partition dir is compacted independently (and only
    * when it drifted), so the sweep's IO is proportional to the
    * partitions touched since the last sweep — never a full-table
    * rewrite. Returns (partitionDir, before, after) per partition.
    */
  def compactPartitioned(
      spark: SparkSession,
      dir: String,
      targetFileBytes: Long = 128L << 20,
      minFiles: Int = 4
  ): Seq[(String, Int, Int)] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p)
      // hidden/meta dirs (.day=X__old crash leftovers, _temporary)
      // are NOT live partitions — sweeping a stale aside every pass
      // would rewrite it forever instead of leaving it for restore
      .filter { s =>
        val n = s.getPath.getName
        s.isDirectory && n.contains("=") && !n.startsWith(".") && !n.startsWith("_")
      }
      .toSeq
      .map { part =>
        val (before, after) = compact(spark, part.getPath.toString, targetFileBytes, minFiles)
        (part.getPath.getName, before, after)
      }
  }
}
