package graft.sinks

import org.apache.spark.sql.DataFrame
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
}
