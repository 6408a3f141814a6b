package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, concat, conv, lit, md5, substring}

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

  /** C60's writer half: dump a corpus as JSONL training shards with
    * the deterministic md5-salted shard assignment and intra-shard
    * order of [[graft.operators.Curation.shuffleShards]] — re-running
    * the job writes byte-identical shard directories (no RNG state),
    * which is what makes training-data exports resumable and
    * auditable. Each shard is one directory (`shard=<k>/`) holding
    * json-lines in shuffle order: `repartition(shard)` co-locates a
    * shard, `sortWithinPartitions(shard, pos, id)` fixes the line
    * order (several shards may hash into one task; the leading shard
    * sort key keeps each FILE internally ordered), and the dynamic
    * partition split writes one directory per shard. One keyed
    * exchange total — the same plan the shard-card query proves.
    */
  def jsonlShards(df: DataFrame, idCol: String, path: String, nShards: Int): Unit = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val hs = conv(substring(md5(concat(col(idCol).cast("string"), lit(":s"))), 1, 8), 16, 10).cast("long")
    val hp = conv(substring(md5(concat(col(idCol).cast("string"), lit(":p"))), 1, 8), 16, 10).cast("long")
    df.withColumn("shard", hs % nShards)
      .withColumn("__pos", hp)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("__pos"), col(idCol))
      .drop("__pos")
      .write
      .mode("overwrite")
      .partitionBy("shard")
      .json(path)
  }

  /** Plain parquet with a bounded file count and in-file ordering. */
  def sortedParquet(df: DataFrame, path: String, sortCols: Seq[String], files: Int = 32): Unit =
    df.repartition(files, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write
      .mode("overwrite")
      .parquet(path)

  /** Z-order clustered parquet: rows are laid out along a Morton
    * (bit-interleaved) curve over BOTH columns' rank spaces, so every
    * file/row-group covers a narrow range of EACH column and parquet
    * min/max stats prune scans filtered on either one — a single-col
    * sort only ever prunes its own column. The pendant of Delta/
    * Iceberg's OPTIMIZE ZORDER, as a write-time layout choice.
    *
    * Ranks are value-distribution agnostic (quantile buckets — skew
    * can't collapse the curve) and computed the 100 TB way: one
    * distributed approxQuantile pass yields 2^bits-1 boundaries per
    * column (a driver-side array of doubles), bucket assignment is a
    * pure broadcast-literal projection, and the only shuffle is the
    * final range repartition on the z column. No global sort, no
    * single-partition window — a maintenance-job cost, like
    * compaction.
    */
  def zorderedParquet(
      df: DataFrame,
      path: String,
      c1: String,
      c2: String,
      files: Int = 32,
      bits: Int = 8
  ): Unit = {
    import org.apache.spark.sql.functions._
    // 12 bits = 4095 boundary comparisons per row per column — already
    // the practical ceiling for the literal-array bucket expression;
    // file-level clustering saturates far below that (default 8)
    require(bits >= 2 && bits <= 12, "bits per dimension must be in [2, 12]")
    val reserved = Set("__r1", "__r2", "__z")
    require(!df.columns.exists(reserved),
      s"input already has a ${reserved.mkString("/")} column — it would be silently dropped")
    val probs = (1 until (1 << bits)).map(_.toDouble / (1 << bits)).toArray
    // quantile error must resolve adjacent bucket boundaries or the
    // extra bits buy nothing
    val relErr = math.min(0.001, 0.25 / (1 << bits))
    val quantiles = df
      .select(col(c1).cast("double").as("q1"), col(c2).cast("double").as("q2"))
      .stat.approxQuantile(Array("q1", "q2"), probs, relErr)
    // bucket = how many boundaries the value clears: a codegen'd
    // filter/size over a literal array, no shuffle, no window
    def bucket(c: String, bounds: Array[Double]) =
      size(filter(array(bounds.toIndexedSeq.map(lit): _*), b => col(c).cast("double") >= b)).cast("long")
    val z = (0 until bits).map { i =>
      (shiftright(col("__r1"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))) +
        (shiftright(col("__r2"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)))
    }.reduce(_ + _)
    df.withColumn("__r1", bucket(c1, quantiles(0)))
      .withColumn("__r2", bucket(c2, quantiles(1)))
      .withColumn("__z", z)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__r1", "__r2", "__z")
      .write.mode("overwrite").parquet(path)
  }

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
