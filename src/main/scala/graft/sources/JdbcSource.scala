package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** JDBC source layer — the reference's connection-config surface
  * (ES_HOST / CLICKHOUSE_* env config + scroll-read loop,
  * es_to_bytehouse.py:100-160, clickhouse_to_bytehouse.py:34-80)
  * mapped onto Spark's native JDBC relation:
  *
  *  - the scroll loop becomes a PARTITIONED parallel read (Spark
  *    issues `numPartitions` range queries instead of one cursor —
  *    the property that makes a 100 TB source table readable at all);
  *  - `SCROLL_SIZE` becomes `fetchSize` (rows per round-trip);
  *  - incremental watermark filters are plain scan predicates, which
  *    Spark pushes into the remote WHERE clause (asserted in tests).
  *
  * Proven against embedded Derby in SyncSpec, including the full
  * JDBC → autoSync → parquet loop (the reference's core deployment).
  */
case class JdbcSourceConfig(
    url: String,
    table: String, // schema-qualified, quoted as the backend expects
    partitionColumn: Option[String] = None,
    numPartitions: Int = 8,
    fetchSize: Int = 10000,
    properties: Map[String, String] = Map.empty
)

object JdbcSource {

  private def reader(spark: SparkSession, cfg: JdbcSourceConfig) = {
    val base = spark.read
      .format("jdbc")
      .option("url", cfg.url)
      .option("fetchsize", cfg.fetchSize)
    cfg.properties.foldLeft(base) { case (r, (k, v)) => r.option(k, v) }
  }

  /** Read the whole table. With `partitionColumn` set (a numeric
    * column), bounds are discovered with one MIN/MAX query pushed to
    * the database, then Spark reads `numPartitions` disjoint ranges in
    * parallel — no single-cursor bottleneck, no driver-side data.
    */
  def load(spark: SparkSession, cfg: JdbcSourceConfig): DataFrame =
    cfg.partitionColumn match {
      case Some(pc) =>
        val bounds = reader(spark, cfg)
          .option("dbtable", s"(SELECT MIN($pc) AS lo, MAX($pc) AS hi FROM ${cfg.table}) b")
          .load()
          .collect()(0)
        if (bounds.isNullAt(0)) // empty table: plain single-partition read
          reader(spark, cfg).option("dbtable", cfg.table).load()
        else
          reader(spark, cfg)
            .option("dbtable", cfg.table)
            .option("partitionColumn", pc)
            .option("lowerBound", bounds.get(0).toString)
            .option("upperBound", bounds.get(1).toString)
            .option("numPartitions", cfg.numPartitions)
            .load()
      case None =>
        reader(spark, cfg).option("dbtable", cfg.table).load()
    }

  /** One incremental batch: rows with `timeCol` strictly after the
    * watermark. The comparison stays a Catalyst predicate on the JDBC
    * relation, so it is pushed into the remote WHERE clause — the
    * database, not Spark, skips the old rows.
    */
  def loadSince(spark: SparkSession, cfg: JdbcSourceConfig, timeCol: String, watermark: String): DataFrame =
    load(spark, cfg).filter(col(timeCol) > lit(watermark).cast("timestamp"))
}
