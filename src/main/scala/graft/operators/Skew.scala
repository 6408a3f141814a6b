package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot grouping keys.
  *
  * AQE rebalances skewed *joins* at runtime, but a groupBy whose
  * hottest key dwarfs every other still bottlenecks on one reducer.
  * Salting splits each key into `saltFactor` subkeys, partially
  * aggregates, then merges — two small shuffles instead of one skewed
  * one. Only aggregates with a merge decomposition (sum/count/min/max)
  * qualify; that covers this engine's integer-cents aggregates.
  */
object Skew {

  /** Two-stage salted sum/count aggregation.
    *
    * @param sums  (inputCol → outputName) columns summed as Long
    * @param countName output name for the row count
    */
  def saltedSumCount(
      df: DataFrame,
      keys: Seq[String],
      sums: Seq[(Column, String)],
      countName: String,
      saltFactor: Int = 16
  ): DataFrame = {
    val salted = df.withColumn(
      "__salt",
      pmod(spark_partition_id().cast("long") + monotonically_increasing_id(), lit(saltFactor.toLong))
    )
    val aggs1 = sums.zipWithIndex.map { case ((c, _), i) => sum(c).alias(s"__s$i") } :+
      count(lit(1)).alias("__cnt")
    val stage1 = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(aggs1.head, aggs1.tail: _*)
    val aggs2 = sums.zipWithIndex.map { case ((_, n), i) => sum(col(s"__s$i")).alias(n) } :+
      sum(col("__cnt")).alias(countName)
    stage1.groupBy(keys.map(col): _*).agg(aggs2.head, aggs2.tail: _*)
  }
}
