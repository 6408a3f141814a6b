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

  /** B52: key-distribution diagnosis for a prospective grouping/join
    * key: the top-k hottest keys with exact counts and each key's
    * share of the table in basis points — the report that decides
    * between a plain hash agg, [[saltedSumCount]], and a broadcast.
    * One keyed agg, a 1-row total broadcast back, then orderBy+limit —
    * Spark plans TakeOrderedAndProject (map-side top-k), so the
    * full key census is never sorted or collected at any scale.
    */
  def skewReport(df: DataFrame, keys: Seq[String], topK: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n_rows"))
    val total = counts.agg(sum(col("n_rows")).as("__total"))
    val ordered = keys.map(col)
    val top = counts
      .crossJoin(broadcast(total))
      .select(ordered :+ col("n_rows") :+
        // Long integral `div`, not double `/` + floor: double division is
        // exact only while n_rows*10000 < 2^53 (~9e11 rows); `div` stays
        // bit-stable against the DuckDB integer `//` oracle at any count,
        // consistent with the TpchShapes basis-point math.
        expr("n_rows * 10000 div __total").cast("long").as("share_bp"): _*)
      .orderBy(col("n_rows").desc +: ordered: _*)
      .limit(topK)
    top.withColumn("rk",
      row_number().over(Window.orderBy(col("n_rows").desc +: ordered: _*)).cast("long"))
  }
}
