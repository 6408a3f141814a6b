package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the most recent right row of the
  * same key with right_time <= left_time.
  *
  * Spark has no native as-of join; rather than a custom SparkPlan,
  * this composes built-ins (the preferred extension tier): tag both
  * sides, union them, and take a running last_value over a single
  * (key, time)-sorted window. Cost = one hash shuffle on the key —
  * the same price as the sort-merge join a native operator would do,
  * with AQE/skew handling for free. Right rows sort before left rows
  * at equal timestamps, so "<=" semantics hold exactly.
  */
object AsOfJoin {

  /** @param valueCol right-side column carried to the left rows (the
    *                 as-of value; null when no right row precedes)
    */
  def lastBefore(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTimeCol: String,
      rightTimeCol: String,
      valueCol: String
  ): DataFrame = {
    val leftCols = left.columns
    val l = left
      .withColumn("__t", col(leftTimeCol))
      .withColumn("__side", lit(1))
      .withColumn("__v", lit(null).cast(right.schema(valueCol).dataType))
      .withColumnRenamed(keyCol, "__k")
    val r = right.select(
      col(keyCol).as("__k"),
      col(rightTimeCol).as("__t"),
      lit(0).as("__side"),
      col(valueCol).as("__v")
    )
    val unioned = l.select(
      (Seq(col("__k"), col("__t"), col("__side"), col("__v")) ++
        leftCols.filterNot(_ == keyCol).map(col)): _*
    ).unionByName(r, allowMissingColumns = true)
    val w = Window
      .partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"), col("__v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    unioned
      .withColumn("__asof", last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(
        (Seq(col("__k").as(keyCol)) ++ leftCols.filterNot(_ == keyCol).map(col) :+
          col("__asof").as(s"asof_$valueCol")): _*
      )
  }
}
