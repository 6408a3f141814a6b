package graft

import org.apache.spark.sql.SparkSession
import graft.operators.Dedup

/** One-off driver-side measurement runner (test scope, not shipped):
  * prints containment candidate volume before/after the KMV screen.
  */
object ScreenStatsMain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/scale_data/sf10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", "100g")
      .appName("screen-stats").getOrCreate()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val (total, kept) = Dedup.containmentScreenStats(docs, "doc_id", "text", n = 3, tauPct = 70)
    println(s"SCREENSTATS total=$total kept=$kept rejectPct=${100.0 * (total - kept) / math.max(total, 1)}")
    spark.stop()
  }
}
