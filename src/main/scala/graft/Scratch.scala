package graft

/** Ad-hoc perf scratchpad (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[16]", 16).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[scratch] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val explain = sys.env.contains("GRAFT_EXPLAIN")
    args.foreach { name =>
      if (explain) {
        println(s"==== $name ====")
        SparkEntry.queries(name)(spark, sfDir).explain("formatted")
      } else {
        time(name) {
          SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
        }
        time(name + " (2nd)") {
          SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
        }
      }
    }
    spark.stop()
  }
}
