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
    if (sys.env.contains("GRAFT_PROBE")) {
      import org.apache.spark.sql.functions._
      import graft.operators.Dedup
      val docs = graft.sources.Catalog.load(spark, sfDir, "documents")
      val sh = docs.select(
        col("doc_id").as("id"),
        array_distinct(transform(Dedup.wordShingles(col("text"), 3), s => xxhash64(s))).as("sh")
      )
      time("shingles")(sh.write.format("noop").mode("overwrite").save())
      val postings = sh.select(col("id"), size(col("sh")).as("n"), explode(col("sh")).as("h"))
      time("postings")(postings.write.format("noop").mode("overwrite").save())
      val joined = postings.select(col("h"), col("id").as("id_a"), col("n").as("na"))
        .join(postings.select(col("h"), col("id").as("id_b"), col("n").as("nb")), Seq("h"))
        .filter(col("id_a") < col("id_b"))
      time("join+count")(println(joined.count()))
      time("full")(SparkEntry.queries("dedup_ngram_jaccard")(spark, sfDir).write.format("noop").mode("overwrite").save())
      spark.stop(); return
    }
    if (sys.env.contains("GRAFT_ENTRY")) {
      // simulate the driver's smoke test: entry() on a plain session
      println(s"[scratch] entry rows = ${SparkEntry.entry(spark).count()}")
      spark.stop(); return
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
