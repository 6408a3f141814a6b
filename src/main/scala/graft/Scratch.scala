package graft

/** Ad-hoc perf scratchpad (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[scratch] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    if (sys.env.contains("GRAFT_PROBE_QUANT")) {
      import org.apache.spark.sql.functions._
      import graft.functions.VecOps
      val e = graft.sources.Catalog.load(spark, sfDir, "embeddings")
      val cands = e.select(col("vec_id").as("cid"), VecOps.quantize_i8(col("embedding")).as("cq"))
      val qs = broadcast(e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), VecOps.quantize_i8(col("embedding")).as("qq")))
      val candsF = e.select(col("vec_id").as("cid"), col("embedding").as("cv"))
      val qsF = broadcast(e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qv")))
      for (r <- 1 to 2) {
        time(s"inline-quant     r$r") {
          cands.join(qs, col("cid") =!= col("qid"))
            .select(col("qid"), VecOps.vec_dot_int(col("cq"), col("qq")).as("s"))
            .groupBy(col("qid")).agg(sum(col("s")))
            .write.format("noop").mode("overwrite").save()
        }
        time(s"sortWithinParts  r$r") {
          cands.sortWithinPartitions("cid").join(qs, col("cid") =!= col("qid"))
            .select(col("qid"), VecOps.vec_dot_int(col("cq"), col("qq")).as("s"))
            .groupBy(col("qid")).agg(sum(col("s")))
            .write.format("noop").mode("overwrite").save()
        }
        time(s"cond-touches-cq  r$r") {
          cands.join(qs, col("cid") =!= col("qid") && size(col("cq")) > -1)
            .select(col("qid"), VecOps.vec_dot_int(col("cq"), col("qq")).as("s"))
            .groupBy(col("qid")).agg(sum(col("s")))
            .write.format("noop").mode("overwrite").save()
        }
        time(s"float-dot        r$r") {
          candsF.join(qsF, col("cid") =!= col("qid"))
            .select(col("qid"), VecOps.vec_dot(col("cv"), col("qv")).as("s"))
            .groupBy(col("qid")).agg(sum(col("s")))
            .write.format("noop").mode("overwrite").save()
        }
      }
      spark.stop(); return
    }
    val names = sys.env.getOrElse("GRAFT_SCRATCH_QUERIES", "sim_topk_brute,sim_topk_quant")
      .split(",").map(_.trim).filter(_.nonEmpty)
    val explain = sys.env.contains("GRAFT_SCRATCH_EXPLAIN")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      if (explain) { println(s"=== $n ==="); df.explain("formatted") }
      time(s"$n run1") { df.write.format("noop").mode("overwrite").save() }
      time(s"$n run2") { df.write.format("noop").mode("overwrite").save() }
    }
    spark.stop()
  }
}
