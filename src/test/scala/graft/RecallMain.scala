package graft

import org.apache.spark.sql.SparkSession

/** Driver-side recall measurement for the five rows-only ANN entries
  * (test scope, not shipped): runs each approximate `SparkEntry`
  * query and `sim_topk_brute` on the SAME data, computes recall@k —
  * |approx ∩ brute| / |brute| over (qid, neighbor_id) sets — and
  * writes one JSON line per (index, scale) to the output path. The
  * ScaleSpec property tests assert these same floors; this artifact
  * makes the numbers driver-checkable like CORRECTNESS.
  */
object RecallMain {

  private val annQueries = Seq(
    // name -> probe parameters worth recording alongside the number
    ("sim_topk_lsh", "planes=8,tables=4,probeHamming=2"),
    ("sim_topk_ivf", "nClusters=16,nProbes=4"),
    ("sim_topk_ivf_sq8", "nClusters=16,nProbes=4,shortlist=50"),
    ("sim_topk_pq", "m=8,kCodes=64,shortlist=50"),
    ("sim_topk_ivfpq", "nClusters=16,nProbes=4,m=8,kCodes=64,shortlist=50")
  )

  def main(args: Array[String]): Unit = {
    val outPath = args.headOption.getOrElse("RECALL_r9.json")
    val sfDirs = if (args.length > 1) args.drop(1).toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .appName("recall").getOrCreate()

    def ranked(name: String, dir: String): Map[Long, Seq[Long]] =
      SparkEntry.queries(name)(spark, dir)
        .select("qid", "rank", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1).map { case (q, rs) => q -> rs.sortBy(_._2).map(_._3).toSeq }

    val records = for {
      dir <- sfDirs
      brute = ranked("sim_topk_brute", dir)
      (name, params) <- annQueries
    } yield {
      val approx = ranked(name, dir)
      val brutePairs = brute.toSeq.flatMap { case (q, ns) => ns.map((q, _)) }.toSet
      val approxPairs = approx.toSeq.flatMap { case (q, ns) => ns.map((q, _)) }.toSet
      val recallK = (approxPairs intersect brutePairs).size.toDouble / brutePairs.size
      // rank-1 recall: is each query's TRUE nearest neighbor anywhere
      // in the approximate list? (the twin-finding contract the
      // bucketed LSH index is built for — its ScaleSpec floor)
      val rank1 = brute.count { case (q, ns) =>
        ns.headOption.exists(n1 => approx.getOrElse(q, Nil).contains(n1))
      }.toDouble / brute.size
      val sf = dir.split("/").last
      f"""{"index":"$name","sf":"$sf","k":5,"params":"$params","n_queries":${brute.size},"recall_at_k":$recallK%.4f,"rank1_recall":$rank1%.4f}"""
    }
    val out = new java.io.PrintWriter(outPath)
    try records.foreach(out.println) finally out.close()
    records.foreach(println)
    spark.stop()
  }
}
