package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph operators for web-corpus curation. Reference scope:
  * the reference ETL has no graph capability; this implements the
  * domain/page centrality signal large web-corpus pipelines rank
  * sources by (harmonic/PageRank centrality is the documented
  * quality prior behind Common-Crawl-derived corpora).
  */
object GraphOps {

  /** C54: PageRank in EXACT integer fixed-point — the canonical
    * "must survive 1000 executors" iterative graph op, in a form a
    * second engine replays bit-for-bit (float PageRank cannot be
    * cross-engine checked; integer DIV can).
    *
    * Semantics: rank lives in units of SCALE=1e12 total mass;
    * r0 = SCALE DIV n per node, and each round
    *   r'(v) = base + (damp · Σ_{u→v} (r(u) DIV deg(u))) DIV 100,
    * with base = ((100−damp) · (SCALE DIV n)) DIV 100. Nodes with no
    * in-edges get exactly base. Dangling mass (nodes without
    * out-edges) leaks rather than redistributing — the standard
    * simplification, identical in the oracle.
    *
    * Plan shape per round — the distributed-PageRank shape, nothing
    * driver-side: the (src, dst, deg) frame is built ONCE (one deg
    * agg + one keyed join, cached); each round is one keyed join of
    * ranks into that frame on src and one map-side-combined agg on
    * dst, then a LEFT join back to the node set. Ranks never visit
    * the driver; n (one Long) is the only collected value. At
    * cluster scale the edge frame partitions by src once and every
    * round's join reuses that partitioning; the dst agg is the one
    * unavoidable shuffle per round.
    */
  def pageRank(
      edges: DataFrame,
      iters: Int = 5,
      dampPct: Int = 85
  ): DataFrame = {
    require(dampPct >= 0 && dampPct <= 100, s"dampPct must be 0..100, got $dampPct")
    val SCALE = 1000000000000L
    val e = edges.select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct()
      .cache()
    val n = nodes.count()
    val r0 = SCALE / n // exact: both engines compute SCALE DIV n
    val base = ((100L - dampPct) * r0) / 100L
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val ecd = e.join(deg, "src").cache()
    var ranks = nodes.select(col("id"), lit(r0).as("r"))
    for (_ <- 0 until iters) {
      val sums = ecd
        .join(ranks, ecd("src") === ranks("id"))
        .select(col("dst"), expr("r DIV deg").as("c"))
        .groupBy("dst")
        .agg(sum(col("c")).as("s"))
      ranks = nodes
        .join(sums, nodes("id") === sums("dst"), "left")
        .select(col("id"), (lit(base) + expr(s"($dampPct * coalesce(s, 0L)) DIV 100")).as("r"))
    }
    ranks.select(col("id").as("node_id"), col("r").as("rank_fp")).orderBy("node_id")
  }
}
