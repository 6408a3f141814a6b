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
    *
    * Cache lifetime: the returned frame is LAZY and every round of
    * its plan references the cached edge/node frames — they must stay
    * cached until the caller's action, so release is caller-owned
    * (`spark.catalog.clearCache()` between queries, as Bench/Verify
    * do). Unpersisting them here would make CacheManager
    * re-compile-and-EMPTY each dependent cached entry (see [[hits]],
    * which restructures onto localCheckpoint to avoid exactly that).
    */
  def pageRank(
      edges: DataFrame,
      iters: Int = 5,
      dampPct: Int = 85
  ): DataFrame = {
    require(dampPct >= 0 && dampPct <= 100, s"dampPct must be 0..100, got $dampPct")
    val SCALE = 1000000000000L
    val e = edges.select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
    // Cached frames compile without AQE, so without explicit sizing
    // both loop inputs materialize at the full shuffle width and all
    // 2×iters downstream passes schedule that many tasks over
    // node-cardinality rows — byte-derived shrink (no-op at scale,
    // see Sizing) measured −50% on the whole query at sf0.1.
    val nodes = Sizing.coalesceForCache(
      e.select(col("src").as("id"))
        .union(e.select(col("dst").as("id")))
        .distinct())
      .cache()
    val n = nodes.count()
    val r0 = SCALE / n // exact: both engines compute SCALE DIV n
    val base = ((100L - dampPct) * r0) / 100L
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val ecd = Sizing.coalesceForCache(e.join(deg, "src")).cache()
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

  /** C63: HITS hub/authority scores (Kleinberg 1999) in EXACT integer
    * fixed-point — the complementary centrality to [[pageRank]]: a
    * node is a good AUTHORITY if good hubs link to it and a good HUB
    * if it links to good authorities (directory/link-farm structure
    * PageRank's single score conflates). Per round: a(v) = Σ_{u→v}
    * h(u) then L∞-renormalize to 1e6 (integer DIV against a 1-row
    * broadcast max), h(u) = Σ_{u→v} a(v) then renormalize — the
    * power-iteration normalization that keeps every value in [0,
    * 1e6] so cross-engine Long arithmetic never overflows (bound:
    * max in-degree · 1e6 · 1e6 < 2^63 ⟺ degree < 9.2e6; document
    * larger graphs onto a wider scale). DuckDB twin unrolls the
    * rounds and matches bit-for-bit.
    *
    * Plan per round: two keyed join+agg pairs (src then dst), each
    * with map-side combine; maxima ride as 1-row broadcasts; scores
    * never visit the driver.
    */
  def hits(edges: DataFrame, iters: Int = 4): DataFrame = {
    // Byte-derived cache width (no-op at scale; the pageRank
    // rationale): per probe run the full-width caches put 178 tasks
    // on the wire vs ~50 sized — every half-step's join re-reads e.
    val e = Sizing.coalesceForCache(
      edges.select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))).cache()
    val nodes = Sizing.coalesceForCache(
      e.select(col("src").as("id")).union(e.select(col("dst").as("id"))).distinct()).cache()
    var hubs = nodes.select(col("id"), lit(1000000L).as("h"))
    // zero-initialized so iters = 0 degrades to all-zero authorities
    // instead of an NPE at the final join
    var auths: DataFrame = nodes.select(col("id"), lit(0L).as("a"))
    // Per half-step: ONE keyed join+agg over the score frames that
    // actually carry mass — nodes with no in-edges (no asum row) have
    // score 0, contribute nothing to the next sum, and can never be
    // the (non-negative) max, so the per-round LEFT join back onto
    // the full node set is dropped entirely; zeros materialize once
    // in the final projection. Each half-step localCheckpoints: the
    // max collection reads materialized blocks, every round's plan
    // stays constant-size (no lineage growth), and NOTHING enters
    // CacheManager — unpersisting a cached subtree would re-compile
    // (and empty) every dependent cached entry, which recomputed the
    // whole loop inside the caller's first action in the cache()-based
    // form (measured +2-4s at sf0.1). Checkpoint blocks are owned by
    // their RDDs and GC-reclaimed; not fault-tolerant, which a
    // recomputable derived score table tolerates.
    for (_ <- 0 until iters) {
      val asum = e.join(hubs, e("src") === hubs("id"))
        .groupBy(col("dst")).agg(sum(col("h")).as("ar"))
        .localCheckpoint()
      val amRow = asum.agg(max(col("ar"))).head()
      val am = if (amRow.isNullAt(0)) 1L else math.max(amRow.getLong(0), 1L)
      auths = asum.select(col("dst").as("id"), expr(s"(ar * 1000000L) DIV ${am}L").as("a"))
      val hsum = e.join(auths, e("dst") === auths("id"))
        .groupBy(col("src")).agg(sum(col("a")).as("hr"))
        .localCheckpoint()
      val hmRow = hsum.agg(max(col("hr"))).head()
      val hm = if (hmRow.isNullAt(0)) 1L else math.max(hmRow.getLong(0), 1L)
      hubs = hsum.select(col("src").as("id"), expr(s"(hr * 1000000L) DIV ${hm}L").as("h"))
    }
    val out = nodes
      .join(auths, Seq("id"), "left")
      .join(hubs, Seq("id"), "left")
      .select(col("id").as("node_id"),
        coalesce(col("a"), lit(0L)).as("auth_fp"),
        coalesce(col("h"), lit(0L)).as("hub_fp"))
      .orderBy("node_id")
      .localCheckpoint()
    e.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    out
  }

  /** C59: per-node triangle participation — the clustering-structure
    * signal web-graph curation ranks link farms / mutual-citation
    * rings by (a page whose neighborhood is a clique is a very
    * different quality prior than a tree-like hub).
    *
    * Algorithm: the compact-forward / degree-ordering enumeration
    * (Latapy 2008; also MR triangle counting, Suri & Vassilvitskii
    * 2011 — "node-iterator++"): canonicalize to undirected simple
    * edges, rank nodes by (degree, id), DIRECT every edge from
    * lower to higher rank, and join forward-adjacency with itself on
    * the source — each wedge (a→b, a→c) closes iff b→c (or c→b,
    * but rank-direction makes it exactly b→c for rank(b)<rank(c)) is
    * an edge. Directing by DEGREE bounds every node's forward
    * out-degree by O(sqrt(m)) on any graph, so the wedge self-join —
    * the only superlinear step — generates O(m^1.5) candidates
    * worst-case instead of Σ deg² (a single hub node would otherwise
    * emit deg²/2 wedges; ranked, a hub emits almost none). Each
    * triangle is enumerated exactly once, then credited to its three
    * corners via explode.
    *
    * Plan: degree agg + two keyed joins to rank endpoints, one
    * wedge self-join keyed on the source, one closing keyed join
    * against the directed edge set, explode + keyed count back onto
    * the node set. Everything is keyed shuffles on node ids; AQE's
    * skew split covers residual hot sources.
    *
    * The per-node result is enumeration-ORDER-INVARIANT, so the
    * DuckDB oracle can use the naive a<b<c id-ordered enumeration —
    * identical answer, no need to replicate the degree ranking.
    */
  def trianglesPerNode(edges: DataFrame): DataFrame = {
    // canonical simple undirected edges: u < v, self-loops dropped
    val und = edges
      .select(
        least(col("src").cast("long"), col("dst").cast("long")).as("u"),
        greatest(col("src").cast("long"), col("dst").cast("long")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val nodes = und.select(col("u").as("id")).union(und.select(col("v").as("id"))).distinct()
    val deg = und.select(col("u").as("id")).union(und.select(col("v").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    // rank key (deg, id) is a total order; direct edges low -> high
    val ranked = und
      .join(deg.select(col("id").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("id").as("v"), col("deg").as("dv")), "v")
      .select(
        when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")), col("u")).otherwise(col("v")).as("a"),
        when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")), col("v")).otherwise(col("u")).as("b"))
      .cache()
    // rank of b vs c inside a wedge: compare (deg, id) again — join
    // degrees once onto the directed frame so the wedge filter is local
    val fwd = ranked
      .join(deg.select(col("id").as("b"), col("deg").as("db")), "b")
      .select(col("a"), col("b"), col("db"))
    val wedges = fwd.alias("x")
      .join(fwd.alias("y"), col("x.a") === col("y.a") &&
        (col("x.db") < col("y.db") || (col("x.db") === col("y.db") && col("x.b") < col("y.b"))))
      .select(col("x.a").as("a"), col("x.b").as("b"), col("y.b").as("c"))
    val tris = wedges
      .join(ranked.select(col("a").as("b"), col("b").as("c")), Seq("b", "c"))
    val credit = tris.select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_tri"))
    // node-scale result localCheckpointed (lineage cut) so the
    // edge-scale `ranked` cache can drop out of executor storage —
    // unpersisting it under a cache()d result would re-compile and
    // EMPTY that cache entry instead (the hits() lesson)
    val out = nodes
      .join(credit, Seq("id"), "left")
      .select(col("id").as("node_id"), coalesce(col("n_tri"), lit(0L)).as("n_tri"))
      .orderBy("node_id")
      .localCheckpoint()
    ranked.unpersist(blocking = false)
    out
  }

  /** C73 (graph_kcore): k-core decomposition by BOUNDED-ROUND peeling —
    * the density structure web-corpus curation keeps (the k-core) vs
    * prunes (low-connectivity periphery), and the standard first step
    * of community/degeneracy analysis.
    *
    * Semantics are exactly `rounds` peel iterations: each round drops
    * every node with degree < k in the CURRENT subgraph, then edges
    * with a dropped endpoint. Peeling is MONOTONE (the surviving set
    * only shrinks, and once no node is below k nothing changes), so
    * any `rounds` ≥ the graph's peel depth yields THE k-core, and the
    * bounded form is engine-exact either way — both engines run the
    * identical rounds, which is what makes a bit-for-bit oracle
    * possible for an otherwise run-to-fixpoint algorithm (the
    * pageRank/hits fixed-iteration discipline). Convergence at test
    * scale is spec-asserted (round R−1 ≡ round R).
    *
    * Plan shape per round: one degree aggregation (explode both
    * endpoints + keyed count) and two LEFT SEMI joins back onto the
    * edge set — all keyed, never node×node. Each round
    * localCheckpoints: constant-size plans, materialized blocks, no
    * CacheManager entries (the hits() lesson). Returns the surviving
    * nodes with their in-core degree.
    */
  def kcoreRounds(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    // canonical undirected simple graph: (lo, hi), self-loops dropped
    var e = edges
      .select(
        least(col("src"), col("dst")).cast("long").as("a"),
        greatest(col("src"), col("dst")).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint()
    // No early-exit-on-fixpoint here, although peeling is monotone and
    // a count-stable round would make the tail rounds identity:
    // measured at sf0.1 the staged graph keeps shrinking through all
    // 10 rounds, so a per-round convergence count was pure added cost
    // (36 → 58 jobs, no round ever saved).
    for (_ <- 0 until rounds) {
      val alive = e.select(col("a").as("id")).unionAll(e.select(col("b").as("id")))
        .groupBy(col("id")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select(col("id"))
      e = e
        .join(alive.select(col("id").as("a")), Seq("a"), "left_semi")
        .join(alive.select(col("id").as("b")), Seq("b"), "left_semi")
        .select(col("a"), col("b"))
        .localCheckpoint()
    }
    e.select(col("a").as("node_id")).unionAll(e.select(col("b").as("node_id")))
      .groupBy(col("node_id")).agg(count(lit(1)).as("deg_core"))
      .orderBy(col("node_id"))
  }

  /** C91: synchronous MIN-LABEL propagation for a FIXED round budget —
    * the bounded-cost community/component signal (Raghavan et al. 2007
    * simplified to the deterministic min rule): label_0(v) = v,
    * label_{t+1}(v) = min(label_t(v), min over undirected neighbors
    * of label_t). After `rounds` rounds every node carries the
    * smallest node id within `rounds` hops — nodes sharing a label are
    * provably connected, and labels stabilize to connected components
    * once rounds ≥ diameter. The fixed budget is the point: a
    * production pipeline runs k rounds per batch window (cost is k
    * keyed join+agg pairs, known in advance) instead of
    * converge-to-fixpoint whose round count the data controls —
    * [[graft.operators.Dedup]] cluster assignment wants the exact
    * fixpoint; THIS is the budgeted scan that feeds dashboards.
    *
    * Per round: ONE keyed join of labels onto the symmetrized edge
    * list + ONE map-side-combined min-agg — labels never visit the
    * driver; deterministic min arithmetic makes an unrolled DuckDB
    * twin bit-exact. localCheckpoint per round caps lineage (the
    * pageRank discipline).
    */
  def labelPropRounds(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val sym = edges
      .select(col("src").cast("long").as("u"), col("dst").cast("long").as("v"))
      .unionAll(edges.select(col("dst").cast("long").as("u"), col("src").cast("long").as("v")))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()
    var labels = sym.select(col("u").as("id")).distinct()
      .select(col("id"), col("id").as("label"))
      .localCheckpoint()
    for (_ <- 0 until rounds) {
      val fromNbrs = sym
        .join(labels.select(col("id").as("v"), col("label")), Seq("v"))
        .groupBy(col("u").as("id"))
        .agg(min(col("label")).as("nl"))
      labels = labels
        .join(fromNbrs, Seq("id"), "left")
        .select(col("id"), least(col("label"), coalesce(col("nl"), col("label"))).as("label"))
        .localCheckpoint()
    }
    labels.orderBy(col("id")).select(col("id").as("node_id"), col("label"))
  }
}
