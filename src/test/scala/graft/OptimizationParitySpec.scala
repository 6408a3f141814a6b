package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{TextAnalysis, TpchShapes}
import graft.sources.Catalog

/** Round-12 optimization parity: every restructured operator must
  * produce BIT-IDENTICAL results to the formulation it replaced. Each
  * test runs old and new side by side on real sf0.001 tables plus
  * staged edge cases and diffs collected rows.
  */
class OptimizationParitySpec extends SparkSpec {

  private def diff(a: DataFrame, b: DataFrame): Unit = {
    assert(a.schema.map(f => (f.name, f.dataType)) === b.schema.map(f => (f.name, f.dataType)))
    val ra = a.collect().map(_.toString).toSeq
    val rb = b.collect().map(_.toString).toSeq
    assert(ra === rb)
  }

  // ---- text kernels ----

  private def edgeDocs: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, ""), // empty: split('') = [''] — one empty word
      (2L, "word"),
      (3L, "the quick brown fox and that dog have fun with it"),
      (4L, "- bullet one\n  - indented bullet\n\t- tab is NOT ltrimmed\n• unicode bullet\nplain"),
      (5L, "ends with dots...\nends with unicode…\nends with spaces...   \nno ellipsis here"),
      (6L, "......"), // 6 dots = two non-overlapping '...'
      (7L, "....."), // 5 dots = one match
      (8L, "a…b…c ### #"),
      (9L, "Ünïcödé wörds ánd ASCII mix 机器 学习 123 456"),
      (10L, "trailing newline\n"),
      (11L, " \t \n mixed   whitespaceVT\f\r end "),
      (12L, (1 to 80).map(i => s"w$i the of and").mkString(" ")),
      (13L, "* star bullet\n- dash\n• dot\nnot - a bullet"),
      (14L, "x...\n...\n…\n.\n.."),
      (15L, "HAVE WITH THAT BE TO OF AND THE have with")
    ).toDF("doc_id", "text")
  }

  test("gopherGate: kernel ≡ declarative formulation on edge cases + sf0.001 docs") {
    val docs = Catalog.load(spark, sf, "documents").select(col("doc_id"), col("text"))
    for (d <- Seq(edgeDocs, docs)) {
      diff(
        TextAnalysis.gopherGate(d, "doc_id", "text").orderBy("doc_id"),
        TextAnalysis.gopherGateDeclarative(d, "doc_id", "text").orderBy("doc_id"))
    }
  }

  test("watermarkScore: kernel ≡ declarative formulation on edge cases + sf0.001 docs") {
    val docs = Catalog.load(spark, sf, "documents").select(col("doc_id"), col("text"))
    for (d <- Seq(edgeDocs, docs)) {
      diff(
        TextAnalysis.watermarkScore(d, "doc_id", "text"),
        TextAnalysis.watermarkScoreDeclarative(d, "doc_id", "text"))
    }
  }

  test("bigramHashPairs: zero-copy range hashes ≡ xxhash64 over word/concat strings, both modes") {
    import graft.operators.Dedup
    import graft.functions.VecOps
    for (d <- Seq(edgeDocs, Catalog.load(spark, sf, "documents").select(col("doc_id"), col("text")))) {
      val w = split(Dedup.normalize(col("text")), " ")
      val heads = slice(w, lit(1), size(w) - 1)
      val tails = slice(w, lit(2), size(w) - 1)
      // lm mode: (hash(head), hash(head ∥ ' ' ∥ tail))
      val declLm = d.select(col("doc_id"), explode(zip_with(heads, tails,
        (h, tl) => struct(xxhash64(h).as("hh"), xxhash64(concat(h, lit(" "), tl)).as("bh")))).as("p"))
        .select(col("doc_id"), col("p.hh"), col("p.bh")).orderBy("doc_id", "hh", "bh")
      val kernLm = d.select(col("doc_id"),
        explode(VecOps.bigram_hash_pairs(VecOps.normalize_ws(col("text")), tailMode = false)).as("p"))
        .select(col("doc_id"), col("p.hh"), col("p.bh")).orderBy("doc_id", "hh", "bh")
      diff(kernLm, declLm)
      // kn mode: (hash(head), hash(tail))
      val declKn = d.select(col("doc_id"), explode(zip_with(heads, tails,
        (h, tl) => struct(xxhash64(h).as("hh"), xxhash64(tl).as("th")))).as("p"))
        .select(col("doc_id"), col("p.hh"), col("p.th")).orderBy("doc_id", "hh", "th")
      val kernKn = d.select(col("doc_id"),
        explode(VecOps.bigram_hash_pairs(VecOps.normalize_ws(col("text")), tailMode = true)).as("p"))
        .select(col("doc_id"), col("p.hh"), col("p.th")).orderBy("doc_id", "hh", "th")
      diff(kernKn, declKn)
    }
  }

  test("clipDedup: interval-merge kernel ≡ sequence-explode/distinct/array_contains formulation") {
    import graft.operators.Curation
    val docs = Catalog.load(spark, sf, "documents").select(col("doc_id"), col("text"))
    for ((d, n) <- Seq((edgeDocs, 2), (edgeDocs, 4), (docs, 8))) {
      diff(
        Curation.clipDedup(d, "doc_id", "text", n),
        Curation.clipDedupDeclarative(d, "doc_id", "text", n))
    }
  }

  test("dupSpanStats: sorted-run kernel ≡ gaps-and-islands formulation") {
    import graft.operators.Curation
    val docs = Catalog.load(spark, sf, "documents").select(col("doc_id"), col("text"))
    for ((d, n) <- Seq((edgeDocs, 2), (edgeDocs, 4), (docs, 8))) {
      diff(
        Curation.dupSpanStats(d, "doc_id", "text", n),
        Curation.dupSpanStatsDeclarative(d, "doc_id", "text", n))
    }
  }

  test("coveredCount/maxConsecRun: interval and run edge cases") {
    import graft.functions.VecOps
    import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
    def arr(xs: Long*) = UnsafeArrayData.fromPrimitiveArray(xs.toArray)
    // disjoint, overlapping, touching, duplicate-free sorted starts
    assert(VecOps.coveredCount(arr(), 4) === 0L)
    assert(VecOps.coveredCount(arr(0L), 4) === 4L)
    assert(VecOps.coveredCount(arr(0L, 10L), 4) === 8L)
    assert(VecOps.coveredCount(arr(0L, 2L), 4) === 6L) // overlap merges
    assert(VecOps.coveredCount(arr(0L, 4L), 4) === 8L) // touching
    assert(VecOps.coveredCount(arr(0L, 1L, 2L, 3L), 4) === 7L)
    assert(VecOps.maxConsecRun(arr()) === 0L)
    assert(VecOps.maxConsecRun(arr(5L)) === 1L)
    assert(VecOps.maxConsecRun(arr(1L, 2L, 3L, 7L, 8L)) === 3L)
    assert(VecOps.maxConsecRun(arr(1L, 3L, 5L)) === 1L)
  }

  test("dotCenteredDiv: reference-object kernel ≡ inlined-literal expression, incl. negative DIV") {
    import graft.functions.VecOps
    import spark.implicits._
    val dims = 8
    val rows = Seq(
      Array(5L, -3L, 1000L, -999L, 0L, 7L, -7L, 123456L),
      Array.fill(dims)(0L),
      Array(-1000000L, 999999L, 2L, -2L, 3L, -3L, 4L, -4L))
    val df = rows.map(Tuple1(_)).toDF("xq")
    val mu = Array(1L, -2L, 3L, -4L, 5L, -6L, 7L, -8L)
    for (v <- Seq(Array.fill(dims)(1000000L), Array(-7L, 13L, -1000000L, 999999L, 0L, 1L, -1L, 500000L))) {
      val exprStr = (0 until dims).map(d => s"(xq[$d] - ${mu(d)}L) * ${v(d)}L").mkString("(", " + ", ") DIV 1000000")
      diff(
        df.select(VecOps.dot_centered_div(col("xq"), mu, v).as("s")),
        df.select(expr(exprStr).as("s")))
    }
  }

  // ---- TPC-H shape restructures ----

  test("q21Waiting: window formulation ≡ agg+join-back formulation") {
    val li = Catalog.load(spark, sf, "lineitem")
    val orders = Catalog.load(spark, sf, "orders")
    val supplier = Catalog.load(spark, sf, "supplier")
    // the pre-r12 agg + join-back formulation, verbatim
    val liN = li.select(col("l_orderkey"), col("l_suppkey"),
      unix_micros(col("l_shipdate").cast("timestamp")).as("l_us"))
    val fOrders = orders.filter(col("o_orderstatus") === "F").select(col("o_orderkey"))
    val scoped = liN.join(fOrders, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"), col("l_us"))
    val perOrder = scoped
      .groupBy(col("l_orderkey"))
      .agg(countDistinct(col("l_suppkey")).as("n_supp"), max(col("l_us")).as("max_us"))
      .filter(col("n_supp") > 1)
      .select(col("l_orderkey").as("agg_ok"), col("max_us"))
    val old = scoped
      .join(perOrder, col("l_orderkey") === col("agg_ok"))
      .filter(col("l_us") === col("max_us"))
      .groupBy(col("l_suppkey"))
      .agg(countDistinct(col("l_orderkey")).as("n_waits"))
      .join(supplier.select(col("s_suppkey"), col("s_name")), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_waits"))
      .orderBy(col("n_waits").desc, col("s_suppkey"))
      .limit(20)
    diff(TpchShapes.q21Waiting(supplier, orders, li), old)
  }

  test("q16SupplierCnt: pre-join (partkey, suppkey) distinct ≡ no-distinct formulation") {
    val li = Catalog.load(spark, sf, "lineitem")
    val part = Catalog.load(spark, sf, "part")
    val supplier = Catalog.load(spark, sf, "supplier")
    val bad = supplier.filter(col("s_acctbal") < 0).select(col("s_suppkey").as("bad_suppkey"))
    val parts = part.filter(col("p_type") =!= "PROMO")
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    val old = li
      .select(col("l_partkey"), col("l_suppkey"))
      .join(broadcast(bad), col("l_suppkey") === col("bad_suppkey"), "left_anti")
      .join(parts, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size").cast("long").as("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
    diff(TpchShapes.q16SupplierCnt(supplier, part, li), old)
  }
}
