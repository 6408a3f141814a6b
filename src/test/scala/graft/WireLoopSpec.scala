package graft

import graft.sinks.{ChHttpBatchExecutor, ChHttpClient, ClickHouseDdl}
import graft.sources.{EsRestClient, EsSourceConfig}
import graft.sync.WireSync

/** The reference's actual DEPLOYMENT shape, proven over live wires:
  * `run_incremental(continuous=True)` (es_to_bytehouse.py:1053-1102)
  * — N polling passes with the source moving BETWEEN passes and
  * faults injected MID-loop. WireSyncSpec proves one pass; this spec
  * proves the loop invariants the reference's design leans on:
  * watermarks monotone across every pass, a failed pass leaving zero
  * partial writes and zero state so the NEXT pass resumes it, per-index
  * fault isolation (the reference's `except Exception: continue`),
  * and exact end-state parity with the source under UNIQUE-KEY upsert
  * semantics. The second family pins the at-least-once seam every
  * state-after-write system has: a crash in the window between the
  * batched INSERT and the `_sync_state` append re-sends the page on
  * resume, and the UNIQUE-KEY target must CONVERGE — same rows, no
  * duplicates — for all three source variants (ES / Mongo / CH).
  */
class WireLoopSpec extends SparkSpec {

  private def doc(id: Long, day: Int, msg: String, updDay: Int): String =
    f"""{"id":$id,"created_at":"2024-01-$day%02d 00:00:00","msg":"$msg",""" +
      f""""updated_at":"2024-01-$updDay%02d 00:00:00"}"""

  private val mapping =
    """{"id":{"type":"long"},"created_at":{"type":"date"},"msg":{"type":"keyword"},""" +
      """"updated_at":{"type":"date"}}"""

  test("continuous loop: moving source, ES outage mid-loop, CH transient — monotone state, clean resume, exact parity") {
    val es = new EsStub(
      indices = Map("app_logs" -> (1 to 7).map(i => doc(i.toLong, i, s"m$i", i))),
      mappings = Map("app_logs" -> mapping))
    val ch = new ChStub
    ch.uniqueKeyCol = Some("_id") // CNCH UNIQUE KEY target: replay converges
    val port = es.start()
    ch.start()
    try {
      val cfg = EsSourceConfig.fromEnv(Map(
        "ES_HOST" -> s"http://127.0.0.1:$port", "INDEX_PATTERN" -> "app_*", "SCROLL_SIZE" -> "3"))
      // retrySleep injected so exhausting 503 retries doesn't wall-wait
      val client = new EsRestClient(cfg.host, maxRetries = 1, retrySleep = _ => ())
      val tgt = new ChHttpClient(ch.endpoint)
      val ep = ch.endpoint

      def rowsNow = ch.tables.get(("wh", "app_logs")).map(_.rows.size).getOrElse(0)
      val sizeAfterPass = scala.collection.mutable.Map[Int, Int]()
      // the source MOVES between passes — the reference's live world,
      // driven from the loop's own observation hook
      val between: Map[Int, () => Unit] = Map(
        1 -> (() => { // new doc + in-place edit → dual-watermark pickup
          es.addDoc("app_logs", "8", doc(8, 8, "m8", 8))
          es.updateDoc("app_logs", "2", doc(2, 2, "m2-EDITED", 9))
        }),
        2 -> (() => { // doc lands, then the cluster goes DOWN mid-pass-3:
          // two 503s on the search open exhaust maxRetries=1
          es.addDoc("app_logs", "9", doc(9, 9, "m9", 9))
          es.failures ++= Seq(("_search", 503, ""), ("_search", 503, ""))
        }),
        4 -> (() => { // CH transient on pass 5: batch INSERT fails once,
          // the row-at-a-time fallback must land every row
          es.addDoc("app_logs", "10", doc(10, 10, "m10", 10))
          ch.failNextInserts = 1
        })
      )
      val passes = WireSync.runContinuous(
        spark, client, cfg, tgt, () => new ChHttpBatchExecutor(ep),
        targetDb = "wh", maxPasses = 6, insertBatchSize = 4,
        onPassEnd = (p, _) => { sizeAfterPass(p) = rowsNow; between.get(p).foreach(_.apply()) })

      // ---- per-pass outcomes -------------------------------------------
      def ok(p: Int) = passes(p - 1).head.toOption.get
      assert(ok(1).mode == "full" && ok(1).rows == 7L, passes(0).toString)
      assert(ok(2).mode == "incremental" && ok(2).rows == 2L, passes(1).toString)
      // pass 3: outage → the index FAILED but the loop survived (the
      // reference's per-index isolation) and nothing was half-done
      assert(passes(2).head.isLeft, passes(2).toString)
      assert(passes(2).head.swap.toOption.get._1 == "app_logs")
      assert(sizeAfterPass(3) == sizeAfterPass(2), "a failed pass must write NOTHING")
      // pass 4: clean resume — doc 9 (missed by the outage) comes back
      assert(ok(4).mode == "incremental" && ok(4).rows == 1L, passes(3).toString)
      // pass 5: transient batch failure degraded to row fallback, no loss
      assert(ok(5).rows == 1L && ok(5).fallbackRows >= 1L && ok(5).failedRows == 0L, passes(4).toString)
      // pass 6: quiescent — nothing moved, nothing appended
      assert(ok(6).rows == 0L, passes(5).toString)

      // ---- loop invariants ---------------------------------------------
      val t = ch.tables(("wh", "app_logs"))
      val st = ch.tables(("wh", "_sync_state"))
      def cell(r: Seq[String], c: String) = r(st.schema.indexWhere(_._1 == c))
      // exact parity with the source's LATEST state under upsert
      assert(t.rows.size == 10, t.rows.size.toString)
      val msgIdx = t.schema.indexWhere(_._1 == "msg")
      assert(t.rows.map(_(msgIdx)).sorted ==
        (Seq("m1", "m2-EDITED") ++ (3 to 10).map(i => s"m$i")).sorted)
      // one state row per ADVANCING pass (1,2,4,5) — failed/quiescent
      // passes append nothing, so no duplicate bookkeeping rows
      assert(st.rows.size == 4, st.rows.toString)
      assert(st.rows.distinct.size == 4, "duplicate _sync_state rows")
      // watermarks strictly monotone in append order
      val wms = st.rows.map(cell(_, "last_sync_time"))
      assert(wms == wms.sorted && wms.distinct == wms, wms.toString)
      assert(wms.last == "2024-01-10 00:00:00", wms.toString)
      // the dual watermark tracked the in-place edit: pass 2's state row
      // carries the EDIT's update time (day 9), ahead of its sync time
      assert(cell(st.rows(1), "last_update_time") == "2024-01-09 00:00:00", st.rows(1).toString)
    } finally { es.stop(); ch.stop() }
  }

  test("replay idempotence (ES): crash between batched INSERT and state append — the re-run converges, no dup rows") {
    val es = new EsStub(
      indices = Map("app_logs" -> (1 to 7).map(i => doc(i.toLong, i, s"m$i", i))),
      mappings = Map("app_logs" -> mapping))
    val ch = new ChStub
    ch.uniqueKeyCol = Some("_id")
    val port = es.start()
    ch.start()
    try {
      val cfg = EsSourceConfig.fromEnv(Map(
        "ES_HOST" -> s"http://127.0.0.1:$port", "INDEX_PATTERN" -> "app_*", "SCROLL_SIZE" -> "3"))
      val client = new EsRestClient(cfg.host)
      val tgt = new ChHttpClient(ch.endpoint)
      val ep = ch.endpoint
      def pass() = WireSync.run(spark, client, cfg, tgt, () => new ChHttpBatchExecutor(ep),
        targetDb = "wh", insertBatchSize = 4)

      // kill the pass INSIDE the at-least-once window: data write done,
      // state append lost — the crash every state-after-write design has
      ch.failNextMatching = Some("INSERT INTO `wh`.`_sync_state`")
      intercept[Exception] { pass() }
      val t = ch.tables(("wh", "app_logs"))
      assert(t.rows.size == 7, "the batched INSERT had already landed")
      assert(ch.tables(("wh", "_sync_state")).rows.isEmpty, "the state append was the crash point")

      // resume: no watermark → FULL re-read re-sends every row; the
      // UNIQUE-KEY upsert absorbs the replay — EXACT convergence
      val r2 = pass()
      assert(r2.map(p => (p.mode, p.rows, p.failedRows)) == Seq(("full", 7L, 0L)), r2.toString)
      assert(t.rows.size == 7, s"replay must not duplicate rows: ${t.rows.size}")
      val idIdx = t.schema.indexWhere(_._1 == "_id")
      assert(t.rows.map(_(idIdx)).distinct.size == 7)
      val st = ch.tables(("wh", "_sync_state"))
      assert(st.rows.size == 1)
      assert(st.rows.head(st.schema.indexWhere(_._1 == "last_sync_time")) == "2024-01-07 00:00:00")
    } finally { es.stop(); ch.stop() }
  }

  test("replay idempotence (Mongo): state-append crash, OID watermark intact, re-run converges") {
    import scala.collection.immutable.ListMap
    val mongo = new MongoStub
    mongo.seed("shop", "items", (1 to 9).map(i =>
      ListMap[String, Any]("_id" -> graft.sources.Bson.Oid(f"$i%024x"), "v" -> s"d$i")))
    val (mHost, mPort) = mongo.start()
    val ch = new ChStub
    ch.uniqueKeyCol = Some("_id")
    ch.start()
    try {
      val tgt = new ChHttpClient(ch.endpoint)
      val ep = ch.endpoint
      def pass() = WireSync.runMongo(spark, mHost, mPort, "shop", Seq("items"),
        tgt, () => new ChHttpBatchExecutor(ep), targetDb = "wh", batchSize = 4)

      ch.failNextMatching = Some("INSERT INTO `wh`.`_sync_state`")
      intercept[Exception] { pass() }
      val t = ch.tables(("wh", "items"))
      assert(t.rows.size == 9 && ch.tables(("wh", "_sync_state")).rows.isEmpty)

      val r2 = pass()
      assert(r2.map(p => (p.mode, p.rows)) == Seq(("full", 9L)), r2.toString)
      assert(t.rows.size == 9, s"replay must not duplicate rows: ${t.rows.size}")
      val st = ch.tables(("wh", "_sync_state"))
      assert(st.rows.size == 1)
      assert(st.rows.head(st.schema.indexWhere(_._1 == "last_sync_time")) == f"${9}%024x")
    } finally { mongo.stop(); ch.stop() }
  }

  test("replay idempotence (CH-to-CH): state-append crash, re-run converges on the unique-keyed target") {
    val source = new ChStub
    val target = new ChStub
    target.uniqueKeyCol = Some("id")
    source.seed("shop", "orders",
      Seq(("id", "Int64"), ("created_at", "Nullable(DateTime64(6))")),
      (1 to 12).map(i => Seq(i.toString, f"2024-01-$i%02d 00:00:00.000000")))
    source.start()
    target.start()
    try {
      val tgt = new ChHttpClient(target.endpoint)
      val ep = target.endpoint
      def pass() = WireSync.runCh(spark, source.endpoint, "shop", tgt,
        () => new ChHttpBatchExecutor(ep), targetDb = "bh", batchSize = 5)

      target.failNextMatching = Some("INSERT INTO `bh`.`_sync_state`")
      intercept[Exception] { pass() }
      val t = target.tables(("bh", "orders"))
      assert(t.rows.size == 12 && target.tables(("bh", "_sync_state")).rows.isEmpty)

      val r2 = pass()
      assert(r2.map(p => (p.mode, p.rows)) == Seq(("full", 12L)), r2.toString)
      assert(t.rows.size == 12, s"replay must not duplicate rows: ${t.rows.size}")
      val idIdx = t.schema.indexWhere(_._1 == "id")
      assert(t.rows.map(_(idIdx)).distinct.size == 12)
      val st = target.tables(("bh", "_sync_state"))
      assert(st.rows.size == 1)
      assert(st.rows.head(st.schema.indexWhere(_._1 == "last_sync_time")) == "2024-01-12 00:00:00.000000")
    } finally { source.stop(); target.stop() }
  }

  test("continuous loop (Mongo): per-collection isolation — a dropped cursor fails ONE collection, the loop and its neighbor proceed") {
    import scala.collection.immutable.ListMap
    val mongo = new MongoStub
    def mdoc(i: Int): ListMap[String, Any] =
      ListMap[String, Any]("_id" -> graft.sources.Bson.Oid(f"$i%024x"), "v" -> s"d$i")
    mongo.seed("shop", "items", (1 to 6).map(mdoc))
    mongo.seed("shop", "logs", (101 to 102).map(mdoc))
    val (mHost, mPort) = mongo.start()
    val ch = new ChStub
    ch.uniqueKeyCol = Some("_id")
    ch.start()
    try {
      val tgt = new ChHttpClient(ch.endpoint)
      val ep = ch.endpoint
      def rowsOf(tbl: String) = ch.tables.get(("wh", tbl)).map(_.rows.size).getOrElse(0)
      val between: Map[Int, () => Unit] = Map(
        1 -> (() => {
          // items gains 6 docs (> batchSize → the read must getMore);
          // logs gains 1 (find exhausts in one batch, no getMore) —
          // the one-shot cursor drop can then only hit items
          mongo.seed("shop", "items", (1 to 12).map(mdoc))
          mongo.seed("shop", "logs", (101 to 103).map(mdoc))
          mongo.dropCursorsOnGetMore = true
        })
      )
      val itemsAfter = scala.collection.mutable.Map[Int, Int]()
      val passes = WireSync.runContinuousMongo(
        spark, mHost, mPort, "shop", Seq("items", "logs"),
        tgt, () => new ChHttpBatchExecutor(ep), targetDb = "wh",
        maxPasses = 4, batchSize = 4,
        onPassEnd = (p, _) => { itemsAfter(p) = rowsOf("items"); between.get(p).foreach(_.apply()) })

      def ok(p: Int, c: Int) = passes(p - 1)(c).toOption.get
      // pass 1: both collections full-sync
      assert(ok(1, 0).mode == "full" && ok(1, 0).rows == 6L, passes(0).toString)
      assert(ok(1, 1).mode == "full" && ok(1, 1).rows == 2L, passes(0).toString)
      // pass 2: items' cursor dropped mid-pagination → Left; logs lands
      // its delta anyway (the reference's per-collection try/except)
      assert(passes(1)(0).isLeft, passes(1).toString)
      assert(passes(1)(0).swap.toOption.get._1 == "items")
      assert(ok(2, 1).rows == 1L, passes(1).toString)
      // the failed read wrote NOTHING (MongoSource drains the cursor
      // before any INSERT) and left the watermark intact
      assert(itemsAfter(2) == itemsAfter(1), "failed collection must not half-write")
      // pass 3: items resumes from the intact watermark — all 6 docs
      assert(ok(3, 0).mode == "incremental" && ok(3, 0).rows == 6L, passes(2).toString)
      assert(ok(3, 1).rows == 0L)
      // pass 4: quiescent
      assert(ok(4, 0).rows == 0L && ok(4, 1).rows == 0L, passes(3).toString)

      assert(rowsOf("items") == 12 && rowsOf("logs") == 3)
      val st = ch.tables(("wh", "_sync_state"))
      val nameIdx = st.schema.indexWhere(_._1 == "table_name")
      val wmIdx = st.schema.indexWhere(_._1 == "last_sync_time")
      // one state row per ADVANCING (collection, pass); OID watermarks
      // strictly monotone per collection
      val itemsWms = st.rows.filter(_(nameIdx) == "items").map(_(wmIdx))
      val logsWms = st.rows.filter(_(nameIdx) == "logs").map(_(wmIdx))
      assert(itemsWms == Seq(f"${6}%024x", f"${12}%024x"), itemsWms.toString)
      assert(logsWms == Seq(f"${102}%024x", f"${103}%024x"), logsWms.toString)
      assert(st.rows.size == 4 && st.rows.distinct.size == 4)
    } finally { mongo.stop(); ch.stop() }
  }

  test("continuous loop (CH-to-CH): per-table isolation — a source outage fails ONE table, resumes from its intact watermark") {
    val source = new ChStub
    val target = new ChStub
    val srcSchema = Seq(("id", "Int64"), ("created_at", "Nullable(DateTime64(6))"))
    def row(i: Int, month: Int = 1) =
      Seq(i.toString, f"2024-$month%02d-${i % 28 + 1}%02d 00:00:00.000000")
    source.seed("shop", "orders", srcSchema, (1 to 12).map(i => row(i)))
    source.seed("shop", "events", srcSchema, (1 to 3).map(i => row(i)))
    source.start()
    target.start()
    try {
      val tgt = new ChHttpClient(target.endpoint)
      val ep = target.endpoint
      def rowsOf(tbl: String) = target.tables.get(("bh", tbl)).map(_.rows.size).getOrElse(0)
      val between: Map[Int, () => Unit] = Map(
        1 -> (() => {
          // both tables move; the SOURCE then drops the next statement
          // touching orders (its DESCRIBE — before any read or write)
          source.tables(("shop", "orders")).rows ++= Seq(row(13, 2), row(14, 2))
          source.tables(("shop", "events")).rows += row(4, 2)
          source.failNextMatching = Some("`shop`.`orders`")
        })
      )
      val ordersAfter = scala.collection.mutable.Map[Int, Int]()
      val passes = WireSync.runContinuousCh(
        spark, source.endpoint, "shop", tgt, () => new ChHttpBatchExecutor(ep),
        targetDb = "bh", maxPasses = 4, batchSize = 5,
        onPassEnd = (p, _) => { ordersAfter(p) = rowsOf("orders"); between.get(p).foreach(_.apply()) })

      val tableOrder = passes(0).map(_.toOption.get.table)
      val oi = tableOrder.indexOf("orders")
      val ei = tableOrder.indexOf("events")
      def ok(p: Int, c: Int) = passes(p - 1)(c).toOption.get
      assert(ok(1, oi).mode == "full" && ok(1, oi).rows == 12L, passes(0).toString)
      assert(ok(1, ei).rows == 3L)
      // pass 2: orders' source statement 500s → Left; events proceeds
      assert(passes(1)(oi).isLeft, passes(1).toString)
      assert(passes(1)(oi).swap.toOption.get._1 == "orders")
      assert(ok(2, ei).rows == 1L, passes(1).toString)
      assert(ordersAfter(2) == ordersAfter(1), "failed table must not half-write")
      // pass 3: orders resumes — the server-side WHERE re-reads only the
      // delta above the pass-1 micro watermark
      assert(ok(3, oi).mode == "incremental" && ok(3, oi).rows == 2L, passes(2).toString)
      assert(ok(4, oi).rows == 0L && ok(4, ei).rows == 0L, passes(3).toString)

      assert(rowsOf("orders") == 14 && rowsOf("events") == 4)
      val st = target.tables(("bh", "_sync_state"))
      val nameIdx = st.schema.indexWhere(_._1 == "table_name")
      val wmIdx = st.schema.indexWhere(_._1 == "last_sync_time")
      val ordersWms = st.rows.filter(_(nameIdx) == "orders").map(_(wmIdx))
      assert(ordersWms == ordersWms.sorted && ordersWms.distinct == ordersWms, ordersWms.toString)
      assert(ordersWms.last == "2024-02-15 00:00:00.000000", ordersWms.toString)
    } finally { source.stop(); target.stop() }
  }
}
