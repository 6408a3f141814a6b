package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Incremental
import graft.sinks.{BatchedUpsertWriter, ChHttpBatchExecutor, ChHttpClient, ChSource, ClickHouseDdl}

/** Live ClickHouse-protocol parity — the EsLiveParitySpec move for
  * the TARGET side of the reference's clickhouse_to_bytehouse flow:
  * bootstrap (database + `_sync_state`) → SHOW TABLES / DESCRIBE
  * discovery → CREATE TABLE → distributed paged source read →
  * partition-parallel batched INSERT → watermark bookkeeping →
  * incremental state → conformance → row-at-a-time fallback, all
  * over REAL HTTP against a CH-SQL-speaking stub with a toy table
  * store (ref clickhouse_to_bytehouse.py:106-371). The SQL each step
  * puts on the wire is asserted against the ClickHouseDdl contract
  * strings from the stub's request log.
  *
  * Executor factories capture ONLY the endpoint string — the
  * [[ChHttpBatchExecutor]] is constructed per Spark partition on the
  * executor side, exactly as a production CH bulk load is driven.
  */
class ChLiveParitySpec extends SparkSpec {

  private val srcSchema = Seq(
    ("id", "Int64"), ("name", "Nullable(String)"),
    ("amount", "Nullable(Float64)"), ("created_at", "Nullable(DateTime64(6))"))

  private def srcRows(n: Int): Seq[Seq[String]] =
    (1 to n).map(i => Seq(
      i.toString,
      if (i % 7 == 0) null else s"name_$i",
      s"${i * 10}.5",
      f"2024-01-${i % 28 + 1}%02d 00:00:00.000000"))

  private def withStubs(f: (ChStub, ChStub, ChHttpClient, ChHttpClient) => Unit): Unit = {
    val source = new ChStub
    val target = new ChStub
    source.seed("shop", "orders", srcSchema, srcRows(23))
    val (se, te) = (source.start(), target.start())
    try f(source, target, new ChHttpClient(se), new ChHttpClient(te))
    finally { source.stop(); target.stop() }
  }

  private def readWatermark(client: ChHttpClient, db: String, table: String): (String, String) = {
    val r = client.query(ClickHouseDdl.lastSyncTimeSql(db, table))
    if (r.isEmpty) ("", "") else (Option(r.head(0)).getOrElse(""), Option(r.head(1)).getOrElse(""))
  }

  test("bootstrap: ping, database + CH-variant _sync_state created in reference order, SQL byte-exact") {
    withStubs { (_, target, _, tgt) =>
      assert(tgt.ping())
      val stmts = ClickHouseDdl.bootstrapSqlCh("bh")
      stmts.foreach(tgt.execute)
      assert(target.databases.contains("bh"))
      assert(target.tables(("bh", "_sync_state")).schema == Seq(
        ("table_name", "String"), ("last_sync_time", "String"),
        ("last_update_time", "String"), ("sync_count", "UInt64"), ("sync_time", "DateTime")))
      // wire log carries the exact generated statements, in order
      val reqs = target.requests.toSeq
      assert(reqs.indexOf(stmts(0)) >= 0 && reqs.indexOf(stmts(1)) > reqs.indexOf(stmts(0)), reqs.toString)
      // idempotent re-run: IF NOT EXISTS absorbs the second bootstrap
      stmts.foreach(tgt.execute)
      assert(target.tables.size == 1)
    }
  }

  test("full sync: discover, DDL from DESCRIBE, paged parallel read, batched insert — rows land typed") {
    withStubs { (source, target, src, tgt) =>
      // discovery (ref get_source_tables / get_table_schema)
      assert(src.showTables("shop") == Seq("orders"))
      val schema = src.sparkSchema("shop", "orders")
      assert(schema == StructType(Seq(
        StructField("id", LongType), StructField("name", StringType),
        StructField("amount", DoubleType), StructField("created_at", TimestampType))))
      // target DDL generated from the discovered schema
      tgt.execute(ClickHouseDdl.createDatabaseSql("bh"))
      tgt.execute(ClickHouseDdl.createTableSql("bh", "orders", schema))
      assert(target.tables(("bh", "orders")).schema.toMap.apply("amount") == "Nullable(Float64)")
      // distributed paged read: 23 rows / batch 5 = 5 disjoint pages
      val df = ChSource.read(spark, source.endpoint, "shop", "orders", batchSize = 5, orderBy = Some("id"))
      assert(df.count() == 23L)
      val pages = source.requests.filter(_.startsWith("SELECT * FROM `shop`.`orders` ORDER BY `id` LIMIT 5"))
      assert(pages.size == 5, pages.toString)
      // partition-parallel batched write over HTTP
      val before = target.requests.size
      val ep = target.endpoint
      val stats = BatchedUpsertWriter.write(
        df.repartition(3), "bh", "orders", batchSize = 4, () => new ChHttpBatchExecutor(ep))
      assert(stats.rows == 23L && stats.failedRows == 0L, stats.toString)
      val landed = target.tables(("bh", "orders"))
      assert(landed.rows.size == 23)
      // typed round-trip: null name survived, timestamp micro format
      val r7 = landed.rows.find(_.head == "7").get
      assert(r7(1) == null && r7(2) == "70.5" && r7(3) == "2024-01-08 00:00:00.000000", r7.toString)
      // every insert statement starts with the contract prefix
      val inserts = target.requests.drop(before).filter(_.startsWith("INSERT INTO"))
      assert(inserts.nonEmpty &&
        inserts.forall(_.startsWith(ClickHouseDdl.insertSql("bh", "orders", df.columns.toIndexedSeq))),
        inserts.take(2).toString)
    }
  }

  test("incremental: watermark read from _sync_state, state advances via INSERT-only bookkeeping") {
    withStubs { (source, target, src, tgt) =>
      ClickHouseDdl.bootstrapSqlCh("bh").foreach(tgt.execute)
      val schema = src.sparkSchema("shop", "orders")
      tgt.execute(ClickHouseDdl.createTableSql("bh", "orders", schema))
      // first sync: no state row → empty watermark → full read
      val (w0, _) = readWatermark(tgt, "bh", "orders")
      assert(w0 == "")
      val full = ChSource.read(spark, source.endpoint, "shop", "orders", 50, Some("id"))
      val ep = target.endpoint
      BatchedUpsertWriter.write(full, "bh", "orders", 100, () => new ChHttpBatchExecutor(ep))
      val maxTs = full.agg(max(date_format(col("created_at"), "yyyy-MM-dd HH:mm:ss"))).collect()(0).getString(0)
      tgt.execute(ClickHouseDdl.insertSyncStateSqlCh("bh") +
        s" ('orders', '$maxTs', '', ${full.count()})")
      // watermark readable back through the reference's max() query
      val (w1, _) = readWatermark(tgt, "bh", "orders")
      assert(w1 == "2024-01-24 00:00:00", w1)
      // incremental: only rows strictly past the watermark would move
      val incr = full.filter(date_format(col("created_at"), "yyyy-MM-dd HH:mm:ss") > w1)
      assert(incr.count() == 0L) // nothing newer yet
      // a later state row wins over the earlier one (max, not last-write)
      tgt.execute(ClickHouseDdl.insertSyncStateSqlCh("bh") + " ('orders', '2024-02-01 00:00:00', '', 3)")
      val (w2, _) = readWatermark(tgt, "bh", "orders")
      assert(w2 == "2024-02-01 00:00:00", w2)
      // per-table isolation: another table's watermark is untouched
      val (other, _) = readWatermark(tgt, "bh", "other_table")
      assert(other == "")
    }
  }

  test("conformance: target-shaped select fills missing columns with typed NULL, drops extras, then lands") {
    withStubs { (_, target, _, tgt) =>
      import spark.implicits._
      tgt.execute(ClickHouseDdl.createDatabaseSql("bh"))
      val targetSchema = StructType(Seq(
        StructField("id", LongType), StructField("name", StringType), StructField("region", StringType)))
      tgt.execute(ClickHouseDdl.createTableSql("bh", "dim", targetSchema))
      // source has an extra column (amount) and lacks one (region)
      val srcDf = Seq((1L, "a", 9.9), (2L, "b", 8.8)).toDF("id", "name", "amount")
      val conformed = Incremental.conformToTarget(srcDf, targetSchema)
      assert(conformed.columns.toSeq == Seq("id", "name", "region"))
      val ep = target.endpoint
      BatchedUpsertWriter.write(conformed, "bh", "dim", 10, () => new ChHttpBatchExecutor(ep))
      val rows = target.tables(("bh", "dim")).rows
      assert(rows.map(_.toList).toSet == Set(List("1", "a", null), List("2", "b", null)), rows.toString)
    }
  }

  test("fallback: a poisoned batch degrades to row-at-a-time over the wire, survivors land") {
    withStubs { (source, target, src, tgt) =>
      tgt.execute(ClickHouseDdl.createDatabaseSql("bh"))
      tgt.execute(ClickHouseDdl.createTableSql("bh", "orders", src.sparkSchema("shop", "orders")))
      target.rejectMarker = Some("name_13")
      val df = ChSource.read(spark, source.endpoint, "shop", "orders", 50, Some("id")).coalesce(1)
      val ep = target.endpoint
      val stats = BatchedUpsertWriter.write(df, "bh", "orders", 100, () => new ChHttpBatchExecutor(ep))
      // 23 rows, one poisoned: the batch POST fails, rows retry singly
      assert(stats.failedRows == 1L && stats.rows == 22L && stats.fallbackRows == 22L, stats.toString)
      assert(target.tables(("bh", "orders")).rows.size == 22)
      assert(!target.tables(("bh", "orders")).rows.exists(_.contains("name_13")))
    }
  }

  test("key-range paged read: disjoint BETWEEN spans over the wire, rows identical to OFFSET paging") {
    withStubs { (source, _, _, _) =>
      val byOffset = ChSource.read(spark, source.endpoint, "shop", "orders", 5, Some("id"))
        .collect().map(_.toSeq).toSet
      val before = source.requests.size
      val byRange = ChSource.readByKeyRange(spark, source.endpoint, "shop", "orders", "id", batchSize = 5)
      assert(byRange.collect().map(_.toSeq).toSet == byOffset)
      // value-anchored spans, not positions: every page is a BETWEEN on `id`
      val pages = source.requests.drop(before)
        .filter(_.startsWith("SELECT * FROM `shop`.`orders` WHERE `id` BETWEEN"))
      assert(pages.size >= 4, source.requests.drop(before).toString)
      // non-integer key rejected up front
      intercept[IllegalArgumentException] {
        ChSource.readByKeyRange(spark, source.endpoint, "shop", "orders", "name", batchSize = 5)
      }
    }
  }

  test("sqlLiteral: non-finite floats and binary render as CH-parseable literals") {
    import graft.sinks.ChHttp
    assert(ChHttp.sqlLiteral(Double.NaN) == "nan")
    assert(ChHttp.sqlLiteral(Double.PositiveInfinity) == "inf")
    assert(ChHttp.sqlLiteral(Double.NegativeInfinity) == "-inf")
    assert(ChHttp.sqlLiteral(Float.NaN) == "nan")
    assert(ChHttp.sqlLiteral(Float.NegativeInfinity) == "-inf")
    assert(ChHttp.sqlLiteral(Array[Byte](0, 15, -1)) == "unhex('000fff')")
    assert(ChHttp.sqlLiteral(1.5d) == "1.5") // finite path unchanged
    assert(ChHttp.sqlLiteral(Array(1L, 2L)) == "[1,2]") // non-byte arrays stay CH arrays
  }
}
