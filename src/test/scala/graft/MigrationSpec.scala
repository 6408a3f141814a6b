package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.{AllString, Flatten, Incremental}
import graft.sinks.ClickHouseDdl
import graft.sources.{Catalog, JsonIngest}

class MigrationSpec extends SparkSpec {
  import spark.implicits._

  test("pattern matching: wildcards, comma lists, system exclusion") {
    assert(Catalog.matchesPattern("message_log", "*_log"))
    assert(Catalog.matchesPattern("user_log", "message_log,user_log"))
    assert(Catalog.matchesPattern("evt_2024", "evt_????"))
    assert(!Catalog.matchesPattern("events", "*_log"))
    assert(Catalog.matchesPattern("a.b", "a.b") && !Catalog.matchesPattern("axb", "a.b"))
    val tables = Catalog.listTables(spark, sf)
    assert(tables.contains("lineitem") && !tables.exists(_.startsWith(".")))
  }

  test("sanitizeName matches reference cleanup rules") {
    assert(Flatten.sanitizeName("agent.id") == "agent_id")
    assert(Flatten.sanitizeName("@timestamp") == "timestamp")
    assert(Flatten.sanitizeName("a-b") == "a_b")
    assert(Flatten.sanitizeName("2024idx") == "idx_2024idx")
  }

  test("flatten: deep nesting, arrays to JSON, sanitized names") {
    val df = Seq((1L, """{"agent":{"id":"a1","geo":{"lat":1.5}},"tags":["x","y"],"n":7}"""))
      .toDF("id", "doc")
    val flat = JsonIngest.parseAndFlatten(spark, df, "doc")
    assert(
      flat.columns.toSeq == Seq("id", "doc_agent_geo_lat", "doc_agent_id", "doc_n", "doc_tags")
    )
    val r = flat.collect()(0)
    assert(r.getAs[String]("doc_agent_id") == "a1")
    assert(r.getAs[String]("doc_tags") == """["x","y"]""")
    assert(r.getAs[String]("doc_n") == "7")
  }

  test("pathCensus: heterogeneous types surface per path; string digits stay strings; depth is censored") {
    val df = Seq(
      (1L, """{"a": 1, "b": {"c": [{"d": "x"}, {"d": 2}]}}"""),
      (2L, """{"a": "1", "b": {"c": []}}"""), // "1" is a STRING — quote-stripping reparses would call it a number
      (3L, """{"a": true, "deep": {"l2": {"l3": {"l4": 9}}}}""")
    ).toDF("id", "doc")
    val rows = JsonIngest.pathCensus(df, "id", "doc", maxDepth = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    // one path, three types — the heterogeneity signal
    assert(rows(("$.a", "number")) == ((1L, 1L)))
    assert(rows(("$.a", "string")) == ((1L, 1L)))
    assert(rows(("$.a", "boolean")) == ((1L, 1L)))
    assert(rows(("$.b.c", "array")) == ((2L, 2L))) // the empty array still reports as a node
    // maxDepth = 3 censors level-4 nodes: $.b.c[] (depth 4) and $.deep.l2.l3 contents are cut
    assert(!rows.keySet.exists(_._1.startsWith("$.b.c[]")), rows.keySet.toString)
    assert(rows.contains(("$.deep.l2", "object")) && !rows.keySet.exists(_._1.contains("l3")))
    // full depth recovers them, typed per element
    val deep = JsonIngest.pathCensus(df, "id", "doc", maxDepth = 8)
      .collect().map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(deep(("$.b.c[]", "object")) == ((2L, 1L)))
    assert(deep(("$.b.c[].d", "string")) == ((1L, 1L)))
    assert(deep(("$.b.c[].d", "number")) == ((1L, 1L)))
    assert(deep(("$.deep.l2.l3.l4", "number")) == ((1L, 1L)))
  }

  test("expandArray: indexed array-of-struct expansion (reference compat)") {
    val df = Seq((1L, Seq((10, "a"), (20, "b")))).toDF("id", "items")
      .withColumn("items", col("items").cast("array<struct<v:int,s:string>>"))
    val out = Flatten.expandArray(df, "items", 3)
    val r = out.collect()(0)
    assert(r.getAs[Int]("items_0_v") == 10 && r.getAs[String]("items_1_s") == "b")
    assert(r.isNullAt(r.fieldIndex("items_2_v")))
  }

  test("mergeUpsert: delta replaces base rows by key, inserts new keys") {
    val base = Seq((1L, "old", 100L), (2L, "keep", 100L)).toDF("k", "v", "ver")
    val delta = Seq((1L, "new", 200L), (3L, "ins", 200L)).toDF("k", "v", "ver")
    val merged = Incremental
      .mergeUpsert(base, delta, Seq("k"), Seq("ver"))
      .orderBy("k")
      .collect()
    assert(merged.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "new"), (2L, "keep"), (3L, "ins")))
  }

  test("newFields + alterStatements: schema evolution plan") {
    val target = StructType(Seq(StructField("a", LongType)))
    val incoming = StructType(Seq(StructField("a", LongType), StructField("b.c", StringType)))
    val nf = Incremental.newFields(target, incoming)
    assert(nf == Seq("b_c" -> "String"))
    assert(Incremental.alterStatements("db", "t", nf) ==
      Seq("ALTER TABLE `db`.`t` ADD COLUMN `b_c` Nullable(String)"))
  }

  test("detectTimeField follows candidate priority") {
    val s1 = StructType(Seq(StructField("created_at", TimestampType), StructField("ts", TimestampType)))
    assert(Incremental.detectTimeField(s1).contains("ts"))
    val s2 = StructType(Seq(StructField("x", LongType)))
    assert(Incremental.detectTimeField(s2).isEmpty)
  }

  test("AllString: stable formats for every type") {
    val df = Seq((1L, 2.5, true, Seq(1, 2))).toDF("i", "d", "b", "arr")
      .withColumn("ts", lit("2024-01-02 03:04:05.123456").cast("timestamp"))
    val r = AllString.stringify(df).collect()(0)
    assert(r.getString(0) == "1")
    assert(r.getString(1) == "2.500000")
    assert(r.getString(2) == "true")
    assert(r.getString(3) == "[1,2]")
    assert(r.getString(4) == "2024-01-02 03:04:05.123456")
  }

  test("ClickHouse upsert DDL and insert SQL") {
    val schema = StructType(Seq(
      StructField("_id", StringType), StructField("v", LongType), StructField("ver", LongType)
    ))
    val ddl = ClickHouseDdl.createUpsertTableSql("db", "t", schema, "_id", "ver")
    assert(ddl.contains("ReplacingMergeTree(`ver`)") && ddl.contains("ORDER BY (`_id`)"))
    assert(ddl.contains("`_id` String") && ddl.contains("`v` Nullable(Int64)"))
    assert(ClickHouseDdl.insertSql("db", "t", Seq("_id", "v")) ==
      "INSERT INTO `db`.`t` (`_id`, `v`) VALUES")
  }

  test("all-String DDL matches the reference's shape (_id/_source/_timestamp + Nullable(String))") {
    val ddl = ClickHouseDdl.createTableSqlAllString(
      "es_migration", "my-index.v2", Seq("user.name", "@timestamp", "count", "_id"))
    // meta columns lead, in reference order; table/field names sanitized
    assert(ddl.startsWith(
      "CREATE TABLE IF NOT EXISTS `es_migration`.`my_index_v2` (`_id` String, " +
        "`_timestamp` DateTime64(3) DEFAULT now64(3), "))
    // every data column is Nullable(String); reserved names not duplicated
    assert(ddl.contains("`user_name` Nullable(String)"))
    assert(ddl.contains("`timestamp` Nullable(String)"))
    assert(ddl.contains("`count` Nullable(String)"))
    assert(ddl.indexOf("`_id` String") == ddl.lastIndexOf("`_id` String"))
    assert(ddl.endsWith("ENGINE = CnchMergeTree() ORDER BY tuple() UNIQUE KEY _id"))
    // STORE_SOURCE mode adds _source between _id and _timestamp
    val withSource = ClickHouseDdl.createTableSqlAllString("db", "t", Seq("a"), storeSource = true)
    assert(withSource.contains("`_id` String, `_source` String, `_timestamp` DateTime64(3)"))
  }

  test("sync-state table DDL matches the reference's ES-variant shape") {
    val ddl = ClickHouseDdl.syncStateTableSql("es_migration")
    assert(ddl.startsWith("CREATE TABLE IF NOT EXISTS `es_migration`.`_sync_state` ("))
    // all columns in reference order, string watermarks, defaults
    for (c <- Seq(
        "`index_name` String", "`table_name` String", "`time_field` String",
        "`update_time_field` String DEFAULT ''", "`last_sync_time` String",
        "`last_update_time` String DEFAULT ''", "`last_sync_count` Int64",
        "`updated_at` DateTime64(3) DEFAULT now64(3)")) assert(ddl.contains(c), c)
    assert(ddl.endsWith("ENGINE = CnchMergeTree() ORDER BY (index_name)"))
  }

  test("salted aggregation equals direct aggregation (skew path)") {
    val li = Catalog.load(spark, sf, "lineitem")
    val direct = operators.Analytics.q1Pricing(li)
      .select("l_returnflag", "l_linestatus", "sum_qty_c", "n_rows")
      .orderBy("l_returnflag", "l_linestatus").collect()
    val salted = operators.Skew.saltedSumCount(
        li,
        Seq("l_returnflag", "l_linestatus"),
        Seq(operators.Analytics.cents(col("l_quantity")) -> "sum_qty_c"),
        "n_rows",
        saltFactor = 8
      )
      .orderBy("l_returnflag", "l_linestatus").collect()
    assert(direct.toSeq == salted.toSeq)
  }

  test("incremental newerThan pushes filter to parquet scan") {
    val ev = Catalog.load(spark, sf, "events")
    val plan = Incremental
      .newerThan(ev, "ts", "2024-01-24 00:00:00")
      .queryExecution.executedPlan.toString
    // the ts predicate must exist; source column filters reach the scan
    assert(plan.contains("Filter"))
  }

  test("cdcApply: last-seq wins, deletes remove, inserts upsert, untouched base passes through") {
    import spark.implicits._
    val base = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v")
    val changes = Seq(
      (2L, 1L, "D", 0L),   // superseded by the later U
      (2L, 5L, "U", 99L),  // wins on key 2
      (3L, 2L, "D", 0L),   // deletes key 3
      (4L, 3L, "I", 40L),  // inserts new key 4
      (9L, 4L, "D", 0L)    // delete on a missing key: no-op
    ).toDF("k", "seq", "op", "v")
    val r = Incremental.cdcApply(base, changes, "k", "seq", "op", Seq("v"))
      .collect().map(x => (x.getLong(0), x.getString(1), x.getLong(2)))
    assert(r.toSeq == Seq((1L, "base", 10L), (2L, "cdc", 99L), (4L, "cdc", 40L)), r.mkString(","))
    // replay convergence: applying the same log to the result's
    // payload view yields the same snapshot (idempotent-replay)
    val again = Incremental.cdcApply(
      spark.createDataFrame(r.map(t => (t._1, t._3)).toSeq).toDF("k", "v"),
      changes, "k", "seq", "op", Seq("v"))
      .collect().map(x => (x.getLong(0), x.getLong(2)))
    assert(again.toSeq == Seq((1L, 10L), (2L, 99L), (4L, 40L)), again.mkString(","))
  }
}
