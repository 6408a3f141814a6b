package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import org.apache.spark.sql.functions._

import graft.operators.{AllString, Analytics, Incremental, TypeMapper}
import graft.sinks.ClickHouseDdl
import graft.sources.{Catalog, JsonIngest}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Output stability rules (so DuckDB-oracle hashes match):
  *   - money/quantity aggregates → exact integer cents
  *   - timestamps → unix_micros integers (or formatted strings)
  *   - every integer output is Long; every query is fully ordered.
  */
object SparkEntry {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Catalog.load(spark, dir, name)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    Analytics.q5Join5(
      t(spark, dir, "region"),
      t(spark, dir, "nation"),
      t(spark, dir, "customer"),
      t(spark, dir, "orders"),
      t(spark, dir, "lineitem")
    )
  }

  private val allTables = Seq(
    "customer", "documents", "embeddings", "events", "lineitem",
    "nation", "orders", "part", "region", "supplier"
  )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- A. migration / sync core ----
    "src_discovery" -> ((s, d) => {
      import s.implicits._
      Catalog.selectTables(s, d, "*tion,c*").toDF("table_name").orderBy("table_name")
    }),
    "scan_fields" -> ((s, d) => JsonIngest.scanFields(t(s, d, "events"), "props")),
    "flatten_json" -> ((s, d) =>
      JsonIngest
        .parseAndFlatten(s, t(s, d, "events").select("event_id", "props"), "props")
        .orderBy("event_id")),
    "stringify_all" -> ((s, d) =>
      AllString.stringify(t(s, d, "orders")).orderBy(col("o_orderkey").cast("long"))),
    "type_mapping" -> ((s, d) => {
      import s.implicits._
      allTables
        .flatMap { name =>
          t(s, d, name).schema.fields.map(f => (name, f.name, TypeMapper.clickhouseType(f.dataType)))
        }
        .toDF("table_name", "column_name", "ch_type")
        .orderBy("table_name", "column_name")
    }),
    "incremental_read" -> ((s, d) =>
      Incremental
        .newerThan(t(s, d, "events"), "ts", "2024-01-24 00:00:00")
        .select(
          col("event_id"),
          unix_micros(col("ts")).as("ts_us"),
          col("user_id"),
          col("event_type"),
          Analytics.cents(col("value")).as("value_c"),
          col("props")
        )
        .orderBy("event_id")),
    "sync_state" -> ((s, d) => {
      val ev = t(s, d, "events")
      val timeField = Incremental.detectTimeField(ev.schema).get
      Incremental.syncState(ev, "events", timeField)
    }),
    "upsert_latest" -> ((s, d) =>
      Incremental
        .latestPerKey(t(s, d, "events"), Seq("user_id"), Seq("ts", "event_id"))
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"), col("event_type"))
        .orderBy("user_id")),
    "schema_evolution" -> ((s, d) => {
      import s.implicits._
      val target = t(s, d, "events").schema
      val incoming = JsonIngest.parseAndFlatten(s, t(s, d, "events").select("event_id", "props"), "props").schema
      Incremental.newFields(target, incoming).toDF("new_column", "ch_type").orderBy("new_column")
    }),
    "multi_table_union" -> ((s, d) => {
      val r = t(s, d, "region").select(
        lit("region").as("src_table"),
        col("r_regionkey").cast("long").as("key"),
        col("r_name").as("name")
      )
      val n = t(s, d, "nation").select(
        lit("nation").as("src_table"),
        col("n_nationkey").cast("long").as("key"),
        col("n_name").as("name")
      )
      r.unionByName(n).orderBy("src_table", "key")
    }),
    "ddl_generate" -> ((s, d) => {
      import s.implicits._
      Seq("region", "nation", "supplier")
        .map(n => (n, ClickHouseDdl.createTableSql("graft", n, t(s, d, n).schema)))
        .toDF("table_name", "ddl")
        .orderBy("table_name")
    }),
    // ---- B. analytics engine ----
    "q1_pricing" -> ((s, d) => Analytics.q1Pricing(t(s, d, "lineitem"))),
    "q3_topk_join" -> ((s, d) =>
      Analytics.q3TopkJoin(t(s, d, "customer"), t(s, d, "orders"), t(s, d, "lineitem"))),
    "q5_join5" -> ((s, d) =>
      Analytics.q5Join5(
        t(s, d, "region"),
        t(s, d, "nation"),
        t(s, d, "customer"),
        t(s, d, "orders"),
        t(s, d, "lineitem")
      )),
    "events_hourly" -> ((s, d) => Analytics.eventsHourly(t(s, d, "events"))),
    "window_rank" -> ((s, d) => Analytics.windowRank(t(s, d, "orders"))),
    "sessionize" -> ((s, d) => Analytics.sessionize(t(s, d, "events")))
  )

  /** DuckDB-equivalent SQL per query (driver's correctness oracle). */
  def oracleSql: Map[String, String] = Map(
    "src_discovery" ->
      "SELECT * FROM (VALUES ('customer'),('nation')) AS t(table_name) ORDER BY 1",
    "scan_fields" ->
      """SELECT k AS field, count(*) AS n
        |FROM (SELECT unnest(json_keys(props)) AS k FROM events) GROUP BY 1 ORDER BY 1""".stripMargin,
    "flatten_json" ->
      "SELECT event_id, json_extract_string(props, '$.k') AS props_k FROM events ORDER BY event_id",
    "stringify_all" ->
      """SELECT CAST(o_orderkey AS VARCHAR) AS o_orderkey, CAST(o_custkey AS VARCHAR) AS o_custkey,
        | o_orderstatus, CAST(CAST(o_totalprice AS DECIMAL(38,6)) AS VARCHAR) AS o_totalprice,
        | strftime(o_orderdate, '%Y-%m-%d %H:%M:%S.%f') AS o_orderdate, o_orderpriority
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "type_mapping" ->
      ("SELECT * FROM (VALUES " +
        "('customer','c_custkey','Int64'),('customer','c_name','String'),('customer','c_nationkey','Int32')," +
        "('customer','c_acctbal','Float64'),('customer','c_mktsegment','String')," +
        "('documents','doc_id','Int64'),('documents','text','String'),('documents','lang','String')," +
        "('documents','source','String'),('documents','n_chars','Int64')," +
        "('embeddings','vec_id','Int64'),('embeddings','embedding','Array(Float32)'),('embeddings','label','Int32')," +
        "('events','event_id','Int64'),('events','ts','DateTime64(6)'),('events','user_id','Int64')," +
        "('events','event_type','String'),('events','value','Float64'),('events','props','String')," +
        "('lineitem','l_orderkey','Int64'),('lineitem','l_partkey','Int64'),('lineitem','l_suppkey','Int64')," +
        "('lineitem','l_linenumber','Int32'),('lineitem','l_quantity','Float64'),('lineitem','l_extendedprice','Float64')," +
        "('lineitem','l_discount','Float64'),('lineitem','l_tax','Float64'),('lineitem','l_returnflag','String')," +
        "('lineitem','l_linestatus','String'),('lineitem','l_shipdate','DateTime64(6)')," +
        "('nation','n_nationkey','Int32'),('nation','n_name','String'),('nation','n_regionkey','Int32')," +
        "('orders','o_orderkey','Int64'),('orders','o_custkey','Int64'),('orders','o_orderstatus','String')," +
        "('orders','o_totalprice','Float64'),('orders','o_orderdate','DateTime64(6)'),('orders','o_orderpriority','String')," +
        "('part','p_partkey','Int64'),('part','p_name','String'),('part','p_brand','String')," +
        "('part','p_type','String'),('part','p_size','Int32'),('part','p_retailprice','Float64')," +
        "('region','r_regionkey','Int32'),('region','r_name','String')," +
        "('supplier','s_suppkey','Int64'),('supplier','s_name','String'),('supplier','s_nationkey','Int32')," +
        "('supplier','s_acctbal','Float64')" +
        ") AS t(table_name, column_name, ch_type) ORDER BY table_name, column_name"),
    "incremental_read" ->
      """SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type,
        | CAST(round(value*100) AS BIGINT) AS value_c, props
        |FROM events WHERE epoch_us(ts) > epoch_us(TIMESTAMP '2024-01-24 00:00:00')
        |ORDER BY event_id""".stripMargin,
    "sync_state" ->
      """SELECT 'events' AS table_name, 'ts' AS time_field,
        | epoch_us(max(ts)) AS last_sync_us, count(*) AS n_rows FROM events""".stripMargin,
    "upsert_latest" ->
      """SELECT user_id, event_id, ts_us, event_type
        |FROM (SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type,
        |        row_number() OVER (PARTITION BY user_id
        |          ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |      FROM events) x
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "schema_evolution" ->
      "SELECT 'props_k' AS new_column, 'String' AS ch_type",
    "multi_table_union" ->
      """SELECT * FROM (
        |  SELECT 'region' AS src_table, CAST(r_regionkey AS BIGINT) AS key, r_name AS name FROM region
        |  UNION ALL
        |  SELECT 'nation', CAST(n_nationkey AS BIGINT), n_name FROM nation
        |) u ORDER BY src_table, key""".stripMargin,
    "ddl_generate" ->
      ("SELECT * FROM (VALUES " +
        "('region','CREATE TABLE IF NOT EXISTS `graft`.`region` (`r_regionkey` Nullable(Int32), `r_name` Nullable(String)) ENGINE = MergeTree() ORDER BY tuple()')," +
        "('nation','CREATE TABLE IF NOT EXISTS `graft`.`nation` (`n_nationkey` Nullable(Int32), `n_name` Nullable(String), `n_regionkey` Nullable(Int32)) ENGINE = MergeTree() ORDER BY tuple()')," +
        "('supplier','CREATE TABLE IF NOT EXISTS `graft`.`supplier` (`s_suppkey` Nullable(Int64), `s_name` Nullable(String), `s_nationkey` Nullable(Int32), `s_acctbal` Nullable(Float64)) ENGINE = MergeTree() ORDER BY tuple()')" +
        ") AS t(table_name, ddl) ORDER BY table_name"),
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
        | CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_c,
        | CAST(sum(CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT) AS sum_disc_c,
        | CAST(sum(CAST(round(l_extendedprice*(1.0-l_discount)*(1.0+l_tax)*100) AS BIGINT)) AS BIGINT) AS sum_charge_c,
        | count(*) AS n_rows
        |FROM lineitem GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q3_topk_join" ->
      """SELECT l.l_orderkey AS l_orderkey,
        | CAST(sum(CAST(round(l.l_extendedprice*(1.0-l.l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_c,
        | epoch_us(any_value(o.o_orderdate)) AS odate_us
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_mktsegment = 'BUILDING' AND l.l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY 1 ORDER BY revenue_c DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_join5" ->
      """SELECT n.n_name AS n_name,
        | CAST(sum(CAST(round(l.l_extendedprice*(1.0-l.l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_c
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name = 'ASIA' GROUP BY 1 ORDER BY 1""".stripMargin,
    "events_hourly" ->
      """SELECT epoch_us(date_trunc('hour', ts)) AS hour_us, event_type,
        | CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_value_c, count(*) AS n
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "window_rank" ->
      """SELECT o_custkey, o_orderkey, CAST(round(o_totalprice*100) AS BIGINT) AS price_c, rk
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |        CAST(row_number() OVER (PARTITION BY o_custkey
        |               ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rk
        |      FROM orders) ranked
        |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin,
    "sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
        |l AS (SELECT user_id, event_id, ts_us,
        |        lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_us FROM e),
        |b AS (SELECT user_id, event_id, ts_us,
        |        CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000 THEN 1 ELSE 0 END AS brk FROM l),
        |s AS (SELECT user_id, ts_us,
        |        CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM b)
        |SELECT user_id, session_id, count(*) AS n_events,
        |       min(ts_us) AS start_us, max(ts_us) AS end_us
        |FROM s GROUP BY 1,2 ORDER BY 1,2""".stripMargin
  )
}
