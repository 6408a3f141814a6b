package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Analytics
import graft.sources.Catalog

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

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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
