package graft.sources

import org.apache.spark.sql.{DataFrameReader, SparkSession}

/** Elasticsearch source configuration — the reference's primary
  * deployment surface (es_to_bytehouse.py:136-162 env config,
  * 577-673 scroll full sync, 825-868 incremental query DSL) mapped
  * onto the PUBLIC `elasticsearch-hadoop` Spark connector options
  * (`spark.read.format("es")`). No live cluster exists in this
  * environment, so the contract is the generated configuration:
  * option map + query DSL are unit-tested byte-for-byte; `reader`
  * assembles a real DataFrameReader ready for `.load(index)`.
  *
  * Scale mapping: the reference's single scroll cursor becomes
  * es-hadoop's partition-per-shard parallel read — `SCROLL_SIZE`
  * is per-slice `es.scroll.size`, and the incremental range filter
  * rides in `es.query`, evaluated inside ES exactly like the
  * reference's search body (the 100 TB property: the cluster, not
  * the engine, skips old rows).
  */
case class EsSourceConfig(
    host: String, // ES_HOST, scheme://host:port
    user: String = "", // ES_USER
    password: String = "", // ES_PASSWORD
    indexPattern: String = "*", // INDEX_PATTERN
    scrollSize: Int = 1000, // SCROLL_SIZE
    scrollTimeout: String = "5m", // SCROLL_TIMEOUT
    fieldsInclude: Seq[String] = Nil // optional projection pushdown
) {

  /** Public elasticsearch-hadoop reader options. Deterministic order
    * (sorted keys) so tests and config dumps are stable.
    */
  def readerOptions: Map[String, String] = {
    val (nodes, ssl) =
      if (host.startsWith("https://")) (host.stripPrefix("https://"), true)
      else (host.stripPrefix("http://"), false)
    val base = Map(
      "es.nodes" -> nodes,
      "es.scroll.size" -> scrollSize.toString,
      "es.scroll.keepalive" -> scrollTimeout,
      // index patterns resolve server-side, like the reference's
      // wildcard GET _cat/indices sweep
      "es.resource" -> indexPattern
    )
    val auth =
      if (user.nonEmpty) Map("es.net.http.auth.user" -> user, "es.net.http.auth.pass" -> password)
      else Map.empty[String, String]
    val sslOpt = if (ssl) Map("es.net.ssl" -> "true") else Map.empty[String, String]
    val include =
      if (fieldsInclude.nonEmpty) Map("es.read.field.include" -> fieldsInclude.mkString(","))
      else Map.empty[String, String]
    base ++ auth ++ sslOpt ++ include
  }

  /** A ready-to-`.load(index)` reader; `query` (if any) is the search
    * body ES applies server-side (`es.query`).
    */
  def reader(spark: SparkSession, query: Option[String] = None): DataFrameReader = {
    val r = readerOptions.foldLeft(spark.read.format("es")) { case (rd, (k, v)) => rd.option(k, v) }
    query.fold(r)(q => r.option("es.query", q))
  }
}

object EsSourceConfig {

  /** Build from the reference's environment variables
    * (es_to_bytehouse.py:136-162): ES_HOST, ES_USER, ES_PASSWORD,
    * INDEX_PATTERN, SCROLL_SIZE, SCROLL_TIMEOUT.
    */
  def fromEnv(env: Map[String, String]): EsSourceConfig =
    EsSourceConfig(
      host = env.getOrElse("ES_HOST", ""),
      user = env.getOrElse("ES_USER", ""),
      password = env.getOrElse("ES_PASSWORD", ""),
      indexPattern = env.getOrElse("INDEX_PATTERN", "*"),
      scrollSize = env.getOrElse("SCROLL_SIZE", "1000").toInt,
      scrollTimeout = env.getOrElse("SCROLL_TIMEOUT", "5m")
    )

  private def rangeClause(field: String, gt: String): String =
    s"""{"range":{"$field":{"gt":"$gt"}}}"""

  /** The incremental bool query the reference issues
    * (es_to_bytehouse.py:843-868): a plain range filter, or — when an
    * update-time watermark exists — `should` over both ranges with
    * `minimum_should_match: 1` (insert-or-update).
    */
  def incrementalQuery(
      timeField: String,
      sinceTime: String,
      updateTimeField: String = "",
      sinceUpdateTime: String = ""
  ): String =
    if (updateTimeField.nonEmpty && sinceUpdateTime.nonEmpty)
      s"""{"bool":{"should":[${rangeClause(timeField, sinceTime)},""" +
        s"""${rangeClause(updateTimeField, sinceUpdateTime)}],"minimum_should_match":1}}"""
    else
      s"""{"bool":{"filter":[${rangeClause(timeField, sinceTime)}]}}"""

  /** Full search body for one incremental pass — size + query + the
    * ascending time sort the reference adds (es_to_bytehouse.py:863-868)
    * so a crash resumes from a monotone watermark.
    */
  def incrementalSearchBody(
      scrollSize: Int,
      timeField: String,
      sinceTime: String,
      updateTimeField: String = "",
      sinceUpdateTime: String = ""
  ): String =
    s"""{"size":$scrollSize,"query":${incrementalQuery(timeField, sinceTime, updateTimeField, sinceUpdateTime)},""" +
      s""""sort":[{"$timeField":"asc"}]}"""

  /** Full-sync body (es_to_bytehouse.py:586-590): match_all at scroll
    * size.
    */
  def fullSearchBody(scrollSize: Int): String =
    s"""{"size":$scrollSize,"query":{"match_all":{}}}"""

  /** PIT + search_after page body — ES 8's replacement for the scroll
    * cursor (scroll is deprecated for deep pagination; a point-in-time
    * handle freezes the searcher and `search_after` carries an
    * explicit cursor, so pagination is stateless server-side and
    * restartable). Shape per the public Search-After/PIT docs:
    * size + query + `pit:{id, keep_alive}` (PIT requests hit
    * `POST /_search` with NO index in the path — the handle pins the
    * index) + a DETERMINISTIC total order: the caller's time sort
    * tie-broken by `_shard_doc`, ES's built-in unique PIT sort key.
    * `searchAfter` is the previous page's last `sort` array verbatim;
    * empty on page one.
    */
  def pitSearchBody(
      size: Int,
      query: String,
      pitId: String,
      keepAlive: String,
      sortField: String = "",
      searchAfter: String = ""
  ): String = {
    val sort =
      if (sortField.nonEmpty) s"""[{"$sortField":"asc"},{"_shard_doc":"asc"}]"""
      else """[{"_shard_doc":"asc"}]"""
    val sa = if (searchAfter.nonEmpty) s""","search_after":$searchAfter""" else ""
    s"""{"size":$size,"query":$query,"pit":{"id":"$pitId","keep_alive":"$keepAlive"},"sort":$sort$sa}"""
  }
}
