package graft

import org.apache.spark.sql.functions._

import graft.sources.{Catalog, EsSourceConfig}
import graft.sync.SyncRunner

/** No live Elasticsearch exists in this environment, so the ES surface
  * is contract-tested the same way ClickHouseDdl is: the generated
  * connector options and query DSL must match the reference's env
  * config and search bodies byte-for-byte.
  */
class EsSourceSpec extends SparkSpec {

  test("fromEnv maps the reference's environment variables") {
    val cfg = EsSourceConfig.fromEnv(Map(
      "ES_HOST" -> "https://es.internal:9243",
      "ES_USER" -> "sync",
      "ES_PASSWORD" -> "s3cret",
      "INDEX_PATTERN" -> "logs-*,metrics-*",
      "SCROLL_SIZE" -> "5000",
      "SCROLL_TIMEOUT" -> "10m"
    ))
    assert(cfg == EsSourceConfig("https://es.internal:9243", "sync", "s3cret",
      "logs-*,metrics-*", 5000, "10m"))
    // defaults mirror the reference's os.getenv fallbacks
    val dflt = EsSourceConfig.fromEnv(Map.empty)
    assert(dflt.indexPattern == "*" && dflt.scrollSize == 1000 && dflt.scrollTimeout == "5m")
  }

  test("readerOptions: nodes/auth/scroll/resource/ssl/field-include mapping") {
    val opts = EsSourceConfig("https://es.internal:9243", "sync", "s3cret",
      "logs-*", 5000, "10m", fieldsInclude = Seq("ts", "user", "msg")).readerOptions
    assert(opts("es.nodes") == "es.internal:9243")
    assert(opts("es.net.ssl") == "true")
    assert(opts("es.net.http.auth.user") == "sync" && opts("es.net.http.auth.pass") == "s3cret")
    assert(opts("es.scroll.size") == "5000" && opts("es.scroll.keepalive") == "10m")
    assert(opts("es.resource") == "logs-*")
    assert(opts("es.read.field.include") == "ts,user,msg")
    // anonymous http config: no auth/ssl keys at all
    val plain = EsSourceConfig("http://localhost:9200").readerOptions
    assert(plain("es.nodes") == "localhost:9200")
    assert(!plain.contains("es.net.http.auth.user") && !plain.contains("es.net.ssl"))
  }

  test("incremental query DSL matches the reference's search bodies") {
    // plain incremental: bool filter over one range (es_to_bytehouse.py:855-861)
    assert(EsSourceConfig.incrementalQuery("@timestamp", "2024-01-24T00:00:00") ==
      """{"bool":{"filter":[{"range":{"@timestamp":{"gt":"2024-01-24T00:00:00"}}}]}}""")
    // insert-or-update: should over both ranges, minimum_should_match 1
    // (es_to_bytehouse.py:843-853)
    assert(EsSourceConfig.incrementalQuery("cTime", "2024-01-24T00:00:00", "updated_at", "2024-02-01T00:00:00") ==
      """{"bool":{"should":[{"range":{"cTime":{"gt":"2024-01-24T00:00:00"}}},""" +
        """{"range":{"updated_at":{"gt":"2024-02-01T00:00:00"}}}],"minimum_should_match":1}}""")
    // full search body with size + ascending time sort (es_to_bytehouse.py:863-868)
    assert(EsSourceConfig.incrementalSearchBody(5000, "@timestamp", "2024-01-24T00:00:00") ==
      """{"size":5000,"query":{"bool":{"filter":[{"range":{"@timestamp":{"gt":"2024-01-24T00:00:00"}}}]}},""" +
        """"sort":[{"@timestamp":"asc"}]}""")
    assert(EsSourceConfig.fullSearchBody(1000) == """{"size":1000,"query":{"match_all":{}}}""")
  }

  test("reader assembles a DataFrameReader with the es format options (no cluster needed)") {
    val cfg = EsSourceConfig("http://localhost:9200", scrollSize = 2000)
    // building the reader is pure config; only .load() would need the
    // connector jar + a live cluster
    val r = cfg.reader(spark, Some(EsSourceConfig.fullSearchBody(2000)))
    assert(r != null)
  }

  test("autoSyncTables: a source thunk makes backends interchangeable") {
    import java.nio.file.Files
    val stateDir = Files.createTempDirectory("graft_es_state").toString + "/state"
    val targetRoot = Files.createTempDirectory("graft_es_target").toString
    // stand-in for an ES reader thunk: any table name -> DataFrame
    val sources = Map(
      "idx_events" -> Catalog.load(spark, sf, "events").limit(50),
      "idx_region" -> Catalog.load(spark, sf, "region")
    )
    val r = SyncRunner.autoSyncTables(
      spark, sources.keys.toSeq.sorted, sources(_), targetRoot, stateDir, nowUs = 1L)
    assert(r("idx_events") == ("full", 50L))
    assert(r("idx_region")._1 == "full")
    assert(spark.read.parquet(s"$targetRoot/idx_events").count() == 50)
    // second pass: time-field table goes incremental, dimension refreshes full
    val r2 = SyncRunner.autoSyncTables(
      spark, sources.keys.toSeq.sorted, sources(_), targetRoot, stateDir, nowUs = 2L)
    assert(r2("idx_events") == ("incremental", 0L))
    assert(r2("idx_region")._1 == "full")
  }
}
