package graft

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ArrayNode
import com.sun.net.httpserver.{HttpExchange, HttpServer}

import java.net.InetSocketAddress
import scala.collection.mutable

/** In-process ES-compatible HTTP stub for EsLiveParitySpec — the
  * same move as the live-Derby JDBC spec (A29b): a real server
  * speaking the real protocol so the client's full discovery → map →
  * sync → incremental flow runs over actual HTTP. Implements the
  * endpoints the reference consumes: `_cat/indices` (glob pattern,
  * format=json), `<index>/_mapping` (nested properties), and the
  * scroll-search trio (`_search?scroll`, `_search/scroll`,
  * `DELETE _search/scroll`) with real query-DSL evaluation —
  * match_all, `bool.filter[range gt]`, and the insert-or-update
  * `bool.should[range,range] minimum_should_match:1` — plus
  * single-field ascending sort and scroll paging, the exact DSL
  * subset es_to_bytehouse.py issues. Every request is logged for
  * byte-exact contract assertions.
  */
class EsStub(indices: Map[String, Seq[String]], mappings: Map[String, String]) {

  private val om = new ObjectMapper()
  private val mappingStore = mutable.Map(mappings.toSeq: _*)

  /** Live mapping mutation — models a producer adding a field to the
    * index mapping AFTER the target table exists, the event the
    * engine's wire-side ALTER (reference add_new_columns) must absorb.
    */
  def updateMapping(index: String, json: String): Unit =
    mappingStore.synchronized { mappingStore(index) = json }
  private val docs: mutable.Map[String, Seq[(String, JsonNode)]] = mutable.Map(
    indices.map { case (idx, rows) =>
      idx -> rows.zipWithIndex.map { case (json, i) => ((i + 1).toString, om.readTree(json)) }
    }.toSeq: _*)
  private val scrolls = mutable.Map[String, mutable.Queue[Seq[(String, JsonNode)]]]()
  // PIT id -> frozen doc snapshot (the consistency guarantee the spec proves)
  private val pits = mutable.Map[String, Seq[(String, JsonNode)]]()
  private var nextScroll = 0
  private var nextPit = 0
  val requests = mutable.ArrayBuffer[(String, String, String)]() // (method, path+query, body)

  /** Targeted fault injection: while the HEAD entry's path-substring
    * matches the incoming request, dequeue it and answer with that
    * status (plus a `Retry-After` header when given) instead of
    * dispatching — ES throttling (429), node restarts (503), proxy
    * errors, injected per endpoint in arrival order.
    */
  val failures = mutable.Queue[(String, Int, String)]() // (pathSubstring, status, retryAfterSecs)

  /** Server-side cursor loss: an expired scroll/PIT answers 404 on
    * the next continuation, the fault a long pagination can hit.
    */
  def expireScrolls(): Unit = scrolls.synchronized { scrolls.clear() }
  def expirePits(): Unit = pits.synchronized { pits.clear() }

  /** Live mutation between requests — lets a spec prove PIT snapshot
    * isolation: a doc added mid-pagination must NOT appear in an open
    * PIT but must appear to a later one.
    */
  def addDoc(index: String, id: String, json: String): Unit = docs.synchronized {
    docs(index) = docs(index) :+ ((id, om.readTree(json)))
  }

  /** In-place update of an existing doc (same `_id`, new body) — the
    * source-side event the dual-watermark incremental must pick up.
    */
  def updateDoc(index: String, id: String, json: String): Unit = docs.synchronized {
    val node = om.readTree(json)
    docs(index) = docs(index).map { case (i, d) => if (i == id) (i, node) else (i, d) }
  }

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  server.createContext("/", (ex: HttpExchange) => handle(ex))
  server.setExecutor(null)

  def start(): Int = { server.start(); server.getAddress.getPort }
  def stop(): Unit = server.stop(0)

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.getResponseHeaders.add("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def handle(ex: HttpExchange): Unit = {
    val method = ex.getRequestMethod
    val path = ex.getRequestURI.getPath
    val query = Option(ex.getRequestURI.getQuery).getOrElse("")
    val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
    requests.synchronized { requests += ((method, s"$path${if (query.nonEmpty) "?" + query else ""}", body)) }
    failures.synchronized {
      if (failures.nonEmpty && path.contains(failures.head._1)) {
        val (_, code, ra) = failures.dequeue()
        if (ra.nonEmpty) ex.getResponseHeaders.add("Retry-After", ra)
        respond(ex, code, s"""{"error":"injected $code"}""")
        return
      }
    }
    try {
      (method, path) match {
        case ("GET", p) if p.startsWith("/_cat/indices/") =>
          val pattern = p.stripPrefix("/_cat/indices/")
          val re = ("^" + java.util.regex.Pattern.quote(pattern).replace("*", "\\E.*\\Q") + "$").r
          val rows = docs.keys.toSeq.sorted.filter(i => re.findFirstIn(i).isDefined).map(i =>
            s"""{"index":"$i","docs.count":"${docs(i).size}","store.size":"1kb"}""")
          respond(ex, 200, rows.mkString("[", ",", "]"))
        case ("GET", p) if p.endsWith("/_mapping") =>
          val idx = p.stripPrefix("/").stripSuffix("/_mapping")
          mappingStore.synchronized { mappingStore.get(idx) } match {
            case Some(m) => respond(ex, 200, s"""{"$idx":{"mappings":{"properties":$m}}}""")
            case None    => respond(ex, 404, s"""{"error":"no such index [$idx]"}""")
          }
        case ("POST", "/_search/scroll") =>
          val sid = om.readTree(body).path("scroll_id").asText("")
          scrolls.synchronized {
            scrolls.get(sid) match {
              case Some(q) =>
                val page = if (q.nonEmpty) q.dequeue() else Seq.empty
                respond(ex, 200, pageJson(sid, page, -1))
              case None => respond(ex, 404, """{"error":"scroll not found"}""")
            }
          }
        case ("DELETE", "/_search/scroll") =>
          val sid = om.readTree(body).path("scroll_id").asText("")
          scrolls.synchronized { scrolls.remove(sid) }
          respond(ex, 200, """{"succeeded":true,"num_freed":1}""")
        case ("POST", p) if p.endsWith("/_pit") =>
          val idx = p.stripPrefix("/").stripSuffix("/_pit")
          docs.synchronized { docs.get(idx) } match {
            case None => respond(ex, 404, s"""{"error":"no such index [$idx]"}""")
            case Some(rows) =>
              // the snapshot IS the guarantee: the Seq is immutable, so
              // later addDoc calls can't leak into an open PIT
              val sid = pits.synchronized { nextPit += 1; val s = s"pit-$nextPit"; pits(s) = rows; s }
              respond(ex, 200, s"""{"id":"$sid"}""")
          }
        case ("DELETE", "/_pit") =>
          val sid = om.readTree(body).path("id").asText("")
          val existed = pits.synchronized { pits.remove(sid).isDefined }
          respond(ex, 200, s"""{"succeeded":$existed,"num_freed":${if (existed) 1 else 0}}""")
        case ("POST", "/_search") =>
          // PIT search_after pagination: no index in the path — the
          // pit handle pins the (frozen) index snapshot
          val req = om.readTree(body)
          val sid = req.path("pit").path("id").asText("")
          pits.synchronized { pits.get(sid) } match {
            case None => respond(ex, 404, """{"error":"pit not found"}""")
            case Some(rows) =>
              val size = req.path("size").asInt(10)
              val matched = rows.filter { case (_, d) => matches(req.path("query"), d) }
              val field = sortField(req).filterNot(_ == "_shard_doc")
              def key(id: String, d: JsonNode): (String, Long) =
                (field.map(f => d.path(f).asText("")).getOrElse(""), id.toLong)
              val sorted = matched.sortBy { case (id, d) => key(id, d) }
              val sa = req.path("search_after")
              val after: Option[(String, Long)] =
                if (sa.isArray && sa.size() > 0) {
                  if (field.isDefined) Some((sa.get(0).asText(""), sa.get(1).asLong()))
                  else Some(("", sa.get(0).asLong()))
                } else None
              val ord = implicitly[Ordering[(String, Long)]]
              val remaining = after.fold(sorted)(a =>
                sorted.dropWhile { case (id, d) => ord.lteq(key(id, d), a) })
              val hits = remaining.take(size).map { case (id, d) =>
                val k = key(id, d)
                val sortJson =
                  if (field.isDefined) s"""["${k._1}",${k._2}]""" else s"""[${k._2}]"""
                s"""{"_id":"$id","_source":${om.writeValueAsString(d)},"sort":$sortJson}"""
              }.mkString("[", ",", "]")
              respond(ex, 200, s"""{"pit_id":"$sid","hits":{"hits":$hits}}""")
          }
        case ("POST", p) if p.endsWith("/_search") =>
          val idx = p.stripPrefix("/").stripSuffix("/_search")
          docs.get(idx) match {
            case None => respond(ex, 404, s"""{"error":"no such index [$idx]"}""")
            case Some(rows) =>
              val req = om.readTree(body)
              val size = req.path("size").asInt(10)
              val matched = rows.filter { case (_, d) => matches(req.path("query"), d) }
              val sorted = sortField(req) match {
                case Some(f) => matched.sortBy { case (_, d) => d.path(f).asText("") }
                case None    => matched
              }
              val sid = scrolls.synchronized { nextScroll += 1; s"scroll-$nextScroll" }
              val pages = mutable.Queue(sorted.grouped(size).toSeq: _*)
              val first = if (pages.nonEmpty) pages.dequeue() else Seq.empty
              scrolls.synchronized { scrolls(sid) = pages }
              respond(ex, 200, pageJson(sid, first, sorted.size))
          }
        case _ => respond(ex, 400, s"""{"error":"unhandled $method $path"}""")
      }
    } catch {
      case e: Throwable => respond(ex, 500, s"""{"error":"${e.getMessage}"}""")
    }
  }

  private def sortField(req: JsonNode): Option[String] = {
    val s = req.path("sort")
    if (s.isArray && s.size() > 0) {
      val it = s.get(0).fields()
      if (it.hasNext) Some(it.next().getKey) else None
    } else None
  }

  /** match_all | bool.filter[range gt] | bool.should[...] min_should 1 —
    * numeric compare when both sides parse as numbers, else string.
    */
  private def matches(q: JsonNode, doc: JsonNode): Boolean = {
    if (q.isMissingNode || q.has("match_all")) true
    else if (q.has("bool")) {
      val b = q.get("bool")
      val filters = asSeq(b.path("filter"))
      val shoulds = asSeq(b.path("should"))
      val filterOk = filters.forall(matches(_, doc))
      val shouldOk = shoulds.isEmpty || shoulds.exists(matches(_, doc))
      filterOk && shouldOk
    } else if (q.has("range")) {
      val it = q.get("range").fields()
      if (!it.hasNext) true
      else {
        val e = it.next()
        val field = e.getKey
        val gt = e.getValue.path("gt").asText("")
        val v = doc.path(field)
        if (v.isMissingNode || v.isNull) false
        else if (v.isNumber && gt.nonEmpty && gt.forall(c => c.isDigit || c == '.' || c == '-'))
          v.asDouble() > gt.toDouble
        else v.asText("") > gt
      }
    } else false
  }

  private def asSeq(n: JsonNode): Seq[JsonNode] = n match {
    case a: ArrayNode => (0 until a.size()).map(a.get)
    case _            => Seq.empty
  }

  private def pageJson(sid: String, page: Seq[(String, JsonNode)], total: Int): String = {
    val hits = page
      .map { case (id, d) => s"""{"_id":"$id","_source":${om.writeValueAsString(d)}}""" }
      .mkString("[", ",", "]")
    val tot = if (total >= 0) s""""total":{"value":$total,"relation":"eq"},""" else ""
    s"""{"_scroll_id":"$sid","hits":{$tot"hits":$hits}}"""
  }
}
