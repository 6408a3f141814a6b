package graft

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import java.net.InetSocketAddress
import scala.collection.mutable

import graft.sinks.ChHttp

/** In-process ClickHouse-HTTP-interface stub for ChLiveParitySpec —
  * the EsStub move for the TARGET side: a real HTTP server accepting
  * SQL-over-POST on an ephemeral :8123-shaped endpoint, with a toy
  * table store behind it, so the generated DDL/INSERT surface
  * ([[graft.sinks.ClickHouseDdl]]) and the live client
  * ([[graft.sinks.ChHttpClient]]) execute end-to-end over a socket
  * instead of being string-asserted. Understands exactly the SQL the
  * reference flow issues (clickhouse_to_bytehouse.py:106-371):
  * SELECT 1, CREATE DATABASE/TABLE IF NOT EXISTS, SHOW TABLES,
  * DESCRIBE TABLE, COUNT(*), star-SELECT with ORDER/LIMIT/OFFSET,
  * the `max(watermark)` state read, and multi-row VALUES INSERTs.
  * Every request is logged for byte-exact contract assertions;
  * `rejectMarker` injects deterministic insert failures to exercise
  * the batch → row-at-a-time fallback on the wire.
  */
class ChStub {

  final class Table(initialSchema: Seq[(String, String)]) {
    var schema: Seq[(String, String)] = initialSchema // ALTER ADD COLUMN appends
    val rows = mutable.ArrayBuffer[Seq[String]]() // cells in schema order, null = SQL NULL
  }

  val databases = mutable.Set[String]()
  val tables = mutable.Map[(String, String), Table]() // (db, table)
  val requests = mutable.ArrayBuffer[String]() // raw SQL bodies
  /** Any INSERT whose VALUES contain this literal cell fails with 500. */
  @volatile var rejectMarker: Option[String] = None
  /** Transient fault: the next N INSERT statements fail with 500
    * regardless of content (a restarting server / dropped connection),
    * then service resumes — the per-row fallback should land every
    * row on retry.
    */
  @volatile var failNextInserts: Int = 0

  /** One-shot targeted fault: the next statement CONTAINING this
    * substring fails with 500, then the hook clears. Pointing it at
    * the `_sync_state` INSERT simulates a crash in the at-least-once
    * window every state-after-write system has — data landed, state
    * append lost — so a spec can assert the re-run converges.
    */
  @volatile var failNextMatching: Option[String] = None

  /** CNCH/ByteHouse UNIQUE KEY semantics, opt-in per stub: an INSERT
    * carrying this column REPLACES any stored row with the same key
    * value (newest write wins) instead of appending. Tables without
    * the column (e.g. `_sync_state`) keep append semantics — exactly
    * the target model the reference relies on for idempotent re-reads.
    */
  @volatile var uniqueKeyCol: Option[String] = None

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  server.createContext("/", (ex: HttpExchange) => handle(ex))
  server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))

  /** Set by [[start]]. */
  @volatile var endpoint: String = _

  def start(): String = {
    server.start()
    endpoint = s"http://127.0.0.1:${server.getAddress.getPort}/"
    endpoint
  }
  def stop(): Unit = server.stop(0)

  /** Test-side seeding for the SOURCE role. */
  def seed(db: String, table: String, schema: Seq[(String, String)], rows: Seq[Seq[String]]): Unit = {
    databases += db
    val t = new Table(schema)
    t.rows ++= rows
    tables((db, table)) = t
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length.toLong)
    if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def handle(ex: HttpExchange): Unit = {
    val sql = new String(ex.getRequestBody.readAllBytes(), "UTF-8").trim
    requests.synchronized { requests += sql }
    try {
      failNextMatching.foreach { m =>
        if (sql.contains(m)) {
          failNextMatching = None
          throw new IllegalArgumentException(s"injected one-shot failure on '$m'")
        }
      }
      val out = ChStub.this.synchronized(dispatch(sql.stripSuffix("FORMAT TabSeparated").trim))
      respond(ex, 200, out)
    } catch {
      case e: Exception => respond(ex, 500, s"Code: 62. DB::Exception: ${e.getMessage}")
    }
  }

  private val ident = "`([^`]+)`"
  private val CreateDb = s"(?s)CREATE DATABASE IF NOT EXISTS $ident".r
  private val CreateTable = s"(?s)CREATE TABLE IF NOT EXISTS $ident\\.$ident \\((.*)\\) ENGINE = .*".r
  private val ShowTables = s"SHOW TABLES FROM $ident".r
  private val Describe = s"DESCRIBE TABLE $ident\\.$ident".r
  // optional `WHERE `col` > 'literal'` — the incremental delta filter
  private val wherePart = s"(?: WHERE $ident > '((?:[^'\\\\]|\\\\.)*)')?"
  private val CountStar = s"SELECT COUNT\\(\\*\\) FROM $ident\\.$ident$wherePart".r
  private val SelectPage =
    s"SELECT \\* FROM $ident\\.$ident$wherePart(?: ORDER BY $ident)? LIMIT (\\d+) OFFSET (\\d+)".r
  private val MinMax = s"SELECT min\\($ident\\), max\\($ident\\) FROM $ident\\.$ident".r
  private val SelectKeyRange =
    s"SELECT \\* FROM $ident\\.$ident WHERE $ident BETWEEN (-?\\d+) AND (-?\\d+) ORDER BY $ident".r
  private val MaxState =
    s"SELECT max\\($ident\\), max\\($ident\\) FROM $ident\\.$ident WHERE $ident = '((?:[^'\\\\]|\\\\.)*)'".r
  private val Insert = s"(?s)INSERT INTO $ident\\.$ident \\(([^)]*)\\) VALUES (.*)".r
  private val AlterAdd = s"ALTER TABLE $ident\\.$ident ADD COLUMN $ident Nullable\\((\\w+)\\)".r

  private def table(db: String, t: String): Table =
    tables.getOrElse((db, t), throw new IllegalArgumentException(s"Table $db.$t does not exist"))

  /** `col > 'val'` as a PLAIN string compare — deliberately strict:
    * the engine formats every watermark literal at the column's native
    * precision ([[graft.sinks.ClickHouseDdl.watermarkFormat]]), so the
    * literal's shape always matches the stored one and a bare compare
    * is exact. No padding/coercion here: a precision mismatch (the
    * boundary bug class the native-precision format exists to prevent)
    * should FAIL a spec loudly, not be silently healed by the stub.
    */
  private def whereFilter(tb: Table, whereCol: String, whereVal: String): Seq[Seq[String]] =
    Option(whereCol) match {
      case None => tb.rows.toSeq
      case Some(c) =>
        val i = tb.schema.indexWhere(_._1 == c)
        require(i >= 0, s"no column $c")
        val lit = whereVal.replace("\\'", "'").replace("\\\\", "\\")
        tb.rows.toSeq.filter(r => r(i) != null && r(i) > lit)
    }

  private def dispatch(sql: String): String = sql match {
    case "SELECT 1" => "1\n"
    case CreateDb(db) =>
      databases += db; ""
    case CreateTable(db, t, colsDef) =>
      if (!databases.contains(db)) throw new IllegalArgumentException(s"Database $db does not exist")
      if (!tables.contains((db, t))) {
        val cols = splitTopLevel(colsDef).map { cd =>
          val m = s"$ident (.*)".r.findFirstMatchIn(cd.trim)
            .getOrElse(throw new IllegalArgumentException(s"bad column def: $cd"))
          // type stops at DEFAULT if present
          val typ = m.group(2).split(" DEFAULT ")(0).trim
          (m.group(1), typ)
        }
        tables((db, t)) = new Table(cols)
      }
      ""
    case ShowTables(db) =>
      tables.keys.toSeq.filter(_._1 == db).map(_._2).sorted.map(_ + "\n").mkString
    case Describe(db, t) =>
      table(db, t).schema.map { case (n, ty) => s"$n\t$ty\n" }.mkString
    case CountStar(db, t, whereCol, whereVal) =>
      s"${whereFilter(table(db, t), whereCol, whereVal).size}\n"
    case SelectPage(db, t, whereCol, whereVal, order, limit, offset) =>
      val tb = table(db, t)
      val filtered = whereFilter(tb, whereCol, whereVal)
      val base = Option(order) match {
        case Some(c) =>
          val i = tb.schema.indexWhere(_._1 == c)
          require(i >= 0, s"no column $c")
          filtered.sortBy(r => Option(r(i)).getOrElse(""))
        case None => filtered
      }
      base.slice(offset.toInt, offset.toInt + limit.toInt)
        .map(_.map(ChHttp.escapeTsv).mkString("", "\t", "\n")).mkString
    case MinMax(c1, c2, db, t) =>
      require(c1 == c2, s"min/max on different columns unsupported: $c1 vs $c2")
      val tb = table(db, t)
      val i = tb.schema.indexWhere(_._1 == c1)
      require(i >= 0, s"no column $c1")
      val vs = tb.rows.flatMap(r => Option(r(i))).map(_.toLong)
      if (vs.isEmpty) "0\t0\n" else s"${vs.min}\t${vs.max}\n"
    case SelectKeyRange(db, t, keyCol, lo, hi, orderCol) =>
      require(keyCol == orderCol, s"range key and order key differ: $keyCol vs $orderCol")
      val tb = table(db, t)
      val i = tb.schema.indexWhere(_._1 == keyCol)
      require(i >= 0, s"no column $keyCol")
      tb.rows
        .filter(r => r(i) != null && { val v = r(i).toLong; v >= lo.toLong && v <= hi.toLong })
        .sortBy(_(i).toLong)
        .map(_.map(ChHttp.escapeTsv).mkString("", "\t", "\n")).mkString
    case MaxState(c1, c2, db, t, keyCol, keyVal) =>
      val tb = table(db, t)
      val ki = tb.schema.indexWhere(_._1 == keyCol)
      val i1 = tb.schema.indexWhere(_._1 == c1)
      val i2 = tb.schema.indexWhere(_._1 == c2)
      require(ki >= 0 && i1 >= 0 && i2 >= 0, s"bad columns in: $sql")
      val key = keyVal.replace("\\'", "'").replace("\\\\", "\\")
      val hits = tb.rows.filter(r => r(ki) == key)
      def mx(i: Int): String = {
        val vs = hits.flatMap(r => Option(r(i)))
        if (vs.isEmpty) "" else vs.max
      }
      s"${ChHttp.escapeTsv(mx(i1))}\t${ChHttp.escapeTsv(mx(i2))}\n"
    case AlterAdd(db, t, colName, typ) =>
      val tb = table(db, t)
      require(!tb.schema.exists(_._1 == colName), s"column $colName already exists")
      tb.schema = tb.schema :+ (colName, s"Nullable($typ)")
      // existing rows read NULL for the new column, like real CH
      for (i <- tb.rows.indices) tb.rows(i) = tb.rows(i) :+ null
      ""
    case Insert(db, t, colList, valuesPart) =>
      val tb = table(db, t)
      val cols = colList.split(",").map(_.trim.stripPrefix("`").stripSuffix("`")).toSeq
      val idx = cols.map { c =>
        val i = tb.schema.indexWhere(_._1 == c)
        require(i >= 0, s"no column $c in $db.$t"); i
      }
      if (failNextInserts > 0) {
        failNextInserts -= 1
        throw new IllegalArgumentException("injected transient failure")
      }
      val tuples = parseTuples(valuesPart)
      rejectMarker.foreach { m =>
        if (tuples.exists(_.contains(m)))
          throw new IllegalArgumentException(s"rejected: marker '$m' present")
      }
      val keyIdx = uniqueKeyCol.map(k => tb.schema.indexWhere(_._1 == k)).filter(_ >= 0)
      tuples.foreach { tup =>
        require(tup.size == cols.size, s"arity mismatch: ${tup.size} vs ${cols.size}")
        val row = Array.fill[String](tb.schema.size)(null)
        idx.zip(tup).foreach { case (i, v) => row(i) = v }
        // UNIQUE KEY upsert: same-key rows are replaced, newest wins
        keyIdx.foreach { ki =>
          val k = row(ki)
          if (k != null) {
            val dup = tb.rows.indexWhere(_(ki) == k)
            if (dup >= 0) tb.rows.remove(dup)
          }
        }
        tb.rows += row.toSeq
      }
      ""
    case other => throw new IllegalArgumentException(s"unhandled statement: ${other.take(120)}")
  }

  /** Split a column-def list on commas not inside parens. */
  private def splitTopLevel(s: String): Seq[String] = {
    val out = mutable.ArrayBuffer[String]()
    var depth = 0; val cur = new StringBuilder
    s.foreach {
      case '(' => depth += 1; cur.append('(')
      case ')' => depth -= 1; cur.append(')')
      case ',' if depth == 0 => out += cur.toString; cur.clear()
      case c => cur.append(c)
    }
    if (cur.nonEmpty) out += cur.toString
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** Parse `(lit, lit, …), (…)` — numbers, NULL, \'-escaped strings. */
  private def parseTuples(s: String): Seq[Seq[String]] = {
    val out = mutable.ArrayBuffer[Seq[String]]()
    var i = 0
    def skipWs(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    def parseString(): String = {
      // at opening quote
      i += 1
      val sb = new StringBuilder
      while (i < s.length && s.charAt(i) != '\'') {
        if (s.charAt(i) == '\\' && i + 1 < s.length) { sb.append(s.charAt(i + 1)); i += 2 }
        else { sb.append(s.charAt(i)); i += 1 }
      }
      require(i < s.length, "unterminated string literal")
      i += 1
      sb.toString
    }
    while ({ skipWs(); i < s.length }) {
      require(s.charAt(i) == '(', s"expected '(' at $i in: ${s.take(80)}")
      i += 1
      val tup = mutable.ArrayBuffer[String]()
      var done = false
      while (!done) {
        skipWs()
        if (s.charAt(i) == '\'') tup += parseString()
        else {
          val start = i
          while (i < s.length && s.charAt(i) != ',' && s.charAt(i) != ')') i += 1
          val tok = s.substring(start, i).trim
          tup += (if (tok == "NULL") null else tok)
        }
        skipWs()
        if (s.charAt(i) == ',') i += 1
        else if (s.charAt(i) == ')') { i += 1; done = true }
        else throw new IllegalArgumentException(s"bad tuple at $i")
      }
      out += tup.toSeq
      skipWs()
      if (i < s.length && s.charAt(i) == ',') i += 1
    }
    out.toSeq
  }
}
