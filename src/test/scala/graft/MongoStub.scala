package graft

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream}
import java.net.{ServerSocket, Socket}
import java.nio.{ByteBuffer, ByteOrder}

import scala.collection.immutable.ListMap
import scala.collection.mutable

import graft.sources.Bson

/** In-process MongoDB OP_MSG stub for MongoLiveParitySpec — the
  * ChStub/EsStub move for the third reference source: a real TCP
  * server decoding the same frames [[graft.sources.MongoWireClient]]
  * sends, with a toy collection store behind it. Understands exactly
  * the commands the reference flow issues
  * (mongodb_to_bytehouse.py:488-679): hello, listCollections, count,
  * find with `{}` / `{_id: {$gt: oid}}` filters + `sort {_id: 1}` +
  * limit/batchSize, getMore, killCursors. Every decoded command is
  * logged for wire-contract assertions; cursors are real server-side
  * state so batch-walk and kill semantics are exercised, not faked.
  */
class MongoStub {

  /** (db, collection) -> ordered docs. Seed with _id present. */
  val collections = mutable.Map[(String, String), mutable.ArrayBuffer[ListMap[String, Any]]]()
  /** Decoded command documents, in arrival order. */
  val requests = mutable.ArrayBuffer[ListMap[String, Any]]()
  /** Live cursors: id -> remaining docs. */
  val cursors = mutable.Map[Long, Iterator[ListMap[String, Any]]]()
  /** Fault injection: the next getMore finds its cursor gone (server
    * restart / cursor timeout — Mongo's CursorNotFound), once.
    */
  @volatile var dropCursorsOnGetMore = false
  private var nextCursorId = 1000L

  private val server = new ServerSocket(0, 8, java.net.InetAddress.getByName("127.0.0.1"))
  @volatile private var running = true
  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val s = server.accept()
        val t = new Thread(() => serve(s))
        t.setDaemon(true)
        t.start()
      } catch { case _: Exception => () }
    }
  })
  acceptor.setDaemon(true)

  def start(): (String, Int) = {
    acceptor.start()
    ("127.0.0.1", server.getLocalPort)
  }

  def stop(): Unit = { running = false; server.close() }

  def seed(db: String, coll: String, docs: Seq[ListMap[String, Any]]): Unit =
    collections((db, coll)) = mutable.ArrayBuffer.from(docs.sortBy(_("_id").asInstanceOf[Bson.Oid].hex))

  private def serve(socket: Socket): Unit = {
    val in = new DataInputStream(new BufferedInputStream(socket.getInputStream))
    val out = new BufferedOutputStream(socket.getOutputStream)
    try {
      while (true) {
        val lenBytes = new Array[Byte](4)
        in.readFully(lenBytes)
        val len = ByteBuffer.wrap(lenBytes).order(ByteOrder.LITTLE_ENDIAN).getInt
        val rest = new Array[Byte](len - 4)
        in.readFully(rest)
        val reqId = ByteBuffer.wrap(rest, 0, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
        val opCode = ByteBuffer.wrap(rest, 8, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
        require(opCode == 2013 && rest(16) == 0, s"bad frame: opCode=$opCode kind=${rest(16)}")
        val (cmd, _) = Bson.decode(rest, 17)
        MongoStub.this.synchronized { requests += cmd }
        val reply = try MongoStub.this.synchronized(dispatch(cmd))
        catch {
          case e: Exception => Seq[(String, Any)]("ok" -> 0.0, "errmsg" -> e.getMessage)
        }
        val body = Bson.encode(reply)
        val header = ByteBuffer.allocate(21).order(ByteOrder.LITTLE_ENDIAN)
        header.putInt(21 + body.length).putInt(0).putInt(reqId).putInt(2013).putInt(0).put(0.toByte)
        out.write(header.array()); out.write(body); out.flush()
      }
    } catch {
      case _: Exception => () // client closed
    } finally socket.close()
  }

  private def db(cmd: ListMap[String, Any]): String = cmd("$db").asInstanceOf[String]

  private def coll(name: String, cmd: ListMap[String, Any]): Seq[ListMap[String, Any]] =
    collections.getOrElse((db(cmd), name),
      throw new IllegalArgumentException(s"ns not found: ${db(cmd)}.$name")).toSeq

  private def dispatch(cmd: ListMap[String, Any]): Seq[(String, Any)] = cmd.head match {
    case ("hello", _) =>
      Seq("isWritablePrimary" -> true, "maxWireVersion" -> 17, "ok" -> 1.0)
    case ("listCollections", _) =>
      val names = collections.keys.toSeq.filter(_._1 == db(cmd)).map(_._2).sorted
      Seq(
        "cursor" -> Seq[(String, Any)](
          "id" -> 0L,
          "ns" -> s"${db(cmd)}.$$cmd.listCollections",
          "firstBatch" -> names.map(n => Map("name" -> n, "type" -> "collection"))),
        "ok" -> 1.0)
    case ("count", name: String) =>
      Seq("n" -> coll(name, cmd).size, "ok" -> 1.0)
    case ("find", name: String) =>
      val docs = coll(name, cmd)
      require(cmd.get("sort").contains(ListMap("_id" -> 1)),
        s"stub requires sort {_id: 1}, got ${cmd.get("sort")}")
      val filtered = cmd.get("filter") match {
        case Some(f: ListMap[String, Any] @unchecked) if f.isEmpty => docs
        case Some(f: ListMap[String, Any] @unchecked) =>
          f.get("_id") match {
            case Some(cond: ListMap[String, Any] @unchecked) =>
              val gt = cond("$gt").asInstanceOf[Bson.Oid].hex
              docs.filter(_("_id").asInstanceOf[Bson.Oid].hex > gt)
            case other => throw new IllegalArgumentException(s"unsupported filter: $other")
          }
        case None => docs
        case other => throw new IllegalArgumentException(s"unsupported filter: $other")
      }
      val limited = cmd.get("limit") match {
        case Some(l: Int) => filtered.take(l)
        case _ => filtered
      }
      val batchSize = cmd.get("batchSize") match { case Some(b: Int) => b; case _ => 101 }
      val it = limited.iterator
      val first = it.take(batchSize).toSeq
      val cid = if (it.hasNext) { nextCursorId += 1; cursors(nextCursorId) = it; nextCursorId } else 0L
      Seq(
        "cursor" -> Seq[(String, Any)](
          "id" -> cid, "ns" -> s"${db(cmd)}.$name", "firstBatch" -> first),
        "ok" -> 1.0)
    case ("getMore", cid: Long) =>
      if (dropCursorsOnGetMore) { cursors.clear(); dropCursorsOnGetMore = false }
      val it = cursors.getOrElse(cid, throw new IllegalArgumentException(s"cursor $cid not found"))
      val batchSize = cmd.get("batchSize") match { case Some(b: Int) => b; case _ => 101 }
      val batch = it.take(batchSize).toSeq
      val nid = if (it.hasNext) cid else { cursors.remove(cid); 0L }
      Seq(
        "cursor" -> Seq[(String, Any)](
          "id" -> nid,
          "ns" -> s"${db(cmd)}.${cmd("collection")}",
          "nextBatch" -> batch),
        "ok" -> 1.0)
    case ("killCursors", _) =>
      val ids = cmd("cursors").asInstanceOf[Seq[Any]].map { case l: Long => l; case i: Int => i.toLong }
      val killed = ids.filter(cursors.remove(_).isDefined)
      Seq("cursorsKilled" -> killed, "ok" -> 1.0)
    case other =>
      throw new IllegalArgumentException(s"unhandled command: $other")
  }
}
