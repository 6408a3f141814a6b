package graft

import scala.collection.immutable.ListMap

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.sources.{Bson, MongoSource, MongoWireClient}
import graft.sync.SyncRunner

/** Live-protocol parity for the MongoDB source — the reference's
  * mongodb_to_bytehouse flow (connect → list collections → scan
  * fields → full sync → _id-watermark incremental, ref :488-679)
  * driven over a real TCP socket against [[MongoStub]], with the
  * decoded wire bodies asserted. Completes the three-source matrix:
  * ES REST scroll ([[EsLiveParitySpec]]), ClickHouse SQL-over-HTTP
  * ([[ChLiveParitySpec]]), Mongo OP_MSG (this).
  */
class MongoLiveParitySpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def oid(sec: Long, n: Long): Bson.Oid = Bson.Oid(f"$sec%08x" + f"$n%016x")
  private val t0 = 1706054400L

  /** 23 docs with the full type surface the reference flattens:
    * nested object, array, ObjectId ref, datetime, bytes, reserved
    * key characters ($, ., -).
    */
  private def seedDocs(from: Int, until: Int): Seq[ListMap[String, Any]] =
    (from until until).map { i =>
      ListMap[String, Any](
        "_id" -> oid(t0 + i, i.toLong),
        "name" -> s"user_$i",
        "age" -> i,
        "score" -> (i * 10L),
        "active" -> (i % 2 == 0),
        "address" -> ListMap[String, Any]("city" -> s"c$i", "zip" -> i),
        "tags" -> Seq(s"t$i", s"u$i"),
        "ref_id" -> oid(t0, 999L),
        "created" -> new java.sql.Timestamp((t0 + i) * 1000L),
        "blob" -> Array[Byte](1, 2, i.toByte),
        "$meta.key-x" -> s"m$i"
      )
    }

  private def withStub(f: (MongoStub, String, Int) => Unit): Unit = {
    val stub = new MongoStub
    stub.seed("shop", "users", seedDocs(0, 23))
    stub.seed("shop", "empty_logs", Seq.empty)
    stub.seed("shop", "system.views", Seq.empty)
    val (host, port) = stub.start()
    try f(stub, host, port)
    finally stub.stop()
  }

  test("bootstrap: hello handshake, discovery filters system.*, field scan from a sample") {
    withStub { (stub, host, port) =>
      val client = new MongoWireClient(host, port)
      try {
        val h = client.hello()
        assert(h("maxWireVersion") == 17 && h("ok") == 1.0)
        // ref get_collections: system.* filtered (mongodb_to_bytehouse.py:297-304)
        assert(client.listCollections("shop") == Seq("empty_logs", "users"))
        assert(client.count("shop", "users") == 23L)
        // ref scan_collection_fields: union of flattened keys, _id first,
        // reserved characters sanitized
        val fields = MongoSource.scanFields(client, "shop", "users", sample = 10)
        assert(fields.head == "_id")
        assert(fields.contains("address") && fields.contains("tags") && fields.contains("_meta_key_x"),
          fields.toString)
        // the sample went over the wire as find+limit with sort {_id:1}
        val sampleFind = stub.requests.find(r => r.head == ("find" -> "users") && r.contains("limit"))
        assert(sampleFind.exists(_("limit") == 10), stub.requests.toString)
      } finally client.close()
    }
  }

  test("full sync: cursor walk lands typed-to-string rows through autoSyncByOid, wire frames exact") {
    withStub { (stub, host, port) =>
      val df = MongoSource.read(spark, host, port, "shop", "users", batchSize = 5)
      // 23 docs / batch 5: one find (5 docs) + 4 getMores (5,5,5,3), last returns cursor 0
      val finds = stub.requests.filter(_.head == ("find" -> "users"))
      val getMores = stub.requests.filter(_.head._1 == "getMore")
      assert(finds.size == 1 && getMores.size == 4, stub.requests.map(_.head).toString)
      assert(finds.head("sort") == ListMap("_id" -> 1))
      assert(finds.head("batchSize") == 5)
      assert(stub.cursors.isEmpty, "server cursor must be exhausted")
      // all-string shape, _id first — the reference's insert row
      assert(df.schema.fields.head.name == "_id")
      assert(df.schema.fields.forall(_.dataType == StringType))
      assert(df.count() == 23)
      val r7 = df.filter(col("name") === "user_7").collect()(0)
      def v(c: String): String = r7.getString(r7.fieldIndex(c))
      assert(v("_id") == oid(t0 + 7, 7L).hex)
      assert(v("age") == "7" && v("score") == "70" && v("active") == "false")
      assert(v("address") == """{"city": "c7", "zip": 7}""") // nested -> JSON string
      assert(v("tags") == """["t7", "u7"]""")
      assert(v("ref_id") == oid(t0, 999L).hex) // ObjectId -> hex string
      assert(v("created") == java.time.Instant.ofEpochSecond(t0 + 7).toString) // ISO
      assert(v("blob") == "010207") // bytes -> hex
      assert(v("_meta_key_x") == "m7") // $ . - sanitized
      // the reference flow: full sync through the oid-watermark runner
      val targetDir = tmp("graft_mongo_target") + "/users"
      val stateDir = tmp("graft_mongo_state") + "/state"
      val (mode, n) = SyncRunner.autoSyncByOid(spark, df, "users", "_id", targetDir, stateDir, nowUs = 1L)
      assert(mode == "full" && n == 23)
      assert(SyncRunner.readOidState(spark, stateDir, "users").get.last_id == oid(t0 + 22, 22L).hex)
    }
  }

  test("incremental: persisted watermark becomes the wire-side $gt filter; only new docs cross") {
    withStub { (stub, host, port) =>
      val targetDir = tmp("graft_mongo_incr_target") + "/users"
      val stateDir = tmp("graft_mongo_incr_state") + "/state"
      val full = MongoSource.read(spark, host, port, "shop", "users", batchSize = 50)
      SyncRunner.autoSyncByOid(spark, full, "users", "_id", targetDir, stateDir, nowUs = 1L)
      val wm = SyncRunner.readOidState(spark, stateDir, "users").get.last_id
      // five late arrivals with strictly larger oids
      stub.seed("shop", "users", seedDocs(0, 23) ++ seedDocs(30, 35))
      stub.requests.clear()
      val delta = MongoSource.read(spark, host, port, "shop", "users", batchSize = 50, afterId = Some(wm))
      val (mode, n) = SyncRunner.autoSyncByOid(spark, delta, "users", "_id", targetDir, stateDir, nowUs = 2L)
      assert(mode == "incremental" && n == 5)
      // the watermark crossed the wire as {_id: {$gt: ObjectId(wm)}} —
      // ref mongodb_to_bytehouse.py:622-626
      val find = stub.requests.find(_.head == ("find" -> "users")).get
      val filter = find("filter").asInstanceOf[ListMap[String, Any]]
      val gt = filter("_id").asInstanceOf[ListMap[String, Any]]("$gt")
      assert(gt == Bson.Oid(wm), s"filter was $filter")
      assert(spark.read.parquet(targetDir).count() == 28)
      assert(SyncRunner.readOidState(spark, stateDir, "users").get.last_id == oid(t0 + 34, 34L).hex)
    }
  }

  test("killCursors: an abandoned cursor is killed on the wire and its server state drops") {
    withStub { (stub, host, port) =>
      val client = new MongoWireClient(host, port)
      try {
        val (cid, first) = client.find("shop", "users", afterId = None, batchSize = 4)
        assert(cid != 0L && first.size == 4)
        assert(stub.cursors.contains(cid))
        client.killCursors("shop", "users", Seq(cid))
        assert(!stub.cursors.contains(cid), "cursor must be gone server-side")
        val kill = stub.requests.find(_.head._1 == "killCursors").get
        assert(kill("cursors") == Vector(cid), kill.toString)
      } finally client.close()
    }
  }

  test("BSON codec: encode/decode round-trip over every type the flow moves; errors surface") {
    val doc = Seq[(String, Any)](
      "s" -> "héllo\t\"q\"", "i" -> 42, "l" -> 42L, "d" -> 1.5d, "b" -> true,
      "z" -> null, "o" -> oid(t0, 7L), "t" -> new java.sql.Timestamp(123456789L),
      "bin" -> Array[Byte](0, 127, -128),
      "sub" -> ListMap[String, Any]("k" -> 1), "arr" -> Seq("x", 2))
    val (back, len) = Bson.decode(Bson.encode(doc))
    assert(len == Bson.encode(doc).length)
    assert(back("s") == "héllo\t\"q\"" && back("i") == 42 && back("l") == 42L)
    assert(back("d") == 1.5d && back("b") == true && back("z") == null)
    assert(back("o") == oid(t0, 7L))
    assert(back("t") == new java.sql.Timestamp(123456789L))
    assert(back("bin").asInstanceOf[Array[Byte]].toSeq == Seq[Byte](0, 127, -128))
    assert(back("sub") == ListMap("k" -> 1))
    assert(back("arr") == Vector("x", 2))
    // a command the stub rejects surfaces the server errmsg
    withStub { (_, host, port) =>
      val client = new MongoWireClient(host, port)
      try {
        val e = intercept[java.io.IOException](client.count("shop", "missing"))
        assert(e.getMessage.contains("ns not found"), e.getMessage)
      } finally client.close()
    }
  }
}
