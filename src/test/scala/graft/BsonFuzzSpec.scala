package graft

import org.scalatest.funsuite.AnyFunSuite

import scala.collection.immutable.ListMap

import graft.sources.Bson

/** Generator-driven property tests for the hand-rolled BSON codec
  * (`sources/MongoWire.scala`) — the single point of truth for the
  * Mongo wire path, previously covered only by examples. Three
  * properties, each over deterministic LCG-generated cases (no new
  * test dependencies, reproducible failures by seed):
  *
  *  1. encode → decode round-trips EVERY supported value shape —
  *     nested documents to depth 4, arrays, UTF-8 edge strings
  *     (supplementary planes, embedded NULs in VALUES, controls),
  *     double specials (±0.0, ±Inf, extremes), ObjectIds, binary,
  *     millisecond timestamps, int32/int64 boundaries, booleans, null
  *     — with key order preserved.
  *  2. Truncation never misparses: every strict prefix of a valid
  *     encoding is REJECTED (the trailing length check makes a
  *     silently-wrong parse structurally impossible) and never hangs.
  *  3. Header-length corruption is rejected: any declared length
  *     other than the true one fails the walked-vs-declared check;
  *     random single-byte body flips terminate (reject or parse) —
  *     no infinite loop, no crash-class failure other than a thrown
  *     exception.
  */
class BsonFuzzSpec extends AnyFunSuite {

  /** Deterministic 64-bit LCG (Knuth MMIX constants). */
  private final class Lcg(seed: Long) {
    private var s = seed
    def nextLong(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s }
    def nextInt(n: Int): Int = math.floorMod(nextLong(), n.toLong).toInt
    def nextBool(): Boolean = nextInt(2) == 0
  }

  /** Valid Unicode string: random codepoints over all planes, skipping
    * the surrogate range (a lone surrogate is not encodable UTF-8 —
    * Java would substitute '?', which is a generator bug, not a codec
    * one). Deliberately includes NUL and other controls: BSON string
    * VALUES are length-prefixed, so NUL is legal inside them.
    */
  private def genString(r: Lcg, maxLen: Int): String = {
    val sb = new java.lang.StringBuilder
    (0 until r.nextInt(maxLen + 1)).foreach { _ =>
      val cp = r.nextInt(5) match {
        case 0 => r.nextInt(0x80) // ASCII incl. controls and NUL
        case 1 => 0x80 + r.nextInt(0x800 - 0x80) // 2-byte UTF-8
        case 2 => // BMP above 0x800, skipping surrogates
          val c = 0x800 + r.nextInt(0x10000 - 0x800)
          if (c >= 0xD800 && c <= 0xDFFF) 0xE000 + (c - 0xD800) else c
        case 3 => 0x10000 + r.nextInt(0x10FFFF - 0x10000) // supplementary
        case _ => 'a' + r.nextInt(26)
      }
      sb.appendCodePoint(cp)
    }
    sb.toString
  }

  /** BSON element keys: NUL-free (cstring framing), possibly empty. */
  private def genKey(r: Lcg, i: Int): String = {
    val raw = genString(r, 8).replace("\u0000", "")
    s"k${i}_$raw" // unique prefix: duplicate keys are legal BSON but collapse in ListMap
  }

  private val doubleSpecials =
    Array(0.0, -0.0, Double.MinPositiveValue, Double.MaxValue, Double.MinValue,
      Double.PositiveInfinity, Double.NegativeInfinity, 1.5e-300, -2.25)

  private def genValue(r: Lcg, depth: Int): Any = {
    val pick = r.nextInt(if (depth > 0) 13 else 11)
    pick match {
      case 0 => genString(r, 24)
      case 1 => r.nextInt(7) match {
        case 0 => Int.MaxValue
        case 1 => Int.MinValue
        case _ => r.nextInt(100000) - 50000
      }
      case 2 => r.nextInt(7) match {
        case 0 => Long.MaxValue
        case 1 => Long.MinValue
        case _ => r.nextLong() >> 16
      }
      case 3 => if (r.nextInt(4) == 0) doubleSpecials(r.nextInt(doubleSpecials.length))
                else r.nextLong().toDouble / 1e6
      case 4 => r.nextBool()
      case 5 => null
      case 6 => Bson.Oid((0 until 24).map(_ => "0123456789abcdef"(r.nextInt(16))).mkString)
      case 7 => Array.fill[Byte](r.nextInt(16))(r.nextLong().toByte)
      case 8 => new java.sql.Timestamp(r.nextLong() % 4102444800000L) // millis grain
      case 9 => genString(r, 4)
      case 10 => r.nextInt(256) - 128
      case 11 => // nested document (ListMap: insertion-ordered Map branch)
        ListMap((0 until r.nextInt(4)).map(i => genKey(r, i) -> genValue(r, depth - 1)): _*)
      case _ => // array
        Vector.fill(r.nextInt(4))(genValue(r, depth - 1))
    }
  }

  private def genDoc(r: Lcg, depth: Int): Seq[(String, Any)] =
    (0 until 1 + r.nextInt(6)).map(i => genKey(r, i) -> genValue(r, depth))

  /** Structural equality across the codec's representation shifts:
    * encode accepts Seq-of-pairs and Map for subdocs, decode returns
    * ListMap; arrays come back as Vector; binary as Array[Byte].
    */
  private def norm(v: Any): Any = v match {
    case m: scala.collection.Map[_, _] =>
      m.toSeq.map { case (k, vv) => (k.toString, norm(vv)) }.toVector
    case b: Array[Byte] => ("bin", b.toVector)
    case s: Seq[_] if s.nonEmpty && s.head.isInstanceOf[(_, _)] &&
        s.head.asInstanceOf[(_, _)]._1.isInstanceOf[String] =>
      s.asInstanceOf[Seq[(String, Any)]].map { case (k, vv) => (k, norm(vv)) }.toVector
    case s: Seq[_] => ("arr", s.map(norm).toVector)
    case d: Double => java.lang.Double.doubleToLongBits(d) // -0.0 and NaN bit-exact
    case x => x
  }

  test("property: encode→decode round-trips 1200 random nested documents, key order preserved") {
    val r = new Lcg(0x5eed5eedL)
    (1 to 1200).foreach { i =>
      val doc = genDoc(r, depth = 3 + (i % 2))
      val bytes = Bson.encode(doc)
      val (decoded, n) = Bson.decode(bytes)
      assert(n == bytes.length, s"case $i: walked $n of ${bytes.length}")
      assert(decoded.keys.toSeq == doc.map(_._1), s"case $i: key order drift")
      assert(norm(decoded) == norm(doc), s"case $i: value drift\n doc=$doc\n dec=$decoded")
    }
  }

  test("property: every strict prefix of a valid encoding is rejected — truncation cannot misparse") {
    val r = new Lcg(0x7acc7accL)
    (1 to 60).foreach { i =>
      val bytes = Bson.encode(genDoc(r, depth = 2))
      // every prefix for small docs; sampled prefixes for larger ones
      val cuts =
        if (bytes.length <= 64) 0 until bytes.length
        else (0 until 64).map(_ => r.nextInt(bytes.length))
      cuts.foreach { cut =>
        val t = intercept[Throwable] {
          Bson.decode(java.util.Arrays.copyOfRange(bytes, 0, cut))
        }
        assert(t.isInstanceOf[Exception] || t.isInstanceOf[Error], s"case $i cut $cut: $t")
      }
    }
  }

  test("property: corrupted header length is rejected; random body flips terminate without hanging") {
    val r = new Lcg(0xc0de1234L)
    (1 to 60).foreach { i =>
      val doc = genDoc(r, depth = 2)
      val bytes = Bson.encode(doc)
      val trueLen = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt(0)
      // declared-length corruption: any value but the true one rejects
      Seq(0, 1, 4, trueLen - 1, trueLen + 1, -trueLen, Int.MaxValue).foreach { bad =>
        if (bad != trueLen) {
          val c = bytes.clone()
          java.nio.ByteBuffer.wrap(c).order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(0, bad)
          intercept[Throwable] { Bson.decode(c) }
          ()
        }
      }
      // arbitrary single-byte flips: decode must TERMINATE — either a
      // clean parse (flip hit a value byte) or a thrown rejection;
      // the while-loops advance ≥1 byte per step so a hang is the only
      // failure mode this can surface, and completion IS the assertion
      (0 until 32).foreach { _ =>
        val c = bytes.clone()
        val pos = r.nextInt(c.length)
        c(pos) = (c(pos) ^ (1 + r.nextInt(255))).toByte
        try { Bson.decode(c); () } catch { case _: Throwable => () }
      }
    }
  }

  test("Oid: hex↔bytes bijection over 500 random ids; malformed hex rejected") {
    val r = new Lcg(0x01d01d01L)
    (1 to 500).foreach { _ =>
      val bytes = Array.fill[Byte](12)(r.nextLong().toByte)
      val oid = Bson.Oid(bytes)
      assert(oid.bytes.toSeq == bytes.toSeq)
      assert(Bson.Oid(oid.hex).bytes.toSeq == bytes.toSeq)
    }
    intercept[IllegalArgumentException] { Bson.Oid("short") }
    intercept[IllegalArgumentException] { Bson.Oid("X" * 24) }
    intercept[IllegalArgumentException] { Bson.Oid("ABCDEF0123456789abcdef01") } // uppercase banned
    intercept[IllegalArgumentException] { Bson.Oid(Array.fill[Byte](11)(0)) }
  }
}
