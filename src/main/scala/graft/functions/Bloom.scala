package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.graft.ColumnBridge

/** Distributed Bloom filter over 64-bit keys — the pre-filter that
  * makes "probe a small batch against a huge corpus" cheap: instead of
  * shuffling the corpus for a join, ship a compact bitmap of its key
  * set and drop every batch row the bitmap rejects BEFORE any
  * join/shuffle. No false negatives (a rejected row is definitely not
  * in the corpus); false positives at the configured rate survive to
  * an exact verification join, so end-to-end results stay EXACT.
  *
  * Layout: 4-byte hash count | 8-byte bit count | bitmap (big-endian
  * header, little-endian-free bit math). Bits come from the standard
  * two-hash scheme (Kirsch-Mitzenmacher): bit_i = (h1 + i*h2) mod m
  * with h1 the key's splitmix64 finalizer and h2 a second finalizer
  * round — build and probe share exactly this math.
  *
  * Scale: the build is a typed Aggregator — per-partition bitmaps
  * OR-merge map-side, so the driver sees one bitmap per partition
  * tree-merged, never keys. A 1e8-key / 1% filter is ~120 MB — at that
  * point shard the corpus by key range and build one bloom per shard
  * (the probe expression is pure, so `when(shard=0, probe(b0)).
  * when(...)` composes); below it a single bitmap broadcast as a plan
  * literal is the fastest possible probe (pure codegen, no shuffle).
  */
object Bloom {

  /** Optimal bit count for n keys at false-positive rate p, rounded up
    * to a multiple of 64.
    */
  def numBitsFor(expectedKeys: Long, fpp: Double): Long = {
    require(expectedKeys > 0 && fpp > 0 && fpp < 1, s"bad bloom params ($expectedKeys, $fpp)")
    val m = math.ceil(-expectedKeys * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    val bits = ((m + 63) / 64) * 64
    // one JVM array holds the bitmap: beyond ~1e9 keys the caller must
    // shard (see scaladoc) — fail loudly instead of wrapping the Int
    // word count into a negative (or silently wrong) array size
    // the serialized form is 12 + 8*words bytes allocated in Int
    // arithmetic (BloomAgg.finish), so bound by what fits an Int BYTE
    // length, not an Int word count — otherwise the require passes and
    // the failure surfaces only after the full aggregation runs
    require(bits / 64 <= (Int.MaxValue - 16) / 8,
      s"bloom for $expectedKeys keys @ $fpp needs $bits bits — exceeds one bitmap, shard by key range")
    bits
  }

  /** Optimal hash count for the m/n ratio. */
  def numHashesFor(expectedKeys: Long, numBits: Long): Int =
    math.max(1, math.round(numBits.toDouble / expectedKeys * math.log(2)).toInt)

  private[functions] def setBits(words: Array[Long], numBits: Long, numHashes: Int, key: Long): Unit = {
    val h1 = SketchHash.mix1(key)
    val h2 = SketchHash.mix2(key)
    var i = 0
    while (i < numHashes) {
      val bit = java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, numBits)
      words((bit >>> 6).toInt) |= 1L << (bit & 63)
      i += 1
    }
  }

  /** Probe a serialized bloom for a key. Public static — generated
    * code calls it.
    */
  def mightContain(bloom: Array[Byte], key: Long): Boolean = {
    val bb = java.nio.ByteBuffer.wrap(bloom)
    val numHashes = bb.getInt(0)
    val numBits = bb.getLong(4)
    val h1 = SketchHash.mix1(key)
    val h2 = SketchHash.mix2(key)
    var i = 0
    while (i < numHashes) {
      val bit = java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, numBits)
      val word = bb.getLong(12 + 8 * (bit >>> 6).toInt)
      if ((word & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Typed Aggregator building the serialized bloom. The buffer is a
    * raw word array mutated in place (TypedImperativeAggregate keeps
    * it as an object within a partition); merges are word-wise ORs.
    */
  class BloomAgg(numBits: Long, numHashes: Int) extends Aggregator[Long, Array[Long], Array[Byte]] {
    override def zero: Array[Long] = new Array[Long]((numBits / 64).toInt)
    override def reduce(b: Array[Long], key: Long): Array[Long] = { setBits(b, numBits, numHashes, key); b }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    override def finish(words: Array[Long]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(12 + 8 * words.length)
      bb.putInt(numHashes).putLong(numBits)
      words.foreach(bb.putLong)
      bb.array()
    }
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Build a bloom over a Long key column (one action). */
  def build(keys: DataFrame, keyCol: String, expectedKeys: Long, fpp: Double = 0.01): Array[Byte] = {
    val numBits = numBitsFor(expectedKeys, fpp)
    val numHashes = numHashesFor(expectedKeys, numBits)
    import keys.sparkSession.implicits._
    keys.select(keyCol).as[Long].select(new BloomAgg(numBits, numHashes).toColumn).head()
  }

  def bloom_might_contain(bloom: Column, key: Column): Column =
    ColumnBridge.column(BloomMightContain(ColumnBridge.expression(bloom), ColumnBridge.expression(key)))
}

case class BloomMightContain(left: Expression, right: Expression) extends BinaryExpression {
  import org.apache.spark.sql.types._
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"bloom_might_contain needs (binary, long), got $other")
  }
  override def nullSafeEval(b: Any, k: Any): Any =
    Bloom.mightContain(b.asInstanceOf[Array[Byte]], k.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, k) => s"graft.functions.Bloom.mightContain($b, $k)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BloomMightContain =
    copy(l, r)
}
