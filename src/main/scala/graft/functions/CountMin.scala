package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.graft.ColumnBridge

/** Count-Min sketch over 64-bit keys — the mergeable frequency sketch
  * that makes "find every heavy key in 100 TB" a two-pass plan with
  * tiny state instead of a full-vocabulary shuffle:
  *
  *   pass 1: build the sketch (typed Aggregator — per-partition
  *           d×w counter grids merge by addition map-side; the driver
  *           sees one grid per partition, never keys);
  *   pass 2: keep only rows whose estimate ≥ threshold (broadcast-
  *           literal codegen probe — CMS NEVER underestimates, so no
  *           true heavy key is lost) and exact-count just those.
  *
  * The final counts are EXACT — sketch overestimates only admit a few
  * light keys into the verification aggregate, they never change a
  * result. A d=4, w=65536 grid is 2 MB regardless of corpus size.
  *
  * Layout: 4-byte depth | 4-byte width | d*w big-endian Long counters.
  * Row i hashes with the same Kirsch-Mitzenmacher family as
  * [[Bloom]]: cell_i = (h1 + i*h2) mod w.
  */
object CountMin {

  private[functions] def addOne(grid: Array[Long], depth: Int, width: Int, key: Long): Unit = {
    val h1 = SketchHash.mix1(key)
    val h2 = SketchHash.mix2(key)
    var i = 0
    while (i < depth) {
      val cell = java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, width.toLong)
      grid(i * width + cell.toInt) += 1L
      i += 1
    }
  }

  /** Point estimate (min over rows) from a serialized sketch. Public
    * static — generated code calls it.
    */
  def estimate(cms: Array[Byte], key: Long): Long = {
    val bb = java.nio.ByteBuffer.wrap(cms)
    val depth = bb.getInt(0)
    val width = bb.getInt(4)
    val h1 = SketchHash.mix1(key)
    val h2 = SketchHash.mix2(key)
    var best = Long.MaxValue
    var i = 0
    while (i < depth) {
      val cell = java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, width.toLong)
      val v = bb.getLong(8 + 8 * (i * width + cell.toInt))
      if (v < best) best = v
      i += 1
    }
    best
  }

  /** Typed Aggregator building the serialized sketch; merge is
    * element-wise addition (CMS is a linear sketch).
    */
  class CmsAgg(depth: Int, width: Int) extends Aggregator[Long, Array[Long], Array[Byte]] {
    require(depth > 0 && width > 0, s"bad CMS dims ($depth, $width)")
    // serialized form is 8 + 8*cells bytes in Int arithmetic — bound by
    // the Int BYTE length so the require fails at sizing time, not after
    // the aggregation runs into ByteBuffer.allocate overflow
    require(depth.toLong * width <= (Int.MaxValue - 16) / 8,
      s"CMS grid $depth x $width exceeds a single serialized sketch — widen depth instead, or shard")
    override def zero: Array[Long] = new Array[Long](depth * width)
    override def reduce(g: Array[Long], key: Long): Array[Long] = { addOne(g, depth, width, key); g }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(grid: Array[Long]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + 8 * grid.length)
      bb.putInt(depth).putInt(width)
      grid.foreach(bb.putLong)
      bb.array()
    }
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Build a sketch over a Long key column (one action). */
  def build(keys: DataFrame, keyCol: String, depth: Int = 4, width: Int = 65536): Array[Byte] = {
    import keys.sparkSession.implicits._
    keys.select(keyCol).as[Long].select(new CmsAgg(depth, width).toColumn).head()
  }

  def cms_estimate(cms: Column, key: Column): Column =
    ColumnBridge.column(CmsEstimate(ColumnBridge.expression(cms), ColumnBridge.expression(key)))
}

case class CmsEstimate(left: Expression, right: Expression) extends BinaryExpression {
  import org.apache.spark.sql.types._
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"cms_estimate needs (binary, long), got $other")
  }
  override def nullSafeEval(c: Any, k: Any): Any =
    CountMin.estimate(c.asInstanceOf[Array[Byte]], k.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, k) => s"graft.functions.CountMin.estimate($c, $k)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CmsEstimate =
    copy(l, r)
}
