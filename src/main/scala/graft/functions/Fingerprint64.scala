package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** C11: 64-bit FNV-1a document fingerprint over the UTF-8 bytes of a
  * string — a native Catalyst expression with whole-stage codegen, the
  * preferred shape for a custom scalar function (a Scala UDF would
  * break codegen and force ser/de per row).
  *
  * The reference fingerprints documents implicitly via `_id`s; content
  * fingerprints are what a training pipeline dedups/joins on at scale.
  */
case class Fingerprint64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"fingerprint64 needs a string argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    Fingerprint64.hash(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Fingerprint64.hash($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Fingerprint64 = copy(newChild)
}

object Fingerprint64 {
  /** FNV-1a 64-bit. Public because generated code calls it. */
  def hash(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Column API: `fingerprint64($"text")`. */
  def fingerprint64(c: Column): Column = ColumnBridge.column(Fingerprint64(ColumnBridge.expression(c)))
}
