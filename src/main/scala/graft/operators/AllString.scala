package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's all-String data model (es_to_bytehouse.py:164-188:
  * every ES type → String) as a single projection with *stable*
  * formats — the formatting rules are part of the contract so that
  * round-trips and cross-engine comparisons are bit-exact:
  *
  *   - integers: decimal text
  *   - floating point: fixed 6-decimal-scale text (via Decimal(38,6))
  *   - timestamps: `yyyy-MM-dd HH:mm:ss.SSSSSS` (UTC)
  *   - dates: `yyyy-MM-dd`
  *   - booleans: `true`/`false`
  *   - arrays/maps/structs: compact JSON
  */
object AllString {

  def stringColumn(c: Column, dt: DataType): Column = dt match {
    case StringType => c
    case FloatType | DoubleType => c.cast(DecimalType(38, 6)).cast(StringType)
    case TimestampType => date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")
    case TimestampNTZType => date_format(c.cast(TimestampType), "yyyy-MM-dd HH:mm:ss.SSSSSS")
    case DateType => date_format(c, "yyyy-MM-dd")
    case _: ArrayType | _: MapType | _: StructType => to_json(c)
    case BinaryType => lower(hex(c))
    case _ => c.cast(StringType)
  }

  /** Every column cast to String with the stable formats above. */
  def stringify(df: DataFrame): DataFrame =
    df.select(df.schema.fields.toIndexedSeq.map(f => stringColumn(col(f.name), f.dataType).as(f.name)): _*)
}
