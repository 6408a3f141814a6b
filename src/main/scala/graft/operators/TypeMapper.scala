package graft.operators

import org.apache.spark.sql.types._

/** Type mapping between engines.
  *
  * The reference maps every ES type to String
  * (es_to_bytehouse.py:164-188) to dodge conversion bugs; that throws
  * away pushdown, compression and vectorization at scale, so graft
  * keeps real types and defines the faithful mapping instead (the
  * all-String mode still exists as [[AllString]]).
  */
object TypeMapper {

  /** Spark type → ClickHouse column type (for target DDL). */
  def clickhouseType(dt: DataType): String = dt match {
    case ByteType => "Int8"
    case ShortType => "Int16"
    case IntegerType => "Int32"
    case LongType => "Int64"
    case FloatType => "Float32"
    case DoubleType => "Float64"
    case BooleanType => "UInt8"
    case StringType => "String"
    case BinaryType => "String"
    case DateType => "Date32"
    case TimestampType | TimestampNTZType => "DateTime64(6)"
    case d: DecimalType => s"Decimal(${d.precision}, ${d.scale})"
    case ArrayType(et, _) => s"Array(${clickhouseType(et)})"
    case _: StructType | _: MapType => "String" // serialized as JSON, like the reference
    case other => throw new IllegalArgumentException(s"unmapped type: $other")
  }

  /** ES mapping type → Spark type (ingest direction). The reference
    * collapses these to String; graft preserves semantics.
    */
  def esType(es: String): DataType = es match {
    case "keyword" | "text" | "match_only_text" | "constant_keyword" | "ip" | "binary" => StringType
    case "long" => LongType
    case "integer" | "short" | "byte" => IntegerType
    case "double" | "float" | "half_float" | "scaled_float" => DoubleType
    case "boolean" => BooleanType
    case "date" => TimestampType
    case _ => StringType // nested/object/geo → JSON string
  }
}
