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

  /** ClickHouse column type → Spark type (source-read direction, the
    * DESCRIBE-TABLE pendant of [[clickhouseType]] for the
    * clickhouse_to_bytehouse flow: schema discovery on a CH source,
    * ref clickhouse_to_bytehouse.py:236-239 `get_table_schema`).
    * Wrappers (`Nullable`, `LowCardinality`) unwrap recursively —
    * Spark fields are nullable by default so Nullable carries no
    * extra information on this side.
    */
  def chType(ch: String): DataType = {
    val t = ch.trim
    def inner(prefix: String): String =
      t.stripPrefix(prefix).stripSuffix(")")
    if (t.startsWith("Nullable(")) chType(inner("Nullable("))
    else if (t.startsWith("LowCardinality(")) chType(inner("LowCardinality("))
    else if (t.startsWith("Array(")) ArrayType(chType(inner("Array(")))
    else if (t.startsWith("Decimal(")) {
      val ps = inner("Decimal(").split(",").map(_.trim.toInt)
      DecimalType(ps(0), ps(1))
    } else if (t.startsWith("DateTime64") || t.startsWith("DateTime")) TimestampType
    else if (t.startsWith("FixedString(")) StringType
    else t match {
      case "Int8" => ByteType
      case "Int16" => ShortType
      case "Int32" | "UInt8" | "UInt16" => IntegerType
      case "Int64" | "UInt32" | "UInt64" => LongType
      case "Float32" => FloatType
      case "Float64" => DoubleType
      case "Bool" => BooleanType
      case "Date" | "Date32" => DateType
      case "String" | "UUID" | "IPv4" | "IPv6" => StringType
      case other => throw new IllegalArgumentException(s"unmapped ClickHouse type: $other")
    }
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
