package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Document flattening — the reference's core transform
  * (es_to_bytehouse.py:544-575 `flatten_document`,
  * es_to_bytehouse.py:275-294 `flatten_mapping`), re-expressed as a
  * schema-driven projection so it compiles to a single codegen'd
  * select (no per-row interpretation, no shuffle).
  *
  * Semantics matched to the reference:
  *   - nested object fields become `parent_child` columns
  *   - arrays (scalar or object) become compact JSON strings
  *   - names are sanitized: `.`/`-` → `_`, `@` stripped, names that
  *     start with a digit get a prefix (es_to_bytehouse.py:738-745)
  */
object Flatten {

  /** Reference name cleanup: `.`/`-`→`_`, `@` removed, digit-leading
    * names prefixed (`sanitize_table_name` uses `idx_`; we use it for
    * columns too).
    */
  def sanitizeName(raw: String): String = {
    val cleaned = raw.replace(".", "_").replace("-", "_").replace("$", "_").replace("@", "")
    if (cleaned.nonEmpty && cleaned.head.isDigit) s"idx_$cleaned" else cleaned
  }

  /** Flattened column list for a schema (pure metadata — no jobs). */
  private def flatCols(schema: StructType, parent: Column, prefix: String): Seq[(String, Column)] =
    schema.fields.toIndexedSeq.flatMap { f =>
      val name = sanitizeName(if (prefix.isEmpty) f.name else s"${prefix}_${f.name}")
      val child = parent.getField(f.name)
      f.dataType match {
        case st: StructType => flatCols(st, child, name)
        case _: ArrayType | _: MapType => Seq(name -> to_json(child).as(name))
        case _ => Seq(name -> child.as(name))
      }
    }

  /** Flatten every struct column of `df` (non-struct columns pass
    * through with sanitized names). Arrays/maps become JSON strings.
    */
  def flatten(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.toIndexedSeq.flatMap { f =>
      val name = sanitizeName(f.name)
      f.dataType match {
        case st: StructType => flatCols(st, col(f.name), name).map(_._2)
        case _: ArrayType | _: MapType => Seq(to_json(col(f.name)).as(name))
        case _ => Seq(col(f.name).as(name))
      }
    }
    df.select(cols: _*)
  }

  /** Shallow flatten — the MongoDB-variant semantics
    * (mongodb_to_bytehouse.py:306-333 `flatten_document`): nested
    * objects and arrays become JSON strings at depth 1 instead of
    * recursing into `parent_child` columns.
    */
  def flattenShallow(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.toIndexedSeq.map { f =>
      val name = sanitizeName(f.name)
      f.dataType match {
        case _: StructType | _: ArrayType | _: MapType => to_json(col(f.name)).as(name)
        case _ => col(f.name).as(name)
      }
    }
    df.select(cols: _*)
  }

  /** Reference-compat indexed expansion of an array-of-struct column:
    * `field_0_key, field_1_key, ...` for the first `n` elements
    * (es_to_bytehouse.py:556-565). Bounded n keeps the projection
    * static — unbounded per-row widths don't exist in a columnar
    * engine, by design.
    */
  def expandArray(df: DataFrame, arrayCol: String, n: Int): DataFrame = {
    val elemType = df.schema(arrayCol).dataType match {
      case ArrayType(st: StructType, _) => st
      case other => throw new IllegalArgumentException(s"$arrayCol is $other, need array<struct>")
    }
    val expanded = (0 until n).flatMap { i =>
      elemType.fields.map { f =>
        get(col(arrayCol), lit(i)).getField(f.name).as(sanitizeName(s"${arrayCol}_${i}_${f.name}"))
      }
    }
    df.select(df.columns.filterNot(_ == arrayCol).map(col).toIndexedSeq ++ expanded: _*)
  }
}
