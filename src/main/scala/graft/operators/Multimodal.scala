package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video payloads ride through the
  * engine as opaque `binary` columns with typed metadata. The Spark
  * plumbing (schemas, projections, chunking, batch shapes) is real and
  * tested; the actual media decode is STUBBED (no codec libraries in
  * this environment) behind [[decodeStub]] — swap in a real decoder by
  * replacing that one function.
  */
object Multimodal {

  /** C12: typed metadata for a binary payload column: byte length,
    * 8-byte header (magic-number window) and a content digest — the
    * columns a 100 TB media pipeline partitions and dedups on without
    * ever decoding.
    */
  def binaryMeta(df: DataFrame, idCol: String, binCol: String): DataFrame =
    df.select(
      col(idCol),
      length(col(binCol)).cast("long").as("byte_len"),
      lower(hex(substring(col(binCol), 1, 8))).as("header_hex"),
      md5(col(binCol)).as("content_md5")
    ).orderBy(col(idCol))

  /** C13: deterministic frame/chunk sampling — frame f starts at byte
    * f*stride, `frameLen` bytes, only complete frames. One generate +
    * projection, no shuffle; cardinality is bounded by maxFrames.
    */
  def frameSample(
      df: DataFrame,
      idCol: String,
      binCol: String,
      frameLen: Int = 16,
      stride: Int = 64,
      maxFrames: Int = 4
  ): DataFrame = {
    val frames = array((0 until maxFrames).map { f =>
      col(binCol).substr(lit(1 + f * stride), lit(frameLen))
    }: _*)
    df.select(col(idCol), length(col(binCol)).as("__len"), posexplode(frames))
      .toDF(idCol, "__len", "frame_idx", "frame")
      .filter(col("__len") >= col("frame_idx") * stride + frameLen)
      .select(col(idCol), col("frame_idx").cast("long").as("frame_idx"), lower(hex(col("frame"))).as("frame_hex"))
      .orderBy(col(idCol), col("frame_idx"))
  }

  /** C22: strided byte downsampling — the "resize" analog expressed on
    * the opaque payload: keep every `stride`-th byte, at most
    * `maxBytes` of them, as lowercase hex. A real image resize swaps
    * the byte stride for a pixel kernel inside the decoder; the
    * Spark-side shape — a pure codegen projection over binary, no
    * shuffle, output bounded per row — is identical.
    */
  def byteResize(
      df: DataFrame,
      idCol: String,
      binCol: String,
      stride: Int = 4,
      maxBytes: Int = 16
  ): DataFrame = {
    val hx = lower(hex(col(binCol)))
    val n = length(col(binCol)).cast("long")
    val sampled = transform(
      sequence(lit(0), lit(maxBytes - 1)),
      i => when(i * stride < n, hx.substr(i * lit(2 * stride) + 1, lit(2)))
    )
    df.select(
      col(idCol),
      n.as("byte_len"),
      array_join(filter(sampled, x => x.isNotNull), "").as("resized_hex")
    ).orderBy(col(idCol))
  }

  /** C43: REAL container-header parsing — unlike [[decodeStub]], this
    * is not a stand-in: it reads the PNG signature and IHDR fields
    * (width, height, bit depth, color type) from the leading bytes of
    * any actual PNG file, as pure codegen'd column expressions
    * (binary substring + hex + base-16 conv — no codec library, no
    * UDF). At 100 TB this is the metadata pass a media pipeline runs
    * BEFORE deciding what to decode: a linear scan emitting a few
    * ints per blob, with full predicate pushdown on the results.
    * Non-PNG payloads come back `is_png = 0` with NULL dims.
    */
  def parsePngMeta(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val b = col(binCol)
    def beInt(offset1Based: Int): Column =
      conv(hex(substring(b, offset1Based, 4)), 16, 10).cast("long")
    def byteAt(offset1Based: Int): Column =
      conv(hex(substring(b, offset1Based, 1)), 16, 10).cast("long")
    val isPng = hex(substring(b, 1, 8)) === "89504E470D0A1A0A" &&
      hex(substring(b, 13, 4)) === "49484452" // IHDR chunk type
    df.select(
      col(idCol),
      when(isPng, 1L).otherwise(0L).as("is_png"),
      when(isPng, beInt(17)).as("width"),
      when(isPng, beInt(21)).as("height"),
      when(isPng, byteAt(25)).as("bit_depth"),
      when(isPng, byteAt(26)).as("color_type")
    ).orderBy(col(idCol))
  }

  /** Deterministic synthetic PNG header bytes (signature + IHDR) for a
    * (width, height) — byte-faithful to the spec, so [[parsePngMeta]]
    * exercises the same parse a real .png file would take.
    */
  def pngHeaderBytes(width: Column, height: Column): Column =
    unhex(concat(
      lit("89504E470D0A1A0A"), // signature
      lit("0000000D"),         // IHDR length = 13
      lit("49484452"),         // "IHDR"
      lpad(hex(width.cast("long")), 8, "0"),
      lpad(hex(height.cast("long")), 8, "0"),
      lit("08"),               // bit depth
      lit("06"),               // color type RGBA
      lit("000000")            // compression, filter, interlace
    ))

  /** Feature row produced by the (stubbed) decoder. */
  case class MediaFeatures(id: Long, width: Int, height: Int, featureNorm: Double)

  /** Decode + feature-extract over binary payloads, partition-parallel.
    * The per-partition batching shape (iterator-to-iterator, no
    * materialization) is exactly what a real decoder needs; only the
    * byte interpretation is fake.
    */
  def decodeStub(spark: SparkSession, df: DataFrame, idCol: String, binCol: String): Dataset[MediaFeatures] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol)).as[(Long, Array[Byte])].mapPartitions { it =>
      it.map { case (id, bytes) =>
        // STUB: a real implementation decodes `bytes` with a codec
        // library. Deterministic fake: derive dims/features from bytes.
        val w = 1 + (math.abs(bytes.length * 31 + (if (bytes.nonEmpty) bytes(0) else 0)) % 1024)
        val h = 1 + (math.abs(bytes.length * 17 + (if (bytes.length > 1) bytes(1) else 0)) % 1024)
        val fn = bytes.take(64).map(b => (b & 0xff).toDouble / 255.0).sum
        MediaFeatures(id, w, h, fn)
      }
    }
  }
}
