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
  /** Per-doc outputs take `sorted = true` only for deterministic
    * correctness-gate dumps: a global sort of corpus-cardinality output
    * is the most expensive operator in the plan at scale and carries no
    * semantics — production callers pass `sorted = false`.
    */
  private def gateSort(df: DataFrame, sorted: Boolean, by: Column*): DataFrame =
    if (sorted) df.orderBy(by: _*) else df

  def binaryMeta(df: DataFrame, idCol: String, binCol: String, sorted: Boolean = true): DataFrame =
    gateSort(df.select(
      col(idCol),
      length(col(binCol)).cast("long").as("byte_len"),
      lower(hex(substring(col(binCol), 1, 8))).as("header_hex"),
      md5(col(binCol)).as("content_md5")
    ), sorted, col(idCol))

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
      maxFrames: Int = 4,
      sorted: Boolean = true
  ): DataFrame = {
    val frames = array((0 until maxFrames).map { f =>
      col(binCol).substr(lit(1 + f * stride), lit(frameLen))
    }: _*)
    gateSort(
      df.select(col(idCol), length(col(binCol)).as("__len"), posexplode(frames))
        .toDF(idCol, "__len", "frame_idx", "frame")
        .filter(col("__len") >= col("frame_idx") * stride + frameLen)
        .select(col(idCol), col("frame_idx").cast("long").as("frame_idx"), lower(hex(col("frame"))).as("frame_hex")),
      sorted, col(idCol), col("frame_idx"))
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
      maxBytes: Int = 16,
      sorted: Boolean = true
  ): DataFrame = {
    val n = length(col(binCol)).cast("long")
    // Hex only the sampled 1-byte slice inside the lambda. Referencing a
    // full-payload hex() column here would inline it into the transform
    // lambda and re-evaluate it once per element (maxBytes x per row) —
    // the defect class fixed for dup_ngram_mass in f7d437c.
    val sampled = transform(
      sequence(lit(0), lit(maxBytes - 1)),
      i => when(i * stride < n, lower(hex(col(binCol).substr(i * stride + 1, lit(1)))))
    )
    gateSort(df.select(
      col(idCol),
      n.as("byte_len"),
      array_join(filter(sampled, x => x.isNotNull), "").as("resized_hex")
    ), sorted, col(idCol))
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
  def parsePngMeta(df: DataFrame, idCol: String, binCol: String, sorted: Boolean = true): DataFrame = {
    val b = col(binCol)
    def beInt(offset1Based: Int): Column =
      conv(hex(substring(b, offset1Based, 4)), 16, 10).cast("long")
    def byteAt(offset1Based: Int): Column =
      conv(hex(substring(b, offset1Based, 1)), 16, 10).cast("long")
    val isPng = hex(substring(b, 1, 8)) === "89504E470D0A1A0A" &&
      hex(substring(b, 13, 4)) === "49484452" // IHDR chunk type
    gateSort(df.select(
      col(idCol),
      when(isPng, 1L).otherwise(0L).as("is_png"),
      when(isPng, beInt(17)).as("width"),
      when(isPng, beInt(21)).as("height"),
      when(isPng, byteAt(25)).as("bit_depth"),
      when(isPng, byteAt(26)).as("color_type")
    ), sorted, col(idCol))
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

  /** Little-endian unsigned int read from `nBytes` bytes at 1-based
    * `offset` of a binary column — per-byte conv + positional weights
    * (RIFF/WAV fields are little-endian; hex+conv alone reads BE).
    */
  private def leUint(b: Column, offset: Int, nBytes: Int): Column =
    (0 until nBytes).map { i =>
      conv(hex(substring(b, offset + i, 1)), 16, 10).cast("long") * (1L << (8 * i))
    }.reduce(_ + _)

  /** C46: REAL WAV/RIFF header parsing — the audio pendant of
    * [[parsePngMeta]]: RIFF/WAVE/fmt signatures checked, then
    * channels, sample rate and bit depth decoded from the canonical
    * PCM fmt chunk (little-endian, hence [[leUint]]) — all pure
    * codegen column expressions, no codec, no UDF. Assumes the
    * canonical fmt-first layout (what encoders including the JDK
    * write) and rejects anything else via the explicit "fmt " check.
    */
  def parseWavMeta(df: DataFrame, idCol: String, binCol: String, sorted: Boolean = true): DataFrame = {
    val b = col(binCol)
    val isWav = hex(substring(b, 1, 4)) === "52494646" && // "RIFF"
      hex(substring(b, 9, 4)) === "57415645" &&           // "WAVE"
      hex(substring(b, 13, 4)) === "666D7420"             // "fmt "
    gateSort(df.select(
      col(idCol),
      when(isWav, 1L).otherwise(0L).as("is_wav"),
      when(isWav, leUint(b, 23, 2)).as("n_channels"),
      when(isWav, leUint(b, 25, 4)).as("sample_rate"),
      when(isWav, leUint(b, 35, 2)).as("bits_per_sample")
    ), sorted, col(idCol))
  }

  /** Little-endian hex string of `v` over `nBytes` bytes (staging
    * helper for byte-faithful synthetic WAV headers).
    */
  private def leHex(v: Column, nBytes: Int): Column =
    concat((0 until nBytes).map(i =>
      lpad(hex(shiftright(v.cast("long"), 8 * i).bitwiseAND(lit(255L))), 2, "0")): _*)

  /** Deterministic synthetic WAV header bytes (RIFF + canonical PCM
    * fmt chunk) — byte-faithful, so [[parseWavMeta]] takes the same
    * parse path a real .wav file does.
    */
  def wavHeaderBytes(channels: Column, sampleRate: Column, bits: Column): Column =
    unhex(concat(
      lit("52494646"), lit("00000000"), // "RIFF" + size (unused here)
      lit("57415645"), lit("666D7420"), // "WAVE" + "fmt "
      lit("10000000"), lit("0100"),     // fmt size 16 LE, PCM = 1 LE
      leHex(channels, 2),
      leHex(sampleRate, 4),
      lit("00000000"), lit("0000"),     // byte rate + block align (unused)
      leHex(bits, 2)
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
