package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: images/audio/video ride through the
  * pipeline as opaque `binary` payloads plus a typed metadata struct —
  * the layout a 100 TB media pipeline needs (payload stays columnar
  * parquet, metadata is filterable/prunable without touching bytes).
  *
  * The actual media DECODE step is stubbed deterministically (no
  * image/audio codecs in this environment — see `decodeStub`): the
  * Spark-side plumbing (schema, batching, partition sizing, frame
  * sampling, feature shape) is real and tested; swapping `decodeStub`
  * for a JNI/codec call is a one-function change.
  */
object Multimodal {

  /** Typed metadata carried next to every payload. */
  val metadataSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),   // image|audio|video
    StructField("format", StringType),       // png|jpeg|wav|mp4|…
    StructField("n_bytes", LongType),
    StructField("width", IntegerType),       // images/video
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),    // audio/video
    StructField("checksum", StringType)))

  /** Wrap a binary column into the (payload, metadata) pair. When the
    * payload carries a recognizable container header (PNG/JPEG/GIF/BMP/
    * WAV — all public byte layouts, parsed by `MediaHeaders.probe`, no
    * codecs needed), dimensions/duration/format come from the header;
    * otherwise they fall back to deterministic hash-derived stand-ins so
    * opaque test payloads still get stable metadata.
    */
  def attachMetadata(df: DataFrame, binCol: String, mediaType: String,
      format: String): DataFrame = {
    val b = col(binCol)
    val probed = MediaHeaders.probeUdf(b)
    df.withColumn(s"${binCol}_meta", struct(
      lit(mediaType).as("media_type"),
      coalesce(probed.getField("format"), lit(format)).as("format"),
      length(b).cast(LongType).as("n_bytes"),
      coalesce(probed.getField("width"),
        (pmod(xxhash64(b), lit(1024L)) + 64).cast(IntegerType)).as("width"),
      coalesce(probed.getField("height"),
        (pmod(xxhash64(b, lit(1)), lit(1024L)) + 64).cast(IntegerType)).as("height"),
      coalesce(probed.getField("duration_ms"),
        length(b).cast(LongType) * 8).as("duration_ms"),
      md5(b).as("checksum")))
  }

  /** STUB media decode → fixed-size feature vector. Deterministic: a
    * 16-bucket byte histogram over the payload, normalized. Real
    * pipelines replace this with the codec + model embedding call; the
    * signature (binary → Array[Float]) and the batched execution shape
    * are what the pipeline depends on.
    */
  def decodeStub(payload: Column, buckets: Int = 16): Column = {
    // sample up to 256 evenly-spaced bytes, bucket them — bounded work
    // per row regardless of payload size
    val n = length(payload)
    val sampled = transform(
      sequence(lit(1), least(n, lit(256))),
      i => {
        val pos = ((i - 1) * greatest(n, lit(1)) / least(greatest(n, lit(1)), lit(256))) + 1
        // byte value at pos via 1-byte slice + hash (stand-in for decode)
        pmod(xxhash64(payload.substr(pos, lit(1))), lit(buckets.toLong))
      })
    val hist = transform(sequence(lit(0), lit(buckets - 1)),
      b => (size(filter(sampled, v => v === b.cast(LongType))).cast(FloatType) /
        greatest(size(sampled), lit(1)).cast(FloatType)).cast(FloatType))
    hist
  }

  /** Frame sampling for video-ish payloads: emit `n` evenly spaced
    * byte-slice "frames" per payload, one output row per frame
    * (explode — the real version slices at keyframe offsets).
    */
  def sampleFrames(df: DataFrame, binCol: String, idCol: String,
      n: Int, frameBytes: Int = 1024): DataFrame = {
    val b = col(binCol)
    val len = length(b)
    // integer offset math (floor division) — deterministic and
    // oracle-replicable, no double-rounding ambiguity
    def off(i: Column): Column =
      floor(i.cast(LongType) * greatest(len - frameBytes, lit(1)) /
        lit(math.max(n - 1, 1).toLong)).cast(LongType)
    val frames = transform(sequence(lit(0), lit(n - 1)), i => struct(
      i.as("frame_idx"),
      off(i).as("offset"),
      b.substr((off(i) + 1).cast(IntegerType), lit(frameBytes)).as("frame")))
    df.select(col(idCol), explode(frames).as("__f"))
      .select(col(idCol), col("__f.frame_idx").as("frame_idx"),
        col("__f.offset").as("offset"), col("__f.frame").as("frame"))
  }

  /** Resize stub: re-bucket the feature histogram to a new width —
    * keeps the (payload → features) contract shape for downstream ops.
    */
  def resizeFeatures(features: Column, newSize: Int): Column =
    transform(sequence(lit(0), lit(newSize - 1)), i =>
      element_at(features,
        (i * size(features) / lit(newSize)) + 1))
}

/** Container-header byte-peeking for the common public media formats —
  * dimensions and duration straight from the header bytes, no codec
  * libraries. Layouts: PNG IHDR, JPEG SOFn markers, GIF logical screen
  * descriptor, BMP info header, WAV/RIFF fmt+data chunks.
  */
object MediaHeaders {
  /** (format, width, height, durationMs) — nulls where not applicable;
    * null overall when no known signature matches. */
  case class Probe(format: String, width: Integer, height: Integer,
      duration_ms: java.lang.Long)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Long =
    (be16(b, i).toLong << 16) | be16(b, i + 2)
  private def le32(b: Array[Byte], i: Int): Long =
    le16(b, i).toLong | (le16(b, i + 2).toLong << 16)
  private def ascii(b: Array[Byte], i: Int, n: Int): String =
    if (i >= 0 && i + n <= b.length) new String(b, i, n, "US-ASCII") else ""

  def probe(b: Array[Byte]): Probe = {
    if (b == null || b.length < 12) return null
    // PNG: 8-byte signature, then IHDR chunk: len(4) "IHDR" w(4,BE) h(4,BE)
    if (b.length >= 24 && u8(b, 0) == 0x89 && ascii(b, 1, 3) == "PNG" &&
        ascii(b, 12, 4) == "IHDR")
      return Probe("png", be32(b, 16).toInt, be32(b, 20).toInt, null)
    // GIF87a/GIF89a: logical screen w/h as LE16 at 6/8
    if (ascii(b, 0, 3) == "GIF")
      return Probe("gif", le16(b, 6), le16(b, 8), null)
    // BMP: "BM", BITMAPINFOHEADER width LE32 @18, height LE32 @22
    if (b.length >= 26 && ascii(b, 0, 2) == "BM")
      return Probe("bmp", le32(b, 18).toInt, math.abs(le32(b, 22).toInt), null)
    // JPEG: FF D8, then marker walk to SOFn (C0-CF minus C4/C8/CC):
    // marker FF xx, len(2,BE), precision(1), height(2,BE), width(2,BE)
    if (u8(b, 0) == 0xff && u8(b, 1) == 0xd8) {
      var p = 2
      while (p + 9 < b.length && u8(b, p) == 0xff) {
        val m = u8(b, p + 1)
        if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc)
          return Probe("jpeg", be16(b, p + 7), be16(b, p + 5), null)
        if (m == 0xd8 || (m >= 0xd0 && m <= 0xd9)) p += 2
        else p += 2 + be16(b, p + 2)
      }
      return Probe("jpeg", null, null, null)
    }
    // WAV: RIFF....WAVE, then chunk walk; duration = dataBytes/byteRate
    if (ascii(b, 0, 4) == "RIFF" && ascii(b, 8, 4) == "WAVE") {
      var p = 12
      var byteRate = 0L
      var dataLen = -1L
      while (p + 8 <= b.length) {
        val id = ascii(b, p, 4)
        val len = le32(b, p + 4) // unsigned 32-bit — may exceed Int.MaxValue
        if (id == "fmt " && p + 20 <= b.length) byteRate = le32(b, p + 16)
        if (id == "data") dataLen = len
        // stop on a declared length that walks past the buffer (or
        // would wrap negative as an Int) — malformed/truncated input
        val step = 8L + len + (len & 1L) // chunks are word-aligned
        if (p + step > b.length) p = b.length else p += step.toInt
      }
      val dur: java.lang.Long =
        if (byteRate > 0 && dataLen >= 0) dataLen * 1000L / byteRate else null
      return Probe("wav", null, null, dur)
    }
    null
  }

  val probeUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf(probe _)
}
