package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: images/audio/video ride through the
  * pipeline as opaque `binary` payloads plus a typed metadata struct —
  * the layout a 100 TB media pipeline needs (payload stays columnar
  * parquet, metadata is filterable/prunable without touching bytes).
  *
  * Decode status: header metadata (dims/duration/format) is REAL for
  * PNG/JPEG/GIF/BMP/WAV/MP4/MP3 ([[MediaHeaders.probe]]), and audio
  * sample decode is REAL for PCM WAV ([[MediaHeaders.wavStats]] —
  * pure byte layout, no codec needed). Image PIXEL decode is REAL for
  * PNG ([[MediaHeaders.pngDecode]] — inflate + unfilter) and GIF
  * ([[MediaHeaders.gifDecode]] — LZW + palette + interlace); JPEG and
  * video FRAME decode remain a deterministic stub (DCT/codec
  * implementations aren't in this environment — see `decodeStub`):
  * the Spark-side plumbing (schema, batching, partition sizing, frame
  * sampling, feature shape) is real and tested either way.
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
    * WAV/MP4/MP3 — all public byte layouts, parsed by `MediaHeaders.probe`, no
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

  /** Image feature vector: REAL pixel decode for PNG and GIF payloads
    * ([[MediaHeaders.pngFeatures]]/[[MediaHeaders.gifFeatures]] —
    * channel means + luminance histogram from the actual decoded
    * image), deterministic [[decodeStub]] for formats whose codecs
    * aren't available (JPEG/video). Same (binary -> Array[Float])
    * contract either way, so downstream ANN/clustering ops don't care
    * which path fed them.
    */
  def imageFeatures(payload: Column, buckets: Int = 16): Column = {
    val real = udf((b: Array[Byte]) => {
      val png = MediaHeaders.pngFeatures(b, buckets)
      if (png != null) png
      else {
        val gif = MediaHeaders.gifFeatures(b, buckets)
        if (gif != null) gif
        else {
          val bmp = MediaHeaders.bmpFeatures(b, buckets)
          if (bmp != null) bmp else MediaHeaders.jpegFeatures(b, buckets)
        }
      }
    })
    coalesce(real(payload), decodeStub(payload, buckets))
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

  /** REAL container-level frame access for MP4 payloads: one row per
    * sample at the exact offsets the stsz/stsc/stco tables declare,
    * with keyframe flags from stss — the unit a video pipeline feeds
    * to a codec. (The byte-slice [[sampleFrames]] stays for opaque
    * formats.) Decoding the sample bytes themselves needs a codec and
    * remains out of scope.
    */
  def sampleFramesMp4(df: DataFrame, binCol: String,
      idCol: String, keyframesOnly: Boolean = false): DataFrame = {
    val framesUdf = udf((b: Array[Byte]) =>
      MediaHeaders.mp4Samples(b).collect {
        case s if s.offset >= 0 && s.offset + s.size <= b.length =>
          Mp4Frame(s.index, s.offset, s.size, s.keyframe,
            java.util.Arrays.copyOfRange(
              b, s.offset.toInt, (s.offset + s.size).toInt), s.timestamp)
      })
    val exploded = df
      .select(col(idCol), explode(framesUdf(col(binCol))).as("__f"))
      .select(col(idCol), col("__f.sample_idx").as("sample_idx"),
        col("__f.offset").as("offset"), col("__f.size").as("size"),
        col("__f.keyframe").as("keyframe"), col("__f.frame").as("frame"),
        col("__f.timestamp").as("timestamp"))
    if (keyframesOnly) exploded.where(col("keyframe")) else exploded
  }

  case class Mp4Frame(sample_idx: Int, offset: Long, size: Long,
      keyframe: Boolean, frame: Array[Byte], timestamp: Long = -1L)

  /** REAL container-level frame access for Matroska/WebM payloads —
    * the second major web video container, parallel to
    * [[sampleFramesMp4]]: one row per (Simple)Block frame at the
    * exact offsets the Cluster walk yields, with keyframe flags from
    * the SimpleBlock flag bit / ReferenceBlock absence and the
    * decoded cluster-relative timestamp. Map-only explode — the same
    * scale shape as the MP4 path.
    */
  def sampleFramesWebm(df: DataFrame, binCol: String,
      idCol: String, keyframesOnly: Boolean = false): DataFrame = {
    val framesUdf = udf((b: Array[Byte]) =>
      MediaHeaders.webmSamples(b).collect {
        case s if s.offset >= 0 && s.offset + s.size <= b.length =>
          WebmFrame(s.index, s.track, s.timestamp, s.offset, s.size,
            s.keyframe,
            java.util.Arrays.copyOfRange(
              b, s.offset.toInt, (s.offset + s.size).toInt))
      })
    val exploded = df
      .select(col(idCol), explode(framesUdf(col(binCol))).as("__f"))
      .select(col(idCol), col("__f.sample_idx").as("sample_idx"),
        col("__f.track").as("track"),
        col("__f.timestamp").as("timestamp"),
        col("__f.offset").as("offset"), col("__f.size").as("size"),
        col("__f.keyframe").as("keyframe"), col("__f.frame").as("frame"))
    if (keyframesOnly) exploded.where(col("keyframe")) else exploded
  }

  case class WebmFrame(sample_idx: Int, track: Long, timestamp: Long,
      offset: Long, size: Long, keyframe: Boolean, frame: Array[Byte])

  /** Subtitle cues embedded in Matroska/WebM containers (S_TEXT
    * tracks) as rows — the MKV leg of the subtitle story next to the
    * SRT/VTT parsers: one row per cue with cluster-absolute start,
    * BlockDuration, and UTF-8 text. Map-only explode.
    */
  def extractWebmSubtitles(df: DataFrame, binCol: String,
      idCol: String): DataFrame = {
    val cuesUdf = udf((b: Array[Byte]) => MediaHeaders.webmSubtitles(b))
    df.select(col(idCol), explode(cuesUdf(col(binCol))).as("__c"))
      .select(col(idCol), col("__c.track").as("track"),
        col("__c.start").as("start_ms"),
        col("__c.duration").as("duration_ms"),
        col("__c.text").as("text"))
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
  * descriptor, BMP info header, WAV/RIFF fmt+data chunks, MP4/ISO-BMFF
  * mvhd+tkhd boxes, MP3 frame headers (after an ID3v2 skip).
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
    // GIF87a/GIF89a: logical screen w/h as LE16 at 6/8; ANIMATED gifs
    // additionally report duration = the sum of the Graphic Control
    // Extension delays (centiseconds) across frames — the block walk
    // skips color tables and LZW sub-blocks by their declared sizes
    if (ascii(b, 0, 3) == "GIF") {
      val w = le16(b, 6); val h = le16(b, 8)
      var dur: java.lang.Long = null
      if (b.length >= 14) {
        var p = 13
        if ((u8(b, 10) & 0x80) != 0) p += 3 * (1 << ((u8(b, 10) & 7) + 1))
        var frames = 0
        var delayCs = 0L
        def skipSubBlocks(from: Int): Int = {
          var q = from
          while (q < b.length && u8(b, q) != 0) q += 1 + u8(b, q)
          q + 1
        }
        var halt = false
        while (!halt && p + 1 < b.length) {
          u8(b, p) match {
            case 0x21 => // extension: label + sub-blocks
              if (u8(b, p + 1) == 0xf9 && p + 7 < b.length &&
                u8(b, p + 2) == 4)
                delayCs += le16(b, p + 4)
              p = skipSubBlocks(p + 2)
            case 0x2c => // image descriptor (+ local table + LZW data)
              frames += 1
              if (p + 10 >= b.length) halt = true
              else {
                var q = p + 10
                if ((u8(b, p + 9) & 0x80) != 0)
                  q += 3 * (1 << ((u8(b, p + 9) & 7) + 1))
                p = skipSubBlocks(q + 1) // +1: LZW min code size byte
              }
            case 0x3b => halt = true // trailer
            case _ => halt = true // malformed: keep what we counted
          }
        }
        if (frames >= 2 && delayCs > 0) dur = delayCs * 10L
      }
      return Probe("gif", w, h, dur)
    }
    // BMP: "BM", BITMAPINFOHEADER width LE32 @18, height LE32 @22
    if (b.length >= 26 && ascii(b, 0, 2) == "BM")
      return Probe("bmp", le32(b, 18).toInt, math.abs(le32(b, 22).toInt), null)
    // TIFF: "II*\0" (little-endian) or "MM\0*" (big-endian), IFD0
    // offset at 4; IFD = count(2) + count x 12-byte entries of
    // tag(2) type(2) count(4) value(4, left-justified inline when it
    // fits). Dimensions are tags 256 (ImageWidth) / 257 (ImageLength),
    // stored as SHORT (type 3) or LONG (type 4). Layout: TIFF 6.0.
    if ((ascii(b, 0, 2) == "II" && u8(b, 2) == 0x2a && u8(b, 3) == 0) ||
        (ascii(b, 0, 2) == "MM" && u8(b, 2) == 0 && u8(b, 3) == 0x2a)) {
      val le = u8(b, 0) == 'I'
      def r16(i: Int): Int = if (le) le16(b, i) else be16(b, i)
      def r32(i: Int): Long = if (le) le32(b, i) else be32(b, i)
      var w: Integer = null
      var h: Integer = null
      val ifd = r32(4)
      if (ifd >= 8 && ifd + 2 <= b.length) {
        val n = r16(ifd.toInt)
        var e = 0
        while (e < n && ifd + 2 + (e + 1) * 12 <= b.length) {
          val off = (ifd + 2 + e * 12).toInt
          val tag = r16(off)
          if (tag == 256 || tag == 257) {
            val typ = r16(off + 2)
            // a (rare but legal) count > 1 stores an OFFSET in the
            // value field — reporting it as the dimension would be
            // garbage, so only accept the inline single value
            val cnt = r32(off + 4)
            // inline value, left-justified: SHORT reads the first
            // two value bytes, LONG all four
            val v: Long =
              if (cnt != 1L) -1L
              else if (typ == 3) r16(off + 8).toLong
              else if (typ == 4) r32(off + 8)
              else -1L
            if (v >= 0 && v <= Int.MaxValue) {
              if (tag == 256) w = v.toInt else h = v.toInt
            }
          }
          e += 1
        }
      }
      return Probe("tiff", w, h, null)
    }
    // WebP: RIFF container, "WEBP" form at 8, first chunk at 12 —
    // "VP8 " (lossy: 3-byte frame tag, 9D 01 2A sync, 14-bit LE w/h),
    // "VP8L" (lossless: 2F signature, two packed 14-bit minus-one
    // fields), or "VP8X" (extended: 24-bit LE canvas minus-one).
    // Layout: Google WebP container + VP8/VP8L bitstream specs.
    if (b.length >= 16 && ascii(b, 0, 4) == "RIFF" && ascii(b, 8, 4) == "WEBP") {
      val chunk = ascii(b, 12, 4)
      if (chunk == "VP8 " && b.length >= 30 && u8(b, 23) == 0x9d &&
          u8(b, 24) == 0x01 && u8(b, 25) == 0x2a)
        return Probe("webp", le16(b, 26) & 0x3fff, le16(b, 28) & 0x3fff, null)
      if (chunk == "VP8L" && b.length >= 25 && u8(b, 20) == 0x2f) {
        val bits = le32(b, 21)
        val w = ((bits & 0x3fff) + 1).toInt
        val h = (((bits >> 14) & 0x3fff) + 1).toInt
        return Probe("webp", w, h, null)
      }
      if (chunk == "VP8X" && b.length >= 30) {
        val w = (le16(b, 24) | (u8(b, 26) << 16)) + 1
        val h = (le16(b, 27) | (u8(b, 29) << 16)) + 1
        return Probe("webp", w, h, null)
      }
      return Probe("webp", null, null, null)
    }
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
    // MP4 / ISO BMFF: size(4,BE) "ftyp" at offset 0; walk top-level
    // boxes to moov, then moov children: mvhd (timescale+duration →
    // duration_ms) and trak/tkhd (16.16 fixed-point width/height of
    // the first visual track). Public layout: ISO/IEC 14496-12.
    // HEIF-family still images ride the ISO-BMFF container too: the
    // ftyp MAJOR BRAND distinguishes them from video mp4, and the
    // dimensions live in meta/iprp/ipco/ispe (ISO 23008-12), not tkhd.
    // meta is a FULL box (4 bytes version/flags before children).
    if (ascii(b, 4, 4) == "ftyp" && b.length >= 12 && {
      val brand = ascii(b, 8, 4)
      brand == "heic" || brand == "heix" || brand == "avif" ||
        brand == "avis" || brand == "mif1"
    }) {
      val fmt = ascii(b, 8, 4) match {
        case "avif" | "avis" => "avif"
        case _ => "heic"
      }
      var w: Integer = null
      var h: Integer = null
      def walk(from: Long, to: Long, depth: Int): Unit = {
        var p = from
        while (p + 8 <= to && depth < 8 && w == null) {
          var size = be32(b, p.toInt)
          val id = ascii(b, p.toInt + 4, 4)
          var hdr = 8L
          if (size == 1 && p + 16 <= to) {
            size = (be32(b, p.toInt + 8) << 32) | be32(b, p.toInt + 12)
            hdr = 16L
          } else if (size == 0) size = to - p
          if (size < hdr) return
          val end = math.min(p + size, to)
          id match {
            case "meta" => walk(p + hdr + 4, end, depth + 1) // full box
            case "iprp" | "ipco" => walk(p + hdr, end, depth + 1)
            case "ispe" if p + hdr + 12 <= to =>
              // full box: version/flags, then width/height BE32
              w = be32(b, (p + hdr + 4).toInt).toInt
              h = be32(b, (p + hdr + 8).toInt).toInt
            case _ => ()
          }
          p = end
        }
      }
      walk(0L, b.length.toLong, 0)
      return Probe(fmt, w, h, null)
    }
    if (ascii(b, 4, 4) == "ftyp") {
      var durMs: java.lang.Long = null
      var w: Integer = null
      var h: Integer = null
      def walk(from: Long, to: Long, depth: Int): Unit = {
        var p = from
        while (p + 8 <= to && depth < 6) {
          var size = be32(b, p.toInt)
          val id = ascii(b, p.toInt + 4, 4)
          var hdr = 8L
          if (size == 1 && p + 16 <= to) { // 64-bit largesize
            size = (be32(b, p.toInt + 8) << 32) | be32(b, p.toInt + 12)
            hdr = 16L
          } else if (size == 0) size = to - p // box runs to end
          if (size < hdr) return // malformed
          val end = math.min(p + size, to)
          id match {
            case "moov" | "trak" => walk(p + hdr, end, depth + 1)
            case "mvhd" if p + hdr + 20 <= to =>
              val v = u8(b, (p + hdr).toInt)
              // a truncated v1 box must NOT fall through to the v0
              // offsets — those bytes are halves of the 64-bit
              // creation/modification timestamps, not timescale/duration
              if (v == 1) {
                if (p + hdr + 32 <= to) {
                  val ts = be32(b, (p + hdr + 20).toInt)
                  val dur = (be32(b, (p + hdr + 24).toInt) << 32) |
                    be32(b, (p + hdr + 28).toInt)
                  if (ts > 0) durMs = dur * 1000L / ts
                }
              } else {
                val ts = be32(b, (p + hdr + 12).toInt)
                val dur = be32(b, (p + hdr + 16).toInt)
                if (ts > 0) durMs = dur * 1000L / ts
              }
            case "tkhd" if p + hdr + 1 <= to =>
              val v = u8(b, (p + hdr).toInt)
              val wOff = p + hdr + (if (v == 1) 88 else 76)
              if (w == null && wOff + 8 <= to) {
                val tw = (be32(b, wOff.toInt) >> 16).toInt // 16.16 fixed
                val th = (be32(b, (wOff + 4).toInt) >> 16).toInt
                if (tw > 0 && th > 0) { w = tw; h = th }
              }
            case _ => ()
          }
          p = end
        }
      }
      walk(0L, b.length.toLong, 0)
      return Probe("mp4", w, h, durMs)
    }
    // MP3: optional ID3v2 (10-byte header, syncsafe size), then the
    // first MPEG audio frame header: duration estimated from the CBR
    // bitrate over the remaining payload bytes (spec tables, MPEG-1/2
    // Layer III — ISO/IEC 11172-3 / 13818-3).
    {
      var p = 0
      if (ascii(b, 0, 3) == "ID3" && b.length >= 10) {
        val sz = (u8(b, 6) << 21) | (u8(b, 7) << 14) | (u8(b, 8) << 7) | u8(b, 9)
        // ID3v2.4 footer flag (header flags bit 0x10): the tag is
        // header(10) + data(size) + footer(10) — without the extra 10
        // the sync check lands on the footer's "3DI" magic
        val footer = if ((u8(b, 5) & 0x10) != 0) 10 else 0
        p = 10 + sz + footer
      }
      // trailing ID3v1 tag (fixed 128 bytes, "TAG" magic) is metadata,
      // not audio payload — exclude it from the CBR duration estimate
      val payloadEnd =
        if (b.length >= 128 && ascii(b, b.length - 128, 3) == "TAG")
          b.length - 128
        else b.length
      if (p + 4 <= b.length && u8(b, p) == 0xff && (u8(b, p + 1) & 0xe0) == 0xe0) {
        val verBits = (u8(b, p + 1) >> 3) & 0x3   // 3=MPEG1, 2=MPEG2, 0=MPEG2.5
        val layerBits = (u8(b, p + 1) >> 1) & 0x3 // 1=Layer III
        if (layerBits == 1 && verBits != 1) {
          // index 15 is the spec's 'bad' bitrate — present in corrupt
          // and some truncated files; treat like 'free' (no duration)
          val idx = (u8(b, p + 2) >> 4) & 0xf
          val kbps =
            if (idx >= 15) 0
            else if (verBits == 3) // MPEG-1 Layer III
              Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128,
                160, 192, 224, 256, 320)(idx)
            else // MPEG-2/2.5 Layer III
              Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80,
                96, 112, 128, 144, 160)(idx)
          val dur: java.lang.Long =
            if (kbps > 0) (payloadEnd - p).toLong * 8L / kbps else null
          return Probe("mp3", null, null, dur)
        }
      }
    }
    // Matroska/WebM: EBML header 1A 45 DF A3. Elements are (vint id —
    // marker bit kept, vint size — marker bit cleared) pairs; DocType
    // (0x4282) names the container, Segment (0x18538067) → Info
    // (0x1549A966) carries TimestampScale (0x2AD7B1, ns/unit, default
    // 1,000,000) and Duration (0x4489, float in scale units) →
    // duration_ms. Public layout: RFC 8794 (EBML) + the Matroska spec.
    // Unknown-size elements (all-ones size vint — streamed WebM's
    // Segment) walk to the enclosing bound.
    if (u8(b, 0) == 0x1a && u8(b, 1) == 0x45 && u8(b, 2) == 0xdf &&
        u8(b, 3) == 0xa3) {
      // (value, width) of the vint at p, or null when malformed
      def vint(p: Int, keepMarker: Boolean): (Long, Int) = {
        if (p >= b.length) return null
        val fb = u8(b, p)
        if (fb == 0) return null // width > 8: not used by real files
        val w = Integer.numberOfLeadingZeros(fb) - 24 + 1
        if (p + w > b.length) return null
        var v: Long = if (keepMarker) fb.toLong else (fb & (0xff >>> w)).toLong
        var k = 1
        while (k < w) { v = (v << 8) | u8(b, p + k); k += 1 }
        (v, w)
      }
      def beUint(off: Int, len: Int): Long = {
        var v = 0L; var k = 0
        while (k < len) { v = (v << 8) | u8(b, off + k); k += 1 }
        v
      }
      var docType: String = null
      var scale = 1000000L
      var durUnits: java.lang.Double = null
      def walk(from: Int, to: Int, depth: Int): Unit = {
        var p = from
        var ok = true
        while (ok && p < to && depth < 8) {
          val idv = vint(p, keepMarker = true)
          if (idv == null) ok = false
          else {
            val sv = vint(p + idv._2, keepMarker = false)
            if (sv == null) ok = false
            else {
              val dataStart = p + idv._2 + sv._2
              // all-ones payload size = unknown: runs to the bound
              val unknown = sv._1 == (1L << (7 * sv._2)) - 1
              val end =
                if (unknown) to
                else math.min(dataStart + sv._1, to.toLong).toInt
              if (dataStart > to) ok = false
              else {
                idv._1 match {
                  case 0x1A45DFA3L | 0x18538067L | 0x1549A966L =>
                    walk(dataStart, end, depth + 1) // container elements
                  case 0x4282L =>
                    docType = ascii(b, dataStart, (end - dataStart))
                      .takeWhile(_ != '\u0000') // strings may be NUL-padded
                  case 0x2AD7B1L if end - dataStart <= 8 =>
                    scale = beUint(dataStart, end - dataStart)
                  case 0x4489L if end - dataStart == 4 =>
                    durUnits = java.lang.Float
                      .intBitsToFloat(beUint(dataStart, 4).toInt).toDouble
                  case 0x4489L if end - dataStart == 8 =>
                    durUnits = java.lang.Double
                      .longBitsToDouble(beUint(dataStart, 8))
                  case _ => ()
                }
                if (unknown) ok = false else p = end
              }
            }
          }
        }
      }
      walk(0, b.length, 0)
      val fmt = if (docType == null || docType.isEmpty) "matroska" else docType
      val durMs: java.lang.Long =
        if (durUnits == null || scale <= 0) null
        else java.lang.Long.valueOf((durUnits * scale / 1e6).toLong)
      return Probe(fmt, null, null, durMs)
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
    // FLAC / Ogg audio containers: delegate to the audioInfo walk so
    // the generic prober names them with their container duration
    val ai = audioInfo(b)
    if (ai != null) return Probe(ai.container, null, null, ai.duration_ms)
    null
  }

  val probeUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf(probe _)

  // ---- Ogg / FLAC audio container probes ---------------------------
  // The remaining common web-audio containers beyond WAV/MP3 (probe
  // above): FLAC STREAMINFO (the public xiph.org FLAC format spec /
  // RFC 9639) and Ogg page walks with Opus (RFC 7845) and Vorbis
  // (Vorbis I spec) identification headers. Header walks only — codec
  // DECODE of the audio frames stays out of scope, exactly like the
  // MP4/WebM walkers.

  /** Container-level audio identity: codec, channel count, sample
    * rate, and duration derived from container bookkeeping (FLAC
    * total-samples field; Ogg last-page granule position). Nulls where
    * the container does not state a field; null overall when neither
    * signature matches.
    */
  case class AudioInfo(container: String, codec: String,
      channels: Integer, sample_rate: Integer,
      duration_ms: java.lang.Long)

  private def le64(b: Array[Byte], i: Int): Long =
    le32(b, i) | (le32(b, i + 4) << 32)

  def audioInfo(b: Array[Byte]): AudioInfo = {
    if (b == null || b.length < 16) return null
    // FLAC: "fLaC" then metadata blocks; STREAMINFO (type 0, 34
    // bytes) carries sample rate (20 bits), channels-1 (3),
    // bits-per-sample-1 (5), total samples (36)
    if (ascii(b, 0, 4) == "fLaC") {
      var p = 4
      while (p + 4 <= b.length) {
        val last = (u8(b, p) & 0x80) != 0
        val typ = u8(b, p) & 0x7f
        val len = (u8(b, p + 1) << 16) | (u8(b, p + 2) << 8) | u8(b, p + 3)
        val body = p + 4
        if (typ == 0 && len >= 34 && body + 34 <= b.length) {
          val sr = (u8(b, body + 10) << 12) | (u8(b, body + 11) << 4) |
            (u8(b, body + 12) >> 4)
          val ch = ((u8(b, body + 12) >> 1) & 0x7) + 1
          val total = ((u8(b, body + 13) & 0xf).toLong << 32) |
            be32(b, body + 14)
          val dur: java.lang.Long =
            if (sr > 0 && total > 0) total * 1000L / sr else null
          return AudioInfo("flac", "flac", ch,
            if (sr > 0) sr else null, dur)
        }
        if (last || body + len > b.length) return AudioInfo(
          "flac", "flac", null, null, null)
        p = body + len
      }
      return AudioInfo("flac", "flac", null, null, null)
    }
    // Ogg: walk pages ("OggS", version 0); the first packet names the
    // codec (OpusHead / \x01vorbis); duration comes from the LAST
    // page's granule position (PCM samples — at 48 kHz minus pre-skip
    // for Opus per RFC 7845 §4, at the declared rate for Vorbis)
    if (ascii(b, 0, 4) == "OggS") {
      var codec: String = null
      var channels: Integer = null
      var rate: Integer = null
      var preskip = 0
      var lastGranule = -1L
      var p = 0
      var pages = 0
      while (p + 27 <= b.length && ascii(b, p, 4) == "OggS" &&
        u8(b, p + 4) == 0 && pages < 1000000) {
        val granule = le64(b, p + 6)
        val nseg = u8(b, p + 26)
        if (p + 27 + nseg > b.length) { p = b.length }
        else {
          var bodyLen = 0
          var k = 0
          while (k < nseg) { bodyLen += u8(b, p + 27 + k); k += 1 }
          val body = p + 27 + nseg
          if (body + bodyLen > b.length) { p = b.length }
          else {
            if (codec == null && bodyLen >= 8) {
              if (ascii(b, body, 8) == "OpusHead" && bodyLen >= 19) {
                codec = "opus"
                channels = u8(b, body + 9)
                preskip = le16(b, body + 10)
                // RFC 7845: granule positions always count 48 kHz
                // samples regardless of the input sample rate field
                rate = 48000
              } else if (u8(b, body) == 1 &&
                ascii(b, body + 1, 6) == "vorbis" && bodyLen >= 30) {
                codec = "vorbis"
                channels = u8(b, body + 11)
                val r = le32(b, body + 12)
                if (r > 0 && r <= Int.MaxValue) rate = r.toInt
              }
            }
            if (granule != -1L && granule >= 0) lastGranule = granule
            p = body + bodyLen
            pages += 1
          }
        }
      }
      val dur: java.lang.Long =
        if (lastGranule < 0 || rate == null) null
        else if (codec == "opus")
          math.max(0L, lastGranule - preskip) * 1000L / 48000L
        else lastGranule * 1000L / rate.intValue()
      return AudioInfo("ogg", codec, channels, rate, dur)
    }
    // AIFF/AIFF-C: IFF FORM container, big-endian; the COMM chunk
    // carries channels (u16), sample frames (u32), sample size (u16)
    // and the sample rate as an 80-bit IEEE 754 extended float — the
    // one format that ever used it (Apple AIFF-1.3 spec). AIFF-C adds
    // a compression fourcc after the rate.
    if (b.length >= 12 && ascii(b, 0, 4) == "FORM" &&
      (ascii(b, 8, 4) == "AIFF" || ascii(b, 8, 4) == "AIFC")) {
      val aifc = ascii(b, 8, 4) == "AIFC"
      var p = 12
      while (p + 8 <= b.length) {
        val id = ascii(b, p, 4)
        val len = be32(b, p + 4)
        val body = p + 8
        if (len < 0 || body + len > b.length) p = b.length
        else if (id == "COMM" && len >= 18) {
          val ch = be16(b, body)
          val frames = be32(b, body + 2)
          // 80-bit extended: 1 sign + 15 exponent (bias 16383) +
          // 64-bit mantissa with an EXPLICIT integer bit
          val expRaw = be16(b, body + 8)
          val mantHi = be32(b, body + 10)
          val mantLo = be32(b, body + 14)
          val mant = (mantHi << 32) | mantLo
          val exp = expRaw & 0x7fff
          val rate: Integer =
            if (exp == 0 || exp == 0x7fff || (expRaw & 0x8000) != 0) null
            else {
              val v = java.lang.Math.scalb(
                // unsigned 64-bit mantissa as a double
                (mant >>> 1).toDouble * 2.0 + (mant & 1L),
                exp - 16383 - 63)
              if (v >= 1 && v <= Int.MaxValue) Integer.valueOf(
                math.round(v).toInt) else null
            }
          val codec =
            if (!aifc) "pcm"
            else if (len >= 22) ascii(b, body + 18, 4).trim
              .toLowerCase(java.util.Locale.ROOT)
            else "pcm"
          val dur: java.lang.Long =
            if (rate != null && frames >= 0 && rate.intValue() > 0)
              frames * 1000L / rate.intValue()
            else null
          return AudioInfo(if (aifc) "aifc" else "aiff", codec,
            if (ch > 0) ch else null, rate, dur)
        } else p = (body + len + (len & 1)).toInt // chunks pad to even
      }
      return AudioInfo(if (aifc) "aifc" else "aiff", null, null, null, null)
    }
    null
  }

  val audioInfoUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf(audioInfo _)

  /** Unified audio metadata tags across the three tag systems the
    * web-audio containers carry: FLAC VORBIS_COMMENT blocks, Ogg
    * Vorbis-comment / OpusTags packets (all three share the LE
    * vendor + KEY=value list layout from the Vorbis I spec), and MP3
    * ID3v2.3/2.4 text frames (TIT2/TPE1/TALB, latin-1 or UTF-8
    * encodings). The dedup keys an audio-corpus pipeline joins on.
    */
  case class AudioTags(container: String, title: String, artist: String,
      album: String, vendor: String, n_tags: Integer)

  def audioTags(b: Array[Byte]): AudioTags = {
    if (b == null || b.length < 8) return null
    // the shared Vorbis-comment layout: u32le vendor len + vendor,
    // u32le entry count, then per entry u32le len + "KEY=value" UTF-8
    def vorbisComments(off0: Int, end: Int):
        (String, Seq[(String, String)]) = {
      if (off0 + 8 > end) return (null, Nil)
      val vlen = le32(b, off0)
      if (vlen < 0 || off0 + 4 + vlen + 4 > end) return (null, Nil)
      val vendor = new String(b, off0 + 4, vlen.toInt, "UTF-8")
      var p = off0 + 4 + vlen.toInt
      val n = le32(b, p)
      p += 4
      if (n < 0 || n > 10000) return (vendor, Nil)
      val out = Seq.newBuilder[(String, String)]
      var k = 0L
      while (k < n && p + 4 <= end) {
        val len = le32(b, p)
        p += 4
        if (len < 0 || p + len > end) return (vendor, out.result())
        val s = new String(b, p, len.toInt, "UTF-8")
        val eq = s.indexOf('=')
        if (eq > 0) out += ((s.substring(0, eq)
          .toUpperCase(java.util.Locale.ROOT), s.substring(eq + 1)))
        p += len.toInt
        k += 1
      }
      (vendor, out.result())
    }
    def assemble(container: String, vendor: String,
        tags: Seq[(String, String)]): AudioTags = {
      val m = tags.toMap
      AudioTags(container, m.getOrElse("TITLE", null),
        m.getOrElse("ARTIST", null), m.getOrElse("ALBUM", null),
        vendor, tags.length)
    }
    if (ascii(b, 0, 4) == "fLaC") {
      var p = 4
      while (p + 4 <= b.length) {
        val last = (u8(b, p) & 0x80) != 0
        val typ = u8(b, p) & 0x7f
        val len = (u8(b, p + 1) << 16) | (u8(b, p + 2) << 8) | u8(b, p + 3)
        val body = p + 4
        if (body + len > b.length) return null
        if (typ == 4) {
          val (v, tags) = vorbisComments(body, body + len)
          return assemble("flac", v, tags)
        }
        if (last) return AudioTags("flac", null, null, null, null, 0)
        p = body + len
      }
      return AudioTags("flac", null, null, null, null, 0)
    }
    if (ascii(b, 0, 4) == "OggS") {
      var p = 0
      var pages = 0
      while (p + 27 <= b.length && ascii(b, p, 4) == "OggS" &&
        u8(b, p + 4) == 0 && pages < 100000) {
        val nseg = u8(b, p + 26)
        if (p + 27 + nseg > b.length) return AudioTags(
          "ogg", null, null, null, null, 0)
        var bodyLen = 0
        var k = 0
        while (k < nseg) { bodyLen += u8(b, p + 27 + k); k += 1 }
        val body = p + 27 + nseg
        if (body + bodyLen > b.length) return AudioTags(
          "ogg", null, null, null, null, 0)
        if (bodyLen >= 8 && ascii(b, body, 8) == "OpusTags") {
          val (v, tags) = vorbisComments(body + 8, body + bodyLen)
          return assemble("ogg", v, tags)
        }
        if (bodyLen >= 7 && u8(b, body) == 3 &&
          ascii(b, body + 1, 6) == "vorbis") {
          val (v, tags) = vorbisComments(body + 7, body + bodyLen)
          return assemble("ogg", v, tags)
        }
        p = body + bodyLen
        pages += 1
      }
      return AudioTags("ogg", null, null, null, null, 0)
    }
    if (ascii(b, 0, 3) == "ID3" && b.length >= 10) {
      val ver = u8(b, 3)
      val size = (u8(b, 6) << 21) | (u8(b, 7) << 14) |
        (u8(b, 8) << 7) | u8(b, 9)
      val end = math.min(10L + size, b.length.toLong).toInt
      var p = 10
      var title: String = null; var artist: String = null
      var album: String = null; var n = 0
      while (p + 10 <= end) {
        val id = ascii(b, p, 4)
        if (!id.forall(c => (c >= 'A' && c <= 'Z') ||
          (c >= '0' && c <= '9'))) p = end // padding reached
        else {
          // v2.4 frame sizes are syncsafe; v2.3 plain big-endian
          val fsz =
            if (ver >= 4) (u8(b, p + 4) << 21) | (u8(b, p + 5) << 14) |
              (u8(b, p + 6) << 7) | u8(b, p + 7)
            else be32(b, p + 4).toInt
          if (fsz < 0 || p + 10 + fsz > end) p = end
          else {
            if (id.startsWith("T") && fsz >= 1) {
              val enc = u8(b, p + 10)
              val cs = enc match {
                case 0 => "ISO-8859-1"
                case 1 => "UTF-16"
                case 2 => "UTF-16BE"
                case _ => "UTF-8"
              }
              val txt = new String(b, p + 11, fsz - 1, cs)
                .takeWhile(_ != 0.toChar)
              n += 1
              id match {
                case "TIT2" if title == null => title = txt
                case "TPE1" if artist == null => artist = txt
                case "TALB" if album == null => album = txt
                case _ => ()
              }
            }
            p += 10 + fsz
          }
        }
      }
      return AudioTags("mp3", title, artist, album, null, n)
    }
    null
  }

  val audioTagsUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf(audioTags _)

  /** Shared fixture piece: one Vorbis-comment block. */
  private def vorbisCommentBytes(vendor: String,
      tags: Seq[(String, String)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le(v: Int): Unit = (0 until 4).foreach(k =>
      out.write((v >> (8 * k)) & 0xff))
    val vb = vendor.getBytes("UTF-8")
    le(vb.length); out.write(vb)
    le(tags.length)
    tags.foreach { case (k, v) =>
      val e = s"$k=$v".getBytes("UTF-8")
      le(e.length); out.write(e)
    }
    out.toByteArray
  }

  /** Fixture complement of [[audioTags]] for MP3: an ID3v2.3 or v2.4
    * tag with TIT2/TPE1/TALB text frames (latin-1 encoding byte 0).
    */
  def id3Build(title: String, artist: String, album: String,
      v4: Boolean = false): Array[Byte] = {
    val frames = new java.io.ByteArrayOutputStream()
    Seq("TIT2" -> title, "TPE1" -> artist, "TALB" -> album).foreach {
      case (id, txt) =>
        val body = 0.toByte +: txt.getBytes("ISO-8859-1")
        frames.write(id.getBytes("US-ASCII"))
        val sz = body.length
        if (v4) {
          frames.write((sz >> 21) & 0x7f); frames.write((sz >> 14) & 0x7f)
          frames.write((sz >> 7) & 0x7f); frames.write(sz & 0x7f)
        } else {
          frames.write((sz >> 24) & 0xff); frames.write((sz >> 16) & 0xff)
          frames.write((sz >> 8) & 0xff); frames.write(sz & 0xff)
        }
        frames.write(0); frames.write(0)
        frames.write(body)
    }
    val fb = frames.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    out.write("ID3".getBytes("US-ASCII"))
    out.write(if (v4) 4 else 3); out.write(0); out.write(0)
    out.write((fb.length >> 21) & 0x7f); out.write((fb.length >> 14) & 0x7f)
    out.write((fb.length >> 7) & 0x7f); out.write(fb.length & 0x7f)
    out.write(fb)
    out.toByteArray
  }

  /** Fixture complement of [[audioInfo]]/[[audioTags]]: a FLAC header
    * with a real STREAMINFO block and an optional VORBIS_COMMENT
    * block (no audio frames — the probes read bookkeeping).
    */
  def flacBuild(sampleRate: Int, channels: Int, bitsPerSample: Int,
      totalSamples: Long, vendor: String = null,
      tags: Seq[(String, String)] = Nil): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    val withTags = vendor != null
    out.write(if (withTags) 0x00 else 0x80) // STREAMINFO; last unless tags
    out.write(0); out.write(0); out.write(34)
    val si = new Array[Byte](34)
    si(0) = 0x10; si(1) = 0x00 // min block 4096
    si(2) = 0x10; si(3) = 0x00 // max block
    // min/max frame sizes (24-bit): zeros = unknown
    si(10) = ((sampleRate >> 12) & 0xff).toByte
    si(11) = ((sampleRate >> 4) & 0xff).toByte
    si(12) = (((sampleRate & 0xf) << 4) | (((channels - 1) & 0x7) << 1) |
      (((bitsPerSample - 1) >> 4) & 0x1)).toByte
    si(13) = ((((bitsPerSample - 1) & 0xf) << 4) |
      ((totalSamples >> 32) & 0xf)).toInt.toByte
    si(14) = ((totalSamples >> 24) & 0xff).toByte
    si(15) = ((totalSamples >> 16) & 0xff).toByte
    si(16) = ((totalSamples >> 8) & 0xff).toByte
    si(17) = (totalSamples & 0xff).toByte
    out.write(si)
    if (withTags) {
      val vc = vorbisCommentBytes(vendor, tags)
      out.write(0x84) // last-block + type 4 (VORBIS_COMMENT)
      out.write((vc.length >> 16) & 0xff)
      out.write((vc.length >> 8) & 0xff)
      out.write(vc.length & 0xff)
      out.write(vc)
    }
    out.toByteArray
  }

  /** Fixture complement of [[audioInfo]] for AIFF/AIFF-C: FORM
    * container with a decoy annotation chunk (odd length, so the
    * even-padding walk is exercised) before the COMM chunk; the
    * sample rate is encoded as a REAL 80-bit extended float.
    */
  def aiffBuild(channels: Int, frames: Long, sampleRate: Int,
      aifc: Boolean = false, compression: String = "NONE"): Array[Byte] = {
    require(sampleRate > 0)
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def w32(v: Long): Unit = { w16(((v >> 16) & 0xffff).toInt)
      w16((v & 0xffff).toInt) }
    out.write("FORM".getBytes("US-ASCII"))
    val commLen = if (aifc) 18 + 4 else 18
    val annLen = 5 // odd on purpose: pad byte follows
    val formLen = 4 + (8 + annLen + 1) + (8 + commLen)
    w32(formLen.toLong)
    out.write((if (aifc) "AIFC" else "AIFF").getBytes("US-ASCII"))
    out.write("ANNO".getBytes("US-ASCII")); w32(annLen.toLong)
    out.write("notes".getBytes("US-ASCII")); out.write(0) // pad to even
    out.write("COMM".getBytes("US-ASCII")); w32(commLen.toLong)
    w16(channels); w32(frames); w16(16) // sample size
    // 80-bit extended from the integer rate: exponent = 16383 + log2,
    // mantissa = rate left-justified with the explicit integer bit set
    val log2 = 63 - java.lang.Long.numberOfLeadingZeros(sampleRate.toLong)
    w16(16383 + log2)
    val mant = sampleRate.toLong << (63 - log2)
    w32(mant >>> 32); w32(mant & 0xffffffffL)
    if (aifc) out.write(compression.take(4).padTo(4, ' ')
      .getBytes("US-ASCII"))
    out.toByteArray
  }

  /** Fixture complement of [[audioInfo]]/[[audioTags]] for Ogg: a BOS
    * page carrying the codec identification header (OpusHead / Vorbis
    * id), an optional comment page (OpusTags / Vorbis comment packet),
    * `midPages` filler pages, and an EOS page at `lastGranule`.
    */
  def oggBuild(codec: String, channels: Int, sampleRate: Int,
      lastGranule: Long, preskip: Int = 312,
      midPages: Int = 2, vendor: String = null,
      tags: Seq[(String, String)] = Nil): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def page(flags: Int, granule: Long, seq: Int,
        payload: Array[Byte]): Unit = {
      require(payload.length < 255)
      out.write("OggS".getBytes("US-ASCII"))
      out.write(0) // version
      out.write(flags)
      var g = granule
      var i = 0
      while (i < 8) { out.write((g & 0xff).toInt); g >>>= 8; i += 1 }
      // serial, sequence, crc (probe does not verify crc)
      val le = (v: Long) => (0 until 4).foreach(k =>
        out.write(((v >> (8 * k)) & 0xff).toInt))
      le(0x1234L); le(seq.toLong); le(0L)
      out.write(1) // one segment
      out.write(payload.length)
      out.write(payload)
    }
    val idPacket: Array[Byte] = codec match {
      case "opus" =>
        val p = new java.io.ByteArrayOutputStream()
        p.write("OpusHead".getBytes("US-ASCII"))
        p.write(1) // version
        p.write(channels)
        p.write(preskip & 0xff); p.write((preskip >> 8) & 0xff)
        (0 until 4).foreach(k =>
          p.write((sampleRate >> (8 * k)) & 0xff)) // input rate (info only)
        p.write(0); p.write(0) // output gain
        p.write(0) // channel mapping family
        p.toByteArray
      case "vorbis" =>
        val p = new java.io.ByteArrayOutputStream()
        p.write(1)
        p.write("vorbis".getBytes("US-ASCII"))
        (0 until 4).foreach(_ => p.write(0)) // version
        p.write(channels)
        (0 until 4).foreach(k => p.write((sampleRate >> (8 * k)) & 0xff))
        (0 until 12).foreach(_ => p.write(0)) // bitrate triple
        p.write(0xb8) // blocksizes exp nibbles
        p.write(1) // framing bit
        p.toByteArray
      case other => throw new IllegalArgumentException(
        s"oggBuild: unknown codec '$other'")
    }
    page(0x02, 0L, 0, idPacket) // BOS
    var s = 1
    if (vendor != null) {
      val vc = vorbisCommentBytes(vendor, tags)
      val packet =
        if (codec == "opus") "OpusTags".getBytes("US-ASCII") ++ vc
        else (3.toByte +: "vorbis".getBytes("US-ASCII")) ++ vc :+ 1.toByte
      page(0, -1L, s, packet) // comment page: no granule position
      s += 1
    }
    while (s <= midPages + (if (vendor != null) 1 else 0)) {
      page(0, lastGranule * s / (midPages + 1), s,
        Array.fill(16)((s * 7).toByte))
      s += 1
    }
    page(0x04, lastGranule, s, Array.fill(8)(3.toByte)) // EOS
    out.toByteArray
  }

  // ---- JPEG EXIF (TIFF IFD walk) ------------------------------------
  // Image provenance metadata a multimodal curation pipeline keys on:
  // orientation (the display-correctness bit), camera make/model,
  // capture timestamp, declared pixel dimensions. Public layout:
  // JPEG APP1 "Exif\0\0" + TIFF 6.0 IFDs (both byte orders) with the
  // Exif sub-IFD for DateTimeOriginal / PixelX-YDimension. Bounds-
  // checked walk, total on arbitrary bytes; no codec decode.

  /** Nulls where the tag is absent; null overall when the payload is
    * not a JPEG with an Exif APP1 segment.
    */
  case class ExifInfo(byte_order: String, orientation: Integer,
      make: String, model: String, datetime: String,
      datetime_original: String, pixel_width: Integer,
      pixel_height: Integer)

  def exifInfo(b: Array[Byte]): ExifInfo = {
    if (b == null || b.length < 4 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8)
      return null
    // marker walk to APP1/Exif (same walk as the JPEG probe above)
    var p = 2
    var tiff = -1
    var tiffEnd = -1
    while (tiff < 0 && p + 4 <= b.length && u8(b, p) == 0xff) {
      val m = u8(b, p + 1)
      if (m == 0xd8 || (m >= 0xd0 && m <= 0xd9)) p += 2
      else {
        val len = be16(b, p + 2)
        if (len < 2 || p + 2 + len > b.length) return null
        if (m == 0xe1 && len >= 14 && ascii(b, p + 4, 4) == "Exif" &&
          u8(b, p + 8) == 0 && u8(b, p + 9) == 0) {
          tiff = p + 10
          tiffEnd = p + 2 + len
        }
        if (m == 0xda) return null // entropy-coded data: no APP1 before it
        p += 2 + len
      }
    }
    if (tiff < 0 || tiff + 8 > tiffEnd) return null
    val le = ascii(b, tiff, 2) match {
      case "II" => true
      case "MM" => false
      case _ => return null
    }
    def r16(i: Int): Int =
      if (i < tiff || i + 2 > tiffEnd) -1
      else if (le) le16(b, i) else be16(b, i)
    def r32(i: Int): Long =
      if (i < tiff || i + 4 > tiffEnd) -1L
      else if (le) le32(b, i) else be32(b, i)
    if (r16(tiff + 2) != 42) return null
    var orientation: Integer = null
    var make: String = null
    var model: String = null
    var datetime: String = null
    var dtOrig: String = null
    var pw: Integer = null
    var ph: Integer = null
    def asciiVal(typ: Int, cnt: Long, valOff: Int): String = {
      if (typ != 2 || cnt <= 0 || cnt > (1L << 16)) return null
      val start =
        if (cnt <= 4) valOff
        else {
          val off = r32(valOff)
          if (off < 0) return null
          tiff + off.toInt
        }
      if (start < tiff || start + cnt > tiffEnd) return null
      val s = new String(b, start, cnt.toInt, "US-ASCII")
      val nul = s.indexOf(0.toChar) // NUL-terminated TIFF ASCII
      (if (nul >= 0) s.substring(0, nul) else s).trim match {
        case "" => null
        case t => t
      }
    }
    def shortOrLong(typ: Int, valOff: Int): Integer = {
      if (typ == 3) { val v = r16(valOff); if (v >= 0) Integer.valueOf(v) else null }
      else if (typ == 4) {
        val v = r32(valOff)
        if (v >= 0 && v <= Int.MaxValue) Integer.valueOf(v.toInt) else null
      } else null
    }
    def walkIfd(ifdOff: Long, isExifIfd: Boolean, depth: Int): Unit = {
      if (depth > 4 || ifdOff < 0) return
      val base = tiff + ifdOff.toInt
      val n = r16(base)
      if (n < 0 || n > 512) return
      var k = 0
      while (k < n) {
        val e = base + 2 + 12 * k
        val tag = r16(e)
        val typ = r16(e + 2)
        val cnt = r32(e + 4)
        val valOff = e + 8
        tag match {
          case 0x0112 if orientation == null =>
            orientation = shortOrLong(typ, valOff)
          case 0x010f if make == null => make = asciiVal(typ, cnt, valOff)
          case 0x0110 if model == null => model = asciiVal(typ, cnt, valOff)
          case 0x0132 if datetime == null =>
            datetime = asciiVal(typ, cnt, valOff)
          case 0x9003 if dtOrig == null =>
            dtOrig = asciiVal(typ, cnt, valOff)
          case 0xa002 if pw == null => pw = shortOrLong(typ, valOff)
          case 0xa003 if ph == null => ph = shortOrLong(typ, valOff)
          case 0x8769 if !isExifIfd && typ == 4 =>
            walkIfd(r32(valOff), isExifIfd = true, depth + 1)
          case _ => ()
        }
        k += 1
      }
    }
    walkIfd(r32(tiff + 4), isExifIfd = false, 0)
    ExifInfo(if (le) "II" else "MM", orientation, make, model,
      datetime, dtOrig, pw, ph)
  }

  val exifInfoUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf(exifInfo _)

  /** Fixture complement of [[exifInfo]]: a minimal JPEG whose APP1
    * carries a real two-IFD TIFF (IFD0: orientation/make/model/
    * DateTime + Exif pointer; Exif IFD: DateTimeOriginal +
    * PixelX/YDimension) in either byte order.
    */
  def exifBuild(littleEndian: Boolean, orientation: Int, make: String,
      model: String, datetime: String, dtOriginal: String,
      pixelW: Int, pixelH: Int): Array[Byte] = {
    val t = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit =
      if (littleEndian) { t.write(v & 0xff); t.write((v >> 8) & 0xff) }
      else { t.write((v >> 8) & 0xff); t.write(v & 0xff) }
    def w32(v: Long): Unit =
      if (littleEndian) { t.write((v & 0xff).toInt)
        t.write(((v >> 8) & 0xff).toInt); t.write(((v >> 16) & 0xff).toInt)
        t.write(((v >> 24) & 0xff).toInt) }
      else { t.write(((v >> 24) & 0xff).toInt)
        t.write(((v >> 16) & 0xff).toInt); t.write(((v >> 8) & 0xff).toInt)
        t.write((v & 0xff).toInt) }
    val mk = make.getBytes("US-ASCII") :+ 0.toByte
    val md = model.getBytes("US-ASCII") :+ 0.toByte
    val dt = datetime.getBytes("US-ASCII") :+ 0.toByte
    val dto = dtOriginal.getBytes("US-ASCII") :+ 0.toByte
    // layout: header(8) IFD0(2+5*12+4) exifIFD(2+3*12+4) then strings
    val ifd0 = 8L
    val exifIfd = ifd0 + 2 + 5 * 12 + 4
    val strBase = exifIfd + 2 + 3 * 12 + 4
    val mkOff = strBase
    val mdOff = mkOff + mk.length
    val dtOff = mdOff + md.length
    val dtoOff = dtOff + dt.length
    t.write(if (littleEndian) 'I' else 'M')
    t.write(if (littleEndian) 'I' else 'M')
    w16(42); w32(ifd0)
    def entry(tag: Int, typ: Int, cnt: Long)(value: => Unit): Unit = {
      w16(tag); w16(typ); w32(cnt)
      val before = t.size()
      value
      while (t.size() < before + 4) t.write(0)
    }
    w16(5)
    entry(0x010f, 2, mk.length.toLong) { w32(mkOff) }
    entry(0x0110, 2, md.length.toLong) { w32(mdOff) }
    entry(0x0112, 3, 1L) { w16(orientation) }
    entry(0x0132, 2, dt.length.toLong) { w32(dtOff) }
    entry(0x8769, 4, 1L) { w32(exifIfd) }
    w32(0) // no next IFD
    w16(3)
    entry(0x9003, 2, dto.length.toLong) { w32(dtoOff) }
    entry(0xa002, 4, 1L) { w32(pixelW.toLong) }
    entry(0xa003, 3, 1L) { w16(pixelH) }
    w32(0)
    t.write(mk); t.write(md); t.write(dt); t.write(dto)
    val tiff = t.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8) // SOI
    out.write(0xff); out.write(0xe1) // APP1
    val segLen = 2 + 6 + tiff.length
    out.write((segLen >> 8) & 0xff); out.write(segLen & 0xff)
    out.write("Exif".getBytes("US-ASCII")); out.write(0); out.write(0)
    out.write(tiff)
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** Exact sample statistics from a REAL decode of a PCM WAV payload —
    * the one format whose "decode" is pure public byte layout (RIFF
    * chunk walk + little-endian 8/16-bit sample extraction, no codec):
    * this closes the media-decode stub for audio with genuinely decoded
    * samples. Integer outputs (count / peak / sum / sum-of-squares) so
    * results are exactly SQL-oracle-able; mean and RMS are one division
    * away for callers. Multi-channel payloads aggregate over ALL
    * interleaved channel samples.
    */
  case class WavStats(n_samples: Long, peak: Int, sum: Long, sumsq: Long)

  def wavStats(b: Array[Byte]): WavStats = {
    if (b == null || b.length < 44) return null
    if (ascii(b, 0, 4) != "RIFF" || ascii(b, 8, 4) != "WAVE") return null
    var p = 12
    var fmt = -1
    var bits = -1
    var dataOff = -1
    var dataLen = -1L
    while (p + 8 <= b.length) {
      val id = ascii(b, p, 4)
      val len = le32(b, p + 4)
      if (id == "fmt " && p + 24 <= b.length) {
        fmt = le16(b, p + 8)
        bits = le16(b, p + 22)
      }
      if (id == "data" && dataOff < 0) { dataOff = p + 8; dataLen = len }
      val step = 8L + len + (len & 1L) // chunks are word-aligned
      if (p + step > b.length) p = b.length else p += step.toInt
    }
    // PCM only (format 1): compressed WAVE subtypes need real codecs
    if (fmt != 1 || dataOff < 0) return null
    val end = math.min(b.length.toLong, dataOff + dataLen).toInt
    if (bits == 16) {
      val n = (end - dataOff) / 2
      var sum = 0L; var sumsq = 0L; var peak = 0
      var i = 0
      while (i < n) {
        val s = (le16(b, dataOff + 2 * i) << 16) >> 16 // sign-extend LE16
        sum += s; sumsq += s.toLong * s
        val a = math.abs(s); if (a > peak) peak = a
        i += 1
      }
      WavStats(n, peak, sum, sumsq)
    } else if (bits == 8) {
      // 8-bit WAV is UNSIGNED with a 128 midpoint per the RIFF spec
      val n = end - dataOff
      var sum = 0L; var sumsq = 0L; var peak = 0
      var i = 0
      while (i < n) {
        val s = u8(b, dataOff + i) - 128
        sum += s; sumsq += s.toLong * s
        val a = math.abs(s); if (a > peak) peak = a
        i += 1
      }
      WavStats(n, peak, sum, sumsq)
    } else null
  }

  val wavStatsUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf(wavStats _)

  /** Frame-level PCM analysis — the audio-curation triage signals a
    * speech/music training pipeline gates on before paying for real
    * feature extraction: clipped-sample count (recording damage),
    * silent-frame count (dead air to trim), and the peak frame energy
    * (loudness envelope proxy). Everything is integer-exact on the
    * 16-bit sample scale (8-bit samples shift left 8), so an external
    * SQL engine replays it from a sample formula.
    *
    * Frames are `frameSize` consecutive samples; the tail partial
    * frame counts. clip = |s| ≥ 32000 (within ~2% of full scale);
    * a frame is silent when its peak |s| < 512 (< ~1.6% full scale);
    * peak_frame_energy = max over frames of Σ s². Null for non-PCM
    * payloads, same contract as [[wavStats]].
    */
  case class WavFrameStats(n_frames: Int, clip_count: Long,
      silence_frames: Int, peak_frame_energy: Long)

  def wavFrameStats(b: Array[Byte], frameSize: Int): WavFrameStats = {
    if (b == null || frameSize <= 0 || b.length < 44) return null
    if (ascii(b, 0, 4) != "RIFF" || ascii(b, 8, 4) != "WAVE") return null
    var p = 12
    var fmt = -1
    var bits = -1
    var dataOff = -1
    var dataLen = -1L
    while (p + 8 <= b.length) {
      val id = ascii(b, p, 4)
      val len = le32(b, p + 4)
      if (id == "fmt " && p + 24 <= b.length) {
        fmt = le16(b, p + 8)
        bits = le16(b, p + 22)
      }
      if (id == "data" && dataOff < 0) { dataOff = p + 8; dataLen = len }
      val step = 8L + len + (len & 1L) // chunks are word-aligned
      if (p + step > b.length) p = b.length else p += step.toInt
    }
    if (fmt != 1 || dataOff < 0 || (bits != 8 && bits != 16)) return null
    val end = math.min(b.length.toLong, dataOff + dataLen).toInt
    val n = if (bits == 16) (end - dataOff) / 2 else end - dataOff
    def sample(i: Int): Int =
      if (bits == 16) (le16(b, dataOff + 2 * i) << 16) >> 16
      else (u8(b, dataOff + i) - 128) << 8 // unsigned midpoint-128, 16-bit scale
    val nf = if (n == 0) 0 else (n + frameSize - 1) / frameSize
    var clip = 0L
    var silent = 0
    var peakE = 0L
    var f = 0
    while (f < nf) {
      var e = 0L
      var fpeak = 0
      var i = f * frameSize
      val stop = math.min(n, i + frameSize)
      while (i < stop) {
        val s = sample(i)
        val a = math.abs(s)
        if (a >= 32000) clip += 1
        if (a > fpeak) fpeak = a
        e += s.toLong * s
        i += 1
      }
      if (fpeak < 512) silent += 1
      if (e > peakE) peakE = e
      f += 1
    }
    WavFrameStats(nf, clip, silent, peakE)
  }

  val wavFrameStatsUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf(wavFrameStats _)

  /** Decoded PCM samples on the 16-bit scale (8-bit samples shift
    * left 8, unsigned midpoint-128 — same convention as
    * [[wavFrameStats]]), or null for non-PCM / malformed payloads.
    * The shared sample accessor behind the frame analyzer and the
    * perceptual audio hash ([[graft.llm.AudioHash]]).
    */
  private[llm] def pcmSamples(b: Array[Byte]): Array[Int] = {
    if (b == null || b.length < 44) return null
    if (ascii(b, 0, 4) != "RIFF" || ascii(b, 8, 4) != "WAVE") return null
    var p = 12
    var fmt = -1
    var bits = -1
    var dataOff = -1
    var dataLen = -1L
    while (p + 8 <= b.length) {
      val id = ascii(b, p, 4)
      val len = le32(b, p + 4)
      if (id == "fmt " && p + 24 <= b.length) {
        fmt = le16(b, p + 8)
        bits = le16(b, p + 22)
      }
      if (id == "data" && dataOff < 0) { dataOff = p + 8; dataLen = len }
      val step = 8L + len + (len & 1L) // chunks are word-aligned
      if (p + step > b.length) p = b.length else p += step.toInt
    }
    if (fmt != 1 || dataOff < 0 || (bits != 8 && bits != 16)) return null
    val end = math.min(b.length.toLong, dataOff + dataLen).toInt
    val n = if (bits == 16) (end - dataOff) / 2 else end - dataOff
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (bits == 16) (le16(b, dataOff + 2 * i) << 16) >> 16
        else (u8(b, dataOff + i) - 128) << 8
      i += 1
    }
    out
  }

  // ---- PNG pixel decode (real, pure-JVM) ---------------------------
  // PNG spec (ISO/IEC 15948 / W3C PNG 2nd ed.): Sec. 5 chunk layout,
  // Sec. 9 filtering, Sec. 11.2.2 IHDR, 11.2.3 PLTE, 11.2.4 IDAT.
  // Supports every IHDR shape the spec defines: greyscale (0) at
  // depths 1/2/4/8/16, truecolour (2) at 8/16, indexed-colour (3) at
  // 1/2/4/8 with PLTE resolution, grey+alpha (4) at 8/16,
  // truecolour+alpha (6) at 8/16, in BOTH interlace methods (0 = none,
  // 1 = Adam7, Sec. 8.2: seven sub-images, each filtered independently
  // over its own reduced scanlines). Sub-byte samples unpack MSB-first
  // (Sec. 7.2) and scale to 0..255 by v*255/(2^d-1) (Sec. 12.5
  // sample-depth scaling); 16-bit samples take the most significant
  // byte (the spec's recommended depth rescale to 8).

  /** A fully decoded (unfiltered, palette-resolved, 8-bit-rescaled)
    * image: `pixels` holds h scanlines of w*bpp bytes, bpp = 1 (grey)
    * / 2 (grey+alpha) / 3 (RGB, incl. resolved palette) / 4 (RGBA).
    */
  case class PngImage(width: Int, height: Int, colorType: Int,
      pixels: Array[Byte]) {
    def bpp: Int = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 3; case 4 => 2; case _ => 4 }
  }

  /** Exact integer pixel statistics from a real decode: zlib-inflated
    * concatenated IDAT, per-scanline unfilter, channel sums. Integer
    * sums (not means) so the stats are exactly SQL-oracle-able; for
    * greyscale the single channel is mirrored into all three sums.
    */
  case class PngStats(width: Int, height: Int, n_pixels: Long,
      sum_r: Long, sum_g: Long, sum_b: Long)

  private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  /** Adam7 pass geometry (Sec. 8.2): (xStart, yStart, xStep, yStep)
    * for each of the seven sub-images, in transmission order.
    */
  private val Adam7 = Array(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  /** Full decode to raw pixels; null on non-PNG or malformed input. */
  def pngDecode(b: Array[Byte]): PngImage = {
    if (b == null || b.length < 8 + 25 + 12) return null
    var i = 0
    while (i < 8) { if (u8(b, i) != PngSig(i)) return null; i += 1 }
    var p = 8
    var w = -1; var h = -1; var depth = -1; var ct = -1; var interlace = -1
    var plte: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream()
    var sawEnd = false
    while (p + 12 <= b.length && !sawEnd) {
      val len = be32(b, p).toInt
      val typ = ascii(b, p + 4, 4)
      if (len < 0 || p + 12L + len > b.length) return null
      typ match {
        case "IHDR" =>
          if (len < 13) return null
          w = be32(b, p + 8).toInt; h = be32(b, p + 12).toInt
          depth = u8(b, p + 16); ct = u8(b, p + 17); interlace = u8(b, p + 20)
        case "PLTE" =>
          if (len % 3 != 0 || len > 256 * 3) return null
          plte = java.util.Arrays.copyOfRange(b, p + 8, p + 8 + len)
        case "IDAT" => idat.write(b, p + 8, len)
        case "IEND" => sawEnd = true
        case _ => () // ancillary chunks pass through
      }
      p += 12 + len
    }
    if (w <= 0 || h <= 0 || (interlace != 0 && interlace != 1)) return null
    // channels per colour type; legal (ct, depth) pairs per Sec. 11.2.2
    val channels = ct match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
      case _ => return null }
    val depthOk = ct match {
      case 0 => Set(1, 2, 4, 8, 16)(depth)
      case 3 => Set(1, 2, 4, 8)(depth) && plte != null
      case _ => depth == 8 || depth == 16
    }
    if (!depthOk) return null
    // interlace method 0 is a single pass covering the whole image;
    // Adam7 is seven reduced images, each packed, filtered and
    // unfiltered INDEPENDENTLY (Sec. 8.2: "each pass is treated as an
    // independent image for filtering purposes"). Empty passes (zero
    // width or height) transmit nothing, not even filter bytes.
    val bitsPerPx = channels * depth
    val fbpp = math.max(1, (bitsPerPx + 7) / 8)
    val passes = if (interlace == 0) Array((0, 0, 1, 1)) else Adam7
    // per-pass geometry: (xStart, yStart, xStep, yStep, width, height,
    // packed byte stride)
    val geoms = passes.map { case (xs, ys, xst, yst) =>
      val pw = if (w > xs) (w - xs + xst - 1) / xst else 0
      val ph = if (h > ys) (h - ys + yst - 1) / yst else 0
      (xs, ys, xst, yst, pw, ph, ((pw.toLong * bitsPerPx + 7) / 8).toInt)
    }
    val totalRaw = geoms.map { case (_, _, _, _, pw, ph, pstride) =>
      if (pw == 0 || ph == 0) 0L else ph.toLong * (1L + pstride) }.sum
    if (totalRaw <= 0 || totalRaw > Int.MaxValue / 2) return null
    val raw = new Array[Byte](totalRaw.toInt)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    var got = 0
    try {
      while (got < raw.length && !inf.finished()) {
        val k = inf.inflate(raw, got, raw.length - got)
        if (k == 0 && (inf.needsInput() || inf.needsDictionary())) return null
        got += k
      }
    } catch { case _: java.util.zip.DataFormatException => return null }
    finally inf.end()
    if (got < raw.length) return null
    val outBpp = ct match { case 0 => 1; case 2 => 3; case 3 => 3
      case 4 => 2; case _ => 4 }
    if (w.toLong * h * outBpp > Int.MaxValue / 2) return null
    val out = new Array[Byte](w * h * outBpp)
    val palEntries = if (plte == null) 0 else plte.length / 3
    var rawOff = 0
    var pi = 0
    while (pi < geoms.length) {
      val (xs, ys, xst, yst, pw, ph, stride) = geoms(pi)
      if (pw > 0 && ph > 0) {
        // Sec. 9 unfilter, scanline by scanline over this pass's PACKED
        // bytes: a=left, b=up, c=up-left (all 0 outside the pass), byte
        // arithmetic mod 256
        val img = new Array[Byte](ph * stride)
        var y = 0
        while (y < ph) {
          val ft = u8(raw, rawOff + y * (1 + stride))
          val ro = rawOff + y * (1 + stride) + 1
          val io = y * stride
          var x = 0
          while (x < stride) {
            val rx = u8(raw, ro + x)
            val a = if (x >= fbpp) u8(img, io + x - fbpp) else 0
            val up = if (y > 0) u8(img, io - stride + x) else 0
            val c = if (x >= fbpp && y > 0) u8(img, io - stride + x - fbpp)
              else 0
            val v = ft match {
              case 0 => rx
              case 1 => rx + a
              case 2 => rx + up
              case 3 => rx + ((a + up) >> 1)
              case 4 => // Paeth predictor, Sec. 9.4
                val pp = a + up - c
                val pa = math.abs(pp - a)
                val pb = math.abs(pp - up)
                val pc = math.abs(pp - c)
                rx + (if (pa <= pb && pa <= pc) a
                      else if (pb <= pc) up else c)
              case _ => return null
            }
            img(io + x) = (v & 0xff).toByte
            x += 1
          }
          y += 1
        }
        rawOff += ph * (1 + stride)
        // expand this pass's packed samples to the 8-bit output
        // representation at the pass's pixel positions: sub-byte unpack
        // MSB-first + depth rescale, 16-bit MSB, palette index -> PLTE
        // RGB triple
        y = 0
        while (y < ph) {
          val io = y * stride
          val gy = ys + y * yst
          var bitPos = 0
          var px = 0
          while (px < pw) {
            val xo = (gy * w + (xs + px * xst)) * outBpp
            var ch = 0
            while (ch < channels) {
              val s = depth match {
                case 16 =>
                  val v = u8(img, io + (bitPos >> 3)); bitPos += 16; v // MSB
                case 8 =>
                  val v = u8(img, io + (bitPos >> 3)); bitPos += 8; v
                case d => // 1/2/4: MSB-first within each byte (Sec. 7.2)
                  val byteV = u8(img, io + (bitPos >> 3))
                  val shift = 8 - d - (bitPos & 7)
                  bitPos += d
                  (byteV >> shift) & ((1 << d) - 1)
              }
              if (ct == 3) {
                if (s >= palEntries) return null // index outside the palette
                out(xo) = plte(3 * s); out(xo + 1) = plte(3 * s + 1)
                out(xo + 2) = plte(3 * s + 2)
              } else {
                // depth rescale to 8: v*255/(2^d-1) is exact for 1/2/4
                val v8 = if (depth < 8) s * 255 / ((1 << depth) - 1) else s
                out(xo + ch) = v8.toByte
              }
              ch += 1
            }
            px += 1
          }
          y += 1
        }
      }
      pi += 1
    }
    PngImage(w, h, ct, out)
  }

  def pngStats(b: Array[Byte]): PngStats = {
    val im = pngDecode(b)
    if (im == null) return null
    val (w, h, bpp, stride) = (im.width, im.height, im.bpp, im.width * im.bpp)
    var sr = 0L; var sg = 0L; var sb = 0L
    var yy = 0
    while (yy < h) {
      var xx = 0
      while (xx < w) {
        val o = yy * stride + xx * bpp
        if (bpp <= 2) { // grey / grey+alpha: one luma channel, mirrored
          val g = u8(im.pixels, o); sr += g; sg += g; sb += g
        } else {
          sr += u8(im.pixels, o); sg += u8(im.pixels, o + 1)
          sb += u8(im.pixels, o + 2)
        }
        xx += 1
      }
      yy += 1
    }
    PngStats(w, h, w.toLong * h, sr, sg, sb)
  }

  val pngStatsUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf(pngStats _)

  /** Feature vector from a REAL decode: [mean_r, mean_g, mean_b] / 255
    * then a normalized (buckets-3)-bin luminance histogram (ITU-R
    * BT.601 integer weights 299/587/114, alpha ignored). Null when the
    * payload isn't a decodable PNG — callers fall back to the stub.
    */
  def pngFeatures(b: Array[Byte], buckets: Int): Array[Float] = {
    if (buckets < 4) return null
    val im = pngDecode(b)
    if (im == null) return null
    val (w, h, bpp, stride) = (im.width, im.height, im.bpp, im.width * im.bpp)
    val bins = buckets - 3
    val hist = new Array[Long](bins)
    var sr = 0L; var sg = 0L; var sb = 0L
    var yy = 0
    while (yy < h) {
      var xx = 0
      while (xx < w) {
        val o = yy * stride + xx * bpp
        val (r, g, bl) =
          if (bpp <= 2) { // grey / grey+alpha: one luma channel
            val v = u8(im.pixels, o); (v, v, v)
          } else (u8(im.pixels, o), u8(im.pixels, o + 1),
            u8(im.pixels, o + 2))
        sr += r; sg += g; sb += bl
        val luma = (r * 299 + g * 587 + bl * 114) / 1000 // 0..255
        hist(math.min(bins - 1, luma * bins / 256)) += 1
        xx += 1
      }
      yy += 1
    }
    val n = w.toLong * h
    val out = new Array[Float](buckets)
    out(0) = (sr.toDouble / n / 255.0).toFloat
    out(1) = (sg.toDouble / n / 255.0).toFloat
    out(2) = (sb.toDouble / n / 255.0).toFloat
    var i = 0
    while (i < bins) { out(3 + i) = (hist(i).toDouble / n).toFloat; i += 1 }
    out
  }

  /** Minimal PNG encoder: the forward complement of [[pngStats]],
    * used to build deterministic decode fixtures and to round-trip-test
    * the unfilter paths. Covers every decodable shape: grey (0)
    * 1/2/4/8/16, RGB (2) 8/16, indexed (3) 1/2/4/8 with a PLTE built
    * from `palette`, grey+alpha (4) 8/16, RGBA (6) 8/16 — each in
    * interlace method 0 or Adam7 (`interlace = true`). `pixels` holds
    * one byte per sample for depth<=8 (values must fit the depth;
    * sub-byte samples are packed MSB-first) and two big-endian bytes
    * per sample for depth 16. `filterFor(i)` picks the Sec. 9 filter
    * (0..4) for the i-th TRANSMITTED scanline (pass-sequential under
    * Adam7); `idatChunks > 1` splits the zlib stream mid-byte across
    * multiple IDAT chunks (decoders must concatenate before inflating).
    */
  def pngEncode(width: Int, height: Int, colorType: Int,
      pixels: Array[Byte], filterFor: Int => Int = _ => 0,
      idatChunks: Int = 1, depth: Int = 8,
      palette: Array[Byte] = null, interlace: Boolean = false): Array[Byte] = {
    val channels = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4 }
    require(colorType != 3 || (palette != null && palette.length % 3 == 0
      && palette.length <= 256 * 3), "pngEncode: ct 3 needs a PLTE")
    val bitsPerPx = channels * depth
    val sampleBytes = if (depth == 16) 2 else 1
    val nSamples = width * height * channels
    require(pixels.length == nSamples * sampleBytes,
      s"pngEncode: ${pixels.length} sample bytes for " +
        s"$width x $height x $channels @ depth $depth")
    val fbpp = math.max(1, (bitsPerPx + 7) / 8)
    // each pass (the whole image for method 0, the seven Adam7 reduced
    // images for method 1) packs and filters independently; filterFor
    // receives the SEQUENTIAL transmitted-scanline index
    val passes = if (!interlace) Array((0, 0, 1, 1)) else Adam7
    val rawOut = new java.io.ByteArrayOutputStream()
    var rawRow = 0
    passes.foreach { case (xs, ys, xst, yst) =>
      val pw = if (width > xs) (width - xs + xst - 1) / xst else 0
      val ph = if (height > ys) (height - ys + yst - 1) / yst else 0
      if (pw > 0 && ph > 0) {
        val stride = ((pw.toLong * bitsPerPx + 7) / 8).toInt
        // pack this pass's unfiltered scanlines (identity for depth
        // 8/16 on the full-image pass)
        val packed = new Array[Byte](ph * stride)
        var y = 0
        while (y < ph) {
          var bitPos = 0
          var k = 0
          val gy = ys + y * yst
          while (k < pw * channels) {
            val gx = xs + (k / channels) * xst
            val si = ((gy * width + gx) * channels + k % channels) * sampleBytes
            depth match {
              case 16 =>
                packed(y * stride + (bitPos >> 3)) = pixels(si)
                packed(y * stride + (bitPos >> 3) + 1) = pixels(si + 1)
                bitPos += 16
              case 8 =>
                packed(y * stride + (bitPos >> 3)) = pixels(si)
                bitPos += 8
              case d =>
                val v = pixels(si) & 0xff
                require(v < (1 << d), s"pngEncode: sample $v at depth $d")
                val shift = 8 - d - (bitPos & 7)
                val o = y * stride + (bitPos >> 3)
                packed(o) = (packed(o) | (v << shift)).toByte
                bitPos += d
            }
            k += 1
          }
          y += 1
        }
        def px(o: Int): Int = packed(o) & 0xff
        val raw = new Array[Byte](ph * (1 + stride))
        y = 0
        while (y < ph) {
          val ft = math.floorMod(filterFor(rawRow), 5)
          rawRow += 1
          raw(y * (1 + stride)) = ft.toByte
          var x = 0
          while (x < stride) {
            val cur = px(y * stride + x)
            val a = if (x >= fbpp) px(y * stride + x - fbpp) else 0
            val up = if (y > 0) px((y - 1) * stride + x) else 0
            val c = if (x >= fbpp && y > 0) px((y - 1) * stride + x - fbpp)
              else 0
            val v = ft match {
              case 0 => cur
              case 1 => cur - a
              case 2 => cur - up
              case 3 => cur - ((a + up) >> 1)
              case 4 =>
                val pp = a + up - c
                val pa = math.abs(pp - a)
                val pb = math.abs(pp - up)
                val pc = math.abs(pp - c)
                cur - (if (pa <= pb && pa <= pc) a
                       else if (pb <= pc) up else c)
            }
            raw(y * (1 + stride) + 1 + x) = (v & 0xff).toByte
            x += 1
          }
          y += 1
        }
        rawOut.write(raw)
      }
    }
    val raw = rawOut.toByteArray
    val zout = new java.io.ByteArrayOutputStream()
    val dos = new java.util.zip.DeflaterOutputStream(zout)
    dos.write(raw); dos.close()
    val z = zout.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    PngSig.foreach(v => out.write(v))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      def w32(v: Long): Unit = {
        out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
        out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
      }
      w32(data.length.toLong)
      val tb = typ.getBytes("US-ASCII")
      out.write(tb, 0, 4); out.write(data, 0, data.length)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      w32(crc.getValue)
    }
    val ihdr = new Array[Byte](13)
    def be(o: Int, v: Int): Unit = {
      ihdr(o) = ((v >> 24) & 0xff).toByte; ihdr(o + 1) = ((v >> 16) & 0xff).toByte
      ihdr(o + 2) = ((v >> 8) & 0xff).toByte; ihdr(o + 3) = (v & 0xff).toByte
    }
    be(0, width); be(4, height)
    ihdr(8) = depth.toByte; ihdr(9) = colorType.toByte
    ihdr(12) = if (interlace) 1.toByte else 0.toByte
    chunk("IHDR", ihdr)
    if (colorType == 3) chunk("PLTE", palette)
    val parts = math.max(1, math.min(idatChunks, z.length))
    val per = math.max(1, z.length / parts)
    var off = 0
    while (off < z.length) {
      val n = if (off + 2 * per > z.length) z.length - off else per
      chunk("IDAT", java.util.Arrays.copyOfRange(z, off, off + n))
      off += n
    }
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  // ---- GIF pixel decode (real, pure-JVM) ---------------------------
  // GIF89a specification (CompuServe, public): logical screen
  // descriptor, global/local color tables, image descriptor, Adam-free
  // 4-pass interlace, and Appendix-F variable-width LSB-first LZW with
  // CLEAR/EOI codes and the deferred KwKwK case.

  /** Exact integer pixel statistics of the FIRST image in a GIF, from
    * a real decode (LZW + palette resolution). Same oracle-friendly
    * sum shape as [[PngStats]].
    */
  case class GifStats(width: Int, height: Int, n_pixels: Long,
      sum_r: Long, sum_g: Long, sum_b: Long, wsum: Long)

  /** Variable-width LSB-first GIF-LZW decode of the concatenated
    * data sub-blocks. Returns exactly `expected` indices or null on a
    * malformed stream.
    */
  private def lzwDecode(minCodeSize: Int, data: Array[Byte],
      expected: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val out = new Array[Byte](expected)
    var outN = 0
    var codeSize = minCodeSize + 1
    var next = eoi + 1
    var prev = -1
    var acc = 0L; var bits = 0; var pos = 0
    val stack = new Array[Byte](4096)
    def firstOf(code0: Int): Byte = {
      var c = code0
      while (c >= clear) c = prefix(c)
      c.toByte
    }
    while (outN < expected) {
      while (bits < codeSize) {
        if (pos >= data.length) return null // truncated
        acc |= (data(pos) & 0xffL) << bits
        bits += 8; pos += 1
      }
      val code = (acc & ((1 << codeSize) - 1)).toInt
      acc >>>= codeSize; bits -= codeSize
      if (code == clear) {
        codeSize = minCodeSize + 1; next = eoi + 1; prev = -1
      } else if (code == eoi) {
        return if (outN == expected) out else null
      } else {
        var cur = code
        var top = 0
        if (cur >= next) { // KwKwK: code not yet in the table
          if (cur != next || prev < 0) return null
          stack(top) = firstOf(prev); top += 1
          cur = prev
        }
        while (cur >= clear) {
          stack(top) = suffix(cur); top += 1
          cur = prefix(cur)
        }
        stack(top) = cur.toByte; top += 1
        while (top > 0 && outN < expected) {
          top -= 1; out(outN) = stack(top); outN += 1
        }
        if (top > 0) return null // stream overruns the image size
        if (prev >= 0 && next < 4096) {
          prefix(next) = prev; suffix(next) = firstOf(code)
          next += 1
          if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = code
      }
    }
    out
  }

  /** Variable-width LSB-first GIF-LZW encode — the forward complement
    * of [[lzwDecode]] (width schedule mirrored so the decoder stays in
    * step), used by [[gifEncode]].
    */
  private def lzwEncode(minCodeSize: Int, data: Array[Byte]): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0L; var bits = 0
    var codeSize = minCodeSize + 1
    def emit(code: Int): Unit = {
      acc |= code.toLong << bits; bits += codeSize
      while (bits >= 8) { out.write((acc & 0xff).toInt); acc >>>= 8; bits -= 8 }
    }
    val dict = new java.util.HashMap[Long, Integer]()
    var next = eoi + 1
    def reset(): Unit = { dict.clear(); next = eoi + 1 }
    emit(clear)
    if (data.nonEmpty) {
      var w = data(0) & 0xff // current dict code for the pending string
      var i = 1
      while (i < data.length) {
        val k = data(i) & 0xff
        val key = (w.toLong << 12) | k // (code, byte) pair is the string id
        val hit = dict.get(key)
        if (hit != null) w = hit.intValue()
        else {
          emit(w)
          if (next < 4096) {
            dict.put(key, Integer.valueOf(next))
            next += 1
            // the decoder's table lags the encoder's by exactly one
            // entry (it adds on receive, we add on emit), so it widens
            // one code later than a naive n==2^cs bump — mirror that
            if (next == (1 << codeSize) + 1 && codeSize < 12) codeSize += 1
          } else { emit(clear); codeSize = minCodeSize + 1; reset() }
          w = k
        }
        i += 1
      }
      emit(w)
    }
    emit(eoi)
    if (bits > 0) out.write((acc & 0xff).toInt)
    out.toByteArray
  }

  /** GIF interlace pass order (spec Sec. 20, Appendix E): rows
    * 0,8,16… then 4,12…, 2,6,10…, 1,3,5…
    */
  private def interlaceRows(h: Int): Array[Int] = {
    val rows = new Array[Int](h)
    var i = 0
    for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
      var y = start
      while (y < h) { rows(i) = y; i += 1; y += step }
    }
    rows
  }

  /** A fully decoded GIF first frame: `rgb` holds h scanlines of w
    * palette-resolved RGB triples, in IMAGE row order (interlace
    * already undone).
    */
  case class GifImage(width: Int, height: Int, rgb: Array[Byte])

  def gifDecode(b: Array[Byte]): GifImage = {
    if (b == null || b.length < 14) return null
    val hdr = ascii(b, 0, 6)
    if (hdr != "GIF87a" && hdr != "GIF89a") return null
    var p = 6
    val packed = u8(b, p + 4)
    p += 7 // logical screen descriptor
    var palette: Array[Byte] = null
    var palSize = 0
    if ((packed & 0x80) != 0) {
      palSize = 2 << (packed & 7)
      if (p + 3 * palSize > b.length) return null
      palette = java.util.Arrays.copyOfRange(b, p, p + 3 * palSize)
      p += 3 * palSize
    }
    while (p < b.length) {
      u8(b, p) match {
        case 0x3b => return null // trailer before any image
        case 0x21 => // extension: label + sub-blocks
          p += 2
          while (p < b.length && u8(b, p) != 0) p += 1 + u8(b, p)
          p += 1
        case 0x2c =>
          if (p + 10 > b.length) return null
          val w = le16(b, p + 5); val h = le16(b, p + 7)
          val ipacked = u8(b, p + 9)
          p += 10
          var pal = palette; var ps = palSize
          if ((ipacked & 0x80) != 0) { // local color table wins
            ps = 2 << (ipacked & 7)
            if (p + 3 * ps > b.length) return null
            pal = java.util.Arrays.copyOfRange(b, p, p + 3 * ps)
            p += 3 * ps
          }
          if (pal == null || w <= 0 || h <= 0 ||
              w.toLong * h > Int.MaxValue) return null
          val minCode = u8(b, p); p += 1
          if (minCode < 2 || minCode > 8) return null
          val lzw = new java.io.ByteArrayOutputStream()
          while (p < b.length && u8(b, p) != 0) {
            val n = u8(b, p)
            if (p + 1 + n > b.length) return null
            lzw.write(b, p + 1, n); p += 1 + n
          }
          val idx = lzwDecode(minCode, lzw.toByteArray, w * h)
          if (idx == null) return null
          val rows =
            if ((ipacked & 0x40) != 0) interlaceRows(h)
            else Array.tabulate(h)(identity)
          if (y_unused(rows, h)) return null
          val rgb = new Array[Byte](w * h * 3)
          var r = 0
          while (r < h) {
            val y = rows(r) // row r of the stream lands at image row y
            var x = 0
            while (x < w) {
              val ci = idx(r * w + x) & 0xff
              if (ci >= ps) return null // index outside the palette
              val o = (y * w + x) * 3
              rgb(o) = pal(3 * ci); rgb(o + 1) = pal(3 * ci + 1)
              rgb(o + 2) = pal(3 * ci + 2)
              x += 1
            }
            r += 1
          }
          return GifImage(w, h, rgb)
        case _ => return null
      }
    }
    null
  }

  def gifStats(b: Array[Byte]): GifStats = {
    val im = gifDecode(b)
    if (im == null) return null
    val (w, h) = (im.width, im.height)
    // wsum weights each pixel by its image position (y*w+x), so a wrong
    // interlace row mapping changes the result even though the plain
    // channel sums would not
    var sr = 0L; var sg = 0L; var sb = 0L; var ws = 0L
    var i = 0
    val n = w * h
    while (i < n) {
      val pr = im.rgb(3 * i) & 0xff
      val pg = im.rgb(3 * i + 1) & 0xff
      val pb = im.rgb(3 * i + 2) & 0xff
      sr += pr; sg += pg; sb += pb
      ws += i.toLong * (pr + pg + pb)
      i += 1
    }
    GifStats(w, h, n.toLong, sr, sg, sb, ws)
  }

  /** Same feature contract as [[pngFeatures]], from the GIF decode. */
  def gifFeatures(b: Array[Byte], buckets: Int): Array[Float] = {
    if (buckets < 4) return null
    val im = gifDecode(b)
    if (im == null) return null
    val n = im.width * im.height
    val bins = buckets - 3
    val hist = new Array[Long](bins)
    var sr = 0L; var sg = 0L; var sb = 0L
    var i = 0
    while (i < n) {
      val r = im.rgb(3 * i) & 0xff
      val g = im.rgb(3 * i + 1) & 0xff
      val bl = im.rgb(3 * i + 2) & 0xff
      sr += r; sg += g; sb += bl
      val luma = (r * 299 + g * 587 + bl * 114) / 1000
      hist(math.min(bins - 1, luma * bins / 256)) += 1
      i += 1
    }
    val out = new Array[Float](buckets)
    out(0) = (sr.toDouble / n / 255.0).toFloat
    out(1) = (sg.toDouble / n / 255.0).toFloat
    out(2) = (sb.toDouble / n / 255.0).toFloat
    var k = 0
    while (k < bins) { out(3 + k) = (hist(k).toDouble / n).toFloat; k += 1 }
    out
  }

  // interlace sanity: every image row assigned exactly once
  private def y_unused(rows: Array[Int], h: Int): Boolean = {
    val seen = new Array[Boolean](h)
    var i = 0
    while (i < h) {
      val y = rows(i)
      if (y < 0 || y >= h || seen(y)) return true
      seen(y) = true; i += 1
    }
    false
  }

  val gifStatsUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf(gifStats _)

  /** Minimal GIF89a encoder (global 256-color table, one image, real
    * LZW, optional interlace) — the forward complement of [[gifStats]]
    * for fixtures and round-trip tests.
    */
  def gifEncode(width: Int, height: Int, palette: Array[Byte],
      indices: Array[Byte], interlace: Boolean = false): Array[Byte] = {
    require(palette.length % 3 == 0 && palette.length >= 6)
    require(indices.length == width * height)
    var palBits = 1
    while ((2 << (palBits - 1)) < palette.length / 3) palBits += 1
    val palEntries = 2 << (palBits - 1)
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v); w8(v >> 8) }
    "GIF89a".foreach(c => w8(c))
    w16(width); w16(height)
    w8(0x80 | (palBits - 1)) // GCT present, size 2^palBits
    w8(0); w8(0)
    out.write(palette, 0, palette.length)
    (palette.length / 3 until palEntries)
      .foreach(_ => { w8(0); w8(0); w8(0) }) // pad table to 2^n
    w8(0x2c); w16(0); w16(0); w16(width); w16(height)
    w8(if (interlace) 0x40 else 0)
    val minCode = math.max(2, palBits)
    w8(minCode)
    val src =
      if (!interlace) indices
      else {
        val rows = interlaceRows(height)
        val re = new Array[Byte](indices.length)
        for (r <- 0 until height; x <- 0 until width)
          re(r * width + x) = indices(rows(r) * width + x)
        re
      }
    val z = lzwEncode(minCode, src)
    var off = 0
    while (off < z.length) {
      val n = math.min(255, z.length - off)
      w8(n); out.write(z, off, n); off += n
    }
    w8(0) // block terminator
    w8(0x3b)
    out.toByteArray
  }

  // ---- MP4 sample-table extraction (real, pure-JVM) ----------------
  // ISO/IEC 14496-12 sample tables: stsz (sizes), stsc
  // (sample-to-chunk runs), stco/co64 (chunk offsets), stss (sync
  // samples). Computing per-sample absolute offsets from these is the
  // real container-level frame access a video pipeline needs; only
  // the codec decode of the sample BYTES stays out of scope.

  /** `timestamp` is the stts decode time in MILLISECONDS (mdhd
    * timescale applied), -1 when the file carries no stts — parity
    * with the WebM walker's cluster-relative times.
    */
  case class Mp4Sample(index: Int, offset: Long, size: Long,
      keyframe: Boolean, timestamp: Long = -1L)

  /** One trak's sample tables, accumulated TOGETHER as the walk
    * descends that trak's subtree — stts and mdhd must pair with the
    * stsz/stsc/stco of the SAME track, or a multi-track file whose
    * first trak lacks an stts would scale the video sample times by
    * the audio trak's timescale (or the 1000 default).
    */
  private final class Mp4Tables {
    var sizes: Array[Long] = null
    var chunkOffsets: Array[Long] = null
    // (first_chunk, samples_per_chunk) runs from stsc
    var stsc: Array[(Long, Long)] = null
    var sync: Set[Long] = null // 1-based keyframe sample numbers
    var stts: Array[(Long, Long)] = null // (sample_count, delta) runs
    var timescale = 1000L // mdhd ticks/second; 1000 = ms if absent
    var timescaleSet = false
    var codec: String = null // stsd first-entry fourcc (avc1/mp4a/tx3g/...)
    // a usable track has the three tables sample layout needs
    def complete: Boolean = sizes != null && chunkOffsets != null &&
      stsc != null && stsc.nonEmpty
  }

  /** All COMPLETE traks in document order (boxes outside any trak —
    * off-spec flat files and our own minimal fixtures — accumulate in
    * a root fallback appended last when no real trak completed).
    */
  private def mp4Traks(b: Array[Byte]): Seq[Mp4Tables] = {
    if (b == null || b.length < 16 || ascii(b, 4, 4) != "ftyp")
      return Seq.empty
    val root = new Mp4Tables
    val traks = scala.collection.mutable.ArrayBuffer.empty[Mp4Tables]
    def walk(from: Long, to: Long, depth: Int, t: Mp4Tables): Unit = {
      var p = from
      while (p + 8 <= to && depth < 8) {
        var size = be32(b, p.toInt)
        val id = ascii(b, p.toInt + 4, 4)
        var hdr = 8L
        if (size == 1 && p + 16 <= to) {
          size = (be32(b, p.toInt + 8) << 32) | be32(b, p.toInt + 12)
          hdr = 16L
        } else if (size == 0) size = to - p
        if (size < hdr) return
        val end = math.min(p + size, to)
        val body = p + hdr
        id match {
          case "trak" =>
            // each trak gets its OWN table set, so stts/mdhd can only
            // pair with sample tables from the same subtree
            val ctx = new Mp4Tables
            walk(body, end, depth + 1, ctx)
            if (ctx.complete) traks += ctx
          case "moov" | "mdia" | "minf" | "stbl" =>
            walk(body, end, depth + 1, t)
          case "stsz" if t.sizes == null && body + 12 <= to =>
            val uniform = be32(b, (body + 4).toInt)
            val n = be32(b, (body + 8).toInt).toInt
            if (n >= 0 && n < 1000000) {
              if (uniform != 0) t.sizes = Array.fill(n)(uniform)
              else if (body + 12 + 4L * n <= to)
                t.sizes =
                  Array.tabulate(n)(i => be32(b, (body + 12 + 4L * i).toInt))
            }
          case "stsc" if t.stsc == null && body + 8 <= to =>
            val n = be32(b, (body + 4).toInt).toInt
            if (n >= 0 && n < 100000 && body + 8 + 12L * n <= to)
              t.stsc = Array.tabulate(n) { i =>
                (be32(b, (body + 8 + 12L * i).toInt),
                  be32(b, (body + 12 + 12L * i).toInt))
              }
          case "stco" if t.chunkOffsets == null && body + 8 <= to =>
            val n = be32(b, (body + 4).toInt).toInt
            if (n >= 0 && n < 100000 && body + 8 + 4L * n <= to)
              t.chunkOffsets = Array.tabulate(n)(i =>
                be32(b, (body + 8 + 4L * i).toInt))
          case "co64" if t.chunkOffsets == null && body + 8 <= to =>
            val n = be32(b, (body + 4).toInt).toInt
            if (n >= 0 && n < 100000 && body + 8 + 8L * n <= to)
              t.chunkOffsets = Array.tabulate(n)(i =>
                (be32(b, (body + 8 + 8L * i).toInt) << 32) |
                  be32(b, (body + 12 + 8L * i).toInt))
          case "stss" if t.sync == null && body + 8 <= to =>
            val n = be32(b, (body + 4).toInt).toInt
            if (n >= 0 && n < 1000000 && body + 8 + 4L * n <= to)
              t.sync = (0 until n).map(i =>
                be32(b, (body + 8 + 4L * i).toInt)).toSet
          case "stts" if t.stts == null && body + 8 <= to =>
            val n = be32(b, (body + 4).toInt).toInt
            if (n >= 0 && n < 1000000 && body + 8 + 8L * n <= to)
              t.stts = Array.tabulate(n) { i =>
                (be32(b, (body + 8 + 8L * i).toInt),
                  be32(b, (body + 12 + 8L * i).toInt))
              }
          case "stsd" if t.codec == null && body + 16 <= to =>
            // fullbox(4) + entry_count(4) + first entry: size(4) +
            // fourcc(4) — the codec identity a track router needs
            t.codec = ascii(b, (body + 12).toInt, 4)
          case "mdhd" if !t.timescaleSet && body + 4 <= to =>
            // timescale sits past the version-dependent create/modify
            // times: v0 at +12 (two u32 times), v1 at +20 (two u64)
            val tsOff = if (u8(b, body.toInt) == 1) body + 20 else body + 12
            if (tsOff + 4 <= to) {
              val v = be32(b, tsOff.toInt)
              if (v > 0) { t.timescale = v; t.timescaleSet = true }
            }
          case _ => ()
        }
        p = end
      }
    }
    walk(0L, b.length.toLong, 0, root)
    if (traks.nonEmpty) traks.toSeq
    else if (root.complete) Seq(root)
    else Seq.empty
  }

  /** First-complete-trak samples (the prior behavior, unchanged). */
  def mp4Samples(b: Array[Byte]): Seq[Mp4Sample] =
    mp4Traks(b).headOption.map(t => expandMp4Samples(b, t))
      .getOrElse(Seq.empty)

  private def expandMp4Samples(b: Array[Byte],
      tbl: Mp4Tables): Seq[Mp4Sample] = {
    val sizes = tbl.sizes
    val chunkOffsets = tbl.chunkOffsets
    val stsc = tbl.stsc
    val sync = tbl.sync
    val stts = tbl.stts
    val timescale = tbl.timescale
    // decode times: cumulative stts deltas, ms via the mdhd timescale;
    // a short stts extends its last delta (lenient on off-spec files)
    val times: Array[Long] =
      if (stts == null) null
      else {
        val t = new Array[Long](sizes.length)
        var cum = 0L; var si = 0; var r = 0; var inRun = 0L
        var delta = if (stts.nonEmpty) stts(0)._2 else 0L
        while (si < t.length) {
          while (r < stts.length && inRun >= stts(r)._1) { r += 1; inRun = 0 }
          if (r < stts.length) delta = stts(r)._2
          t(si) = cum * 1000L / timescale
          cum += delta
          inRun += 1
          si += 1
        }
        t
      }
    // expand stsc runs -> samples-per-chunk per chunk, then walk chunks
    val out = Vector.newBuilder[Mp4Sample]
    var sample = 0 // 0-based
    var chunk = 0  // 0-based
    while (chunk < chunkOffsets.length && sample < sizes.length) {
      // samples in this chunk = the last stsc run whose first_chunk <= chunk+1
      var spc = stsc(0)._2
      var r = 0
      while (r < stsc.length && stsc(r)._1 <= chunk + 1) {
        spc = stsc(r)._2; r += 1
      }
      var off = chunkOffsets(chunk)
      var i = 0L
      while (i < spc && sample < sizes.length) {
        val sz = sizes(sample)
        out += Mp4Sample(sample, off, sz,
          sync == null || sync.contains(sample + 1L),
          if (times == null) -1L else times(sample))
        off += sz
        sample += 1
        i += 1
      }
      chunk += 1
    }
    out.result()
  }

  /** One timed-text cue from an MP4 tx3g/text track (3GPP TS 26.245):
    * start/duration in ms from the track's own stts+mdhd; text from
    * the u16-big-endian-length-prefixed sample payload.
    */
  case class Mp4Cue(track: Int, start: Long, duration: Long, text: String)

  /** Timed-text cues from the first tx3g/text/sbtt track — the MP4
    * counterpart of [[webmSubtitles]]: a muxed video's caption track
    * IS its training text. Tracks are routed by the stsd fourcc, so a
    * video/audio trak appearing first no longer hides the text track.
    * Total on arbitrary bytes; empty when no text track exists.
    */
  def mp4Subtitles(b: Array[Byte]): Seq[Mp4Cue] = {
    val traks = mp4Traks(b)
    val textCodecs = Set("tx3g", "text", "sbtt")
    traks.zipWithIndex.collectFirst {
      case (t, k) if t.codec != null && textCodecs.contains(t.codec) =>
        val samples = expandMp4Samples(b, t)
        val lastDeltaMs =
          if (t.stts != null && t.stts.nonEmpty)
            t.stts.last._2 * 1000L / t.timescale
          else -1L
        samples.zipWithIndex.flatMap { case (s0, i) =>
          if (s0.offset < 0 || s0.size < 2 ||
            s0.offset + s0.size > b.length) None
          else {
            val off = s0.offset.toInt
            val len = be16(b, off)
            if (len < 0 || off + 2 + len > b.length ||
              len > s0.size - 2) None
            else {
              val txt = new String(b, off + 2, len, "UTF-8")
              val dur =
                if (s0.timestamp < 0) -1L
                else if (i + 1 < samples.length &&
                  samples(i + 1).timestamp >= 0)
                  samples(i + 1).timestamp - s0.timestamp
                else lastDeltaMs
              // empty cues are gaps between subtitles, not text
              if (txt.isEmpty) None
              else Some(Mp4Cue(k, s0.timestamp, dur, txt))
            }
          }
        }
    }.getOrElse(Seq.empty)
  }

  val mp4SubtitlesUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf(mp4Subtitles _)

  /** Fixture complement of [[mp4Subtitles]]: a MUXED ISO-BMFF file —
    * one moov holding N traks (each with its own stsd fourcc,
    * stsz/stsc/stco, optional stts+mdhd), all samples laid out in one
    * mdat at the offsets the tables declare. Text-track samples must
    * already carry their u16-length prefix (use [[tx3gSample]]).
    */
  case class Mp4TrackSpec(codec: String, samples: Seq[Array[Byte]],
      deltas: Seq[Long] = Nil, timescale: Long = 1000L,
      samplesPerChunk: Int = 2)

  def tx3gSample(text: String): Array[Byte] = {
    val tb = text.getBytes("UTF-8")
    Array(((tb.length >> 8) & 0xff).toByte,
      (tb.length & 0xff).toByte) ++ tb
  }

  def mp4BuildTracks(tracks: Seq[Mp4TrackSpec]): Array[Byte] = {
    def be(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(id: String, payload: Array[Byte]): Array[Byte] =
      be(8L + payload.length) ++ id.getBytes("US-ASCII") ++ payload
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ be(0) ++
      "isomiso2".getBytes("US-ASCII"))
    def trakBytes(t: Mp4TrackSpec, chunkOffs: Seq[Long]): Array[Byte] = {
      val n = t.samples.length
      val nChunks = (n + t.samplesPerChunk - 1) / t.samplesPerChunk
      val stsdB = box("stsd", be(0) ++ be(1) ++
        box(t.codec, new Array[Byte](8)))
      val stszB = box("stsz", be(0) ++ be(0) ++ be(n.toLong) ++
        t.samples.flatMap(s0 => be(s0.length.toLong)).toArray)
      val stscB = box("stsc", be(0) ++ be(1) ++
        (be(1) ++ be(t.samplesPerChunk.toLong) ++ be(1)))
      val stcoB = box("stco", be(0) ++ be(nChunks.toLong) ++
        chunkOffs.flatMap(be).toArray)
      val sttsB =
        if (t.deltas.isEmpty) Array.emptyByteArray
        else {
          val runs = scala.collection.mutable.ArrayBuffer
            .empty[(Long, Long)]
          t.deltas.foreach { dlt =>
            if (runs.nonEmpty && runs.last._2 == dlt)
              runs(runs.length - 1) = (runs.last._1 + 1, dlt)
            else runs += ((1L, dlt))
          }
          box("stts", be(0) ++ be(runs.length.toLong) ++
            runs.flatMap { case (c, dl) => be(c) ++ be(dl) }.toArray)
        }
      val mdhdB =
        if (t.deltas.isEmpty) Array.emptyByteArray
        else box("mdhd", be(0) ++ be(0) ++ be(0) ++ be(t.timescale) ++
          be(t.deltas.sum) ++ be(0))
      val stbl = box("stbl", stsdB ++ stszB ++ stscB ++ stcoB ++ sttsB)
      box("trak", box("mdia", mdhdB ++ box("minf", stbl)))
    }
    // two-pass: zero offsets to learn the layout, then patch
    def assemble(offsetsPerTrack: Seq[Seq[Long]]): Array[Byte] = {
      val moov = box("moov",
        tracks.zip(offsetsPerTrack).flatMap { case (t, o) =>
          trakBytes(t, o)
        }.toArray)
      val mdat = box("mdat", tracks.flatMap(_.samples.flatten).toArray)
      ftyp ++ moov ++ mdat
    }
    val zeroOffs = tracks.map { t =>
      Seq.fill((t.samples.length + t.samplesPerChunk - 1) /
        t.samplesPerChunk)(0L)
    }
    val probe = assemble(zeroOffs)
    val mdatStart =
      probe.length - tracks.map(_.samples.map(_.length).sum).sum + 0
    var cursor = mdatStart.toLong
    val realOffs = tracks.map { t =>
      val offs = scala.collection.mutable.ArrayBuffer.empty[Long]
      var inChunk = 0
      t.samples.foreach { s0 =>
        if (inChunk == 0) offs += cursor
        cursor += s0.length
        inChunk = (inChunk + 1) % t.samplesPerChunk
      }
      offs.toSeq
    }
    assemble(realOffs)
  }

  /** Fixture complement of [[mp4Samples]]: a minimal ISO-BMFF file
    * with real stsz/stsc/stco/stss tables and the sample bytes laid
    * out in an mdat at the offsets the tables declare.
    */
  def mp4Build(samples: Seq[Array[Byte]], samplesPerChunk: Int,
      keyframes1Based: Seq[Int], deltas: Seq[Long] = Nil,
      timescale: Long = 1000L): Array[Byte] = {
    require(samplesPerChunk > 0)
    require(deltas.isEmpty || deltas.length == samples.length,
      "mp4Build: deltas must be empty or one per sample")
    val bos = new java.io.ByteArrayOutputStream()
    def be(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(id: String, payload: Array[Byte]): Array[Byte] =
      be(8L + payload.length) ++ id.getBytes("US-ASCII") ++ payload
    val n = samples.length
    val nChunks = (n + samplesPerChunk - 1) / samplesPerChunk
    val stszB = box("stsz", be(0) ++ be(0) ++ be(n.toLong) ++
      samples.flatMap(s => be(s.length.toLong)).toArray)
    val stscB = box("stsc", be(0) ++ be(1) ++
      (be(1) ++ be(samplesPerChunk.toLong) ++ be(1)))
    val stssB = box("stss", be(0) ++ be(keyframes1Based.length.toLong) ++
      keyframes1Based.flatMap(k => be(k.toLong)).toArray)
    // chunk offsets depend on the total header length — compute with a
    // placeholder stco of the right size, then patch
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ be(0) ++
      "isomiso2".getBytes("US-ASCII"))
    val stcoPayloadLen = 8 + 4 * nChunks
    def assemble(chunkOffs: Seq[Long]): Array[Byte] = {
      val stcoB = box("stco", be(0) ++ be(nChunks.toLong) ++
        chunkOffs.flatMap(be).toArray)
      // stts as run-length (count, delta) entries; mdhd carries the
      // timescale the decode times are expressed in
      val sttsB =
        if (deltas.isEmpty) Array.emptyByteArray
        else {
          val runs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
          deltas.foreach { dlt =>
            if (runs.nonEmpty && runs.last._2 == dlt)
              runs(runs.length - 1) = (runs.last._1 + 1, dlt)
            else runs += ((1L, dlt))
          }
          box("stts", be(0) ++ be(runs.length.toLong) ++
            runs.flatMap { case (c, dl) => be(c) ++ be(dl) }.toArray)
        }
      val mdhdB =
        if (deltas.isEmpty) Array.emptyByteArray
        else box("mdhd", be(0) ++ be(0) ++ be(0) ++ be(timescale) ++
          be(deltas.sum) ++ be(0))
      val stbl = box("stbl", stszB ++ stscB ++ stcoB ++ stssB ++ sttsB)
      val minf = box("minf", stbl)
      val mdia = box("mdia", mdhdB ++ minf)
      val trak = box("trak", mdia)
      val moov = box("moov", trak)
      val mdat = box("mdat", samples.flatten.toArray)
      ftyp ++ moov ++ mdat
    }
    // first pass with zero offsets to learn where mdat data starts
    val probeBytes = assemble(Seq.fill(nChunks)(0L))
    val mdatDataStart = probeBytes.length - samples.map(_.length).sum
    val chunkOffs = {
      val offs = new Array[Long](nChunks)
      var off = mdatDataStart.toLong
      var c = 0; var si = 0
      while (c < nChunks) {
        offs(c) = off
        var i = 0
        while (i < samplesPerChunk && si < n) {
          off += samples(si).length; si += 1; i += 1
        }
        c += 1
      }
      offs.toSeq
    }
    bos.write(assemble(chunkOffs))
    bos.toByteArray
  }

  // ---- Matroska/WebM sample extraction ------------------------------
  // The second major web video container (RFC 8794 EBML + the public
  // Matroska spec), parallel to the MP4 stsz/stsc/stco walk above:
  // Segment → Cluster (0x1F43B675) → Timestamp (0xE7) + SimpleBlock
  // (0xA3) / BlockGroup (0xA0 → Block 0xA1 + ReferenceBlock 0xFB).
  // Each (Simple)Block payload is: track vint, int16 big-endian
  // timestamp relative to the cluster, flags byte, frame bytes.
  // Keyframes: SimpleBlock flag bit 0x80; for Block, the absence of a
  // ReferenceBlock sibling. Laced blocks (flags bits 1-2: Xiph /
  // fixed-size / EBML — the standard packing for audio tracks) expand
  // to one row per packed frame at the block's timestamp; total on
  // arbitrary bytes. Codec decode of the frame bytes stays out of
  // scope, exactly like MP4.

  case class WebmSample(index: Int, track: Long, timestamp: Long,
      offset: Long, size: Long, keyframe: Boolean, duration: Long = -1L)

  /** One subtitle cue from a Matroska S_TEXT track: the MKV-embedded
    * equivalent of an SRT/VTT entry (cluster-absolute start, the
    * BlockGroup's BlockDuration, UTF-8 cue text).
    */
  case class WebmCue(track: Long, start: Long, duration: Long,
      text: String)

  def webmSamples(b: Array[Byte]): Seq[WebmSample] =
    webmScan(b)._2

  /** Subtitle cues of every S_TEXT-prefixed track (the Matroska codec
    * id family for SRT/ASS/USF text subtitles). Frames of non-text tracks are
    * ignored; total on arbitrary bytes.
    */
  def webmSubtitles(b: Array[Byte]): Seq[WebmCue] = {
    // subtitlesOnly: a feature-length caption-less video costs the
    // byte walk, not a frame-row Vector for every video/audio sample
    val (codecs, samples) = webmScan(b, subtitlesOnly = true)
    val textTracks = codecs.collect {
      case (t, c) if c != null && c.startsWith("S_TEXT") => t
    }.toSet
    samples.collect {
      case s if textTracks.contains(s.track) &&
          s.offset >= 0 && s.offset + s.size <= b.length =>
        val raw = new String(b, s.offset.toInt, s.size.toInt,
          java.nio.charset.StandardCharsets.UTF_8)
        val ass = codecs.get(s.track).exists(c =>
          c == "S_TEXT/ASS" || c == "S_TEXT/SSA")
        WebmCue(s.track, s.timestamp, s.duration,
          if (ass) stripAssCue(raw) else raw)
    }
  }

  /** ASS/SSA cue payloads in Matroska carry the Dialogue line's
    * leading fields (ReadOrder,Layer,Style,Name,MarginL,MarginR,
    * MarginV,Effect,Text — text is everything after the 8th comma)
    * plus inline override tags like `{\i1}` and `\N` hard breaks; a
    * text pipeline wants the words, not the styling.
    */
  private def stripAssCue(raw: String): String = {
    var idx = 0
    var commas = 0
    while (commas < 8 && idx < raw.length) {
      if (raw.charAt(idx) == ',') commas += 1
      idx += 1
    }
    val body = if (commas == 8) raw.substring(idx) else raw
    body.replaceAll("\\{\\\\[^}]*\\}", "")
      .replace("\\N", "\n").replace("\\n", "\n")
      .replace("\\h", " ")
  }

  /** Shared EBML walk: (track → CodecID) from the Tracks element plus
    * every (Simple)Block frame row. With `subtitlesOnly`, block rows
    * are emitted only for tracks whose CodecID (seen so far — Tracks
    * precedes Clusters in spec-ordered files) is S_TEXT-prefixed.
    * See [[webmSamples]] for layout notes.
    */
  private def webmScan(b: Array[Byte], subtitlesOnly: Boolean = false)
      : (Map[Long, String], Seq[WebmSample]) = {
    if (b == null || b.length < 8 || u8(b, 0) != 0x1a || u8(b, 1) != 0x45 ||
        u8(b, 2) != 0xdf || u8(b, 3) != 0xa3)
      return (Map.empty, Seq.empty)
    // (value, width) of the vint at p, or null when malformed
    def vint(p: Int, keepMarker: Boolean): (Long, Int) = {
      if (p >= b.length) return null
      val fb = u8(b, p)
      if (fb == 0) return null
      val w = Integer.numberOfLeadingZeros(fb) - 24 + 1
      if (p + w > b.length) return null
      var v: Long = if (keepMarker) fb.toLong else (fb & (0xff >>> w)).toLong
      var k = 1
      while (k < w) { v = (v << 8) | u8(b, p + k); k += 1 }
      (v, w)
    }
    def beUint(off: Int, len: Int): Long = {
      var v = 0L; var k = 0
      while (k < len) { v = (v << 8) | u8(b, off + k); k += 1 }
      v
    }
    val out = Vector.newBuilder[WebmSample]
    val codecs = Map.newBuilder[Long, String]
    var textTracks = Set.empty[Long] // live view for subtitlesOnly
    var index = 0
    var clusterTs = 0L
    // Matroska timestamps are in TimestampScale units (ns/tick,
    // default 1,000,000 = 1 ms/tick); Info precedes Clusters in
    // spec-ordered files, so the scale is in force before any block
    var scaleNs = 1000000L
    def toMs(ticks: Long): Long =
      if (scaleNs == 1000000L) ticks else ticks * scaleNs / 1000000L
    // one (Simple)Block payload at [from, to): emit the frame row(s).
    // Lacing (flags bits 1-2: 1=Xiph, 2=fixed-size, 3=EBML) packs
    // several frames into one block — standard for audio tracks —
    // each becoming its own row at the block's timestamp.
    def block(from: Int, to: Int, simpleKey: Boolean,
        groupHasRef: Boolean, isSimple: Boolean, duration: Long): Unit = {
      val tv = vint(from, keepMarker = false)
      if (tv == null || from + tv._2 + 3 > to) return
      if (subtitlesOnly && !textTracks.contains(tv._1)) return
      val rel = (beUint(from + tv._2, 2).toInt << 16) >> 16 // signed int16
      val flags = u8(b, from + tv._2 + 2)
      val lacing = (flags >> 1) & 0x3
      var p = from + tv._2 + 3
      if (p > to) return
      val key = if (isSimple) simpleKey else !groupHasRef
      val ts = toMs(clusterTs + rel)
      val durMs = if (duration < 0) -1L else toMs(duration)
      if (lacing == 0) {
        out += WebmSample(index, tv._1, ts, p.toLong, (to - p).toLong,
          key, durMs)
        index += 1
        return
      }
      if (p >= to) return
      val nFrames = u8(b, p) + 1
      p += 1
      val sizes = new Array[Long](nFrames)
      lacing match {
        case 1 => // Xiph: 255-continued byte sums for frames 0..n-2
          var i = 0
          while (i < nFrames - 1) {
            var sz = 0L
            var v = 255
            while (v == 255) {
              if (p >= to) return
              v = u8(b, p); p += 1; sz += v
            }
            sizes(i) = sz; i += 1
          }
        case 3 => // EBML: first size a vint, then signed vint deltas
          val fv = vint(p, keepMarker = false)
          if (fv == null || p + fv._2 > to) return
          sizes(0) = fv._1; p += fv._2
          var i = 1
          while (i < nFrames - 1) {
            val dv = vint(p, keepMarker = false)
            if (dv == null || p + dv._2 > to) return
            val bias = (1L << (7 * dv._2 - 1)) - 1
            sizes(i) = sizes(i - 1) + (dv._1 - bias)
            if (sizes(i) < 0) return // hostile delta underflow
            p += dv._2; i += 1
          }
        case _ => () // fixed-size: derived from the remainder below
      }
      val remaining = (to - p).toLong
      if (lacing == 2) {
        if (remaining % nFrames != 0) return // must divide evenly
        java.util.Arrays.fill(sizes, remaining / nFrames)
      } else {
        var known = 0L
        var i = 0
        while (i < nFrames - 1) { known += sizes(i); i += 1 }
        if (known > remaining) return // truncated/hostile size table
        sizes(nFrames - 1) = remaining - known
      }
      var off = p.toLong
      var i = 0
      while (i < nFrames) {
        if (off + sizes(i) > to) return // keep the frames emitted so far
        out += WebmSample(index, tv._1, ts, off, sizes(i), key, durMs)
        index += 1
        off += sizes(i)
        i += 1
      }
    }
    // one TrackEntry payload: TrackNumber (0xD7) + CodecID (0x86)
    def trackEntry(from: Int, to: Int): Unit = {
      var q = from
      var trackNum = -1L
      var codec: String = null
      var inner = true
      while (inner && q < to) {
        val iv = vint(q, keepMarker = true)
        if (iv == null) inner = false
        else {
          val isv = vint(q + iv._2, keepMarker = false)
          if (isv == null) inner = false
          else {
            val ds = q + iv._2 + isv._2
            val de = math.min(ds + isv._1, to.toLong).toInt
            if (ds > to) inner = false
            else {
              if (iv._1 == 0xD7L && de - ds <= 8) trackNum = beUint(ds, de - ds)
              if (iv._1 == 0x86L)
                codec = ascii(b, ds, de - ds).takeWhile(_ != '\u0000')
              q = de
            }
          }
        }
      }
      if (trackNum >= 0) {
        codecs += trackNum -> codec
        if (codec != null && codec.startsWith("S_TEXT"))
          textTracks += trackNum
      }
    }
    def walk(from: Int, to: Int, depth: Int, inCluster: Boolean): Unit = {
      var p = from
      var ok = true
      while (ok && p < to && depth < 8) {
        val idv = vint(p, keepMarker = true)
        if (idv == null) ok = false
        else {
          val sv = vint(p + idv._2, keepMarker = false)
          if (sv == null) ok = false
          else {
            val dataStart = p + idv._2 + sv._2
            val unknown = sv._1 == (1L << (7 * sv._2)) - 1
            val end =
              if (unknown) to
              else math.min(dataStart + sv._1, to.toLong).toInt
            if (dataStart > to) ok = false
            else {
              idv._1 match {
                case 0x18538067L => // Segment
                  walk(dataStart, end, depth + 1, inCluster = false)
                case 0x1F43B675L => // Cluster
                  walk(dataStart, end, depth + 1, inCluster = true)
                case 0xE7L if inCluster && end - dataStart <= 8 =>
                  clusterTs = beUint(dataStart, end - dataStart)
                case 0x1549A966L => // Info: TimestampScale child
                  var q = dataStart
                  var inner = true
                  while (inner && q < end) {
                    val iv = vint(q, keepMarker = true)
                    if (iv == null) inner = false
                    else {
                      val isv = vint(q + iv._2, keepMarker = false)
                      if (isv == null) inner = false
                      else {
                        val ds = q + iv._2 + isv._2
                        val de = math.min(ds + isv._1, end.toLong).toInt
                        if (ds > end) inner = false
                        else {
                          if (iv._1 == 0x2AD7B1L && de - ds <= 8) {
                            val v = beUint(ds, de - ds)
                            if (v > 0) scaleNs = v
                          }
                          q = de
                        }
                      }
                    }
                  }
                case 0x1654AE6BL => // Tracks: TrackEntry children
                  var q = dataStart
                  var inner = true
                  while (inner && q < end) {
                    val iv = vint(q, keepMarker = true)
                    if (iv == null) inner = false
                    else {
                      val isv = vint(q + iv._2, keepMarker = false)
                      if (isv == null) inner = false
                      else {
                        val ds = q + iv._2 + isv._2
                        val de = math.min(ds + isv._1, end.toLong).toInt
                        if (ds > end) inner = false
                        else {
                          if (iv._1 == 0xAEL) trackEntry(ds, de)
                          q = de
                        }
                      }
                    }
                  }
                case 0xA3L if inCluster => // SimpleBlock
                  // flags bit 0x80 = keyframe; peek it via the block
                  // payload's own layout
                  val tv = vint(dataStart, keepMarker = false)
                  val key = tv != null && dataStart + tv._2 + 3 <= end &&
                    (u8(b, dataStart + tv._2 + 2) & 0x80) != 0
                  block(dataStart, end, simpleKey = key,
                    groupHasRef = false, isSimple = true, duration = -1L)
                case 0xA0L if inCluster => // BlockGroup
                  // two passes: ReferenceBlock presence decides the
                  // keyframe flag of the contained Block; BlockDuration
                  // (0x9B) rides along for subtitle cues
                  var hasRef = false
                  var dur = -1L
                  var blockStart = -1; var blockEnd = -1
                  var q = dataStart
                  var inner = true
                  while (inner && q < end) {
                    val iv = vint(q, keepMarker = true)
                    if (iv == null) inner = false
                    else {
                      val isv = vint(q + iv._2, keepMarker = false)
                      if (isv == null) inner = false
                      else {
                        val ds = q + iv._2 + isv._2
                        val de = math.min(ds + isv._1, end.toLong).toInt
                        if (ds > end) inner = false
                        else {
                          if (iv._1 == 0xFBL) hasRef = true
                          if (iv._1 == 0x9BL && de - ds <= 8)
                            dur = beUint(ds, de - ds)
                          if (iv._1 == 0xA1L) { blockStart = ds; blockEnd = de }
                          q = de
                        }
                      }
                    }
                  }
                  if (blockStart >= 0)
                    block(blockStart, blockEnd, simpleKey = false,
                      groupHasRef = hasRef, isSimple = false, duration = dur)
                case _ => () // EBML header, Info, … — no frames
              }
              if (unknown) ok = false else p = end
            }
          }
        }
      }
    }
    walk(0, b.length, 0, inCluster = false)
    (codecs.result(), out.result())
  }

  /** One fixture block for [[webmBuild]]: written as a SimpleBlock,
    * or as a BlockGroup/Block when `useGroup` (ReferenceBlock added
    * when not a keyframe; BlockDuration when `durationMs >= 0` —
    * duration forces the BlockGroup form, as in real files). When
    * `lacedFrames` is non-empty the block packs those frames with
    * `lacing` (1 = Xiph, 2 = fixed-size, 3 = EBML) and `bytes` is
    * ignored.
    */
  case class WebmBlockSpec(track: Long, rel: Int, keyframe: Boolean,
      useGroup: Boolean, bytes: Array[Byte], durationMs: Long = -1L,
      lacing: Int = 0, lacedFrames: Seq[Array[Byte]] = Nil)

  /** Fixture complement of [[webmSamples]]/[[webmSubtitles]]: a
    * minimal EBML/WebM file — EBML header with DocType, a Segment
    * holding an optional Tracks element ((number, CodecID) pairs)
    * then `clusters` of (clusterTimestamp, blocks).
    */
  def webmBuild(clusters: Seq[(Long, Seq[WebmBlockSpec])],
      tracks: Seq[(Long, String)] = Nil,
      docType: String = "webm",
      timestampScaleNs: Long = -1L): Array[Byte] = {
    def vintSize(n: Long): Array[Byte] = {
      var w = 1
      while (w < 8 && n >= (1L << (7 * w)) - 1) w += 1
      val out = new Array[Byte](w)
      out(0) = ((0x100 >> w) | ((n >> (8 * (w - 1))) & ((0xff >> w)))).toByte
      var k = 1
      while (k < w) {
        out(k) = ((n >> (8 * (w - 1 - k))) & 0xff).toByte; k += 1
      }
      out
    }
    def idBytes(id: Long): Array[Byte] = {
      val w = (64 - java.lang.Long.numberOfLeadingZeros(id) + 7) / 8
      Array.tabulate(w)(k => ((id >> (8 * (w - 1 - k))) & 0xff).toByte)
    }
    def el(id: Long, payload: Array[Byte]): Array[Byte] =
      idBytes(id) ++ vintSize(payload.length.toLong) ++ payload
    def beMin(v: Long): Array[Byte] = { // big-endian, minimal width
      val w = math.max(1, (64 - java.lang.Long.numberOfLeadingZeros(v) + 7) / 8)
      Array.tabulate(w)(k => ((v >> (8 * (w - 1 - k))) & 0xff).toByte)
    }
    val header = el(0x1A45DFA3L,
      el(0x4282L, docType.getBytes("US-ASCII")))
    val infoBytes =
      if (timestampScaleNs <= 0) Array.emptyByteArray
      else el(0x1549A966L, el(0x2AD7B1L, beMin(timestampScaleNs)))
    val tracksBytes =
      if (tracks.isEmpty) Array.emptyByteArray
      else el(0x1654AE6BL, tracks.flatMap { case (num, codec) =>
        el(0xAEL, el(0xD7L, beMin(num)) ++
          el(0x86L, codec.getBytes("US-ASCII")))
      }.toArray)
    val clusterBytes = clusters.map { case (ts, blocks) =>
      val body = new java.io.ByteArrayOutputStream()
      body.write(el(0xE7L, beMin(ts)))
      blocks.foreach { sp =>
        val group = sp.useGroup || sp.durationMs >= 0
        val tb = vintSize(sp.track) // track number vint (marker form)
        val laced = sp.lacedFrames.nonEmpty
        val flags = (if (sp.keyframe && !group) 0x80 else 0x00) |
          (if (laced) (sp.lacing & 0x3) << 1 else 0)
        val blockBody: Array[Byte] =
          if (!laced) sp.bytes
          else {
            val fs = sp.lacedFrames
            val bos = new java.io.ByteArrayOutputStream()
            bos.write(fs.length - 1)
            sp.lacing match {
              case 1 => // Xiph: 255-continued sizes for frames 0..n-2
                fs.dropRight(1).foreach { f =>
                  var sz = f.length
                  while (sz >= 255) { bos.write(255); sz -= 255 }
                  bos.write(sz)
                }
              case 3 => // EBML: first size a vint, then width-2 signed
                // vint deltas (bias 8191 at width 2)
                bos.write(vintSize(fs.head.length.toLong))
                fs.sliding(2).toSeq.dropRight(1).foreach { pair =>
                  val delta = pair(1).length - pair(0).length
                  val v = delta + 8191
                  require(v >= 0 && v < 16383,
                    "webmBuild: EBML lace delta out of width-2 range")
                  bos.write(0x40 | (v >> 8)); bos.write(v & 0xff)
                }
              case 2 =>
                require(fs.map(_.length).distinct.size == 1,
                  "webmBuild: fixed-size lacing needs equal frames")
              case other => throw new IllegalArgumentException(
                s"webmBuild: lacing must be 1|2|3 (got $other)")
            }
            fs.foreach(bos.write)
            bos.toByteArray
          }
        val blockPayload = tb ++
          Array(((sp.rel >> 8) & 0xff).toByte, (sp.rel & 0xff).toByte) ++
          Array(flags.toByte) ++ blockBody
        if (!group) body.write(el(0xA3L, blockPayload))
        else {
          val inner = el(0xA1L, blockPayload) ++
            (if (sp.durationMs >= 0) el(0x9BL, beMin(sp.durationMs))
             else Array.emptyByteArray) ++
            (if (sp.keyframe) Array.emptyByteArray
             else el(0xFBL, Array(0xff.toByte))) // RefBlock: rel -1
          body.write(el(0xA0L, inner))
        }
      }
      el(0x1F43B675L, body.toByteArray)
    }
    val segment = el(0x18538067L,
      infoBytes ++ tracksBytes ++ clusterBytes.flatten.toArray)
    header ++ segment
  }

  // ---- JPEG pixel decode (real, via the JDK's ImageIO) -------------
  // javax.imageio is a PUBLIC java.desktop API present in every full
  // JDK (verified in this container: JPEG/PNG/GIF/BMP/TIFF readers).
  // JPEG stays decoder-exact but formula-inexact (lossy DCT), so its
  // oracle checks dimensions exactly and channel means within a
  // quantization tolerance — falsifiable, not formula-hash-exact.

  case class JpegStats(width: Int, height: Int, n_pixels: Long,
      sum_r: Long, sum_g: Long, sum_b: Long)

  private def ensureHeadless(): Unit =
    if (System.getProperty("java.awt.headless") == null)
      System.setProperty("java.awt.headless", "true")

  def jpegStats(b: Array[Byte]): JpegStats = {
    if (b == null || b.length < 4 ||
        (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return null
    ensureHeadless()
    val im =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
      catch { case _: Exception => null }
    if (im == null) return null
    val (w, h) = (im.getWidth, im.getHeight)
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = im.getRGB(x, y)
        sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
        x += 1
      }
      y += 1
    }
    JpegStats(w, h, w.toLong * h, sr, sg, sb)
  }

  val jpegStatsUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf(jpegStats _)

  /** Same feature contract as [[pngFeatures]], from the JPEG decode. */
  def jpegFeatures(b: Array[Byte], buckets: Int): Array[Float] = {
    if (buckets < 4) return null
    if (b == null || b.length < 4 ||
        (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return null
    ensureHeadless()
    val im =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
      catch { case _: Exception => null }
    if (im == null) return null
    val (w, h) = (im.getWidth, im.getHeight)
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = im.getRGB(x, y)
        val o = (y * w + x) * 3
        rgb(o) = ((p >> 16) & 0xff).toByte
        rgb(o + 1) = ((p >> 8) & 0xff).toByte
        rgb(o + 2) = (p & 0xff).toByte
        x += 1
      }
      y += 1
    }
    featuresOf(rgb, w * h, buckets)
  }

  /** JPEG encoder via ImageIO (fixture complement of [[jpegStats]]). */
  def jpegEncode(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == width * height * 3)
    ensureHeadless()
    val im = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val o = (y * width + x) * 3
        im.setRGB(x, y, ((rgb(o) & 0xff) << 16) |
          ((rgb(o + 1) & 0xff) << 8) | (rgb(o + 2) & 0xff))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "jpg", bos)
    bos.toByteArray
  }

  // ---- BMP pixel decode (real, pure-JVM) ---------------------------
  // Windows BITMAPINFOHEADER layout (public, MS docs): BGR byte order,
  // rows padded to 4 bytes, bottom-up unless height is negative;
  // supports uncompressed (BI_RGB) 8-bit palette / 24-bit / 32-bit.

  /** Decoded BMP: `rgb` holds h scanlines of w RGB triples, top-down
    * (bottom-up storage already undone).
    */
  case class BmpImage(width: Int, height: Int, rgb: Array[Byte])

  case class BmpStats(width: Int, height: Int, n_pixels: Long,
      sum_r: Long, sum_g: Long, sum_b: Long, wsum: Long)

  def bmpDecode(b: Array[Byte]): BmpImage = {
    if (b == null || b.length < 54 || ascii(b, 0, 2) != "BM") return null
    val dataOff = le32(b, 10).toInt
    val hdrSize = le32(b, 14).toInt
    if (hdrSize < 40) return null // BITMAPCOREHEADER out of scope
    val w = le32(b, 18).toInt
    val hRaw = le32(b, 22).toInt
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    val bits = le16(b, 28)
    val compression = le32(b, 30)
    if (w <= 0 || h == 0 || compression != 0) return null // BI_RGB only
    if (w.toLong * h * 3 > Int.MaxValue) return null
    var palette: Array[Byte] = null
    var palEntries = 0
    if (bits == 8) {
      val declared = le32(b, 46).toInt // biClrUsed; 0 means full 256
      palEntries = if (declared == 0) 256 else declared
      val palOff = 14 + hdrSize
      if (palOff + 4 * palEntries > b.length) return null
      palette = java.util.Arrays.copyOfRange(b, palOff, palOff + 4 * palEntries)
    } else if (bits != 24 && bits != 32) return null
    val bytesPerPx = if (bits == 8) 1 else bits / 8
    val rowBytes = ((w * bytesPerPx + 3) / 4) * 4 // 4-byte row padding
    if (dataOff < 0 || dataOff.toLong + rowBytes.toLong * h > b.length)
      return null
    val rgb = new Array[Byte](w * h * 3)
    var r = 0
    while (r < h) {
      val y = if (topDown) r else h - 1 - r // storage row r -> image row y
      val ro = dataOff + r * rowBytes
      var x = 0
      while (x < w) {
        val o = (y * w + x) * 3
        if (bits == 8) {
          val ci = u8(b, ro + x)
          if (ci >= palEntries) return null
          // palette quads are B,G,R,reserved
          rgb(o) = palette(4 * ci + 2)
          rgb(o + 1) = palette(4 * ci + 1)
          rgb(o + 2) = palette(4 * ci)
        } else {
          val po = ro + x * bytesPerPx // pixel bytes are B,G,R[,A]
          rgb(o) = b(po + 2); rgb(o + 1) = b(po + 1); rgb(o + 2) = b(po)
        }
        x += 1
      }
      r += 1
    }
    BmpImage(w, h, rgb)
  }

  def bmpStats(b: Array[Byte]): BmpStats = {
    val im = bmpDecode(b)
    if (im == null) return null
    var sr = 0L; var sg = 0L; var sb = 0L; var ws = 0L
    val n = im.width * im.height
    var i = 0
    while (i < n) {
      val pr = im.rgb(3 * i) & 0xff
      val pg = im.rgb(3 * i + 1) & 0xff
      val pb = im.rgb(3 * i + 2) & 0xff
      sr += pr; sg += pg; sb += pb
      // position-weighted: a wrong bottom-up/top-down or padding walk
      // changes wsum even when the plain sums survive it
      ws += i.toLong * (pr + pg + pb)
      i += 1
    }
    BmpStats(im.width, im.height, n.toLong, sr, sg, sb, ws)
  }

  val bmpStatsUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf(bmpStats _)

  /** Same feature contract as [[pngFeatures]], from the BMP decode. */
  def bmpFeatures(b: Array[Byte], buckets: Int): Array[Float] = {
    if (buckets < 4) return null
    val im = bmpDecode(b)
    if (im == null) return null
    featuresOf(im.rgb, im.width * im.height, buckets)
  }

  /** Shared (rgb triples -> means + luminance histogram) kernel. */
  private def featuresOf(rgb: Array[Byte], n: Int,
      buckets: Int): Array[Float] = {
    val bins = buckets - 3
    val hist = new Array[Long](bins)
    var sr = 0L; var sg = 0L; var sb = 0L
    var i = 0
    while (i < n) {
      val r = rgb(3 * i) & 0xff
      val g = rgb(3 * i + 1) & 0xff
      val bl = rgb(3 * i + 2) & 0xff
      sr += r; sg += g; sb += bl
      val luma = (r * 299 + g * 587 + bl * 114) / 1000
      hist(math.min(bins - 1, luma * bins / 256)) += 1
      i += 1
    }
    val out = new Array[Float](buckets)
    out(0) = (sr.toDouble / n / 255.0).toFloat
    out(1) = (sg.toDouble / n / 255.0).toFloat
    out(2) = (sb.toDouble / n / 255.0).toFloat
    var k = 0
    while (k < bins) { out(3 + k) = (hist(k).toDouble / n).toFloat; k += 1 }
    out
  }

  /** Minimal BMP encoder (BI_RGB 24-bit or 8-bit palette, bottom-up or
    * top-down) — forward complement of [[bmpStats]] for fixtures.
    * For `bits = 8`, `pixels` holds palette indices and `palette` the
    * RGB triples; for `bits = 24`, `pixels` holds RGB triples.
    */
  def bmpEncode(width: Int, height: Int, pixels: Array[Byte],
      bits: Int = 24, palette: Array[Byte] = null,
      topDown: Boolean = false): Array[Byte] = {
    require(bits == 24 || bits == 8)
    val palEntries = if (bits == 8) { require(palette != null); palette.length / 3 } else 0
    val bytesPerPx = if (bits == 8) 1 else 3
    require(pixels.length == width * height * bytesPerPx)
    val rowBytes = ((width * bytesPerPx + 3) / 4) * 4
    val dataOff = 54 + 4 * palEntries
    val size = dataOff + rowBytes * height
    val out = new Array[Byte](size)
    def w16(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte }
    def w32(o: Int, v: Int): Unit = { w16(o, v & 0xffff); w16(o + 2, v >>> 16) }
    out(0) = 'B'; out(1) = 'M'
    w32(2, size); w32(10, dataOff)
    w32(14, 40); w32(18, width)
    w32(22, if (topDown) -height else height)
    w16(26, 1); w16(28, bits); w32(30, 0)
    w32(34, rowBytes * height)
    if (bits == 8) {
      w32(46, palEntries)
      for (c <- 0 until palEntries) { // stored as B,G,R,0 quads
        out(54 + 4 * c) = palette(3 * c + 2)
        out(54 + 4 * c + 1) = palette(3 * c + 1)
        out(54 + 4 * c + 2) = palette(3 * c)
      }
    }
    for (r <- 0 until height) {
      val y = if (topDown) r else height - 1 - r
      val ro = dataOff + r * rowBytes
      for (x <- 0 until width) {
        if (bits == 8) out(ro + x) = pixels(y * width + x)
        else {
          val po = (y * width + x) * 3 // write B,G,R
          out(ro + 3 * x) = pixels(po + 2)
          out(ro + 3 * x + 1) = pixels(po + 1)
          out(ro + 3 * x + 2) = pixels(po)
        }
      }
    }
    out
  }

  // ---- TIFF baseline decode (TIFF 6.0) -------------------------------

  case class TiffImage(width: Int, height: Int, rgb: Array[Byte])

  /** PackBits decompression (TIFF 6.0 §9): n in 0..127 copies n+1
    * literals, n in -127..-1 repeats the next byte 1-n times, -128 is
    * a noop. Returns exactly `expect` bytes or null (bounds-total).
    */
  private def unpackBits(b: Array[Byte], from: Int, len: Int,
      expect: Int): Array[Byte] = {
    val out = new Array[Byte](expect)
    var i = from
    val end = from + len
    var o = 0
    while (i < end && o < expect) {
      val n = b(i)
      i += 1
      if (n >= 0) {
        val cnt = n + 1
        if (i + cnt > end || o + cnt > expect) return null
        System.arraycopy(b, i, out, o, cnt)
        i += cnt; o += cnt
      } else if (n != -128) {
        val cnt = 1 - n
        if (i >= end || o + cnt > expect) return null
        java.util.Arrays.fill(out, o, o + cnt, b(i))
        i += 1; o += cnt
      }
    }
    if (o == expect) out else null
  }

  /** Baseline-TIFF decode to RGB (TIFF 6.0 baseline subset: both byte
    * orders, 8-bit grayscale — BlackIsZero AND WhiteIsZero — or chunky
    * 8-bit RGB, strips, Compression 1 (none) or 32773 (PackBits)).
    * Tiled, planar, predictored, LZW and sub-8-bit files return null —
    * named by [[probe]], not decoded. Total on arbitrary bytes; every
    * strip offset/size is bounds-checked in Long.
    */
  def tiffDecode(b: Array[Byte]): TiffImage = {
    if (b == null || b.length < 8) return null
    val le = b(0) == 'I' && b(1) == 'I' && u8(b, 2) == 0x2a && u8(b, 3) == 0
    val bigE = b(0) == 'M' && b(1) == 'M' && u8(b, 2) == 0 && u8(b, 3) == 0x2a
    if (!le && !bigE) return null
    def r16(i: Int): Int =
      if (i < 0 || i + 2 > b.length) -1
      else if (le) le16(b, i) else be16(b, i)
    def r32(i: Int): Long =
      if (i < 0 || i + 4 > b.length) -1L
      else if (le) le32(b, i) else be32(b, i)
    val ifd = r32(4)
    if (ifd < 8 || ifd + 2 > b.length) return null
    val nEnt = r16(ifd.toInt)
    if (nEnt <= 0) return null
    var w = 0L; var h = 0L
    var comp = 1L; var photo = -1L; var spp = 1L; var rps = -1L
    var bitsOk = true
    var stripOffs: Array[Long] = null
    var stripCnts: Array[Long] = null
    var planarOk = true
    var e = 0
    while (e < nEnt && ifd + 2 + (e + 1) * 12 <= b.length) {
      val off = (ifd + 2 + e * 12).toInt
      val tag = r16(off)
      val typ = r16(off + 2)
      val cnt = r32(off + 4)
      val elemSize = if (typ == 3) 2 else if (typ == 4) 4 else -1
      // values: left-justified inline when they fit in 4 bytes, else
      // the value field is an offset to the array
      def vals(): Array[Long] = {
        if (elemSize < 0 || cnt <= 0 || cnt > (1 << 20)) return null
        val total = cnt * elemSize
        val base = if (total <= 4) off + 8 else r32(off + 8)
        if (base < 0 || base + total > b.length) return null
        Array.tabulate(cnt.toInt) { k =>
          val p = (base + k.toLong * elemSize).toInt
          if (elemSize == 2) r16(p).toLong else r32(p)
        }
      }
      def v1(): Long = { val a = vals(); if (a == null || a.isEmpty) -1L else a(0) }
      tag match {
        case 256 => w = v1()
        case 257 => h = v1()
        case 258 => val a = vals(); bitsOk = a != null && a.forall(_ == 8L)
        case 259 => comp = v1()
        case 262 => photo = v1()
        case 273 => stripOffs = vals()
        case 277 => spp = v1()
        case 278 => rps = v1()
        case 279 => stripCnts = vals()
        case 284 => planarOk = v1() <= 1L
        case _ => ()
      }
      e += 1
    }
    if (w <= 0 || h <= 0 || w * h * 3 > Int.MaxValue) return null
    if (!bitsOk || !planarOk) return null
    if (comp != 1 && comp != 32773) return null
    if (photo != 0 && photo != 1 && (photo != 2 || spp < 3)) return null
    if (spp != 1 && spp != 3) return null
    if (stripOffs == null || stripCnts == null ||
      stripOffs.length != stripCnts.length || stripOffs.isEmpty) return null
    val rowsPerStrip = if (rps <= 0 || rps > h) h else rps
    val nStrips = ((h + rowsPerStrip - 1) / rowsPerStrip).toInt
    if (stripOffs.length < nStrips) return null
    val wi = w.toInt; val hi = h.toInt; val sppI = spp.toInt
    val rowBytes = wi * sppI
    // validate every strip against the payload BEFORE allocating the
    // pixel buffer: header-claimed dims alone could otherwise force a
    // near-2 GB allocation from a ~60-byte crafted file. Uncompressed
    // strips must carry exactly their pixel bytes; PackBits output is
    // bounded by 128x its input bytes, so a claimed raw size beyond
    // that is undecodable regardless of content.
    var s = 0
    var inBytes = 0L
    while (s < nStrips) {
      val rows = math.min(rowsPerStrip, h - s * rowsPerStrip).toInt
      val expect = rows.toLong * rowBytes
      val so = stripOffs(s); val sc = stripCnts(s)
      if (so < 0 || sc < 0 || so + sc > b.length) return null
      if (comp == 1 && sc != expect) return null
      inBytes += sc
      s += 1
    }
    if (comp == 32773 && hi.toLong * rowBytes > inBytes * 128L) return null
    val raw = new Array[Byte](hi * rowBytes)
    s = 0
    while (s < nStrips) {
      val rows = math.min(rowsPerStrip, h - s * rowsPerStrip).toInt
      val expect = rows * rowBytes
      val so = stripOffs(s); val sc = stripCnts(s)
      val strip =
        if (comp == 1)
          java.util.Arrays.copyOfRange(b, so.toInt, (so + sc).toInt)
        else unpackBits(b, so.toInt, sc.toInt, expect)
      if (strip == null) return null
      System.arraycopy(strip, 0, raw, s * rowsPerStrip.toInt * rowBytes,
        expect)
      s += 1
    }
    val rgb = new Array[Byte](wi * hi * 3)
    var i = 0
    val n = wi * hi
    while (i < n) {
      if (sppI == 1) {
        // grayscale mirrored; photometric 0 (WhiteIsZero) inverts
        val g0 = raw(i) & 0xff
        val g = if (photo == 0) 255 - g0 else g0
        rgb(3 * i) = g.toByte; rgb(3 * i + 1) = g.toByte
        rgb(3 * i + 2) = g.toByte
      } else {
        rgb(3 * i) = raw(3 * i); rgb(3 * i + 1) = raw(3 * i + 1)
        rgb(3 * i + 2) = raw(3 * i + 2)
      }
      i += 1
    }
    TiffImage(wi, hi, rgb)
  }

  /** Same stats contract as [[bmpStats]], from the TIFF decode (the
    * shared position-weighted sums make strip order and PackBits slips
    * observable).
    */
  def tiffStats(b: Array[Byte]): BmpStats = {
    val im = tiffDecode(b)
    if (im == null) return null
    var sr = 0L; var sg = 0L; var sb = 0L; var ws = 0L
    val n = im.width * im.height
    var i = 0
    while (i < n) {
      val pr = im.rgb(3 * i) & 0xff
      val pg = im.rgb(3 * i + 1) & 0xff
      val pb = im.rgb(3 * i + 2) & 0xff
      sr += pr; sg += pg; sb += pb
      ws += i.toLong * (pr + pg + pb)
      i += 1
    }
    BmpStats(im.width, im.height, n.toLong, sr, sg, sb, ws)
  }

  val tiffStatsUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf(tiffStats _)

  /** PackBits compression of one strip (runs of >= 3 become repeat
    * packets, the rest literal packets of <= 128) — forward complement
    * of [[unpackBits]] for fixtures.
    */
  private def packBits(src: Array[Byte], from: Int, len: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(len + len / 128 + 2)
    var i = from
    val end = from + len
    while (i < end) {
      // measure the run at i
      var run = 1
      while (i + run < end && run < 128 && src(i + run) == src(i)) run += 1
      if (run >= 3) {
        out.write(1 - run) // -(run-1)
        out.write(src(i))
        i += run
      } else {
        // literal stretch: until the next >= 3 run or 128 bytes
        var lit = run
        var j = i + run
        while (j < end && lit < 128) {
          var r2 = 1
          while (j + r2 < end && r2 < 3 && src(j + r2) == src(j)) r2 += 1
          if (r2 >= 3) j = end // stop the scan; run starts here
          else { lit += r2; j += r2 }
        }
        if (lit > 128) lit = 128
        out.write(lit - 1)
        out.write(src, i, lit)
        i += lit
      }
    }
    out.toByteArray
  }

  /** Minimal baseline-TIFF encoder for fixtures: both byte orders,
    * 8-bit gray or chunky RGB, strip split via `rowsPerStrip`,
    * optional PackBits. `pixels` = gray bytes (spp 1) or RGB triples
    * (spp 3), row-major top-down.
    */
  def tiffEncode(width: Int, height: Int, pixels: Array[Byte],
      samplesPerPixel: Int = 3, littleEndian: Boolean = true,
      packbits: Boolean = false, rowsPerStrip: Int = 0,
      whiteIsZero: Boolean = false): Array[Byte] = {
    require(samplesPerPixel == 1 || samplesPerPixel == 3)
    require(pixels.length == width * height * samplesPerPixel)
    val rps = if (rowsPerStrip <= 0) height else rowsPerStrip
    val rowBytes = width * samplesPerPixel
    val nStrips = (height + rps - 1) / rps
    val strips = (0 until nStrips).map { s =>
      val rows = math.min(rps, height - s * rps)
      val from = s * rps * rowBytes
      if (packbits) packBits(pixels, from, rows * rowBytes)
      else java.util.Arrays.copyOfRange(pixels, from, from + rows * rowBytes)
    }
    val bos = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit =
      if (littleEndian) { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
      else { bos.write((v >> 8) & 0xff); bos.write(v & 0xff) }
    def w32(v: Long): Unit =
      if (littleEndian) { w16((v & 0xffff).toInt); w16(((v >> 16) & 0xffff).toInt) }
      else { w16(((v >> 16) & 0xffff).toInt); w16((v & 0xffff).toInt) }
    // header
    if (littleEndian) { bos.write('I'); bos.write('I'); bos.write(0x2a); bos.write(0) }
    else { bos.write('M'); bos.write('M'); bos.write(0); bos.write(0x2a) }
    val stripDataStart = 8L
    val stripOffsets = strips.scanLeft(stripDataStart)(_ + _.length).init
    val ifdOff = stripDataStart + strips.map(_.length.toLong).sum
    w32(ifdOff)
    strips.foreach(s => bos.write(s, 0, s.length))
    // IFD: 10 fixed entries, ascending tags; external arrays (3-sample
    // BitsPerSample, multi-strip offset/count lists) follow the IFD
    val entries = 10
    var aux = ifdOff + 2 + entries * 12 + 4
    val auxData = new java.io.ByteArrayOutputStream()
    def ent(tag: Int, typ: Int, cnt: Int, inline: Long): Unit = {
      w16(tag); w16(typ); w32(cnt.toLong)
      typ match {
        case 3 if cnt == 1 =>
          // SHORT left-justified in the 4-byte value field
          w16(inline.toInt); w16(0)
        case _ => w32(inline)
      }
    }
    def entArr(tag: Int, typ: Int, values: Seq[Long]): Unit = {
      val elem = if (typ == 3) 2 else 4
      if (values.length * elem <= 4) {
        w16(tag); w16(typ); w32(values.length.toLong)
        if (typ == 3) {
          w16(values(0).toInt)
          w16(if (values.length > 1) values(1).toInt else 0)
        } else w32(values(0))
      } else {
        w16(tag); w16(typ); w32(values.length.toLong); w32(aux)
        values.foreach { v =>
          if (typ == 3) {
            if (littleEndian) { auxData.write((v & 0xff).toInt)
              auxData.write(((v >> 8) & 0xff).toInt) }
            else { auxData.write(((v >> 8) & 0xff).toInt)
              auxData.write((v & 0xff).toInt) }
          } else {
            val b0 = (v & 0xff).toInt; val b1 = ((v >> 8) & 0xff).toInt
            val b2 = ((v >> 16) & 0xff).toInt; val b3 = ((v >> 24) & 0xff).toInt
            if (littleEndian) { auxData.write(b0); auxData.write(b1)
              auxData.write(b2); auxData.write(b3) }
            else { auxData.write(b3); auxData.write(b2)
              auxData.write(b1); auxData.write(b0) }
          }
        }
        aux += values.length.toLong * elem
      }
    }
    w16(entries)
    ent(256, 4, 1, width.toLong)
    ent(257, 4, 1, height.toLong)
    entArr(258, 3, Seq.fill(samplesPerPixel)(8L))
    ent(259, 3, 1, if (packbits) 32773L else 1L)
    ent(262, 3, 1,
      if (samplesPerPixel != 1) 2L else if (whiteIsZero) 0L else 1L)
    entArr(273, 4, stripOffsets.map(_.toLong))
    ent(277, 3, 1, samplesPerPixel.toLong)
    ent(278, 4, 1, rps.toLong)
    entArr(279, 4, strips.map(_.length.toLong))
    ent(284, 3, 1, 1L)
    w32(0L) // no next IFD
    auxData.writeTo(bos)
    bos.toByteArray
  }
}
