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

  /** Wrap a binary column into the (payload, metadata) pair. Dimensions
    * are derived deterministically from the payload here (STUB — a real
    * decoder reads the container header instead).
    */
  def attachMetadata(df: DataFrame, binCol: String, mediaType: String,
      format: String): DataFrame = {
    val b = col(binCol)
    df.withColumn(s"${binCol}_meta", struct(
      lit(mediaType).as("media_type"),
      lit(format).as("format"),
      length(b).cast(LongType).as("n_bytes"),
      // STUB dimensions: derived from payload hash, deterministic
      (pmod(xxhash64(b), lit(1024L)) + 64).cast(IntegerType).as("width"),
      (pmod(xxhash64(b, lit(1)), lit(1024L)) + 64).cast(IntegerType).as("height"),
      (length(b).cast(LongType) * 8).as("duration_ms"),
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
