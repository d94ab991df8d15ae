package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Perceptual audio hashing + near-duplicate audio detection — the
  * audio leg of the multimodal dedup triple (text MinHash/SimHash,
  * image dHash, audio envelope hash).
  *
  * The signature is a 1-D "dHash" over the ENERGY ENVELOPE of the
  * decoded PCM stream: the sample run is cut into 65 contiguous
  * segments, each segment's energy is the exact integer sum of squared
  * samples (16-bit scale), and bit k compares adjacent segments
  * (e[k+1] > e[k]). Two properties make this the right cheap audio
  * fingerprint:
  *
  *  - **Gain invariance**: scaling every sample by a constant scales
  *    every segment energy by the square of it, so all 64 comparisons —
  *    and hence the hash — are unchanged. The same recording at a
  *    different volume (the most common benign audio near-dup) hashes
  *    IDENTICALLY while its exact content hash differs.
  *  - **Locality**: a perturbation confined to one segment flips at
  *    most its two adjacent comparison bits, so re-encoded /
  *    edge-trimmed copies land within a small Hamming distance and the
  *    banded-Hamming LSH machinery shared with image dHash and SimHash
  *    ([[ImageHash.hammingPairs64]]) finds them without any all-pairs
  *    work.
  *
  * Everything is integer-exact (Long energy sums over 16-bit-scale
  * samples), so an external SQL engine replays the full 64-bit hash
  * from a sample formula without seeing the bytes.
  *
  * Reference scope: the reference engine has no audio analysis at all
  * (its closest surface is generic byte-column parsing); this module is
  * part of the training-data-pipeline surface the Spark engine adds.
  */
object AudioHash {

  /** Number of energy segments (64 adjacent comparisons = 64 bits). */
  private val Segments = 65

  /** 64-bit envelope hash of a PCM WAV payload; null when the payload
    * is not PCM 8/16-bit WAV or has fewer than 65 samples (each
    * comparison needs its own segment). Bit k (k = 0..63) is set iff
    * the exact integer energy of segment k+1 exceeds segment k, where
    * sample i belongs to segment (i * 65) / n.
    */
  def audioHash64(b: Array[Byte]): java.lang.Long = {
    val smp = MediaHeaders.pcmSamples(b)
    if (smp == null) return null
    val n = smp.length
    if (n < Segments) return null
    val e = new Array[Long](Segments)
    var i = 0
    while (i < n) {
      val s = smp(i)
      e(((i.toLong * Segments) / n).toInt) += s.toLong * s
      i += 1
    }
    var hash = 0L
    var k = 0
    while (k < Segments - 1) {
      if (e(k + 1) > e(k)) hash |= 1L << k
      k += 1
    }
    java.lang.Long.valueOf(hash)
  }

  /** [[audioHash64]] rendered as 16 lowercase hex digits (two's
    * complement, most-significant byte first) — the sign-free form an
    * external SQL oracle reassembles byte-by-byte.
    */
  def audioHashHex(b: Array[Byte]): String = {
    val h = audioHash64(b)
    if (h == null) null else f"${h.longValue}%016x"
  }

  val audioHash64Udf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf(audioHash64 _)
  val audioHashHexUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf(audioHashHex _)

  /** Perceptual near-duplicate audio pairs over a binary payload
    * column: envelope-hash each payload, then banded-Hamming candidate
    * pairs verified exactly — the identical plan shape (and shared
    * code) as [[ImageHash.imageDupPairs]]. Undecodable / sub-segment
    * payloads drop out (null signatures can't be compared).
    */
  def audioDupPairs(df: DataFrame, binCol: String, idCol: String,
      maxHamming: Int = 3, maxBucketSize: Int = 10000): DataFrame = {
    val sigs = df.select(col(idCol).as("__id"),
        audioHash64Udf(col(binCol)).as("__sig"))
      .filter(col("__sig").isNotNull)
    ImageHash.hammingPairs64(sigs, maxHamming, maxBucketSize)
  }

  /** Perceptual audio dedup: keep-smallest-id over verified pairs,
    * the same policy as [[ImageHash.imageDedup]].
    */
  def audioDedup(df: DataFrame, binCol: String, idCol: String,
      maxHamming: Int = 3): DataFrame = {
    val losers = audioDupPairs(df, binCol, idCol, maxHamming)
      .select(col("id_b").as(idCol)).distinct()
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Banded envelope-hash state of an audio corpus — the persisted
    * table a daily ingest dedupes against WITHOUT re-decoding a single
    * corpus payload; same 4-rows-per-item shape (and storage contract)
    * as [[ImageHash.dhashState]].
    */
  def audioHashState(df: DataFrame, binCol: String, idCol: String): DataFrame =
    ImageHash.bandedOf(df.select(col(idCol).as("__id"),
        audioHash64Udf(col(binCol)).as("__sig"))
      .filter(col("__sig").isNotNull))

  /** Incremental perceptual audio dedup — ONE decode+hash pass over
    * the batch feeds both in-batch pairing and the banded join against
    * the stored corpus state; identical plan shape and cache-lifetime
    * policy as [[ImageHash.imageDedupAgainst]] (shared core).
    * Undecodable payloads can't match anything and always survive.
    */
  def audioDedupAgainst(batch: DataFrame, binCol: String, idCol: String,
      state: DataFrame, maxHamming: Int = 3,
      maxBucketSize: Int = 10000): DataFrame = {
    val sigs = batch.select(col(idCol).as("__id"),
        audioHash64Udf(col(binCol)).as("__sig"))
      .filter(col("__sig").isNotNull)
    ImageHash.dedupAgainst64(batch, idCol, sigs, state, maxHamming,
      maxBucketSize)
  }
}
