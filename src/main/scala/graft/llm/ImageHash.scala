package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Perceptual image hashing + near-duplicate image detection.
  *
  * The multimodal counterpart of text MinHash/SimHash dedup: a crawl
  * at 100 TB carries the same image re-encoded, resized, or pixel-
  * tweaked across millions of pages, and byte-level fingerprints miss
  * all of it. dHash (difference hash — the standard perceptual hash
  * family popularized by pHash/imagehash; gradient-sign variant) maps
  * every decodable image to 64 bits such that visually-near images
  * land within a small Hamming distance, and Hamming-banded LSH turns
  * that into a shuffle-on-(band,chunk) pair generation with NO
  * all-pairs compare — identical scale shape to
  * [[Dedup.simhashPairs]].
  *
  * Hash definition (integer-exact, so an external SQL engine can
  * replay it from a pixel formula — see the image_dhash oracle):
  *   - decode to RGB via the real pure-JVM decoders (PNG/GIF/BMP/TIFF;
  *     [[MediaHeaders.pngDecode]] resolves palettes and mirrors grey)
  *     or, for JPEG — the dominant web image format — the JDK's
  *     ImageIO codec (decoder-exact, formula-inexact: JPEG rows use
  *     fixture-pinned oracles instead of SQL pixel replay);
  *   - luminance per pixel: lum = 299·r + 587·g + 114·b (BT.601
  *     integer weights, NOT divided — exactness beats scale);
  *   - 9×8 grid: pixel (x,y) belongs to cell (x·9 / w, y·8 / h)
  *     (integer floor; every cell nonempty when w ≥ 9, h ≥ 8);
  *   - bit (cy·8 + cx), cx < 8: set iff cell (cx,cy)'s mean luminance
  *     exceeds cell (cx+1,cy)'s — compared exactly as
  *     S(cx)·C(cx+1) > S(cx+1)·C(cx), no division.
  * Images smaller than the grid (w < 9 or h < 8) and undecodable
  * payloads hash to null.
  */
object ImageHash {

  /** Decoded RGB accessor for any supported container, or null. */
  private def decodeRgb(b: Array[Byte]): (Int, Int, Int => (Int, Int, Int)) = {
    // JPEG — the dominant web image format — decodes via the JDK's
    // ImageIO (public java.desktop API; the only pure-JVM route to the
    // DCT bitstream). Unlike the PNG/GIF/BMP paths the pixels are
    // decoder-exact but formula-inexact (lossy DCT), so JPEG dHashes
    // verify against fixture-pinned planted-twin oracles
    // (image_dup_pairs_jpeg), not SQL pixel replay.
    if (b.length >= 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      if (System.getProperty("java.awt.headless") == null)
        System.setProperty("java.awt.headless", "true")
      val im =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
        catch { case _: Exception => null }
      if (im == null) return null
      val w = im.getWidth
      val h = im.getHeight
      val argb = im.getRGB(0, 0, w, h, null, 0, w)
      return (w, h, (i: Int) => {
        val p = argb(i)
        ((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
      })
    }
    val png = MediaHeaders.pngDecode(b)
    if (png != null) {
      val bpp = png.bpp
      val get = (i: Int) => {
        val o = i * bpp
        if (bpp <= 2) { // grey / grey+alpha: one luma channel, mirrored
          val g = png.pixels(o) & 0xff; (g, g, g)
        } else (png.pixels(o) & 0xff, png.pixels(o + 1) & 0xff,
          png.pixels(o + 2) & 0xff)
      }
      return (png.width, png.height, get)
    }
    val gif = MediaHeaders.gifDecode(b)
    if (gif != null)
      return (gif.width, gif.height, (i: Int) => (gif.rgb(3 * i) & 0xff,
        gif.rgb(3 * i + 1) & 0xff, gif.rgb(3 * i + 2) & 0xff))
    val bmp = MediaHeaders.bmpDecode(b)
    if (bmp != null)
      return (bmp.width, bmp.height, (i: Int) => (bmp.rgb(3 * i) & 0xff,
        bmp.rgb(3 * i + 1) & 0xff, bmp.rgb(3 * i + 2) & 0xff))
    val tif = MediaHeaders.tiffDecode(b)
    if (tif != null)
      return (tif.width, tif.height, (i: Int) => (tif.rgb(3 * i) & 0xff,
        tif.rgb(3 * i + 1) & 0xff, tif.rgb(3 * i + 2) & 0xff))
    null
  }

  /** 64-bit dHash of a decodable image payload; null when the payload
    * is not PNG/GIF/BMP/TIFF/JPEG or is smaller than the 9×8 comparison
    * grid.
    */
  def dhash64(b: Array[Byte]): java.lang.Long = {
    if (b == null) return null
    val dec = decodeRgb(b)
    if (dec == null) return null
    val (w, h, rgbAt) = dec
    if (w < 9 || h < 8) return null
    val sums = new Array[Long](8 * 9)
    val cnts = new Array[Long](8 * 9)
    var y = 0
    while (y < h) {
      val cy = y * 8 / h
      var x = 0
      while (x < w) {
        val cx = x * 9 / w
        val (r, g, bl) = rgbAt(y * w + x)
        sums(cy * 9 + cx) += 299L * r + 587L * g + 114L * bl
        cnts(cy * 9 + cx) += 1L
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var cy = 0
    while (cy < 8) {
      var cx = 0
      while (cx < 8) {
        val a = cy * 9 + cx
        if (sums(a) * cnts(a + 1) > sums(a + 1) * cnts(a))
          hash |= 1L << (cy * 8 + cx)
        cx += 1
      }
      cy += 1
    }
    java.lang.Long.valueOf(hash)
  }

  /** [[dhash64]] rendered as 16 lowercase hex digits (two's
    * complement, most-significant byte = row cy=7 first) — the
    * sign-free form an external SQL oracle reassembles byte-by-byte.
    */
  def dhashHex(b: Array[Byte]): String = {
    val h = dhash64(b)
    if (h == null) null else f"${h.longValue}%016x"
  }

  val dhash64Udf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf(dhash64 _)
  val dhashHexUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf(dhashHex _)

  /** Near-duplicate pairs among precomputed 64-bit signatures (any
    * source: dHash, SimHash, a stored fingerprint column) by banded
    * Hamming LSH. Output (id_a, id_b, hamming) with id_a < id_b,
    * hamming ≤ maxHamming.
    */
  def hammingPairs64(df: DataFrame, idCol: String, sigCol: String,
      maxHamming: Int = 3, maxBucketSize: Int = 10000): DataFrame = {
    // a non-numeric signature column (e.g. the dhashHex STRING output)
    // would cast("long") to all-null and silently yield zero pairs —
    // reject it with an actionable error instead
    val dt = df.schema(sigCol).dataType
    val integral = dt match {
      case _: org.apache.spark.sql.types.LongType |
           _: org.apache.spark.sql.types.IntegerType |
           _: org.apache.spark.sql.types.ShortType |
           _: org.apache.spark.sql.types.ByteType => true
      case _ => false
    }
    require(integral, s"hammingPairs64 signature column '$sigCol' must be " +
      s"an integral type (64-bit signature), got ${dt.simpleString}; for " +
      "hex-string signatures use conv(sig, 16, 10).cast('long') first")
    hammingPairs64(df.select(col(idCol).as("__id"),
      col(sigCol).cast("long").as("__sig")), maxHamming, maxBucketSize)
  }

  /** (__id, __sig) → one row per 16-bit band: (__id, __sig, __band,
    * __chunk) — the shared banding step of the pair core and the
    * incremental state table.
    */
  private[llm] def bandedOf(sigs: DataFrame): DataFrame =
    sigs.select(col("__id"), col("__sig"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("__sig"), b * 16).bitwiseAND(lit(0xffffL))
            .as("chunk"))): _*)).as("__bb"))
      .select(col("__id"), col("__sig"),
        col("__bb.band").as("__band"), col("__bb.chunk").as("__chunk"))

  /** Banded-Hamming core: 4×16-bit chunks (any shared chunk ⇒
    * candidate — pigeonhole guarantees recall for Hamming ≤ 3), native
    * bit_count(xor) verify, hot-bucket skew guard. Shuffle keys are
    * (band, chunk); no pair outside a shared bucket is ever formed.
    *
    * Input frame must carry (__id, __sig); output (id_a, id_b,
    * hamming) with id_a < id_b, hamming ≤ maxHamming.
    */
  private[llm] def hammingPairs64(sigs0: DataFrame, maxHamming: Int,
      maxBucketSize: Int): DataFrame = {
    val sigs = sigs0.persist()
    sigs.count() // eager: signatures compute once, not per self-join side
    val banded = bandedOf(sigs)
    val sized = Dedup.dropHotBuckets(banded, Seq("__band", "__chunk"),
      maxBucketSize)
    val l = sized.select(col("__band"), col("__chunk"),
      col("__id").as("id_a"), col("__sig").as("sig_a"))
    val r = sized.select(col("__band"), col("__chunk"),
      col("__id").as("id_b"), col("__sig").as("sig_b"))
    // verified pairs are small — pin them and release the signature
    // cache before returning (same CacheManager-lifetime policy as
    // imageDedupAgainst: this helper is on the simhash, image-pair
    // and dedup hot paths, so a leaked cache multiplies per pipeline)
    val out = l.join(r, Seq("__band", "__chunk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .localCheckpoint()
    sigs.unpersist()
    out
  }

  /** Perceptual near-duplicate image pairs over a binary payload
    * column: dHash each image, then banded-Hamming candidate pairs
    * verified exactly. Undecodable / sub-grid payloads drop out
    * (null signatures can't be compared).
    */
  def imageDupPairs(df: DataFrame, binCol: String, idCol: String,
      maxHamming: Int = 3, maxBucketSize: Int = 10000): DataFrame = {
    val sigs = df.select(col(idCol).as("__id"),
        dhash64Udf(col(binCol)).as("__sig"))
      .filter(col("__sig").isNotNull)
    hammingPairs64(sigs, maxHamming, maxBucketSize)
  }

  /** Perceptual image dedup: keep-smallest-id over verified pairs,
    * the same policy as [[Dedup.simhashDedup]].
    */
  def imageDedup(df: DataFrame, binCol: String, idCol: String,
      maxHamming: Int = 3): DataFrame = {
    val losers = imageDupPairs(df, binCol, idCol, maxHamming)
      .select(col("id_b").as(idCol)).distinct()
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Banded dHash state of an image corpus — the persisted table a
    * daily crawl ingest dedupes against WITHOUT re-decoding a single
    * corpus image: (__id, __sig, __band, __chunk), 4 narrow rows per
    * decodable payload (~32 B each). The signature rides along so the
    * ingest-time Hamming verify needs no corpus fetch at all (unlike
    * the MinHash state, whose verify re-reads candidate text).
    */
  def dhashState(df: DataFrame, binCol: String, idCol: String): DataFrame =
    bandedOf(df.select(col(idCol).as("__id"),
        dhash64Udf(col(binCol)).as("__sig"))
      .filter(col("__sig").isNotNull))

  /** Incremental perceptual dedup — the [[graft.llm.IncrementalDedup]]
    * shape for images: ONE decode+hash pass over the batch feeds both
    * the in-batch pair generation (keep smallest id) and the banded
    * join against the stored corpus state (any match ⇒ drop). The
    * hot-bucket guard applies to the COMBINED batch+state population,
    * so a bucket hot on either side is dropped from both. Corpus
    * images are never re-decoded; the state aggregation is one linear
    * narrow pass. Undecodable payloads can't match anything and always
    * survive. Append `dhashState` rows of the survivors to carry the
    * state forward.
    */
  def imageDedupAgainst(batch: DataFrame, binCol: String, idCol: String,
      state: DataFrame, maxHamming: Int = 3,
      maxBucketSize: Int = 10000): DataFrame = {
    val sigs = batch.select(col(idCol).as("__id"),
        dhash64Udf(col(binCol)).as("__sig"))
      .filter(col("__sig").isNotNull)
    dedupAgainst64(batch, idCol, sigs, state, maxHamming, maxBucketSize)
  }

  /** Signature-agnostic core of [[imageDedupAgainst]] (also behind
    * [[AudioHash.audioDedupAgainst]]): `sigs` is the batch's (__id,
    * __sig) frame from whatever 64-bit perceptual hash the caller
    * computed — the plan shape and cache-lifetime policy documented
    * above hold for any of them.
    */
  private[llm] def dedupAgainst64(batch: DataFrame, idCol: String,
      sigs: DataFrame, state: DataFrame, maxHamming: Int,
      maxBucketSize: Int): DataFrame = {
    val combined = bandedOf(sigs).withColumn("__side", lit(0))
      .unionByName(state
        .select(col("__id"), col("__sig"), col("__band"), col("__chunk"))
        .withColumn("__side", lit(1)))
      .persist()
    combined.count() // eager: batch decode+hash runs once, not per branch
    val guarded = Dedup.dropHotBuckets(combined, Seq("__band", "__chunk"),
      maxBucketSize)
    val b = guarded.filter(col("__side") === 0)
      .select(col("__band"), col("__chunk"),
        col("__id").as("id_a"), col("__sig").as("sig_a"))
    val ham = bit_count(col("sig_a").bitwiseXOR(col("sig_b")))
    // in-batch: smallest id of a near-dup pair survives
    val inBatchLosers = b.join(guarded.filter(col("__side") === 0)
        .select(col("__band"), col("__chunk"),
          col("__id").as("id_b"), col("__sig").as("sig_b")),
        Seq("__band", "__chunk"))
      .filter(col("id_a") < col("id_b") && ham <= maxHamming)
      .select(col("id_b").as("__loser"))
    // vs corpus: any state match drops the batch row
    val stateLosers = b.join(guarded.filter(col("__side") === 1)
        .select(col("__band"), col("__chunk"),
          col("__id").as("id_b"), col("__sig").as("sig_b")),
        Seq("__band", "__chunk"))
      .filter(ham <= maxHamming)
      .select(col("id_a").as("__loser"))
    // the loser set is small (duplicates only) — pin IT eagerly and
    // release the combined batch+state cache, which at a 100M-image
    // corpus is 400M rows and must not outlive this call (CacheManager
    // holds persisted plans until an explicit unpersist; a daily
    // ingest loop would otherwise accumulate one full-state cache per
    // batch)
    val losers = inBatchLosers.unionByName(stateLosers).distinct()
      .localCheckpoint()
    combined.unpersist()
    batch.join(losers.withColumnRenamed("__loser", idCol), Seq(idCol),
      "left_anti")
  }
}
