package graft.sources

/** zstd stream opener that understands SKIPPABLE FRAMES (RFC 8878
  * §3.1.2, magic 0x184D2A50–0x184D2A5F) and the `.warc.zst`
  * dictionary convention from the IIPC warc-specifications proposal:
  * a Common Crawl-style shard leads with a skippable frame whose
  * payload is the decode dictionary — raw (dictionary magic
  * 0xEC30A437) or itself zstd-compressed. A sniff that only matches
  * the regular-frame magic 28 B5 2F FD routes exactly those shards
  * away from the zstd branch and "parses" them to zero records,
  * silently — this helper is the shared front door for Warc and Tar
  * so both legs accept either leading frame kind.
  *
  * Reference behavior: wrangler has no zstd path at all; the layout
  * here follows RFC 8878 and the iipc/warc-specifications
  * `warc-zstd` draft (public documents).
  */
private[graft] object ZstdFrames {

  /** True for BOTH frame kinds a zstd stream may start with: a
    * regular compressed frame (28 B5 2F FD) or a skippable frame
    * (50–5F 2A 4D 18 little-endian on the wire).
    */
  def isZstdMagic(b0: Int, b1: Int, b2: Int, b3: Int): Boolean =
    (b0 == 0x28 && b1 == 0xb5 && b2 == 0x2f && b3 == 0xfd) ||
      ((b0 & 0xf0) == 0x50 && b1 == 0x2a && b2 == 0x4d && b3 == 0x18)

  // a dictionary rides in ONE skippable frame at the head of the
  // shard; 128 MiB is far beyond any real dictionary (Common Crawl's
  // are ~100 KiB-1 MiB) but keeps a hostile length field from
  // allocating unbounded memory
  private val MaxSkippableBytes = 1L << 27

  private def readN(in: java.io.InputStream, n: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(out, off, n - off)
      if (r < 0) return null
      off += r
    }
    out
  }

  /** Open a continuous zstd decode stream over `in`, consuming any
    * LEADING skippable frames first. If a skippable payload carries a
    * dictionary (raw magic 37 A4 30 EC, or a zstd frame that inflates
    * to one), it is installed via setDict before the content frames
    * stream — the warc-zstd layout. Non-dictionary skippable payloads
    * are simply discarded (their defined semantics). Throws
    * IOException on truncated/hostile input — callers keep their
    * existing construct-time totality catch.
    */
  def open(in0: java.io.InputStream,
      continuous: Boolean = true): java.io.InputStream = {
    val pb = new java.io.PushbackInputStream(in0, 8)
    var dict: Array[Byte] = null
    var scanning = true
    while (scanning) {
      val hdr = new Array[Byte](8)
      var n = 0
      var c = 0
      while (n < 8 && { c = pb.read(); c >= 0 }) { hdr(n) = c.toByte; n += 1 }
      val skippable = n == 8 && (hdr(0) & 0xf0) == 0x50 &&
        (hdr(1) & 0xff) == 0x2a && (hdr(2) & 0xff) == 0x4d &&
        (hdr(3) & 0xff) == 0x18
      if (!skippable) {
        var k = n - 1
        while (k >= 0) { pb.unread(hdr(k) & 0xff); k -= 1 }
        scanning = false
      } else {
        // u32 LE frame size follows the magic
        val size = (hdr(4) & 0xffL) | ((hdr(5) & 0xffL) << 8) |
          ((hdr(6) & 0xffL) << 16) | ((hdr(7) & 0xffL) << 24)
        if (size > MaxSkippableBytes) throw new java.io.IOException(
          s"zstd skippable frame claims $size bytes (budget " +
            s"$MaxSkippableBytes)")
        val payload = readN(pb, size.toInt)
        if (payload == null) throw new java.io.IOException(
          "truncated zstd skippable frame")
        if (dict == null && payload.length >= 4) {
          val p0 = payload(0) & 0xff; val p1 = payload(1) & 0xff
          val p2 = payload(2) & 0xff; val p3 = payload(3) & 0xff
          if (p0 == 0x37 && p1 == 0xa4 && p2 == 0x30 && p3 == 0xec)
            dict = payload
          else if (p0 == 0x28 && p1 == 0xb5 && p2 == 0x2f && p3 == 0xfd) {
            // warc-zstd allows the dictionary itself to ship
            // compressed; inflate through the budgeted kernel
            val d = graft.functions.Udfs.decompress(payload, "zstd")
            if (d != null) dict = d
          }
        }
      }
    }
    // continuous=true on the shard-streaming paths (a truncated tail
    // frame ends the iterator at the last whole record); false on the
    // one-payload decompress kernel, whose contract is truncated →
    // null, not a silent prefix
    val z = new com.github.luben.zstd.ZstdInputStream(pb)
    z.setContinuous(continuous)
    // the byte[] overload LOADS the dictionary into the stream's own
    // native context; the ZstdDictDecompress overload only borrows a
    // shared native dict whose lifetime the caller must manage — with
    // nothing holding it, GC frees the native dict mid-stream and the
    // next read SIGSEGVs (reproduced under the r16 scale probe's
    // allocation pressure)
    if (dict != null) z.setDict(dict)
    z
  }

  /** Fixture complement: wrap `payload` bytes in one skippable frame
    * (magic low-nibble selectable; warc-zstd uses 0x184D2A5D).
    */
  private[graft] def skippableFrame(payload: Array[Byte],
      magicLowNibble: Int = 0xd): Array[Byte] = {
    require(magicLowNibble >= 0 && magicLowNibble <= 0xf)
    val out = new Array[Byte](8 + payload.length)
    out(0) = (0x50 | magicLowNibble).toByte
    out(1) = 0x2a.toByte; out(2) = 0x4d.toByte; out(3) = 0x18.toByte
    val len = payload.length
    out(4) = (len & 0xff).toByte
    out(5) = ((len >> 8) & 0xff).toByte
    out(6) = ((len >> 16) & 0xff).toByte
    out(7) = ((len >> 24) & 0xff).toByte
    System.arraycopy(payload, 0, out, 8, payload.length)
    out
  }

  /** Fixture complement: compress `b` as one zstd frame using a
    * dictionary (the content-frame half of a warc-zstd shard).
    */
  private[graft] def compressWithDict(b: Array[Byte],
      dict: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new com.github.luben.zstd.ZstdOutputStream(bos)
    z.setDict(dict)
    z.write(b); z.close()
    bos.toByteArray
  }

  /** Fixture complement: train-free "dictionary" — zstd accepts any
    * raw content as a dictionary, but warc-zstd shards carry
    * structured ones; build a minimal structured dictionary via
    * ZstdDictTrainer over the given samples.
    */
  private[graft] def trainDict(samples: Seq[Array[Byte]],
      dictSize: Int = 16384): Array[Byte] = {
    val t = new com.github.luben.zstd.ZstdDictTrainer(
      samples.map(_.length).sum + 1024, dictSize)
    samples.foreach(t.addSample)
    t.trainSamples()
  }
}
