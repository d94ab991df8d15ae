package graft

import org.apache.spark.sql.Row
import graft.llm.{ImageHash, MediaHeaders}

class ImageHashSpec extends SparkSpec {
  import spark.implicits._

  private def rgbPng(w: Int, h: Int)(f: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val px = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = f(x, y)
      val o = (y * w + x) * 3
      px(o) = r.toByte; px(o + 1) = g.toByte; px(o + 2) = b.toByte
    }
    MediaHeaders.pngEncode(w, h, 2, px)
  }

  test("dhash64: monotone gradients pin every bit") {
    // luminance strictly decreasing left->right: every adjacent-column
    // comparison is "left brighter" -> all 64 bits set (-1L)
    val dec = rgbPng(9, 8)((x, _) => (200 - x * 20, 200 - x * 20, 200 - x * 20))
    assert(ImageHash.dhash64(dec) == -1L)
    assert(ImageHash.dhashHex(dec) == "f" * 16)
    // strictly increasing -> no bit set
    val inc = rgbPng(9, 8)((x, _) => (x * 20, x * 20, x * 20))
    assert(ImageHash.dhash64(inc) == 0L)
    assert(ImageHash.dhashHex(inc) == "0" * 16)
  }

  test("dhash64: container-invariant (PNG and BMP of the same pixels)") {
    def f(x: Int, y: Int): (Int, Int, Int) = {
      val q = (x * 13 + y * 29) % 251
      ((q * q * 3 + 7) % 256, (q * q * 7 + 3) % 256, (q * q * 11 + 17) % 256)
    }
    val w = 12; val h = 10
    val png = rgbPng(w, h)(f)
    val px = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = f(x, y)
      val o = (y * w + x) * 3
      px(o) = r.toByte; px(o + 1) = g.toByte; px(o + 2) = b.toByte
    }
    val bmp = MediaHeaders.bmpEncode(w, h, px, topDown = false)
    assert(ImageHash.dhash64(png) != null)
    assert(ImageHash.dhash64(png) == ImageHash.dhash64(bmp))
    // TIFF of the same pixels hashes identically through every layout
    // (byte order x strips x PackBits)
    for ((le, pb, rps) <- Seq((true, false, 0), (false, false, 3),
        (true, true, 0), (false, true, 2))) {
      val tif = MediaHeaders.tiffEncode(w, h, px, samplesPerPixel = 3,
        littleEndian = le, packbits = pb, rowsPerStrip = rps)
      assert(ImageHash.dhash64(tif) == ImageHash.dhash64(png),
        s"le=$le pb=$pb rps=$rps")
    }
  }

  test("tiffDecode: exact pixels through every layout; invalid -> null") {
    val w = 7; val h = 5
    val px = Array.tabulate(w * h * 3)(i => ((i * 37 + 11) % 256).toByte)
    for ((le, pb, rps) <- Seq((true, false, 0), (false, false, 2),
        (true, true, 3), (false, true, 0))) {
      val t = MediaHeaders.tiffEncode(w, h, px, samplesPerPixel = 3,
        littleEndian = le, packbits = pb, rowsPerStrip = rps)
      val im = MediaHeaders.tiffDecode(t)
      assert(im != null && im.width == w && im.height == h &&
        im.rgb.toSeq == px.toSeq, s"le=$le pb=$pb rps=$rps")
    }
    // grayscale mirrors; WhiteIsZero inverts (stored 255-v decodes v)
    val g = Array.tabulate(w * h)(i => ((i * 53 + 7) % 256).toByte)
    val tg = MediaHeaders.tiffEncode(w, h, g, samplesPerPixel = 1)
    val img = MediaHeaders.tiffDecode(tg)
    assert(img != null &&
      (0 until w * h).forall(i => img.rgb(3 * i) == g(i) &&
        img.rgb(3 * i + 1) == g(i) && img.rgb(3 * i + 2) == g(i)))
    val inv = g.map(b => (255 - (b & 0xff)).toByte)
    val tw = MediaHeaders.tiffEncode(w, h, inv, samplesPerPixel = 1,
      whiteIsZero = true)
    val imw = MediaHeaders.tiffDecode(tw)
    assert(imw != null &&
      (0 until w * h).forall(i => imw.rgb(3 * i) == g(i)))
    // truncation, bad magic, null: total, no decode
    val full = MediaHeaders.tiffEncode(w, h, px)
    assert(MediaHeaders.tiffDecode(full.take(full.length / 3)) == null)
    assert(MediaHeaders.tiffDecode("II not a tiff".getBytes) == null)
    assert(MediaHeaders.tiffDecode(null) == null)
    // the probe still names a tiff the decoder refuses
    assert(MediaHeaders.probe(full.take(12)).format == "tiff")
  }

  test("dhash64: null for sub-grid images and undecodable payloads") {
    assert(ImageHash.dhash64(rgbPng(8, 8)((_, _) => (1, 2, 3))) == null)
    assert(ImageHash.dhash64(rgbPng(9, 7)((_, _) => (1, 2, 3))) == null)
    assert(ImageHash.dhash64("definitely not an image".getBytes) == null)
    assert(ImageHash.dhash64(null) == null)
    assert(ImageHash.dhashHex(null) == null)
  }

  test("imageDupPairs finds the perturbed twin, not unrelated images") {
    def scramble(seed: Int)(x: Int, y: Int): (Int, Int, Int) = {
      val q = (seed * 97 + x * 13 + y * 29) % 251
      ((q * q * 3 + q * 5 + 7) % 256, (q * q * 7 + q * 11 + 3) % 256,
        (q * q * 11 + q * 3 + 17) % 256)
    }
    // 0 and 1: same image except one corner pixel; 2 and 3: unrelated
    val base = rgbPng(11, 9)(scramble(1))
    val tweaked = rgbPng(11, 9)((x, y) => {
      val (r, g, b) = scramble(1)(x, y)
      if (x == 0 && y == 0) ((r + 113) % 256, (g + 113) % 256, (b + 113) % 256)
      else (r, g, b)
    })
    val other = rgbPng(11, 9)(scramble(2))
    val noise = "not an image".getBytes
    val d = Seq((0L, base), (1L, tweaked), (2L, other), (3L, noise))
      .toDF("id", "payload")
    val pairs = ImageHash.imageDupPairs(d, "payload", "id", maxHamming = 3)
      .collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((0L, 1L)))
    assert(pairs.head.getInt(2) <= 1)
    // keep-smallest-id dedup: the tweaked twin drops, everything else stays
    val kept = ImageHash.imageDedup(d, "payload", "id").select("id")
      .as[Long].collect().toSet
    assert(kept == Set(0L, 2L, 3L))
    // same through the directive surface
    val viaDirective = wrangle("dedup-images :payload :id", d)
      .select("id").as[Long].collect().toSet
    assert(viaDirective == Set(0L, 2L, 3L))
  }

  test("jpeg dhash: planted twins within 3 bits, every cross pair >= 4") {
    // validates the image_dup_pairs_jpeg fixture contract over ALL
    // pairs: deterministic for a fixed JDK codec, so the QueryBank
    // oracle's planted-pair list is exactly reproducible
    val sigs = (0L until 200L).map { id =>
      val jpg = MediaHeaders.jpegEncode(72, 64, QueryBank.jpegDhashPixels(id))
      val h = ImageHash.dhash64(jpg)
      assert(h != null, s"jpeg $id failed to hash")
      id -> h.longValue
    }
    for (i <- sigs.indices; j <- (i + 1) until sigs.size) {
      val ((ia, ha), (ib, hb)) = (sigs(i), sigs(j))
      val d = java.lang.Long.bitCount(ha ^ hb)
      if (ib == ia + 100)
        assert(d <= 3, s"planted twin ($ia,$ib) too far: $d bits")
      else
        assert(d >= 4, s"cross pair ($ia,$ib) too close: $d bits")
    }
    // jpeg payloads flow through the SAME banded pair path as PNG
    val d = (0L until 8L).map(id => (id,
        MediaHeaders.jpegEncode(72, 64, QueryBank.jpegDhashPixels(id)))) ++
      Seq((104L, MediaHeaders.jpegEncode(72, 64,
        QueryBank.jpegDhashPixels(104L))))
    val pairs = ImageHash.imageDupPairs(d.toDF("id", "payload"),
        "payload", "id", maxHamming = 3).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((4L, 104L)))
  }

  test("cross-format twins: PNG vs JPEG of the same plane within 3 bits") {
    // validates the image_dup_pairs_crossformat contract over ALL
    // pairs of the mixed 200-image set: the PNG half hashes formula-
    // exactly, the JPEG half within DCT quantization noise — twins
    // (id, id+100) carry the IDENTICAL pixel plane across formats
    val sigs = (0L until 200L).map { id =>
      val h = ImageHash.dhash64(QueryBank.crossFormatPayload(id))
      assert(h != null, s"payload $id failed to hash")
      id -> h.longValue
    }
    for (i <- sigs.indices; j <- (i + 1) until sigs.size) {
      val ((ia, ha), (ib, hb)) = (sigs(i), sigs(j))
      val d = java.lang.Long.bitCount(ha ^ hb)
      if (ib == ia + 100)
        assert(d <= 3, s"cross-format twin ($ia,$ib) too far: $d bits")
      else
        assert(d >= 4, s"cross pair ($ia,$ib) too close: $d bits")
    }
  }

  test("imageDedupAgainst: state match drops, in-batch dedup, novel survives") {
    def scramble(seed: Int)(x: Int, y: Int): (Int, Int, Int) = {
      val q = (seed * 97 + x * 13 + y * 29) % 251
      ((q * q * 3 + q * 5 + 7) % 256, (q * q * 7 + q * 11 + 3) % 256,
        (q * q * 11 + q * 3 + 17) % 256)
    }
    def tweak(f: (Int, Int) => (Int, Int, Int))(x: Int, y: Int) = {
      val (r, g, b) = f(x, y)
      if (x == 0 && y == 0) ((r + 113) % 256, (g + 113) % 256, (b + 113) % 256)
      else (r, g, b)
    }
    val corpus = Seq((1L, rgbPng(11, 9)(scramble(1)))).toDF("id", "payload")
    val batch = Seq(
      (10L, rgbPng(11, 9)(tweak(scramble(1)))),  // twin of corpus 1 -> drops
      (11L, rgbPng(11, 9)(scramble(2))),         // novel -> survives
      (12L, rgbPng(11, 9)(tweak(scramble(2)))),  // in-batch twin of 11 -> drops
      (13L, "not an image".getBytes))            // undecodable -> survives
      .toDF("id", "payload")
    val state = ImageHash.dhashState(corpus, "payload", "id")
    assert(state.count() == 4) // 4 bands x 1 decodable image
    val kept = ImageHash.imageDedupAgainst(batch, "payload", "id", state)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(11L, 13L), s"got $kept")
    // survivors' state appends carry the table forward
    val next = state.unionByName(ImageHash.dhashState(
      batch.filter($"id".isin(11L, 13L)), "payload", "id"))
    assert(next.count() == 8) // 13 is undecodable, contributes nothing
  }

  test("incremental identity: against-state equals full dedup on the union") {
    // when every corpus id precedes every batch id, imageDedupAgainst
    // survivors must equal full imageDedup over corpus+batch restricted
    // to batch ids — same identity RobustnessSpec proves for MinHash
    def scramble(seed: Int)(x: Int, y: Int): (Int, Int, Int) = {
      val q = (seed * 97 + x * 13 + y * 29) % 251
      ((q * q * 3 + q * 5 + 7) % 256, (q * q * 7 + q * 11 + 3) % 256,
        (q * q * 11 + q * 3 + 17) % 256)
    }
    def tweak(f: (Int, Int) => (Int, Int, Int))(x: Int, y: Int) = {
      val (r, g, b) = f(x, y)
      if (x == 0 && y == 0) ((r + 113) % 256, (g + 113) % 256, (b + 113) % 256)
      else (r, g, b)
    }
    val corpus = (1 to 8).map(s => (s.toLong, rgbPng(11, 9)(scramble(s))))
      .toDF("id", "payload")
    val batch = (
      (5 to 12).map(s => (100L + s, rgbPng(11, 9)(tweak(scramble(s))))) ++
      Seq((200L, "noise".getBytes))).toDF("id", "payload")
    val viaState = ImageHash.imageDedupAgainst(batch, "payload", "id",
        ImageHash.dhashState(corpus, "payload", "id"))
      .select("id").as[Long].collect().toSet
    val viaFull = ImageHash.imageDedup(corpus.unionByName(batch),
        "payload", "id")
      .filter($"id" >= 100L).select("id").as[Long].collect().toSet
    assert(viaState == viaFull, s"state=$viaState full=$viaFull")
    // twins of corpus seeds 5..8 dropped; seeds 9..12 novel; noise kept
    assert(viaState == Set(109L, 110L, 111L, 112L, 200L))
  }

  /** Hand-assembled little-endian TIFF: header + one IFD of the given
    * (tag, type, count, value) entries + trailing payload bytes.
    */
  private def craftTiffLE(entries: Seq[(Int, Int, Long, Long)],
      payload: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer
      .allocate(8 + 2 + entries.size * 12 + 4 + payload.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('I'.toByte).put('I'.toByte).put(0x2a.toByte).put(0.toByte)
    bb.putInt(8) // IFD0 offset
    bb.putShort(entries.size.toShort)
    for ((tag, typ, cnt, v) <- entries) {
      bb.putShort(tag.toShort).putShort(typ.toShort)
      bb.putInt(cnt.toInt).putInt(v.toInt)
    }
    bb.putInt(0) // next IFD
    bb.put(payload)
    bb.array()
  }

  test("tiffDecode: header-claimed giant dims over a tiny payload -> " +
      "null before the pixel buffer is allocated") {
    // 20000x20000 grayscale PackBits with a 4-byte strip: raw size
    // (400 MB) exceeds any possible PackBits expansion of 4 input
    // bytes, so the decoder must reject from the strip pre-validation
    // (the r16 advice: a ~60-byte crafted file could force the
    // allocation from header dims alone)
    val dataOff = 8 + 2 + 9 * 12 + 4
    val bomb = craftTiffLE(Seq(
      (256, 3, 1, 20000L), (257, 3, 1, 20000L), (258, 3, 1, 8L),
      (259, 3, 1, 32773L), (262, 3, 1, 1L), (273, 4, 1, dataOff.toLong),
      (277, 3, 1, 1L), (278, 4, 1, 20000L), (279, 4, 1, 4L)),
      Array[Byte](0, 0, 0, 0))
    assert(MediaHeaders.tiffDecode(bomb) == null)
    // uncompressed variant: strip count != exact pixel bytes -> null
    val bombU = craftTiffLE(Seq(
      (256, 3, 1, 20000L), (257, 3, 1, 20000L), (258, 3, 1, 8L),
      (259, 3, 1, 1L), (262, 3, 1, 1L), (273, 4, 1, dataOff.toLong),
      (277, 3, 1, 1L), (278, 4, 1, 20000L), (279, 4, 1, 4L)),
      Array[Byte](0, 0, 0, 0))
    assert(MediaHeaders.tiffDecode(bombU) == null)
  }

  test("probe: TIFF dimension entry with count > 1 is an offset, " +
      "not a value — left null") {
    // tag 256 with count 2 stores an OFFSET in the value field; a
    // probe that read it as the width would report garbage dims
    val t = craftTiffLE(Seq(
      (256, 3, 2, 26L), (257, 3, 1, 77L)), Array[Byte](9, 0, 9, 0))
    val p = MediaHeaders.probe(t)
    assert(p.format == "tiff")
    assert(p.width == null, s"width must be null, got ${p.width}")
    assert(p.height == 77)
  }
}
