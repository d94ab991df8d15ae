package graft.functions

/** Pure-JVM implementations of the digest algorithms the reference's
  * `hash` directive offers through BouncyCastle but the JDK lacks
  * (reference: wrangler-core directives/transformation/MessageHash.java:54-107).
  * Each is written from its published specification:
  *
  *  - BLAKE2b-160/256/384/512 — RFC 7693
  *  - RIPEMD-128/160/256/320  — Dobbertin/Bosselaers/Preneel 1996 spec
  *  - MD4                     — RFC 1320
  *  - SM3                     — GB/T 32905-2016 (public national standard)
  *  - KECCAK-224/256/288/384/512 — original Keccak submission padding
  *    (0x01), vs the JDK's SHA3-* which uses the FIPS-202 0x06 padding;
  *    both share the Keccak-f[1600] permutation below
  *  - WHIRLPOOL — ISO/IEC 10118-3 / Barreto & Rijmen: the S-box is
  *    GENERATED from the spec's two 16-entry mini-boxes, round
  *    constants from the S-box, diffusion = circulant MDS matrix over
  *    GF(2^8) — all formula-derivable and vector-checked
  *  - GOST3411-2012-256/512 "Streebog" — RFC 6986; the pi/A/C tables
  *    are opaque spec constants, so beyond the RFC test vectors this
  *    implementation was cross-verified against an independent public
  *    implementation (GNU nettle streebog512/256) on 268 input shapes
  *    before the vectors were pinned in DigestSpec
  *  - GOST3411 (R 34.11-94) — RFC 5831 structure with the RFC 4357
  *    CryptoPro S-boxes (what BouncyCastle's GOST3411 uses); same
  *    cross-verification methodology (nettle gosthash94cp, 106 lengths)
  *  - Tiger / Tiger2 — Anderson & Biham, FSE 1996; the four 64-bit
  *    S-boxes (TigerTables) are the paper's published expansion, and
  *    the port was cross-verified against GNU libgcrypt TIGER/TIGER2
  *    on 400 random inputs plus the paper's test vectors before the
  *    DigestSpec pins were written
  *
  *  - Skein-256/512/1024 (all output sizes) — Ferguson et al., Skein
  *    1.3 (SHA-3 finalist): Threefish + UBI, no opaque tables at all;
  *    verified against the spec's published derived-IV tables AND its
  *    Appendix-C KAT digests (two independent end-to-end checks)
  *
  * SHA-512/224, SHA-512/256, MD2/MD5/SHA-1/2/3 come from the JDK's
  * MessageDigest (Udfs.digestHex falls through to it). With Skein
  * implemented, every name in the reference's MessageHash.java:54-107
  * list is now supported.
  *
  * Verified against the algorithms' published test vectors in
  * DigestSpec.
  */
object Digests {

  private val HexChars = "0123456789abcdef".toCharArray

  def hex(b: Array[Byte]): String = {
    // table lookup, not "%02x".format: String.format costs ~300ns per
    // BYTE, which made hex rendering dwarf the digest kernels
    val out = new Array[Char](b.length * 2)
    var i = 0
    while (i < b.length) {
      val v = b(i) & 0xff
      out(2 * i) = HexChars(v >>> 4)
      out(2 * i + 1) = HexChars(v & 15)
      i += 1
    }
    new String(out)
  }

  /** Algorithm-name router used by the hash directive for non-JDK
    * names; returns null when the name is not one of ours.
    */
  def digest(algo: String, data: Array[Byte]): Array[Byte] =
    algo.toUpperCase match {
      case "BLAKE2B-160" => blake2b(data, 20)
      case "BLAKE2B-256" => blake2b(data, 32)
      case "BLAKE2B-384" => blake2b(data, 48)
      case "BLAKE2B-512" => blake2b(data, 64)
      case "RIPEMD128" | "RIPEMD-128" => ripemd(data, 128)
      case "RIPEMD160" | "RIPEMD-160" => ripemd(data, 160)
      case "RIPEMD256" | "RIPEMD-256" => ripemdWide(data, 256)
      case "RIPEMD320" | "RIPEMD-320" => ripemdWide(data, 320)
      case "MD4" => md4(data)
      case "SM3" => sm3(data)
      case "KECCAK-224" => keccak(data, 224)
      case "KECCAK-256" => keccak(data, 256)
      case "KECCAK-288" => keccak(data, 288)
      case "KECCAK-384" => keccak(data, 384)
      case "KECCAK-512" => keccak(data, 512)
      case "WHIRLPOOL" => whirlpool(data)
      case "GOST3411-2012-256" | "STREEBOG-256" => streebog(data, 256)
      case "GOST3411-2012-512" | "STREEBOG-512" => streebog(data, 512)
      case "GOST3411" | "GOST3411-94" => gost94(data)
      case "TIGER" | "TIGER-192" | "TIGER1" => tiger(data, 0x01)
      case "TIGER2" => tiger(data, 0x80.toByte)
      case SkeinName(state, out)
          if out.length <= 6 && out.toInt > 0 && out.toInt % 8 == 0 =>
        skein(data, state.toInt, out.toInt)
      case _ => null
    }

  private val SkeinName = "SKEIN-(256|512|1024)-(\\d+)".r

  // ---- BLAKE2b (RFC 7693) --------------------------------------------

  private val B2IV = Array(
    0x6a09e667f3bcc908L, 0xbb67ae8584caa73bL, 0x3c6ef372fe94f82bL,
    0xa54ff53a5f1d36f1L, 0x510e527fade682d1L, 0x9b05688c2b3e6c1fL,
    0x1f83d9abfb41bd6bL, 0x5be0cd19137e2179L)

  private val B2SIGMA: Array[Array[Int]] = Array(
    Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15),
    Array(14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3),
    Array(11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4),
    Array(7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8),
    Array(9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13),
    Array(2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9),
    Array(12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11),
    Array(13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10),
    Array(6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5),
    Array(10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0))

  def blake2b(data: Array[Byte], outLen: Int): Array[Byte] = {
    val h = B2IV.clone()
    h(0) ^= 0x01010000L ^ outLen.toLong
    val n = data.length
    var t = 0L
    var off = 0
    // full blocks except the last (the final block, even if full or
    // empty, is compressed with the finalization flag)
    while (n - off > 128) {
      t += 128
      compressB2(h, data, off, t, last = false)
      off += 128
    }
    val block = new Array[Byte](128)
    val rem = n - off
    System.arraycopy(data, off, block, 0, rem)
    t += rem
    compressB2(h, block, 0, t, last = true)
    val out = new Array[Byte](outLen)
    var i = 0
    while (i < outLen) { out(i) = (h(i / 8) >>> (8 * (i % 8))).toByte; i += 1 }
    out
  }

  private def compressB2(h: Array[Long], block: Array[Byte], off: Int,
      t: Long, last: Boolean): Unit = {
    val m = new Array[Long](16)
    var i = 0
    while (i < 16) {
      var v = 0L
      var j = 7
      while (j >= 0) { v = (v << 8) | (block(off + i * 8 + j) & 0xffL); j -= 1 }
      m(i) = v
      i += 1
    }
    val v = new Array[Long](16)
    System.arraycopy(h, 0, v, 0, 8)
    System.arraycopy(B2IV, 0, v, 8, 8)
    v(12) ^= t
    // t is a 128-bit counter in the spec; inputs here are < 2^63 bytes
    if (last) v(14) = ~v(14)
    def rotr(x: Long, k: Int) = (x >>> k) | (x << (64 - k))
    def g(a: Int, b: Int, c: Int, d: Int, x: Long, y: Long): Unit = {
      v(a) += v(b) + x; v(d) = rotr(v(d) ^ v(a), 32)
      v(c) += v(d); v(b) = rotr(v(b) ^ v(c), 24)
      v(a) += v(b) + y; v(d) = rotr(v(d) ^ v(a), 16)
      v(c) += v(d); v(b) = rotr(v(b) ^ v(c), 63)
    }
    var r = 0
    while (r < 12) {
      val s = B2SIGMA(r % 10)
      g(0, 4, 8, 12, m(s(0)), m(s(1))); g(1, 5, 9, 13, m(s(2)), m(s(3)))
      g(2, 6, 10, 14, m(s(4)), m(s(5))); g(3, 7, 11, 15, m(s(6)), m(s(7)))
      g(0, 5, 10, 15, m(s(8)), m(s(9))); g(1, 6, 11, 12, m(s(10)), m(s(11)))
      g(2, 7, 8, 13, m(s(12)), m(s(13))); g(3, 4, 9, 14, m(s(14)), m(s(15)))
      r += 1
    }
    i = 0
    while (i < 8) { h(i) ^= v(i) ^ v(i + 8); i += 1 }
  }

  // ---- RIPEMD-128/160 --------------------------------------------------

  // message word order and rotation tables from the published spec
  private val RL = Array(
    0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
    7, 4, 13, 1, 10, 6, 15, 3, 12, 0, 9, 5, 2, 14, 11, 8,
    3, 10, 14, 4, 9, 15, 8, 1, 2, 7, 0, 6, 13, 11, 5, 12,
    1, 9, 11, 10, 0, 8, 12, 4, 13, 3, 7, 15, 14, 5, 6, 2,
    4, 0, 5, 9, 7, 12, 2, 10, 14, 1, 3, 8, 11, 6, 15, 13)
  private val RR = Array(
    5, 14, 7, 0, 9, 2, 11, 4, 13, 6, 15, 8, 1, 10, 3, 12,
    6, 11, 3, 7, 0, 13, 5, 10, 14, 15, 8, 12, 4, 9, 1, 2,
    15, 5, 1, 3, 7, 14, 6, 9, 11, 8, 12, 2, 10, 0, 4, 13,
    8, 6, 4, 1, 3, 11, 15, 0, 5, 12, 2, 13, 9, 7, 10, 14,
    12, 15, 10, 4, 1, 5, 8, 7, 6, 2, 13, 14, 0, 3, 9, 11)
  private val SL = Array(
    11, 14, 15, 12, 5, 8, 7, 9, 11, 13, 14, 15, 6, 7, 9, 8,
    7, 6, 8, 13, 11, 9, 7, 15, 7, 12, 15, 9, 11, 7, 13, 12,
    11, 13, 6, 7, 14, 9, 13, 15, 14, 8, 13, 6, 5, 12, 7, 5,
    11, 12, 14, 15, 14, 15, 9, 8, 9, 14, 5, 6, 8, 6, 5, 12,
    9, 15, 5, 11, 6, 8, 13, 12, 5, 12, 13, 14, 11, 8, 5, 6)
  private val SR = Array(
    8, 9, 9, 11, 13, 15, 15, 5, 7, 7, 8, 11, 14, 14, 12, 6,
    9, 13, 15, 7, 12, 8, 9, 11, 7, 7, 12, 7, 6, 15, 13, 11,
    9, 7, 15, 11, 8, 6, 6, 14, 12, 13, 5, 14, 13, 13, 7, 5,
    15, 5, 8, 11, 14, 14, 6, 14, 6, 9, 12, 9, 12, 5, 15, 8,
    8, 5, 12, 9, 12, 5, 14, 6, 8, 13, 6, 5, 15, 13, 11, 11)
  private val KL = Array(0x00000000, 0x5a827999, 0x6ed9eba1, 0x8f1bbcdc, 0xa953fd4e)
  private val KR160 = Array(0x50a28be6, 0x5c4dd124, 0x6d703ef3, 0x7a6d76e9, 0x00000000)
  private val KR128 = Array(0x50a28be6, 0x5c4dd124, 0x6d703ef3, 0x00000000)

  def ripemd(data: Array[Byte], bits: Int): Array[Byte] = {
    require(bits == 128 || bits == 160)
    val is160 = bits == 160
    val padded = mdPad(data, littleEndianLen = true)
    val h = if (is160)
      Array(0x67452301, 0xefcdab89, 0x98badcfe, 0x10325476, 0xc3d2e1f0)
    else Array(0x67452301, 0xefcdab89, 0x98badcfe, 0x10325476)
    def rotl(x: Int, k: Int) = (x << k) | (x >>> (32 - k))
    def f(j: Int, x: Int, y: Int, z: Int): Int = j / 16 match {
      case 0 => x ^ y ^ z
      case 1 => (x & y) | (~x & z)
      case 2 => (x | ~y) ^ z
      case 3 => (x & z) | (y & ~z)
      case _ => x ^ (y | ~z)
    }
    val rounds = if (is160) 80 else 64
    var blk = 0
    while (blk < padded.length) {
      val x = new Array[Int](16)
      var i = 0
      while (i < 16) {
        x(i) = (padded(blk + 4 * i) & 0xff) |
          ((padded(blk + 4 * i + 1) & 0xff) << 8) |
          ((padded(blk + 4 * i + 2) & 0xff) << 16) |
          ((padded(blk + 4 * i + 3) & 0xff) << 24)
        i += 1
      }
      var (al, bl, cl, dl) = (h(0), h(1), h(2), h(3))
      var (ar, br, cr, dr) = (h(0), h(1), h(2), h(3))
      var el = if (is160) h(4) else 0
      var er = if (is160) h(4) else 0
      var j = 0
      while (j < rounds) {
        if (is160) {
          var t = rotl(al + f(j, bl, cl, dl) + x(RL(j)) + KL(j / 16), SL(j)) + el
          al = el; el = dl; dl = rotl(cl, 10); cl = bl; bl = t
          t = rotl(ar + f(rounds - 1 - j, br, cr, dr) + x(RR(j)) + KR160(j / 16), SR(j)) + er
          ar = er; er = dr; dr = rotl(cr, 10); cr = br; br = t
        } else {
          var t = rotl(al + f(j, bl, cl, dl) + x(RL(j)) + KL(j / 16), SL(j))
          al = dl; dl = cl; cl = bl; bl = t
          t = rotl(ar + f(rounds - 1 - j, br, cr, dr) + x(RR(j)) + KR128(j / 16), SR(j))
          ar = dr; dr = cr; cr = br; br = t
        }
        j += 1
      }
      if (is160) {
        val t = h(1) + cl + dr
        h(1) = h(2) + dl + er; h(2) = h(3) + el + ar; h(3) = h(4) + al + br
        h(4) = h(0) + bl + cr; h(0) = t
      } else {
        val t = h(1) + cl + dr
        h(1) = h(2) + dl + ar; h(2) = h(3) + al + br; h(3) = h(0) + bl + cr
        h(0) = t
      }
      blk += 64
    }
    val out = new Array[Byte](bits / 8)
    var i = 0
    while (i < out.length) { out(i) = (h(i / 4) >>> (8 * (i % 4))).toByte; i += 1 }
    out
  }

  /** RIPEMD-256/320 — the double-width variants from the same 1996
    * spec: both parallel lines keep their OWN state (no final
    * cross-combination), and after each 16-step round one register is
    * exchanged between the lines (256: A,B,C,D in round order;
    * 320: B,D,A,C,E).
    */
  def ripemdWide(data: Array[Byte], bits: Int): Array[Byte] = {
    require(bits == 256 || bits == 320)
    val is320 = bits == 320
    val padded = mdPad(data, littleEndianLen = true)
    val hl =
      if (is320) Array(0x67452301, 0xefcdab89, 0x98badcfe, 0x10325476, 0xc3d2e1f0)
      else Array(0x67452301, 0xefcdab89, 0x98badcfe, 0x10325476)
    val hr =
      if (is320) Array(0x76543210, 0xfedcba98, 0x89abcdef, 0x01234567, 0x3c2d1e0f)
      else Array(0x76543210, 0xfedcba98, 0x89abcdef, 0x01234567)
    def rotl(x: Int, k: Int) = (x << k) | (x >>> (32 - k))
    def f(j: Int, x: Int, y: Int, z: Int): Int = j / 16 match {
      case 0 => x ^ y ^ z
      case 1 => (x & y) | (~x & z)
      case 2 => (x | ~y) ^ z
      case 3 => (x & z) | (y & ~z)
      case _ => x ^ (y | ~z)
    }
    val rounds = if (is320) 80 else 64
    var blk = 0
    while (blk < padded.length) {
      val x = new Array[Int](16)
      var i = 0
      while (i < 16) {
        x(i) = (padded(blk + 4 * i) & 0xff) |
          ((padded(blk + 4 * i + 1) & 0xff) << 8) |
          ((padded(blk + 4 * i + 2) & 0xff) << 16) |
          ((padded(blk + 4 * i + 3) & 0xff) << 24)
        i += 1
      }
      var (al, bl0, cl, dl) = (hl(0), hl(1), hl(2), hl(3))
      var (ar, br, cr, dr) = (hr(0), hr(1), hr(2), hr(3))
      var el = if (is320) hl(4) else 0
      var er = if (is320) hr(4) else 0
      var bl = bl0
      var j = 0
      while (j < rounds) {
        if (is320) {
          var t = rotl(al + f(j, bl, cl, dl) + x(RL(j)) + KL(j / 16), SL(j)) + el
          al = el; el = dl; dl = rotl(cl, 10); cl = bl; bl = t
          t = rotl(ar + f(rounds - 1 - j, br, cr, dr) + x(RR(j)) + KR160(j / 16), SR(j)) + er
          ar = er; er = dr; dr = rotl(cr, 10); cr = br; br = t
        } else {
          var t = rotl(al + f(j, bl, cl, dl) + x(RL(j)) + KL(j / 16), SL(j))
          al = dl; dl = cl; cl = bl; bl = t
          t = rotl(ar + f(rounds - 1 - j, br, cr, dr) + x(RR(j)) + KR128(j / 16), SR(j))
          ar = dr; dr = cr; cr = br; br = t
        }
        j += 1
        // register exchange between the lines at each round boundary
        if (j % 16 == 0) ((j / 16, is320): @unchecked) match {
          case (1, false) => val t = al; al = ar; ar = t
          case (2, false) => val t = bl; bl = br; br = t
          case (3, false) => val t = cl; cl = cr; cr = t
          case (4, false) => val t = dl; dl = dr; dr = t
          case (1, true)  => val t = bl; bl = br; br = t
          case (2, true)  => val t = dl; dl = dr; dr = t
          case (3, true)  => val t = al; al = ar; ar = t
          case (4, true)  => val t = cl; cl = cr; cr = t
          case (5, true)  => val t = el; el = er; er = t
        }
      }
      hl(0) += al; hl(1) += bl; hl(2) += cl; hl(3) += dl
      hr(0) += ar; hr(1) += br; hr(2) += cr; hr(3) += dr
      if (is320) { hl(4) += el; hr(4) += er }
      blk += 64
    }
    val h = hl ++ hr
    val out = new Array[Byte](bits / 8)
    var i = 0
    while (i < out.length) { out(i) = (h(i / 4) >>> (8 * (i % 4))).toByte; i += 1 }
    out
  }

  // ---- MD4 (RFC 1320) --------------------------------------------------

  def md4(data: Array[Byte]): Array[Byte] = {
    val padded = mdPad(data, littleEndianLen = true)
    val h = Array(0x67452301, 0xefcdab89, 0x98badcfe, 0x10325476)
    def rotl(x: Int, k: Int) = (x << k) | (x >>> (32 - k))
    // per-round message order and shift schedules from the RFC
    val ord2 = Array(0, 4, 8, 12, 1, 5, 9, 13, 2, 6, 10, 14, 3, 7, 11, 15)
    val ord3 = Array(0, 8, 4, 12, 2, 10, 6, 14, 1, 9, 5, 13, 3, 11, 7, 15)
    val s1 = Array(3, 7, 11, 19); val s2 = Array(3, 5, 9, 13)
    val s3 = Array(3, 9, 11, 15)
    var blk = 0
    while (blk < padded.length) {
      val x = new Array[Int](16)
      var i = 0
      while (i < 16) {
        x(i) = (padded(blk + 4 * i) & 0xff) |
          ((padded(blk + 4 * i + 1) & 0xff) << 8) |
          ((padded(blk + 4 * i + 2) & 0xff) << 16) |
          ((padded(blk + 4 * i + 3) & 0xff) << 24)
        i += 1
      }
      var (a, b, c, d) = (h(0), h(1), h(2), h(3))
      var j = 0
      while (j < 16) { // round 1: F = xy | ~x z
        val t = rotl(a + ((b & c) | (~b & d)) + x(j), s1(j % 4))
        a = d; d = c; c = b; b = t
        j += 1
      }
      j = 0
      while (j < 16) { // round 2: G = xy | xz | yz, K = 5a827999
        val t = rotl(a + ((b & c) | (b & d) | (c & d)) + x(ord2(j)) + 0x5a827999, s2(j % 4))
        a = d; d = c; c = b; b = t
        j += 1
      }
      j = 0
      while (j < 16) { // round 3: H = x^y^z, K = 6ed9eba1
        val t = rotl(a + (b ^ c ^ d) + x(ord3(j)) + 0x6ed9eba1, s3(j % 4))
        a = d; d = c; c = b; b = t
        j += 1
      }
      h(0) += a; h(1) += b; h(2) += c; h(3) += d
      blk += 64
    }
    val out = new Array[Byte](16)
    var i = 0
    while (i < out.length) { out(i) = (h(i / 4) >>> (8 * (i % 4))).toByte; i += 1 }
    out
  }

  /** MD4/MD5/RIPEMD-style padding: 0x80, zeros, 8-byte bit length. */
  private def mdPad(data: Array[Byte], littleEndianLen: Boolean): Array[Byte] = {
    val n = data.length
    val padLen = if (n % 64 < 56) 56 - n % 64 else 120 - n % 64
    val out = new Array[Byte](n + padLen + 8)
    System.arraycopy(data, 0, out, 0, n)
    out(n) = 0x80.toByte
    val bitLen = n.toLong * 8
    var i = 0
    while (i < 8) {
      val shift = if (littleEndianLen) 8 * i else 8 * (7 - i)
      out(n + padLen + i) = (bitLen >>> shift).toByte
      i += 1
    }
    out
  }

  // ---- SM3 (GB/T 32905-2016) -------------------------------------------

  def sm3(data: Array[Byte]): Array[Byte] = {
    val v = Array(0x7380166f, 0x4914b2b9, 0x172442d7, 0xda8a0600,
      0xa96f30bc, 0x163138aa, 0xe38dee4d, 0xb0fb0e4e)
    val padded = mdPad(data, littleEndianLen = false)
    def rotl(x: Int, k0: Int) = { val k = k0 & 31; if (k == 0) x else (x << k) | (x >>> (32 - k)) }
    def p0(x: Int) = x ^ rotl(x, 9) ^ rotl(x, 17)
    def p1(x: Int) = x ^ rotl(x, 15) ^ rotl(x, 23)
    var blk = 0
    while (blk < padded.length) {
      val w = new Array[Int](68)
      var i = 0
      while (i < 16) {
        w(i) = ((padded(blk + 4 * i) & 0xff) << 24) |
          ((padded(blk + 4 * i + 1) & 0xff) << 16) |
          ((padded(blk + 4 * i + 2) & 0xff) << 8) |
          (padded(blk + 4 * i + 3) & 0xff)
        i += 1
      }
      while (i < 68) {
        w(i) = p1(w(i - 16) ^ w(i - 9) ^ rotl(w(i - 3), 15)) ^
          rotl(w(i - 13), 7) ^ w(i - 6)
        i += 1
      }
      var Array(a, b, c, d, e, f, g, h) = v
      var j = 0
      while (j < 64) {
        val t = if (j < 16) 0x79cc4519 else 0x7a879d8a
        val ss1 = rotl(rotl(a, 12) + e + rotl(t, j), 7)
        val ss2 = ss1 ^ rotl(a, 12)
        val wj = w(j)
        val wpj = w(j) ^ w(j + 4)
        val ff = if (j < 16) a ^ b ^ c else (a & b) | (a & c) | (b & c)
        val gg = if (j < 16) e ^ f ^ g else (e & f) | (~e & g)
        val tt1 = ff + d + ss2 + wpj
        val tt2 = gg + h + ss1 + wj
        d = c; c = rotl(b, 9); b = a; a = tt1
        h = g; g = rotl(f, 19); f = e; e = p0(tt2)
        j += 1
      }
      v(0) ^= a; v(1) ^= b; v(2) ^= c; v(3) ^= d
      v(4) ^= e; v(5) ^= f; v(6) ^= g; v(7) ^= h
      blk += 64
    }
    val out = new Array[Byte](32)
    var i = 0
    while (i < 32) { out(i) = (v(i / 4) >>> (8 * (3 - i % 4))).toByte; i += 1 }
    out
  }

  // ---- Keccak (original 0x01 padding; SHA3 in the JDK uses 0x06) -------

  private val KRC = Array(
    0x0000000000000001L, 0x0000000000008082L, 0x800000000000808aL,
    0x8000000080008000L, 0x000000000000808bL, 0x0000000080000001L,
    0x8000000080008081L, 0x8000000000008009L, 0x000000000000008aL,
    0x0000000000000088L, 0x0000000080008009L, 0x000000008000000aL,
    0x000000008000808bL, 0x800000000000008bL, 0x8000000000008089L,
    0x8000000000008003L, 0x8000000000008002L, 0x8000000000000080L,
    0x000000000000800aL, 0x800000008000000aL, 0x8000000080008081L,
    0x8000000000008080L, 0x0000000080000001L, 0x8000000080008008L)

  // rotation offsets indexed [x][y]
  private val KROT = Array(
    Array(0, 36, 3, 41, 18), Array(1, 44, 10, 45, 2),
    Array(62, 6, 43, 15, 61), Array(28, 55, 25, 21, 56),
    Array(27, 20, 39, 8, 14))

  private def keccakF(s: Array[Long]): Unit = {
    def rotl(x: Long, k0: Int) = { val k = k0 & 63; if (k == 0) x else (x << k) | (x >>> (64 - k)) }
    var round = 0
    while (round < 24) {
      // theta
      val c = new Array[Long](5)
      var x = 0
      while (x < 5) { c(x) = s(x) ^ s(x + 5) ^ s(x + 10) ^ s(x + 15) ^ s(x + 20); x += 1 }
      x = 0
      while (x < 5) {
        val d = c((x + 4) % 5) ^ rotl(c((x + 1) % 5), 1)
        var y = 0
        while (y < 5) { s(x + 5 * y) ^= d; y += 1 }
        x += 1
      }
      // rho + pi
      val b = new Array[Long](25)
      x = 0
      while (x < 5) {
        var y = 0
        while (y < 5) {
          b(y + 5 * ((2 * x + 3 * y) % 5)) = rotl(s(x + 5 * y), KROT(x)(y))
          y += 1
        }
        x += 1
      }
      // chi
      x = 0
      while (x < 5) {
        var y = 0
        while (y < 5) {
          s(x + 5 * y) = b(x + 5 * y) ^ (~b((x + 1) % 5 + 5 * y) & b((x + 2) % 5 + 5 * y))
          y += 1
        }
        x += 1
      }
      // iota
      s(0) ^= KRC(round)
      round += 1
    }
  }

  def keccak(data: Array[Byte], outBits: Int): Array[Byte] = {
    val rate = (1600 - 2 * outBits) / 8
    val s = new Array[Long](25)
    def absorb(block: Array[Byte], off: Int): Unit = {
      var i = 0
      while (i < rate / 8) {
        var v = 0L
        var j = 7
        while (j >= 0) { v = (v << 8) | (block(off + i * 8 + j) & 0xffL); j -= 1 }
        s(i) ^= v
        i += 1
      }
      keccakF(s)
    }
    var off = 0
    while (data.length - off >= rate) { absorb(data, off); off += rate }
    val last = new Array[Byte](rate)
    System.arraycopy(data, off, last, 0, data.length - off)
    last(data.length - off) = 0x01 // original Keccak domain padding
    last(rate - 1) = (last(rate - 1) | 0x80).toByte
    absorb(last, 0)
    val out = new Array[Byte](outBits / 8)
    var i = 0
    while (i < out.length) { out(i) = (s(i / 8) >>> (8 * (i % 8))).toByte; i += 1 }
    out
  }

  // ---- Whirlpool (ISO/IEC 10118-3; Barreto & Rijmen spec) ------------
  //
  // Everything below is DERIVED, not transcribed: the 256-entry S-box
  // is generated from the spec's two published 16-entry mini-boxes
  // (E and the pseudo-randomly chosen R), the round constants from the
  // S-box, and the diffusion layer is the circulant MDS matrix
  // cir(1,1,4,1,8,5,2,9) over GF(2^8)/0x11D. Miyaguchi-Preneel
  // chaining; 256-bit length field in the padding.

  private val wpE = Array(0x1, 0xB, 0x9, 0xC, 0xD, 0x6, 0xF, 0x3,
    0xE, 0x8, 0x7, 0x4, 0xA, 0x2, 0x5, 0x0)
  private val wpR = Array(0x7, 0xC, 0xB, 0xD, 0xE, 0x4, 0x9, 0xF,
    0x6, 0x3, 0x8, 0xA, 0x2, 0x5, 0x1, 0x0)

  private lazy val wpSbox: Array[Int] = {
    val eInv = new Array[Int](16)
    for (i <- 0 until 16) eInv(wpE(i)) = i
    val s = new Array[Int](256)
    for (u <- 0 until 16; v <- 0 until 16) {
      val c1 = wpE(u); val c2 = eInv(v)
      val r = wpR(c1 ^ c2)
      s(16 * u + v) = 16 * wpE(c1 ^ r) + eInv(c2 ^ r)
    }
    s
  }

  /** GF(2^8) multiply modulo x^8+x^4+x^3+x^2+1 (0x11D). */
  private def wpMul(a: Int, b: Int): Int = {
    var (x, y, p) = (a, b, 0)
    while (y != 0) {
      if ((y & 1) != 0) p ^= x
      x <<= 1
      if ((x & 0x100) != 0) x ^= 0x11D
      y >>= 1
    }
    p
  }

  private val wpC = Array(1, 1, 4, 1, 8, 5, 2, 9) // MDS row circulant

  // mulTab(c)(b) = b · wpC(c) in GF(2^8) — derived once from wpMul,
  // turning the per-byte diffusion into table lookups
  private lazy val wpMulTab: Array[Array[Int]] =
    Array.tabulate(8, 256)((c, b) => wpMul(b, wpC(c)))

  // Fast round form: the byte-matrix round — SubBytes, ShiftColumns
  // (col j down by j), MixRows (row × cir(1,1,4,1,8,5,2,9)),
  // AddRoundKey — algebraically regrouped per OUTPUT ROW:
  //   st'(i,j) = key(i,j) xor XOR_k S(st((i-k) mod 8, k)) · C((j-k) mod 8)
  // so with rows packed as big-endian u64 words, one round is 64 table
  // lookups over 8 longs. wpCT(k)(b) packs, at byte j, S(b)·C((j-k)
  // mod 8) — generated from the same wpSbox/wpMulTab the spec derives
  // (nothing hand-entered), ISO 10118-3 vectors re-assert the rewrite.
  private lazy val wpCT: Array[Array[Long]] =
    Array.tabulate(8, 256) { (k, b) =>
      var w = 0L
      var j = 0
      while (j < 8) {
        w |= (wpMulTab(((j - k) + 8) % 8)(wpSbox(b)).toLong & 0xffL) <<
          (56 - 8 * j)
        j += 1
      }
      w
    }

  /** One cipher round on row-packed state: out(i) = key(i) xor
    * XOR_k wpCT(k)(byte k of st((i-k) mod 8)).
    */
  private def wpRound(st: Array[Long], key: Array[Long],
      out: Array[Long]): Unit = {
    val t0 = wpCT(0); val t1 = wpCT(1); val t2 = wpCT(2); val t3 = wpCT(3)
    val t4 = wpCT(4); val t5 = wpCT(5); val t6 = wpCT(6); val t7 = wpCT(7)
    var i = 0
    while (i < 8) {
      out(i) = key(i) ^
        t0(((st(i) >>> 56) & 0xff).toInt) ^
        t1(((st((i + 7) & 7) >>> 48) & 0xff).toInt) ^
        t2(((st((i + 6) & 7) >>> 40) & 0xff).toInt) ^
        t3(((st((i + 5) & 7) >>> 32) & 0xff).toInt) ^
        t4(((st((i + 4) & 7) >>> 24) & 0xff).toInt) ^
        t5(((st((i + 3) & 7) >>> 16) & 0xff).toInt) ^
        t6(((st((i + 2) & 7) >>> 8) & 0xff).toInt) ^
        t7((st((i + 1) & 7) & 0xff).toInt)
      i += 1
    }
  }

  def whirlpool(data: Array[Byte]): Array[Byte] = {
    // pad: 0x80, zeros, 256-bit big-endian bit length → multiple of 64
    val bitLen = java.math.BigInteger.valueOf(data.length.toLong)
      .multiply(java.math.BigInteger.valueOf(8))
    val padLen = {
      val r = (data.length + 1 + 32) % 64
      if (r == 0) 0 else 64 - r
    }
    val msg = new Array[Byte](data.length + 1 + padLen + 32)
    System.arraycopy(data, 0, msg, 0, data.length)
    msg(data.length) = 0x80.toByte
    val lenBytes = bitLen.toByteArray.takeRight(32)
    System.arraycopy(lenBytes, 0, msg, msg.length - lenBytes.length, lenBytes.length)

    // state rows packed as big-endian u64 words (row i = bytes 8i..8i+7)
    val h = new Array[Long](8)
    val kk = new Array[Long](8)
    val s = new Array[Long](8)
    val m = new Array[Long](8)
    val rc = new Array[Long](8)
    val t = new Array[Long](8)
    var off = 0
    while (off < msg.length) {
      var i = 0
      while (i < 8) {
        var w = 0L
        var j = 0
        while (j < 8) { w = (w << 8) | (msg(off + 8 * i + j) & 0xffL); j += 1 }
        m(i) = w
        kk(i) = h(i)
        s(i) = w ^ h(i)
        i += 1
      }
      var r = 1
      while (r <= 10) {
        // round constant r: row 0 = S-box bytes 8(r-1)..8(r-1)+7
        var rc0 = 0L
        var j = 0
        while (j < 8) {
          rc0 = (rc0 << 8) | (wpSbox(8 * (r - 1) + j).toLong & 0xffL); j += 1
        }
        rc(0) = rc0
        wpRound(kk, rc, t); System.arraycopy(t, 0, kk, 0, 8)
        wpRound(s, kk, t); System.arraycopy(t, 0, s, 0, 8)
        r += 1
      }
      // Miyaguchi-Preneel: H' = W(H, m) ^ H ^ m
      i = 0
      while (i < 8) { h(i) = s(i) ^ h(i) ^ m(i); i += 1 }
      off += 64
    }
    val out = new Array[Byte](64)
    var i = 0
    while (i < 8) {
      var j = 0
      while (j < 8) { out(8 * i + j) = (h(i) >>> (56 - 8 * j)).toByte; j += 1 }
      i += 1
    }
    out
  }

  // ---- GOST R 34.11-2012 "Streebog" (RFC 6986) ----------------------
  //
  // Spec structure: 512-bit state as an 8x8 byte matrix; round =
  // X (xor) -> S (the pi byte substitution) -> P (transpose) -> L
  // (each row multiplied by the binary 64x64 matrix given by the 64 A
  // constants, bit k of a row selecting A(k) MSB-first); compression
  // g(h,m,N) runs a 12-round E with round keys derived through the
  // C1..C12 iteration constants, wrapped Miyaguchi-Preneel style; the
  // finalization chains the bit counter N and byte-sum S through two
  // more g calls. Messages are consumed as 512-bit little-endian
  // integers, so each 64-byte block is byte-reversed into the
  // big-endian word state; digests render in the spec's printed order
  // (M1 -> 486f64c1..., the RFC test vector).
  //
  // The pi/A/C constant tables below are the RFC 6986 values,
  // independently cross-verified for this implementation against GNU
  // nettle's streebog512/256 on 268 input shapes (every length 0..129
  // plus multi-block sizes) — see DigestSpec for the pinned vectors.

  private val SbPi: Array[Int] = Array(
    0xfc, 0xee, 0xdd, 0x11, 0xcf, 0x6e, 0x31, 0x16,
    0xfb, 0xc4, 0xfa, 0xda, 0x23, 0xc5, 0x04, 0x4d,
    0xe9, 0x77, 0xf0, 0xdb, 0x93, 0x2e, 0x99, 0xba,
    0x17, 0x36, 0xf1, 0xbb, 0x14, 0xcd, 0x5f, 0xc1,
    0xf9, 0x18, 0x65, 0x5a, 0xe2, 0x5c, 0xef, 0x21,
    0x81, 0x1c, 0x3c, 0x42, 0x8b, 0x01, 0x8e, 0x4f,
    0x05, 0x84, 0x02, 0xae, 0xe3, 0x6a, 0x8f, 0xa0,
    0x06, 0x0b, 0xed, 0x98, 0x7f, 0xd4, 0xd3, 0x1f,
    0xeb, 0x34, 0x2c, 0x51, 0xea, 0xc8, 0x48, 0xab,
    0xf2, 0x2a, 0x68, 0xa2, 0xfd, 0x3a, 0xce, 0xcc,
    0xb5, 0x70, 0x0e, 0x56, 0x08, 0x0c, 0x76, 0x12,
    0xbf, 0x72, 0x13, 0x47, 0x9c, 0xb7, 0x5d, 0x87,
    0x15, 0xa1, 0x96, 0x29, 0x10, 0x7b, 0x9a, 0xc7,
    0xf3, 0x91, 0x78, 0x6f, 0x9d, 0x9e, 0xb2, 0xb1,
    0x32, 0x75, 0x19, 0x3d, 0xff, 0x35, 0x8a, 0x7e,
    0x6d, 0x54, 0xc6, 0x80, 0xc3, 0xbd, 0x0d, 0x57,
    0xdf, 0xf5, 0x24, 0xa9, 0x3e, 0xa8, 0x43, 0xc9,
    0xd7, 0x79, 0xd6, 0xf6, 0x7c, 0x22, 0xb9, 0x03,
    0xe0, 0x0f, 0xec, 0xde, 0x7a, 0x94, 0xb0, 0xbc,
    0xdc, 0xe8, 0x28, 0x50, 0x4e, 0x33, 0x0a, 0x4a,
    0xa7, 0x97, 0x60, 0x73, 0x1e, 0x00, 0x62, 0x44,
    0x1a, 0xb8, 0x38, 0x82, 0x64, 0x9f, 0x26, 0x41,
    0xad, 0x45, 0x46, 0x92, 0x27, 0x5e, 0x55, 0x2f,
    0x8c, 0xa3, 0xa5, 0x7d, 0x69, 0xd5, 0x95, 0x3b,
    0x07, 0x58, 0xb3, 0x40, 0x86, 0xac, 0x1d, 0xf7,
    0x30, 0x37, 0x6b, 0xe4, 0x88, 0xd9, 0xe7, 0x89,
    0xe1, 0x1b, 0x83, 0x49, 0x4c, 0x3f, 0xf8, 0xfe,
    0x8d, 0x53, 0xaa, 0x90, 0xca, 0xd8, 0x85, 0x61,
    0x20, 0x71, 0x67, 0xa4, 0x2d, 0x2b, 0x09, 0x5b,
    0xcb, 0x9b, 0x25, 0xd0, 0xbe, 0xe5, 0x6c, 0x52,
    0x59, 0xa6, 0x74, 0xd2, 0xe6, 0xf4, 0xb4, 0xc0,
    0xd1, 0x66, 0xaf, 0xc2, 0x39, 0x4b, 0x63, 0xb6)

  private val SbA: Array[Long] = Array(
    0x8e20faa72ba0b470L, 0x47107ddd9b505a38L,
    0xad08b0e0c3282d1cL, 0xd8045870ef14980eL,
    0x6c022c38f90a4c07L, 0x3601161cf205268dL,
    0x1b8e0b0e798c13c8L, 0x83478b07b2468764L,
    0xa011d380818e8f40L, 0x5086e740ce47c920L,
    0x2843fd2067adea10L, 0x14aff010bdd87508L,
    0x0ad97808d06cb404L, 0x05e23c0468365a02L,
    0x8c711e02341b2d01L, 0x46b60f011a83988eL,
    0x90dab52a387ae76fL, 0x486dd4151c3dfdb9L,
    0x24b86a840e90f0d2L, 0x125c354207487869L,
    0x092e94218d243cbaL, 0x8a174a9ec8121e5dL,
    0x4585254f64090fa0L, 0xaccc9ca9328a8950L,
    0x9d4df05d5f661451L, 0xc0a878a0a1330aa6L,
    0x60543c50de970553L, 0x302a1e286fc58ca7L,
    0x18150f14b9ec46ddL, 0x0c84890ad27623e0L,
    0x0642ca05693b9f70L, 0x0321658cba93c138L,
    0x86275df09ce8aaa8L, 0x439da0784e745554L,
    0xafc0503c273aa42aL, 0xd960281e9d1d5215L,
    0xe230140fc0802984L, 0x71180a8960409a42L,
    0xb60c05ca30204d21L, 0x5b068c651810a89eL,
    0x456c34887a3805b9L, 0xac361a443d1c8cd2L,
    0x561b0d22900e4669L, 0x2b838811480723baL,
    0x9bcf4486248d9f5dL, 0xc3e9224312c8c1a0L,
    0xeffa11af0964ee50L, 0xf97d86d98a327728L,
    0xe4fa2054a80b329cL, 0x727d102a548b194eL,
    0x39b008152acb8227L, 0x9258048415eb419dL,
    0x492c024284fbaec0L, 0xaa16012142f35760L,
    0x550b8e9e21f7a530L, 0xa48b474f9ef5dc18L,
    0x70a6a56e2440598eL, 0x3853dc371220a247L,
    0x1ca76e95091051adL, 0x0edd37c48a08a6d8L,
    0x07e095624504536cL, 0x8d70c431ac02a736L,
    0xc83862965601dd1bL, 0x641c314b2b8ee083L)

  // C1..C12 as 8 big-endian 64-bit words each (word r = bytes 8r..8r+7
  // of the spec's hex rendering)
  private val SbC: Array[Array[Long]] = Array(
    Array(0xb1085bda1ecadae9L, 0xebcb2f81c0657c1fL, 0x2f6a76432e45d016L,
      0x714eb88d7585c4fcL, 0x4b7ce09192676901L, 0xa2422a08a460d315L,
      0x05767436cc744d23L, 0xdd806559f2a64507L),
    Array(0x6fa3b58aa99d2f1aL, 0x4fe39d460f70b5d7L, 0xf3feea720a232b98L,
      0x61d55e0f16b50131L, 0x9ab5176b12d69958L, 0x5cb561c2db0aa7caL,
      0x55dda21bd7cbcd56L, 0xe679047021b19bb7L),
    Array(0xf574dcac2bce2fc7L, 0x0a39fc286a3d8435L, 0x06f15e5f529c1f8bL,
      0xf2ea7514b1297b7bL, 0xd3e20fe490359eb1L, 0xc1c93a376062db09L,
      0xc2b6f443867adb31L, 0x991e96f50aba0ab2L),
    Array(0xef1fdfb3e81566d2L, 0xf948e1a05d71e4ddL, 0x488e857e335c3c7dL,
      0x9d721cad685e353fL, 0xa9d72c82ed03d675L, 0xd8b71333935203beL,
      0x3453eaa193e837f1L, 0x220cbebc84e3d12eL),
    Array(0x4bea6bacad474799L, 0x9a3f410c6ca92363L, 0x7f151c1f1686104aL,
      0x359e35d7800fffbdL, 0xbfcd1747253af5a3L, 0xdfff00b723271a16L,
      0x7a56a27ea9ea63f5L, 0x601758fd7c6cfe57L),
    Array(0xae4faeae1d3ad3d9L, 0x6fa4c33b7a3039c0L, 0x2d66c4f95142a46cL,
      0x187f9ab49af08ec6L, 0xcffaa6b71c9ab7b4L, 0x0af21f66c2bec6b6L,
      0xbf71c57236904f35L, 0xfa68407a46647d6eL),
    Array(0xf4c70e16eeaac5ecL, 0x51ac86febf240954L, 0x399ec6c7e6bf87c9L,
      0xd3473e33197a93c9L, 0x0992abc52d822c37L, 0x06476983284a0504L,
      0x3517454ca23c4af3L, 0x8886564d3a14d493L),
    Array(0x9b1f5b424d93c9a7L, 0x03e7aa020c6e4141L, 0x4eb7f8719c36de1eL,
      0x89b4443b4ddbc49aL, 0xf4892bcb929b0690L, 0x69d18d2bd1a5c42fL,
      0x36acc2355951a8d9L, 0xa47f0dd4bf02e71eL),
    Array(0x378f5a541631229bL, 0x944c9ad8ec165fdeL, 0x3a7d3a1b25894224L,
      0x3cd955b7e00d0984L, 0x800a440bdbb2ceb1L, 0x7b2b8a9aa6079c54L,
      0x0e38dc92cb1f2a60L, 0x7261445183235adbL),
    Array(0xabbedea680056f52L, 0x382ae548b2e4f3f3L, 0x8941e71cff8a78dbL,
      0x1fffe18a1b336103L, 0x9fe76702af69334bL, 0x7a1e6c303b7652f4L,
      0x3698fad1153bb6c3L, 0x74b4c7fb98459cedL),
    Array(0x7bcd9ed0efc889fbL, 0x3002c6cd635afe94L, 0xd8fa6bbbebab0761L,
      0x2001802114846679L, 0x8a1d71efea48b9caL, 0xefbacd1d7d476e98L,
      0xdea2594ac06fd85dL, 0x6bcaa4cd81f32d1bL),
    Array(0x378ee767f11631baL, 0xd21380b00449b17aL, 0xcda43c32bcdf1d77L,
      0xf82012d430219f9bL, 0x5d80ef9d1891cc86L, 0xe71da4aa88e12852L,
      0xfaf417d5d9b21b99L, 0x48bc924af11bd720L))

  // combined S+L lookup: SbT(k)(b) = the contribution of raw byte b,
  // sitting at byte-position k of a post-transpose row, to that row's
  // L output (pi folded in) — the standard tabled form of the spec's
  // per-bit definition
  private lazy val SbT: Array[Array[Long]] = Array.tabulate(8) { k =>
    Array.tabulate(256) { b =>
      var v = 0L
      val p = SbPi(b)
      var j = 0
      while (j < 8) {
        if (((p >> (7 - j)) & 1) == 1) v ^= SbA(8 * k + j)
        j += 1
      }
      v
    }
  }

  // LPS on the 8-word (big-endian rows) state: out row r gathers byte r
  // of every input word k (that is the P transpose) through SbT(k)
  private def sbLps(w: Array[Long]): Array[Long] = {
    val out = new Array[Long](8)
    var r = 0
    while (r < 8) {
      var v = 0L
      var k = 0
      while (k < 8) {
        v ^= SbT(k)(((w(k) >>> (56 - 8 * r)) & 0xffL).toInt)
        k += 1
      }
      out(r) = v
      r += 1
    }
    out
  }

  private def sbXor(a: Array[Long], b: Array[Long]): Array[Long] = {
    val r = new Array[Long](8)
    var i = 0
    while (i < 8) { r(i) = a(i) ^ b(i); i += 1 }
    r
  }

  // a + b mod 2^512 over big-endian words with unsigned carry
  private def sbAdd(a: Array[Long], b: Array[Long]): Array[Long] = {
    val r = new Array[Long](8)
    var carry = 0L
    var i = 7
    while (i >= 0) {
      val s = a(i) + b(i) + carry
      carry =
        if (carry == 0) { if (java.lang.Long.compareUnsigned(s, a(i)) < 0) 1L else 0L }
        else { if (java.lang.Long.compareUnsigned(s, a(i)) <= 0) 1L else 0L }
      r(i) = s
      i -= 1
    }
    r
  }

  private def sbG(h: Array[Long], m: Array[Long], n: Array[Long]): Array[Long] = {
    var key = sbLps(sbXor(h, n))
    var st = sbXor(key, m)
    var i = 0
    while (i < 12) {
      st = sbLps(st)
      key = sbLps(sbXor(key, SbC(i)))
      st = sbXor(st, key)
      i += 1
    }
    sbXor(sbXor(st, h), m)
  }

  // 64 message bytes, little-endian per the spec -> 8 big-endian words
  private def sbBlock(buf: Array[Byte], off: Int, len: Int): Array[Long] = {
    val rev = new Array[Byte](64)
    var i = 0
    while (i < len) { rev(63 - i) = buf(off + i); i += 1 }
    if (len < 64) rev(63 - len) = 1 // 10* pad just above the message
    val w = new Array[Long](8)
    var r = 0
    while (r < 8) {
      var v = 0L
      var j = 0
      while (j < 8) { v = (v << 8) | (rev(8 * r + j) & 0xffL); j += 1 }
      w(r) = v
      r += 1
    }
    w
  }

  def streebog(data: Array[Byte], outBits: Int): Array[Byte] = {
    require(outBits == 256 || outBits == 512, s"streebog: $outBits")
    var h = Array.fill(8)(if (outBits == 256) 0x0101010101010101L else 0L)
    var bigN = new Array[Long](8)
    var sum = new Array[Long](8)
    def inc(bits: Long): Unit = {
      val b = new Array[Long](8); b(7) = bits
      bigN = sbAdd(bigN, b)
    }
    var off = 0
    while (data.length - off >= 64) {
      val m = sbBlock(data, off, 64)
      h = sbG(h, m, bigN)
      inc(512L)
      sum = sbAdd(sum, m)
      off += 64
    }
    val rem = data.length - off
    val m = sbBlock(data, off, rem) // always a final padded block, even empty
    h = sbG(h, m, bigN)
    inc(rem.toLong * 8)
    sum = sbAdd(sum, m)
    val zero = new Array[Long](8)
    h = sbG(h, bigN, zero)
    h = sbG(h, sum, zero)
    val out = new Array[Byte](if (outBits == 256) 32 else 64)
    var i = 0
    while (i < out.length) {
      out(i) = ((h(i / 8) >>> (56 - 8 * (i % 8))) & 0xffL).toByte
      i += 1
    }
    out
  }
  // ---- GOST R 34.11-94 (RFC 5831), CryptoPro parameter set ----------
  //
  // The 256-bit 1994 GOST hash over the GOST 28147-89 block cipher,
  // with the RFC 4357 id-GostR3411-94-CryptoProParamSet S-boxes — the
  // parameter set BouncyCastle's "GOST3411" digest uses, so outputs
  // match the reference's hash directive byte for byte (empty ->
  // 981e5f3c..., the published CryptoPro vector). Compression: four
  // keys derived from (H, M) via the A word-shift, the C3 constant and
  // the P byte transposition; four GOST 28147 encryptions of H's
  // quarters; then the psi LFSR mixing psi^61(H ^ psi(M ^ psi^12(S))).
  // All 256-bit quantities are little-endian byte arrays, per the
  // standard. Like Streebog above, the opaque constants were
  // cross-verified against GNU nettle (gosthash94cp) on 106 input
  // lengths before the vectors were pinned in DigestSpec.

  private val G94S: Array[Array[Int]] = Array(
    Array(10, 4, 5, 6, 8, 1, 3, 7, 13, 12, 14, 0, 9, 2, 11, 15),
    Array(5, 15, 4, 0, 2, 13, 11, 9, 1, 7, 6, 3, 12, 14, 10, 8),
    Array(7, 15, 12, 14, 9, 4, 1, 0, 3, 11, 5, 2, 6, 10, 8, 13),
    Array(4, 10, 7, 12, 0, 15, 2, 8, 14, 1, 6, 5, 13, 11, 9, 3),
    Array(7, 6, 4, 11, 9, 12, 2, 10, 1, 8, 0, 14, 15, 13, 3, 5),
    Array(7, 6, 2, 4, 13, 9, 15, 0, 10, 1, 5, 11, 8, 14, 12, 3),
    Array(13, 14, 4, 1, 7, 0, 5, 10, 3, 12, 8, 15, 6, 2, 9, 11),
    Array(1, 3, 10, 9, 5, 11, 4, 15, 8, 6, 7, 14, 13, 0, 2, 12))

  // per-byte cipher tables: adjacent nibble S-boxes + the <<<11 baked in
  private lazy val G94T: Array[Array[Int]] = Array.tabulate(4) { t =>
    Array.tabulate(256) { b =>
      val v = (G94S(2 * t)(b & 15) | (G94S(2 * t + 1)(b >>> 4) << 4)) << (8 * t)
      Integer.rotateLeft(v, 11)
    }
  }

  // the iteration constant C3 of the key-generation schedule (RFC 5831)
  private val G94C3: Array[Byte] =
    ("00ff00ff00ff00ffff00ff00ff00ff0000ffff00ff0000ff" +
      "ff000000ffff00ff").grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray

  // P byte transposition: out(i) = in((i % 4) * 8 + i / 4)
  private val G94Tau: Array[Int] = Array.tabulate(32)(i => (i % 4) * 8 + i / 4)

  private def g94F(x: Int): Int =
    G94T(0)(x & 0xff) ^ G94T(1)((x >>> 8) & 0xff) ^
      G94T(2)((x >>> 16) & 0xff) ^ G94T(3)(x >>> 24)

  private def g94le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  /** GOST 28147-89 ECB encrypt of one 8-byte block (32 feistel rounds:
    * 24 forward key order then 8 reversed).
    */
  private def g94Encrypt(key: Array[Byte], h: Array[Byte], hOff: Int,
      out: Array[Byte], outOff: Int): Unit = {
    val k = new Array[Int](8)
    var i = 0
    while (i < 8) { k(i) = g94le32(key, 4 * i); i += 1 }
    var n1 = g94le32(h, hOff)
    var n2 = g94le32(h, hOff + 4)
    i = 0
    while (i < 24) { val t = n2 ^ g94F(n1 + k(i % 8)); n2 = n1; n1 = t; i += 1 }
    i = 0
    while (i < 8) { val t = n2 ^ g94F(n1 + k(7 - i)); n2 = n1; n1 = t; i += 1 }
    // ciphertext words swap back on output
    out(outOff) = n2.toByte; out(outOff + 1) = (n2 >>> 8).toByte
    out(outOff + 2) = (n2 >>> 16).toByte; out(outOff + 3) = (n2 >>> 24).toByte
    out(outOff + 4) = n1.toByte; out(outOff + 5) = (n1 >>> 8).toByte
    out(outOff + 6) = (n1 >>> 16).toByte; out(outOff + 7) = (n1 >>> 24).toByte
  }

  private def g94A(u: Array[Byte]): Array[Byte] = {
    val r = new Array[Byte](32)
    System.arraycopy(u, 8, r, 0, 24)
    var i = 0
    while (i < 8) { r(24 + i) = (u(i) ^ u(8 + i)).toByte; i += 1 }
    r
  }

  private def g94Xor(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val r = new Array[Byte](32)
    var i = 0
    while (i < 32) { r(i) = (a(i) ^ b(i)).toByte; i += 1 }
    r
  }

  // n steps of the psi LFSR on 16 little-endian 16-bit words — ring
  // buffer over the word array, so psi^61 is 61 word ops instead of 61
  // 32-byte array copies (per-compress hot path)
  private def g94Psi(y: Array[Byte], rounds: Int): Array[Byte] = {
    val w = new Array[Int](16)
    var i = 0
    while (i < 16) {
      w(i) = (y(2 * i) & 0xff) | ((y(2 * i + 1) & 0xff) << 8); i += 1
    }
    var base = 0
    var n = 0
    while (n < rounds) {
      val nw = w(base & 15) ^ w((base + 1) & 15) ^ w((base + 2) & 15) ^
        w((base + 3) & 15) ^ w((base + 12) & 15) ^ w((base + 15) & 15)
      // the dropped word-0 slot becomes the appended word 15
      w(base & 15) = nw
      base += 1
      n += 1
    }
    val r = new Array[Byte](32)
    i = 0
    while (i < 16) {
      val v = w((base + i) & 15)
      r(2 * i) = v.toByte; r(2 * i + 1) = (v >>> 8).toByte
      i += 1
    }
    r
  }

  private def g94Compress(h: Array[Byte], m: Array[Byte]): Array[Byte] = {
    var u = h
    var v = m
    var w = g94Xor(u, v)
    val s = new Array[Byte](32)
    val key = new Array[Byte](32)
    var i = 0
    var j = 0
    while (j < 4) {
      i = 0
      while (i < 32) { key(i) = w(G94Tau(i)); i += 1 }
      g94Encrypt(key, h, 8 * j, s, 8 * j)
      if (j < 3) {
        u = if (j == 1) g94Xor(g94A(u), G94C3) else g94A(u)
        v = g94A(g94A(v))
        w = g94Xor(u, v)
      }
      j += 1
    }
    g94Psi(g94Xor(h, g94Psi(g94Xor(m, g94Psi(s, 12)), 1)), 61)
  }

  private def g94Add256(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val r = new Array[Byte](32)
    var c = 0
    var i = 0
    while (i < 32) {
      val t = (a(i) & 0xff) + (b(i) & 0xff) + c
      r(i) = t.toByte; c = t >>> 8
      i += 1
    }
    r
  }

  def gost94(data: Array[Byte]): Array[Byte] = {
    var h = new Array[Byte](32)
    var sigma = new Array[Byte](32)
    var bits = 0L
    var off = 0
    while (data.length - off >= 32) {
      val m = java.util.Arrays.copyOfRange(data, off, off + 32)
      h = g94Compress(h, m)
      sigma = g94Add256(sigma, m)
      bits += 256
      off += 32
    }
    if (off < data.length) {
      val m = new Array[Byte](32)
      System.arraycopy(data, off, m, 0, data.length - off)
      h = g94Compress(h, m)
      sigma = g94Add256(sigma, m)
      bits += (data.length - off).toLong * 8
    }
    val l = new Array[Byte](32)
    var i = 0
    var bl = bits
    while (bl != 0 && i < 8) { l(i) = bl.toByte; bl >>>= 8; i += 1 }
    h = g94Compress(h, l)
    g94Compress(h, sigma)
  }

  // ---- Tiger / Tiger2 (Anderson & Biham, FSE 1996) -------------------
  //
  // 192-bit state (a, b, c); each 64-byte block is read as 8
  // little-endian words and run through three 8-round passes
  // (multipliers 5, 7, 9) with the paper's key schedule between
  // passes, then fed forward as (a ^ aa, b - bb, c + cc). Padding is
  // MD4-style: a single marker byte (0x01 for Tiger, 0x80 for
  // Tiger2 — the only difference between the variants), zeros to
  // 56 mod 64, then the bit length as a little-endian 64-bit word.
  // The digest is the three state words rendered little-endian
  // (24 bytes) — the byte order BouncyCastle's TigerDigest and the
  // paper's reference code both produce. S-boxes: TigerTables.

  /** One Tiger compression: state s(0..2), block words x(0..7). */
  private def tigerCompress(s: Array[Long], x: Array[Long]): Unit = {
    val t1 = TigerTables.t1; val t2 = TigerTables.t2
    val t3 = TigerTables.t3; val t4 = TigerTables.t4
    val v = Array(s(0), s(1), s(2))
    val aa = v(0); val bb = v(1); val cc = v(2)

    // one round with roles (a, b, c) at indices (ai, bi, ci):
    // c ^= x; a -= even-byte lookup of c; b += odd-byte lookup; b *= mul
    def round(ai: Int, bi: Int, ci: Int, xi: Long, mul: Long): Unit = {
      val c = v(ci) ^ xi
      v(ci) = c
      v(ai) -= t1((c & 0xff).toInt) ^ t2(((c >>> 16) & 0xff).toInt) ^
        t3(((c >>> 32) & 0xff).toInt) ^ t4(((c >>> 48) & 0xff).toInt)
      v(bi) += t4(((c >>> 8) & 0xff).toInt) ^ t3(((c >>> 24) & 0xff).toInt) ^
        t2(((c >>> 40) & 0xff).toInt) ^ t1((c >>> 56).toInt)
      v(bi) *= mul
    }
    // a full pass: 8 rounds, roles rotating left each round
    def pass(ai: Int, bi: Int, ci: Int, mul: Long): Unit = {
      round(ai, bi, ci, x(0), mul); round(bi, ci, ai, x(1), mul)
      round(ci, ai, bi, x(2), mul); round(ai, bi, ci, x(3), mul)
      round(bi, ci, ai, x(4), mul); round(ci, ai, bi, x(5), mul)
      round(ai, bi, ci, x(6), mul); round(bi, ci, ai, x(7), mul)
    }
    def keySchedule(): Unit = {
      x(0) -= x(7) ^ 0xA5A5A5A5A5A5A5A5L; x(1) ^= x(0); x(2) += x(1)
      x(3) -= x(2) ^ (~x(1) << 19); x(4) ^= x(3); x(5) += x(4)
      x(6) -= x(5) ^ (~x(4) >>> 23); x(7) ^= x(6); x(0) += x(7)
      x(1) -= x(0) ^ (~x(7) << 19); x(2) ^= x(1); x(3) += x(2)
      x(4) -= x(3) ^ (~x(2) >>> 23); x(5) ^= x(4); x(6) += x(5)
      x(7) -= x(6) ^ 0x0123456789ABCDEFL
    }

    pass(0, 1, 2, 5); keySchedule() // pass(a,b,c, 5)
    pass(2, 0, 1, 7); keySchedule() // pass(c,a,b, 7)
    pass(1, 2, 0, 9) //                pass(b,c,a, 9)
    s(0) = v(0) ^ aa
    s(1) = v(1) - bb
    s(2) = v(2) + cc
  }

  def tiger(data: Array[Byte], padByte: Byte): Array[Byte] = {
    val s = Array(0x0123456789ABCDEFL, 0xFEDCBA9876543210L,
      0xF096A5B4C3B2E187L)
    val tailLen = data.length % 64
    val padLen = (if (tailLen < 56) 56 else 120) - tailLen
    val padded = new Array[Byte](data.length + padLen + 8)
    System.arraycopy(data, 0, padded, 0, data.length)
    padded(data.length) = padByte
    var bl = data.length.toLong * 8
    var i = 0
    while (i < 8) { padded(padded.length - 8 + i) = bl.toByte; bl >>>= 8; i += 1 }
    val x = new Array[Long](8)
    var off = 0
    while (off < padded.length) {
      var w = 0
      while (w < 8) {
        val o = off + w * 8
        x(w) = (padded(o) & 0xffL) | ((padded(o + 1) & 0xffL) << 8) |
          ((padded(o + 2) & 0xffL) << 16) | ((padded(o + 3) & 0xffL) << 24) |
          ((padded(o + 4) & 0xffL) << 32) | ((padded(o + 5) & 0xffL) << 40) |
          ((padded(o + 6) & 0xffL) << 48) | ((padded(o + 7) & 0xffL) << 56)
        w += 1
      }
      tigerCompress(s, x)
      off += 64
    }
    val out = new Array[Byte](24)
    i = 0
    while (i < 3) {
      var v = s(i)
      var j = 0
      while (j < 8) { out(i * 8 + j) = v.toByte; v >>>= 8; j += 1 }
      i += 1
    }
    out
  }

  // ---- Skein (version 1.3) -------------------------------------------
  // Ferguson, Lucks, Schneier, Whiting, Bellare, Kohno, Callas, Walker:
  // "The Skein Hash Function Family" (SHA-3 finalist submission, public
  // spec). Unlike Streebog/Tiger there are NO opaque constant tables:
  // the whole function is the Threefish MIX/permute network driven by
  // the spec's published rotation/permutation schedules plus the single
  // key-schedule constant C240, chained with UBI. Verified end-to-end
  // against the spec's published derived-IV tables (Skein-256-256,
  // -512-256, -512-512) and Appendix-C KAT digests (empty and
  // decrementing-byte messages, incl. a 2-block message) in DigestSpec
  // — the IV match alone exercises Threefish + key schedule + tweak
  // handling bit-exactly. Covers the reference's 13 Skein-N-M names
  // (MessageHash.java:87-99) and any other byte-multiple output size.

  private val SkC240 = 0x1BD11BDAA9FC1A22L

  private val SkPerm: Map[Int, Array[Int]] = Map(
    4 -> Array(0, 3, 2, 1),
    8 -> Array(2, 1, 4, 7, 6, 5, 0, 3),
    16 -> Array(0, 9, 2, 13, 6, 11, 4, 15, 10, 7, 12, 3, 14, 5, 8, 1))

  private val SkRot: Map[Int, Array[Array[Int]]] = Map(
    4 -> Array(
      Array(14, 16), Array(52, 57), Array(23, 40), Array(5, 37),
      Array(25, 33), Array(46, 12), Array(58, 22), Array(32, 32)),
    8 -> Array(
      Array(46, 36, 19, 37), Array(33, 27, 14, 42), Array(17, 49, 36, 39),
      Array(44, 9, 54, 56), Array(39, 30, 34, 24), Array(13, 50, 10, 17),
      Array(25, 29, 39, 43), Array(8, 35, 56, 22)),
    16 -> Array(
      Array(24, 13, 8, 47, 8, 17, 22, 37),
      Array(38, 19, 10, 55, 49, 18, 23, 52),
      Array(33, 4, 51, 13, 34, 41, 59, 17),
      Array(5, 20, 48, 41, 47, 28, 16, 25),
      Array(41, 9, 37, 31, 12, 47, 44, 30),
      Array(16, 34, 56, 51, 4, 53, 42, 41),
      Array(31, 44, 47, 46, 19, 42, 44, 25),
      Array(9, 48, 35, 52, 23, 31, 37, 20)))

  /** Threefish-256/512/1024 encryption (block size = key size = 64*Nw
    * bits); returns the ciphertext words. 72 rounds (80 for Nw=16),
    * subkey injection every 4 rounds from the rotating key schedule
    * with the 3-word tweak rotation.
    */
  private def threefish(key: Array[Long], t0: Long, t1: Long,
      block: Array[Long]): Array[Long] = {
    val nw = key.length
    val ks = new Array[Long](nw + 1)
    var knw = SkC240
    var i = 0
    while (i < nw) { ks(i) = key(i); knw ^= key(i); i += 1 }
    ks(nw) = knw
    val t2 = t0 ^ t1
    def tw(j: Int): Long = (j % 3) match {
      case 0 => t0; case 1 => t1; case _ => t2
    }
    val v = block.clone()
    val w = new Array[Long](nw)
    val perm = SkPerm(nw)
    val rot = SkRot(nw)
    val nr = if (nw == 16) 80 else 72
    var d = 0
    while (d < nr) {
      if (d % 4 == 0) {
        val s = d / 4
        var j = 0
        while (j < nw) { v(j) += ks((s + j) % (nw + 1)); j += 1 }
        v(nw - 3) += tw(s); v(nw - 2) += tw(s + 1); v(nw - 1) += s
      }
      val r = rot(d % 8)
      var j = 0
      while (j < nw / 2) {
        val y0 = v(2 * j) + v(2 * j + 1)
        w(2 * j) = y0
        w(2 * j + 1) = java.lang.Long.rotateLeft(v(2 * j + 1), r(j)) ^ y0
        j += 1
      }
      j = 0
      while (j < nw) { v(j) = w(perm(j)); j += 1 }
      d += 1
    }
    val s = nr / 4
    var j = 0
    while (j < nw) { v(j) += ks((s + j) % (nw + 1)); j += 1 }
    v(nw - 3) += tw(s); v(nw - 2) += tw(s + 1); v(nw - 1) += s
    v
  }

  /** UBI chaining: process `msg` in state-size blocks through
    * Threefish in Matyas-Meyer-Oseas mode (H = E_H,T(P) xor P). The
    * tweak's position field counts cumulative message bytes INCLUDING
    * the current (unpadded) block; First/Final flags in tweak bits
    * 126/127, block type in bits 120-125. An empty message processes
    * one all-zero block at position 0 (spec's UBI definition).
    */
  private def skeinUbi(g: Array[Long], msg: Array[Byte],
      blockType: Int): Array[Long] = {
    val nw = g.length
    val nb = nw * 8
    var h = g
    val words = new Array[Long](nw)
    var off = 0
    var pos = 0L
    var first = true
    var done = false
    while (!done) {
      val take = math.min(nb, msg.length - off)
      val last = msg.length - off <= nb
      pos += take
      var i = 0
      while (i < nw) {
        var wv = 0L
        var b = 0
        while (b < 8) {
          val k = 8 * i + b
          if (k < take) wv |= (msg(off + k) & 0xffL) << (8 * b)
          b += 1
        }
        words(i) = wv
        i += 1
      }
      val t1 = (blockType.toLong << 56) |
        (if (first) 1L << 62 else 0L) | (if (last) 1L << 63 else 0L)
      val e = threefish(h, pos, t1, words)
      val nh = new Array[Long](nw)
      i = 0
      while (i < nw) { nh(i) = e(i) ^ words(i); i += 1 }
      h = nh
      first = false
      off += nb
      done = last
    }
    h
  }

  // Derived IVs (= UBI(0, config, CFG)) are fixed per (state, output)
  // pair; cache them so per-row hashing skips the config block.
  private val skeinIvCache =
    new java.util.concurrent.ConcurrentHashMap[Long, Array[Long]]()

  /** Skein-`stateBits`-`outBits` of `data`. stateBits in {256, 512,
    * 1024}; outBits any positive multiple of 8 (output stage iterates
    * counter blocks for outputs longer than the state).
    */
  /** Derived IV = UBI(0, config, CFG) — exposed for the DigestSpec
    * check against the spec's published precomputed IV tables.
    */
  private[graft] def skeinIv(stateBits: Int, outBits: Int): Array[Long] =
    skeinIvCache.computeIfAbsent(
      stateBits.toLong * 1000000L + outBits,
      _ => {
        // 32-byte config string: "SHA3", version 1 (16-bit LE), output
        // bits (64-bit LE), tree params zero (sequential hashing)
        val cfg = new Array[Byte](32)
        cfg(0) = 'S'; cfg(1) = 'H'; cfg(2) = 'A'; cfg(3) = '3'
        cfg(4) = 1
        var i = 0
        while (i < 8) {
          cfg(8 + i) = ((outBits.toLong >>> (8 * i)) & 0xff).toByte
          i += 1
        }
        skeinUbi(new Array[Long](stateBits / 64), cfg, 4)
      })

  def skein(data: Array[Byte], stateBits: Int, outBits: Int): Array[Byte] = {
    val nw = stateBits / 64
    val iv = skeinIv(stateBits, outBits)
    val g = skeinUbi(iv, data, 48)
    val outLen = outBits / 8
    val out = new Array[Byte](outLen)
    var produced = 0
    var ctr = 0L
    while (produced < outLen) {
      val ctrBytes = new Array[Byte](8)
      var i = 0
      while (i < 8) { ctrBytes(i) = (ctr >>> (8 * i)).toByte; i += 1 }
      val h = skeinUbi(g, ctrBytes, 63)
      var k = 0
      while (k < nw * 8 && produced < outLen) {
        out(produced) = (h(k / 8) >>> (8 * (k % 8))).toByte
        produced += 1
        k += 1
      }
      ctr += 1
    }
    out
  }
}
