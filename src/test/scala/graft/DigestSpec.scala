package graft

import org.apache.spark.sql.Row
import graft.functions.Digests

/** Published test vectors for the pure-JVM digest implementations. */
class DigestSpec extends SparkSpec {

  private def h(algo: String, s: String): String =
    Digests.hex(Digests.digest(algo, s.getBytes("UTF-8")))

  test("BLAKE2b vectors (RFC 7693)") {
    assert(h("BLAKE2B-512", "abc") ==
      "ba80a53f981c4d0d6a2797b69f12f6e94c212f14685ac4b74b12bb6fdbffa2d1" +
        "7d87c5392aab792dc252d5de4533cc9518d38aa8dbf1925ab92386edd4009923")
    assert(h("BLAKE2B-512", "") ==
      "786a02f742015903c6c6fd852552d272912f4740e15847618a86e217f71f5419" +
        "d25e1031afee585313896444934eb04b903a685b1448b755d56f701afe9be2ce")
    assert(h("BLAKE2B-256", "abc") ==
      "bddd813c634239723171ef3fee98579b94964e3bb1cb3e427262c8c068d52319")
    // multi-block input (>128 bytes)
    val long = "a" * 300
    assert(Digests.blake2b(long.getBytes, 64).length == 64)
  }

  test("RIPEMD vectors (Dobbertin et al.)") {
    assert(h("RIPEMD160", "") == "9c1185a5c5e9fc54612808977ee8f548b2258d31")
    assert(h("RIPEMD160", "abc") == "8eb208f7e05d987a9b044a8e98c6b087f15a0bfc")
    assert(h("RIPEMD160", "message digest") ==
      "5d0689ef49d2fae572b881b123a85ffa21595f36")
    assert(h("RIPEMD128", "") == "cdf26213a150dc3ecb610f18f6b38b46")
    assert(h("RIPEMD128", "abc") == "c14a12199c66e4ba84636b0f69144c77")
  }

  test("RIPEMD-256/320 vectors (Dobbertin et al.)") {
    assert(h("RIPEMD256", "") ==
      "02ba4c4e5f8ecd1877fc52d64d30e37a2d9774fb1e5d026380ae0168e3c5522d")
    assert(h("RIPEMD256", "abc") ==
      "afbd6e228b9d8cbbcef5ca2d03e6dba10ac0bc7dcbe4680e1e42d2e975459b65")
    assert(h("RIPEMD320", "") ==
      "22d65d5661536cdc75c1fdf5c6de7b41b9f27325ebc61e8557177d705a0ec880" +
        "151c3a32a00899b8")
    assert(h("RIPEMD320", "abc") ==
      "de4c01b3054f8930a79d09ae738e92301e5a17085beffdc1b8d116713e74f82f" +
        "a942d64cdbc4682d")
    // multi-block
    assert(Digests.ripemdWide(("a" * 200).getBytes, 256).length == 32)
  }

  test("MD4 vectors (RFC 1320)") {
    assert(h("MD4", "") == "31d6cfe0d16ae931b73c59d7e0c089c0")
    assert(h("MD4", "a") == "bde52cb31de33e46245e05fbdbd6fb24")
    assert(h("MD4", "abc") == "a448017aaf21d8525fc10ae87aa6729d")
    assert(h("MD4", "message digest") == "d9130a8164549fe818874806e1c7014b")
  }

  test("SHA-512/224 and SHA-512/256 via the JDK route") {
    import graft.functions.Udfs.digestHex
    assert(digestHex("abc", "SHA-512/224") ==
      "4634270f707b6a54daae7530460842e20e37ed265ceee9a43e8924aa")
    assert(digestHex("abc", "SHA-512/256") ==
      "53048e2681941ef99b2e29b76b4c7dabe4c2d0c634fc6d46e0e2f13107e7af23")
    assert(digestHex("", "SHA-512/256") ==
      "c672b8d1ef56ed28ab87c3622c5114069bdd3ad7b8f9737498d0c01ecef0967a")
  }

  test("unknown algorithm spellings raise a precise error") {
    // every name in the reference's list IS implemented now; an
    // unknown GOST/Skein spelling still gets the precise error, not
    // NoSuchAlgorithmException
    intercept[IllegalArgumentException] {
      graft.functions.Udfs.digestHex("abc", "GOST3411-2012")
    }
    intercept[IllegalArgumentException] {
      graft.functions.Udfs.digestHex("abc", "Skein-512-100") // not /8
    }
    intercept[IllegalArgumentException] {
      graft.functions.Udfs.digestHex("abc", "Skein-384-384") // no such state
    }
  }

  test("Skein derived IVs match the spec's published IV tables") {
    // UBI(0, config) for three (state, out) pairs — matching the
    // published precomputed IVs exercises Threefish-256/512, the key
    // schedule, and the tweak layout bit-exactly with no message stage
    import graft.functions.Digests
    def iv(state: Int, out: Int): String =
      Digests.skeinIv(state, out).map(w => f"$w%016X").mkString(" ")
    assert(iv(256, 256) ==
      "FC9DA860D048B449 2FCA66479FA7D833 B33BC3896656840F 6A54E920FDE8DA69")
    assert(iv(512, 512) ==
      "4903ADFF749C51CE 0D95DE399746DF03 8FD1934127C79BCE 9A255629FF352CB1 " +
      "5DB62599DF6CA7B0 EABE394CA9D5C3F4 991112C71A75B523 AE18A40B660FCC33")
    assert(iv(512, 256) ==
      "CCD044A12FDB3E13 E83590301A79A9EB 55AEA0614F816E6F 2A2767A4AE9B94DB " +
      "EC06025E74DD7683 E7A436CDC4746251 C36FBAF9393AD185 3EEDBA1833EDFC13")
  }

  test("Skein KAT digests (spec Appendix C + published empty-message vectors)") {
    import graft.functions.Digests.{digest, hex}
    def hx(algo: String, bytes: Array[Byte]): String = hex(digest(algo, bytes))
    val e = Array.empty[Byte]
    assert(hx("SKEIN-256-256", e) ==
      "c8877087da56e072870daa843f176e9453115929094c3a40c463a196c29bf7ba")
    assert(hx("SKEIN-512-512", e) ==
      "bc5b4c50925519c290cc634277ae3d6257212395cba733bbad37a4af0fa06af4" +
      "1fca7903d06564fea7a2d3730dbdb80c1f85562dfcc070334ea4d1d9e72cba7a")
    assert(hx("SKEIN-1024-1024", e) ==
      "0fff9563bb3279289227ac77d319b6fff8d7e9f09da1247b72a0a265cd6d2a62" +
      "645ad547ed8193db48cff847c06494a03f55666d3b47eb4c20456c9373c86297" +
      "d630d5578ebd34cb40991578f9f52b18003efa35d3da6553ff35db91b81ab890" +
      "bec1b189b7f52cb2a783ebb7d823d725b0b4a71f6824e88f68f982eefc6d19c6")
    assert(hx("SKEIN-512-256", e) ==
      "39ccc4554a8b31853b9de7a1fe638a24cce6b35a55f2431009e18780335d2621")
    // Appendix-C KATs: decrementing-byte messages starting at 0xFF
    def dec(n: Int): Array[Byte] =
      Array.tabulate(n)(i => (0xFF - i).toByte)
    assert(hx("SKEIN-256-256", dec(1)) ==
      "0b98dcd198ea0e50a7a244c444e25c23da30c10fc9a1f270a6637f1f34e67ed2")
    assert(hx("SKEIN-256-256", dec(32)) ==
      "8d0fa4ef777fd759dfd4044e6f6a5ac3c774aec943dcfc07927b723b5dbf408b")
    assert(hx("SKEIN-512-512", dec(1)) ==
      "71b7bce6fe6452227b9ced6014249e5bf9a9754c3ad618ccc4e0aae16b316cc8" +
      "ca698d864307ed3e80b6ef1570812ac5272dc409b5a012df2a579102f340617a")
    assert(hx("SKEIN-512-512", dec(64)) ==
      "45863ba3be0c4dfc27e75d358496f4ac9a736a505d9313b42b2f5eada79fc17f" +
      "63861e947afb1d056aa199575ad3f8c9a3cc1780b5e5fa4cae050e989876625b")
    // 128 bytes = two 512-bit MSG blocks: exercises the multi-block path
    assert(hx("SKEIN-512-512", dec(128)) ==
      "91cca510c263c4ddd010530a33073309628631f308747e1bcbaa90e451cab92e" +
      "5188087af4188773a332303e6667a7a210856f742139000071f48e8ba2a5adb7")
    // truncated outputs and an output longer than one state block
    assert(hx("SKEIN-256-128", e).length == 32)
    assert(hx("SKEIN-512-384", e).length == 96)
    assert(hx("SKEIN-256-224", e).length == 56)
    assert(hx("SKEIN-1024-384", e).length == 96)
    // reference name list: every Skein-N-M from MessageHash.java:87-99
    val refNames = Seq("SKEIN-1024-1024", "SKEIN-1024-384", "SKEIN-1024-512",
      "SKEIN-256-128", "SKEIN-256-160", "SKEIN-256-224", "SKEIN-256-256",
      "SKEIN-512-128", "SKEIN-512-160", "SKEIN-512-224", "SKEIN-512-256",
      "SKEIN-512-384", "SKEIN-512-512")
    for (n <- refNames) {
      val d = digest(n, "abc".getBytes("UTF-8"))
      assert(d != null && d.length == n.split("-")(2).toInt / 8)
    }
  }

  test("SM3 vectors (GB/T 32905-2016)") {
    assert(h("SM3", "abc") ==
      "66c7f0f462eeedd9d1f2d46bdc10e4e24167c4875cf2f7a2297da02b8f4ba8e0")
    assert(h("SM3", "") ==
      "1ab21d8355cfa17f8e61194831e81a8f22bec8c728fefb747ed035eb5082aa2b")
  }

  test("Keccak vectors (pre-FIPS 0x01 padding)") {
    assert(h("KECCAK-256", "") ==
      "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470")
    assert(h("KECCAK-256", "abc") ==
      "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45")
    assert(h("KECCAK-512", "") ==
      "0eab42de4c3ceb9235fc91acffe746b29c29a8c366b7c60e4e67c466f36a4304" +
        "c00fa9caf9d87976ba469bcbe06713b435f091ef2769fb160cdab33d3670680e")
  }

  test("Whirlpool vectors (ISO/IEC 10118-3 reference vectors)") {
    assert(h("WHIRLPOOL", "") ==
      "19fa61d75522a4669b44e39c1d2e1726c530232130d407f89afee0964997f7a7" +
        "3e83be698b288febcf88e3e03c4f0757ea8964e59b63d93708b138cc42a66eb3")
    assert(h("WHIRLPOOL", "a") ==
      "8aca2602792aec6f11a67206531fb7d7f0dff59413145e6973c45001d0087b42" +
        "d11bc645413aeff63a42391a39145a591a92200d560195e53b478584fdae231a")
    assert(h("WHIRLPOOL", "abc") ==
      "4e2448a4c6f486bb16b6562c73b4020bf3043e3a731bce721ae1b303d97e6d4c" +
        "7181eebdb6c57e277d0e34957114cbd6c797fc9d95d8b582d225292076d4eef5")
    assert(h("WHIRLPOOL", "The quick brown fox jumps over the lazy dog") ==
      "b97de512e91e3828b40d2b0fdce9ceb3c4a71f9bea8d88e75c4fa854df36725f" +
        "d2b52eb6544edcacd6f8beddfea403cb55ae31f03ad62a5ef54e42ee82c3fb35")
    // multi-block: 8×"1234567890" is 80 bytes → two compressions
    assert(h("WHIRLPOOL", "1234567890" * 8) ==
      "466ef18babb0154d25b9d38a6414f5c08784372bccb204d6549c4afadb601429" +
        "4d5bd8df2a6c44e538cd047b2681a51a2c60481e88c5a20b2c2a80cf3a9a083b")
  }

  test("Streebog GOST3411-2012 vectors (RFC 6986; cross-checked vs nettle)") {
    // RFC 6986 M1 (the 63-ASCII-digit message), digests in the spec's
    // printed byte order
    val m1 = "012345678901234567890123456789012345678901234567890123456789012"
    assert(h("GOST3411-2012-512", m1) ==
      "486f64c1917879417fef082b3381a4e211c324f074654c38823a7b76f830ad00" +
        "fa1fbae42b1285c0352f227524bc9ab16254288dd6863dccd5b9f54a1ad0541b")
    assert(h("GOST3411-2012-256", m1) ==
      "00557be5e584fd52a449b16b0251d05d27f94ab76cbaa6da890b59d8ef1e159d")
    // RFC 6986 M2 (the CP1251-encoded Russian text, 72 bytes -> two blocks)
    val m2 = ("d1e520e2e5f2f0e82c20d1f2f0e8e1eee6e820e2edf3f6e82c20e2e5fee2fa" +
      "20f120eceef0ff20f1f2f0e5ebe0ece820ede020f5f0e0e1f0fbff20efebfaea" +
      "fb20c8e3eef0e5e2fb").grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray
    assert(graft.functions.Digests.hex(
      graft.functions.Digests.streebog(m2, 512)) ==
      "69462242f50ef423adf531a24ab94b349112672e468fdfd8fca4a3513f71a92c" +
        "17b03c24168f7119e2c3b0dcbee2a6d81e6d2261607266832ddff85c2278393b")
    assert(graft.functions.Digests.hex(
      graft.functions.Digests.streebog(m2, 256)) ==
      "12b368584651aa6b59a641883775be8ff6af02088bed188e8f36e01928119a93")
    // empty message (single padded block; exercises the N=0 tail path)
    assert(h("GOST3411-2012-512", "") ==
      "8a1a1c4cbf909f8ecb81cd1b5c713abad26a4cac2a5fda3ce86e352855712f36" +
        "a7f0be98eb6cf51553b507b73a87e97946aebc29859255049f86aa09a25d948e")
    assert(h("GOST3411-2012-256", "") ==
      "bbe19c8d2025d99f943a932a0b365a822aa36a4c479d22cc02c8973e219a533f")
  }

  test("GOST R 34.11-94 CryptoPro vectors (published; cross-checked vs nettle)") {
    assert(h("GOST3411", "") ==
      "981e5f3ca30c841487830f84fb433e13ac1101569b9c13584ac483234cd656c0")
    assert(h("GOST3411", "a") ==
      "e74c52dd282183bf37af0079c9f78055715a103f17e3133ceff1aacf2f403011")
    assert(h("GOST3411", "abc") ==
      "b285056dbf18d7392d7677369524dd14747459ed8143997e163b2986f92fd42c")
    assert(h("GOST3411", "message digest") ==
      "bc6041dd2aa401ebfa6e9886734174febdb4729aa972d60f549ac39b29721ba0")
    // multi-block (64 bytes = two compressions before finalization)
    assert(h("GOST3411",
      "This is message, length=32 bytes" + "This is message, length=32 bytes")
        .length == 64)
    // Skein routes through Digests too (full vectors in its own test)
    assert(graft.functions.Udfs.digestHex("", "SKEIN-512-256") ==
      "39ccc4554a8b31853b9de7a1fe638a24cce6b35a55f2431009e18780335d2621")
  }

  test("Tiger and Tiger2 vectors (Anderson-Biham; cross-checked vs libgcrypt)") {
    // the paper's published test vectors
    assert(h("TIGER", "") ==
      "3293ac630c13f0245f92bbb1766e16167a4e58492dde73f3")
    assert(h("TIGER", "abc") ==
      "2aab1484e8c158f2bfb8c5ff41b57a525129131c957b5f93")
    assert(h("TIGER", "Tiger") ==
      "dd00230799f5009fec6debc838bb6a27df2b9d6f110c7937")
    assert(h("TIGER",
      "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+-")
      == "f71c8583902afb879edfe610f82c0d4786a3a534504486b5")
    // Tiger2 differs only in the 0x80 pad marker
    assert(h("TIGER2", "") ==
      "4441be75f6018773c206c22745374b924aa8313fef919f41")
    assert(h("TIGER2", "abc") ==
      "f68d7bc5af4b43a06e048d7829560d4a9415658bb0b1f3bf")
    // length sweep 0..129 of the deterministic pattern (i*131+7)&0xff —
    // covers the 55/56/57 pad split and one/two/three-block inputs.
    // Expected digests were produced by libgcrypt TIGER/TIGER2; pinned
    // here as the SHA-256 of the concatenated hex digests.
    def sweep(algo: String): String = {
      val cat = (0 until 130).map { n =>
        val in = Array.tabulate[Byte](n)(i => ((i * 131 + 7) & 0xff).toByte)
        graft.functions.Digests.hex(graft.functions.Digests.digest(algo, in))
      }.mkString
      graft.functions.Digests.hex(java.security.MessageDigest
        .getInstance("SHA-256").digest(cat.getBytes("UTF-8")))
    }
    assert(sweep("TIGER") ==
      "aecc74377ed1e7958b330deb67b896b99073487deb6ab401cb3a794bc3719083")
    assert(sweep("TIGER2") ==
      "343e5d71d25ee0d71062441e12af06744c773ece980de5c22389cd8a8a65184b")
  }

  test("hash directive routes exotic algorithms") {
    val d = df("v STRING", Seq(Row("abc")))
    assert(strings(wrangle("hash :v 'BLAKE2B-256'", d), "v") ==
      Seq("bddd813c634239723171ef3fee98579b94964e3bb1cb3e427262c8c068d52319"))
    assert(strings(wrangle("hash :v 'RIPEMD160'", d), "v") ==
      Seq("8eb208f7e05d987a9b044a8e98c6b087f15a0bfc"))
    assert(strings(wrangle("hash :v 'SM3'", d), "v") ==
      Seq("66c7f0f462eeedd9d1f2d46bdc10e4e24167c4875cf2f7a2297da02b8f4ba8e0"))
    assert(strings(wrangle("hash :v 'KECCAK-256'", d), "v") ==
      Seq("4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"))
    // JDK SHA3 family still routes through MessageDigest
    assert(strings(wrangle("hash :v 'SHA3-256'", d), "v") ==
      Seq("3a985da74fe225b2045c172d6bd390bd855f086e3e9d525b46bfe24511431532"))
  }
}
