package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Hostile-input robustness: the byte-level parsers and the tokenizer
  * must never hang, loop, or escape with anything but the library's
  * own exception types, whatever bytes arrive at 100 TB scale.
  */
class RobustnessSpec extends AnyFunSuite {

  private def check(name: String)(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, s"$name: ${res.status}")
  }

  private val bytesGen: Gen[Array[Byte]] =
    Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)

  test("round-9 text kernels never throw on arbitrary strings") {
    import graft.functions.Udfs
    val anyString: Gen[String] =
      Gen.listOf(Gen.choose(Char.MinValue, Char.MaxValue)).map(_.mkString)
    val sortedSet = Array(1L, 42L, 9999L)
    check("cutContaminatedSpans") {
      Prop.forAll(anyString) { s =>
        val out = Udfs.cutContaminatedSpans(s, 3, sortedSet)
        out == null || out.length <= math.max(s.length, 1)
      }
    }
    check("wsGramHashesLower") {
      Prop.forAll(anyString) { s =>
        Udfs.wsGramHashesLower(s, 4) != null
      }
    }
    check("normalizeUnicode-removeAccents") {
      Prop.forAll(anyString) { s =>
        // surrogate-hostile input: Normalizer accepts any CharSequence
        Udfs.normalizeUnicode(s, "NFKC") != null &&
          Udfs.removeAccents(s) != null
      }
    }
    check("shingleJaccard-hostile") {
      Prop.forAll(anyString, anyString) { (a, b) =>
        val j = Udfs.shingleJaccard(a, b, 5)
        j >= 0.0 && j <= 1.0
      }
    }
  }

  test("fixMojibake: total, never grows, idempotent at its fixed point") {
    import graft.functions.Udfs
    val anyString: Gen[String] =
      Gen.listOf(Gen.choose(Char.MinValue, Char.MaxValue)).map(_.mkString)
    check("fixMojibake") {
      Prop.forAll(anyString) { s =>
        val out = Udfs.fixMojibake(s)
        out != null && out.length <= s.length &&
          Udfs.fixMojibake(out) == out
      }
    }
  }

  test("AudioHash.audioHash64 never throws on arbitrary bytes") {
    check("audioHash64") {
      Prop.forAll(bytesGen) { b =>
        graft.llm.AudioHash.audioHash64(b); true
      }
    }
    // RIFF/WAVE-prefixed garbage: header starts valid then lies
    check("audioHash64-riff-prefixed") {
      val prefix = ("RIFF".getBytes("US-ASCII") ++
        Array[Byte](0, 0, 0, 0) ++ "WAVE".getBytes("US-ASCII"))
      Prop.forAll(bytesGen) { b =>
        graft.llm.AudioHash.audioHash64(prefix ++ b); true
      }
    }
  }

  test("Tar.entries never throws on arbitrary bytes (ustar-prefixed too)") {
    check("tar") {
      Prop.forAll(bytesGen) { b => graft.sources.Tar.entries(b); true }
    }
    // a valid first header followed by lying sizes / garbage
    val valid = graft.sources.Tar.build(Seq(("a", Array[Byte](1, 2, 3))))
    check("tar-prefixed") {
      Prop.forAll(bytesGen) { b =>
        graft.sources.Tar.entries(valid.dropRight(1024) ++ b); true
      }
    }
  }

  test("Zip.entries never throws on arbitrary bytes (PK-prefixed too)") {
    check("zip") {
      Prop.forAll(bytesGen) { b => graft.sources.Zip.entries(b); true }
    }
    val validZ = graft.sources.Zip.build(Seq(("a", Array[Byte](1, 2, 3))))
    check("zip-prefixed") {
      Prop.forAll(bytesGen) { b =>
        graft.sources.Zip.entries(validZ ++ b)
        graft.sources.Zip.entries(validZ.take(validZ.length / 2) ++ b); true
      }
    }
  }

  test("SevenZip.entries never throws on arbitrary bytes (sig-prefixed too)") {
    check("sevenz") {
      Prop.forAll(bytesGen) { b => graft.sources.SevenZip.entries(b); true }
    }
    val valid7 = graft.sources.SevenZip.build(
      Seq(("a", Array[Byte](1, 2, 3))), "lzma2")
    check("sevenz-prefixed") {
      Prop.forAll(bytesGen) { b =>
        graft.sources.SevenZip.entries(valid7 ++ b)
        graft.sources.SevenZip.entries(
          valid7.take(valid7.length / 2) ++ b); true
      }
    }
  }

  test("MediaHeaders.probe never throws on arbitrary bytes") {
    check("probe") {
      Prop.forAll(bytesGen) { b =>
        graft.llm.MediaHeaders.probe(b); true
      }
    }
    // signature-prefixed garbage (the adversarial case: header starts
    // valid then lies about lengths)
    val sigs = Seq(
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a),
      "GIF89a".getBytes, "RIFF".getBytes ++ Array[Byte](-1, -1, -1, -1) ++
        "WAVE".getBytes, Array[Byte](0xff.toByte, 0xd8.toByte), "BM".getBytes,
      // EBML magic: the vint walk must survive arbitrary element soup
      Array[Byte](0x1a, 0x45, 0xdf.toByte, 0xa3.toByte))
    check("probe-sig") {
      Prop.forAll(bytesGen, Gen.choose(0, sigs.size - 1)) { (b, i) =>
        graft.llm.MediaHeaders.probe(sigs(i) ++ b); true
      }
    }
  }

  test("Protobuf decoders never throw on arbitrary bytes") {
    val msgs = Map(".m.M" -> graft.ops.Protobuf.PbMsg(Map(
      1 -> graft.ops.Protobuf.PbField("a", 1, 1, 9, ""))))
    check("proto") {
      Prop.forAll(bytesGen) { b =>
        graft.ops.Protobuf.parse(b)
        graft.ops.Protobuf.parseDescriptorSet(b)
        val out = scala.collection.mutable.Map.empty[String, String]
        graft.ops.Protobuf.decodeNamed(b, msgs, ".m.M", "", out)
        true
      }
    }
  }

  test("Xlsx and HL7 parsers never throw on arbitrary input") {
    check("xlsx") {
      Prop.forAll(bytesGen) { b => graft.ops.Xlsx.parse(b, "0"); true }
    }
    check("hl7") {
      Prop.forAll(Gen.asciiPrintableStr) { s =>
        graft.ops.Hl7.parse(s); true
      }
    }
    // property round-trip: arbitrary grids written as BIFF8 by the
    // spec-derived test writer read back identically through BOTH
    // storage paths (regular sectors and mini stream)
    check("xls-roundtrip") {
      val cellGen: Gen[Any] = Gen.oneOf(
        Gen.choose(-1000000.0, 1000000.0).map(d => d: Any),
        Gen.choose(-500, 500).map(_.toDouble: Any),
        Gen.listOfN(8, Gen.choose(32.toChar, 126.toChar))
          .map(_.mkString: Any))
      val rowGen = Gen.choose(1, 5).flatMap(n => Gen.listOfN(n, cellGen))
      val gridGen = Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, rowGen))
      Prop.forAll(gridGen) { g =>
        val wb = XlsFixture.biffFromGrid(g)
        val expected = g.map(_.map {
          case s: String => s
          case d: Double =>
            if (d.isWhole && math.abs(d) < 1e15) d.toLong.toString
            else d.toString
        })
        val reg = graft.ops.Xlsx.parse(XlsFixture.cfbRegular(wb), "0")
          .map(_.cells.toList)
        val mini = graft.ops.Xlsx.parse(XlsFixture.cfbMini(wb), "0")
          .map(_.cells.toList)
        reg == expected && mini == expected
      }
    }
    // a corrupt OLE2 container (valid magic, garbage body) must
    // terminate (chain-loop guards) and either yield zero rows or the
    // one deliberate legacy-BIFF error — never hang or leak an
    // index/argument exception
    check("xls-ole2") {
      val magic = Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1)
        .map(_.toByte)
      Prop.forAll(bytesGen) { b =>
        try { graft.ops.Xlsx.parse(magic ++ b, "0"); true }
        catch { case _: UnsupportedOperationException => true }
      }
    }
  }

  test("JsonPathLite.eval never throws and terminates on arbitrary paths") {
    import graft.functions.JsonPathLite
    val json = """{"a":[{"b":1},{"b":2}],"c":{"d":"x"},"e:f":3,"g-h":[1,2,3]}"""
    check("jsonpath-paths") {
      Prop.forAll(Gen.listOf(Gen.oneOf(
        Gen.const("$"), Gen.const("."), Gen.const(".."), Gen.const("["),
        Gen.const("]"), Gen.const("[*]"), Gen.const("[?(@.b>1)]"),
        Gen.const("[1:3]"), Gen.const("[-1]"), Gen.const("['a','b']"),
        Gen.const("a"), Gen.const(":"), Gen.const("'"), Gen.const("&&"),
        Gen.const("||"), Gen.asciiPrintableChar.map(_.toString)))) { parts =>
        JsonPathLite.eval(json, "$" + parts.mkString); true // null or value, no throw
      }
    }
    check("jsonpath-json") {
      Prop.forAll(Gen.asciiPrintableStr) { j =>
        JsonPathLite.eval(j, "$.a[?(@.b > 1)].b[1:3]"); true
      }
    }
  }

  test("recipe tokenizer terminates with at worst a RecipeException") {
    val recipeish = Gen.listOf(Gen.frequency(
      (5, Gen.alphaNumChar),
      (2, Gen.oneOf(' ', ':', ';', ',', '\'', '"', '{', '}', '\\', '$',
        '\n', '!', '#', '-', '.')))).map(_.mkString)
    check("tokenize") {
      Prop.forAll(recipeish) { s =>
        try { graft.parser.RecipeParser.parse(s); true }
        catch { case _: graft.api.RecipeException => true }
      }
    }
  }

  test("NlDate.parse never throws; garbage yields null") {
    val anchor = java.time.LocalDate.of(2024, 6, 12)
    check("nldate") {
      Prop.forAll(Gen.asciiPrintableStr) { s =>
        graft.NlDateProbe.parse(s, anchor); true
      }
    }
    assert(graft.ops.NlDate.parse("definitely not a date", anchor) == null)
    assert(graft.ops.NlDate.parseDateTime("tomorrow at 99:99", anchor) == null)
  }

  test("connectedComponents: union-find and iterative fallback agree on random graphs") {
    // the equivalence contract at the driverLimit switch point: BOTH
    // regimes must yield identical (id -> min-reachable-id) labels for
    // the same pair set. driverLimit=0 forces the distributed loop.
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val spark = SparkSpec.spark
    val schema = StructType(Seq(
      StructField("id_a", LongType), StructField("id_b", LongType)))
    val graphGen: Gen[List[(Long, Long)]] = for {
      nNodes <- Gen.choose(2, 24)
      nEdges <- Gen.choose(1, 48)
      edges <- Gen.listOfN(nEdges, for {
        a <- Gen.choose(0, nNodes - 1)
        b <- Gen.choose(0, nNodes - 1)
      } yield (a.toLong, b.toLong))
    } yield edges
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10),
      Prop.forAll(graphGen) { edges =>
        val pairs = spark.createDataFrame(
          java.util.Arrays.asList(edges.map { case (a, b) => Row(a, b) }: _*),
          schema)
        val fast = graft.llm.Dedup.connectedComponents(pairs)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val dist = graft.llm.Dedup
          .connectedComponents(pairs, maxIter = 30, driverLimit = 0)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        fast == dist
      })
    assert(res.passed, s"cc-equivalence: ${res.status}")
    // non-integral id columns fail fast with a clear message instead of
    // null-casting into corrupted labels
    val strPairs = spark.createDataFrame(
      java.util.Arrays.asList(Row("a", "b")),
      StructType(Seq(
        StructField("id_a", org.apache.spark.sql.types.StringType),
        StructField("id_b", org.apache.spark.sql.types.StringType))))
    val e = intercept[IllegalArgumentException] {
      graft.llm.Dedup.connectedComponents(strPairs)
    }
    assert(e.getMessage.contains("integral"))
  }

  test("exact dedup: anti-join fast path and full-row fallback agree") {
    // the equivalence contract at the maxBroadcastLosers switch point:
    // both regimes must keep exactly the same rows. 0 forces the
    // classic full-row min_by shuffle; the duplicated corpus guarantees
    // a non-empty loser set so both paths do real work.
    import org.apache.spark.sql.Row
    val spark = SparkSpec.spark
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("text", StringType), StructField("meta", StringType)))
    val rnd = new scala.util.Random(23)
    val rows = (1 to 300).map { i =>
      // ~30 distinct contents, case/punctuation variants normalize equal
      val g = rnd.nextInt(30)
      val variant = rnd.nextInt(3) match {
        case 0 => s"Document number $g about topic $g."
        case 1 => s"document NUMBER $g about topic $g"
        case 2 => s"  document number $g, about topic $g!  "
      }
      Row(i.toLong, variant, s"m$i")
    }
    val d = spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
    def key(r: Row) = (r.getLong(0), r.getString(1), r.getString(2))
    val fast = graft.llm.Dedup.exact(d, "text", "id")
      .collect().map(key).toSet
    val fallback = graft.llm.Dedup
      .exact(d, "text", "id", maxBroadcastLosers = 0)
      .collect().map(key).toSet
    assert(fast == fallback, "exact-dedup paths diverge")
    assert(fast.size < 300 && fast.size >= 30)
    val bestFast = graft.llm.Dedup.exactKeepBest(d, "text", "id", "id")
      .collect().map(key).toSet
    val bestFallback = graft.llm.Dedup
      .exactKeepBest(d, "text", "id", "id", maxBroadcastLosers = 0)
      .collect().map(key).toSet
    assert(bestFast == bestFallback, "keep-best paths diverge")
    // keep-best with prio=id keeps the LARGEST id per group; exact
    // keeps the smallest — the two policies must differ on dup groups
    assert(bestFast != fast)
  }

  test("exact dedup: duplicated and null ids do not nuke unrelated groups") {
    // regression: an id-only loser anti-join deleted same-id rows from
    // OTHER content groups and never removed null-id losers
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val spark = SparkSpec.spark
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("text", StringType)))
    val d = spark.createDataFrame(java.util.Arrays.asList(
      Row(2L, "alpha content"),   // unique content, id shared with a loser
      Row(1L, "beta content"),
      Row(2L, "beta content"),    // loser of group beta (id 2)
      Row(null, "gamma content"), // null-id keeper (nulls sort first)
      Row(5L, "gamma content")), schema) // loser of group gamma
    val got = graft.llm.Dedup.exact(d, "text", "id")
      .collect().map(r => (Option(r.get(0)), r.getString(1))).toSet
    assert(got == Set(
      (Some(2L), "alpha content"),  // must SURVIVE despite sharing id=2
      (Some(1L), "beta content"),
      (None, "gamma content")),     // null-id winner; id=5 loser removed
      s"got $got")
  }

  test("incremental exact dedup equals full-corpus dedup restricted to the batch") {
    // the identity that makes incremental ingest correct: when corpus
    // ids all precede batch ids, exactAgainst(batch, state(corpus))
    // keeps exactly the batch rows that Dedup.exact(corpus ∪ batch)
    // would keep.
    val spark = SparkSpec.spark
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    import org.apache.spark.sql.functions.col
    val corpus = d.where(col("doc_id") < 25)
    val batch = d.where(col("doc_id") >= 25)
    val incremental = graft.llm.IncrementalDedup.exactAgainst(
        batch, "text", "doc_id",
        graft.llm.IncrementalDedup.exactState(corpus, "text"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val full = graft.llm.Dedup.exact(d, "text", "doc_id")
      .where(col("doc_id") >= 25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(incremental == full,
      s"diff=${(incremental diff full) ++ (full diff incremental)}")
  }

  test("incremental minhash dedup equals full-corpus near-dedup on the batch") {
    // same identity for near-dup: in-batch minhashDedup + banded join
    // against stored corpus buckets == minhashDedup(corpus ∪ batch)
    // restricted to batch ids (corpus ids are all smaller, so 'larger
    // id of a verified pair' decomposes into exactly those two checks).
    val spark = SparkSpec.spark
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    import org.apache.spark.sql.functions.col
    val corpus = d.where(col("doc_id") < 25)
    val batch = d.where(col("doc_id") >= 25)
    val state = graft.llm.IncrementalDedup.minhashState(corpus, "text", "doc_id")
    val composed = graft.llm.IncrementalDedup.minhashAgainst(
        graft.llm.Dedup.minhashDedup(batch, "text", "doc_id", threshold = 0.8),
        "text", "doc_id", state, corpus, threshold = 0.8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val fused = graft.llm.IncrementalDedup.minhashDedupAgainst(
        batch, "text", "doc_id", state, corpus, threshold = 0.8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val full = graft.llm.Dedup.minhashDedup(d, "text", "doc_id", threshold = 0.8)
      .where(col("doc_id") >= 25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(composed == full,
      s"composed diff=${(composed diff full) ++ (full diff composed)}")
    assert(fused == full,
      s"fused diff=${(fused diff full) ++ (full diff fused)}")
  }
}

/** Indirection so the spec compiles even if NlDate moves. */
object NlDateProbe {
  // the time-composite entry point subsumes the date-only parse — fuzz
  // the full surface
  def parse(s: String, d: java.time.LocalDate) =
    graft.ops.NlDate.parseDateTime(s, d)
}
