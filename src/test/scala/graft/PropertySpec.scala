package graft

import graft.functions.Udfs
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based tests for the pure scalar kernels (raw ScalaCheck
  * driven from ScalaTest — the scalatestplus bridge isn't in the
  * offline cache).
  */
class PropertySpec extends AnyFunSuite {

  private def check(name: String)(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), p)
    assert(res.passed, s"$name: ${res.status}")
  }

  private val asciiText: Gen[String] =
    Gen.listOf(Gen.choose(32.toChar, 126.toChar)).map(_.mkString)

  test("base32 round-trips arbitrary bytes") {
    check("base32") {
      Prop.forAll(Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue))) { bs =>
        val arr = bs.toArray
        Udfs.base32Decode(Udfs.base32Encode(arr)).sameElements(arr)
      }
    }
  }

  test("levenshtein is a metric: identity, symmetry, triangle") {
    check("levenshtein") {
      Prop.forAll(asciiText, asciiText, asciiText) { (a, b, c) =>
        Udfs.levenshtein(a, a) == 0 &&
          Udfs.levenshtein(a, b) == Udfs.levenshtein(b, a) &&
          Udfs.levenshtein(a, c) <= Udfs.levenshtein(a, b) + Udfs.levenshtein(b, c)
      }
    }
  }

  test("mask-number output never leaks digits outside # positions") {
    check("mask") {
      Prop.forAll(Gen.listOfN(9, Gen.numChar).map(_.mkString)) { d =>
        !Udfs.maskNumber(d, "xxx-xx-####").take(6).exists(_.isDigit)
      }
    }
  }

  test("normalizeText is idempotent and whitespace-collapsing") {
    check("normalize") {
      Prop.forAll(asciiText) { s =>
        val once = Udfs.normalizeText(s)
        Udfs.normalizeText(once) == once && !once.contains("  ")
      }
    }
  }

  test("minhash signatures: deterministic, fixed length") {
    check("minhash") {
      Prop.forAll(asciiText.suchThat(_.length >= 10)) { s =>
        val a = Udfs.minhashSig(s, 32, 5, 42L)
        val b = Udfs.minhashSig(s, 32, 5, 42L)
        a.sameElements(b) && a.length == 32
      }
    }
    // the combined kernel agrees with the sig-only kernel (which
    // signals an empty shingle set with an empty array instead of the
    // all-MaxValue signature)
    check("minhash-combined") {
      Prop.forAll(asciiText) { s =>
        val (sh, sig) = Udfs.shingleAndSig(s, 32, 5, 42L)
        val sigOnly = Udfs.minhashSig(s, 32, 5, 42L)
        sh.sameElements(Udfs.shingleHashSet(s, 5)) &&
          (if (sh.isEmpty) sigOnly.isEmpty else sig.sameElements(sigOnly))
      }
    }
  }

  test("shingleJaccard: bounded, symmetric, identity, equals set formula") {
    check("jaccard") {
      Prop.forAll(asciiText, asciiText) { (a, b) =>
        val j = Udfs.shingleJaccard(a, b, 5)
        val sym = Udfs.shingleJaccard(b, a, 5)
        val sa = Udfs.shingleHashSet(a, 5).toSet
        val sb = Udfs.shingleHashSet(b, 5).toSet
        val ref =
          if (sa.isEmpty || sb.isEmpty) 0.0
          else sa.intersect(sb).size.toDouble / sa.union(sb).size
        j >= 0.0 && j <= 1.0 && j == sym && j == ref &&
          (sa.isEmpty || Udfs.shingleJaccard(a, a, 5) == 1.0)
      }
    }
  }

  test("BPE encode: never throws, reassembles the normalized words") {
    val merges = graft.llm.Bpe.trainFromFreqs(
      Seq("low" -> 5L, "newest" -> 6L, "widest" -> 3L), 6)
    val ranks = new java.util.HashMap[(String, String), Int]()
    merges.zipWithIndex.foreach { case (p, i) => ranks.put(p, i) }
    check("bpe") {
      Prop.forAll(asciiText) { s =>
        val toks = graft.llm.Bpe.encodeText(s, ranks)
        // stripping the end-of-word marker (as a token SUFFIX — input
        // text may itself contain the literal "</w>", which must
        // survive) and concatenating restores exactly the lowercased
        // whitespace words — merge application never loses or invents
        // characters. (None of the trained merges involve < / > chars,
        // so no merged token can end in a literal marker.)
        val restored = toks.map(t =>
          if (t.endsWith(graft.llm.Bpe.Eow))
            t.dropRight(graft.llm.Bpe.Eow.length)
          else t).mkString("")
        val expected = s.toLowerCase.split("\\s+").filter(_.nonEmpty).mkString("")
        restored == expected &&
          toks.count(_.endsWith(graft.llm.Bpe.Eow)) ==
            s.split("\\s+").count(_.nonEmpty)
      }
    }
  }

  test("porter stemmer: deterministic, non-growing, converges") {
    // Porter is NOT idempotent (correct per spec: 'agreed'->'agre'->
    // 'agr' — step 5a strips another final e each pass on high-m
    // words), so a fixpoint-after-k assertion is wrong for every fixed
    // k. What it does guarantee: determinism, output never longer than
    // input, and convergence under iteration (each changing pass
    // shrinks the word or rewrites a final y->i, which then sticks).
    check("porter") {
      Prop.forAll(Gen.listOf(Gen.alphaLowerChar).map(_.mkString)
        .suchThat(_.length >= 3)) { w =>
        val a = Udfs.porterStem(w)
        var cur = a
        var i = 0
        while (i <= w.length + 2 && Udfs.porterStem(cur) != cur) {
          cur = Udfs.porterStem(cur); i += 1
        }
        a == Udfs.porterStem(w) && a.length <= w.length &&
          Udfs.porterStem(cur) == cur
      }
    }
  }

  test("simhash of similar token sets differs in few bits") {
    check("simhash") {
      Prop.forAll(Gen.listOfN(20, Gen.identifier).suchThat(_.nonEmpty)) { toks =>
        val h = java.lang.Long.bitCount(
          Udfs.simhashSig(toks.mkString(" ")) ^
            Udfs.simhashSig((toks :+ "extra").mkString(" ")))
        h <= 32
      }
    }
  }

  test("protobuf wire round-trip: random messages decode by name") {
    import graft.ops.{ProtoWire, Protobuf}
    val gen = for {
      i64 <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
      i32 <- Gen.chooseNum(Int.MinValue, Int.MaxValue)
      s <- Gen.alphaNumStr.map(_.take(40))
      d <- Gen.chooseNum(-1e12, 1e12)
      b <- Gen.oneOf(true, false)
      inner <- Gen.alphaNumStr.map(_.take(20))
    } yield (i64, i32, s, d, b, inner)
    // descriptor: message M { int64 a=1; int32 b=2; string c=3;
    //   double d=4; bool e=5; Inner f=6 } message Inner { string x=1 }
    def fieldOf(w: ProtoWire.W, name: String, num: Int, tpe: Int,
        typeName: String = ""): Unit =
      w.msg(2) { f =>
        f.str(1, name); f.int(3, num); f.int(4, 1); f.int(5, tpe)
        if (typeName.nonEmpty) f.str(6, typeName)
      }
    val desc = ProtoWire.build { s0 =>
      s0.msg(1) { fdp =>
        fdp.str(1, "m.proto"); fdp.str(2, "pkg")
        fdp.msg(4) { m =>
          m.str(1, "M")
          fieldOf(m, "a", 1, 3); fieldOf(m, "b", 2, 5); fieldOf(m, "c", 3, 9)
          fieldOf(m, "d", 4, 1); fieldOf(m, "e", 5, 8)
          fieldOf(m, "f", 6, 11, ".pkg.Inner")
        }
        fdp.msg(4) { m => m.str(1, "Inner"); fieldOf(m, "x", 1, 9) }
      }
    }
    val msgs = Protobuf.parseDescriptorSet(desc)
    val root = Protobuf.resolveMessage(msgs, "pkg.M").get
    val prop = Prop.forAll(gen) { case (i64, i32, s, d, b, inner) =>
      // field 4 is wire type 1 (double): manual tag + fixed64 bytes
      val fixed = {
        val w = new ProtoWire.W
        w.int(1, i64)
        w.int(2, i32.toLong) // sign-extended like a real encoder
        w.str(3, s)
        w.varint((4L << 3) | 1)
        val bb = java.nio.ByteBuffer.allocate(8)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.putLong(java.lang.Double.doubleToLongBits(d))
        w.raw(bb.array())
        w.int(5, if (b) 1 else 0)
        w.msg(6)(iw => iw.str(1, inner))
        w.toBytes
      }
      val out = scala.collection.mutable.Map.empty[String, String]
      Protobuf.decodeNamed(fixed, msgs, root, "", out)
      out("a") == i64.toString &&
        out("b") == i32.toString &&
        out("c") == s &&
        math.abs(out("d").toDouble - d) < math.abs(d) * 1e-12 + 1e-9 &&
        out("e") == b.toString &&
        out("f.x") == inner
    }
    check("protobuf round-trip")(prop)
  }

  test("HttpdLogFormat.compile: total on arbitrary formats, regex valid") {
    // any ASCII format string either raises the documented
    // IllegalArgumentException (unterminated %{...}) or yields a regex
    // that compiles with exactly one capture group per emitted field
    check("logformat") {
      Prop.forAll(asciiText) { fmt =>
        try {
          val (re, fields) = graft.ops.HttpdLogFormat.compile(fmt)
          val p = java.util.regex.Pattern.compile(re)
          p.matcher("").groupCount() == fields.size
        } catch { case _: IllegalArgumentException => true }
      }
    }
  }

  test("ExcelDates: classifier and serial renderer never throw") {
    check("excel-fmt") {
      Prop.forAll(asciiText)(fmt =>
        { graft.ops.ExcelDates.isDateFormatString(fmt); true })
    }
    check("excel-serial") {
      Prop.forAll(Gen.chooseNum(-1e12, 1e12)) { d =>
        graft.ops.ExcelDates.renderSerial(d) != null
      }
    }
    // known fixed points
    assert(graft.ops.ExcelDates.renderSerial(-5.0) == "-5")
    assert(graft.ops.ExcelDates.renderSerial(1e7) == "10000000")
    // the 1900 phantom-leap-day boundary, POI getJavaDate parity:
    // 59 = Feb 28; 60 (Excel's fake Feb 29) and 61 BOTH land on Mar 1
    assert(graft.ops.ExcelDates.renderSerial(59.0) == "1900-02-28")
    assert(graft.ops.ExcelDates.renderSerial(60.0) == "1900-03-01")
    assert(graft.ops.ExcelDates.renderSerial(61.0) == "1900-03-01")
    assert(graft.ops.ExcelDates.renderSerial(62.0) == "1900-03-02")
  }

  test("tokenGramHashes: total, deterministic, distinct, window-bounded") {
    check("gram-hashes") {
      Prop.forAll(asciiText, Gen.choose(1, 10)) { (s, n) =>
        val a = Udfs.tokenGramHashes(s, n)
        val b = Udfs.tokenGramHashes(s, n)
        val toks = Udfs.normalizeText(s).split(" ").count(_.nonEmpty)
        val expectedMax = if (toks == 0) 0 else math.max(toks - n + 1, 1)
        a.sameElements(b) &&                 // deterministic
          a.length == a.toSet.size &&        // distinct
          a.length <= expectedMax            // one hash per window
      }
    }
    // null-total
    assert(Udfs.tokenGramHashes(null, 3).isEmpty)
    // boundary-marker injectivity over token sequences
    assert(!Udfs.tokenGramHashes("ab c", 2)
      .sameElements(Udfs.tokenGramHashes("a bc", 2)))
  }

  test("wsGramHashes/cutTokenSpans: total, consistent, span-safe") {
    val spanGen = Gen.listOf(for {
      s <- Gen.choose(-5L, 30L); len <- Gen.choose(-2L, 10L)
    } yield (s, s + len))
    check("cut-spans") {
      Prop.forAll(asciiText, spanGen) { (text, spans) =>
        val out = Udfs.cutTokenSpans(text, spans)
        val toks = text.trim.split("\\s+").filter(_.nonEmpty)
        // never throws, never null on non-null input, token count only shrinks
        out != null && out.split(" ").count(_.nonEmpty) <= toks.length
      }
    }
    check("ws-gram-hashes") {
      Prop.forAll(asciiText, Gen.choose(1, 8)) { (text, n) =>
        val hs = Udfs.wsGramHashes(text, n)
        val toks = text.trim.split("\\s+").count(_.nonEmpty)
        // one hash per full window, empty when the doc is shorter than n
        hs.length == math.max(toks - n + 1, 0)
      }
    }
    assert(Udfs.cutTokenSpans(null, Seq((1L, 2L))) == null)
    assert(Udfs.cutTokenSpans("a b c", Seq((1L, 3L))) == "")
    assert(Udfs.wsGramHashes(null, 3).isEmpty)
  }

  test("hexThreshold: 32-hex, monotone, exact endpoints") {
    import graft.session.Sampler.hexThreshold
    check("hex-threshold") {
      Prop.forAll(Gen.chooseNum(0.0, 1.0), Gen.chooseNum(0.0, 1.0)) { (a, b) =>
        val (ha, hb) = (hexThreshold(a), hexThreshold(b))
        ha.length == 32 && hb.length == 32 &&
          ha.forall(c => c.isDigit || (c >= 'a' && c <= 'f')) &&
          ((a <= b) == (ha <= hb) || a == b)  // monotone w/ numeric value
      }
    }
    assert(graft.session.Sampler.hexThreshold(0.0) == "0" * 32)
    // 1.0 caps at the max digest; the samplers short-circuit
    // fraction >= 1.0 to lit(true) so even the all-f digest is kept
    assert(graft.session.Sampler.hexThreshold(1.0) == "f" * 32)
    intercept[IllegalArgumentException](graft.session.Sampler.hexThreshold(1.5))
  }
  // ---- web-corpus kernels: never throw on adversarial bytes ---------

  private val tagSoup: Gen[String] = {
    val frag = Gen.oneOf(
      Gen.oneOf("<p>", "</p>", "<div", "<!--", "-->", "<![CDATA[", "]]>",
        "<script>", "</script>", "<title>", "</title>", "&amp;", "&#65;",
        "&#xZZ;", "&bogus", "<", ">", "\"", "'", "="),
      Gen.listOf(Gen.choose(32.toChar, 126.toChar)).map(_.mkString),
      Gen.oneOf("\n", "\r\n", "\t", "\u00a0"))
    Gen.listOf(frag).map(_.mkString)
  }

  test("html extract: total on arbitrary tag soup, output tag-free") {
    check("htmlExtract") {
      Prop.forAll(tagSoup) { soup =>
        val (title, text) = graft.llm.HtmlText.extract(soup)
        // total (no throw), and extracted text never leaks tag brackets
        // from well-formed tags (a bare '<' with no tag name stays
        // literal text, matching browser error recovery)
        (text == null || !text.contains("<p>")) &&
          (title == null || !title.contains("<"))
      }
    }
  }

  test("warc parse: total on arbitrary bytes, never throws") {
    check("warcParse") {
      Prop.forAll(Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue))) { bs =>
        graft.sources.Warc.parseAll(bs.toArray) != null // total
      }
    }
  }

  test("pdf extract: total on arbitrary bytes and on mutated real docs") {
    check("pdfTotalRandom") {
      Prop.forAll(Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue))) { bs =>
        graft.sources.Pdf.extract(bs.toArray) != null // total
      }
    }
    val base = graft.sources.Pdf.build(Seq(Seq("alpha", "beta (x)"),
      Seq("gamma")))
    val mutation = for {
      n <- Gen.choose(1, 6)
      muts <- Gen.listOfN(n,
        Gen.zip(Gen.choose(0, base.length - 1),
          Gen.choose(Byte.MinValue, Byte.MaxValue)))
    } yield muts
    check("pdfTotalMutated") {
      Prop.forAll(mutation) { muts =>
        val m = base.clone()
        muts.foreach { case (i, b) => m(i) = b }
        graft.sources.Pdf.extract(m) != null // total on damaged docs
      }
    }
  }

  test("eml / subtitles / front matter: total on arbitrary text") {
    val anyText: Gen[String] =
      Gen.listOf(Gen.frequency(
        8 -> Gen.choose(32.toChar, 126.toChar),
        1 -> Gen.oneOf('\n', '\r', '\t'),
        1 -> Gen.choose(128.toChar, 0x2fff.toChar))).map(_.mkString)
    check("emlTotal") {
      Prop.forAll(anyText) { s =>
        graft.sources.Eml.parse(s) != null &&
          graft.sources.Eml.parts(s) != null &&
          graft.sources.Eml.splitMbox(s) != null
      }
    }
    check("subtitlesTotal") {
      Prop.forAll(anyText) { s =>
        val cues = graft.sources.Subtitles.parse(s)
        // total, and every cue well-ordered with contiguous ordinals
        cues.zipWithIndex.forall { case (c, i) =>
          c.index == i && c.start_ms >= 0 && c.end_ms >= c.start_ms }
      }
    }
    check("frontMatterTotal") {
      Prop.forAll(anyText) { s =>
        val (body, pairs) = graft.llm.TextAnalysis.frontMatter(s)
        // total; a doc with no LEADING fence is returned verbatim
        pairs != null &&
          (s.split("\r\n|\n", -1).headOption.exists(_.trim == "---") ||
            (body == s && pairs.isEmpty))
      }
    }
    check("feedTotal") {
      Prop.forAll(anyText) { s =>
        graft.sources.Warc.parseFeed(s) != null &&
          graft.llm.Robots.sitemaps(s) != null
      }
    }
    check("rtfTotal") {
      Prop.forAll(anyText) { s =>
        graft.sources.Rtf.extract(s) != null &&
          graft.sources.Rtf.extract("{\\rtf1" + s) != null
      }
    }
    check("latexTotalAndCommandFree") {
      Prop.forAll(anyText) { s =>
        val out = graft.llm.TextAnalysis.stripLatex(s)
        // total, and no \command survives the strip
        out != null && "\\\\[a-zA-Z]".r.findFirstIn(out).isEmpty
      }
    }
    check("extractAnyTotal") {
      Prop.forAll(Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue))) {
        bs => graft.sources.Extract.extractAny(bs.toArray) != null
      }
    }
  }

  test("dhash64 / wavFrameStats: total on arbitrary bytes") {
    check("imageAudioHashTotal") {
      Prop.forAll(Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue))) { bs =>
        val b = bs.toArray
        // both return null (not throw) on everything undecodable, and
        // a decodable result is internally consistent
        val d = graft.llm.ImageHash.dhash64(b)
        val h = graft.llm.ImageHash.dhashHex(b)
        val w = graft.llm.MediaHeaders.wavFrameStats(b, 16)
        ((d == null) == (h == null)) &&
          (d == null || h == f"${d.longValue}%016x") &&
          (w == null || (w.n_frames >= 0 && w.silence_frames <= w.n_frames))
      }
    }
  }

  test("png/gif/bmp/mp4 decoders: total on arbitrary bytes") {
    check("mediaDecodersTotal") {
      Prop.forAll(Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue))) { bs =>
        val b = bs.toArray
        // each returns null/empty on garbage rather than throwing
        graft.llm.MediaHeaders.pngStats(b)
        graft.llm.MediaHeaders.gifStats(b)
        graft.llm.MediaHeaders.bmpStats(b)
        graft.llm.MediaHeaders.tiffStats(b)
        graft.llm.MediaHeaders.webmSamples(b)
        graft.llm.MediaHeaders.webmSubtitles(b)
        graft.llm.MediaHeaders.mp4Samples(b) != null
      }
    }
  }

  test("webm walker: total on EBML-prefixed arbitrary bytes") {
    // random bytes rarely carry the 1A45DFA3 magic, so the plain
    // generator never reaches the element walk — prefix it
    val magic = Array[Byte](0x1a, 0x45, 0xdf.toByte, 0xa3.toByte)
    check("webmPrefixedTotal") {
      Prop.forAll(Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue))) { bs =>
        val b = magic ++ bs.toArray
        graft.llm.MediaHeaders.webmSamples(b)
        graft.llm.MediaHeaders.webmSubtitles(b)
        true
      }
    }
  }

  test("container decoders: total on mutated VALID fixtures") {
    // Random bytes never reach the deep paths of a structured format
    // (the r14 WARC dechunk crash escaped the arbitrary-bytes fuzz
    // exactly this way) — mutate VALID fixtures instead so the
    // element/table walks, size fields, and nested members are the
    // code actually under fire. Each parser must never throw; result
    // content is unconstrained.
    import graft.sources.{Zip, Tar, Epub, Docx}
    val docx = Zip.build(Seq(("word/document.xml",
      "<w:p><w:pPr><w:tabs><w:tab w:pos=\"1\"/></w:tabs></w:pPr><w:r><w:t>doc body text</w:t><w:tab/><w:t>x</w:t></w:r></w:p>"
        .getBytes("UTF-8"))))
    val pptx = Zip.build(Seq(("ppt/slides/slide2.xml",
      "<a:p><a:r><a:t>slide</a:t></a:r></a:p>".getBytes("UTF-8"))))
    val odt = Zip.build(Seq(("content.xml",
      "<office:text><text:p>odt body</text:p></office:text>".getBytes("UTF-8"))))
    val epub = {
      val opf = ("<package><manifest>" +
        "<item id=\"c1\" href=\"c1.xhtml\" media-type=\"application/xhtml+xml\"/>" +
        "</manifest><spine><itemref idref=\"c1\"/></spine></package>")
      Zip.build(Seq(
        ("META-INF/container.xml",
          "<container><rootfiles><rootfile full-path=\"content.opf\"/></rootfiles></container>"
            .getBytes("UTF-8")),
        ("content.opf", opf.getBytes("UTF-8")),
        ("c1.xhtml", "<html><body><p>chapter</p></body></html>".getBytes("UTF-8"))))
    }
    val xlsx = Zip.build(Seq(
      ("xl/sharedStrings.xml", "<sst><si><t>v</t></si></sst>".getBytes("UTF-8")),
      ("xl/worksheets/sheet1.xml",
        "<worksheet><sheetData><row><c r=\"A1\" t=\"s\"><v>0</v></c></row></sheetData></worksheet>"
          .getBytes("UTF-8"))))
    val xls = XlsFixture.cfbRegular(XlsFixture.biffWorkbook())
    val tar = Tar.build(Seq(("a/file1.txt", Array.fill(600)('x'.toByte)),
      ("b.bin", Array.tabulate(40)(_.toByte))))
    val avro = {
      import org.apache.avro.Schema
      import org.apache.avro.file.DataFileWriter
      import org.apache.avro.generic.{GenericData, GenericDatumWriter}
      val schema = new Schema.Parser().parse(
        """{"type":"record","name":"R","fields":[{"name":"x","type":"int"}]}""")
      val bos = new java.io.ByteArrayOutputStream()
      val w = new DataFileWriter[GenericData.Record](
        new GenericDatumWriter[GenericData.Record](schema))
      w.create(schema, bos)
      (1 to 3).foreach { i =>
        val r = new GenericData.Record(schema); r.put("x", i); w.append(r)
      }
      w.close(); bos.toByteArray
    }
    // protobuf wire: field 1 varint 150, field 2 string "abc",
    // field 3 nested (field 1 varint 1)
    val proto = Array[Byte](0x08, 0x96.toByte, 0x01,
      0x12, 0x03, 'a', 'b', 'c', 0x1a, 0x02, 0x08, 0x01)
    val mp4 = graft.llm.MediaHeaders.mp4Build(
      (0 until 5).map(i => Array.fill(6 + i)(i.toByte)),
      samplesPerChunk = 2, keyframes1Based = Seq(1, 4))
    val targets: Seq[(String, Array[Byte], Array[Byte] => Any)] = Seq(
      ("docx", docx, Docx.extractDocx _),
      ("pptx", pptx, Docx.extractPptx _),
      ("odt", odt, Docx.extractOdt _),
      ("epub", epub, Epub.extract _),
      ("xlsx", xlsx, (b: Array[Byte]) => graft.ops.Xlsx.parse(b, "0")),
      // the BIFF5 precise-reject (UnsupportedOperationException) is a
      // DELIBERATE non-total contract — a mutation can flip the BOF
      // version bytes into it, so it's acceptable here
      ("xls", xls, (b: Array[Byte]) =>
        try graft.ops.Xlsx.parse(b, "0")
        catch { case _: UnsupportedOperationException => Nil }),
      ("tar", tar, Tar.entries _),
      ("zip", docx, (b: Array[Byte]) => Zip.entries(b)),
      ("avro", avro, (b: Array[Byte]) => graft.ops.AvroFile.parse(b)),
      ("proto", proto, (b: Array[Byte]) => graft.ops.Protobuf.parse(b)),
      ("mp4", mp4, (b: Array[Byte]) => graft.llm.MediaHeaders.mp4Samples(b)),
      ("mkv", {
        import graft.llm.MediaHeaders.WebmBlockSpec
        graft.llm.MediaHeaders.webmBuild(Seq((0L, Seq(
          WebmBlockSpec(1L, 0, keyframe = true, useGroup = false, null,
            lacing = 1, lacedFrames = (0 until 3).map(i =>
              Array.fill(5 + i)(i.toByte))),
          WebmBlockSpec(2L, 100, keyframe = true, useGroup = true,
            "cue".getBytes("UTF-8"), durationMs = 900L)))),
          tracks = Seq((1L, "V_VP9"), (2L, "S_TEXT/UTF8")),
          docType = "matroska")
      }, (b: Array[Byte]) => graft.sources.Extract.extractAny(b)),
      ("router", epub, (b: Array[Byte]) => graft.sources.Extract.extractAny(b)),
      ("7z", graft.sources.SevenZip.build(Seq(
        ("m/a.txt", "seven zip member body".getBytes("UTF-8")),
        ("b.bin", Array.tabulate(64)(_.toByte))), "lzma2"),
        (b: Array[Byte]) => graft.sources.SevenZip.entries(b)),
      ("tiff", QueryBank.tiffWebpFixture(0),
        (b: Array[Byte]) => graft.llm.MediaHeaders.probe(b)),
      ("tiffBe", QueryBank.tiffWebpFixture(1),
        (b: Array[Byte]) => graft.llm.MediaHeaders.probe(b)),
      ("heic", QueryBank.modernImageFixture(0),
        (b: Array[Byte]) => graft.llm.MediaHeaders.probe(b)),
      ("animGif", QueryBank.modernImageFixture(2),
        (b: Array[Byte]) => graft.llm.MediaHeaders.probe(b)),
      ("tiffDecode", graft.llm.MediaHeaders.tiffEncode(9, 8,
        Array.tabulate(9 * 8 * 3)(i => ((i * 31 + 5) % 256).toByte),
        packbits = true, rowsPerStrip = 3),
        (b: Array[Byte]) => graft.llm.MediaHeaders.tiffStats(b)),
      ("webp", QueryBank.tiffWebpFixture(3),
        (b: Array[Byte]) => graft.llm.MediaHeaders.probe(b)))
    val rnd = new scala.util.Random(1234)
    for ((name, base, parse) <- targets) {
      (0 until 200).foreach { trial =>
        val m = base.clone()
        (0 to rnd.nextInt(3)).foreach(_ =>
          m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte)
        val in = if (trial % 3 == 2) m.take(rnd.nextInt(m.length)) else m
        try parse(in)
        catch { case scala.util.control.NonFatal(e) =>
          fail(s"$name threw ${e.getClass.getSimpleName}: ${e.getMessage} " +
            s"(trial $trial)")
        }
      }
    }
    // string parsers: mutated valid MIME + HL7 messages
    val eml = Seq(
      "From: a@b.c", "To: d@e.f", "Subject: =?utf-8?B?aGVsbG8=?=",
      "MIME-Version: 1.0",
      "Content-Type: multipart/mixed; boundary=\"XX\"", "",
      "--XX", "Content-Type: text/plain", "", "body text", "--XX",
      "Content-Type: application/pdf",
      "Content-Transfer-Encoding: base64",
      "Content-Disposition: attachment; filename=\"a.pdf\"", "",
      "JVBERi0xLjQK", "--XX--", "").mkString("\r\n")
    val hl7 = Seq(
      "MSH|^~\\&|S|F|R|D|20240101||ORU^R01|1|P|2.4",
      "PID|1||123||Doe^John", "OBR|1|||T",
      "OBX|1|NM|GLU||99|mg/dL").mkString("\r")
    for ((name, base, parse) <- Seq[(String, String, String => Any)](
      ("eml", eml, (s: String) => graft.sources.Eml.parse(s)),
      ("hl7", hl7, (s: String) => graft.ops.Hl7.parseBothGrouped(s)))) {
      (0 until 200).foreach { trial =>
        val chars = base.toCharArray
        (0 to rnd.nextInt(3)).foreach(_ =>
          chars(rnd.nextInt(chars.length)) = rnd.nextPrintableChar())
        val in = new String(chars,
          0, if (trial % 3 == 2) rnd.nextInt(chars.length) else chars.length)
        try parse(in)
        catch { case scala.util.control.NonFatal(e) =>
          fail(s"$name threw ${e.getClass.getSimpleName}: ${e.getMessage} " +
            s"(trial $trial)")
        }
      }
    }
  }

  test("webm walker: structured every-byte and all-truncations sweep " +
      "over a laced fixture (r15 judge sweep, pinned)") {
    // The judge's r15 fuzz that found 0 crashes, kept machine-checked:
    // a REAL fixture covering all three lacing modes, a BlockGroup
    // with duration, and an S_TEXT-routed ASS cue, then (a) every byte
    // forced to 3 adversarial values and (b) every truncation length.
    // ~1.3K mutants on a ~300-byte fixture — cheap enough to always run.
    import graft.llm.MediaHeaders
    import graft.llm.MediaHeaders.WebmBlockSpec
    val fixture = MediaHeaders.webmBuild(Seq(
      (0L, Seq(
        WebmBlockSpec(1L, 0, keyframe = true, useGroup = false, null,
          lacing = 1, lacedFrames = (0 until 3).map(i =>
            Array.fill(4 + i)(i.toByte))), // Xiph
        WebmBlockSpec(1L, 10, keyframe = false, useGroup = false, null,
          lacing = 2, lacedFrames = (0 until 2).map(_ =>
            Array.fill(5)(7.toByte))), // fixed-size
        WebmBlockSpec(1L, 20, keyframe = true, useGroup = false, null,
          lacing = 3, lacedFrames = Seq(Array.fill(6)(1.toByte),
            Array.fill(3)(2.toByte))), // EBML
        WebmBlockSpec(2L, 30, keyframe = true, useGroup = true,
          "Dialogue: 0,0:00:01.00,0:00:02.00,Default,,0,0,0,,cue text"
            .getBytes("UTF-8"), durationMs = 800L)))),
      tracks = Seq((1L, "A_OPUS"), (2L, "S_TEXT/ASS")),
      docType = "matroska", timestampScaleNs = 500000L)
    // baseline sanity: the unmutated fixture exercises what we claim
    assert(MediaHeaders.webmSamples(fixture).size >= 8,
      "laced fixture must expand to per-frame rows")
    assert(MediaHeaders.webmSubtitles(fixture).nonEmpty)
    def total(b: Array[Byte], tag: => String): Unit =
      try { MediaHeaders.webmSamples(b); MediaHeaders.webmSubtitles(b); () }
      catch { case scala.util.control.NonFatal(e) =>
        fail(s"webm walker threw on $tag: " +
          s"${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    for (i <- fixture.indices;
         v <- Seq(0x00, 0xff, (fixture(i) ^ 0x55) & 0xff)) {
      val m = fixture.clone(); m(i) = v.toByte
      total(m, s"byte $i -> $v")
    }
    for (n <- 0 until fixture.length)
      total(java.util.Arrays.copyOf(fixture, n), s"truncation at $n")
  }

  test("warc-zstd dictionary shards: total on every-byte mutants and " +
      "all truncations (r16 fix class)") {
    // The r16 skippable-frame/dictionary path is new attack surface:
    // sweep a REAL dictionary shard ([skippable dict][2 dict frames])
    // with every-byte x2 mutants + all truncations through the full
    // record splitter — zero records is fine, a throw or a hang is not.
    import graft.sources.ZstdFrames
    val recs = (1 to 2).map { i =>
      val body = s"fuzz body $i"
      (s"WARC/1.0\r\nWARC-Type: conversion\r\n" +
        s"Content-Length: ${body.length}\r\n\r\n$body\r\n\r\n")
        .getBytes("UTF-8")
    }
    val samples = (0 until 300).map(i =>
      s"WARC/1.0 sample $i fuzz body content".getBytes("UTF-8"))
    val dict = ZstdFrames.trainDict(samples, 2048)
    val shard = ZstdFrames.skippableFrame(dict) ++
      recs.map(r2 => ZstdFrames.compressWithDict(r2, dict)).reduce(_ ++ _)
    // sanity: unmutated shard parses both records
    assert(graft.sources.Warc.parseAll(shard).length == 2)
    for (i <- shard.indices; v <- Seq(0x00, 0xff)) {
      val m = shard.clone(); m(i) = v.toByte
      try graft.sources.Warc.parseAll(m)
      catch { case scala.util.control.NonFatal(e) =>
        fail(s"warc-zst fuzz threw at byte $i -> $v: " +
          s"${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    for (n <- 0 until shard.length) {
      try graft.sources.Warc.parseAll(java.util.Arrays.copyOf(shard, n))
      catch { case scala.util.control.NonFatal(e) =>
        fail(s"warc-zst truncation threw at $n: " +
          s"${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    // and the decompress kernel with the same shard bytes (non-
    // continuous mode): total under mutation, null on garbage
    for (i <- shard.indices by 7) {
      val m = shard.clone(); m(i) = 0x5a.toByte
      graft.functions.Udfs.decompress(m, "zstd")
    }
  }

  test("png/gif decoders: total on corrupted VALID images") {
    val pal = Array.tabulate(48)(i => (i * 11).toByte)
    val idx = Array.tabulate(60)(i => (i % 16).toByte)
    val gif = graft.llm.MediaHeaders.gifEncode(10, 6, pal, idx)
    val px = Array.tabulate(10 * 6 * 3)(i => (i % 256).toByte)
    val png = graft.llm.MediaHeaders.pngEncode(10, 6, 2, px)
    check("corruptedDecode") {
      Prop.forAll(Gen.choose(0, gif.length - 1),
          Gen.choose(Byte.MinValue, Byte.MaxValue)) { (pos, v) =>
        val g = gif.clone(); g(pos) = v
        val p = png.clone(); p(pos % png.length) = v
        // decode either succeeds or precise-rejects — never throws
        graft.llm.MediaHeaders.gifStats(g)
        graft.llm.MediaHeaders.pngStats(p)
        true
      }
    }
  }
}
