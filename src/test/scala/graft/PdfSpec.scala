package graft

import org.apache.spark.sql.Row
import graft.sources.Pdf

/** PDF text extraction: object walk, stream filters, page tree,
  * content-stream text operators, totality on garbage.
  */
class PdfSpec extends SparkSpec {

  test("build/extract round-trips multi-page text with escapes") {
    val pages = Seq(
      Seq("Hello world", "line two"),
      Seq("Parens (nested (deep)) and back\\slash", "tab\tok"),
      Seq("Third page"))
    val b = Pdf.build(pages, title = "My (Test) Doc")
    val out = Pdf.extract(b)
    assert(out.map(_.page) == Seq(0, 1, 2))
    assert(out.map(_.text) == pages.map(_.mkString("\n")))
    assert(Pdf.title(b).contains("My (Test) Doc"))
  }

  test("uncompressed and /Length-as-reference forms both parse") {
    val pages = Seq(Seq("alpha", "beta"))
    for (compress <- Seq(true, false); lref <- Seq(true, false)) {
      val b = Pdf.build(pages, compress = compress, lengthAsRef = lref)
      val out = Pdf.extract(b)
      assert(out.map(_.text) == Seq("alpha\nbeta"),
        s"compress=$compress lengthAsRef=$lref")
    }
  }

  test("content operators: TJ kerning, quote ops, Td space vs newline") {
    // hand-built content stream exercising the operator set beyond
    // what the builder emits
    val content = ("BT 72 720 Td (A) Tj " +
      "[(B) -250 (C) -10 (D)] TJ " + // -250 = word gap, -10 = kern only
      "(E) ' " + // next-line + show
      "1 2 (F) \" " + // aw ac string "
      "10 0 Td (G) Tj " + // horizontal move: space, not newline
      "0 -14 Td (H) Tj " + // vertical move: newline
      "ET").getBytes("ISO-8859-1")
    assert(Pdf.streamText(content) == "AB CD\nE\nF G\nH")
  }

  test("hex strings, UTF-16BE strings, octal escapes decode") {
    val content = "BT <48656C6C6F> Tj T* (\\101\\102) Tj ET".getBytes("ISO-8859-1")
    assert(Pdf.streamText(content) == "Hello\nAB")
    val utf16 = Array[Byte](0xfe.toByte, 0xff.toByte, 0x00, 0x41,
      0x20, 0xac.toByte) // "A€"
    val lit = new String(utf16.flatMap {
      case b if b == '('.toByte || b == ')'.toByte || b == '\\'.toByte =>
        Array('\\'.toByte, b)
      case b => Array(b)
    }, "ISO-8859-1")
    val c2 = s"BT ($lit) Tj ET".getBytes("ISO-8859-1")
    assert(Pdf.streamText(c2) == "A€")
  }

  test("ASCIIHex and ASCII85 filtered streams decode") {
    def page(filter: String, data: String): Array[Byte] =
      ("%PDF-1.4\n" +
        "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
        "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n" +
        "3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n" +
        s"4 0 obj\n<< /Length ${data.length} /Filter /$filter >>\n" +
        s"stream\n$data\nendstream\nendobj\n" +
        "trailer\n<< /Root 1 0 R >>\n%%EOF\n").getBytes("ISO-8859-1")
    val plain = "BT (Hi) Tj ET"
    val hex = plain.getBytes("ISO-8859-1")
      .map(b => f"${b & 0xff}%02X").mkString + ">"
    assert(Pdf.extract(page("ASCIIHexDecode", hex))
      .map(_.text) == Seq("Hi"))
    // ASCII85 of the same bytes
    val raw = plain.getBytes("ISO-8859-1")
    val sb = new StringBuilder
    var i = 0
    while (i < raw.length) {
      val n = math.min(4, raw.length - i)
      var tuple = 0L
      (0 until 4).foreach { j =>
        tuple = (tuple << 8) | (if (j < n) raw(i + j) & 0xffL else 0L) }
      val cs = new Array[Char](5)
      (4 to 0 by -1).foreach { j => cs(j) = ('!' + (tuple % 85)).toChar
        tuple /= 85 }
      sb.append(new String(cs, 0, if (n == 4) 5 else n + 1))
      i += 4
    }
    sb.append("~>")
    assert(Pdf.extract(page("ASCII85Decode", sb.toString))
      .map(_.text) == Seq("Hi"))
  }

  test("ObjStm: page tree inside a compressed object stream still yields pages") {
    // modern-writer shape: catalog/pages/page dicts live in an
    // ObjStm; only the content stream is a direct object
    def deflate(b: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(b); d.finish()
      val o = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      while (!d.finished()) o.write(buf, 0, d.deflate(buf))
      d.end(); o.toByteArray
    }
    val objs = Seq(
      "<< /Type /Catalog /Pages 2 0 R >>",
      "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>")
    val offsets = objs.scanLeft(0)(_ + _.length + 1).init
    val header = objs.indices.map(i => s"${i + 1} ${offsets(i)}")
      .mkString(" ") + " "
    val payload = (header + objs.mkString(" ") + " ").getBytes("ISO-8859-1")
    // header length must be /First; recompute after building
    val first = header.length
    val stmData = deflate(payload)
    val content = "BT (from objstm) Tj ET"
    val pdf = ("%PDF-1.5\n" +
      s"5 0 obj\n<< /Type /ObjStm /N 3 /First $first " +
      s"/Length ${stmData.length} /Filter /FlateDecode >>\nstream\n")
      .getBytes("ISO-8859-1") ++ stmData ++
      ("\nendstream\nendobj\n" +
        s"4 0 obj\n<< /Length ${content.length} >>\nstream\n$content\n" +
        "endstream\nendobj\n" +
        "trailer\n<< /Root 1 0 R >>\n%%EOF\n").getBytes("ISO-8859-1")
    assert(Pdf.extract(pdf).map(_.text) == Seq("from objstm"))
  }

  test("PNG-predictored Flate content streams reconstruct") {
    val content0 = "BT (predictored text) Tj ET".getBytes("ISO-8859-1")
    val cols = 16
    val padded = content0 ++ Array.fill[Byte](
      (cols - content0.length % cols) % cols)(' '.toByte)
    // encode with PNG filter 1 (sub): enc[i] = raw[i] - left
    val enc = new java.io.ByteArrayOutputStream()
    padded.grouped(cols).foreach { row =>
      enc.write(1)
      var left = 0
      row.foreach { b =>
        enc.write(((b & 0xff) - left) & 0xff)
        left = b & 0xff
      }
    }
    val d = new java.util.zip.Deflater()
    d.setInput(enc.toByteArray); d.finish()
    val o = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!d.finished()) o.write(buf, 0, d.deflate(buf))
    d.end()
    val stmData = o.toByteArray
    val pdf = ("%PDF-1.4\n" +
      "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
      "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n" +
      "3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n" +
      s"4 0 obj\n<< /Length ${stmData.length} /Filter /FlateDecode " +
      s"/DecodeParms << /Predictor 12 /Columns $cols >> >>\nstream\n")
      .getBytes("ISO-8859-1") ++ stmData ++
      ("\nendstream\nendobj\ntrailer\n<< /Root 1 0 R >>\n%%EOF\n")
        .getBytes("ISO-8859-1")
    assert(Pdf.extract(pdf).map(_.text) == Seq("predictored text"))
  }

  test("CID text: /ToUnicode CMap decodes composite-font hex strings") {
    // bfchar maps 0001→日 0002→本, bfrange 0010..0012 → A B C
    val cmap =
      """/CIDInit /ProcSet findresource begin
        |begincmap
        |1 begincodespacerange <0000> <FFFF> endcodespacerange
        |2 beginbfchar
        |<0001> <65E5>
        |<0002> <672C>
        |endbfchar
        |1 beginbfrange
        |<0010> <0012> <0041>
        |endbfrange
        |endcmap end end""".stripMargin
    val parsed = graft.sources.Pdf.parseCMap(cmap.getBytes("ISO-8859-1"))
    assert(parsed.codeLen == 2)
    assert(parsed.map(1) == "日" && parsed.map(2) == "本")
    assert(parsed.map(0x10) == "A" && parsed.map(0x12) == "C")
    // full document: a Type0 font whose Tf governs a CID hex string,
    // plus a plain-font line the CMap must NOT touch
    val content = "BT /F9 12 Tf 72 720 Td <00010002> Tj " +
      "T* /F1 12 Tf (plain) Tj ET"
    val pdf = ("%PDF-1.4\n" +
      "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
      "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n" +
      "3 0 obj\n<< /Type /Page /Parent 2 0 R " +
      "/Resources << /Font << /F9 5 0 R /F1 7 0 R >> >> " +
      "/Contents 4 0 R >>\nendobj\n" +
      s"4 0 obj\n<< /Length ${content.length} >>\nstream\n$content\n" +
      "endstream\nendobj\n" +
      "5 0 obj\n<< /Type /Font /Subtype /Type0 /ToUnicode 6 0 R >>\nendobj\n" +
      s"6 0 obj\n<< /Length ${cmap.length} >>\nstream\n$cmap\n" +
      "endstream\nendobj\n" +
      "7 0 obj\n<< /Type /Font /Subtype /Type1 >>\nendobj\n" +
      "trailer\n<< /Root 1 0 R >>\n%%EOF\n").getBytes("ISO-8859-1")
    assert(Pdf.extract(pdf).map(_.text) == Seq("日本\nplain"))
  }

  test("inherited /Resources: CMap found on the /Pages node (r14 advice)") {
    // ISO 32000 §7.7.3.4 makes /Resources inheritable — shared fonts
    // commonly live on the /Pages node; before the fix only the page
    // dict's own /Resources was consulted, so CID text degraded to
    // Latin-1 garbage for that common layout
    val cmap =
      """/CIDInit /ProcSet findresource begin
        |begincmap
        |1 begincodespacerange <0000> <FFFF> endcodespacerange
        |2 beginbfchar
        |<0001> <65E5>
        |<0002> <672C>
        |endbfchar
        |endcmap end end""".stripMargin
    val content = "BT /F9 12 Tf 72 720 Td <00010002> Tj ET"
    val pdf = ("%PDF-1.4\n" +
      "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
      // Resources on the PAGES node, not the page
      "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 " +
      "/Resources << /Font << /F9 5 0 R >> >> >>\nendobj\n" +
      "3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n" +
      s"4 0 obj\n<< /Length ${content.length} >>\nstream\n$content\n" +
      "endstream\nendobj\n" +
      "5 0 obj\n<< /Type /Font /Subtype /Type0 /ToUnicode 6 0 R >>\nendobj\n" +
      s"6 0 obj\n<< /Length ${cmap.length} >>\nstream\n$cmap\n" +
      "endstream\nendobj\n" +
      "trailer\n<< /Root 1 0 R >>\n%%EOF\n").getBytes("ISO-8859-1")
    assert(Pdf.extract(pdf).map(_.text) == Seq("日本"))
    // a page-local /Resources still wins over the inherited one
    val pdf2 = new String(pdf, "ISO-8859-1")
      .replace("/Type /Page /Parent 2 0 R",
        "/Type /Page /Parent 2 0 R /Resources << /Font << >> >>")
      .getBytes("ISO-8859-1")
    // own (empty) Resources → no CMap → raw CID bytes, not 日本
    assert(Pdf.extract(pdf2).map(_.text).forall(t => !t.contains("日本")))
  }

  test("damaged xref offsets are irrelevant; damaged object resyncs") {
    val good = Pdf.build(Seq(Seq("page one"), Seq("page two")))
    // corrupt every xref offset digit — the sequential walk must not care
    val s = new String(good, "ISO-8859-1")
    val xrefAt = s.lastIndexOf("xref")
    val corrupted = (s.substring(0, xrefAt) +
      s.substring(xrefAt).replaceAll("\\d{10}", "9999999999"))
      .getBytes("ISO-8859-1")
    assert(Pdf.extract(corrupted).map(_.text) ==
      Seq("page one", "page two"))
    // splice a garbage object between two good ones: resync keeps both
    val obj2 = s.indexOf("2 0 obj")
    val withGarbage = (s.substring(0, obj2) +
      "9 0 obj\n<< /Broken (unterminated\nendobj\n" +
      s.substring(obj2)).getBytes("ISO-8859-1")
    assert(Pdf.extract(withGarbage).map(_.text) ==
      Seq("page one", "page two"))
  }

  test("incremental update: appended object version and trailer win") {
    // builder layout for 1 page: 1 catalog, 2 pages, 3 page,
    // 4 content, 5 font — an incremental update appends a NEW
    // object 4 and a new trailer; both must override the originals
    val base = Pdf.build(Seq(Seq("old text")), compress = false)
    val newContent = "BT (new text) Tj ET"
    val update = (s"4 0 obj\n<< /Length ${newContent.length} >>\n" +
      s"stream\n$newContent\nendstream\nendobj\n" +
      "trailer\n<< /Root 1 0 R >>\nstartxref\n0\n%%EOF\n")
      .getBytes("ISO-8859-1")
    assert(Pdf.extract(base ++ update).map(_.text) == Seq("new text"))
  }

  test("total on garbage, truncation, and encrypted docs") {
    assert(Pdf.extract(null).isEmpty)
    assert(Pdf.extract(Array.empty[Byte]).isEmpty)
    assert(Pdf.extract("not a pdf at all".getBytes).isEmpty)
    val good = Pdf.build(Seq(Seq("one"), Seq("two")))
    // truncations at every length must never throw
    (0 until good.length by 7).foreach { n =>
      Pdf.extract(good.take(n)) // totality only
    }
    // an /Encrypt trailer entry suppresses extraction entirely
    val enc = new String(good, "ISO-8859-1")
      .replace("/Root 1 0 R", "/Root 1 0 R /Encrypt 9 0 R")
      .getBytes("ISO-8859-1")
    assert(Pdf.extract(enc).isEmpty)
  }

  test("parse-as-pdf directive: one row per page with provenance") {
    val rows = Seq(
      Row(1L, Pdf.build(Seq(Seq("d1 p0"), Seq("d1 p1")))),
      Row(2L, Pdf.build(Seq(Seq("d2 only")))),
      Row(3L, "garbage".getBytes("UTF-8")))
    val in = df("id LONG, payload BINARY", rows)
    val out = wrangle("parse-as-pdf :payload", in)
      .select("id", "payload_page", "payload_text").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq.sorted
    assert(out == Seq((1L, 0, "d1 p0"), (1L, 1, "d1 p1"),
      (2L, 0, "d2 only")))
  }

  test("fuzz: extract is total on arbitrary and PDF-prefixed bytes") {
    val rnd = new scala.util.Random(41)
    (0 until 300).foreach { _ =>
      val n = rnd.nextInt(400)
      val b = new Array[Byte](n)
      rnd.nextBytes(b)
      Pdf.extract(b) // must not throw
      Pdf.extract("%PDF-1.4\n".getBytes("ISO-8859-1") ++ b)
    }
    // structured fuzz: random mutations of a real document
    val good = Pdf.build(Seq(Seq("alpha", "beta"), Seq("gamma")))
    (0 until 300).foreach { _ =>
      val m = good.clone()
      (0 until 5).foreach { _ =>
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte }
      Pdf.extract(m) // must not throw
    }
  }
}
