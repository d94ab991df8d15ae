package graft

import org.apache.spark.sql.Row
import graft.sources.{Docx, Zip}

/** Office Open XML (DOCX/PPTX) text extraction. */
class DocxSpec extends SparkSpec {

  private def docx(documentXml: String): Array[Byte] =
    Zip.build(Seq(
      ("[Content_Types].xml", "<Types/>".getBytes("UTF-8")),
      ("word/document.xml", documentXml.getBytes("UTF-8"))))

  test("docx: runs, entities, tabs, breaks, empty paragraphs") {
    val xml =
      """<?xml version="1.0"?>
        |<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"><w:body>
        |<w:p><w:r><w:t>Hello </w:t></w:r><w:r><w:t xml:space="preserve">world &amp; co</w:t></w:r></w:p>
        |<w:p w:rsidR="0"/>
        |<w:p><w:pPr><w:jc w:val="left"/></w:pPr><w:r><w:t>A</w:t><w:tab/><w:t>B</w:t><w:br/><w:t>C &#65;</w:t></w:r></w:p>
        |<w:p><w:r><w:t/></w:r></w:p>
        |</w:body></w:document>""".stripMargin
    assert(Docx.extractDocx(docx(xml)) == Seq(
      "Hello world & co", "", "A\tB\nC A", ""))
  }

  test("docx: pPr tab-stop definitions do not emit literal tabs (r14 advice)") {
    // <w:tabs><w:tab w:val=... w:pos=.../></w:tabs> inside <w:pPr>
    // are tab-STOP definitions, not tab characters — before the fix
    // the "<w:tab" scan matched both the <w:tabs> wrapper and each
    // definition, prepending 2+ spurious tabs per styled paragraph
    val xml =
      """<?xml version="1.0"?>
        |<w:document xmlns:w="x"><w:body>
        |<w:p><w:pPr><w:tabs><w:tab w:val="left" w:pos="720"/><w:tab w:val="right" w:pos="9360"/></w:tabs><w:jc w:val="left"/></w:pPr><w:r><w:t>A</w:t><w:tab/><w:t>B</w:t></w:r></w:p>
        |<w:p><w:pPr/><w:r><w:t>plain</w:t></w:r></w:p>
        |</w:body></w:document>""".stripMargin
    assert(Docx.extractDocx(docx(xml)) == Seq("A\tB", "plain"))
  }

  test("pptx: slides in numeric order, a:t runs") {
    def slide(ts: Seq[String]): Array[Byte] =
      ("<p:sld xmlns:a=\"x\"><p:txBody>" +
        ts.map(t => s"<a:p><a:r><a:t>$t</a:t></a:r></a:p>").mkString +
        "</p:txBody></p:sld>").getBytes("UTF-8")
    val pptx = Zip.build(Seq(
      ("ppt/slides/slide10.xml", slide(Seq("ten"))),
      ("ppt/slides/slide2.xml", slide(Seq("two a", "two b"))),
      ("ppt/slides/slide1.xml", slide(Seq("one"))),
      ("ppt/notesSlides/notesSlide1.xml", slide(Seq("notes skipped")))))
    assert(Docx.extractPptx(pptx) == Seq(
      (1, "one"), (2, "two a"), (2, "two b"), (10, "ten")))
  }

  test("totality: garbage, zip without the part, truncated xml") {
    assert(Docx.extractDocx(null).isEmpty)
    assert(Docx.extractDocx("not a zip".getBytes).isEmpty)
    assert(Docx.extractDocx(Zip.build(Seq(
      ("other.xml", "<w:p><w:t>x</w:t></w:p>".getBytes)))).isEmpty)
    // truncated document.xml: open paragraph's text survives
    assert(Docx.extractDocx(docx("<w:p><w:r><w:t>kept")) == Seq("kept"))
    assert(Docx.extractPptx("junk".getBytes).isEmpty)
  }

  test("epub: spine order beats zip order, opf-relative hrefs, totality") {
    import graft.sources.Epub
    def xhtml(title: String, body: String): Array[Byte] =
      (s"<html><head><title>$title</title></head>" +
        s"<body><p>$body</p></body></html>").getBytes("UTF-8")
    val container =
      ("""<?xml version="1.0"?><container>""" +
        """<rootfiles><rootfile full-path="OEBPS/content.opf"/>""" +
        "</rootfiles></container>").getBytes("UTF-8")
    val opf =
      ("""<package><manifest>""" +
        """<item id="c2" href="text/ch2.xhtml"/>""" +
        """<item id="c1" href="text/ch1.xhtml"/>""" +
        """<item id="css" href="style.css"/>""" +
        """</manifest><spine>""" +
        """<itemref idref="c1"/><itemref idref="c2"/>""" +
        """<itemref idref="missing"/></spine></package>""").getBytes("UTF-8")
    val epub = Zip.build(Seq(
      ("mimetype", "application/epub+zip".getBytes("UTF-8")),
      ("META-INF/container.xml", container),
      // zip order DELIBERATELY reversed vs spine order
      ("OEBPS/text/ch2.xhtml", xhtml("Two", "second chapter")),
      ("OEBPS/text/ch1.xhtml", xhtml("One", "first chapter")),
      ("OEBPS/content.opf", opf)))
    assert(Epub.extract(epub).map(c => (c.chapter, c.title, c.text)) ==
      Seq((0, "One", "first chapter"), (1, "Two", "second chapter")))
    // no container.xml: first .opf member is the fallback
    val noContainer = Zip.build(Seq(
      ("OEBPS/content.opf", opf),
      ("OEBPS/text/ch1.xhtml", xhtml("One", "x")),
      ("OEBPS/text/ch2.xhtml", xhtml("Two", "y"))))
    assert(Epub.extract(noContainer).map(_.title) == Seq("One", "Two"))
    assert(Epub.extract(null).isEmpty)
    assert(Epub.extract("not an epub".getBytes).isEmpty)
    assert(Epub.extract(Zip.build(Seq(("a.txt", "x".getBytes)))).isEmpty)
    // directive
    val in = df("id LONG, payload BINARY", Seq(Row(7L, epub)))
    val rows = wrangle("parse-as-epub :payload", in)
      .select("payload_chapter", "payload_title").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(rows == Seq((0, "One"), (1, "Two")))
  }

  test("odt: direct character data, spans flow through, tabs/breaks/entities") {
    import graft.sources.Docx
    val content =
      """<?xml version="1.0"?>
        |<office:document-content xmlns:text="x"><office:body><office:text>
        |<text:h text:outline-level="1">Heading &amp; more</text:h>
        |<text:p>Hello <text:span text:style-name="b">bold</text:span> world</text:p>
        |<text:p>A<text:tab/>B<text:line-break/>C<text:s/>D</text:p>
        |<text:p/>
        |<text:page-number>7</text:page-number>
        |</office:text></office:body></office:document-content>""".stripMargin
    val odt = Zip.build(Seq(
      ("mimetype", "application/vnd.oasis.opendocument.text".getBytes),
      ("content.xml", content.getBytes("UTF-8"))))
    assert(Docx.extractOdt(odt) == Seq(
      "Heading & more", "Hello bold world", "A\tB\nC D", ""))
    assert(Docx.extractOdt(null).isEmpty)
    assert(Docx.extractOdt("junk".getBytes).isEmpty)
    // router recognizes it
    assert(graft.sources.Extract.extractAny(odt) ==
      ("odt", "Heading & more\nHello bold world\nA\tB\nC D\n"))
    // directive
    val in = df("id LONG, payload BINARY", Seq(Row(1L, odt)))
    val rows = wrangle("parse-as-odt :payload", in)
      .select("payload_para", "payload_text").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(rows.take(2) == Seq((0, "Heading & more"), (1, "Hello bold world")))
  }

  test("extract-text router: magic-byte dispatch across six formats") {
    import graft.sources.{Extract, Pdf}
    val pdf = Pdf.build(Seq(Seq("pdf page one"), Seq("page two")))
    assert(Extract.extractAny(pdf) ==
      ("pdf", "pdf page one\n\npage two"))
    val dx = docx("<w:p><w:r><w:t>doc text</w:t></w:r></w:p>")
    assert(Extract.extractAny(dx) == ("docx", "doc text"))
    val pptx = Zip.build(Seq(("ppt/slides/slide1.xml",
      "<a:p><a:t>slide text</a:t></a:p>".getBytes("UTF-8"))))
    assert(Extract.extractAny(pptx) == ("pptx", "slide text"))
    val html = "<!DOCTYPE html><html><body><p>web text</p></body></html>"
    assert(Extract.extractAny(html.getBytes("UTF-8")) ==
      ("html", "web text"))
    assert(Extract.extractAny("plain prose\nsecond line".getBytes("UTF-8"))
      == ("text", "plain prose\nsecond line"))
    // plain zip: routed but not blindly concatenated
    val zip = Zip.build(Seq(("a.txt", "x".getBytes)))
    assert(Extract.extractAny(zip) == ("zip", null))
    // binary noise: unroutable, not silently-empty text
    assert(Extract.extractAny(
      Array[Byte](0, 1, 2, 3, -1, -2, -128, 40)) == ((null, null)))
    // gzip wrapper: inflate once and route the payload
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close(); bos.toByteArray
    }
    assert(Extract.extractAny(gz(pdf)) ==
      ("gz+pdf", "pdf page one\n\npage two"))
    assert(Extract.extractAny(gz("hello gz".getBytes("UTF-8"))) ==
      ("gz+text", "hello gz"))
    // double-gzip stops at one level: the inner gz is unroutable
    assert(Extract.extractAny(gz(gz("x".getBytes))) == ((null, null)))
    // Matroska: the S_TEXT track is the video's text
    import graft.llm.MediaHeaders.WebmBlockSpec
    val mkv = graft.llm.MediaHeaders.webmBuild(Seq((0L, Seq(
      WebmBlockSpec(1L, 0, keyframe = true, useGroup = false,
        Array[Byte](1, 2, 3)),
      WebmBlockSpec(2L, 0, keyframe = true, useGroup = true,
        "cue one".getBytes("UTF-8"), durationMs = 900L),
      WebmBlockSpec(2L, 1000, keyframe = true, useGroup = true,
        "cue two".getBytes("UTF-8"), durationMs = 900L)))),
      tracks = Seq((1L, "V_VP9"), (2L, "S_TEXT/UTF8")),
      docType = "matroska")
    assert(Extract.extractAny(mkv) == ("mkv", "cue one\ncue two"))
    // caption-less video: routed, no text
    val bareMkv = graft.llm.MediaHeaders.webmBuild(Seq((0L, Seq(
      WebmBlockSpec(1L, 0, keyframe = true, useGroup = false,
        Array[Byte](1, 2, 3))))))
    assert(Extract.extractAny(bareMkv) == (("mkv", null)))
    // bare subtitle files: cue text is the document text
    assert(Extract.extractAny(
      "1\n00:00:01,000 --> 00:00:02,000\nsub text\n".getBytes("UTF-8")) ==
      (("subtitles", "sub text")))
    assert(Extract.extractAny(
      "WEBVTT\n\n00:05.000 --> 00:07.000\nvtt text".getBytes("UTF-8")) ==
      (("subtitles", "vtt text")))
    // prose that merely CONTAINS an arrow stays text
    assert(Extract.extractAny(
      "see a --> b for the mapping".getBytes("UTF-8")) ==
      (("text", "see a --> b for the mapping")))
    // zstd / bzip2 wrappers (the modern crawl compressions)
    assert(Extract.extractAny(graft.functions.Udfs.compress(
      "zstd text".getBytes("UTF-8"), "zstd")) == (("zst+text", "zstd text")))
    assert(Extract.extractAny(graft.functions.Udfs.compress(
      pdf, "bzip2")) == (("bz2+pdf", "pdf page one\n\npage two")))
    // xz: valid payloads inflate one level (tukaani ships in Spark's
    // jars); undecodable xz stays named-textless
    assert(Extract.extractAny(graft.functions.Udfs.compress(
      "xz text".getBytes("UTF-8"), "xz")) == (("xz+text", "xz text")))
    assert(Extract.extractAny(Array[Byte](0xfd.toByte, '7', 'z', 'X', 'Z',
      0)) == (("xz", null)))
    // a compressed WARC shard names its wire form: record routing is
    // parse-as-warc's job (same contract as the zip leg)
    val warcBytes = ("WARC/1.0\r\nWARC-Type: conversion\r\n" +
      "Content-Length: 2\r\n\r\nhi\r\n\r\n").getBytes("UTF-8")
    assert(Extract.extractAny(graft.functions.Udfs.compress(
      warcBytes, "zstd")) == (("zst+warc", null)))
    // skippable-frame-led zstd (the warc-zstd dictionary layout)
    // routes through the same leg instead of falling to binary noise
    assert(Extract.extractAny(
      graft.sources.ZstdFrames.skippableFrame(Array[Byte](1, 2)) ++
        graft.functions.Udfs.compress(warcBytes, "zstd")) ==
      (("zst+warc", null)))
    // HTML whose head contains an HTML comment with ' --> ' (or the
    // literal '[Events]') must still route html, not raw markup-as-
    // text: the subtitle hint only claims documents with real cues
    val trickyHtml = "<!DOCTYPE html><!-- nav --> " +
      "<html><body><p>[Events] are listed here</p></body></html>"
    assert(Extract.extractAny(trickyHtml.getBytes("UTF-8")) ==
      (("html", "[Events] are listed here")))
    // audio containers route to segregation, not binary noise
    assert(Extract.extractAny(graft.llm.MediaHeaders.flacBuild(
      8000, 1, 16, 100L)) == (("flac", null)))
    assert(Extract.extractAny(graft.llm.MediaHeaders.oggBuild(
      "opus", 2, 48000, 48000L)) == (("ogg", null)))
    assert(Extract.extractAny(graft.llm.MediaHeaders.id3Build(
      "t", "a", "l")) == (("mp3", null)))
    assert(Extract.extractAny(Array[Byte]('7', 'z', 0xbc.toByte,
      0xaf.toByte, 0x27, 0x1c)) == (("7z", null)))
    assert(Extract.extractAny(
      "Rar!junk".getBytes("ISO-8859-1")) == (("rar", null)))
    // corrupt gzip header: unroutable
    assert(Extract.extractAny(
      Array[Byte](0x1f, 0x8b.toByte, 0, 0, 0)) == ((null, null)))
    assert(Extract.extractAny(null) == ((null, null)))
    // directive: format + text columns appended
    val in = df("id LONG, payload BINARY",
      Seq(Row(1L, pdf), Row(2L, dx), Row(3L, "just text".getBytes("UTF-8"))))
    val out = wrangle("extract-text :payload", in)
      .select("id", "payload_format").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "pdf", 2L -> "docx", 3L -> "text"))
  }

  test("directives: parse-as-docx / parse-as-pptx explode rows") {
    val xml = "<w:body><w:p><w:r><w:t>p0</w:t></w:r></w:p>" +
      "<w:p><w:r><w:t>p1</w:t></w:r></w:p></w:body>"
    val in = df("id LONG, payload BINARY", Seq(Row(1L, docx(xml))))
    val out = wrangle("parse-as-docx :payload", in)
      .select("payload_para", "payload_text").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(out == Seq((0, "p0"), (1, "p1")))
  }
}
