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
