package graft.sources

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Office Open XML text extraction — DOCX and PPTX are ZIP containers
  * (OPC, ECMA-376) whose text lives in well-known XML parts:
  * `word/document.xml` runs (`<w:t>`) grouped by paragraphs (`<w:p>`),
  * and `ppt/slides/slideN.xml` runs (`<a:t>`). Built on [[Zip]] (the
  * same budgeted JDK-inflater walk as parse-as-zip) plus a linear run
  * scanner — no POI. Enterprise corpora are full of both formats.
  *
  * Scope is text mining: runs, paragraph/line structure, tabs and
  * breaks. Styling, tables-as-structure (cells still yield their
  * text), embedded media, and headers/footers are out. Totality: a
  * malformed container or XML yields what was recovered.
  */
object Docx {

  /** XML entity decode for the five predefined entities + numeric
    * character references (the OOXML escape surface — reuses the HTML
    * decoder, whose named map is a superset).
    */
  private def decode(s: String): String =
    graft.llm.HtmlText.decodeEntities(s)

  /** Collect text runs from one OOXML part: `<pre:t>` content
    * accumulates, `<pre:tab/>` → TAB, `<pre:br/>`/`<pre:cr/>` → LF,
    * `</pre:p>` flushes a paragraph. Linear scan — OOXML is
    * machine-written, so tags are well-formed; a truncated part keeps
    * the paragraphs seen so far.
    */
  private def paragraphs(xml: String, pre: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val sb = new java.lang.StringBuilder
    val tOpen = s"<$pre:t"
    val tClose = s"</$pre:t>"
    val pClose = s"</$pre:p>"
    val tab = s"<$pre:tab"
    val pPrOpen = s"<$pre:pPr"
    val pPrClose = s"</$pre:pPr>"
    val br = s"<$pre:br"
    val cr = s"<$pre:cr"
    var i = 0
    while (i < xml.length) {
      val lt = xml.indexOf('<', i)
      if (lt < 0) i = xml.length
      else if (xml.startsWith(tOpen, lt) && lt + tOpen.length < xml.length &&
        (xml.charAt(lt + tOpen.length) == '>' ||
          xml.charAt(lt + tOpen.length) == ' ' ||
          xml.charAt(lt + tOpen.length) == '/')) {
        val gt = xml.indexOf('>', lt)
        if (gt < 0) i = xml.length
        else if (xml.charAt(gt - 1) == '/') i = gt + 1 // <w:t/> empty run
        else {
          val end = xml.indexOf(tClose, gt + 1)
          if (end < 0) { // truncated run: keep its tail text
            sb.append(decode(xml.substring(gt + 1)))
            i = xml.length
          } else {
            sb.append(decode(xml.substring(gt + 1, end)))
            i = end + tClose.length
          }
        }
      } else if (xml.startsWith(pClose, lt)) {
        out += sb.toString
        sb.setLength(0)
        i = lt + pClose.length
      } else if (xml.startsWith(s"<$pre:p", lt) &&
        lt + pre.length + 3 < xml.length &&
        !xml.charAt(lt + pre.length + 3).isLetter) {
        // a SELF-CLOSING <w:p/> (or <w:p attr/>) is an empty
        // paragraph — a blank line, flushed here since no close tag
        // will ever arrive ("<w:pPr" does not enter: 'P' is a letter)
        val gt = xml.indexOf('>', lt)
        if (gt < 0) i = xml.length
        else {
          if (xml.charAt(gt - 1) == '/') out += ""
          i = gt + 1
        }
      } else if (xml.startsWith(pPrOpen, lt) &&
        lt + pPrOpen.length < xml.length &&
        !xml.charAt(lt + pPrOpen.length).isLetter) {
        // <w:pPr> holds tab-STOP definitions (<w:tabs><w:tab .../>)
        // that the "<w:tab" run scan would misread as literal tabs —
        // skip the paragraph-properties block wholesale (real <w:tab/>
        // run content never lives there)
        val gt = xml.indexOf('>', lt)
        if (gt < 0) i = xml.length
        else if (xml.charAt(gt - 1) == '/') i = gt + 1 // <w:pPr/>
        else {
          val end = xml.indexOf(pPrClose, gt + 1)
          i = if (end < 0) xml.length else end + pPrClose.length
        }
      } else if (xml.startsWith(tab, lt)) { sb.append('\t'); i = lt + 1 }
      else if (xml.startsWith(br, lt) || xml.startsWith(cr, lt)) {
        sb.append('\n'); i = lt + 1
      } else i = lt + 1
    }
    // truncated part: keep the open paragraph's text
    if (sb.length > 0) out += sb.toString
    out.result()
  }

  /** Paragraph texts of a DOCX, in document order (empty paragraphs
    * kept — they are the document's blank lines).
    */
  def extractDocx(b: Array[Byte]): Seq[String] = {
    try {
      Zip.entries(b).collectFirst {
        case (name, _, data) if name == "word/document.xml" =>
          paragraphs(new String(data,
            java.nio.charset.StandardCharsets.UTF_8), "w")
      }.getOrElse(Seq.empty)
    } catch { case scala.util.control.NonFatal(_) => Seq.empty }
  }

  private val SlideRe =
    java.util.regex.Pattern.compile("^ppt/slides/slide(\\d+)\\.xml$")

  /** (slide ordinal, paragraph text) rows of a PPTX, slides in
    * numeric order (`slide10.xml` after `slide9.xml` — lexicographic
    * zip order would misplace it).
    */
  def extractPptx(b: Array[Byte]): Seq[(Int, String)] = {
    try {
      Zip.entries(b).flatMap { case (name, _, data) =>
        val m = SlideRe.matcher(name)
        if (m.matches())
          Some(m.group(1).toInt -> new String(data,
            java.nio.charset.StandardCharsets.UTF_8))
        else None
      }.sortBy(_._1).flatMap { case (slide, xml) =>
        paragraphs(xml, "a").map(slide -> _)
      }
    } catch { case scala.util.control.NonFatal(_) => Seq.empty }
  }

  /** Paragraph texts of an OpenDocument text file (ODT —
    * LibreOffice/OpenOffice): `content.xml` paragraphs (`<text:p>`,
    * `<text:h>` headings) whose CHARACTER DATA sits directly in the
    * element (unlike OOXML's run wrappers); `<text:span>` inline
    * content flows through, `<text:tab/>` → TAB, `<text:line-break/>`
    * → LF, `<text:s/>` → space.
    */
  def extractOdt(b: Array[Byte]): Seq[String] = {
    try {
      Zip.entries(b).collectFirst {
        case (name, _, data) if name == "content.xml" =>
          odtParagraphs(new String(data,
            java.nio.charset.StandardCharsets.UTF_8))
      }.getOrElse(Seq.empty)
    } catch { case scala.util.control.NonFatal(_) => Seq.empty }
  }

  private def odtParagraphs(xml: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val sb = new java.lang.StringBuilder
    var inP = false
    var i = 0
    while (i < xml.length) {
      val c = xml.charAt(i)
      if (c == '<') {
        val gt = xml.indexOf('>', i)
        if (gt < 0) i = xml.length
        else {
          val selfClosing = xml.charAt(gt - 1) == '/'
          if ((xml.startsWith("<text:p", i) &&
              !xml.charAt(i + 7).isLetter && xml.charAt(i + 7) != '-') ||
            (xml.startsWith("<text:h", i) &&
              !xml.charAt(i + 7).isLetter && xml.charAt(i + 7) != '-')) {
            if (inP) { out += sb.toString; sb.setLength(0) }
            inP = true
            if (selfClosing) { out += ""; inP = false } // empty paragraph
          } else if (xml.startsWith("</text:p", i) ||
            xml.startsWith("</text:h", i)) {
            if (inP) { out += sb.toString; sb.setLength(0) }
            inP = false
          } else if (inP && xml.startsWith("<text:tab", i)) sb.append('\t')
          else if (inP && xml.startsWith("<text:line-break", i))
            sb.append('\n')
          else if (inP && xml.startsWith("<text:s", i) &&
            (xml.charAt(i + 7) == '/' || xml.charAt(i + 7) == ' ' ||
              xml.charAt(i + 7) == '>')) sb.append(' ')
          i = gt + 1
        }
      } else {
        if (inP) {
          // collect to the next tag in one hop, entity-decoded
          val lt = xml.indexOf('<', i)
          val end = if (lt < 0) xml.length else lt
          sb.append(decode(xml.substring(i, end)))
          i = end
        } else i += 1
      }
    }
    if (inP && sb.length > 0) out += sb.toString // truncated tail
    out.result()
  }

  val docxUdf: UserDefinedFunction = udf((b: Array[Byte]) =>
    extractDocx(b).zipWithIndex.map { case (t, i) => (i, t) })

  val odtUdf: UserDefinedFunction = udf((b: Array[Byte]) =>
    extractOdt(b).zipWithIndex.map { case (t, i) => (i, t) })

  val pptxUdf: UserDefinedFunction = udf((b: Array[Byte]) => extractPptx(b))
}
