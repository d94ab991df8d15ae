package graft.sources

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** EPUB text extraction — the e-book corpus format (public-domain
  * book collections ship as EPUB): an OCF ZIP container whose
  * `META-INF/container.xml` names the OPF package file, whose
  * `<spine>` lists chapter ids in READING ORDER against the
  * `<manifest>` id→href table, each chapter an XHTML file. Chapter
  * text extraction reuses [[graft.llm.HtmlText.extract]] (title +
  * boilerplate-stripped text), the container walk reuses
  * [[Zip.entries]]. Total on garbage; a missing container falls back
  * to the first `.opf` member; chapters missing from the archive are
  * skipped.
  */
object Epub {

  /** One chapter: spine ordinal, `<title>` (nullable), extracted
    * text.
    */
  case class Chapter(chapter: Int, title: String, text: String)

  private def attrOf(xml: scala.xml.NodeSeq, attr: String): String =
    xml.headOption.map(_ \@ attr).filter(_.nonEmpty).orNull

  /** Resolve `href` against the OPF's directory (EPUB hrefs are
    * relative to the package file). Minimal %-decoding for the
    * space escape — the one that appears in real books.
    */
  private def resolve(opfDir: String, href: String): String = {
    val h = href.replace("%20", " ").takeWhile(_ != '#')
    val parts = scala.collection.mutable.ArrayBuffer[String]()
    (opfDir.split("/").filter(_.nonEmpty) ++ h.split("/")).foreach {
      case "." => ()
      case ".." => if (parts.nonEmpty) parts.remove(parts.length - 1)
      case p => parts += p
    }
    parts.mkString("/")
  }

  /** Chapters in spine order. */
  def extract(b: Array[Byte]): Seq[Chapter] = {
    try {
      val members = Zip.entries(b).map(e => e._1 -> e._3).toMap
      val opfPathOpt = members.get("META-INF/container.xml").flatMap { c =>
        try {
          val x = scala.xml.XML.loadString(
            new String(c, java.nio.charset.StandardCharsets.UTF_8))
          Option(attrOf(x \\ "rootfile", "full-path"))
        } catch { case scala.util.control.NonFatal(_) => None }
      }.orElse(members.keys.find(_.endsWith(".opf")))
      val opfOpt = opfPathOpt.flatMap(p => members.get(p).map(p -> _))
        .flatMap { case (path, bytes) =>
          try Some(path -> scala.xml.XML.loadString(new String(bytes,
            java.nio.charset.StandardCharsets.UTF_8)))
          catch { case scala.util.control.NonFatal(_) => None }
        }
      opfOpt match {
        case None => Seq.empty
        case Some((opfPath, opf)) =>
          val hrefs: Map[String, String] = (opf \\ "item").flatMap { it =>
            val id = it \@ "id"
            val href = it \@ "href"
            if (id.nonEmpty && href.nonEmpty) Some(id -> href) else None
          }.toMap
          val opfDir = {
            val slash = opfPath.lastIndexOf('/')
            if (slash < 0) "" else opfPath.substring(0, slash)
          }
          (opf \\ "itemref").flatMap(ir => hrefs.get(ir \@ "idref"))
            .map(h => resolve(opfDir, h))
            .flatMap(members.get)
            .zipWithIndex
            .map { case (bytes, i) =>
              val (title, text) = graft.llm.HtmlText.extract(
                new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
              Chapter(i, title, text)
            }
      }
    } catch { case scala.util.control.NonFatal(_) => Seq.empty }
  }

  val extractUdf: UserDefinedFunction = udf((b: Array[Byte]) =>
    extract(b).map(c => (c.chapter, c.title, c.text)))
}
