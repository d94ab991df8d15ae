package graft.llm

/** HTML → text extraction for web corpora — the step WET conversion /
  * trafilatura-class tools perform before any quality gate can run.
  * Deterministic single-pass state machine (no DOM, no external
  * parser): drops script/style/noscript/template subtrees, comments
  * and CDATA, turns block-level boundaries into newlines, strips all
  * other tags, decodes the standard entity set, and collapses
  * whitespace. Title is surfaced separately.
  *
  * Per-row kernel (JVM function, not a Catalyst HOF chain) following
  * the measured kernel-vs-HOF rule in PERF.md.
  */
object HtmlText {

  private val BlockTags: Set[String] = Set(
    "p", "div", "br", "li", "ul", "ol", "h1", "h2", "h3", "h4", "h5", "h6",
    "tr", "table", "thead", "tbody", "td", "th", "section", "article",
    "header", "footer", "blockquote", "pre", "hr", "dt", "dd", "dl",
    "figure", "figcaption", "nav", "aside", "main", "form")

  private val DropTags: Set[String] = Set(
    "script", "style", "noscript", "template", "svg", "head", "iframe")

  // Raw-text drop elements: per HTML5 a '/' before '>' on these is a
  // parse error the browser IGNORES — `<script />var x=1;</script>`
  // opens the element and the body is script, not text. The
  // self-closing exemption below applies only to the remaining drop
  // elements (svg is foreign content where '/>' genuinely closes;
  // head/iframe self-closing forms are treated the same way).
  private val RawTextDropTags: Set[String] = Set(
    "script", "style", "noscript", "template")

  private val Entities: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ", "ndash" -> "–",
    "mdash" -> "—", "hellip" -> "…", "copy" -> "©",
    "reg" -> "®", "trade" -> "™", "laquo" -> "«",
    "raquo" -> "»", "lsquo" -> "‘", "rsquo" -> "’",
    "ldquo" -> "“", "rdquo" -> "”")

  def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val name = s.substring(i + 1, semi)
          if (name.startsWith("#x") || name.startsWith("#X")) {
            scala.util.Try(Integer.parseInt(name.substring(2), 16)) match {
              case scala.util.Success(cp) if Character.isValidCodePoint(cp) =>
                sb.appendAll(Character.toChars(cp)); i = semi + 1
              case _ => sb.append(c); i += 1
            }
          } else if (name.startsWith("#")) {
            scala.util.Try(Integer.parseInt(name.substring(1))) match {
              case scala.util.Success(cp) if Character.isValidCodePoint(cp) =>
                sb.appendAll(Character.toChars(cp)); i = semi + 1
              case _ => sb.append(c); i += 1
            }
          } else Entities.get(name.toLowerCase) match {
            case Some(rep) => sb.append(rep); i = semi + 1
            case None      => sb.append(c); i += 1
          }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** (title, text): title from the first <title> element; text with
    * one line per block, whitespace collapsed, empty lines dropped.
    */
  def extract(html0: String): (String, String) = {
    if (html0 == null) return (null, null)
    val html = html0
    val text = new StringBuilder(html.length / 2)
    var title: String = null
    var titleBuf: StringBuilder = null
    var i = 0
    var dropDepth = 0
    var dropTag: String = null
    def tagNameAt(start: Int): (String, Boolean, Boolean, Int) =
      scanTag(html, start)
    while (i < html.length) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) html.length else e + 3
        } else if (html.startsWith("<![CDATA[", i)) {
          val e = html.indexOf("]]>", i + 9)
          i = if (e < 0) html.length else e + 3
        } else if (html.startsWith("<!", i) || html.startsWith("<?", i)) {
          val e = html.indexOf('>', i + 1)
          i = if (e < 0) html.length else e + 1
        } else {
          val (name, closing, selfClosing, next) = tagNameAt(i)
          i = next
          if (name == "title") {
            if (!closing && !selfClosing && title == null)
              titleBuf = new StringBuilder
            else if (closing && titleBuf != null) {
              title = collapseWs(decodeEntities(titleBuf.toString))
              titleBuf = null
            }
          } else if (DropTags(name)) {
            if (selfClosing && !RawTextDropTags(name)) {
              // no content, no close tag — nothing to drop or emit
            } else if (!closing) {
              if (dropDepth == 0) dropTag = name
              if (name == dropTag) dropDepth += 1
            } else if (name == dropTag && dropDepth > 0) {
              dropDepth -= 1
              if (dropDepth == 0) dropTag = null
            }
          } else if (BlockTags(name) && dropDepth == 0) {
            text.append('\n')
          }
        }
      } else {
        // title capture wins even inside <head> (a drop subtree —
        // that's where <title> lives)
        if (titleBuf != null) titleBuf.append(c)
        else if (dropDepth == 0) text.append(c)
        i += 1
      }
    }
    val lines = decodeEntities(text.toString)
      .split('\n')
      .iterator
      .map(collapseWs)
      .filter(_.nonEmpty)
      .mkString("\n")
    (title, lines)
  }

  private def collapseWs(s: String): String =
    s.replaceAll("[\\s\\u00a0]+", " ").trim

  /** (lowercased name, isClosing, isSelfClosing, index just past '>')
    * for the tag at `start`. Self-closing (`<iframe src="x"/>`,
    * inline `<svg/>` — common in crawled pages) must NOT open a drop
    * subtree: there is no matching close tag, so treating it as an
    * opener would silently discard the rest of the document's text.
    * The scan respects quoted attribute values and tracks whether the
    * position sits inside an UNQUOTED attribute value —
    * `<script src=https://cdn.x/>` ends with a '/' that belongs to
    * the value (HTML5 unquoted-value parsing), not a self-close
    * marker, and mistaking it for one would leak the script body into
    * the extracted text. The ONE shared scanner behind extract,
    * extractTables, extractMeta and extractJsonLd.
    */
  private[graft] def scanTag(html: String,
      start: Int): (String, Boolean, Boolean, Int) = {
    var j = start + 1
    val closing = j < html.length && html.charAt(j) == '/'
    if (closing) j += 1
    val nameStart = j
    while (j < html.length && (html.charAt(j).isLetterOrDigit ||
      html.charAt(j) == '-')) j += 1
    val name = html.substring(nameStart, j).toLowerCase
    var quote: Char = 0
    var afterEq = false  // seen '=', value not started yet
    var inUnq = false    // inside an unquoted attribute value
    while (j < html.length &&
      !(quote == 0 && html.charAt(j) == '>')) {
      val ch = html.charAt(j)
      if (quote == 0) {
        if (ch == '"' || ch == '\'') { quote = ch; afterEq = false; inUnq = false }
        else if (ch == '=') { afterEq = true; inUnq = false }
        else if (ch.isWhitespace) inUnq = false // afterEq survives spaces around '='
        else if (afterEq) { inUnq = true; afterEq = false }
      } else if (ch == quote) quote = 0
      j += 1
    }
    val selfClosing = !closing && j < html.length && !inUnq &&
      j - 1 > nameStart && html.charAt(j - 1) == '/'
    (name, closing, selfClosing, math.min(j + 1, html.length))
  }

  /** One table cell: 0-based table/row/column ordinals (colspan not
    * expanded — col is the cell's ORDINAL in its row), `is_header`
    * for <th>, text entity-decoded and whitespace-collapsed.
    */
  case class HtmlTableCell(table: Int, row: Int, col: Int,
      is_header: Boolean, text: String)

  /** All <table> cells in document order — relational data mining
    * from crawl HTML (the WikiTables shape). Implicit closes
    * (`<td>a<td>b`, unclosed rows) follow the HTML5 recovery: a new
    * td/th/tr/table flushes the open cell. Nested tables push a
    * context; their cells carry their OWN table ordinal. script/style
    * inside cells is dropped. Total — malformed markup yields the
    * cells recovered so far.
    */
  def extractTables(html: String): Seq[HtmlTableCell] = {
    if (html == null) return Seq.empty
    val out = Vector.newBuilder[HtmlTableCell]
    // context per open table: Array(tableIdx, rowIdx, colIdx)
    val stack = scala.collection.mutable.ArrayBuffer[Array[Int]]()
    var tableCount = -1
    var cellBuf: StringBuilder = null
    var cellHeader = false
    def flushCell(): Unit = {
      if (cellBuf != null && stack.nonEmpty) {
        val st = stack.last
        out += HtmlTableCell(st(0), math.max(st(1), 0), st(2), cellHeader,
          collapseWs(decodeEntities(cellBuf.toString)))
      }
      cellBuf = null
    }
    var i = 0
    val lower = html.toLowerCase
    while (i < html.length) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) html.length else e + 3
        } else if (html.startsWith("<!", i) || html.startsWith("<?", i)) {
          val e = html.indexOf('>', i + 1)
          i = if (e < 0) html.length else e + 1
        } else {
          val (name, closing, selfClosing, next) = scanTag(html, i)
          i = next
          name match {
            case "table" if !closing =>
              flushCell()
              tableCount += 1
              stack += Array(tableCount, -1, -1)
            case "table" =>
              flushCell()
              if (stack.nonEmpty) stack.remove(stack.length - 1)
            case "tr" if stack.nonEmpty =>
              flushCell()
              if (!closing) { val st = stack.last; st(1) += 1; st(2) = -1 }
            case "td" | "th" if stack.nonEmpty =>
              flushCell()
              if (!closing) {
                val st = stack.last
                if (st(1) < 0) st(1) = 0 // cell before any <tr>: row 0
                st(2) += 1
                cellBuf = new StringBuilder
                cellHeader = name == "th"
              }
            case "script" | "style" if !closing && !selfClosing =>
              // raw-text element: skip to its close tag wholesale
              val e = lower.indexOf(s"</$name", i)
              i = if (e < 0) html.length
                else math.min(html.length,
                  html.indexOf('>', e) match {
                    case -1 => html.length; case g => g + 1 })
            case _ =>
              // any other tag inside a cell is a soft separator
              if (cellBuf != null) cellBuf.append(' ')
          }
        }
      } else {
        if (cellBuf != null) cellBuf.append(c)
        i += 1
      }
    }
    flushCell() // truncated markup keeps the open cell
    out.result()
  }

  private def attrRe(name: String): scala.util.matching.Regex =
    ("(?is)(?<![\\w-])" + name +
      "\\s*=\\s*(?:\"([^\"]*)\"|'([^']*)'|([^\\s>]+))").r
  private val MetaKeyRes = Seq(attrRe("name"), attrRe("property"))
  private val ContentRe = attrRe("content")
  private val TypeRe = attrRe("type")

  private def attrOf(tag: String,
      re: scala.util.matching.Regex): Option[String] =
    re.findFirstMatchIn(tag).map { m =>
      Option(m.group(1)).orElse(Option(m.group(2))).getOrElse(m.group(3))
    }.filter(v => v != null && v.nonEmpty)

  /** `<meta name=…|property=…, content=…>` pairs in document order —
    * the page-metadata mining pass (og:title, description, robots,
    * article:published_time). Keys lowercased, values entity-decoded.
    */
  def extractMeta(html: String): Seq[(String, String)] = {
    if (html == null) return Seq.empty
    val out = Vector.newBuilder[(String, String)]
    var i = 0
    while (i < html.length) {
      val lt = html.indexOf('<', i)
      if (lt < 0) return out.result()
      val (name, closing, _, next) = scanTag(html, lt)
      if (name == "meta" && !closing) {
        val tag = html.substring(lt, next)
        val key = MetaKeyRes.view.flatMap(r => attrOf(tag, r)).headOption
        val value = attrOf(tag, ContentRe)
        (key, value) match {
          case (Some(k), Some(v)) =>
            out += k.toLowerCase(java.util.Locale.ROOT) ->
              decodeEntities(v)
          case _ => ()
        }
      }
      i = next
    }
    out.result()
  }

  /** Raw `<script type="application/ld+json">` block payloads in
    * document order (trimmed, NOT parsed — chain json-path on the
    * output). The schema.org structured-data channel news/product
    * pages publish.
    */
  def extractJsonLd(html: String): Seq[String] = {
    if (html == null) return Seq.empty
    val out = Vector.newBuilder[String]
    val lower = html.toLowerCase
    var i = 0
    while (i < html.length) {
      val lt = html.indexOf('<', i)
      if (lt < 0) return out.result()
      val (name, closing, selfClosing, next) = scanTag(html, lt)
      if (name == "script" && !closing && !selfClosing) {
        val tag = html.substring(lt, next)
        val isLd = attrOf(tag, TypeRe)
          .exists(_.equalsIgnoreCase("application/ld+json"))
        val e = lower.indexOf("</script", next)
        val end = if (e < 0) html.length else e
        if (isLd) {
          val payload = html.substring(next, end).trim
          if (payload.nonEmpty) out += payload
        }
        i = if (e < 0) html.length
          else (html.indexOf('>', e) match {
            case -1 => html.length; case g => g + 1 })
      } else i = next
    }
    out.result()
  }

  val extractTablesUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf((h: String) =>
      extractTables(h).map(t => (t.table, t.row, t.col, t.is_header, t.text)))

  val extractMetaUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf(extractMeta _)

  val extractJsonLdUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf(extractJsonLd _)

  /** All <a href> targets in document order (entity-decoded, quoted or
    * bare attribute values) — the crawl-frontier / link-graph input.
    */
  def extractLinks(html: String): Seq[String] = {
    if (html == null) return Seq.empty
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < html.length) {
      val lt = html.indexOf('<', i)
      if (lt < 0) return out.result()
      // only <a ...> opening tags (case-insensitive), not </a> or <abbr>
      val j = lt + 1
      if (j < html.length &&
          (html.charAt(j) == 'a' || html.charAt(j) == 'A') &&
          (j + 1 >= html.length || !html.charAt(j + 1).isLetterOrDigit)) {
        // scan the tag for href=..., respecting quotes
        var k = j + 1
        var quote: Char = 0
        var end = -1
        while (end < 0 && k < html.length) {
          val c = html.charAt(k)
          if (quote == 0 && c == '>') end = k
          else {
            if (quote == 0 && (c == '"' || c == '\'')) quote = c
            else if (c == quote) quote = 0
            k += 1
          }
        }
        if (end < 0) return out.result()
        val tag = html.substring(j + 1, end)
        val m = HrefRe.findFirstMatchIn(tag)
        m.foreach { mm =>
          val v = Option(mm.group(1)).orElse(Option(mm.group(2)))
            .getOrElse(mm.group(3))
          if (v != null && v.nonEmpty) out += decodeEntities(v)
        }
        i = end + 1
      } else i = lt + 1
    }
    out.result()
  }

  // (?<![\w-]) and not \b: "data-href" must not match (hyphen is a
  // non-word char, so \b alone would accept it)
  private val HrefRe =
    """(?is)(?<![\w-])href\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""".r

  val extractLinksUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf(extractLinks _)

  val extractUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf((h: String) => {
      val (t, x) = extract(h)
      if (t == null && x == null) null else Row2(t, x)
    })

  case class Row2(title: String, text: String)
}
