package graft.sources

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** RFC 5322 / MIME email decode (no JavaMail): mailing-list archives
  * and mailbox dumps are a classic text-corpus source, and they
  * arrive as mbox files of MIME messages. Scope is corpus text
  * mining: header unfolding, RFC 2047 encoded-word subjects,
  * multipart walk (mixed/alternative/related, nested), base64 and
  * quoted-printable transfer decoding, charset-aware text parts, and
  * attachment NAMES (payload bytes are exposed per part; decoding an
  * attachment's format is the downstream directive's job —
  * parse-as-pdf, parse-as-zip, …).
  *
  * Totality contract (the Warc/Tar/Zip/Pdf policy): never throws on
  * arbitrary bytes; a malformed message yields what was recovered
  * (possibly nothing).
  */
object Eml {

  /** One decoded MIME leaf part. `text` is non-null only for
    * text-typed parts (transfer-decoded, charset-decoded); `data`
    * always carries the transfer-decoded bytes.
    */
  case class EmlPart(content_type: String, filename: String,
      data: Array[Byte], text: String)

  /** Normalized message: RFC 2047-decoded headers, the first
    * text/plain body, the first text/html body, and attachment names.
    */
  case class EmlMessage(from: String, to: String, subject: String,
      date: String, text: String, html: String, n_parts: Int,
      attachments: Seq[String])

  // ---------------------------------------------------------------
  // headers
  // ---------------------------------------------------------------

  /** Unfold continuation lines (leading WSP joins to the previous
    * header) and split `Name: value` pairs; name matching is
    * case-insensitive downstream.
    */
  private[graft] def parseHeaders(header: String): Seq[(String, String)] = {
    val out = Seq.newBuilder[(String, String)]
    var name: String = null
    val value = new java.lang.StringBuilder
    def flush(): Unit = {
      if (name != null) out += name -> value.toString.trim
      name = null; value.setLength(0)
    }
    header.split("\r\n|\n", -1).foreach { line =>
      if (line.nonEmpty && (line(0) == ' ' || line(0) == '\t')) {
        if (name != null) { value.append(' '); value.append(line.trim) }
      } else {
        flush()
        val colon = line.indexOf(':')
        if (colon > 0) {
          name = line.substring(0, colon).trim
          value.append(line.substring(colon + 1).trim)
        }
      }
    }
    flush()
    out.result()
  }

  private def header(hs: Seq[(String, String)], n: String): String =
    hs.collectFirst {
      case (k, v) if k.equalsIgnoreCase(n) => v }.orNull

  /** Decode RFC 2047 encoded-words (`=?charset?B|Q?…?=`); linear
    * whitespace BETWEEN two encoded words is transparent (§6.2).
    * Unknown charsets or broken payloads keep the raw token.
    */
  private[graft] def decodeWord(s: String): String = {
    if (s == null) return null
    val re = java.util.regex.Pattern.compile(
      "=\\?([^?\\s]+)\\?([BbQq])\\?([^?\\s]*)\\?=")
    val m = re.matcher(s)
    val sb = new java.lang.StringBuilder
    var last = 0
    var prevEnd = -1
    while (m.find()) {
      val gap = s.substring(last, m.start())
      // pure-whitespace gaps BETWEEN encoded words are transparent
      if (!(prevEnd >= 0 && gap.trim.isEmpty)) sb.append(gap)
      val charset = m.group(1)
      val enc = m.group(2)
      val payload = m.group(3)
      val decoded: String =
        try {
          val bytes =
            if (enc == "B" || enc == "b")
              java.util.Base64.getDecoder.decode(payload)
            else qpDecode(payload.replace('_', ' ')
              .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1),
              header = true)
          new String(bytes, java.nio.charset.Charset.forName(charset))
        } catch { case scala.util.control.NonFatal(_) => null }
      if (decoded != null) sb.append(decoded)
      else sb.append(s, m.start(), m.end())
      last = m.end()
      prevEnd = m.end()
    }
    sb.append(s.substring(last))
    sb.toString
  }

  // ---------------------------------------------------------------
  // transfer encodings
  // ---------------------------------------------------------------

  /** Quoted-printable: `=XX` hex bytes, soft `=\n` line breaks.
    * `header=true` is the RFC 2047 Q variant (no soft breaks).
    * Malformed escapes pass through literally (robustness).
    */
  private[graft] def qpDecode(data: Array[Byte],
      header: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length)
    var i = 0
    while (i < data.length) {
      val c = data(i) & 0xff
      if (c == '=' && i + 1 < data.length) {
        val n1 = data(i + 1) & 0xff
        if (!header && (n1 == '\r' || n1 == '\n')) { // soft break
          i += (if (n1 == '\r' && i + 2 < data.length &&
            (data(i + 2) & 0xff) == '\n') 3 else 2)
        } else if (i + 2 < data.length) {
          val h = Character.digit(n1, 16)
          val l = Character.digit(data(i + 2) & 0xff, 16)
          if (h >= 0 && l >= 0) { out.write((h << 4) | l); i += 3 }
          else { out.write(c); i += 1 }
        } else { out.write(c); i += 1 }
      } else { out.write(c); i += 1 }
    }
    out.toByteArray
  }

  private def b64Decode(data: Array[Byte]): Array[Byte] =
    try java.util.Base64.getMimeDecoder.decode(data)
    catch { case _: IllegalArgumentException => Array.empty[Byte] }

  private def transferDecode(cte: String, data: Array[Byte]): Array[Byte] =
    Option(cte).map(_.trim.toLowerCase(java.util.Locale.ROOT)) match {
      case Some("base64") => b64Decode(data)
      case Some("quoted-printable") => qpDecode(data)
      case _ => data // 7bit / 8bit / binary / absent
    }

  // ---------------------------------------------------------------
  // content-type parameters
  // ---------------------------------------------------------------

  private def ctValue(ct: String): String =
    Option(ct).map(_.split(";")(0).trim.toLowerCase(java.util.Locale.ROOT))
      .filter(_.nonEmpty).getOrElse("text/plain")

  /** `name=value` parameter from a structured header, quote-aware. */
  private[graft] def ctParam(ct: String, param: String): String = {
    if (ct == null) return null
    val re = java.util.regex.Pattern.compile(
      "(?i)[;\\s]" + java.util.regex.Pattern.quote(param) +
        "\\s*=\\s*(\"([^\"]*)\"|[^;\\s]+)")
    val m = re.matcher(ct)
    if (m.find()) Option(m.group(2)).getOrElse(m.group(1)) else null
  }

  private def charsetOf(ct: String): java.nio.charset.Charset = {
    val cs = ctParam(ct, "charset")
    try java.nio.charset.Charset.forName(
      if (cs == null) "UTF-8" else cs)
    catch { case scala.util.control.NonFatal(_) =>
      java.nio.charset.StandardCharsets.UTF_8 }
  }

  // ---------------------------------------------------------------
  // MIME part walk
  // ---------------------------------------------------------------

  private def splitHeadBody(raw: String): (String, String) = {
    val lf = raw.indexOf("\n\n")
    val crlf = raw.indexOf("\r\n\r\n")
    if (crlf >= 0 && (lf < 0 || crlf < lf))
      (raw.substring(0, crlf), raw.substring(crlf + 4))
    else if (lf >= 0) (raw.substring(0, lf), raw.substring(lf + 2))
    else (raw, "")
  }

  /** Leaf parts of one entity, depth-capped. Multipart bodies split
    * on `--boundary` delimiter LINES (preamble and epilogue dropped);
    * everything else transfer-decodes to one leaf.
    */
  private def walkParts(hs: Seq[(String, String)], body: String,
      depth: Int): Seq[EmlPart] = {
    if (depth > 8) return Nil
    val ct = header(hs, "Content-Type")
    val mime = ctValue(ct)
    if (mime.startsWith("multipart/")) {
      val boundary = ctParam(ct, "boundary")
      if (boundary == null) return Nil
      val delim = "--" + boundary
      val lines = body.split("\r\n|\n", -1)
      val parts = Seq.newBuilder[String]
      val cur = new java.lang.StringBuilder
      var in = false
      var done = false
      lines.foreach { line =>
        if (!done && line.startsWith(delim)) {
          if (in) parts += cur.toString
          cur.setLength(0)
          if (line.startsWith(delim + "--")) done = true else in = true
        } else if (in && !done) {
          if (cur.length > 0) cur.append('\n')
          cur.append(line)
        }
      }
      if (in && !done && cur.length > 0) parts += cur.toString // truncated
      parts.result().flatMap { p =>
        val (h, b) = splitHeadBody(p)
        walkParts(parseHeaders(h), b, depth + 1)
      }
    } else {
      val cte = header(hs, "Content-Transfer-Encoding")
      val data = transferDecode(cte,
        body.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
      val text =
        if (mime.startsWith("text/"))
          new String(data, charsetOf(ct)).trim
        else null
      val fname = {
        val cd = header(hs, "Content-Disposition")
        Option(ctParam(cd, "filename"))
          .orElse(Option(ctParam(ct, "name"))).orNull
      }
      Seq(EmlPart(mime, fname, data, text))
    }
  }

  // ---------------------------------------------------------------
  // public surface
  // ---------------------------------------------------------------

  /** All leaf parts of a message (attachment payloads ride in
    * `data` — chain parse-as-pdf / parse-as-zip on them downstream).
    */
  def parts(raw: String): Seq[EmlPart] = {
    try {
      if (raw == null || raw.isEmpty) return Nil
      val (h, b) = splitHeadBody(raw)
      walkParts(parseHeaders(h), b, 0)
    } catch { case scala.util.control.NonFatal(_) => Nil }
  }

  /** Normalized message view (None when nothing parses). */
  def parse(raw: String): Option[EmlMessage] = {
    try {
      if (raw == null || raw.isEmpty) return None
      val (h, b) = splitHeadBody(raw)
      val hs = parseHeaders(h)
      if (hs.isEmpty) return None
      val ps = walkParts(hs, b, 0)
      Some(EmlMessage(
        decodeWord(header(hs, "From")),
        decodeWord(header(hs, "To")),
        decodeWord(header(hs, "Subject")),
        header(hs, "Date"),
        ps.collectFirst {
          case p if p.content_type == "text/plain" && p.text != null =>
            p.text }.orNull,
        ps.collectFirst {
          case p if p.content_type == "text/html" && p.text != null =>
            p.text }.orNull,
        ps.length,
        ps.flatMap(p => Option(p.filename))))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Split an mbox stream into raw messages: `From ` separator lines
    * (RFC 4155) start a message and are dropped; mboxrd `>From`
    * quoting is unstuffed inside bodies.
    */
  def splitMbox(raw: String): Seq[String] = {
    if (raw == null || raw.isEmpty) return Nil
    val out = Seq.newBuilder[String]
    val cur = new java.lang.StringBuilder
    var in = false
    raw.split("\r\n|\n", -1).foreach { line =>
      if (line.startsWith("From ")) {
        if (in && cur.length > 0) out += cur.toString
        cur.setLength(0); in = true
      } else if (in) {
        if (cur.length > 0) cur.append('\n')
        // mboxrd unstuffing: >From / >>From lose one '>'
        if (line.matches(">+From .*")) cur.append(line.substring(1))
        else cur.append(line)
      } // bytes before the first From_ line: not a message, dropped
    }
    if (in && cur.length > 0) out += cur.toString
    out.result()
  }

  /** Normalized-message kernel for `parse-as-eml` (null-safe). */
  val parseUdf: UserDefinedFunction = udf((s: String) =>
    parse(s).map(m => (m.from, m.to, m.subject, m.date, m.text, m.html,
      m.n_parts, m.attachments)).orNull)

  /** Leaf-part kernel: (content_type, filename, data, text) rows. */
  val partsUdf: UserDefinedFunction = udf((s: String) =>
    parts(s).map(p => (p.content_type, p.filename, p.data, p.text)))

  val splitMboxUdf: UserDefinedFunction = udf(splitMbox _)
}
