package graft.sources

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** PDF text extraction — pure byte-layout decode of the ISO 32000
  * object model (no PDFBox/iText): the document-corpus format the
  * crawl pipeline meets after HTML. Scope is TEXT MINING, not
  * rendering: objects, Flate/ASCIIHex/ASCII85 stream filters through
  * the JDK inflater, the page tree, and the BT/ET text operators
  * (Tj ' " TJ Td TD T* Tm) of each page's content streams.
  *
  * Robustness contract (the Warc/Tar/Zip totality policy): TOTAL on
  * arbitrary bytes. The parser walks the body sequentially and
  * re-syncs past damage instead of trusting the xref table — offsets
  * in crawled PDFs lie routinely; an object that fails to parse is
  * skipped to its `endobj`, a stream whose declared /Length disagrees
  * with the bytes falls back to scanning for `endstream`, and any
  * structural failure yields the pages recovered so far.
  *
  * Covered beyond the base walk: /Type /ObjStm compressed object
  * streams (modern writers park the page tree there) expand into
  * their member objects, PNG-predictored Flate streams reconstruct
  * through the row filters, and composite-font (Type0/CID) strings
  * decode through their /ToUnicode CMaps — the CJK path. Out of
  * scope (documented, not silently wrong): CID fonts WITHOUT a
  * /ToUnicode map (bytes fall back to the single-byte decode),
  * encrypted documents (detected via /Encrypt → empty), and the TIFF
  * predictor (Predictor 2 → skipped).
  */
object Pdf {

  /** One extracted page: 0-based index + the text of its content
    * streams in operator order.
    */
  case class PdfPage(page: Int, text: String)

  // ---------------------------------------------------------------
  // object model
  // ---------------------------------------------------------------

  sealed private[sources] trait PVal
  private[sources] case class PNum(v: Double) extends PVal {
    def int: Long = v.toLong
  }
  private[sources] case class PStr(bytes: Array[Byte]) extends PVal
  private[sources] case class PName(name: String) extends PVal
  private[sources] case class PArr(items: Vector[PVal]) extends PVal
  private[sources] case class PDict(m: Map[String, PVal]) extends PVal
  private[sources] case class PRef(num: Int) extends PVal
  private[sources] case class PBool(b: Boolean) extends PVal
  private[sources] case object PNullV extends PVal

  // ---------------------------------------------------------------
  // lexer (shared by the body parser and the content-stream
  // interpreter — PDF content streams use the same token syntax)
  // ---------------------------------------------------------------

  sealed private trait Tok
  private case class TNum(v: Double) extends Tok
  private case class TStr(bytes: Array[Byte]) extends Tok
  private case class TName(n: String) extends Tok
  private case class TKw(s: String) extends Tok
  private case object TDictOpen extends Tok
  private case object TDictClose extends Tok
  private case object TArrOpen extends Tok
  private case object TArrClose extends Tok
  private case object TEof extends Tok

  private def isWs(c: Int): Boolean =
    c == 0 || c == 9 || c == 10 || c == 12 || c == 13 || c == 32
  private def isDelim(c: Int): Boolean =
    c == '(' || c == ')' || c == '<' || c == '>' || c == '[' ||
      c == ']' || c == '{' || c == '}' || c == '/' || c == '%'

  private final class Lex(val b: Array[Byte]) {
    var pos = 0
    def eof: Boolean = pos >= b.length
    private def at(i: Int): Int = b(i) & 0xff

    def skipWs(): Unit = {
      var go = true
      while (go && pos < b.length) {
        val c = at(pos)
        if (isWs(c)) pos += 1
        else if (c == '%') { // comment to EOL (covers %PDF / %%EOF)
          while (pos < b.length && at(pos) != 10 && at(pos) != 13) pos += 1
        } else go = false
      }
    }

    /** After the `stream` keyword: a single CRLF or LF precedes the
      * data (ISO 32000 7.3.8.1).
      */
    def skipStreamEol(): Unit = {
      if (pos < b.length && at(pos) == 13) pos += 1
      if (pos < b.length && at(pos) == 10) pos += 1
    }

    def next(): Tok = {
      skipWs()
      if (eof) return TEof
      val c = at(pos)
      if (c == '<') {
        if (pos + 1 < b.length && at(pos + 1) == '<') { pos += 2; TDictOpen }
        else { pos += 1; TStr(hexString()) }
      } else if (c == '>') {
        if (pos + 1 < b.length && at(pos + 1) == '>') { pos += 2; TDictClose }
        else { pos += 1; TKw(">") } // stray — caller treats as noise
      } else if (c == '[') { pos += 1; TArrOpen }
      else if (c == ']') { pos += 1; TArrClose }
      else if (c == '(') { pos += 1; TStr(litString()) }
      else if (c == '/') { pos += 1; TName(nameBody()) }
      else if (c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9')) {
        TNum(number())
      } else if (c == '{' || c == '}') { pos += 1; TKw("{") } // type-4 fns
      else TKw(regular())
    }

    private def regular(): String = {
      val start = pos
      while (pos < b.length && !isWs(at(pos)) && !isDelim(at(pos))) pos += 1
      if (pos == start) { pos += 1; "?" } // lone delimiter byte: resync
      else new String(b, start, pos - start,
        java.nio.charset.StandardCharsets.ISO_8859_1)
    }

    private def nameBody(): String = {
      val sb = new java.lang.StringBuilder
      while (pos < b.length && !isWs(at(pos)) && !isDelim(at(pos))) {
        val c = at(pos)
        if (c == '#' && pos + 2 < b.length) { // #xx hex escape
          val h = Character.digit(at(pos + 1), 16)
          val l = Character.digit(at(pos + 2), 16)
          if (h >= 0 && l >= 0) { sb.append(((h << 4) | l).toChar); pos += 3 }
          else { sb.append(c.toChar); pos += 1 }
        } else { sb.append(c.toChar); pos += 1 }
      }
      sb.toString
    }

    private def number(): Double = {
      val start = pos
      if (at(pos) == '+' || at(pos) == '-') pos += 1
      while (pos < b.length &&
        ((at(pos) >= '0' && at(pos) <= '9') || at(pos) == '.')) pos += 1
      val s = new String(b, start, pos - start,
        java.nio.charset.StandardCharsets.ISO_8859_1)
      try s.toDouble catch { case _: NumberFormatException => 0.0 }
    }

    /** Literal string after `(`: balanced nesting, \-escapes, octal
      * codes, line continuations; raw EOLs normalize to LF
      * (ISO 32000 7.3.4.2).
      */
    private def litString(): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(32)
      var depth = 1
      while (depth > 0 && pos < b.length) {
        val c = at(pos); pos += 1
        if (c == '\\' && pos < b.length) {
          val e = at(pos); pos += 1
          e match {
            case 'n' => out.write(10)
            case 'r' => out.write(13)
            case 't' => out.write(9)
            case 'b' => out.write(8)
            case 'f' => out.write(12)
            case '(' => out.write('(')
            case ')' => out.write(')')
            case '\\' => out.write('\\')
            case 13 => if (pos < b.length && at(pos) == 10) pos += 1 // \CRLF
            case 10 => () // \LF line continuation
            case d if d >= '0' && d <= '7' =>
              var v = d - '0'
              var k = 0
              while (k < 2 && pos < b.length &&
                at(pos) >= '0' && at(pos) <= '7') {
                v = (v << 3) | (at(pos) - '0'); pos += 1; k += 1
              }
              out.write(v & 0xff)
            case other => out.write(other)
          }
        } else if (c == '(') { depth += 1; out.write('(') }
        else if (c == ')') { depth -= 1; if (depth > 0) out.write(')') }
        else if (c == 13) { // CR or CRLF → LF
          if (pos < b.length && at(pos) == 10) pos += 1
          out.write(10)
        } else out.write(c)
      }
      out.toByteArray
    }

    /** Hex string after `<`: pairs to `>`, whitespace skipped, odd
      * trailing digit padded with 0.
      */
    private def hexString(): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(32)
      var hi = -1
      var go = true
      while (go && pos < b.length) {
        val c = at(pos); pos += 1
        if (c == '>') go = false
        else {
          val d = Character.digit(c, 16)
          if (d >= 0) {
            if (hi < 0) hi = d
            else { out.write((hi << 4) | d); hi = -1 }
          } // non-hex, non-ws bytes are skipped (robustness)
        }
      }
      if (hi >= 0) out.write(hi << 4)
      out.toByteArray
    }
  }

  // ---------------------------------------------------------------
  // value parser
  // ---------------------------------------------------------------

  /** Parse one object value. `refs=true` recognizes `N G R` indirect
    * references (body syntax); content streams pass false.
    */
  private def parseValue(lx: Lex, first: Tok, refs: Boolean,
      depth: Int): PVal = {
    if (depth > 64) return PNullV // hostile nesting
    first match {
      case TNum(v) =>
        if (refs && v >= 0 && v == math.floor(v)) {
          // lookahead for `gen R`
          val save = lx.pos
          lx.next() match {
            case TNum(g) if g >= 0 && g == math.floor(g) =>
              lx.next() match {
                case TKw("R") => return PRef(v.toInt)
                case _ => lx.pos = save
              }
            case _ => lx.pos = save
          }
        }
        PNum(v)
      case TStr(s) => PStr(s)
      case TName(n) => PName(n)
      case TKw("true") => PBool(true)
      case TKw("false") => PBool(false)
      case TKw("null") => PNullV
      case TArrOpen =>
        val items = Vector.newBuilder[PVal]
        var go = true
        while (go) {
          lx.next() match {
            case TArrClose | TEof => go = false
            case t => items += parseValue(lx, t, refs, depth + 1)
          }
        }
        PArr(items.result())
      case TDictOpen =>
        val m = Map.newBuilder[String, PVal]
        var go = true
        while (go) {
          lx.next() match {
            case TDictClose | TEof => go = false
            case TName(k) =>
              val v = parseValue(lx, lx.next(), refs, depth + 1)
              m += k -> v
            case _ => () // stray token inside dict: skip
          }
        }
        PDict(m.result())
      case _ => PNullV
    }
  }

  // ---------------------------------------------------------------
  // document body walk
  // ---------------------------------------------------------------

  private[sources] case class PdfDoc(
      objs: Map[Int, (PVal, Option[Array[Byte]])], trailer: PDict)

  private val EndstreamBytes =
    "endstream".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
  private val EndobjBytes =
    "endobj".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)

  private def indexOf(b: Array[Byte], pat: Array[Byte], from: Int): Int = {
    var i = math.max(from, 0)
    val last = b.length - pat.length
    while (i <= last) {
      var j = 0
      while (j < pat.length && b(i + j) == pat(j)) j += 1
      if (j == pat.length) return i
      i += 1
    }
    -1
  }

  /** Expand `/Type /ObjStm` compressed object streams (ISO 32000
    * 7.5.7) into their member objects — modern writers park the
    * catalog, page tree and font dicts inside these, so without the
    * expansion a 2010s-era PDF parses to ZERO pages. Layout: /N pairs
    * of `objnum offset` integers, then the objects themselves
    * starting at /First. Directly-parsed objects win on collision
    * (an incremental update overrides its ObjStm original). One
    * level — ObjStm inside ObjStm is forbidden by the spec.
    */
  private def expandObjStm(doc: PdfDoc): PdfDoc = {
    val resolve = mkResolver(doc)
    val extra = Map.newBuilder[Int, (PVal, Option[Array[Byte]])]
    doc.objs.foreach {
      case (_, (d: PDict, Some(raw)))
        if d.m.get("Type").contains(PName("ObjStm")) =>
        decodeStream(d, raw, resolve).foreach { data =>
          try {
            val n = resolve(d.m.getOrElse("N", PNullV)) match {
              case PNum(v) => v.toInt
              case _ => 0
            }
            val first = resolve(d.m.getOrElse("First", PNullV)) match {
              case PNum(v) => v.toInt
              case _ => -1
            }
            if (n > 0 && n <= 100000 && first >= 0 &&
              first <= data.length) {
              val lx = new Lex(data)
              val pairs = (0 until n).flatMap { _ =>
                (lx.next(), lx.next()) match {
                  case (TNum(num), TNum(off))
                    if num >= 0 && off >= 0 => Some((num.toInt, off.toInt))
                  case _ => None
                }
              }
              pairs.foreach { case (num, off) =>
                if (first + off < data.length) {
                  val vlx = new Lex(data)
                  vlx.pos = first + off
                  try {
                    extra += num ->
                      (parseValue(vlx, vlx.next(), refs = true, 0), None)
                  } catch { case _: RuntimeException => () }
                }
              }
            }
          } catch { case _: RuntimeException => () }
        }
      case _ => ()
    }
    // direct objects win: ++ keeps the right-hand (direct) map's entry
    PdfDoc(extra.result() ++ doc.objs, doc.trailer)
  }

  /** Sequential body parse: `N G obj … endobj` records in file order,
    * xref tables / trailer / startxref skipped in place. The xref
    * OFFSETS are never trusted — crawled PDFs carry stale or
    * incremental-update tables; the byte walk is the ground truth.
    * A record that fails to parse is resynced past its `endobj`.
    */
  private[sources] def parseDoc(b: Array[Byte]): PdfDoc = {
    val objs = Map.newBuilder[Int, (PVal, Option[Array[Byte]])]
    var trailer: PDict = PDict(Map.empty)
    if (b == null) return PdfDoc(Map.empty, trailer)
    val lx = new Lex(b)
    var go = true
    var guard = 0
    while (go && guard < 1000000) {
      guard += 1
      val before = lx.pos
      try {
        lx.next() match {
          case TEof => go = false
          case TKw("xref") => () // subsection headers/entries lex as
          // int/int/keyword noise and fall through harmlessly
          case TKw("trailer") =>
            lx.next() match {
              case TDictOpen =>
                parseValue(lx, TDictOpen, refs = true, 0) match {
                  case d: PDict =>
                    // LAST trailer wins: incremental updates APPEND
                    // their trailer after the original one, and the
                    // final trailer names the newest /Root — matching
                    // the object map, where later (newer) versions of
                    // an object number also overwrite earlier ones
                    trailer = d
                  case _ => ()
                }
              case _ => ()
            }
          case TKw("startxref") => () // following int lexes as noise
          case TNum(n) if n >= 0 && n == math.floor(n) =>
            val save = lx.pos
            lx.next() match {
              case TNum(_) =>
                lx.next() match {
                  case TKw("obj") =>
                    val v = parseValue(lx, lx.next(), refs = true, 0)
                    var stream: Option[Array[Byte]] = None
                    lx.next() match {
                      case TKw("stream") =>
                        lx.skipStreamEol()
                        val dataStart = lx.pos
                        val declared = v match {
                          case d: PDict => d.m.get("Length") match {
                            case Some(PNum(l)) => l.toLong
                            case _ => -1L // indirect /Length: scan
                          }
                          case _ => -1L
                        }
                        // accept the declared length only when an
                        // endstream marker sits within EOL slack of
                        // it (bounded probe — a lying length must not
                        // trigger a file-wide scan twice)
                        val declaredOk = declared >= 0 &&
                          dataStart + declared + 4 +
                            EndstreamBytes.length <= b.length && {
                            val from = (dataStart + declared).toInt
                            (0 to 4).exists { s =>
                              var j = 0
                              while (j < EndstreamBytes.length &&
                                b(from + s + j) == EndstreamBytes(j)) j += 1
                              j == EndstreamBytes.length
                            }
                          }
                        val end =
                          if (declaredOk) (dataStart + declared).toInt
                          else {
                            // /Length indirect or lying: ground truth
                            // is the next endstream marker, trailing
                            // EOL trimmed
                            val e = indexOf(b, EndstreamBytes, dataStart)
                            if (e < 0) -1
                            else {
                              var t = e
                              if (t > dataStart && (b(t - 1) & 0xff) == 10)
                                t -= 1
                              if (t > dataStart && (b(t - 1) & 0xff) == 13)
                                t -= 1
                              t
                            }
                          }
                        if (end < 0) { go = false }
                        else {
                          stream = Some(
                            java.util.Arrays.copyOfRange(b, dataStart, end))
                          lx.pos = indexOf(b, EndstreamBytes, end) +
                            EndstreamBytes.length
                          lx.next() match {
                            case TKw("endobj") => ()
                            case _ => resync(lx)
                          }
                        }
                      case TKw("endobj") => ()
                      case _ =>
                        // malformed tail — an unterminated string or
                        // dict may have swallowed bytes up to EOF, so
                        // resync from the OBJECT HEADER: damage stays
                        // bounded to this one record
                        lx.pos = before; resync(lx)
                    }
                    if (go) objs += n.toInt -> (v, stream)
                  case _ => lx.pos = save // not an obj header: noise
                }
              case _ => lx.pos = save
            }
          case _ => () // noise token between records: keep walking
        }
      } catch {
        case _: RuntimeException => resync(lx)
      }
      if (lx.pos <= before && !lx.eof) lx.pos = before + 1 // forced progress
      if (lx.eof) go = false
    }
    PdfDoc(objs.result(), trailer)
  }

  private def resync(lx: Lex): Unit = {
    val e = indexOf(lx.b, EndobjBytes, lx.pos)
    lx.pos = if (e < 0) lx.b.length else e + EndobjBytes.length
  }

  // ---------------------------------------------------------------
  // stream filters
  // ---------------------------------------------------------------

  /** Apply the /Filter chain; None for filters text mining cannot use
    * (image codecs, predictored Flate, crypt). Budgeted inflate — a
    * Flate bomb stops at `maxBytes` (the Zip.entries policy).
    */
  private[sources] def decodeStream(dict: PDict, raw: Array[Byte],
      resolve: PVal => PVal, maxBytes: Int = 1 << 26): Option[Array[Byte]] = {
    val filters: Seq[String] = resolve(dict.m.getOrElse("Filter", PNullV)) match {
      case PName(n) => Seq(n)
      case PArr(items) => items.map(resolve).collect { case PName(n) => n }
      case _ => Nil
    }
    val parms: Seq[PVal] = resolve(dict.m.getOrElse("DecodeParms", PNullV)) match {
      case d: PDict => Seq(d)
      case PArr(items) => items.map(resolve)
      case _ => Seq.fill(filters.length)(PNullV)
    }
    var data = raw
    filters.zipAll(parms, "", PNullV).foreach { case (f, parm) =>
      if (data == null) return None
      f match {
        case "" => ()
        case "FlateDecode" | "Fl" =>
          data = inflate(data, maxBytes).orNull
          resolve(parm) match {
            case d: PDict =>
              def intOf(k: String, dflt: Int): Int =
                resolve(d.m.getOrElse(k, PNum(dflt))) match {
                  case PNum(v) => v.toInt
                  case _ => dflt
                }
              val predictor = intOf("Predictor", 1)
              if (predictor >= 10 && data != null)
                data = pngUnpredict(data, intOf("Columns", 1),
                  intOf("Colors", 1), intOf("BitsPerComponent", 8)).orNull
              else if (predictor == 2) return None // TIFF predictor: rare
            case _ => ()
          }
        case "ASCIIHexDecode" | "AHx" => data = asciiHex(data)
        case "ASCII85Decode" | "A85" => data = ascii85(data).orNull
        case _ => return None // DCTDecode/JPX/CCITT/LZW/Crypt: not text
      }
    }
    Option(data)
  }

  private def inflate(data: Array[Byte], maxBytes: Int): Option[Array[Byte]] = {
    def run(nowrap: Boolean): Option[Array[Byte]] = {
      val inf = new java.util.zip.Inflater(nowrap)
      try {
        inf.setInput(data)
        val out = new java.io.ByteArrayOutputStream(
          math.min(data.length * 4, 1 << 16))
        val buf = new Array[Byte](1 << 16)
        while (!inf.finished() && !inf.needsInput() && out.size <= maxBytes) {
          val n = inf.inflate(buf)
          if (n == 0 && !inf.finished()) return None
          out.write(buf, 0, n)
        }
        if (out.size > maxBytes) None else Some(out.toByteArray)
      } catch {
        case _: java.util.zip.DataFormatException => None
      } finally inf.end()
    }
    run(false).orElse(run(true)) // some writers emit raw deflate
  }

  /** Undo PNG row predictors (ISO 32000 7.4.4.4 delegates to the PNG
    * spec): each row is one filter byte + rowBytes; filters 0–4
    * (none/sub/up/average/paeth) reconstruct against the previous
    * row. Malformed geometry → None.
    */
  private def pngUnpredict(data: Array[Byte], columns: Int, colors: Int,
      bpc: Int): Option[Array[Byte]] = {
    if (columns <= 0 || colors <= 0 || bpc <= 0) return None
    val rowBytes = (columns.toLong * colors * bpc + 7) / 8
    if (rowBytes <= 0 || rowBytes > Int.MaxValue - 1) return None
    val stride = rowBytes.toInt + 1
    if (data.length % stride != 0) return None
    val bpp = math.max(1, colors * bpc / 8)
    val rows = data.length / stride
    val out = new Array[Byte](rows * rowBytes.toInt)
    var r = 0
    while (r < rows) {
      val filter = data(r * stride) & 0xff
      val src = r * stride + 1
      val dst = r * rowBytes.toInt
      val prev = dst - rowBytes.toInt
      var i = 0
      while (i < rowBytes) {
        val raw = data(src + i) & 0xff
        val left = if (i >= bpp) out(dst + i - bpp) & 0xff else 0
        val up = if (r > 0) out(prev + i) & 0xff else 0
        val ul = if (r > 0 && i >= bpp) out(prev + i - bpp) & 0xff else 0
        val rec = filter match {
          case 0 => raw
          case 1 => raw + left
          case 2 => raw + up
          case 3 => raw + (left + up) / 2
          case 4 =>
            val p = left + up - ul
            val pa = math.abs(p - left)
            val pb = math.abs(p - up)
            val pc = math.abs(p - ul)
            raw + (if (pa <= pb && pa <= pc) left
              else if (pb <= pc) up else ul)
          case _ => return None
        }
        out(dst + i) = (rec & 0xff).toByte
        i += 1
      }
      r += 1
    }
    Some(out)
  }

  private def asciiHex(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length / 2)
    var hi = -1
    var i = 0
    var go = true
    while (go && i < data.length) {
      val c = data(i) & 0xff
      if (c == '>') go = false
      else {
        val d = Character.digit(c, 16)
        if (d >= 0) {
          if (hi < 0) hi = d else { out.write((hi << 4) | d); hi = -1 }
        }
      }
      i += 1
    }
    if (hi >= 0) out.write(hi << 4)
    out.toByteArray
  }

  private def ascii85(data: Array[Byte]): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(data.length)
    var tuple = 0L
    var k = 0
    var i = 0
    var go = true
    while (go && i < data.length) {
      val c = data(i) & 0xff
      if (c == '~') go = false // ~> terminator
      else if (c == 'z' && k == 0) out.write(Array[Byte](0, 0, 0, 0))
      else if (c >= '!' && c <= 'u') {
        tuple = tuple * 85 + (c - '!')
        k += 1
        if (k == 5) {
          var j = 3
          while (j >= 0) { out.write(((tuple >> (8 * j)) & 0xff).toInt); j -= 1 }
          tuple = 0; k = 0
        }
      } else if (!isWs(c)) return None // hostile byte
      i += 1
    }
    if (k > 0) { // partial group: pad with 'u', emit k-1 bytes
      var kk = k
      while (kk < 5) { tuple = tuple * 85 + 84; kk += 1 }
      var j = 3
      while (j >= 4 - (k - 1)) {
        out.write(((tuple >> (8 * j)) & 0xff).toInt); j -= 1
      }
    }
    Some(out.toByteArray)
  }

  // ---------------------------------------------------------------
  // page tree
  // ---------------------------------------------------------------

  private def mkResolver(doc: PdfDoc): PVal => PVal = {
    def res(v: PVal, depth: Int): PVal = v match {
      case PRef(n) if depth < 32 =>
        doc.objs.get(n).map(o => res(o._1, depth + 1)).getOrElse(PNullV)
      case other => other
    }
    v => res(v, 0)
  }

  /** Page dictionaries in tree order (catalog → /Pages → /Kids);
    * fallback when the tree is damaged: every /Type /Page object in
    * record order.
    */
  private[sources] def pageDicts(doc: PdfDoc): Seq[(PDict, Int)] = {
    val resolve = mkResolver(doc)
    val out = Seq.newBuilder[(PDict, Int)]
    val visited = scala.collection.mutable.Set[Int]()
    def walk(v: PVal, depth: Int): Unit = {
      if (depth > 64) return
      v match {
        case PRef(n) =>
          if (visited.add(n))
            walk(doc.objs.get(n).map(_._1).getOrElse(PNullV), depth + 1)
        case d: PDict =>
          resolve(d.m.getOrElse("Type", PNullV)) match {
            case PName("Pages") =>
              resolve(d.m.getOrElse("Kids", PNullV)) match {
                case PArr(kids) => kids.foreach(walk(_, depth + 1))
                case _ => ()
              }
            case PName("Page") =>
              val n = v match { case PRef(r) => r; case _ => -1 }
              out += ((d, n))
            case _ => ()
          }
        case _ => ()
      }
    }
    val root = resolve(doc.trailer.m.getOrElse("Root", PNullV)) match {
      case d: PDict => Some(d)
      case _ =>
        doc.objs.values.map(_._1).collectFirst {
          case d: PDict if d.m.get("Type").contains(PName("Catalog")) => d
        }
    }
    root.foreach(c => walk(resolve(c.m.getOrElse("Pages", PNullV)), 0))
    // page refs inside walk() enter via PRef; a direct /Pages dict
    // holding direct Page dicts (non-standard) still lands above
    val viaTree = out.result()
    if (viaTree.nonEmpty) viaTree
    else doc.objs.toSeq.sortBy(_._1).collect {
      case (n, (d: PDict, _))
        if d.m.get("Type").contains(PName("Page")) => (d, n)
    }
  }

  // ---------------------------------------------------------------
  // content-stream text interpreter
  // ---------------------------------------------------------------

  /** String bytes → text: UTF-16BE when BOM-tagged (ISO 32000
    * 7.9.2.2), otherwise the single-byte identity (PDFDocEncoding's
    * printable range coincides with Latin-1; composite-font CID bytes
    * without /ToUnicode degrade here, documented).
    */
  private def strText(bytes: Array[Byte]): String = {
    if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xfe &&
      (bytes(1) & 0xff) == 0xff)
      new String(bytes, 2, bytes.length - 2,
        java.nio.charset.StandardCharsets.UTF_16BE)
    else new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
  }

  /** A parsed /ToUnicode CMap: source-code byte length + the
    * code→text map (bfchar entries and expanded bfranges).
    */
  private[graft] case class CMap(codeLen: Int, map: Map[Int, String])

  /** Parse a /ToUnicode CMap stream (ISO 32000 9.10.3 / Adobe CMap
    * syntax): `begincodespacerange` fixes the source byte length,
    * `beginbfchar` pairs map codes to UTF-16BE text, `beginbfrange`
    * triples map [lo,hi] to a base (incremented per code) or to an
    * explicit array. The CMap's own PostScript framing lexes with the
    * shared [[Lex]] — hex strings are already first-class tokens.
    */
  private[graft] def parseCMap(data: Array[Byte]): CMap = {
    val lx = new Lex(data)
    var codeLen = 0
    val map = Map.newBuilder[Int, String]
    def codeOf(b: Array[Byte]): Int = {
      var v = 0
      b.foreach(x => v = (v << 8) | (x & 0xff))
      v
    }
    def utf16(b: Array[Byte]): String =
      new String(b, java.nio.charset.StandardCharsets.UTF_16BE)
    var mode = 0 // 0 none, 1 codespace, 2 bfchar, 3 bfrange
    val args = scala.collection.mutable.ArrayBuffer[PVal]()
    var go = true
    var guard = 0
    while (go && guard < 1000000) {
      guard += 1
      val before = lx.pos
      lx.next() match {
        case TEof => go = false
        case TKw(kw) =>
          kw match {
            case "begincodespacerange" => mode = 1; args.clear()
            case "beginbfchar" => mode = 2; args.clear()
            case "beginbfrange" => mode = 3; args.clear()
            case "endcodespacerange" | "endbfchar" | "endbfrange" =>
              mode = 0; args.clear()
            case _ => ()
          }
        case TStr(s) if mode == 1 =>
          if (codeLen == 0) codeLen = s.length
        case t if mode == 2 =>
          args += parseValue(lx, t, refs = false, 0)
          if (args.length == 2) {
            (args(0), args(1)) match {
              case (PStr(src), PStr(dst)) =>
                map += codeOf(src) -> utf16(dst)
              case _ => ()
            }
            args.clear()
          }
        case t if mode == 3 =>
          args += parseValue(lx, t, refs = false, 0)
          if (args.length == 3) {
            (args(0), args(1), args(2)) match {
              case (PStr(lo), PStr(hi), PStr(dst)) =>
                val l = codeOf(lo); val h = codeOf(hi)
                if (h >= l && h - l <= 65535 && dst.nonEmpty) {
                  val base = utf16(dst)
                  var c = l
                  while (c <= h) {
                    val s =
                      if (base.isEmpty) ""
                      else base.init +
                        (base.last + (c - l)).toChar
                    map += c -> s
                    c += 1
                  }
                }
              case (PStr(lo), PStr(hi), PArr(items)) =>
                val l = codeOf(lo); val h = codeOf(hi)
                if (h >= l && h - l < items.length + 1) {
                  items.zipWithIndex.foreach {
                    case (PStr(dst), i) if l + i <= h =>
                      map += (l + i) -> utf16(dst)
                    case _ => ()
                  }
                }
              case _ => ()
            }
            args.clear()
          }
        case _ => ()
      }
      if (lx.pos <= before && !lx.eof) lx.pos = before + 1
    }
    CMap(if (codeLen == 0) 2 else codeLen, map.result())
  }

  /** CID string decode under a font's CMap: bytes group into
    * codeLen-byte codes, each mapped through the CMap (unmapped codes
    * drop — emitting raw CIDs would be garbage, and a document whose
    * CMap misses codes is degrading either way).
    */
  private def cidText(bytes: Array[Byte], cmap: CMap): String = {
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i + cmap.codeLen <= bytes.length) {
      var code = 0
      var j = 0
      while (j < cmap.codeLen) { code = (code << 8) | (bytes(i + j) & 0xff); j += 1 }
      cmap.map.get(code).foreach(sb.append)
      i += cmap.codeLen
    }
    sb.toString
  }

  /** Text of one page's concatenated content streams. Line structure
    * from the positioning operators: `T*`, TD, Tm, ET and Td with a
    * vertical move start a new line; Td with ty=0 is a horizontal
    * jump → space. TJ kern gaps ≤ −180/1000 em read as word spaces.
    * `fonts` maps resource font names (the `/F1` of `Tf`) to their
    * /ToUnicode CMaps: strings shown under a CMap-carrying font
    * decode as CID codes, everything else through [[strText]].
    */
  private[graft] def streamText(data: Array[Byte],
      fonts: Map[String, CMap] = Map.empty): String = {
    val sb = new java.lang.StringBuilder
    var pendingNl = false
    var pendingSp = false
    var curFont: String = null
    def decoded(s: Array[Byte]): String =
      (if (curFont == null) None else fonts.get(curFont)) match {
        case Some(cmap) => cidText(s, cmap)
        case None => strText(s)
      }
    def show(s: String): Unit = {
      if (s.isEmpty) return
      if (pendingNl && sb.length > 0) sb.append('\n')
      else if (pendingSp && sb.length > 0) sb.append(' ')
      pendingNl = false; pendingSp = false
      sb.append(s)
    }
    val lx = new Lex(data)
    val stack = scala.collection.mutable.ArrayBuffer[PVal]()
    var go = true
    var guard = 0
    while (go && guard < 10000000) {
      guard += 1
      val before = lx.pos
      lx.next() match {
        case TEof => go = false
        case TKw(op) =>
          op match {
            case "Tj" => stack.lastOption.collect { case PStr(s) =>
              show(decoded(s)) }
            case "'" =>
              pendingNl = true
              stack.lastOption.collect { case PStr(s) => show(decoded(s)) }
            case "\"" =>
              pendingNl = true
              stack.lastOption.collect { case PStr(s) => show(decoded(s)) }
            case "TJ" => stack.lastOption.collect { case PArr(items) =>
              items.foreach {
                case PStr(s) => show(decoded(s))
                case PNum(v) if v <= -180 => pendingSp = true
                case _ => ()
              }
            }
            case "Tf" =>
              stack.collectFirst { case PName(f) => f }
                .foreach(f => curFont = f)
            case "T*" => pendingNl = true
            case "TD" => pendingNl = true
            case "Tm" => pendingNl = true
            case "ET" => pendingNl = true
            case "Td" =>
              stack.lastOption match {
                case Some(PNum(ty)) if ty != 0 => pendingNl = true
                case _ => pendingSp = true
              }
            case _ => () // Tc/Tw/gs/re/… — no text effect
          }
          stack.clear()
        case t =>
          // operand: reuse the value parser (dicts/arrays appear as
          // BDC/TJ operands)
          stack += parseValue(lx, t, refs = false, 0)
      }
      if (lx.pos <= before && !lx.eof) lx.pos = before + 1
    }
    sb.toString
  }

  // ---------------------------------------------------------------
  // public surface
  // ---------------------------------------------------------------

  /** /Resources is an INHERITABLE page-tree attribute (ISO 32000
    * §7.7.3.4): shared fonts commonly live on the /Pages node, so a
    * page dict without its own /Resources must walk its /Parent
    * chain — otherwise /ToUnicode CMaps are lost and CID text
    * degrades to Latin-1 garbage. Bounded depth keeps hostile
    * Parent cycles total.
    */
  private def inheritedResources(page: PDict,
      resolve: PVal => PVal): PVal = {
    var cur: PDict = page
    var depth = 0
    while (depth < 64) {
      cur.m.get("Resources") match {
        case Some(r) => return r
        case None =>
          resolve(cur.m.getOrElse("Parent", PNullV)) match {
            case p: PDict => cur = p; depth += 1
            case _ => return PNullV
          }
      }
    }
    PNullV
  }

  /** Per-page text. Total on arbitrary bytes: garbage, encrypted
    * documents, and undecodable streams yield the pages recovered so
    * far (possibly none).
    */
  def extract(bytes: Array[Byte]): Seq[PdfPage] = {
    try {
      if (bytes == null || bytes.length < 8) return Nil
      val doc = expandObjStm(parseDoc(bytes))
      if (doc.trailer.m.contains("Encrypt")) return Nil
      val resolve = mkResolver(doc)
      pageDicts(doc).zipWithIndex.map { case ((page, _), idx) =>
        // /Contents refs must pair dict+stream from the OBJECT, so
        // walk refs at the object level rather than post-resolve
        val raw = (page.m.getOrElse("Contents", PNullV) match {
          case PArr(items) => items
          case v => Seq(v)
        }).flatMap {
          case PRef(n) => doc.objs.get(n)
          case _ => None
        }.flatMap {
          case (d: PDict, Some(s)) => decodeStream(d, s, resolve)
          case _ => None
        }
        val joined =
          if (raw.isEmpty) Array.empty[Byte]
          else raw.reduce((a, b) => a ++ Array[Byte](10) ++ b)
        // composite-font text: each resource font carrying /ToUnicode
        // gets its CMap, so CID strings decode to real characters
        val fonts: Map[String, CMap] =
          resolve(inheritedResources(page, resolve)) match {
            case rd: PDict => resolve(rd.m.getOrElse("Font", PNullV)) match {
              case fd: PDict => fd.m.flatMap { case (fname, fref) =>
                resolve(fref) match {
                  case f: PDict => f.m.get("ToUnicode") match {
                    case Some(PRef(n)) => doc.objs.get(n).flatMap {
                      case (d2: PDict, Some(rawS)) =>
                        decodeStream(d2, rawS, resolve)
                          .map(b => fname -> parseCMap(b))
                      case _ => None
                    }
                    case _ => None
                  }
                  case _ => None
                }
              }
              case _ => Map.empty[String, CMap]
            }
            case _ => Map.empty[String, CMap]
          }
        PdfPage(idx, streamText(joined, fonts))
      }
    } catch {
      case _: RuntimeException => Nil
      case _: StackOverflowError => Nil
    }
  }

  /** Document /Info title (None when absent/undecodable). */
  def title(bytes: Array[Byte]): Option[String] = {
    try {
      val doc = expandObjStm(parseDoc(bytes))
      val resolve = mkResolver(doc)
      resolve(doc.trailer.m.getOrElse("Info", PNullV)) match {
        case d: PDict => resolve(d.m.getOrElse("Title", PNullV)) match {
          case PStr(s) => Some(strText(s))
          case _ => None
        }
        case _ => None
      }
    } catch { case _: RuntimeException => None }
  }

  /** (page, text) rows per document — the `parse-as-pdf` kernel. */
  val pagesUdf: UserDefinedFunction = udf((b: Array[Byte]) =>
    extract(b).map(p => (p.page, p.text)))

  // ---------------------------------------------------------------
  // deterministic builder (fixtures/tests — the Tar.build/Zip.build
  // complement): catalog → pages tree → one Flate content stream per
  // page, a real xref table and trailer.
  // ---------------------------------------------------------------

  private def escapeLit(s: String): String =
    s.flatMap {
      case '(' => "\\("
      case ')' => "\\)"
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case c => c.toString
    }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(6)
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream(data.length)
    val buf = new Array[Byte](1 << 12)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Build a deterministic PDF: one content stream per page, each
    * page a Seq of text lines (`Td` first line, `T*` advances).
    * `compress` wraps content in FlateDecode; `lengthAsRef` writes
    * /Length as a forward indirect reference (both forms appear in
    * the wild and both must parse).
    */
  private[graft] def build(pages: Seq[Seq[String]], title: String = null,
      compress: Boolean = true, lengthAsRef: Boolean = false): Array[Byte] = {
    val latin1 = java.nio.charset.StandardCharsets.ISO_8859_1
    val out = new java.io.ByteArrayOutputStream(4096)
    val offsets = scala.collection.mutable.ArrayBuffer[Int]()
    def emit(s: String): Unit = out.write(s.getBytes(latin1))
    emit("%PDF-1.4\n%âãÏÓ\n")
    val n = pages.length
    // object numbering: 1 catalog, 2 pages, 3..2+n page, 3+n..2+2n
    // content, 3+2n font, (4+2n.. length objects), last info
    val fontObj = 3 + 2 * n
    val lenBase = fontObj + 1
    val infoObj = if (title != null) lenBase + (if (lengthAsRef) n else 0)
      else -1
    def beginObj(num: Int): Unit = {
      offsets += out.size
      emit(s"$num 0 obj\n")
    }
    beginObj(1)
    emit("<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    beginObj(2)
    emit(s"<< /Type /Pages /Kids [${
      (0 until n).map(i => s"${3 + i} 0 R").mkString(" ")
    }] /Count $n >>\nendobj\n")
    (0 until n).foreach { i =>
      beginObj(3 + i)
      emit(s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        s"/Resources << /Font << /F1 $fontObj 0 R >> >> " +
        s"/Contents ${3 + n + i} 0 R >>\nendobj\n")
    }
    val lengths = new Array[Int](n)
    (0 until n).foreach { i =>
      val body = new java.lang.StringBuilder("BT /F1 12 Tf 72 720 Td ")
      pages(i).zipWithIndex.foreach { case (line, j) =>
        if (j > 0) body.append("T* ")
        body.append(s"(${escapeLit(line)}) Tj ")
      }
      body.append("ET")
      val data0 = body.toString.getBytes(latin1)
      val data = if (compress) deflate(data0) else data0
      lengths(i) = data.length
      beginObj(3 + n + i)
      val lenPart =
        if (lengthAsRef) s"/Length ${lenBase + i} 0 R"
        else s"/Length ${data.length}"
      val filterPart = if (compress) " /Filter /FlateDecode" else ""
      emit(s"<< $lenPart$filterPart >>\nstream\n")
      out.write(data)
      emit("\nendstream\nendobj\n")
    }
    beginObj(fontObj)
    emit("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n")
    if (lengthAsRef) (0 until n).foreach { i =>
      beginObj(lenBase + i)
      emit(s"${lengths(i)}\nendobj\n")
    }
    if (title != null) {
      beginObj(infoObj)
      emit(s"<< /Title (${escapeLit(title)}) >>\nendobj\n")
    }
    val xrefPos = out.size
    val total = offsets.length + 1
    emit(s"xref\n0 $total\n0000000000 65535 f \n")
    offsets.foreach(o => emit(f"$o%010d 00000 n \n"))
    emit(s"trailer\n<< /Size $total /Root 1 0 R" +
      (if (title != null) s" /Info $infoObj 0 R" else "") +
      s" >>\nstartxref\n$xrefPos\n%%EOF\n")
    out.toByteArray
  }
}
