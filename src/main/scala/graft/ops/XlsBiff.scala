package graft.ops

/** Minimal legacy `.xls` (BIFF8 inside an OLE2/CFB container) reader —
  * enough for `parse-as-excel` to read real spreadsheets written by
  * Excel 97-2003 / POI without an Apache POI dependency (reference:
  * wrangler-core directives/parser/ParseExcel.java:100 reads both
  * formats via POI). Both formats are publicly specified: [MS-CFB] for
  * the compound container, [MS-XLS] for the BIFF8 record stream.
  *
  * Supported cell records: LABELSST (via the SST, including strings
  * split across CONTINUE records), LABEL, NUMBER, RK, MULRK, BOOLERR,
  * FORMULA with a cached numeric/boolean/string result (STRING record).
  * Legacy BIFF5-and-older workbooks raise a precise "convert to xlsx"
  * error instead of silently yielding zero rows.
  */
/** Excel number-format date detection + 1900-system serial rendering,
  * shared by the xlsx (styles.xml) and BIFF8 (FORMAT/XF) readers. The
  * reference surfaces date-formatted numeric cells as dates via POI
  * (reference: wrangler-core directives/parser/ParseExcel.java:166-170
  * — HSSFDateUtil.isCellDateFormatted + getDateCellValue); here the
  * same classification runs on the public format-id table ([MS-XLS]
  * 2.4.126 / ECMA-376 §18.8.30) and format-string grammar.
  */
private[graft] object ExcelDates {

  /** Stock date/time format ids. */
  private val builtinDate = Set(14, 15, 16, 17, 18, 19, 20, 21, 22,
    27, 28, 29, 30, 31, 32, 33, 34, 35, 36,
    45, 46, 47, 50, 51, 52, 53, 54, 55, 56, 57, 58)

  /** Is a CUSTOM format string a date format? Strip quoted literals,
    * backslash escapes, bracketed sections (color/locale codes — but
    * keep elapsed-duration [h]/[mm]/[ss] content), fractional-second
    * zeros, and everything past the first section; date iff any
    * y/m/d/h/s token survives and no general-number digit does.
    */
  def isDateFormatString(fmt: String): Boolean = {
    if (fmt == null || fmt.isEmpty) return false
    val sb = new StringBuilder
    var i = 0
    var inQuote = false
    while (i < fmt.length) {
      val ch = fmt.charAt(i)
      if (inQuote) { if (ch == '"') inQuote = false }
      else ch match {
        case '"' => inQuote = true
        case '\\' => i += 1
        case '[' =>
          val close = fmt.indexOf(']', i)
          val inner = if (close > 0) fmt.substring(i + 1, close) else ""
          if (inner.nonEmpty && inner.forall(c => "hmsHMS".indexOf(c.toInt) >= 0))
            sb ++= inner
          i = if (close > 0) close else fmt.length
        case ';' => i = fmt.length // first section decides
        case c => sb += c
      }
      i += 1
    }
    val s = sb.toString.replaceAll("\\.0+", "") // ss.000 fractional secs
    s.exists(c => "ymdhsYMDHS".indexOf(c.toInt) >= 0) &&
      !s.exists(c => c == '#' || c == '0' || c == '?')
  }

  /** Date-formatted? Custom FORMAT definitions take precedence over
    * the builtin table (a workbook may redefine low ids).
    */
  def isDateFormat(ifmt: Int, custom: Map[Int, String]): Boolean =
    custom.get(ifmt).map(isDateFormatString).getOrElse(builtinDate(ifmt))

  /** 1900-system serial → ISO-8601 text, with Excel's phantom
    * 1900-02-29 (serials ≥ 61 are one day ahead of reality). Whole-day
    * serials render as a date, fractional ones as date + time, and
    * pure time fractions (serial < 1) as time only — the same shapes
    * POI's java.util.Date stringification distinguishes.
    */
  def renderSerial(serial: Double): String = {
    // outside Excel's representable range (0 .. year-9999) the serial
    // is not a date no matter what the format says — surface the raw
    // number instead of throwing mid-parse
    if (serial.isNaN || serial < 0 || serial > 2958465.99999)
      return if (serial.isWhole && math.abs(serial) < 1e15)
        serial.toLong.toString else serial.toString
    var days0 = math.floor(serial).toLong
    var secs = math.round((serial - days0) * 86400d)
    if (secs >= 86400) { days0 += 1; secs -= 86400 }
    val hms = java.time.LocalTime.ofSecondOfDay(secs).format(
      java.time.format.DateTimeFormatter.ofPattern("HH:mm:ss"))
    if (days0 == 0) return hms
    // phantom 1900-02-29: serial 60 rolls over to Mar 1 (Jan-0 + 60
    // days in a non-leap year), colliding with 61 exactly like POI's
    // getJavaDate; only serials PAST the phantom day shift back one
    val days = if (days0 > 60) days0 - 1 else days0
    val date = java.time.LocalDate.of(1899, 12, 31).plusDays(days)
    if (secs == 0) date.toString else date.toString + " " + hms
  }
}

object XlsBiff {

  def isOle2(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 8 &&
      (bytes(0) & 0xff) == 0xD0 && (bytes(1) & 0xff) == 0xCF &&
      (bytes(2) & 0xff) == 0x11 && (bytes(3) & 0xff) == 0xE0 &&
      (bytes(4) & 0xff) == 0xA1 && (bytes(5) & 0xff) == 0xB1 &&
      (bytes(6) & 0xff) == 0x1A && (bytes(7) & 0xff) == 0xE1

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def i32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  private final val EndOfChain = -2 // 0xFFFFFFFE as a signed Int

  // ---- [MS-CFB] compound container ----------------------------------

  /** Extract a top-level stream by name ("Workbook" or "Book"). */
  private[ops] def cfbStream(bytes: Array[Byte],
      names: Set[String]): Option[Array[Byte]] = {
    val secSize = 1 << u16(bytes, 30)
    val numFat = i32(bytes, 44)
    val dirStart = i32(bytes, 48)
    val miniCutoff = i32(bytes, 56)
    val miniFatStart = i32(bytes, 60)
    val maxSectors = bytes.length / secSize + 16 // chain-loop guard
    def sector(id: Int): Array[Byte] = {
      val from = 512 + id.toLong * secSize
      if (from < 0 || from >= bytes.length) new Array[Byte](secSize)
      else java.util.Arrays.copyOfRange(bytes, from.toInt,
        math.min(bytes.length, from.toInt + secSize))
    }
    // FAT from the 109 DIFAT slots in the header (files < ~7 MB; a
    // minimal reader doesn't chase DIFAT chain sectors)
    val fat: Array[Int] = (0 until math.min(numFat, 109))
      .map(i => i32(bytes, 76 + 4 * i))
      .filter(_ >= 0)
      .flatMap { s => val b = sector(s); (0 until b.length / 4).map(i => i32(b, 4 * i)) }
      .toArray
    def readChain(start: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var s = start
      var n = 0
      while (s >= 0 && s < fat.length + 1 && n < maxSectors) {
        out.write(sector(s))
        s = if (s < fat.length) fat(s) else EndOfChain
        n += 1
      }
      out.toByteArray
    }
    val dir = readChain(dirStart)
    case class Ent(name: String, typ: Int, start: Int, size: Long)
    val ents = (0 until dir.length / 128).map { i =>
      val o = i * 128
      val nameLen = u16(dir, o + 64)
      val nm = if (nameLen >= 2)
        new String(dir, o, nameLen - 2, java.nio.charset.StandardCharsets.UTF_16LE)
      else ""
      Ent(nm, dir(o + 66) & 0xff, i32(dir, o + 116),
        i32(dir, o + 120).toLong & 0xFFFFFFFFL)
    }
    val stream = ents.find(e => e.typ == 2 && names(e.name))
    stream.map { e =>
      if (e.size >= miniCutoff) readChain(e.start).take(e.size.toInt)
      else {
        // mini stream: 64-byte sectors inside the root entry's chain,
        // chained through the miniFAT
        val root = ents.find(_.typ == 5)
          .getOrElse(throw new IllegalArgumentException("CFB: no root entry"))
        val container = readChain(root.start)
        val miniFat = readChain(miniFatStart)
        val out = new java.io.ByteArrayOutputStream()
        var s = e.start
        var n = 0
        while (s >= 0 && n < maxSectors * 8) {
          val from = s * 64
          out.write(java.util.Arrays.copyOfRange(container, from,
            math.min(container.length, from + 64)))
          s = if (4 * s + 3 < miniFat.length) i32(miniFat, 4 * s) else EndOfChain
          n += 1
        }
        out.toByteArray.take(e.size.toInt)
      }
    }
  }

  // ---- BIFF8 record stream -------------------------------------------

  /** Cursor over a run of record-data segments (an SST record plus its
    * CONTINUE records): reads little-endian scalars byte-wise so values
    * may split across segment boundaries; [[charBoundary]] tells a
    * string reader it just crossed into a CONTINUE mid-characters (a
    * fresh option-flags byte follows, per [MS-XLS] 2.5.293).
    */
  private final class SegCursor(segs: IndexedSeq[Array[Byte]]) {
    private var si = 0
    private var off = 0
    def hasMore: Boolean = {
      while (si < segs.length && off >= segs(si).length) { si += 1; off = 0 }
      si < segs.length
    }
    /** Character data resuming exactly at a CONTINUE-record start is
      * preceded by a fresh option-flags byte ([MS-XLS] 2.5.293); a
      * split elsewhere (mid-header, mid-rich-run) is raw bytes. */
    def atSegmentStart: Boolean = hasMore && off == 0 && si > 0
    def byte(): Int = {
      if (!hasMore) throw new IllegalArgumentException("BIFF: truncated string table")
      val v = segs(si)(off) & 0xff; off += 1; v
    }
    def u16v(): Int = byte() | (byte() << 8)
    def i32v(): Int = byte() | (byte() << 8) | (byte() << 16) | (byte() << 24)
    def skip(n: Int): Unit = { var i = 0; while (i < n) { byte(); i += 1 } }
  }

  /** XLUnicodeRichExtendedString ([MS-XLS] 2.5.293): 16-bit length,
    * option flags, optional rich/phonetic blocks, character data that
    * re-announces its width after every CONTINUE split.
    */
  private def readUnicodeString(c: SegCursor): String = {
    val cch = c.u16v()
    var grbit = c.byte()
    val fRich = (grbit & 0x08) != 0
    val fExt = (grbit & 0x04) != 0
    val cRun = if (fRich) c.u16v() else 0
    val cbExt = if (fExt) c.i32v() else 0
    val sb = new java.lang.StringBuilder(cch)
    var i = 0
    while (i < cch) {
      if (c.atSegmentStart) grbit = c.byte() // fresh flags byte after a split
      if ((grbit & 0x01) != 0) sb.append((c.byte() | (c.byte() << 8)).toChar)
      else sb.append((c.byte() & 0xff).toChar)
      i += 1
    }
    c.skip(4 * cRun + cbExt)
    sb.toString
  }

  private case class Rec(id: Int, data: Array[Byte], pos: Int, next: Int)

  private def records(wb: Array[Byte], from: Int): Iterator[Rec] =
    new Iterator[Rec] {
      private var pos = from
      def hasNext: Boolean = pos + 4 <= wb.length
      def next(): Rec = {
        val id = u16(wb, pos)
        val len = u16(wb, pos + 2)
        val d = java.util.Arrays.copyOfRange(wb, pos + 4,
          math.min(wb.length, pos + 4 + len))
        val r = Rec(id, d, pos, pos + 4 + len)
        pos = r.next
        r
      }
    }

  /** RK-encoded number ([MS-XLS] 2.5.217). */
  private def rkDouble(rk: Int): Double = {
    val div100 = (rk & 1) != 0
    val d =
      if ((rk & 2) != 0) (rk >> 2).toDouble
      else java.lang.Double.longBitsToDouble((rk & 0xFFFFFFFCL) << 32)
    if (div100) d / 100.0 else d
  }

  private def rkValue(rk: Int): String = {
    val div100 = (rk & 1) != 0
    val isInt = (rk & 2) != 0
    if (isInt && !div100) (rk >> 2).toString else renderNum(rkDouble(rk))
  }

  /** Match the xlsx path's raw-text rendering: integral doubles print
    * without the trailing ".0" (xlsx stores them as "42" in <v>). */
  private def renderNum(d: Double): String =
    if (d.isWhole && math.abs(d) < 1e15) d.toLong.toString else d.toString

  def parse(bytes: Array[Byte], sheet: String): Seq[Xlsx.XlRow] = {
    val wb = cfbStream(bytes, Set("Workbook", "Book")).getOrElse(return Seq.empty)
    if (wb.length < 8) return Seq.empty
    val bofId = u16(wb, 0)
    val vers = u16(wb, 4)
    if (bofId != 0x0809 || vers < 0x0600)
      // UnsupportedOperationException deliberately: corrupt-container
      // IllegalArgument/IndexOutOfBounds failures collapse to zero rows
      // in Xlsx.parse, but THIS error must reach the user
      throw new UnsupportedOperationException(
        "parse-as-excel: legacy BIFF5-or-older .xls is not supported — " +
          "save as .xlsx or Excel 97-2003 (BIFF8)")

    // ---- workbook globals: BOUNDSHEETs + SST + FORMAT/XF -------------
    var bounds = Vector.empty[(String, Int)] // (sheet name, stream offset)
    var sst = Vector.empty[String]
    var formats = Map.empty[Int, String] // custom FORMAT: ifmt → string
    var xfIfmts = Vector.empty[Int]      // XF index → ifmt
    val it = records(wb, 0)
    var done = false
    while (it.hasNext && !done) {
      val r = it.next()
      r.id match {
        case 0x041E if r.data.length >= 5 => // FORMAT: ifmt + XLUnicodeString
          val cch = u16(r.data, 2)
          val high = (r.data(4) & 0x01) != 0
          val s =
            if (high) new String(r.data, 5, math.min(cch * 2, r.data.length - 5),
              java.nio.charset.StandardCharsets.UTF_16LE)
            else new String(r.data, 5, math.min(cch, r.data.length - 5),
              java.nio.charset.StandardCharsets.ISO_8859_1)
          formats += u16(r.data, 0) -> s
        case 0x00E0 if r.data.length >= 4 => // XF: ifont, ifmt, …
          xfIfmts :+= u16(r.data, 2)
        case 0x0085 => // BOUNDSHEET: lbPlyPos(4) grbit(2) ShortXLUnicodeString
          val cch = r.data(6) & 0xff
          val high = (r.data(7) & 0x01) != 0
          val nm =
            if (high) new String(r.data, 8, cch * 2,
              java.nio.charset.StandardCharsets.UTF_16LE)
            else new String(r.data, 8, cch,
              java.nio.charset.StandardCharsets.ISO_8859_1)
          bounds :+= (nm, i32(r.data, 0))
        case 0x00FC => // SST (+ CONTINUEs): cstTotal(4) cstUnique(4) strings
          val segs = scala.collection.mutable.ArrayBuffer(r.data)
          var look = records(wb, r.next)
          var lookPos = r.next
          var more = true
          while (more && look.hasNext) {
            val n = look.next()
            if (n.id == 0x003C) { segs += n.data; lookPos = n.next }
            else more = false
            look = records(wb, lookPos)
          }
          val c = new SegCursor(segs.toIndexedSeq)
          c.i32v() // total refs
          val unique = c.i32v()
          var k = 0
          val out = Vector.newBuilder[String]
          while (k < unique && c.hasMore) { out += readUnicodeString(c); k += 1 }
          sst = out.result()
        case 0x000A => done = true // EOF of the globals substream
        case _ =>
      }
    }

    // ---- pick the sheet ----------------------------------------------
    val target: Option[Int] =
      if (sheet.forall(_.isDigit) && sheet.nonEmpty)
        bounds.lift(sheet.toInt).map(_._2)
      else bounds.find(_._1 == sheet).map(_._2)
          .orElse(bounds.headOption.map(_._2))
    val sheetPos = target.getOrElse(return Seq.empty)

    // ---- worksheet substream: cell records ---------------------------
    val cells = scala.collection.mutable.Map.empty[(Int, Int), String]
    def put(row: Int, colIdx: Int, v: String): Unit = cells((row, colIdx)) = v
    // date-formatted numeric cells surface as dates, like POI in the
    // reference (ParseExcel.java:166-170)
    def dateXf(ixfe: Int): Boolean = xfIfmts.lift(ixfe)
      .exists(ExcelDates.isDateFormat(_, formats))
    def numCell(ixfe: Int, d: Double): String =
      if (dateXf(ixfe)) ExcelDates.renderSerial(d) else renderNum(d)
    val sit = records(wb, sheetPos)
    var pendingString: Option[(Int, Int)] = None // FORMULA awaiting STRING
    var sdone = false
    var first = true
    while (sit.hasNext && !sdone) {
      val r = sit.next()
      if (first && r.id != 0x0809) return Seq.empty // not a substream
      first = false
      r.id match {
        case 0x00FD => // LABELSST
          put(u16(r.data, 0), u16(r.data, 2),
            sst.lift(i32(r.data, 6)).orNull)
        case 0x0203 => // NUMBER: ieee double
          val bits = (0 until 8).foldRight(0L)((i, acc) =>
            (acc << 8) | (r.data(6 + i) & 0xffL))
          put(u16(r.data, 0), u16(r.data, 2),
            numCell(u16(r.data, 4), java.lang.Double.longBitsToDouble(bits)))
        case 0x027E => // RK
          val rk = i32(r.data, 6)
          put(u16(r.data, 0), u16(r.data, 2),
            if (dateXf(u16(r.data, 4))) ExcelDates.renderSerial(rkDouble(rk))
            else rkValue(rk))
        case 0x00BD => // MULRK: row, colFirst, (ixfe+rk)*, colLast
          val row = u16(r.data, 0)
          val colFirst = u16(r.data, 2)
          val nCells = (r.data.length - 6) / 6
          var i = 0
          while (i < nCells) {
            val rk = i32(r.data, 4 + 6 * i + 2)
            put(row, colFirst + i,
              if (dateXf(u16(r.data, 4 + 6 * i))) ExcelDates.renderSerial(rkDouble(rk))
              else rkValue(rk))
            i += 1
          }
        case 0x0204 => // LABEL (inline BIFF8 string)
          val c = new SegCursor(IndexedSeq(
            java.util.Arrays.copyOfRange(r.data, 6, r.data.length)))
          put(u16(r.data, 0), u16(r.data, 2), readUnicodeString(c))
        case 0x0205 => // BOOLERR
          val isErr = (r.data(7) & 0xff) != 0
          val v = r.data(6) & 0xff
          put(u16(r.data, 0), u16(r.data, 2),
            if (isErr) null else if (v != 0) "true" else "false")
        case 0x0006 => // FORMULA: cached result
          val row = u16(r.data, 0); val colIdx = u16(r.data, 2)
          if (u16(r.data, 12) == 0xFFFF) (r.data(6) & 0xff) match {
            case 0 => pendingString = Some((row, colIdx)) // STRING follows
            case 1 => put(row, colIdx, if (r.data(8) != 0) "true" else "false")
            case 3 => put(row, colIdx, "")
            case _ => // error result → null cell
          } else {
            val bits = (0 until 8).foldRight(0L)((i, acc) =>
              (acc << 8) | (r.data(6 + i) & 0xffL))
            put(row, colIdx,
              numCell(u16(r.data, 4), java.lang.Double.longBitsToDouble(bits)))
          }
        case 0x0207 => // STRING: cached string result of the last FORMULA
          pendingString.foreach { case (row, colIdx) =>
            put(row, colIdx, readUnicodeString(new SegCursor(IndexedSeq(r.data))))
          }
          pendingString = None
        case 0x000A => sdone = true
        case _ =>
      }
    }

    // ---- assemble rows the way the xlsx path does: present rows in
    // order, idx = positional rank, cells padded to the row's max col --
    val byRow = cells.groupBy(_._1._1)
    byRow.keys.toSeq.sorted.zipWithIndex.map { case (row, rank) =>
      val cs = byRow(row)
      val maxCol = cs.keys.map(_._2).max
      val arr = new Array[String](maxCol + 1)
      cs.foreach { case ((_, col), v) => arr(col) = v }
      Xlsx.XlRow(rank, arr.toSeq)
    }
  }
}
