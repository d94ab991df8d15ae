package graft.ops

import graft.api._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Binary container formats implemented without their heavyweight
  * libraries: xlsx (a zip of xml — parsed with java.util.zip +
  * scala.xml), HL7 v2 (pipe-delimited segments), Avro object-container
  * files (avro-core ships with Spark).
  */
object BinaryFormats {

  def build(spec: DirectiveSpec): Option[PipeOp] = Option(spec.name match {

    // one output row per sheet row; first-row-as-header optional
    // (reference: wrangler-core directives/parser/ParseExcel.java:100 —
    // Apache POI there; xlsx = zip of XML here, no POI dependency)
    case "parse-as-excel" => new PipeOp {
      def name = spec.name
      def apply(st: PipeState, ctx: WrangleContext): PipeState = st.mapDf { df =>
        val c = spec.col(0)
        val sheet = spec.optStr(1).getOrElse("0")
        val header = spec.optBool(2, default = false)
        val rowsCol = Xlsx.parseUdf(col(c), lit(sheet))
        val exploded = df
          .withColumn("__xl", explode_outer(rowsCol))
          .withColumn("__xl_idx", col("__xl.idx"))
          .withColumn("__xl_cells", col("__xl.cells"))
        if (!header) {
          // fixed arity from a bounded probe
          val probe = exploded.limit(200)
            .select(max(size(col("__xl_cells")))).collect().headOption
          val n = math.max(1,
            probe.filterNot(_.isNullAt(0)).map(_.getInt(0)).getOrElse(1))
          (1 to n).foldLeft(exploded) { (d, i) =>
            d.withColumn(s"${c}_$i", element_at(col("__xl_cells"), i))
          }.drop("__xl", "__xl_idx", "__xl_cells")
        } else {
          val hdr = exploded.filter(col("__xl_idx") === 0)
            .select(col("__xl_cells")).limit(1).collect()
          val names =
            if (hdr.isEmpty) Array.empty[String]
            else hdr(0).getSeq[String](0).toArray.map(
              Option(_).getOrElse("col").trim.replace(" ", "_"))
          val noHdr = exploded.filter(col("__xl_idx") > 0)
          names.zipWithIndex.foldLeft(noHdr) { case (d, (nm, i)) =>
            d.withColumn(nm, element_at(col("__xl_cells"), i + 1))
          }.drop("__xl", "__xl_idx", "__xl_cells")
        }
      }
    }

    // HL7 v2: segments split on CR/LF, fields on '|', components on
    // '^', subcomponents on '&', field repeats on '~'. Two outputs:
    // `<col>_hl7` — flat SEG.field[.comp] map (quick lookups), and
    // `<col>_hl7_json` — the full-depth nested structure with repeated
    // segments as arrays, HAPI-equivalent (reference: wrangler-core
    // directives/parser/HL7Parser.java:111-245 — HAPI there; the v2
    // wire syntax itself is a public text format). Navigate the json
    // with json-path, e.g. `$.OBX[1]['5']`.
    // `parse-as-hl7 :col grouped` nests segments under their HAPI
    // message-structure group names (ORU_R01 PATIENT_RESULT /
    // ORDER_OBSERVATION / OBSERVATION, ADT PROCEDURE / INSURANCE);
    // default stays flat-by-segment like the reference's visitor.
    case "parse-as-hl7" => ColumnOps.simple(spec) { df =>
      val c = spec.col(0)
      val grouped = spec.optStr(1).exists(_.equalsIgnoreCase("grouped"))
      // ONE UDF invocation produces both outputs (single per-row
      // serialization round; the flat map and nested tree are built
      // from the same call)
      val both = if (grouped) Hl7.parseBothGroupedUdf else Hl7.parseBothUdf
      df.withColumn("__hl7b", both(col(c).cast(StringType)))
        .withColumn(s"${c}_hl7", col("__hl7b._1"))
        .withColumn(s"${c}_hl7_json", col("__hl7b._2"))
        .drop("__hl7b")
    }

    // protobuf decode. With a descriptor (a FileDescriptorSet, itself
    // protobuf wire format — parsed by the same decoder) fields come out
    // by NAME with nested messages and typed rendering, matching the
    // reference's registry-descriptor path (wrangler-core
    // directives/parser/ParseProtobuf.java:106 +
    // codec/ProtobufDecoderUsingDescriptor.java). Without one, the
    // dependency-free subset: tag/wire-type walk -> "field#" -> value.
    //   parse-as-protobuf :col                                 (wire walk)
    //   parse-as-protobuf :col <descriptor> <MessageName>      (named)
    // <descriptor> = path to a .desc file or base64 of its bytes.
    case "parse-as-protobuf" => ColumnOps.simple(spec) { df =>
      val c = spec.col(0)
      val descriptor: Option[Array[Byte]] = (spec.tokens.collectFirst {
        case TProps(p) if p.contains("descriptor") => p("descriptor")
      } orElse spec.optStr(1)).map { d =>
        if (d.endsWith(".desc") || new java.io.File(d).isFile)
          java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(d))
        else java.util.Base64.getDecoder.decode(d)
      }
      descriptor match {
        case Some(bytes) =>
          val msgName = spec.tokens.collectFirst {
            case TProps(p) if p.contains("message") => p("message")
          }.orElse(spec.optStr(2)).getOrElse(throw new RecipeException(
            "parse-as-protobuf: message name required with a descriptor"))
          val msgs = Protobuf.parseDescriptorSet(bytes)
          val root = Protobuf.resolveMessage(msgs, msgName).getOrElse(
            throw new RecipeException(
              s"parse-as-protobuf: message '$msgName' not in descriptor " +
                s"(has: ${msgs.keys.toSeq.sorted.mkString(", ")})"))
          df.withColumn(s"${c}_proto", Protobuf.namedUdf(msgs, root)(col(c)))
        case None =>
          df.withColumn(s"${c}_proto", Protobuf.parseUdf(col(c)))
      }
    }

    // byte[] column = an entire Avro container file; one row per record
    // (reference: wrangler-core directives/parser/ParseAvroFile.java:79)
    case "parse-as-avro-file" => new PipeOp {
      def name = spec.name
      def apply(st: PipeState, ctx: WrangleContext): PipeState = st.mapDf { df =>
        val c = spec.col(0)
        df.withColumn(c, explode_outer(AvroFile.parseUdf(col(c))))
      }
    }

    case _ => null
  })
}

/** In-memory xlsx reader: sharedStrings + sheet cell values. */
object Xlsx {
  import org.apache.spark.sql.expressions.UserDefinedFunction
  import org.apache.spark.sql.functions.udf

  case class XlRow(idx: Int, cells: Seq[String])

  private def entries(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    val zis = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val out = scala.collection.mutable.Map.empty[String, Array[Byte]]
    var e = zis.getNextEntry
    while (e != null) {
      if (!e.isDirectory) out(e.getName) = zis.readAllBytes()
      e = zis.getNextEntry
    }
    out.toMap
  }

  /** Column reference "BC12" → 0-based column index. */
  private def colIndex(ref: String): Int = {
    val letters = ref.takeWhile(_.isLetter)
    letters.foldLeft(0)((acc, ch) => acc * 26 + (ch - 'A' + 1)) - 1
  }

  def parse(bytes: Array[Byte], sheet0: String): Seq[XlRow] = {
    if (bytes == null) return Seq.empty
    // null sheet = the directive's default (first sheet) — a library
    // caller passing null must not NPE inside the name match
    val sheet = if (sheet0 == null) "0" else sheet0
    // legacy .xls (OLE2/BIFF8) takes its own reader; a corrupt
    // container degrades to zero rows like a corrupt xlsx, but the
    // precise legacy-BIFF5 error (UnsupportedOperation) must propagate
    if (XlsBiff.isOle2(bytes))
      return try XlsBiff.parse(bytes, sheet)
      catch {
        case e: UnsupportedOperationException => throw e
        case _: Exception => Seq.empty
      }
    try {
      val es = entries(bytes)
      val shared: IndexedSeq[String] =
        es.get("xl/sharedStrings.xml").map { b =>
          (scala.xml.XML.load(new java.io.ByteArrayInputStream(b)) \\ "si")
            .map(_.text).toIndexedSeq
        }.getOrElse(IndexedSeq.empty)
      // styles: cell style index → numFmtId, for date-cell detection
      // (same POI-parity rendering as the BIFF8 path — see ExcelDates)
      val (customFmts, xfIfmts): (Map[Int, String], IndexedSeq[Int]) =
        es.get("xl/styles.xml").map { b =>
          val st = scala.xml.XML.load(new java.io.ByteArrayInputStream(b))
          val custom = (st \\ "numFmt").flatMap { n =>
            (n \@ "numFmtId").toIntOption.map(_ -> (n \@ "formatCode"))
          }.toMap
          val xfs = (st \ "cellXfs" \ "xf").map(x =>
            (x \@ "numFmtId").toIntOption.getOrElse(0)).toIndexedSeq
          (custom, xfs)
        }.getOrElse((Map.empty, IndexedSeq.empty))
      def dateStyle(s: String): Boolean =
        s.toIntOption.flatMap(xfIfmts.lift)
          .exists(ExcelDates.isDateFormat(_, customFmts))
      val sheetPath =
        if (sheet.forall(_.isDigit))
          s"xl/worksheets/sheet${sheet.toInt + 1}.xml"
        else s"xl/worksheets/$sheet.xml"
      val sheetXml = es.getOrElse(sheetPath,
        es.getOrElse("xl/worksheets/sheet1.xml", return Seq.empty))
      val doc = scala.xml.XML.load(new java.io.ByteArrayInputStream(sheetXml))
      (doc \\ "row").zipWithIndex.map { case (row, ri) =>
        val cells = scala.collection.mutable.ArrayBuffer.empty[String]
        for (cell <- row \ "c") {
          val ci = (cell \@ "r") match {
            case "" => cells.size
            case ref => colIndex(ref)
          }
          while (cells.size <= ci) cells += null
          val v = (cell \ "v").text
          cells(ci) = (cell \@ "t") match {
            case "s" => shared.lift(v.trim.toInt).orNull
            case "inlineStr" => (cell \ "is").text
            case "" | "n" if v.nonEmpty && dateStyle(cell \@ "s") =>
              v.toDoubleOption.map(ExcelDates.renderSerial).getOrElse(v)
            case _ => if (v.isEmpty) null else v
          }
        }
        XlRow(ri, cells.toSeq)
      }
    } catch { case _: Exception => Seq.empty }
  }

  val parseUdf: UserDefinedFunction = udf(parse _)
}

/** Minimal HL7 v2 parser → Map("SEG.i" or "SEG.i.j" -> value). */
object Hl7 {
  import org.apache.spark.sql.expressions.UserDefinedFunction
  import org.apache.spark.sql.functions.udf

  /** Flat SEG.field[.comp] map — thin view over the shared core (ONE
    * parse implementation feeds both output shapes; no drift). NOTE:
    * flat MSH numbering counts pipe-separated values positionally
    * (MSH.1 = sending app), one off from the standard's MSH-1 = the
    * field separator itself — the NESTED json follows the standard
    * ("1" = "|", "9" = message type). Kept as shipped: recipes in the
    * battery rely on the positional flat form. */
  def parse(msg: String): Map[String, String] =
    parseInto(msg, wantFlat = true, wantNested = false)._1

  val parseUdf: UserDefinedFunction = udf(parse _)

  // ---- nested structure (HAPI-equivalent depth) --------------------

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Standard HL7 v2 escape sequences (MSH-2 defaults), decoded by
    * HAPI's delimiter-pairing rule: a backslash OPENS a sequence whose
    * body runs to the NEXT backslash; known bodies decode, unknown
    * bodies (z-escapes `\Zfoo\`, hex `\Xdd\`) are kept verbatim
    * INCLUDING both delimiters, and the scan resumes AFTER the closing
    * one — so neither a decoded `\E\` nor an unknown sequence's closing
    * backslash can seed a phantom match (sequential String.replace got
    * `\E\F\E\` wrong; a 1-char-advance scan got `\Zfoo\F\` wrong).
    * An unpaired trailing backslash passes through verbatim.
    */
  private def unescape(s: String): String = {
    if (s.indexOf('\\') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c != '\\') { sb.append(c); i += 1 }
      else {
        val close = s.indexOf('\\', i + 1)
        if (close < 0) { sb.append(s, i, s.length); i = s.length }
        else {
          s.substring(i + 1, close) match {
            case "F" => sb.append('|')
            case "S" => sb.append('^')
            case "T" => sb.append('&')
            case "R" => sb.append('~')
            case "E" => sb.append('\\')
            case _   => sb.append(s, i, close + 1) // unknown: verbatim
          }
          i = close + 1
        }
      }
    }
    sb.toString
  }

  private def subNode(comp: String): com.fasterxml.jackson.databind.JsonNode = {
    val subs = comp.split("&", -1)
    if (subs.length == 1) mapper.getNodeFactory.textNode(unescape(comp))
    else {
      val o = mapper.createObjectNode()
      subs.iterator.zipWithIndex.foreach { case (s, j) =>
        if (s.nonEmpty) o.put((j + 1).toString, unescape(s))
      }
      o
    }
  }

  private def repNode(rep: String): com.fasterxml.jackson.databind.JsonNode = {
    val comps = rep.split("\\^", -1)
    if (comps.length == 1) subNode(rep)
    else {
      val o = mapper.createObjectNode()
      comps.iterator.zipWithIndex.foreach { case (c, j) =>
        if (c.nonEmpty) o.set[com.fasterxml.jackson.databind.JsonNode](
          (j + 1).toString, subNode(c))
      }
      o
    }
  }

  private def fieldNode(f: String): com.fasterxml.jackson.databind.JsonNode = {
    val reps = f.split("~", -1)
    if (reps.length == 1) repNode(f)
    else {
      val a = mapper.createArrayNode()
      reps.foreach(r => a.add(repNode(r)))
      a
    }
  }

  /** Full-depth HL7 v2 message structure as JSON, matching the
    * reference's HAPI visitor output shape (HL7Parser.java:111-245):
    * `{SEG: {field: value | {component: value | {subcomponent: value}}}}`,
    * a REPEATED segment becoming an array of segment objects and a
    * repeated field (`~`) an array of values. Differences from the
    * reference, both deliberate: the 3rd+ repeat of a segment is kept
    * (HL7Parser.java:208-216 silently drops repeats once the JsonArray
    * exists — a bug, not a semantic), and MSH numbering follows the
    * standard (MSH.1 = field separator, MSH.2 = encoding characters,
    * MSH.9 = message type) as HAPI reports it. Standard escape
    * sequences (\F\ \S\ \T\ \R\ \E\) are decoded at the leaves.
    * Navigate the result with json-path: `$.OBX[1]['5']`.
    */
  def parseNested(msg: String): String =
    parseInto(msg, wantFlat = false, wantNested = true)._2

  val parseNestedUdf: UserDefinedFunction = udf(parseNested _)

  /** THE parse implementation: one segment/field split feeds both the
    * flat `SEG.field[.comp]` map (raw values, repeat-suffixed segment
    * names) and the full-depth nested JSON (repeated segments as
    * arrays, `~`/`^`/`&` depth, escapes decoded). `parse` and
    * `parseNested` are views over this — one code path, no drift.
    */
  def parseBoth(msg: String): (Map[String, String], String) =
    parseInto(msg, wantFlat = true, wantNested = true)

  private def splitSegs(msg: String): Array[Array[String]] =
    msg.split("[\\r\\n]+").iterator.map(_.trim).filter(_.nonEmpty)
      .map(_.split("\\|", -1)).toArray

  /** Flat `SEG.field[.comp]` map from pre-split segments. */
  private def flatFrom(rawSegs: Array[Array[String]]): Map[String, String] = {
    val flat = scala.collection.mutable.Map.empty[String, String]
    val segCount = scala.collection.mutable.Map.empty[String, Int]
    for (fields <- rawSegs) {
      val segName = fields.head
      val n = segCount.getOrElse(segName, 0)
      segCount(segName) = n + 1
      val flatName = if (n == 0) segName else s"$segName$n"
      fields.iterator.zipWithIndex.drop(1).foreach { case (f, i) =>
        if (f.nonEmpty) {
          val comps = f.split("\\^", -1)
          if (comps.length > 1) {
            comps.iterator.zipWithIndex.filter(_._1.nonEmpty).foreach {
              case (comp, j) => flat(s"$flatName.$i.${j + 1}") = comp
            }
          } else flat(s"$flatName.$i") = f
        }
      }
    }
    flat.toMap
  }

  private def parseInto(msg: String, wantFlat: Boolean,
      wantNested: Boolean): (Map[String, String], String) = {
    if (msg == null) return (Map.empty, null)
    // segment + field split happens ONCE; both views consume the same
    // token arrays (this is a hot per-row UDF — the default directive
    // asks for both views)
    val rawSegs = splitSegs(msg)
    val flat = if (wantFlat) flatFrom(rawSegs) else Map.empty[String, String]
    val nested = if (wantNested) {
      val segments = mapper.createObjectNode()
      segmentTokensFrom(rawSegs).foreach { case (n, o, _) =>
        addNode(segments, n, o) }
      mapper.writeValueAsString(segments)
    } else null
    (flat, nested)
  }

  /** Flat map + nested JSON from one shared parse per row. */
  val parseBothUdf: UserDefinedFunction = udf(parseBoth _)

  // ---- message-structure groups (HAPI structure names) ---------------
  //
  // `parse-as-hl7 :col grouped` wraps segment runs in the named groups
  // of the message's abstract structure, the shape HAPI's generated
  // message classes expose (reference: HL7Parser.java:111 parses into
  // HAPI structures; its visitor flattens them — the grouped mode
  // surfaces what HAPI knows and the flat default matches the
  // reference's output). Structures are declared from the public HL7
  // v2 abstract message syntax for ORU_R01 and the common ADT events;
  // unknown message types fall back to the flat-by-segment shape.

  private sealed trait St
  private case class SSeg(name: String, rep: Boolean = false) extends St
  private case class SGrp(name: String, rep: Boolean, items: Seq[St]) extends St

  private val AdtStructure: Seq[St] = Seq(SSeg("MSH"), SSeg("SFT", rep = true),
    SSeg("EVN"), SSeg("PID"), SSeg("PD1"), SSeg("ROL", rep = true),
    SSeg("NK1", rep = true), SSeg("PV1"), SSeg("PV2"),
    SSeg("DB1", rep = true), SSeg("OBX", rep = true), SSeg("AL1", rep = true),
    SSeg("DG1", rep = true), SSeg("DRG"),
    SGrp("PROCEDURE", rep = true, Seq(SSeg("PR1"), SSeg("ROL", rep = true))),
    SSeg("GT1", rep = true),
    SGrp("INSURANCE", rep = true,
      Seq(SSeg("IN1"), SSeg("IN2"), SSeg("IN3", rep = true))),
    SSeg("ACC"), SSeg("UB1"), SSeg("UB2"), SSeg("PDA"))

  private val OruR01: Seq[St] = Seq(SSeg("MSH"), SSeg("SFT", rep = true),
    SGrp("PATIENT_RESULT", rep = true, Seq(
      SGrp("PATIENT", rep = false, Seq(SSeg("PID"), SSeg("PD1"),
        SSeg("NTE", rep = true), SSeg("NK1", rep = true),
        SGrp("VISIT", rep = false, Seq(SSeg("PV1"), SSeg("PV2"))))),
      SGrp("ORDER_OBSERVATION", rep = true, Seq(SSeg("ORC"), SSeg("OBR"),
        SSeg("NTE", rep = true), SSeg("CTD"),
        SGrp("OBSERVATION", rep = true,
          Seq(SSeg("OBX"), SSeg("NTE", rep = true))),
        SSeg("FT1", rep = true), SSeg("CTI", rep = true))))),
    SSeg("DSC"))

  // ORM_O01 general order message (HL7 v2.4 ch.4 abstract syntax; HAPI
  // message class ORM_O01). ORDER_DETAIL's leading segment is a CHOICE
  // of OBR|RQD|RQ1|RXO|ODS|ODT — the greedy walk renders a choice as a
  // run of optional segments, which consumes exactly the one present in
  // a well-formed message.
  private val OrmO01: Seq[St] = Seq(SSeg("MSH"), SSeg("NTE", rep = true),
    SGrp("PATIENT", rep = false, Seq(SSeg("PID"), SSeg("PD1"),
      SSeg("NTE", rep = true),
      SGrp("PATIENT_VISIT", rep = false, Seq(SSeg("PV1"), SSeg("PV2"))),
      SGrp("INSURANCE", rep = true,
        Seq(SSeg("IN1"), SSeg("IN2"), SSeg("IN3"))),
      SSeg("GT1"), SSeg("AL1", rep = true))),
    SGrp("ORDER", rep = true, Seq(SSeg("ORC"),
      SGrp("ORDER_DETAIL", rep = false, Seq(
        SSeg("OBR"), SSeg("RQD"), SSeg("RQ1"), SSeg("RXO"),
        SSeg("ODS", rep = true), SSeg("ODT", rep = true),
        SSeg("NTE", rep = true), SSeg("CTD"), SSeg("DG1", rep = true),
        SGrp("OBSERVATION", rep = true,
          Seq(SSeg("OBX"), SSeg("NTE", rep = true))))),
      SSeg("FT1", rep = true), SSeg("CTI", rep = true), SSeg("BLG"))))

  // SIU schedule information (HL7 v2.4 ch.10; HAPI SIU_S12 — all SIU
  // trigger events S12–S26 share this structure)
  private val SiuS12: Seq[St] = Seq(SSeg("MSH"), SSeg("SCH"),
    SSeg("NTE", rep = true),
    SGrp("PATIENT", rep = true, Seq(SSeg("PID"), SSeg("PV1"), SSeg("PV2"),
      SSeg("OBX", rep = true), SSeg("DG1", rep = true))),
    SGrp("RESOURCES", rep = true, Seq(SSeg("RGS"),
      SGrp("SERVICE", rep = true, Seq(SSeg("AIS"), SSeg("NTE", rep = true))),
      SGrp("GENERAL_RESOURCE", rep = true,
        Seq(SSeg("AIG"), SSeg("NTE", rep = true))),
      SGrp("LOCATION_RESOURCE", rep = true,
        Seq(SSeg("AIL"), SSeg("NTE", rep = true))),
      SGrp("PERSONNEL_RESOURCE", rep = true,
        Seq(SSeg("AIP"), SSeg("NTE", rep = true))))))

  // MDM medical-document management (HL7 v2.5 ch.9; HAPI MDM_T01 /
  // MDM_T02). Even trigger events carry the document content as an
  // OBSERVATION group; odd ones are notification-only (same structure
  // minus the observations).
  private val MdmT01: Seq[St] = Seq(SSeg("MSH"), SSeg("SFT", rep = true),
    SSeg("EVN"), SSeg("PID"), SSeg("PV1"),
    SGrp("COMMON_ORDER", rep = true,
      Seq(SSeg("ORC"), SSeg("OBR"), SSeg("NTE", rep = true))),
    SSeg("TXA"))
  private val MdmT02: Seq[St] = MdmT01 :+
    SGrp("OBSERVATION", rep = true,
      Seq(SSeg("OBX"), SSeg("NTE", rep = true)))

  private val structures: Map[String, Seq[St]] =
    Map("ORU_R01" -> OruR01, "ORM_O01" -> OrmO01) ++
      Seq("A01", "A02", "A03", "A04", "A05", "A06", "A07", "A08", "A11",
        "A12", "A13", "A28", "A31").map(t => s"ADT_$t" -> AdtStructure) ++
      (12 to 26).map(e => s"SIU_S$e" -> SiuS12) ++
      (1 to 11).map(e => f"MDM_T$e%02d" ->
        (if (e % 2 == 0) MdmT02 else MdmT01))

  private def knownNames(items: Seq[St]): Set[String] = items.flatMap {
    case SSeg(n, _) => Set(n)
    case SGrp(_, _, ch) => knownNames(ch)
  }.toSet

  private def canStart(st: St, tok: String): Boolean = st match {
    case SSeg(n, _) => n == tok
    case SGrp(_, _, items) => items.exists(canStart(_, tok))
  }

  private type SegTok = (String, com.fasterxml.jackson.databind.JsonNode)

  private def addNode(parent: com.fasterxml.jackson.databind.node.ObjectNode,
      name: String, node: com.fasterxml.jackson.databind.JsonNode): Unit =
    parent.get(name) match {
      case null => parent.set[com.fasterxml.jackson.databind.JsonNode](name, node)
      case arr: com.fasterxml.jackson.databind.node.ArrayNode => arr.add(node)
      case prev =>
        val a = mapper.createArrayNode()
        a.add(prev); a.add(node)
        parent.set[com.fasterxml.jackson.databind.JsonNode](name, a)
    }

  /** Greedy walk of the abstract structure over the segment stream.
    * Unknown segments (Z-segments and anything the structure doesn't
    * name) attach to the group object being filled where they appear,
    * like HAPI's nonstandard-segment placement. Returns true if any
    * token was consumed (a group instance must consume ≥1 to exist).
    */
  private def matchSeq(items: Seq[St], toks: IndexedSeq[SegTok],
      pos: Array[Int], known: Set[String],
      parent: com.fasterxml.jackson.databind.node.ObjectNode): Boolean = {
    var consumed = false
    def peek: String = if (pos(0) < toks.length) toks(pos(0))._1 else null
    def take(): SegTok = { val t = toks(pos(0)); pos(0) += 1; t }
    for (item <- items) {
      while (peek != null && !known(peek)) { // Z/unexpected: attach here
        val (n, o) = take(); addNode(parent, n, o); consumed = true
      }
      item match {
        case SSeg(n, rep) =>
          var first = true
          while (peek == n && (first || rep)) {
            addNode(parent, n, take()._2); consumed = true; first = false
          }
        case g @ SGrp(n, rep, children) =>
          var first = true
          var progressing = true
          while (progressing && peek != null && canStart(g, peek) &&
              (first || rep)) {
            val before = pos(0)
            val o = mapper.createObjectNode()
            if (matchSeq(children, toks, pos, known, o) && pos(0) > before) {
              addNode(parent, n, o); consumed = true
            } else progressing = false
            first = false
          }
      }
    }
    consumed
  }

  /** Nested JSON with HAPI message-structure group names when the
    * message type (MSH-9) has a declared structure; flat-by-segment
    * otherwise. Leftover segments past the structure append at top
    * level by name.
    */
  def parseNestedGrouped(msg: String): String = {
    if (msg == null) return null
    groupedFromToks(segmentTokens(msg))
  }

  private def groupedFromToks(toks: Vector[(String,
      com.fasterxml.jackson.databind.JsonNode, Array[String])]): String = {
    if (toks.isEmpty) return mapper.writeValueAsString(mapper.createObjectNode())
    // MSH-9: fields[8] of the MSH segment, components type^trigger^structure
    val msh9 = toks.headOption.filter(_._1 == "MSH").map(_._3.toSeq)
      .flatMap(_.lift(8)).getOrElse("")
    val comps = msh9.split("\\^", -1)
    val key = if (comps.length >= 3 && comps(2).nonEmpty) comps(2)
      else if (comps.length >= 2) s"${comps(0)}_${comps(1)}" else comps(0)
    structures.get(key) match {
      case None => // no declared structure: flat-by-segment, same toks
        val segments = mapper.createObjectNode()
        toks.foreach { case (n, o, _) => addNode(segments, n, o) }
        mapper.writeValueAsString(segments)
      case Some(st) =>
        val known = knownNames(st)
        val root = mapper.createObjectNode()
        val pos = Array(0)
        val segToks = toks.map(t => (t._1, t._2)).toIndexedSeq
        matchSeq(st, segToks, pos, known, root)
        while (pos(0) < segToks.length) { // leftovers: flat at top
          val (n, o) = segToks(pos(0)); pos(0) += 1
          addNode(root, n, o)
        }
        mapper.writeValueAsString(root)
    }
  }

  /** (segName, segObject, fields) per segment, reusing the same
    * field/component/escape rules as the flat+nested parse.
    */
  private def segmentTokens(msg: String): Vector[(String,
      com.fasterxml.jackson.databind.JsonNode, Array[String])] =
    segmentTokensFrom(
      msg.split("[\\r\\n]+").iterator.map(_.trim).filter(_.nonEmpty)
        .map(_.split("\\|", -1)).toArray)

  private def segmentTokensFrom(rawSegs: Array[Array[String]]): Vector[(String,
      com.fasterxml.jackson.databind.JsonNode, Array[String])] = {
    val out = Vector.newBuilder[(String, com.fasterxml.jackson.databind.JsonNode, Array[String])]
    for (fields <- rawSegs) {
      val segName = fields.head
      val segObj = mapper.createObjectNode()
      if (segName == "MSH") {
        segObj.put("1", "|")
        fields.iterator.zipWithIndex.drop(1).foreach { case (f, i) =>
          if (f.nonEmpty) {
            if (i == 1) segObj.put("2", f)
            else segObj.set[com.fasterxml.jackson.databind.JsonNode](
              (i + 1).toString, fieldNode(f))
          }
        }
      } else {
        fields.iterator.zipWithIndex.drop(1).foreach { case (f, i) =>
          if (f.nonEmpty)
            segObj.set[com.fasterxml.jackson.databind.JsonNode](
              i.toString, fieldNode(f))
        }
      }
      out += ((segName, segObj, fields))
    }
    out.result()
  }

  /** Flat map + grouped nested JSON from one parse per row. */
  def parseBothGrouped(msg: String): (Map[String, String], String) = {
    if (msg == null) return (Map.empty, null)
    // one split per row: the flat map and the grouped tree share the
    // same token arrays, like the ungrouped parseBoth path
    val rawSegs = splitSegs(msg)
    (flatFrom(rawSegs), groupedFromToks(segmentTokensFrom(rawSegs)))
  }

  val parseBothGroupedUdf: UserDefinedFunction = udf(parseBothGrouped _)
}

/** Avro object-container file → JSON strings (one per record). */
object AvroFile {
  import org.apache.spark.sql.expressions.UserDefinedFunction
  import org.apache.spark.sql.functions.udf
  import org.apache.avro.file.{DataFileReader, SeekableByteArrayInput}
  import org.apache.avro.generic.{GenericDatumReader, GenericRecord}

  def parse(bytes: Array[Byte]): Seq[String] = {
    if (bytes == null) return Seq.empty
    try {
      val reader = new DataFileReader[GenericRecord](
        new SeekableByteArrayInput(bytes),
        new GenericDatumReader[GenericRecord]())
      try {
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        while (reader.hasNext) out += reader.next().toString
        out.toSeq
      } finally reader.close()
    } catch { case _: Exception => Seq.empty }
  }

  val parseUdf: UserDefinedFunction = udf(parse _)
}

/** Schema-less protobuf wire-format decoder. */
object Protobuf {
  import org.apache.spark.sql.expressions.UserDefinedFunction
  import org.apache.spark.sql.functions.udf

  private def readVarint(b: Array[Byte], pos: Int): (Long, Int) = {
    var v = 0L
    var shift = 0
    var p = pos
    while (p < b.length) {
      val x = b(p)
      v |= (x & 0x7fL) << shift
      p += 1
      if ((x & 0x80) == 0) return (v, p)
      shift += 7
      if (shift > 63) return (v, p)
    }
    (v, p)
  }

  private def printable(bytes: Array[Byte]): Boolean =
    bytes.nonEmpty && bytes.forall(x => x >= 0x20 && x < 0x7f || x == '\n' || x == '\t')

  def decode(b: Array[Byte], prefix: String, depth: Int,
      out: scala.collection.mutable.Map[String, String]): Boolean = {
    var p = 0
    var fields = 0
    while (p < b.length) {
      val (tag, p1) = readVarint(b, p)
      val field = (tag >>> 3).toInt
      val wire = (tag & 7).toInt
      if (field <= 0 || field > 536870911) return false
      val key = if (prefix.isEmpty) field.toString else s"$prefix.$field"
      wire match {
        case 0 =>
          val (v, p2) = readVarint(b, p1)
          out(key) = v.toString
          p = p2
        case 1 =>
          if (p1 + 8 > b.length) return false
          val v = java.nio.ByteBuffer.wrap(b, p1, 8)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
          out(key) = v.toString
          p = p1 + 8
        case 5 =>
          if (p1 + 4 > b.length) return false
          val v = java.nio.ByteBuffer.wrap(b, p1, 4)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
          out(key) = v.toString
          p = p1 + 4
        case 2 =>
          val (len, p2) = readVarint(b, p1)
          if (len < 0 || p2 + len > b.length) return false
          val bytes = java.util.Arrays.copyOfRange(b, p2, p2 + len.toInt)
          // try nested message first (bounded depth), else string/hex
          val nested = scala.collection.mutable.Map.empty[String, String]
          if (depth > 0 && bytes.nonEmpty && decode(bytes, key, depth - 1, nested))
            out ++= nested
          else if (printable(bytes)) out(key) = new String(bytes, "UTF-8")
          else out(key) = graft.functions.Digests.hex(bytes)
          p = p2 + len.toInt
        case _ => return false
      }
      fields += 1
    }
    fields > 0
  }

  def parse(b: Array[Byte]): Map[String, String] = {
    if (b == null) return Map.empty
    val out = scala.collection.mutable.Map.empty[String, String]
    if (decode(b, "", 2, out)) out.toMap else Map.empty
  }

  val parseUdf: UserDefinedFunction = udf(parse _)

  // ---- descriptor-based decode --------------------------------------
  // A .desc FileDescriptorSet is itself protobuf wire format (public
  // layout: google/protobuf/descriptor.proto), so the walker above is
  // enough to read it — no protobuf-java dependency.

  /** FieldDescriptorProto subset: name=1, number=3, label=4, type=5,
    * type_name=6. */
  case class PbField(name: String, number: Int, label: Int, tpe: Int,
      typeName: String)
  case class PbMsg(fields: Map[Int, PbField])

  /** Generic wire walk → (field#, wireType, value) where value is Long
    * (wire 0/1/5) or Array[Byte] (wire 2). None on malformed input. */
  private def walkWire(b: Array[Byte]): Option[Vector[(Int, Int, Any)]] = {
    val out = Vector.newBuilder[(Int, Int, Any)]
    var p = 0
    while (p < b.length) {
      val (tag, p1) = readVarint(b, p)
      val field = (tag >>> 3).toInt
      val wire = (tag & 7).toInt
      if (field <= 0 || field > 536870911 || p1 <= p) return None
      wire match {
        case 0 =>
          val (v, p2) = readVarint(b, p1); out += ((field, 0, v)); p = p2
        case 1 =>
          if (p1 + 8 > b.length) return None
          out += ((field, 1, java.nio.ByteBuffer.wrap(b, p1, 8)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong))
          p = p1 + 8
        case 5 =>
          if (p1 + 4 > b.length) return None
          out += ((field, 5, java.nio.ByteBuffer.wrap(b, p1, 4)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt.toLong))
          p = p1 + 4
        case 2 =>
          val (len, p2) = readVarint(b, p1)
          if (len < 0 || p2 + len > b.length) return None
          out += ((field, 2, java.util.Arrays.copyOfRange(b, p2, p2 + len.toInt)))
          p = p2 + len.toInt
        case _ => return None
      }
    }
    Some(out.result())
  }

  private def utf8(a: Any): String = new String(a.asInstanceOf[Array[Byte]], "UTF-8")

  /** Parse a FileDescriptorSet → fully-qualified ".pkg.Msg" → PbMsg. */
  def parseDescriptorSet(b: Array[Byte]): Map[String, PbMsg] = {
    val out = scala.collection.mutable.Map.empty[String, PbMsg]
    def parseMsg(mb: Array[Byte], prefix: String): Unit = {
      val items = walkWire(mb).getOrElse(return)
      val name = items.collectFirst { case (1, 2, v) => utf8(v) }.getOrElse(return)
      val full = s"$prefix.$name"
      val fields = items.collect { case (2, 2, fb: Array[Byte]) =>
        val fi = walkWire(fb).getOrElse(Vector.empty)
        PbField(
          name = fi.collectFirst { case (1, 2, v) => utf8(v) }.getOrElse(""),
          number = fi.collectFirst { case (3, 0, v: Long) => v.toInt }.getOrElse(0),
          label = fi.collectFirst { case (4, 0, v: Long) => v.toInt }.getOrElse(1),
          tpe = fi.collectFirst { case (5, 0, v: Long) => v.toInt }.getOrElse(0),
          typeName = fi.collectFirst { case (6, 2, v) => utf8(v) }.getOrElse(""))
      }
      out(full) = PbMsg(fields.filter(_.number > 0).map(f => f.number -> f).toMap)
      items.collect { case (3, 2, nb: Array[Byte]) => parseMsg(nb, full) }
    }
    for {
      items <- walkWire(b).toSeq
      (1, 2, fdp: Array[Byte]) <- items
      fi <- walkWire(fdp).toSeq
    } {
      val pkg = fi.collectFirst { case (2, 2, v) => utf8(v) }
        .filter(_.nonEmpty).map("." + _).getOrElse("")
      fi.collect { case (4, 2, mb: Array[Byte]) => parseMsg(mb, pkg) }
    }
    out.toMap
  }

  /** Find a message by name: exact ".a.B", bare "a.B", or suffix "B". */
  def resolveMessage(msgs: Map[String, PbMsg], name: String): Option[String] = {
    val dotted = if (name.startsWith(".")) name else s".$name"
    if (msgs.contains(dotted)) Some(dotted)
    else msgs.keys.find(_.endsWith(s".$name")).map(identity)
  }

  private def zigzag(v: Long): Long = (v >>> 1) ^ -(v & 1L)

  /** Decode a payload against a resolved descriptor: field NAMES, typed
    * rendering, nested messages as "outer.inner", repeated as "name[i]". */
  def decodeNamed(b: Array[Byte], msgs: Map[String, PbMsg], msgKey: String,
      prefix: String, out: scala.collection.mutable.Map[String, String]): Unit = {
    val msg = msgs.getOrElse(msgKey, return)
    val occ = scala.collection.mutable.Map.empty[Int, Int]
    for ((num, wire, v) <- walkWire(b).getOrElse(Vector.empty)) {
      msg.fields.get(num) match {
        case None => // unknown field — render by number like the bare walk
          out(s"$prefix$num") = v match {
            case l: Long => l.toString
            case a: Array[Byte] => if (printable(a)) utf8(a)
              else graft.functions.Digests.hex(a)
          }
        case Some(f) =>
          val base = prefix + f.name
          val key =
            if (f.label == 3) { // repeated
              val i = occ.getOrElse(num, 0); occ(num) = i + 1; s"$base[$i]"
            } else base
          (f.tpe, v) match {
            case (1, l: Long)  => out(key) = java.lang.Double.longBitsToDouble(l).toString
            case (2, l: Long)  => out(key) = java.lang.Float.intBitsToFloat(l.toInt).toString
            case (3 | 16, l: Long) => out(key) = l.toString               // int64/sfixed64
            case (5, l: Long) => out(key) = l.toInt.toString              // int32 (sign-extended varint)
            case (4 | 6, l: Long) => out(key) = java.lang.Long.toUnsignedString(l) // uint64/fixed64
            case (13 | 7, l: Long) => out(key) = (l & 0xffffffffL).toString // uint32/fixed32
            case (15, l: Long) => out(key) = l.toInt.toString             // sfixed32
            case (17 | 18, l: Long) => out(key) = zigzag(l).toString      // sint32/64
            case (8, l: Long)  => out(key) = (l != 0).toString            // bool
            case (14, l: Long) => out(key) = l.toString                   // enum number
            case (9, a: Array[Byte])  => out(key) = utf8(a)               // string
            case (12, a: Array[Byte]) => out(key) = graft.functions.Digests.hex(a)
            case (10 | 11, a: Array[Byte]) =>                             // group/message
              decodeNamed(a, msgs, f.typeName, s"$key.", out)
            case (_, l: Long) => out(key) = l.toString
            case (_, a: Array[Byte]) => out(key) =
              if (printable(a)) utf8(a) else graft.functions.Digests.hex(a)
          }
      }
    }
  }

  def namedUdf(msgs: Map[String, PbMsg], msgKey: String): UserDefinedFunction =
    udf { (b: Array[Byte]) =>
      if (b == null) Map.empty[String, String]
      else {
        val out = scala.collection.mutable.Map.empty[String, String]
        decodeNamed(b, msgs, msgKey, "", out)
        out.toMap
      }
    }
}

/** Minimal protobuf wire-format WRITER — used to build descriptor and
  * payload fixtures (tests + the query battery) without protobuf-java;
  * the natural seed of a future write-as-protobuf sink.
  */
object ProtoWire {
  final class W {
    private val bos = new java.io.ByteArrayOutputStream()
    def varint(v0: Long): W = {
      var v = v0
      while ((v & ~0x7fL) != 0) { bos.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      bos.write(v.toInt); this
    }
    private def tag(field: Int, wire: Int): W = varint((field.toLong << 3) | wire)
    def int(field: Int, v: Long): W = { tag(field, 0); varint(v) }
    def bytes(field: Int, b: Array[Byte]): W =
      { tag(field, 2); varint(b.length); bos.write(b); this }
    def str(field: Int, s: String): W = bytes(field, s.getBytes("UTF-8"))
    def msg(field: Int)(f: W => Unit): W =
      { val w = new W; f(w); bytes(field, w.toBytes) }
    def raw(b: Array[Byte]): W = { bos.write(b); this }
    def toBytes: Array[Byte] = bos.toByteArray
  }
  def build(f: W => Unit): Array[Byte] = { val w = new W; f(w); w.toBytes }
}
