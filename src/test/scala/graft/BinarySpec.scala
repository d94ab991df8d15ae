package graft

import org.apache.spark.sql.Row

class BinarySpec extends SparkSpec {

  /** Build a minimal xlsx (zip of xml) in memory. */
  private def makeXlsx(rows: Seq[Seq[String]]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    val shared = rows.flatten.distinct
    put("xl/sharedStrings.xml",
      "<sst>" + shared.map(s => s"<si><t>$s</t></si>").mkString + "</sst>")
    val sheet = rows.zipWithIndex.map { case (r, ri) =>
      val cells = r.zipWithIndex.map { case (v, ci) =>
        val ref = s"${('A' + ci).toChar}${ri + 1}"
        s"""<c r="$ref" t="s"><v>${shared.indexOf(v)}</v></c>"""
      }.mkString
      s"<row>$cells</row>"
    }.mkString
    put("xl/worksheets/sheet1.xml",
      s"<worksheet><sheetData>$sheet</sheetData></worksheet>")
    zos.close()
    bos.toByteArray
  }

  test("parse-as-excel: header mode names columns, drops header row") {
    val xlsx = makeXlsx(Seq(
      Seq("name", "age"), Seq("alice", "30"), Seq("bob", "41")))
    val d = df("payload BINARY", Seq(Row(xlsx)))
    val out = wrangle("parse-as-excel :payload 0 true", d)
    assert(out.columns.contains("name") && out.columns.contains("age"))
    assert(out.count() == 2)
    assert(strings(out.orderBy("age"), "name") == Seq("alice", "bob"))
  }

  test("parse-as-excel: positional mode emits payload_1..n") {
    val xlsx = makeXlsx(Seq(Seq("x", "y", "z")))
    val d = df("payload BINARY", Seq(Row(xlsx)))
    val out = wrangle("parse-as-excel :payload", d)
    assert(out.columns.count(_.startsWith("payload_")) == 3)
    assert(strings(out, "payload_3") == Seq("z"))
  }

  test("parse-as-hl7 extracts segment fields and components") {
    val msg = "MSH|^~\\&|SENDER|FAC|RCVR|FAC2|202401011200||ADT^A01|123|P|2.3\r" +
      "PID|1||PATID1234^5^M11||Jones^William||19610615|M"
    val d = df("m STRING", Seq(Row(msg)))
    val out = wrangle("parse-as-hl7 :m", d)
    val map = out.select("m_hl7").head().getMap[String, String](0)
    assert(map("PID.5.1") == "Jones")
    assert(map("PID.5.2") == "William")
    assert(map("PID.7") == "19610615")
    assert(map("MSH.2") == "SENDER")
  }

  test("parse-as-hl7 nested json: repeated segments, subcomponents, escapes") {
    val msg = "MSH|^~\\&|SENDER|FAC|RCVR|FAC2|202401011200||ORU^R01|123|P|2.3\r" +
      "PID|1||PATID1234^5^M11||Jones^William\r" +
      "OBX|1|NM|GLU^Glucose||95|mg\\T\\dL\r" +
      "OBX|2|NM|HGB^Hemoglobin||13.5|g/dL\r" +
      "OBX|3|TX|NOTE||A&B~C^D"
    val d = df("m STRING", Seq(Row(msg)))
    val out = wrangle("parse-as-hl7 :m", d)
    val js = out.select("m_hl7_json").head().getString(0)
    def jp(p: String) = graft.functions.JsonPathLite.eval(js, p)
    // standard MSH numbering: MSH.1 = separator, MSH.2 = encoding chars,
    // MSH.9 = message type
    assert(jp("$.MSH.1") == "|")
    assert(jp("$.MSH.2") == "^~\\&")
    assert(jp("$.MSH.9.1") == "ORU")
    // ALL three OBX repeats survive as an array (the reference drops
    // the 3rd+ — deliberately not replicated)
    assert(jp("$.OBX[0].5") == "95")
    assert(jp("$.OBX[1].5") == "13.5")
    assert(jp("$.OBX[2].2") == "TX")
    // subcomponent (&) depth inside a field repeat (~)
    assert(jp("$.OBX[2].5[0].1") == "A")
    assert(jp("$.OBX[2].5[0].2") == "B")
    assert(jp("$.OBX[2].5[1].1") == "C")
    // escape sequences decode at the leaves
    assert(jp("$.OBX[0].6") == "mg&dL")
    // adjacency: \E\F\E\ encodes a literal "\F\" — a later pattern
    // must not re-decode across the consumed \E\ boundary
    val esc = df("m STRING", Seq(Row("MSH|^~\\&|S\rOBX|1|TX|N||\\E\\F\\E\\|u" +
      "\rOBX|2|TX|Z||\\Zfoo\\F\\")))
    val js2 = wrangle("parse-as-hl7 :m", esc)
      .select("m_hl7_json").head().getString(0)
    assert(graft.functions.JsonPathLite.eval(js2, "$.OBX[0].5") == "\\F\\")
    // unknown z-escape: kept verbatim INCLUDING delimiters, and its
    // closing backslash must not seed a phantom \F\ decode
    assert(graft.functions.JsonPathLite.eval(js2, "$.OBX[1].5") == "\\Zfoo\\F\\")
    // single segment stays an object, not a 1-element array
    assert(jp("$.PID.5.1") == "Jones")
  }

  test("avro containers with deflate/snappy/zstd codecs parse") {
    // the codec jars ship with Spark (snappy-java, zstd-jni), so
    // compressed avro dumps decode with no extra dependency
    import org.apache.avro.Schema
    import org.apache.avro.file.{CodecFactory, DataFileWriter}
    import org.apache.avro.generic.{GenericData, GenericDatumWriter}
    val schema = new Schema.Parser().parse(
      """{"type":"record","name":"R","fields":[{"name":"x","type":"int"}]}""")
    for (codec <- Seq(CodecFactory.deflateCodec(6),
        CodecFactory.snappyCodec(), CodecFactory.zstandardCodec(3))) {
      val bos = new java.io.ByteArrayOutputStream()
      val w = new DataFileWriter[GenericData.Record](
        new GenericDatumWriter[GenericData.Record](schema))
      w.setCodec(codec)
      w.create(schema, bos)
      (1 to 3).foreach { i =>
        val r = new GenericData.Record(schema); r.put("x", i); w.append(r)
      }
      w.close()
      val rows = graft.ops.AvroFile.parse(bos.toByteArray)
      assert(rows.length == 3, s"codec $codec")
      assert(rows.forall(_.contains("\"x\"")), s"codec $codec")
    }
  }

  test("parse-as-avro-file explodes container records") {
    import org.apache.avro.Schema
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter}
    val schema = new Schema.Parser().parse(
      """{"type":"record","name":"R","fields":[{"name":"x","type":"int"}]}""")
    val bos = new java.io.ByteArrayOutputStream()
    val w = new DataFileWriter[GenericData.Record](
      new GenericDatumWriter[GenericData.Record](schema))
    w.create(schema, bos)
    (1 to 3).foreach { i =>
      val r = new GenericData.Record(schema); r.put("x", i); w.append(r)
    }
    w.close()
    val d = df("payload BINARY", Seq(Row(bos.toByteArray)))
    val out = wrangle("parse-as-avro-file :payload; parse-as-json :payload 1;", d)
    assert(out.count() == 3)
    assert(strings(out.orderBy("payload_x"), "payload_x") == Seq(1, 2, 3))
  }

  test("sources auto-detect reads avro container files without spark-avro") {
    import org.apache.avro.Schema
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter}
    val schema = new Schema.Parser().parse(
      """{"type":"record","name":"R","fields":[{"name":"x","type":"int"},{"name":"s","type":"string"}]}""")
    val tmp = java.nio.file.Files.createTempDirectory("graft_avro_")
    val f = new java.io.File(tmp.toFile, "part-0.avro")
    val w = new DataFileWriter[GenericData.Record](
      new GenericDatumWriter[GenericData.Record](schema))
    w.create(schema, f)
    (1 to 4).foreach { i =>
      val r = new GenericData.Record(schema)
      r.put("x", i); r.put("s", s"v$i"); w.append(r)
    }
    w.close()
    assert(graft.sources.Sources.detectFormat(f.toString) == "avro")
    val got = graft.sources.Sources.auto(spark, f.toString)
    assert(got.count() == 4)
    assert(got.columns.toSet == Set("x", "s"))
    assert(got.agg(org.apache.spark.sql.functions.sum("x")).head().getLong(0) == 10)
  }

  test("sources auto-detect reads csv and parquet") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_src_").toString
    val csvPath = s"$tmp/t.csv"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(csvPath),
      "a,b\n1,x\n2,y\n")
    assert(graft.sources.Sources.detectFormat(csvPath) == "csv")
    val got = graft.sources.Sources.auto(spark, csvPath)
    assert(got.count() == 2 && got.columns.toSeq == Seq("a", "b"))
    val pq = s"$tmp/t.parquet"
    graft.sources.Sources.write(got, pq)
    assert(graft.sources.Sources.auto(spark, pq).count() == 2)
  }

  test("on-error policies: fail aborts, skip passes") {
    val d = df("v INT", Seq(Row(1), Row(99)))
    val res = Wrangle.recipe("send-to-error exp:{ v > 50 };").run(d)
    intercept[graft.api.RecipeException](res.onError("fail"))
    assert(res.onError("skip").count() == 1)
  }

  test("parse-as-protobuf with a descriptor decodes by field name, nested") {
    import graft.ops.ProtoWire
    // FileDescriptorSet for:
    //   package tutorial;
    //   message Person { string name=1; int32 id=2; Phone phone=3;
    //                    repeated string email=4; }
    //   message Phone  { string number=1; }
    // (field numbers per google/protobuf/descriptor.proto)
    def field(w: ProtoWire.W, name: String, num: Int, label: Int, tpe: Int,
        typeName: String = ""): Unit =
      w.msg(2) { f =>
        f.str(1, name); f.int(3, num); f.int(4, label); f.int(5, tpe)
        if (typeName.nonEmpty) f.str(6, typeName)
      }
    val desc = ProtoWire.build { s =>
      s.msg(1) { fdp =>
        fdp.str(1, "person.proto"); fdp.str(2, "tutorial")
        fdp.msg(4) { m =>
          m.str(1, "Person")
          field(m, "name", 1, 1, 9)
          field(m, "id", 2, 1, 5)
          field(m, "phone", 3, 1, 11, ".tutorial.Phone")
          field(m, "email", 4, 3, 9)
        }
        fdp.msg(4) { m => m.str(1, "Phone"); field(m, "number", 1, 1, 9) }
      }
    }
    val payload = ProtoWire.build { p =>
      p.str(1, "Ada"); p.int(2, 42)
      p.msg(3)(ph => ph.str(1, "555-0100"))
      p.str(4, "ada@x.io"); p.str(4, "ada@y.io")
    }
    val b64 = java.util.Base64.getEncoder.encodeToString(desc)
    val d = df("payload BINARY", Seq(Row(payload)))
    val out = wrangle(s"parse-as-protobuf :payload '$b64' 'tutorial.Person'", d)
    val map = out.select("payload_proto").head().getMap[String, String](0)
    assert(map("name") == "Ada")
    assert(map("id") == "42")
    assert(map("phone.number") == "555-0100")
    assert(map("email[0]") == "ada@x.io" && map("email[1]") == "ada@y.io")
    // bare message name resolves too
    val out2 = wrangle(s"parse-as-protobuf :payload '$b64' 'Person'", d)
    assert(out2.select("payload_proto").head()
      .getMap[String, String](0)("name") == "Ada")
  }

  test("parse-as-protobuf decodes the wire format without a descriptor") {
    // message { int32 a = 1; string b = 2; fixed64 c = 3 }
    // a=150, b="test", c=42  hand-encoded:
    val bytes: Array[Byte] = Array[Int](
      0x08, 0x96, 0x01,                         // field 1 varint 150
      0x12, 0x04, 't', 'e', 's', 't',           // field 2 "test"
      0x19, 42, 0, 0, 0, 0, 0, 0, 0             // field 3 fixed64 42
    ).map(_.toByte)
    val d = df("payload BINARY", Seq(Row(bytes)))
    val out = wrangle("parse-as-protobuf :payload", d)
    val map = out.select("payload_proto").head().getMap[String, String](0)
    assert(map("1") == "150")
    assert(map("2") == "test")
    assert(map("3") == "42")
  }

  // ---- HL7 structure groups ------------------------------------------

  private val oruMsg =
    "MSH|^~\\&|LAB|X|Y|Z|20240101||ORU^R01|42|P|2.3\r" +
      "PID|1||777||Doe^Jane\r" +
      "ZPD|custom-z-data\r" +
      "NK1|1|Doe^John\r" +
      "OBR|1||ORD1|GLU^Glucose\r" +
      "OBX|1|NM|GLU||95|mg/dL\r" +
      "NTE|1||fasting\r" +
      "OBX|2|NM|HGB||14\r" +
      "OBR|2||ORD2|CBC^Blood Count\r" +
      "OBX|1|NM|WBC||7.1"

  test("parse-as-hl7 grouped: ORU_R01 message-structure names") {
    val j = graft.ops.Hl7.parseNestedGrouped(oruMsg)
    val m = new com.fasterxml.jackson.databind.ObjectMapper().readTree(j)
    val pr = m.get("PATIENT_RESULT")
    assert(pr != null, j)
    // patient group holds PID + NK1, with the Z-segment attached where
    // it appeared (inside PATIENT)
    val patient = pr.get("PATIENT")
    assert(patient.get("PID").get("5").get("2").asText() == "Jane")
    assert(patient.get("NK1") != null)
    assert(patient.get("ZPD") != null, j)
    // two ORDER_OBSERVATION instances, first with two OBSERVATIONs
    val oo = pr.get("ORDER_OBSERVATION")
    assert(oo.isArray && oo.size() == 2, j)
    val obs1 = oo.get(0).get("OBSERVATION")
    assert(obs1.isArray && obs1.size() == 2, j)
    assert(obs1.get(0).get("OBX").get("5").asText() == "95")
    assert(obs1.get(0).get("NTE").get("3").asText() == "fasting")
    assert(obs1.get(1).get("OBX").get("5").asText() == "14")
    assert(oo.get(1).get("OBSERVATION").get("OBX").get("5").asText() == "7.1")
  }

  test("parse-as-hl7 grouped: ADT INSURANCE group; unknown type stays flat") {
    val adt = "MSH|^~\\&|APP|X|Y|Z|20240101||ADT^A01|1|P|2.3\r" +
      "EVN|A01\rPID|1||9\rPV1|1|I\r" +
      "GT1|1\rIN1|1|PLANA\rIN2|1|12345\rIN1|2|PLANB"
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(graft.ops.Hl7.parseNestedGrouped(adt))
    val ins = m.get("INSURANCE")
    assert(ins.isArray && ins.size() == 2, m.toString)
    assert(ins.get(0).get("IN1").get("2").asText() == "PLANA")
    assert(ins.get(0).get("IN2") != null)
    assert(ins.get(1).get("IN1").get("2").asText() == "PLANB")
    // unknown message type → flat-by-segment fallback
    val unk = "MSH|^~\\&|APP|X|Y|Z|20240101||QRY^Q01|1|P|2.3\rQRD|x"
    val f = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(graft.ops.Hl7.parseNestedGrouped(unk))
    assert(f.get("QRD") != null && f.get("MSH") != null)
  }

  test("parse-as-hl7 grouped: ORM_O01 order groups incl. detail choice") {
    val orm = "MSH|^~\\&|HIS|X|Y|Z|20240101||ORM^O01|1|P|2.3\r" +
      "PID|1||9||Doe^Jane\rPV1|1|O\r" +
      "ORC|NW|ORD1\rOBR|1||ORD1|GLU^Glucose\rNTE|1||stat\r" +
      "OBX|1|NM|GLU||95|mg/dL\r" +
      "ORC|NW|ORD2\rRXO|AMOX^Amoxicillin|500||MG"
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(graft.ops.Hl7.parseNestedGrouped(orm))
    assert(m.get("PATIENT").get("PID").get("5").get("1").asText() == "Doe")
    assert(m.get("PATIENT").get("PATIENT_VISIT").get("PV1")
      .get("2").asText() == "O", m.toString)
    val orders = m.get("ORDER")
    assert(orders.isArray && orders.size() == 2, m.toString)
    val d1 = orders.get(0).get("ORDER_DETAIL")
    assert(d1.get("OBR").get("4").get("2").asText() == "Glucose")
    assert(d1.get("NTE").get("3").asText() == "stat")
    // the OBX lands in the OBSERVATION subgroup, not loose in the detail
    assert(d1.get("OBSERVATION").get("OBX").get("5").asText() == "95")
    // second order's detail is the RXO choice branch
    val d2 = orders.get(1).get("ORDER_DETAIL")
    assert(d2.get("RXO").get("1").get("2").asText() == "Amoxicillin")
  }

  test("parse-as-hl7 grouped: SIU_S12 schedule resource subgroups") {
    val siu = "MSH|^~\\&|SCHED|X|Y|Z|20240101||SIU^S12|1|P|2.3\r" +
      "SCH|1|APPT1|||||CHECKUP^Routine checkup\rNTE|1||bring card\r" +
      "PID|1||9||Doe^Jane\rPV1|1|O\rRGS|1\r" +
      "AIS|1||EXAM^Examination\rNTE|1||fasting required\r" +
      "AIL|1||ROOM1^Exam Room 1\rAIP|1||DOC1^Smith^John"
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(graft.ops.Hl7.parseNestedGrouped(siu))
    assert(m.get("SCH").get("7").get("2").asText() == "Routine checkup")
    assert(m.get("NTE").get("3").asText() == "bring card") // top-level NTE
    assert(m.get("PATIENT").get("PID").get("5").get("1").asText() == "Doe")
    val res = m.get("RESOURCES")
    assert(res.get("RGS") != null, m.toString)
    assert(res.get("SERVICE").get("AIS").get("3").get("1").asText() == "EXAM")
    // the second NTE binds to the SERVICE group, not the top level
    assert(res.get("SERVICE").get("NTE").get("3").asText() == "fasting required")
    assert(res.get("LOCATION_RESOURCE").get("AIL").get("3")
      .get("2").asText() == "Exam Room 1")
    assert(res.get("PERSONNEL_RESOURCE").get("AIP").get("3")
      .get("2").asText() == "Smith")
    // every SIU trigger event shares the structure
    val s26 = siu.replace("SIU^S12", "SIU^S26")
    val m26 = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(graft.ops.Hl7.parseNestedGrouped(s26))
    assert(m26.get("RESOURCES") != null)
  }

  test("parse-as-hl7 grouped directive surfaces the grouped json column") {
    val d = df("m STRING", Seq(Row(oruMsg)))
    val out = wrangle(
      "parse-as-hl7 :m grouped; " +
        "json-path :m_hl7_json :v '$.PATIENT_RESULT.ORDER_OBSERVATION[0].OBSERVATION[0].OBX.5'; " +
        "keep :v", d)
    assert(strings(out, "v") == Seq("95"))
  }

  // ---- legacy .xls (BIFF8 in an OLE2 container) ----------------------
  // Fixtures are hand-assembled from the public [MS-CFB]/[MS-XLS]
  // specs: cell records of every supported type, an SST string split
  // across a CONTINUE record, both the regular-sector and the
  // mini-stream (miniFAT) storage paths, and a BIFF5 reject.

  test("parse-as-excel reads BIFF8 .xls: cell records + SST CONTINUE split") {
    val xls = XlsFixture.cfbRegular(XlsFixture.biffWorkbook())
    val d = df("payload BINARY", Seq(Row(xls)))
    val out = wrangle("parse-as-excel :payload", d).orderBy("payload_1")
    val rows = out.collect().map(r => (1 to 3).map(i =>
      r.getAs[String](s"payload_$i")))
    // sorted by first cell: "1" < "alpha" < "inline"
    // MULRK(1, 2.5), LABELSST -> the CONTINUE-split string
    assert(rows(0) == Seq("1", "2.5", "continued!"))
    // LABELSST("alpha"), NUMBER(3.14), RK int 42
    assert(rows(1) == Seq("alpha", "3.14", "42"))
    // inline LABEL, BOOLERR true, FORMULA cached 7
    assert(rows(2) == Seq("inline", "true", "7"))
  }

  test("parse-as-excel reads a small .xls from the mini stream (miniFAT)") {
    val xls = XlsFixture.cfbMini(XlsFixture.biffWorkbook())
    val d = df("payload BINARY", Seq(Row(xls)))
    val out = wrangle("parse-as-excel :payload", d)
    assert(out.count() == 3)
    assert(strings(out.orderBy("payload_1"), "payload_1") ==
      Seq("1", "alpha", "inline"))
  }

  test("parse-as-excel .xls: sheet by name; composes with redact-pii") {
    val xls = XlsFixture.cfbRegular(XlsFixture.biffWorkbook())
    val d = df("payload BINARY", Seq(Row(xls)))
    // BOUNDSHEET name routing (not index)
    val byName = wrangle("parse-as-excel :payload 'Sheet1'", d)
    assert(byName.count() == 3)
    // parsed cells feed the curation surface in the same recipe
    val out = wrangle(
      "parse-as-excel :payload 'Sheet1'; " +
        "set-column :note exp:{ concat(payload_1, ' <u1@ex.io>') }; " +
        "redact-pii :note; keep :note", d)
    val notes = strings(out, "note").map(_.toString)
    assert(notes.forall(_.endsWith(" <[EMAIL]>")), notes.mkString("|"))
  }

  test("parse-as-excel rejects legacy BIFF5 with a precise error") {
    val xls = XlsFixture.cfbRegular(XlsFixture.biffWorkbook(vers = 0x0500))
    val ex = intercept[Exception] {
      graft.ops.Xlsx.parse(xls, "0")
    }
    assert(ex.getMessage.contains("BIFF5"), s"got: ${ex.getMessage}")
  }

  test(".xls date cells: FORMAT/XF records turn serials into dates") {
    val xls = XlsFixture.cfbRegular(XlsFixture.biffDateWorkbook())
    val rows = graft.ops.Xlsx.parse(xls, "0").map(_.cells)
    // row 0: XF0 (General) NUMBER stays numeric; XF1 (builtin 14
    // m/d/yy) NUMBER 36526 = 2000-01-01; XF2 (custom yyyy-mm-dd
    // via FORMAT 164) RK int serial
    assert(rows(0) == Seq("3.14", "2000-01-01", "2000-01-02"))
    // row 1: datetime serial (builtin 22 m/d/yy h:mm), time-only
    // fraction (builtin 21 h:mm:ss), MULRK with a date XF on the
    // second cell only
    assert(rows(1) == Seq("2000-01-01 12:00:00", "06:30:00", "42",
      "2000-01-01"))
    // row 2: FORMULA cached numerics — date XF renders as date,
    // General XF stays numeric
    assert(rows(2) == Seq("2000-01-01", "36526"))
  }

  test("ExcelDates custom format classification matches POI semantics") {
    import graft.ops.ExcelDates.isDateFormatString
    assert(isDateFormatString("yyyy-mm-dd"))
    assert(isDateFormatString("dd/mm/yyyy hh:mm"))
    assert(isDateFormatString("h:mm AM/PM"))
    assert(isDateFormatString("[h]:mm:ss"))
    assert(isDateFormatString("mm:ss.000"))
    assert(isDateFormatString("[RED]yyyy\\-mm"))
    assert(!isDateFormatString("General"))
    assert(!isDateFormatString("#,##0.00"))
    assert(!isDateFormatString("0.00E+00"))
    assert(!isDateFormatString("\"year\" 0000"))
  }

  test("xlsx date cells: styles.xml numFmt drives serial rendering") {
    // minimal xlsx with a styled numeric cell
    val sheet =
      """<?xml version="1.0"?><worksheet><sheetData>
        |<row r="1"><c r="A1" s="1"><v>36526</v></c>
        |<c r="B1" s="0"><v>36526</v></c>
        |<c r="C1" s="2"><v>36526.25</v></c></row>
        |</sheetData></worksheet>""".stripMargin
    val styles =
      """<?xml version="1.0"?><styleSheet>
        |<numFmts count="1"><numFmt numFmtId="164" formatCode="yyyy\-mm\-dd"/></numFmts>
        |<cellXfs count="3"><xf numFmtId="0"/><xf numFmtId="164"/><xf numFmtId="22"/></cellXfs>
        |</styleSheet>""".stripMargin
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    def add(name: String, content: String): Unit = {
      z.putNextEntry(new java.util.zip.ZipEntry(name))
      z.write(content.getBytes("UTF-8")); z.closeEntry()
    }
    add("xl/worksheets/sheet1.xml", sheet)
    add("xl/styles.xml", styles)
    z.close()
    val rows = graft.ops.Xlsx.parse(bos.toByteArray, "0").map(_.cells)
    assert(rows(0) == Seq("2000-01-01", "36526", "2000-01-01 06:00:00"))
  }

  // ---- PNG decode ---------------------------------------------------
  import graft.llm.MediaHeaders

  private def gradient(w: Int, h: Int, bpp: Int): Array[Byte] = {
    val px = new Array[Byte](w * h * bpp)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until bpp)
      px((y * w + x) * bpp + c) = ((x * 7 + y * 11 + c * 3) % 256).toByte
    px
  }

  private def sums(px: Array[Byte], w: Int, h: Int, bpp: Int): (Long, Long, Long) = {
    var sr = 0L; var sg = 0L; var sb = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * bpp
      if (bpp == 1) { val g = px(o) & 0xff; sr += g; sg += g; sb += g }
      else { sr += px(o) & 0xff; sg += px(o + 1) & 0xff; sb += px(o + 2) & 0xff }
    }
    (sr, sg, sb)
  }

  test("png round-trip: every filter type, grey/RGB/RGBA, split IDAT") {
    for ((ct, bpp) <- Seq((0, 1), (2, 3), (6, 4)); ft <- 0 to 4) {
      val (w, h) = (17, 9)
      val px = gradient(w, h, bpp)
      val bytes = MediaHeaders.pngEncode(w, h, ct, px,
        filterFor = _ => ft, idatChunks = 3)
      val st = MediaHeaders.pngStats(bytes)
      assert(st != null, s"ct=$ct ft=$ft decoded to null")
      val (sr, sg, sb) = sums(px, w, h, bpp)
      assert((st.width, st.height, st.n_pixels) == (w, h, w.toLong * h))
      assert((st.sum_r, st.sum_g, st.sum_b) == (sr, sg, sb),
        s"ct=$ct ft=$ft channel sums differ")
    }
  }

  test("png decode: mixed per-scanline filters and 1x1 edge image") {
    val px = gradient(5, 7, 3)
    val bytes = MediaHeaders.pngEncode(5, 7, 2, px, filterFor = y => y % 5)
    val st = MediaHeaders.pngStats(bytes)
    assert(st != null && (st.sum_r, st.sum_g, st.sum_b) == sums(px, 5, 7, 3))
    val one = MediaHeaders.pngEncode(1, 1, 2, Array[Byte](10, 20, 30),
      filterFor = _ => 4) // Paeth with no left/up neighbours
    val s1 = MediaHeaders.pngStats(one)
    assert(s1 != null && (s1.sum_r, s1.sum_g, s1.sum_b) == ((10L, 20L, 30L)))
  }

  test("png decode: precise rejects and corrupt streams return null") {
    val good = MediaHeaders.pngEncode(4, 4, 2, gradient(4, 4, 3))
    assert(MediaHeaders.pngStats(good) != null)
    // truncated zlib stream
    assert(MediaHeaders.pngStats(
      java.util.Arrays.copyOfRange(good, 0, good.length - 20)) == null)
    // bad signature
    val bad = good.clone(); bad(0) = 0x00
    assert(MediaHeaders.pngStats(bad) == null)
    // unknown interlace method (2) -> precise reject (0 and 1 = Adam7
    // are both supported now)
    val il = good.clone(); il(8 + 8 + 12) = 2 // IHDR interlace byte
    assert(MediaHeaders.pngStats(il) == null)
    // truncated Adam7 stream: a valid interlaced encode with its last
    // IDAT bytes cut inflates short of the seven-pass raw layout
    val adam = MediaHeaders.pngEncode(4, 4, 2, gradient(4, 4, 3),
      interlace = true)
    assert(MediaHeaders.pngStats(adam) != null)
    assert(MediaHeaders.pngStats(
      java.util.Arrays.copyOfRange(adam, 0, adam.length - 20)) == null)
    // not a PNG at all / null
    assert(MediaHeaders.pngStats("plainly not a png".getBytes) == null)
    assert(MediaHeaders.pngStats(null) == null)
    // ct 3 without a PLTE chunk -> reject (decoder needs the palette)
    val pal = Array.tabulate(12)(i => (i * 20).toByte)
    val p3 = MediaHeaders.pngEncode(4, 4, 3,
      Array.tabulate[Byte](16)(i => (i % 4).toByte), depth = 8, palette = pal)
    assert(MediaHeaders.pngStats(p3) != null)
    val noPlte = {
      // splice the PLTE chunk out: sig(8) + IHDR(25) then PLTE(12+12)
      val b = p3
      val out = new java.io.ByteArrayOutputStream()
      out.write(b, 0, 8 + 25)
      out.write(b, 8 + 25 + 12 + 12, b.length - (8 + 25 + 12 + 12))
      out.toByteArray
    }
    assert(MediaHeaders.pngStats(noPlte) == null)
  }

  test("png round-trip: sub-8-bit grey depths scale exactly") {
    // depth d: samples 0..2^d-1, decoder rescales by v*255/(2^d-1)
    for (d <- Seq(1, 2, 4); ft <- 0 to 4) {
      val (w, h) = (13, 5) // 13 px/row: packed rows end mid-byte
      val maxV = (1 << d) - 1
      val px = Array.tabulate[Byte](w * h)(i => (i % (maxV + 1)).toByte)
      val bytes = MediaHeaders.pngEncode(w, h, 0, px,
        filterFor = _ => ft, depth = d)
      val st = MediaHeaders.pngStats(bytes)
      assert(st != null, s"d=$d ft=$ft decoded to null")
      val expect = px.map(v => (v & 0xff) * 255L / maxV).sum
      assert((st.width, st.height) == (w, h))
      assert(st.sum_r == expect && st.sum_g == expect && st.sum_b == expect,
        s"d=$d ft=$ft luma sum ${st.sum_r} != $expect")
    }
  }

  test("png round-trip: indexed colour resolves the PLTE at all depths") {
    for (d <- Seq(1, 2, 4, 8); ft <- 0 to 4) {
      val entries = math.min(1 << d, 256)
      val pal = Array.tabulate(entries * 3)(i => ((i * 53 + 7) % 256).toByte)
      val (w, h) = (11, 7)
      val idx = Array.tabulate[Byte](w * h)(i => (i % entries).toByte)
      val bytes = MediaHeaders.pngEncode(w, h, 3, idx,
        filterFor = _ => ft, depth = d, palette = pal)
      val st = MediaHeaders.pngStats(bytes)
      assert(st != null, s"palette d=$d ft=$ft decoded to null")
      var sr = 0L; var sg = 0L; var sb = 0L
      idx.foreach { i0 =>
        val i = i0 & 0xff
        sr += pal(3 * i) & 0xff; sg += pal(3 * i + 1) & 0xff
        sb += pal(3 * i + 2) & 0xff
      }
      assert((st.sum_r, st.sum_g, st.sum_b) == ((sr, sg, sb)),
        s"palette d=$d ft=$ft sums differ")
    }
  }

  test("png round-trip: grey+alpha and 16-bit depths (MSB rescale)") {
    // ct 4 depth 8: luma mirrored into all three sums, alpha ignored
    val (w, h) = (9, 6)
    val ga = Array.tabulate[Byte](w * h * 2)(i => ((i * 31 + 5) % 256).toByte)
    val st4 = MediaHeaders.pngStats(
      MediaHeaders.pngEncode(w, h, 4, ga, filterFor = y => y % 5))
    assert(st4 != null)
    val lumaSum = (0 until w * h).map(i => ga(2 * i) & 0xff).map(_.toLong).sum
    assert(st4.sum_r == lumaSum && st4.sum_g == lumaSum && st4.sum_b == lumaSum)
    // 16-bit: decoder takes the most significant byte of each sample
    for ((ct, ch) <- Seq((0, 1), (2, 3), (4, 2), (6, 4)); ft <- 0 to 4) {
      val px16 = Array.tabulate[Byte](w * h * ch * 2)(
        i => ((i * 29 + 3) % 256).toByte)
      val st = MediaHeaders.pngStats(MediaHeaders.pngEncode(
        w, h, ct, px16, filterFor = _ => ft, depth = 16))
      assert(st != null, s"16-bit ct=$ct ft=$ft decoded to null")
      def msb(sample: Int): Long = px16(sample * 2) & 0xff
      var sr = 0L; var sg = 0L; var sb = 0L
      for (i <- 0 until w * h) {
        if (ch <= 2) { val g = msb(i * ch); sr += g; sg += g; sb += g }
        else {
          sr += msb(i * ch); sg += msb(i * ch + 1); sb += msb(i * ch + 2)
        }
      }
      assert((st.sum_r, st.sum_g, st.sum_b) == ((sr, sg, sb)),
        s"16-bit ct=$ct ft=$ft sums differ")
    }
  }

  test("pngFeatures handles grey+alpha (2-byte pixels, luma mirrored)") {
    val (w, h) = (7, 5)
    val ga = Array.tabulate[Byte](w * h * 2)(i => ((i * 13 + 3) % 256).toByte)
    val f = MediaHeaders.pngFeatures(
      MediaHeaders.pngEncode(w, h, 4, ga, filterFor = y => y % 5), 8)
    assert(f != null, "ct-4 PNG must take the real-decode path")
    val meanLuma = (0 until w * h).map(i => ga(2 * i) & 0xff).sum
      .toDouble / (w * h) / 255.0
    assert(math.abs(f(0) - meanLuma) < 1e-6)
    assert(f(0) == f(1) && f(1) == f(2), "grey mirrors into all channels")
    assert(math.abs(f.drop(3).map(_.toDouble).sum - 1.0) < 1e-6)
  }

  test("png adam7: interlaced decode is pixel-identical to sequential") {
    // every legal (ct, depth) shape, at sizes that exercise empty and
    // partial Adam7 passes (1x1 leaves 6 of 7 passes empty; 13x5 ends
    // passes mid-step; 16x9 has all 7 passes non-empty)
    val shapes = Seq((0, 1), (0, 2), (0, 4), (0, 8), (0, 16), (2, 8),
      (2, 16), (3, 1), (3, 2), (3, 4), (3, 8), (4, 8), (4, 16), (6, 8),
      (6, 16))
    for ((ct, d) <- shapes; (w, h) <- Seq((1, 1), (3, 2), (8, 8), (13, 5),
        (16, 9))) {
      val ch = ct match { case 0 => 1; case 2 => 3; case 3 => 1
        case 4 => 2; case _ => 4 }
      val sb = if (d == 16) 2 else 1
      val maxV = if (d >= 8) 256 else 1 << d
      val px = Array.tabulate[Byte](w * h * ch * sb)(
        i => ((i * 37 + 11) % maxV).toByte)
      val entries = math.min(1 << d, 256)
      val pal = if (ct == 3)
        Array.tabulate(entries * 3)(i => ((i * 41 + 13) % 256).toByte)
      else null
      // cycle filters so the interlaced stream exercises per-pass
      // filter state (row 0 of EVERY pass must treat up as 0)
      val seq = MediaHeaders.pngDecode(MediaHeaders.pngEncode(
        w, h, ct, px, filterFor = i => (i + 1) % 5, depth = d,
        palette = pal))
      val adam = MediaHeaders.pngDecode(MediaHeaders.pngEncode(
        w, h, ct, px, filterFor = i => (i + 2) % 5, depth = d,
        palette = pal, interlace = true, idatChunks = 2))
      assert(seq != null && adam != null, s"ct=$ct d=$d ${w}x$h null")
      assert((adam.width, adam.height) == ((w, h)))
      assert(java.util.Arrays.equals(seq.pixels, adam.pixels),
        s"ct=$ct d=$d ${w}x$h adam7 pixels differ from sequential")
    }
  }

  // ---- GIF decode ---------------------------------------------------

  private def gifOracle(pal: Array[Byte], idx: Array[Byte], w: Int, h: Int)
      : (Long, Long, Long, Long) = {
    var sr = 0L; var sg = 0L; var sb = 0L; var ws = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val ci = idx(y * w + x) & 0xff
      val (r, g, b) = (pal(3 * ci) & 0xff, pal(3 * ci + 1) & 0xff,
        pal(3 * ci + 2) & 0xff)
      sr += r; sg += g; sb += b; ws += (y.toLong * w + x) * (r + g + b)
    }
    (sr, sg, sb, ws)
  }

  test("gif round-trip: palette sizes, interlace, dict growth, KwKwK") {
    val rnd = new scala.util.Random(42)
    for (palEntries <- Seq(4, 16, 64, 256); interlace <- Seq(false, true)) {
      val pal = Array.tabulate(palEntries * 3)(i => ((i * 37 + 11) % 256).toByte)
      val (w, h) = (23, 17)
      val idx = Array.tabulate(w * h)(_ => (rnd.nextInt(palEntries)).toByte)
      val bytes = MediaHeaders.gifEncode(w, h, pal, idx, interlace)
      val st = MediaHeaders.gifStats(bytes)
      assert(st != null, s"pal=$palEntries interlace=$interlace -> null")
      val (sr, sg, sb, ws) = gifOracle(pal, idx, w, h)
      assert((st.width, st.height, st.n_pixels) == (w, h, w.toLong * h))
      assert((st.sum_r, st.sum_g, st.sum_b, st.wsum) == ((sr, sg, sb, ws)),
        s"pal=$palEntries interlace=$interlace sums differ")
    }
    // KwKwK: long runs of one index hit the code-not-yet-in-table case
    val pal = Array.tabulate(12)(i => (i * 20).toByte) // 4 colors
    val runs = Array.fill(400)(2.toByte) ++ Array.fill(3)(1.toByte)
    val gif = MediaHeaders.gifEncode(31, 13, pal, runs, interlace = false)
    val st = MediaHeaders.gifStats(gif)
    assert(st != null && st.n_pixels == 403)
    assert((st.sum_r, st.sum_g, st.sum_b, st.wsum) ==
      gifOracle(pal, runs, 31, 13))
    // dict growth to 12 bits + reset: a large low-entropy image
    val big = Array.tabulate(300 * 200)(i => ((i / 7) % 256).toByte)
    val palF = Array.tabulate(256 * 3)(i => ((i * 3 + 5) % 256).toByte)
    val gbig = MediaHeaders.gifEncode(300, 200, palF, big, interlace = true)
    val sbg = MediaHeaders.gifStats(gbig)
    assert(sbg != null && sbg.n_pixels == 60000L)
    assert((sbg.sum_r, sbg.sum_g, sbg.sum_b, sbg.wsum) ==
      gifOracle(palF, big, 300, 200))
  }

  test("gif decode: precise rejects") {
    val pal = Array.tabulate(12)(i => (i * 20).toByte)
    val good = MediaHeaders.gifEncode(5, 4, pal, Array.fill(20)(1.toByte))
    assert(MediaHeaders.gifStats(good) != null)
    // truncated LZW
    assert(MediaHeaders.gifStats(
      java.util.Arrays.copyOfRange(good, 0, good.length - 4)) == null)
    // bad signature
    val bad = good.clone(); bad(4) = 'X'.toByte
    assert(MediaHeaders.gifStats(bad) == null)
    assert(MediaHeaders.gifStats("GIF89a but not really".getBytes) == null)
    assert(MediaHeaders.gifStats(null) == null)
  }

  // ---- BMP decode ---------------------------------------------------

  test("bmp round-trip: 24-bit both row orders, 8-bit palette, padding") {
    // odd width 7 forces 3-byte row padding in the 24-bit case
    val (w, h) = (7, 5)
    val px = gradient(w, h, 3)
    def expect(st: graft.llm.MediaHeaders.BmpStats): Unit = {
      assert(st != null)
      val (sr, sg, sb) = sums(px, w, h, 3)
      var ws = 0L
      for (i <- 0 until w * h)
        ws += i.toLong * ((px(3 * i) & 0xff) + (px(3 * i + 1) & 0xff) +
          (px(3 * i + 2) & 0xff))
      assert((st.width, st.height) == (w, h))
      assert((st.sum_r, st.sum_g, st.sum_b, st.wsum) == ((sr, sg, sb, ws)))
    }
    expect(MediaHeaders.bmpStats(MediaHeaders.bmpEncode(w, h, px)))
    expect(MediaHeaders.bmpStats(
      MediaHeaders.bmpEncode(w, h, px, topDown = true)))
    // 8-bit palette: indices (y*w+x) % 5 into a 5-color palette
    val pal = Array.tabulate(15)(i => ((i * 41 + 3) % 256).toByte)
    val idx = Array.tabulate(w * h)(i => (i % 5).toByte)
    val rgbExpanded = new Array[Byte](w * h * 3)
    for (i <- 0 until w * h; c <- 0 until 3)
      rgbExpanded(3 * i + c) = pal(3 * (idx(i) & 0xff) + c)
    val st8 = MediaHeaders.bmpStats(
      MediaHeaders.bmpEncode(w, h, idx, bits = 8, palette = pal))
    assert(st8 != null)
    val im8 = MediaHeaders.bmpDecode(
      MediaHeaders.bmpEncode(w, h, idx, bits = 8, palette = pal))
    assert(im8.rgb.toSeq == rgbExpanded.toSeq)
  }

  test("bmp decode: precise rejects") {
    val good = MediaHeaders.bmpEncode(4, 4, gradient(4, 4, 3))
    assert(MediaHeaders.bmpStats(good) != null)
    assert(MediaHeaders.bmpStats(
      java.util.Arrays.copyOfRange(good, 0, good.length - 8)) == null)
    val bad = good.clone(); bad(0) = 'X'.toByte
    assert(MediaHeaders.bmpStats(bad) == null)
    // RLE compression flag -> precise reject
    val rle = good.clone(); rle(30) = 1
    assert(MediaHeaders.bmpStats(rle) == null)
    assert(MediaHeaders.bmpStats(null) == null)
  }

  test("ogg/flac audio probes: STREAMINFO fields, page-walk duration, total") {
    // FLAC: 44.1 kHz stereo, 441000 samples → exactly 10 s
    val flac = MediaHeaders.flacBuild(44100, 2, 16, 441000L)
    assert(MediaHeaders.audioInfo(flac) ==
      MediaHeaders.AudioInfo("flac", "flac", 2, 44100, 10000L))
    // odd rate floor-divides
    val flac2 = MediaHeaders.flacBuild(48000, 1, 24, 100001L)
    assert(MediaHeaders.audioInfo(flac2).duration_ms == 100001L * 1000 / 48000)
    // Opus: granule counts 48 kHz samples minus pre-skip
    val opus = MediaHeaders.oggBuild("opus", 2, 48000, 96312L, preskip = 312)
    assert(MediaHeaders.audioInfo(opus) ==
      MediaHeaders.AudioInfo("ogg", "opus", 2, 48000, 2000L))
    // Vorbis: granule at the declared rate
    val vorbis = MediaHeaders.oggBuild("vorbis", 1, 22050, 44100L)
    assert(MediaHeaders.audioInfo(vorbis) ==
      MediaHeaders.AudioInfo("ogg", "vorbis", 1, 22050, 2000L))
    // generic prober names both containers with their duration
    assert(MediaHeaders.probe(flac) ==
      MediaHeaders.Probe("flac", null, null, 10000L))
    assert(MediaHeaders.probe(opus) ==
      MediaHeaders.Probe("ogg", null, null, 2000L))
    // AIFF: 80-bit extended-float rate, odd-chunk padding walk
    val aiff = MediaHeaders.aiffBuild(2, 88200L, 44100)
    assert(MediaHeaders.audioInfo(aiff) ==
      MediaHeaders.AudioInfo("aiff", "pcm", 2, 44100, 2000L))
    // AIFF-C names its compression fourcc; non-pow2 rate decodes exact
    val aifc = MediaHeaders.aiffBuild(1, 22050L * 3, 22050, aifc = true,
      compression = "sowt")
    assert(MediaHeaders.audioInfo(aifc) ==
      MediaHeaders.AudioInfo("aifc", "sowt", 1, 22050, 3000L))
    // the router segregates AIFF like the other audio containers
    assert(graft.sources.Extract.extractAny(aiff) == ("aiff", null))
    // totality: junk, truncations, every-byte mutants of the fixtures
    assert(MediaHeaders.audioInfo(null) == null)
    assert(MediaHeaders.audioInfo("junk bytes but long enough".getBytes) == null)
    for (base <- Seq(flac, opus, vorbis, aiff, aifc)) {
      for (n <- 0 until base.length)
        MediaHeaders.audioInfo(java.util.Arrays.copyOf(base, n))
      for (i <- base.indices; v <- Seq(0x00, 0xff)) {
        val m = base.clone(); m(i) = v.toByte
        MediaHeaders.audioInfo(m)
      }
    }
  }

  test("audio tags: FLAC VORBIS_COMMENT, OpusTags, Vorbis comments, ID3v2.3/2.4") {
    import graft.llm.MediaHeaders.AudioTags
    val tags = Seq("TITLE" -> "Song A", "ARTIST" -> "Band B",
      "ALBUM" -> "LP C", "DATE" -> "2024")
    val flac = MediaHeaders.flacBuild(44100, 2, 16, 441000L,
      vendor = "graftenc", tags = tags)
    assert(MediaHeaders.audioTags(flac) ==
      AudioTags("flac", "Song A", "Band B", "LP C", "graftenc", 4))
    // audioInfo still reads the STREAMINFO past the extra block
    assert(MediaHeaders.audioInfo(flac).duration_ms == 10000L)
    val opus = MediaHeaders.oggBuild("opus", 2, 48000, 96312L,
      vendor = "libopus", tags = tags.take(2))
    assert(MediaHeaders.audioTags(opus) ==
      AudioTags("ogg", "Song A", "Band B", null, "libopus", 2))
    assert(MediaHeaders.audioInfo(opus).duration_ms == 2000L)
    val vorb = MediaHeaders.oggBuild("vorbis", 1, 22050, 44100L,
      vendor = "libvorbis", tags = Seq("title" -> "lower key"))
    // keys normalize to upper case (the Vorbis spec's case rule)
    assert(MediaHeaders.audioTags(vorb) ==
      AudioTags("ogg", "lower key", null, null, "libvorbis", 1))
    for (v4 <- Seq(false, true)) {
      val mp3 = MediaHeaders.id3Build("T1", "A1", "L1", v4 = v4)
      assert(MediaHeaders.audioTags(mp3) ==
        AudioTags("mp3", "T1", "A1", "L1", null, 3), s"v4=$v4")
    }
    // tag-less containers: named, empty
    assert(MediaHeaders.audioTags(
      MediaHeaders.flacBuild(8000, 1, 16, 100L)).n_tags == 0)
    assert(MediaHeaders.audioTags("junk bytes".getBytes) == null)
    assert(MediaHeaders.audioTags(null) == null)
    // totality: mutants + truncations over all four fixture families
    for (base <- Seq(flac, opus, vorb,
      MediaHeaders.id3Build("x", "y", "z"))) {
      for (i <- base.indices; v <- Seq(0x00, 0xff)) {
        val m = base.clone(); m(i) = v.toByte
        MediaHeaders.audioTags(m)
      }
      for (n <- 0 until base.length)
        MediaHeaders.audioTags(java.util.Arrays.copyOf(base, n))
    }
  }

  test("jpeg exif: both byte orders round-trip, NUL-terminated strings, total") {
    for (le <- Seq(true, false)) {
      val jpg = MediaHeaders.exifBuild(le, orientation = 6,
        make = "Canon", model = "EOS R5 Mark II",
        datetime = "2024:03:01 10:20:30",
        dtOriginal = "2024:02:28 09:00:00", pixelW = 8192, pixelH = 5464)
      val e = MediaHeaders.exifInfo(jpg)
      assert(e == MediaHeaders.ExifInfo(if (le) "II" else "MM", 6,
        "Canon", "EOS R5 Mark II", "2024:03:01 10:20:30",
        "2024:02:28 09:00:00", 8192, 5464), s"le=$le: $e")
      // the generic image probe still sees a jpeg (no SOF → null dims)
      assert(MediaHeaders.probe(jpg).format == "jpeg")
    }
    // non-exif jpeg / non-jpeg: null
    assert(MediaHeaders.exifInfo(Array[Byte](0xff.toByte, 0xd8.toByte,
      0xff.toByte, 0xd9.toByte)) == null)
    assert(MediaHeaders.exifInfo("junk".getBytes) == null)
    assert(MediaHeaders.exifInfo(null) == null)
    // totality: every-byte x2 mutants + all truncations of a real fixture
    val base = MediaHeaders.exifBuild(littleEndian = true, 1, "M", "X",
      "2024:01:01 00:00:00", "2024:01:01 00:00:00", 10, 20)
    for (i <- base.indices; v <- Seq(0x00, 0xff)) {
      val m = base.clone(); m(i) = v.toByte
      MediaHeaders.exifInfo(m)
    }
    for (n <- 0 until base.length)
      MediaHeaders.exifInfo(java.util.Arrays.copyOf(base, n))
  }

  // ---- MP4 sample tables --------------------------------------------

  test("mp4 sample tables: stsz/stsc/stco round-trip with keyframes") {
    val samples = (0 until 7).map(i =>
      Array.tabulate(5 + i)(j => ((i * 31 + j * 7) % 256).toByte))
    val bytes = MediaHeaders.mp4Build(samples, samplesPerChunk = 3,
      keyframes1Based = Seq(1, 4, 7))
    val got = MediaHeaders.mp4Samples(bytes)
    assert(got.length == 7)
    for ((s0, i) <- got.zipWithIndex) {
      assert(s0.index == i && s0.size == 5 + i)
      assert(s0.keyframe == Seq(0, 3, 6).contains(i), s"keyframe @$i")
      val slice = java.util.Arrays.copyOfRange(
        bytes, s0.offset.toInt, (s0.offset + s0.size).toInt)
      assert(slice.toSeq == samples(i).toSeq, s"sample $i bytes differ")
    }
    // degenerate: not an mp4 / empty
    assert(MediaHeaders.mp4Samples("junk".getBytes).isEmpty)
    assert(MediaHeaders.mp4Samples(null).isEmpty)
  }

  test("mp4 stts decode times: timescale-scaled ms, run-length entries") {
    val samples = (0 until 6).map(i => Array.fill(4)(i.toByte))
    // 90 kHz timescale (the real video norm): three 3003-tick deltas
    // (~33.37 ms NTSC frames) then three 9000-tick (100 ms) — two stts
    // runs; decode time of sample i = cumsum of prior deltas
    val deltas = Seq(3003L, 3003L, 3003L, 9000L, 9000L, 9000L)
    val bytes = MediaHeaders.mp4Build(samples, samplesPerChunk = 2,
      keyframes1Based = Seq(1), deltas = deltas, timescale = 90000L)
    val got = MediaHeaders.mp4Samples(bytes)
    assert(got.map(_.timestamp) == Seq(0L, 33L, 66L, 100L, 200L, 300L))
    // without stts the field stays -1 (prior fixtures unchanged)
    val plain = MediaHeaders.mp4Build(samples, 2, Seq(1))
    assert(MediaHeaders.mp4Samples(plain).forall(_.timestamp == -1L))
    // DataFrame surface carries it
    import org.apache.spark.sql.Row
    val d = df("id BIGINT, v BINARY", Seq(Row(1L, bytes)))
    val ts = graft.llm.Multimodal.sampleFramesMp4(d, "v", "id")
      .select("timestamp").collect().map(_.getLong(0)).toSeq
    assert(ts == Seq(0L, 33L, 66L, 100L, 200L, 300L))
  }

  test("mp4 multi-track: first trak's timescale pairs with its stts") {
    // a second (audio) trak with mdhd timescale 44100 must NOT rescale
    // the first trak's 3003-tick @ 90 kHz video times — timescale is
    // first-wins like every other sample table
    val samples = (0 until 3).map(i => Array.fill(4)(i.toByte))
    val base = MediaHeaders.mp4Build(samples, 2, Seq(1),
      deltas = Seq(3003L, 3003L, 3003L), timescale = 90000L)
    def be(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(id: String, p: Array[Byte]): Array[Byte] =
      be(8L + p.length) ++ id.getBytes("US-ASCII") ++ p
    val audioTrak = box("trak", box("mdia",
      box("mdhd", be(0) ++ be(0) ++ be(0) ++ be(44100L) ++ be(0) ++ be(0))))
    // splice the audio trak in right after moov's header: moov size
    // grows by the trak's length; outer offsets into mdat shift too,
    // so rebuild instead: append trak INSIDE moov by patching sizes is
    // brittle — walk order is what matters, so put the audio trak in a
    // SECOND moov after the first (the walker recurses both in order)
    val bytes = base ++ box("moov", audioTrak)
    val got = MediaHeaders.mp4Samples(bytes)
    assert(got.map(_.timestamp) == Seq(0L, 33L, 66L),
      s"audio mdhd must not rescale video times: ${got.map(_.timestamp)}")
  }

  test("mp4 per-trak pairing: a later trak's stts never pairs with " +
      "the first trak's sample tables (r15 advice)") {
    // first trak: stsz/stsc/stco but NO stts/mdhd; second trak: stts
    // + mdhd only. Independent first-wins capture used to marry
    // trak2's stts to trak1's layout and emit bogus timestamps — the
    // per-trak walk must leave them -1 instead.
    val samples = (0 until 3).map(i => Array.fill(4)(i.toByte))
    val base = MediaHeaders.mp4Build(samples, 2, Seq(1))
    def be(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(id: String, p: Array[Byte]): Array[Byte] =
      be(8L + p.length) ++ id.getBytes("US-ASCII") ++ p
    val sttsB = box("stts", be(0) ++ be(1) ++ be(3) ++ be(500))
    val mdhdB = box("mdhd",
      be(0) ++ be(0) ++ be(0) ++ be(90000L) ++ be(1500) ++ be(0))
    val other = box("moov", box("trak", box("mdia",
      mdhdB ++ box("minf", box("stbl", sttsB)))))
    val got = MediaHeaders.mp4Samples(base ++ other)
    assert(got.length == 3)
    assert(got.forall(_.timestamp == -1L),
      s"cross-trak stts pairing: ${got.map(_.timestamp)}")
    // and the sample layout still comes from the first (complete) trak
    assert(got.map(_.size) == Seq(4L, 4L, 4L))
  }

  test("mp4 timed text: tx3g track routed by stsd, muxed with video, " +
      "timestamps from its own mdhd") {
    import graft.llm.MediaHeaders.{Mp4TrackSpec, Mp4Cue}
    // muxed file: video trak FIRST (avc1, no captions), tx3g second —
    // the codec routing must find the text track past the video one
    val video = Mp4TrackSpec("avc1",
      (0 until 4).map(i => Array.fill(10 + i)(i.toByte)),
      deltas = Seq(40L, 40L, 40L, 40L), timescale = 1000L)
    val text = Mp4TrackSpec("tx3g",
      Seq("first cue", "second cue", "third cue")
        .map(MediaHeaders.tx3gSample),
      // 90 kHz track timescale: 2 s, 3 s, 1 s cues
      deltas = Seq(180000L, 270000L, 90000L), timescale = 90000L)
    val muxed = MediaHeaders.mp4BuildTracks(Seq(video, text))
    val cues = MediaHeaders.mp4Subtitles(muxed)
    assert(cues == Seq(
      Mp4Cue(1, 0L, 2000L, "first cue"),
      Mp4Cue(1, 2000L, 3000L, "second cue"),
      Mp4Cue(1, 5000L, 1000L, "third cue")), cues)
    // mp4Samples still reads the FIRST trak (the video)
    val vs = MediaHeaders.mp4Samples(muxed)
    assert(vs.length == 4 && vs.map(_.size) == Seq(10L, 11L, 12L, 13L))
    assert(vs.map(_.timestamp) == Seq(0L, 40L, 80L, 120L))
    // extract-text: the caption track IS the video's text
    assert(graft.sources.Extract.extractAny(muxed) ==
      (("mp4", "first cue\nsecond cue\nthird cue")))
    // caption-less video: named, textless
    val bare = MediaHeaders.mp4BuildTracks(Seq(video))
    assert(MediaHeaders.mp4Subtitles(bare).isEmpty)
    assert(graft.sources.Extract.extractAny(bare) == (("mp4", null)))
    // the single-trak builder keeps working through the refactor
    val legacy = MediaHeaders.mp4Build(
      (0 until 3).map(i => Array.fill(4)(i.toByte)), 2, Seq(1))
    assert(MediaHeaders.mp4Samples(legacy).length == 3)
    // totality: mutants + truncations over the muxed fixture
    for (i <- muxed.indices; v <- Seq(0x00, 0xff)) {
      val m = muxed.clone(); m(i) = v.toByte
      MediaHeaders.mp4Subtitles(m)
    }
    for (n <- 0 until muxed.length)
      MediaHeaders.mp4Subtitles(java.util.Arrays.copyOf(muxed, n))
  }

  test("sampleFramesMp4 emits real samples; keyframesOnly filters") {
    import org.apache.spark.sql.Row
    val samples = (0 until 6).map(i => Array.fill(4)(i.toByte))
    val bytes = graft.llm.MediaHeaders.mp4Build(samples, 2, Seq(1, 5))
    val d = df("id BIGINT, v BINARY", Seq(Row(1L, bytes)))
    val all = graft.llm.Multimodal.sampleFramesMp4(d, "v", "id").collect()
    assert(all.length == 6)
    assert(all.map(_.getAs[Array[Byte]]("frame").head.toInt).toSeq ==
      Seq(0, 1, 2, 3, 4, 5))
    val kf = graft.llm.Multimodal
      .sampleFramesMp4(d, "v", "id", keyframesOnly = true).collect()
    assert(kf.map(_.getAs[Int]("sample_idx")).toSeq == Seq(0, 4))
  }

  // ---- Matroska/WebM sample extraction ------------------------------

  test("webm samples: cluster/SimpleBlock/BlockGroup round-trip") {
    val frames = (0 until 6).map(i =>
      Array.tabulate(5 + i)(j => ((i * 31 + j * 7) % 256).toByte))
    // cluster 0 (ts 0): samples 0-2; cluster 1 (ts 1000): samples 3-5.
    // samples 1 and 4 are written as BlockGroup/Block (1 keyframe, 4
    // not → ReferenceBlock present); the rest as SimpleBlocks.
    def s(i: Int) = MediaHeaders.WebmBlockSpec(1L, i * 40, i % 2 == 1,
      i == 1 || i == 4, frames(i))
    val bytes = MediaHeaders.webmBuild(Seq(
      (0L, (0 until 3).map(s)), (1000L, (3 until 6).map(s))))
    val got = MediaHeaders.webmSamples(bytes)
    assert(got.length == 6)
    for ((g0, i) <- got.zipWithIndex) {
      assert(g0.index == i && g0.track == 1L && g0.size == 5 + i)
      assert(g0.timestamp == (if (i < 3) 0 else 1000) + i * 40, s"ts @$i")
      assert(g0.keyframe == (i % 2 == 1), s"keyframe @$i")
      val slice = java.util.Arrays.copyOfRange(
        bytes, g0.offset.toInt, (g0.offset + g0.size).toInt)
      assert(slice.toSeq == frames(i).toSeq, s"sample $i bytes differ")
    }
    // degenerate: not EBML / empty / truncated
    assert(MediaHeaders.webmSamples("junk".getBytes).isEmpty)
    assert(MediaHeaders.webmSamples(null).isEmpty)
    MediaHeaders.webmSamples(bytes.take(bytes.length / 2)) // total
    // mutation totality (the mp4/PropertySpec pattern)
    val rnd = new scala.util.Random(7)
    (0 until 300).foreach { _ =>
      val m = bytes.clone()
      (0 until 3).foreach(_ =>
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte)
      MediaHeaders.webmSamples(m) // must not throw
    }
  }

  test("webm lacing: Xiph, fixed-size, and EBML laced frames expand to rows") {
    import graft.llm.MediaHeaders.WebmBlockSpec
    // Xiph: three frames incl. one >= 255 bytes (multi-byte size code)
    val xf = Seq(Array.fill(300)(1.toByte), Array.fill(7)(2.toByte),
      Array.fill(11)(3.toByte))
    // EBML: growing then shrinking sizes exercise signed deltas
    val ef = Seq(Array.fill(10)(4.toByte), Array.fill(40)(5.toByte),
      Array.fill(5)(6.toByte), Array.fill(9)(7.toByte))
    // fixed: four equal frames
    val ff = (0 until 4).map(i => Array.fill(6)((10 + i).toByte))
    val bytes = MediaHeaders.webmBuild(Seq((100L, Seq(
      WebmBlockSpec(3L, 10, keyframe = true, useGroup = false, null,
        lacing = 1, lacedFrames = xf),
      WebmBlockSpec(3L, 20, keyframe = false, useGroup = false, null,
        lacing = 3, lacedFrames = ef),
      WebmBlockSpec(3L, 30, keyframe = true, useGroup = false, null,
        lacing = 2, lacedFrames = ff)))))
    val got = MediaHeaders.webmSamples(bytes)
    assert(got.length == 11, s"3+4+4 laced frames, got ${got.length}")
    val expect = (xf.map(f => (110L, f)) ++ ef.map(f => (120L, f)) ++
      ff.map(f => (130L, f)))
    for (((ts, f), i) <- expect.zipWithIndex) {
      val g = got(i)
      assert(g.index == i && g.timestamp == ts && g.size == f.length,
        s"frame $i: got $g")
      val slice = java.util.Arrays.copyOfRange(
        bytes, g.offset.toInt, (g.offset + g.size).toInt)
      assert(slice.toSeq == f.toSeq, s"frame $i bytes differ")
    }
    // keyframe flag shared across a block's laced frames
    assert(got.take(3).forall(_.keyframe) && !got.slice(3, 7).exists(_.keyframe))
    // hostile: fixed lacing with a non-dividing remainder drops the block
    val m = bytes.clone()
    // mutate a payload byte is harmless; instead check totality sweep
    val rnd = new scala.util.Random(11)
    (0 until 300).foreach { _ =>
      val h = bytes.clone()
      (0 until 3).foreach(_ =>
        h(rnd.nextInt(h.length)) = rnd.nextInt(256).toByte)
      MediaHeaders.webmSamples(h) // must not throw
    }
    assert(m.length == bytes.length)
  }

  test("webm ASS subtitles: dialogue fields and override tags stripped") {
    import graft.llm.MediaHeaders.WebmBlockSpec
    // Matroska S_TEXT/ASS block payload: ReadOrder,Layer,Style,Name,
    // MarginL,MarginR,MarginV,Effect,Text
    val assCue = "1,0,Default,,0,0,0,," +
      "{\\i1}Hello{\\i0} there,\\Nsecond line"
    val bytes = MediaHeaders.webmBuild(Seq((0L, Seq(
      WebmBlockSpec(2L, 0, keyframe = true, useGroup = true,
        assCue.getBytes("UTF-8"), durationMs = 900L)))),
      tracks = Seq((2L, "S_TEXT/ASS")), docType = "matroska")
    val cues = MediaHeaders.webmSubtitles(bytes)
    // a comma INSIDE the text (after the 8 field commas) survives
    assert(cues.map(_.text) == Seq("Hello there,\nsecond line"))
    // UTF8 cues stay verbatim
    val utf8 = MediaHeaders.webmBuild(Seq((0L, Seq(
      WebmBlockSpec(2L, 0, keyframe = true, useGroup = true,
        "a,b{\\x}".getBytes("UTF-8"), durationMs = 900L)))),
      tracks = Seq((2L, "S_TEXT/UTF8")), docType = "matroska")
    assert(MediaHeaders.webmSubtitles(utf8).map(_.text) == Seq("a,b{\\x}"))
    // malformed ASS payload (too few commas): kept as-is, no throw
    val bad = MediaHeaders.webmBuild(Seq((0L, Seq(
      WebmBlockSpec(2L, 0, keyframe = true, useGroup = true,
        "no fields here".getBytes("UTF-8"), durationMs = 900L)))),
      tracks = Seq((2L, "S_TEXT/ASS")), docType = "matroska")
    assert(MediaHeaders.webmSubtitles(bad).map(_.text) == Seq("no fields here"))
  }

  test("webm TimestampScale: non-default tick size converts to real ms") {
    import graft.llm.MediaHeaders.WebmBlockSpec
    // 0.5 ms ticks (scale 500,000 ns): cluster ts 2000 ticks = 1000 ms,
    // rel 100 ticks = 50 ms, BlockDuration 1800 ticks = 900 ms
    val blocks = Seq(
      WebmBlockSpec(1L, 100, keyframe = true, useGroup = false,
        Array[Byte](1, 2, 3)),
      WebmBlockSpec(2L, 100, keyframe = true, useGroup = true,
        "cue".getBytes("UTF-8"), durationMs = 1800L))
    val bytes = MediaHeaders.webmBuild(Seq((2000L, blocks)),
      tracks = Seq((1L, "V_VP9"), (2L, "S_TEXT/UTF8")),
      docType = "matroska", timestampScaleNs = 500000L)
    val got = MediaHeaders.webmSamples(bytes)
    assert(got.map(_.timestamp) == Seq(1050L, 1050L))
    assert(got(1).duration == 900L)
    val cues = MediaHeaders.webmSubtitles(bytes)
    assert(cues.map(c => (c.start, c.duration)) == Seq((1050L, 900L)))
    // default scale unchanged: same ticks ARE ms
    val dflt = MediaHeaders.webmBuild(Seq((2000L, blocks)))
    assert(MediaHeaders.webmSamples(dflt).head.timestamp == 2100L)
  }

  test("webm subtitles: S_TEXT track cues extracted, video blocks ignored") {
    import graft.llm.MediaHeaders.WebmBlockSpec
    val blocks = Seq(
      WebmBlockSpec(1L, 0, keyframe = true, useGroup = false,
        Array[Byte](1, 2, 3)), // video frame: must not become a cue
      WebmBlockSpec(2L, 100, keyframe = true, useGroup = true,
        "first cue".getBytes("UTF-8"), durationMs = 900L),
      WebmBlockSpec(2L, 2000, keyframe = true, useGroup = true,
        "sécond cue".getBytes("UTF-8"), durationMs = 1200L))
    val bytes = MediaHeaders.webmBuild(Seq((5000L, blocks)),
      tracks = Seq((1L, "V_VP9"), (2L, "S_TEXT/UTF8")),
      docType = "matroska")
    val cues = MediaHeaders.webmSubtitles(bytes)
    assert(cues.map(c => (c.track, c.start, c.duration, c.text)) == Seq(
      (2L, 5100L, 900L, "first cue"), (2L, 7000L, 1200L, "sécond cue")))
    // the video track's frames still come through the sample walker
    assert(MediaHeaders.webmSamples(bytes).count(_.track == 1L) == 1)
    // no Tracks element → no S_TEXT routing → no cues (but no throw)
    val untracked = MediaHeaders.webmBuild(Seq((0L, blocks)))
    assert(MediaHeaders.webmSubtitles(untracked).isEmpty)
    assert(MediaHeaders.webmSubtitles("junk".getBytes).isEmpty)
    assert(MediaHeaders.webmSubtitles(null).isEmpty)
    // DataFrame op
    import org.apache.spark.sql.Row
    val d = df("id BIGINT, v BINARY", Seq(Row(9L, bytes)))
    val rows = graft.llm.Multimodal.extractWebmSubtitles(d, "v", "id")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(4)))
    assert(rows.toSeq == Seq((9L, 5100L, "first cue"),
      (9L, 7000L, "sécond cue")))
  }

  test("sampleFramesWebm emits real frames; keyframesOnly filters") {
    import org.apache.spark.sql.Row
    val frames = (0 until 6).map(i => Array.fill(4)(i.toByte))
    def s(i: Int) = graft.llm.MediaHeaders.WebmBlockSpec(1L, i * 40,
      i == 0 || i == 4, false, frames(i))
    val bytes = graft.llm.MediaHeaders.webmBuild(
      Seq((0L, (0 until 6).map(s))))
    val d = df("id BIGINT, v BINARY", Seq(Row(1L, bytes)))
    val all = graft.llm.Multimodal.sampleFramesWebm(d, "v", "id").collect()
    assert(all.length == 6)
    assert(all.map(_.getAs[Array[Byte]]("frame").head.toInt).toSeq ==
      Seq(0, 1, 2, 3, 4, 5))
    val kf = graft.llm.Multimodal
      .sampleFramesWebm(d, "v", "id", keyframesOnly = true).collect()
    assert(kf.map(_.getAs[Int]("sample_idx")).toSeq == Seq(0, 4))
  }

  // ---- JPEG decode (ImageIO) ---------------------------------------

  test("jpeg round-trip: exact dims, means within DCT tolerance") {
    val (w, h) = (16, 12)
    val px = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      px(o) = (40 + 4 * x).toByte    // smooth ramps keep error small
      px(o + 1) = (30 + 3 * y).toByte
      px(o + 2) = 64.toByte
    }
    val bytes = MediaHeaders.jpegEncode(w, h, px)
    assert(bytes.length > 100 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xff) == 0xd8)
    val st = MediaHeaders.jpegStats(bytes)
    assert(st != null && (st.width, st.height) == ((w, h)))
    def mean(sum: Long) = sum.toDouble / st.n_pixels
    assert(math.abs(mean(st.sum_r) - (40 + 2.0 * (w - 1))) < 8)
    assert(math.abs(mean(st.sum_g) - (30 + 1.5 * (h - 1))) < 8)
    assert(math.abs(mean(st.sum_b) - 64.0) < 8)
    val f = MediaHeaders.jpegFeatures(bytes, 8)
    assert(f != null && f.length == 8 && math.abs(f.drop(3).sum - 1.0f) < 1e-5)
    // rejects
    assert(MediaHeaders.jpegStats("not a jpeg".getBytes) == null)
    assert(MediaHeaders.jpegStats(
      java.util.Arrays.copyOfRange(bytes, 0, 20)) == null)
    assert(MediaHeaders.jpegStats(null) == null)
  }
}

/** Hand-rolled [MS-CFB] + [MS-XLS] BIFF8 fixture writer (test-only). */
object XlsFixture {

  /** Generic grid → BIFF8 workbook: strings as inline LABELs, numbers
    * as NUMBER records (for the round-trip property test). */
  def biffFromGrid(rows: Seq[Seq[Any]]): Array[Byte] = {
    val cells = new java.io.ByteArrayOutputStream()
    rows.zipWithIndex.foreach { case (cols, ri) =>
      cols.zipWithIndex.foreach {
        case (s: String, ci) =>
          val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
          cells.write(rec(0x0204, u16(ri) ++ u16(ci) ++ u16(0) ++
            u16(s.length) ++ Array(1.toByte) ++ b)) // uncompressed utf-16
        case (d: Double, ci) =>
          cells.write(rec(0x0203, u16(ri) ++ u16(ci) ++ u16(0) ++ dbl(d)))
        case (other, ci) =>
          throw new IllegalArgumentException(s"unsupported cell $other at $ci")
      }
    }
    val sheet =
      rec(0x0809, u16(0x0600) ++ u16(0x0010) ++ u32(0) ++ u32(0)) ++
        cells.toByteArray ++ rec(0x000A, Array.empty)
    def globals(sheetPos: Int) =
      rec(0x0809, u16(0x0600) ++ u16(0x0005) ++ u32(0) ++ u32(0)) ++
        rec(0x0085, u32(sheetPos) ++ u16(0) ++
          Array(6.toByte, 0.toByte) ++ ascii("Sheet1")) ++
        rec(0x000A, Array.empty)
    val gLen = globals(0).length
    globals(gLen) ++ sheet
  }
  private def u16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def u32(v: Int): Array[Byte] =
    Array(v, v >> 8, v >> 16, v >> 24).map(x => (x & 0xff).toByte)
  private def rec(id: Int, data: Array[Byte]): Array[Byte] =
    u16(id) ++ u16(data.length) ++ data
  private def dbl(d: Double): Array[Byte] = {
    val bits = java.lang.Double.doubleToLongBits(d)
    (0 until 8).map(i => ((bits >>> (8 * i)) & 0xff).toByte).toArray
  }
  private def ascii(s: String) = s.getBytes("ISO-8859-1")

  /** BIFF8 workbook stream: globals (BOF, BOUNDSHEET, SST with a
    * CONTINUE-split string, EOF) + one worksheet substream. */
  def biffWorkbook(vers: Int = 0x0600): Array[Byte] = {
    // SST: "alpha" whole; "continued!" split after 4 chars — the
    // CONTINUE record re-announces the flags byte before "inued!"
    val sstData = u32(2) ++ u32(2) ++
      (u16(5) ++ Array(0.toByte) ++ ascii("alpha")) ++
      (u16(10) ++ Array(0.toByte) ++ ascii("cont"))
    val continueData = Array(0.toByte) ++ ascii("inued!")
    def labelsst(r: Int, c: Int, isst: Int) =
      rec(0x00FD, u16(r) ++ u16(c) ++ u16(0) ++ u32(isst))
    val sheet =
      rec(0x0809, u16(vers) ++ u16(0x0010) ++ u32(0) ++ u32(0)) ++
        labelsst(0, 0, 0) ++
        rec(0x0203, u16(0) ++ u16(1) ++ u16(0) ++ dbl(3.14)) ++
        rec(0x027E, u16(0) ++ u16(2) ++ u16(0) ++ u32((42 << 2) | 2)) ++
        // MULRK row1 cols0-1: RK ints 1 and RK double 2.5
        rec(0x00BD, u16(1) ++ u16(0) ++
          (u16(0) ++ u32((1 << 2) | 2)) ++
          (u16(0) ++ u32((java.lang.Double.doubleToLongBits(2.5) >>> 32).toInt
            & 0xFFFFFFFC)) ++ u16(1)) ++
        labelsst(1, 2, 1) ++
        // inline LABEL string
        rec(0x0204, u16(2) ++ u16(0) ++ u16(0) ++
          u16(6) ++ Array(0.toByte) ++ ascii("inline")) ++
        rec(0x0205, u16(2) ++ u16(1) ++ u16(0) ++ Array(1.toByte, 0.toByte)) ++
        // FORMULA with cached numeric result 7 (no parsed expression)
        rec(0x0006, u16(2) ++ u16(2) ++ u16(0) ++ dbl(7.0) ++
          u16(0) ++ u32(0) ++ u16(0)) ++
        rec(0x000A, Array.empty)
    def globals(sheetPos: Int) =
      rec(0x0809, u16(vers) ++ u16(0x0005) ++ u32(0) ++ u32(0)) ++
        rec(0x0085, u32(sheetPos) ++ u16(0) ++
          Array(6.toByte, 0.toByte) ++ ascii("Sheet1")) ++
        rec(0x00FC, sstData) ++ rec(0x003C, continueData) ++
        rec(0x000A, Array.empty)
    val gLen = globals(0).length
    globals(gLen) ++ sheet
  }

  /** BIFF8 workbook with FORMAT/XF records: XF0=General, XF1=builtin
    * 14 (m/d/yy), XF2=custom 164 ("yyyy\-mm\-dd"), XF3=builtin 22
    * (m/d/yy h:mm), XF4=builtin 21 (h:mm:ss).
    */
  def biffDateWorkbook(): Array[Byte] = {
    def xf(ifmt: Int) = rec(0x00E0, u16(0) ++ u16(ifmt) ++ u16(0))
    val fmtStr = "yyyy\\-mm\\-dd"
    val format = rec(0x041E,
      u16(164) ++ u16(fmtStr.length) ++ Array(0.toByte) ++ ascii(fmtStr))
    def num(r0: Int, c0: Int, ixfe: Int, d: Double) =
      rec(0x0203, u16(r0) ++ u16(c0) ++ u16(ixfe) ++ dbl(d))
    def rkInt(v: Int) = u32((v << 2) | 2)
    val sheet =
      rec(0x0809, u16(0x0600) ++ u16(0x0010) ++ u32(0) ++ u32(0)) ++
        num(0, 0, 0, 3.14) ++
        num(0, 1, 1, 36526.0) ++
        rec(0x027E, u16(0) ++ u16(2) ++ u16(2) ++ rkInt(36527)) ++
        num(1, 0, 3, 36526.5) ++
        num(1, 1, 4, 6.5 / 24.0) ++
        // MULRK row1 cols2-3: General 42, then a date-formatted serial
        rec(0x00BD, u16(1) ++ u16(2) ++
          (u16(0) ++ rkInt(42)) ++ (u16(1) ++ rkInt(36526)) ++ u16(3)) ++
        // row2: FORMULA cells with cached numeric results — a date XF
        // must render the cached serial as a date (POI getDateCellValue
        // parity), a General XF keeps it numeric
        rec(0x0006, u16(2) ++ u16(0) ++ u16(1) ++ dbl(36526.0) ++
          u16(0) ++ u32(0) ++ u16(0)) ++
        rec(0x0006, u16(2) ++ u16(1) ++ u16(0) ++ dbl(36526.0) ++
          u16(0) ++ u32(0) ++ u16(0)) ++
        rec(0x000A, Array.empty)
    def globals(sheetPos: Int) =
      rec(0x0809, u16(0x0600) ++ u16(0x0005) ++ u32(0) ++ u32(0)) ++
        rec(0x0085, u32(sheetPos) ++ u16(0) ++
          Array(6.toByte, 0.toByte) ++ ascii("Sheet1")) ++
        format ++ xf(0) ++ xf(14) ++ xf(164) ++ xf(22) ++ xf(21) ++
        rec(0x000A, Array.empty)
    val gLen = globals(0).length
    globals(gLen) ++ sheet
  }

  private val FREE = 0xFFFFFFFF
  private val EOC = 0xFFFFFFFE
  private val FATSECT = 0xFFFFFFFD

  private def dirEntry(name: String, typ: Int, child: Int, start: Int,
      size: Int): Array[Byte] = {
    val e = new Array[Byte](128)
    val nm = name.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
    System.arraycopy(nm, 0, e, 0, nm.length)
    def put(off: Int, b: Array[Byte]): Unit =
      System.arraycopy(b, 0, e, off, b.length)
    put(64, u16(nm.length + 2)) // incl UTF-16 null terminator
    e(66) = typ.toByte
    e(67) = 1 // black
    put(68, u32(FREE)); put(72, u32(FREE)); put(76, u32(child))
    put(116, u32(start)); put(120, u32(size)) // low half of the u64 size
    e
  }

  private def header(numFat: Int, dirStart: Int, miniFatStart: Int,
      numMiniFat: Int, fatSectors: Seq[Int]): Array[Byte] = {
    val h = new Array[Byte](512)
    def put(off: Int, b: Array[Byte]): Unit =
      System.arraycopy(b, 0, h, off, b.length)
    put(0, Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1)
      .map(_.toByte))
    put(24, u16(0x003E)); put(26, u16(0x0003)) // minor/major version
    put(28, u16(0xFFFE)) // little-endian marker
    put(30, u16(9)); put(32, u16(6)) // 512-byte sectors, 64-byte minis
    put(44, u32(numFat)); put(48, u32(dirStart))
    put(56, u32(4096)) // mini-stream cutoff
    put(60, u32(miniFatStart)); put(64, u32(numMiniFat))
    put(68, u32(EOC)); put(72, u32(0)) // no DIFAT chain
    var o = 76
    fatSectors.foreach { s => put(o, u32(s)); o += 4 }
    while (o < 512) { put(o, u32(FREE)); o += 4 }
    h
  }

  private def pad(b: Array[Byte], unit: Int): Array[Byte] =
    b ++ new Array[Byte]((unit - b.length % unit) % unit)

  /** Workbook ≥ 4096 bytes in regular sectors: 0=FAT, 1=dir, 2..=data. */
  def cfbRegular(wb0: Array[Byte]): Array[Byte] = {
    val wb = pad(if (wb0.length < 4096) pad(wb0, 4096) else wb0, 512)
    val n = wb.length / 512
    val fat = new Array[Byte](512)
    def fput(i: Int, v: Int) = System.arraycopy(u32(v), 0, fat, 4 * i, 4)
    fput(0, FATSECT); fput(1, EOC)
    (0 until n).foreach(i => fput(2 + i, if (i == n - 1) EOC else 3 + i))
    (2 + n until 128).foreach(fput(_, FREE))
    val dir = pad(dirEntry("Root Entry", 5, 1, EOC, 0) ++
      dirEntry("Workbook", 2, FREE, 2, wb.length), 512)
    header(1, 1, EOC, 0, Seq(0)) ++ fat ++ dir ++ wb
  }

  /** Workbook < 4096 bytes in the MINI stream: 0=FAT, 1=dir,
    * 2=miniFAT, 3..=the root entry's container sectors. */
  def cfbMini(wb: Array[Byte]): Array[Byte] = {
    require(wb.length < 4096, "mini-stream fixture must be small")
    val m = (wb.length + 63) / 64 // mini sectors
    val container = pad(pad(wb, 64), 512)
    val c = container.length / 512
    val fat = new Array[Byte](512)
    def fput(i: Int, v: Int) = System.arraycopy(u32(v), 0, fat, 4 * i, 4)
    fput(0, FATSECT); fput(1, EOC); fput(2, EOC)
    (0 until c).foreach(i => fput(3 + i, if (i == c - 1) EOC else 4 + i))
    (3 + c until 128).foreach(fput(_, FREE))
    val miniFat = new Array[Byte](512)
    def mput(i: Int, v: Int) = System.arraycopy(u32(v), 0, miniFat, 4 * i, 4)
    (0 until m).foreach(i => mput(i, if (i == m - 1) EOC else i + 1))
    (m until 128).foreach(mput(_, FREE))
    val dir = pad(dirEntry("Root Entry", 5, 1, 3, container.length) ++
      dirEntry("Workbook", 2, FREE, 0, wb.length), 512)
    header(1, 1, 2, 1, Seq(0)) ++ fat ++ dir ++ miniFat ++ container
  }
}
