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
    // single segment stays an object, not a 1-element array
    assert(jp("$.PID.5.1") == "Jones")
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
}
