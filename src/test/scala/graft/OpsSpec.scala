package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Per-operator behavior tests, TestingRig-style: literal rows in,
  * recipe string, expected values out — including the reference's
  * correctness-critical quirks (SURVEY §4.3).
  */
class OpsSpec extends SparkSpec {

  test("mask-number: #=keep, x=mask, literal consume-if-equal quirk") {
    // reference: MaskNumber.java:121-146 asserts "xxx-xx-1234" style
    val d = df("ssn STRING", Seq(Row("123-45-6789")))
    assert(strings(wrangle("mask-number :ssn 'xxx-xx-####'", d), "ssn") ==
      Seq("xxx-xx-6789"))
  }

  test("trim removes the reference's extended unicode whitespace set") {
    // reference: Trimmer.java:29-56 (NBSP et al., not just ASCII)
    val d = df("s STRING", Seq(Row("   padded 　")))
    assert(strings(wrangle("trim :s", d), "s") == Seq("padded"))
  }

  test("filter-row true REMOVES matching rows (inverted keep)") {
    // reference: RecordConditionFilter.java:90-108
    val d = df("v INT", Seq(Row(1), Row(20), Row(3)))
    assert(strings(wrangle("filter-row exp:{ v > 5 } true", d), "v") == Seq(1, 3))
    assert(strings(wrangle("filter-row exp:{ v > 5 } false", d), "v") == Seq(20))
  }

  test("filter-by-regex is full-string anchored like Matcher.matches()") {
    // reference: RecordRegexFilter.java:68-83
    val d = df("s STRING", Seq(Row("abc"), Row("abcdef"), Row("xyz")))
    // 'abc' as a find() would also hit abcdef; matches() must not
    assert(strings(wrangle("filter-by-regex if-matched :s 'abc'", d), "s") ==
      Seq("abcdef", "xyz"))
  }

  test("filter-empty-or-null drops only all-null rows; empty string survives") {
    // reference: RecordMissingOrNullFilter.java:73-85
    val d = df("a STRING, b STRING",
      Seq(Row(null, null), Row("", null), Row("x", "y")))
    val out = wrangle("filter-empty-or-null :a,:b", d)
    assert(out.count() == 2)
  }

  test("flatten: multi-column zip pads shorter arrays with null, repeats scalars") {
    // reference: Flatten.java:92-155
    val d = spark.sql(
      "SELECT array(1,2,3) AS a, array('x','y') AS b, 'k' AS c")
    val out = wrangle("flatten :a,:b", d)
    val rows = out.select("a", "b", "c").collect().map(r =>
      (r.get(0), r.get(1), r.get(2))).toSeq
    assert(rows == Seq((1, "x", "k"), (2, "y", "k"), (3, null, "k")))
  }

  test("rename errors when target exists case-insensitively") {
    // reference: ColumnConverter.java:33-45
    val d = df("a INT, B INT", Seq(Row(1, 2)))
    val ex = intercept[Exception](wrangle("rename :a :b", d).collect())
    assert(ex.getMessage.contains("already exists"))
  }

  test("send-to-error carries the ORIGINAL input row") {
    // reference: RecipePipelineExecutor.java:133-137
    val d = df("v INT, s STRING", Seq(Row(1, "keep"), Row(99, "bad")))
    val res = Wrangle.recipe(
      "uppercase :s; send-to-error exp:{ v > 50 };").run(d)
    assert(res.output.count() == 1)
    val err = res.errors.collect().head
    // original row, pre-uppercase
    assert(err.getAs[String]("row").contains("\"bad\""))
  }

  test("send-to-error-and-continue keeps the row in the main branch too") {
    val d = df("v INT", Seq(Row(1), Row(99)))
    val res = Wrangle.recipe("send-to-error-and-continue exp:{ v > 50 };").run(d)
    assert(res.output.count() == 2)
    assert(res.errors.count() == 1)
  }

  test("fail aborts when condition holds") {
    val d = df("v INT", Seq(Row(1), Row(99)))
    intercept[Exception] {
      wrangle("fail exp:{ v > 50 }", d).collect()
    }
    // and passes when it never fires
    assert(wrangle("fail exp:{ v > 1000 }", d).count() == 2)
  }

  test("set-type decimal and numeric casts") {
    val d = df("s STRING", Seq(Row("123.456")))
    val out = wrangle("set-type :s double", d)
    assert(out.schema("s").dataType.typeName == "double")
    assert(strings(out, "s") == Seq(123.456))
  }

  test("parse-as-csv with header uses first row names and drops it") {
    // reference: CsvParser.java:148-199 (cells trimmed, spaces→_)
    val d = df("body STRING",
      Seq(Row("first name,age"), Row("alice,30"), Row("bob,41")))
    val out = wrangle("parse-as-csv :body ',' true", d)
    assert(out.columns.toSet == Set("body", "first_name", "age"))
    assert(out.count() == 2)
    assert(strings(out.orderBy("age"), "first_name") == Seq("alice", "bob"))
  }

  test("parse-as-json flattens objects and removes source column") {
    // reference: JsParser.java:124-141
    val d = df("j STRING", Seq(Row("""{"a":1,"b":{"c":"x"}}""")))
    val out = wrangle("parse-as-json :j 2", d)
    assert(!out.columns.contains("j"))
    assert(out.columns.contains("j_a"))
    assert(out.columns.contains("j_b_c"))
  }

  test("parse-as-json explodes top-level arrays into rows") {
    val d = df("j STRING", Seq(Row("""[{"a":1},{"a":2}]""")))
    val out = wrangle("parse-as-json :j 1", d)
    assert(out.count() == 2)
  }

  test("quantize maps ranges to labels, null outside") {
    val d = df("v DOUBLE", Seq(Row(5.0), Row(15.0), Row(-1.0)))
    assert(strings(wrangle("quantize :v :band 0:10=low,10:20=high", d), "band") ==
      Seq("low", "high", null))
  }

  test("cut-character supports multi-ranges") {
    val d = df("s STRING", Seq(Row("abcdefghij")))
    assert(strings(wrangle("cut-character :s :out 1-3,7-8", d), "out") ==
      Seq("abcgh"))
  }

  test("base32 encode/decode round-trips") {
    val d = df("s STRING", Seq(Row("hello world")))
    val out = wrangle(
      "encode base32 :s; decode base32 :s_encode_base32;", d)
    assert(strings(out, "s_encode_base32_decode_base32") == Seq("hello world"))
  }

  test("text-distance levenshtein is native and correct") {
    val d = df("a STRING, b STRING", Seq(Row("kitten", "sitting")))
    assert(strings(wrangle("text-distance levenshtein :a :b :d", d), "d") ==
      Seq(3.0))
  }

  test("stemming produces porter stems") {
    val d = df("s STRING", Seq(Row("running flies happily")))
    val out = wrangle("stemming :s", d).select("s_porter").collect()
    val stems = out.head.getSeq[String](0)
    assert(stems == Seq("run", "fli", "happili"))
  }

  test("diff-date yields milliseconds") {
    // reference: DiffDate.java:47
    val d = spark.sql(
      "SELECT timestamp'2024-01-02 00:00:00' AS t1, timestamp'2024-01-01 00:00:00' AS t2")
    assert(strings(wrangle("diff-date :t1 :t2 :ms", d), "ms") == Seq(86400000L))
  }

  test("set-variable behaves as a derived column") {
    val d = df("v INT", Seq(Row(2)))
    assert(strings(wrangle("set-variable tmp v * 10; set-column :o exp:{ tmp + 1 };", d), "o") ==
      Seq(21))
  }

  test("v1 set column / set columns execute") {
    val d = df("price INT, qty INT", Seq(Row(10, 3)))
    val out1 = wrangle("set column total price * qty", d)
    assert(strings(out1, "total") == Seq(30))
    val out2 = wrangle("set columns cost,amount", d)
    assert(out2.columns.toSeq == Seq("cost", "amount"))
  }

  test("parse-as-csv honors RFC-4180 quoting for single-char delimiters") {
    val d = df("body STRING", Seq(Row("\"a,b\",plain,\"c\"\"d\"")))
    val out = wrangle("parse-as-csv :body ',' false", d)
    assert(strings(out, "body_1") == Seq("a,b"))
    assert(strings(out, "body_2") == Seq("plain"))
    assert(strings(out, "body_3") == Seq("c\"d"))
  }

  test("set-type decimal honors rounding modes") {
    val d = df("v STRING", Seq(Row("2.345")))
    val even = wrangle("set-type :v decimal 2 HALF_EVEN", d)
    assert(even.head().getDecimal(0).toPlainString == "2.34")
    val up = wrangle("set-type :v decimal 2 HALF_UP", d)
    assert(up.head().getDecimal(0).toPlainString == "2.35")
  }

  test("ddl namespace: compile-time schema ops") {
    val d = df("x INT", Seq(Row(1)))
    val out = d.withColumn("has",
        graft.expr.ExprCompiler.compile("ddl:hasField('a INT, b STRING', 'b')"))
      .withColumn("sel",
        graft.expr.ExprCompiler.compile("ddl:select('a INT, b STRING', 'a')"))
    val r = out.head()
    assert(r.getAs[Boolean]("has"))
    assert(r.getAs[String]("sel") == "a INT")
  }

  test("parse-as-date handles natural-language relative phrases") {
    val d = df("s STRING", Seq(Row("yesterday"), Row("3 days ago"),
      Row("next tuesday"), Row("last friday"), Row("in two weeks"),
      Row("2024-06-15"), Row("not a date")))
    val out = wrangle("parse-as-date :s prop:{anchor=2024-06-12}; format-date :s 'yyyy-MM-dd';", d)
    // anchor 2024-06-12 is a Wednesday
    assert(strings(out, "s") == Seq("2024-06-11", "2024-06-09",
      "2024-06-18", "2024-06-07", "2024-06-26", "2024-06-15", null))
  }

  test("parse-as-date: weekday-of-month and month-name-only phrases") {
    val d = df("s STRING", Seq(
      Row("third thursday of june"),       // 2024-06-20
      Row("third thursday of june 2023"),  // 2023-06-15
      Row("last friday in december"),      // 2024-12-27
      Row("first mon of september 2025"),  // 2025-09-01
      Row("fifth monday of february"),     // no 5th Monday -> null
      Row("june"),                         // anchor day kept -> 2024-06-12
      Row("february"),                     // 2024-02-12
      Row("march 2025"),                   // 2025-03-12
      Row("two weeks from now")))          // 2024-06-26
    val out = wrangle(
      "parse-as-date :s prop:{anchor=2024-06-12}; format-date :s 'yyyy-MM-dd';", d)
    assert(strings(out, "s") == Seq("2024-06-20", "2023-06-15",
      "2024-12-27", "2025-09-01", null, "2024-06-12", "2024-02-12",
      "2025-03-12", "2024-06-26"))
  }

  test("parse-as-date: compositional, boundary, and bare-weekday phrases") {
    // anchor 2024-06-12 is a Wednesday
    val d = df("s STRING", Seq(
      Row("3 days before yesterday"),       // 2024-06-08
      Row("a week after next monday"),      // next mon = 06-17 -> 06-24
      Row("two months after end of month"), // 06-30 -> 2024-08-30
      Row("beginning of month"),            // 2024-06-01
      Row("end of year"),                   // 2024-12-31
      Row("start of the year"),             // 2024-01-01
      Row("first day of september"),        // 2024-09-01
      Row("last day of february 2024"),     // leap -> 2024-02-29
      Row("last day of smarch"),            // unknown month -> null
      Row("friday"),                        // next-or-same -> 2024-06-14
      Row("wednesday"),                     // same day -> 2024-06-12
      // adversarial nesting: depth-capped -> null, never a stack overflow
      Row(("1 day after " * 60) + "today")))
    val out = wrangle(
      "parse-as-date :s prop:{anchor=2024-06-12}; format-date :s 'yyyy-MM-dd';", d)
    assert(strings(out, "s") == Seq("2024-06-08", "2024-06-24",
      "2024-08-30", "2024-06-01", "2024-12-31", "2024-01-01",
      "2024-09-01", "2024-02-29", null, "2024-06-14", "2024-06-12",
      null))
  }

  test("parse-as-date: time-of-day composites resolve to a timestamp") {
    // anchor 2024-06-12 is a Wednesday
    val d = df("s STRING", Seq(
      Row("tomorrow 3pm"),                   // 2024-06-13 15:00
      Row("monday at 14:30"),                // next-or-same mon 06-17
      Row("yesterday at 2:15 pm"),           // 2024-06-11 14:15
      Row("next friday at noon"),            // strictly-after 06-14 12:00
      Row("3pm tomorrow"),                   // leading time
      Row("14:30 on monday"),                // leading clock + on
      Row("midnight"),                       // bare time, anchor day
      Row("noon"),                           // 2024-06-12 12:00
      Row("day after tomorrow at 8 am"),     // 06-14 08:00
      Row("2 days after today at 12:05 pm"), // 12pm wrap: 06-14 12:05
      Row("12am tomorrow"),                  // 12am wrap: 06-13 00:00
      Row("tomorrow at 2:15:42 pm"),         // seconds survive
      Row("tomorrow at 25:00"),              // invalid hour -> date alone? no: null time, whole falls back
      Row("june 2025"),                      // year must NOT read as a clock
      Row("tomorrow")))                      // date-only keeps midnight
    val out = wrangle(
      "parse-as-date :s prop:{anchor=2024-06-12}; format-date :s 'yyyy-MM-dd HH:mm:ss';", d)
    assert(strings(out, "s") == Seq(
      "2024-06-13 15:00:00", "2024-06-17 14:30:00", "2024-06-11 14:15:00",
      "2024-06-14 12:00:00", "2024-06-13 15:00:00", "2024-06-17 14:30:00",
      "2024-06-12 00:00:00", "2024-06-12 12:00:00", "2024-06-14 08:00:00",
      "2024-06-14 12:05:00", "2024-06-13 00:00:00", "2024-06-13 14:15:42",
      null, "2025-06-12 00:00:00", "2024-06-13 00:00:00"))
  }


  test("fused xpath run: parity with the native functions, one parse in plan") {
    import org.apache.spark.sql.functions.{col, xpath, xpath_string}
    val xmls = Seq(
      "<r a=\"7\"><v>alpha</v><v>beta</v><w/></r>",   // attr, repeats, empty elem
      "<r><v>only</v></r>",                           // no attr, no match for /r/w
      "<r xmlns=\"urn:x\"><v>ns</v></r>",             // default namespace
      // CDATA merges into the adjacent text run; a child element SPLITS
      // the run into two text nodes (XPath data model edge cases of the
      // simple-path DOM walker)
      "<r a=\"1\"><v>pre<![CDATA[mid]]>post</v><v>x<w/>y</v></r>",
      // comment splits a run; runs starting with CDATA; mixed chunks
      "<r a=\"2\"><v>a<!--c-->b</v><v>t1<w/>t2<![CDATA[c2]]>t3</v></r>",
      "<x><v>wrong root</v></x>",                     // first step mismatch
      null)
    val d = df("x STRING", xmls.map(Row(_)))
    // fused path (a 3-directive run on the same column)
    val fused = wrangle(
      "xpath :x :v1 '/r/v'; xpath :x :a '/r/@a'; xpath-array :x :vs '/r/v/text()';", d)
      .select("v1", "a", "vs").collect()
    // native expressions, evaluated directly
    val native = d.select(
      xpath_string(col("x"), org.apache.spark.sql.functions.lit("/r/v")).as("v1"),
      xpath_string(col("x"), org.apache.spark.sql.functions.lit("/r/@a")).as("a"),
      xpath(col("x"), org.apache.spark.sql.functions.lit("/r/v/text()")).as("vs"))
      .collect()
    assert(fused.map(_.toString).toSeq == native.map(_.toString).toSeq,
      s"fused=${fused.mkString("|")} native=${native.mkString("|")}")

    // exactly ONE parse UDF in the plan of a 3-pull recipe (repartition
    // blocks ConvertToLocalRelation from folding the literal input)
    val dr = d.repartition(2)
    val q = wrangle(
      "xpath :x :v1 '/r/v'; xpath :x :a '/r/@a'; xpath :x :w '/r/w';", dr)
    val plan = q.queryExecution.optimizedPlan.toString
    assert("UDF".r.findAllIn(plan).size == 1, plan)

    // a lone SIMPLE-path xpath routes through the kernel too (one UDF);
    // a complex path (predicate) keeps the native codegen'd function
    val solo = wrangle("xpath :x :v1 '/r/v';", dr)
    assert("UDF".r.findAllIn(
      solo.queryExecution.optimizedPlan.toString).size == 1)
    val complex = wrangle("xpath :x :v1 '/r/v[1]';", dr)
    assert(!complex.queryExecution.optimizedPlan.toString.contains("UDF"))

    // run breaks on a different source column — two separate kernels,
    // identical results
    val twoSrc = wrangle(
      "copy :x :y; xpath :x :v1 '/r/v'; xpath :y :v2 '/r/v';", dr)
    assert("UDF".r.findAllIn(
      twoSrc.queryExecution.optimizedPlan.toString).size == 2)
    assert(twoSrc.select("v1").collect().map(_.getString(0)).toSeq ==
      twoSrc.select("v2").collect().map(_.getString(0)).toSeq)

    // output overwriting the source breaks the run (sequential semantics)
    val overwrite = wrangle(
      "xpath :x :x '/r/v'; xpath :x :v2 '/r/v';", d)
    // second pull runs on the REWRITTEN column ('alpha' is not XML -> error
    // on parse; restrict to valid rows first): just assert compile works
    assert(overwrite.columns.contains("v2"))
  }

  test("parse-as-log accepts the Apache LogFormat nicknames") {
    val d = df("log STRING", Seq(Row(
      "10.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] \"GET /a HTTP/1.1\" " +
        "200 2326 \"http://ref.example/\" \"curl/8\" 420 2440")))
    val out = wrangle("parse-as-log :log combinedio", d)
    val r = out.head()
    assert(out.columns.contains("log_bytes_received"))
    assert(r.getAs[String]("log_bytes_received") == "420")
    assert(r.getAs[String]("log_bytes_sent") == "2440")
    assert(r.getAs[String]("log_request_header_user_agent") == "curl/8")

    val ag = wrangle("parse-as-log :ua agent",
      df("ua STRING", Seq(Row("Mozilla/5.0 (X11; Linux)"))))
    assert(ag.head().getAs[String]("ua_request_header_user_agent")
      == "Mozilla/5.0 (X11; Linux)")

    val ref = wrangle("parse-as-log :rl referer",
      df("rl STRING", Seq(Row("http://other.example/page -> /landing"))))
    val rr = ref.head()
    assert(rr.getAs[String]("rl_request_header_referer")
      == "http://other.example/page")
    assert(rr.getAs[String]("rl_url_path") == "/landing")
  }

  test("parse-as-csv header semantics match the reference") {
    // reference CsvParserTest.testHeaders: cells trimmed, whitespace
    // runs (incl. tabs) collapse to one underscore
    val d = df("body STRING", Seq(
      Row("first name, last  \t  name"), Row("alice,zed")))
    val out = wrangle("parse-as-csv :body ',' true; keep :first_name,:last_name", d)
    assert(out.count() == 1)
    val r = out.head()
    assert(r.getString(0) == "alice" && r.getString(1) == "zed")
    // reference isHeader heuristic: a numeric-looking first row is DATA,
    // not a header - nothing is dropped, positional names are used
    val d2 = df("body STRING", Seq(Row("1,2"), Row("3,4")))
    val out2 = wrangle("parse-as-csv :body ',' true", d2)
    assert(out2.count() == 2)
    assert(out2.columns.count(_.startsWith("body_")) == 2)
  }


  test("jaro, damerau-levenshtein, simon-white metrics (published values)") {
    import graft.functions.Udfs
    assert(math.abs(Udfs.jaro("MARTHA", "MARHTA") - 0.944444) < 1e-5)
    assert(math.abs(Udfs.jaro("DIXON", "DICKSONX") - 0.766667) < 1e-5)
    assert(Udfs.jaro("abc", "abc") == 1.0)
    assert(Udfs.jaro("abc", "xyz") == 0.0)
    assert(Udfs.damerauLevenshtein("CA", "AC") == 1)      // transposition
    assert(Udfs.damerauLevenshtein("abcdef", "abcdfe") == 1)
    assert(Udfs.damerauLevenshtein("kitten", "sitting") == 3)
    assert(math.abs(Udfs.simonWhite("Healed", "Sealed") - 0.8) < 1e-9)
    assert(math.abs(Udfs.simonWhite("Healed", "Help") - 0.25) < 1e-9)
    // directive routing
    val d = df("a STRING, b STRING", Seq(Row("MARTHA", "MARHTA")))
    val out = wrangle("text-metric jaro :a :b :sim", d)
    assert(math.abs(out.select("sim").head().getDouble(0) - 0.944444) < 1e-5)
  }


  test("v1 recipe end-to-end (reference CsvParserTest.testTrailingCommas)") {
    val d = df("body STRING", Seq(
      Row("school_id, student_id, last_name, first_name,,,"),
      Row("14J456,33445566,Potter,Harry,,,"),
      Row("14J456,44333433,Weasley,Ron,,,"),
      Row("14J456,65765566,Granger,Hermione,,,")))
    val out = wrangle("""
      parse-as-csv :body ',' false;
      filter-rows-on regex-match body_1 ^school_id$;
      drop :body;
      set columns school_id, student_id, last_name, first_name;
      keep :school_id,:student_id,:last_name,:first_name;
    """, d)
    assert(out.count() == 3)
    assert(out.columns.toSeq ==
      Seq("school_id", "student_id", "last_name", "first_name"))
    val names = out.orderBy("student_id").select("last_name")
      .collect().map(_.getString(0)).toSeq
    assert(names == Seq("Potter", "Weasley", "Granger"))
  }


  test("json-path: recursive descent, wildcard, and predicate paths") {
    val json = """{"store":{"book":[
      {"title":"A","price":8.95,"tag":"x"},
      {"title":"B","price":12.99,"tag":"y"},
      {"title":"C","price":8.99,"tag":"x"}],
      "bicycle":{"price":19.95}}}""".replaceAll("\\n\\s*", "")
    val d = df("j STRING", Seq(Row(json)))
    // recursive descent collects every price anywhere
    val prices = wrangle("json-path :j :out '$..price'", d)
      .select("out").head().getString(0)
    assert(prices == "[8.95,12.99,8.99,19.95]")
    // wildcard over an array of objects
    val titles = wrangle("json-path :j :out '$.store.book[*].title'", d)
      .select("out").head().getString(0)
    assert(titles == """["A","B","C"]""")
    // predicate filter on a field
    val cheap = wrangle("json-path :j :out '$.store.book[?(@.price<9)].title'", d)
      .select("out").head().getString(0)
    assert(cheap == """["A","C"]""")
    val tagged = wrangle("""json-path :j :out "$.store.book[?(@.tag=='y')].title"""" + "\n", d)
      .select("out").head().getString(0)
    assert(tagged == "B")
    // simple paths still use get_json_object (codegen) and agree
    val one = wrangle("json-path :j :out '$.store.bicycle.price'", d)
      .select("out").head().getString(0)
    assert(one == "19.95")
    // multi-path json:Select: first match wins
    val sel = wrangle("""set-column :v exp:{ json:Select(j, '$.store.missing', '$.store.bicycle.price') }; keep :v""", d)
      .select("v").head().getString(0)
    assert(sel == "19.95")
  }

  test("json-path: slices, unions, nested and @-path predicates") {
    import graft.functions.JsonPathLite.{eval => jp}
    val j = """{"a":[{"n":1,"m":{"x":5},"p":2},{"n":2,"m":{"x":1},"p":9},
      {"n":3,"m":{"x":8},"p":3},{"n":4,"p":4}]}""".replaceAll("\n\\s*", "")
    // slices: [1:3], open ends, step, negative step, negative index
    assert(jp(j, "$.a[1:3].n") == "[2,3]")
    assert(jp(j, "$.a[:2].n") == "[1,2]")
    assert(jp(j, "$.a[2:].n") == "[3,4]")
    assert(jp(j, "$.a[::2].n") == "[1,3]")
    assert(jp(j, "$.a[::-1].n") == "[4,3,2,1]")
    assert(jp(j, "$.a[-2:].n") == "[3,4]")
    assert(jp(j, "$.a[-1].n") == "4")
    // index and field unions
    assert(jp(j, "$.a[0,2].n") == "[1,3]")
    assert(jp(j, "$.a[0]['n','p']") == "[1,2]")
    // predicate on a NESTED field, literal rhs
    assert(jp(j, "$.a[?(@.m.x > 3)].n") == "[1,3]")
    // predicate comparing two @-paths
    assert(jp(j, "$.a[?(@.n >= @.p)].n") == "[3,4]")
    assert(jp(j, "$.a[?(@.m.x < @.p)].n") == "2")
    // bare existence filter
    assert(jp(j, "$.a[?(@.m)].n") == "[1,2,3]")
    // compound predicates: && binds tighter than ||
    assert(jp(j, "$.a[?(@.m.x > 3 && @.p < 3)].n") == "1")
    assert(jp(j, "$.a[?(@.n == 4 || @.m.x > 3 && @.p < 3)].n") == "[1,4]")
    assert(jp(j, "$.a[?(@.m && @.n >= 2)].n") == "[2,3]")
    // routing: all of these must take the interpreter, simple ones not
    import graft.functions.JsonPathLite.needsLite
    assert(needsLite("$.a[1:3]") && needsLite("$.a[0,2]") &&
      needsLite("$.a['n','p']") && needsLite("$.a[-1]") &&
      needsLite("$.a[?(@.m.x>3)]"))
    assert(!needsLite("$.store.bicycle.price") && !needsLite("$.a[0].n"))
    // end-to-end through the directive
    val d = df("j STRING", Seq(Row(j)))
    val out = wrangle("json-path :j :out '$.a[?(@.m.x >= 5)].m.x'", d)
      .select("out").head().getString(0)
    assert(out == "[5,8]")
    // namespaced keys: a bare colon in a dotted name must NOT route to
    // the interpreter (get_json_object handles it natively)…
    assert(!needsLite("$.soap:Envelope.soap:Body"))
    val ns = """{"soap:Envelope":{"soap:Body":{"v":7}},"a":[{"x-y":1},{"x-y":2}]}"""
    val nsd = df("j STRING", Seq(Row(ns)))
    assert(wrangle("json-path :j :out '$.soap:Envelope.soap:Body.v'", nsd)
      .select("out").head().getString(0) == "7")
    // …and the interpreter accepts ':' / '-' names when it IS needed
    assert(jp(ns, "$..soap:Body") == """{"v":7}""")
    assert(jp(ns, "$.a[*].x-y") == "[1,2]")
    // a quoted bracket field containing a comma is ONE field, not a union
    assert(jp("""{"a,b":3}""", "$['a,b']") == "3")
  }

  test("split-url: single-parse struct matches parse_url semantics") {
    import org.apache.spark.sql.Row
    val d = df("s STRING", Seq(
      Row("https://u:pw@ex.com:8443/a/b?x=1&y=2"),
      Row("HTTP://EX.COM"),          // scheme lowercased, empty path
      Row("not a url"),              // unparseable -> all parts null
      Row(null)))
    val out = wrangle("split-url :s", d).collect()
      .map(r => (Option(r.getAs[String]("s")).getOrElse("null"), r)).toMap
    val full = out("https://u:pw@ex.com:8443/a/b?x=1&y=2")
    assert(full.getAs[String]("s_protocol") == "https")
    assert(full.getAs[String]("s_authority") == "u:pw@ex.com:8443")
    assert(full.getAs[String]("s_host") == "ex.com")
    assert(full.getAs[Int]("s_port") == 8443)
    assert(full.getAs[String]("s_path") == "/a/b")
    assert(full.getAs[String]("s_file") == "/a/b?x=1&y=2")
    assert(full.getAs[String]("s_query") == "x=1&y=2")
    val bare = out("HTTP://EX.COM")
    assert(bare.getAs[String]("s_protocol") == "http")
    assert(bare.getAs[String]("s_host") == "EX.COM")
    assert(bare.isNullAt(bare.fieldIndex("s_port")))
    assert(bare.getAs[String]("s_path") == "")
    for (bad <- Seq(out("not a url"), out("null"));
         f <- Seq("s_protocol", "s_authority", "s_host", "s_port",
                  "s_path", "s_file", "s_query"))
      assert(bad.isNullAt(bad.fieldIndex(f)), s"$f should be null")
  }

}
