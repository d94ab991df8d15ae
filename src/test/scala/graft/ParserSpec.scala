package graft

import graft.api._
import graft.parser.RecipeParser
import org.scalatest.funsuite.AnyFunSuite

class ParserSpec extends AnyFunSuite {

  test("v2 syntax: columns, strings, expressions, semicolons") {
    val specs = RecipeParser.parse(
      """rename :old :new;
        |set-column :total exp:{ price * (1 - discount) };
        |filter-row exp:{ qty > 10 } true;
        |parse-as-csv :body ',' true;""".stripMargin)
    assert(specs.map(_.name) ==
      Vector("rename", "set-column", "filter-row", "parse-as-csv"))
    assert(specs(0).col(0) == "old" && specs(0).col(1) == "new")
    assert(specs(1).expr(1) == "price * (1 - discount)")
    assert(specs(2).bool(1))
    assert(specs(3).str(1) == ",")
  }

  test("v1 syntax: bare words and newline separators") {
    val specs = RecipeParser.parse(
      "rename old new\ndrop a,b,c\nuppercase body")
    assert(specs.map(_.name) == Vector("rename", "drop", "uppercase"))
    assert(specs(0).col(0) == "old")
    assert(specs(1).cols(0) == Seq("a", "b", "c"))
  }

  test("column lists with :col syntax") {
    val specs = RecipeParser.parse("keep :a,:b,:c;")
    assert(specs.head.cols(0) == Seq("a", "b", "c"))
  }

  test("comments and pragmas are skipped") {
    val specs = RecipeParser.parse(
      """// a comment
        |#pragma version 2.0
        |drop :x;""".stripMargin)
    assert(specs.map(_.name) == Vector("drop"))
  }

  test("regex escapes survive quoting") {
    val specs = RecipeParser.parse("""filter-by-regex if-matched :c '\d+';""")
    assert(specs.head.str(2) == "\\d+")
  }

  test("braces inside exp blocks don't split statements") {
    val specs = RecipeParser.parse(
      "set-column :x exp:{ a > 1 ? 'y;es' : 'no' };\ndrop :z;")
    assert(specs.size == 2)
    assert(specs(0).expr(1).contains("y;es"))
  }

  test("unknown directive raises a clear error") {
    val ex = intercept[RecipeException] {
      Wrangle.recipe("frobnicate :x;").apply(null)
    }
    assert(ex.getMessage.contains("frobnicate"))
  }

  test("v1 'set column' and 'set columns' spellings") {
    val specs = graft.parser.RecipeParser.parse(
      "set column total price * 2\nset columns a,b,c")
    assert(specs.map(_.name) == Vector("set", "set"))
  }

  test("macro substitution: $name$ expands before parsing") {
    val specs = graft.parser.RecipeParser.parse(
      "filter-row exp:{ $cond$ } false; drop :$col$;",
      Map("cond" -> "l_quantity > 5", "col" -> "l_tax"))
    assert(specs.size == 2)
    assert(specs(0).raw.contains("l_quantity > 5"))
    assert(specs(1).raw.contains("l_tax"))
    val e = intercept[graft.api.RecipeException] {
      graft.parser.RecipeParser.parse("drop :$nope$;", Map("x" -> "1"))
    }
    assert(e.getMessage.contains("undefined macro"))
    // no substitution pass when no macros are supplied (currency
    // literals with '$' stay intact)
    assert(graft.parser.RecipeParser.parse(
      "set-column :c exp:{ '$1,234.56' };").nonEmpty)
  }

  test("registry aliasing and exclusion config") {
    import graft.Registry
    try {
      Registry.configure(aliasMap = Map("remove-cols" -> "drop"),
        exclusions = Set("invoke-http"))
      val spec = graft.parser.RecipeParser.parse("remove-cols :a;").head
      assert(Registry.compile(spec).name == "drop")
      val e = intercept[graft.api.RecipeException] {
        Registry.compile(graft.parser.RecipeParser.parse(
          "invoke-http :u 'http://x' 'a';").head)
      }
      assert(e.getMessage.contains("excluded"))
      // excluding the root also disables its aliases
      Registry.configure(aliasMap = Map("remove-cols" -> "drop"),
        exclusions = Set("drop"))
      val e2 = intercept[graft.api.RecipeException] {
        Registry.compile(graft.parser.RecipeParser.parse("remove-cols :a;").head)
      }
      assert(e2.getMessage.contains("excluded"))
    } finally Registry.resetConfig()
  }


  test("unicode escapes in quoted args (reference MergeTest)") {
    val recipe = "merge :A :B :C '" + "\\" + "u000A'"
    val spec = graft.parser.RecipeParser.parse(recipe).head
    assert(spec.str(3) == "\n")
  }

  test("httpd LogFormat compiles to a regex that dissects a custom line") {
    val (re, fields) = graft.ops.HttpdLogFormat.compile(
      "%v %h %u %t \"%m %U%q %H\" %>s %b %D \"%{X-Forwarded-For}i\" \"%{session}C\"")
    assert(fields == Seq("server_name", "remote_host", "auth", "time",
      "method", "url_path", "query", "protocol", "status", "bytes",
      "response_time_micros", "request_header_x_forwarded_for"))
    val line = "web01 10.0.0.1 frank [10/Oct/2000:13:55:36 -0700] " +
      "\"GET /page/7?ref=2 HTTP/1.1\" 200 2326 1042 \"203.0.113.9\" \"abc=1\""
    val m = java.util.regex.Pattern.compile(re).matcher(line)
    assert(m.matches(), s"regex $re did not match $line")
    val got = fields.indices.map(i => m.group(i + 1))
    assert(got == Seq("web01", "10.0.0.1", "frank",
      "10/Oct/2000:13:55:36 -0700", "GET", "/page/7", "?ref=2", "HTTP/1.1",
      "200", "2326", "1042", "203.0.113.9"))
  }

  test("httpd LogFormat: %% literal, no-query %U, unquoted header") {
    val (re, fields) = graft.ops.HttpdLogFormat.compile("%h %U%q %>s 100%% %{Referer}i")
    assert(fields == Seq("remote_host", "url_path", "query", "status",
      "request_header_referer"))
    val m = java.util.regex.Pattern.compile(re)
      .matcher("1.2.3.4 /index.html 404 100% http://x.example/a")
    assert(m.matches())
    assert(m.group(2) == "/index.html" && m.group(3) == "" &&
      m.group(5) == "http://x.example/a")
  }

  test("httpd LogFormat: space-bearing %{fmt}t and repeated directives") {
    // a custom strftime with one literal space matches two words
    val (re, fields) = graft.ops.HttpdLogFormat.compile(
      "%h %{%d/%b/%Y:%T %z}t %>s")
    assert(fields == Seq("remote_host", "time", "status"))
    val m = java.util.regex.Pattern.compile(re)
      .matcher("10.0.0.1 10/Oct/2000:13:55:36 -0700 200")
    assert(m.matches(), s"$re")
    assert(m.group(2) == "10/Oct/2000:13:55:36 -0700")

    // repeated directives keep both captures under suffixed names
    val (re2, fields2) = graft.ops.HttpdLogFormat.compile("%t %{%s}t %h %h")
    assert(fields2 == Seq("time", "time_2", "remote_host", "remote_host_2"))
    val m2 = java.util.regex.Pattern.compile(re2)
      .matcher("[10/Oct/2000:13:55:36 -0700] 971211336 1.1.1.1 2.2.2.2")
    assert(m2.matches())
    assert(m2.group(2) == "971211336" && m2.group(4) == "2.2.2.2")
  }
}
