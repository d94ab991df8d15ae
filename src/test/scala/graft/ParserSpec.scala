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
}
