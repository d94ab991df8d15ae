package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col

class ExprSpec extends SparkSpec {

  private def base = df("a INT, b DOUBLE, s STRING",
    Seq(Row(1, 2.5, "hello"), Row(10, 0.5, "World"), Row(null, null, null)))

  private def eval(expr: String): Seq[Any] =
    strings(base.withColumn("out",
      graft.expr.ExprCompiler.compile(expr)).select("out"), "out")

  test("arithmetic and precedence") {
    assert(eval("a + 2 * 3") == Seq(7, 16, null))
  }

  test("comparisons and boolean algebra") {
    assert(eval("a > 5 && b < 1.0") == Seq(false, true, null))
  }

  test("ternary: null condition falls to the else branch") {
    assert(eval("a > 5 ? 'big' : 'small'") == Seq("small", "big", "small"))
  }

  test("string ops: =^ startsWith, =$ endsWith, =~ anchored regex") {
    assert(eval("s =^ 'he'") == Seq(true, false, null))
    assert(eval("s =$ 'ld'") == Seq(false, true, null))
    assert(eval("s =~ '[a-z]+'") == Seq(true, false, null))
  }

  test("function namespaces") {
    assert(eval("math:abs(0 - a)") == Seq(1, 10, null))
    assert(eval("string:uppercase(s)") == Seq("HELLO", "WORLD", null))
    assert(eval("dq:isNumber(s)") == Seq(false, false, false))
    assert(eval("strlen(s)") == Seq(5, 5, null))
  }

  test("null handling: coalesce family") {
    assert(eval("NullToValue(a, 42)") == Seq(1, 10, 42))
    assert(eval("IsNull(a)") == Seq(false, false, true))
  }

  test("elvis operator") {
    assert(eval("a ?: 99") == Seq(1, 10, 99))
  }

  test("json and string namespace extensions") {
    assert(eval("json:IsArray('[1,2]')") == Seq(true, true, true))
    assert(eval("json:IsObject('{}')") == Seq(true, true, true))
    assert(eval("string:substringBefore('a-b-c', '-')") == Seq("a", "a", "a"))
    assert(eval("string:substringAfter('a-b-c', '-')") == Seq("b-c", "b-c", "b-c"))
    assert(eval("string:countMatches('abcabcab', 'ab')") == Seq(3, 3, 3))
    assert(eval("string:normalizeSpace('  a   b ')") == Seq("a b", "a b", "a b"))
  }

  test("user-registered expression functions (EL extension point)") {
    import org.apache.spark.sql.functions._
    graft.expr.Functions.register("custom:double_it", args => args.head * 2)
    try {
      val d = df("v INT", Seq(Row(21)))
      val out = wrangle("set-column :w exp:{ custom:double_it(v) };", d)
      assert(out.select("w").head().getInt(0) == 42)
    } finally graft.expr.Functions.unregister("custom:double_it")
    // after unregister the precise unknown-function error returns
    val e = intercept[graft.api.RecipeException] {
      wrangle("set-column :w exp:{ custom:double_it(v) };",
        df("v INT", Seq(Row(1)))).collect()
    }
    assert(e.getMessage.contains("unknown"))
  }

}
