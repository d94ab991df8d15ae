package graft.expr

import graft.api.RecipeException
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** JEXL-dialect expression AST.
  *
  * Grammar surface per the reference condition lexicon
  * (reference: wrangler-core Directives.g4:204-248 — `|| && == != >= <=
  * =~ !~ =^ !^ =$ !$ + - * / % ?:` …) and the JEXL engine binding
  * (reference: wrangler-core expression/EL.java:58-158).
  */
sealed trait Expr
object Expr {
  final case class Lit(v: Any) extends Expr
  final case class Ref(name: String) extends Expr
  final case class Un(op: String, e: Expr) extends Expr
  final case class Bin(op: String, l: Expr, r: Expr) extends Expr
  final case class Cond(c: Expr, t: Expr, f: Expr) extends Expr
  final case class Call(ns: String, fn: String, args: List[Expr]) extends Expr
  final case class Index(e: Expr, idx: Expr) extends Expr
}

/** Pratt parser for the JEXL-dialect used in `set-column`, `filter-row`,
  * `send-to-error`, `fail` and preconditions.
  */
object ExprParser {
  import Expr._

  private val twoCharOps = List("||", "&&", "==", "!=", ">=", "<=",
    "=~", "!~", "=^", "!^", "=$", "!$")

  final class Lexer(s: String) {
    var pos = 0
    private var cur: String = null
    advance()
    def peek: String = cur
    def advance(): String = {
      val prev = cur
      while (pos < s.length && s.charAt(pos).isWhitespace) pos += 1
      if (pos >= s.length) { cur = null; return prev }
      val c = s.charAt(pos)
      cur =
        if (c == '\'' || c == '"') {
          val sb = new StringBuilder("\u0001") // SOH sentinel marks string literals
          pos += 1
          while (pos < s.length && s.charAt(pos) != c) {
            if (s.charAt(pos) == '\\' && pos + 1 < s.length) {
              // \\uXXXX unicode escape, else keep unknown escapes
              // (\d etc.) intact for regex literals
              if (s.charAt(pos + 1) == 'u' && pos + 5 < s.length &&
                  s.substring(pos + 2, pos + 6).forall(ch =>
                    Character.digit(ch, 16) >= 0)) {
                sb.append(Integer.parseInt(s.substring(pos + 2, pos + 6), 16).toChar)
                pos += 6
              } else {
                sb.append(s.charAt(pos + 1) match {
                  case 'n' => "\n"; case 't' => "\t"; case 'r' => "\r"
                  case '\'' => "'"; case '"' => "\""; case '\\' => "\\"
                  case other => "\\" + other
                })
                pos += 2
              }
            } else { sb.append(s.charAt(pos)); pos += 1 }
          }
          pos += 1
          sb.toString
        } else if (c.isDigit ||
          (c == '.' && pos + 1 < s.length && s.charAt(pos + 1).isDigit)) {
          val st = pos
          while (pos < s.length && (s.charAt(pos).isDigit || s.charAt(pos) == '.')) pos += 1
          if (pos < s.length && (s.charAt(pos) == 'e' || s.charAt(pos) == 'E')) {
            pos += 1
            if (pos < s.length && (s.charAt(pos) == '+' || s.charAt(pos) == '-')) pos += 1
            while (pos < s.length && s.charAt(pos).isDigit) pos += 1
          }
          s.substring(st, pos)
        } else if (c.isLetter || c == '_' || c == '$') {
          val st = pos
          while (pos < s.length && (s.charAt(pos).isLetterOrDigit ||
            s.charAt(pos) == '_' || s.charAt(pos) == '$')) pos += 1
          s.substring(st, pos)
        } else {
          val two = if (pos + 1 < s.length) s.substring(pos, pos + 2) else ""
          if (twoCharOps.contains(two)) { pos += 2; two }
          else { pos += 1; c.toString }
        }
      prev
    }
    def expect(t: String): Unit =
      if (cur != t) throw new RecipeException(
        s"expression: expected '$t' but found '${Option(cur).getOrElse("<eof>")}' in: $s")
      else advance()
  }

  def parse(src: String): Expr = {
    val lx = new Lexer(src)
    val e = ternary(lx)
    if (lx.peek != null)
      throw new RecipeException(s"expression: trailing '${lx.peek}' in: $src")
    e
  }

  private def ternary(lx: Lexer): Expr = {
    val c = or(lx)
    if (lx.peek == "?") {
      lx.advance()
      if (lx.peek == ":") { // elvis `?:`
        lx.advance()
        val f = ternary(lx)
        Cond(Call("", "isnotnull", List(c)), c, f)
      } else {
        val t = ternary(lx)
        lx.expect(":")
        val f = ternary(lx)
        Cond(c, t, f)
      }
    } else c
  }
  private def or(lx: Lexer): Expr = {
    var l = and(lx)
    while (lx.peek == "||" || lx.peek == "or") { lx.advance(); l = Bin("||", l, and(lx)) }
    l
  }
  private def and(lx: Lexer): Expr = {
    var l = equality(lx)
    while (lx.peek == "&&" || lx.peek == "and") { lx.advance(); l = Bin("&&", l, equality(lx)) }
    l
  }
  private def equality(lx: Lexer): Expr = {
    var l = relational(lx)
    while (Set("==", "!=", "=~", "!~", "=^", "!^", "=$", "!$", "eq", "ne")(lx.peek)) {
      val op = lx.advance2()
      l = Bin(op match { case "eq" => "=="; case "ne" => "!="; case o => o }, l, relational(lx))
    }
    l
  }
  private def relational(lx: Lexer): Expr = {
    var l = additive(lx)
    while (Set("<", "<=", ">", ">=", "lt", "le", "gt", "ge")(lx.peek)) {
      val op = lx.advance2()
      l = Bin(op match {
        case "lt" => "<"; case "le" => "<="; case "gt" => ">"; case "ge" => ">="
        case o => o
      }, l, additive(lx))
    }
    l
  }
  private def additive(lx: Lexer): Expr = {
    var l = multiplicative(lx)
    while (lx.peek == "+" || lx.peek == "-") {
      val op = lx.advance2(); l = Bin(op, l, multiplicative(lx))
    }
    l
  }
  private def multiplicative(lx: Lexer): Expr = {
    var l = unary(lx)
    while (lx.peek == "*" || lx.peek == "/" || lx.peek == "%") {
      val op = lx.advance2(); l = Bin(op, l, unary(lx))
    }
    l
  }
  private def unary(lx: Lexer): Expr = lx.peek match {
    case "!" | "not" => lx.advance(); Un("!", unary(lx))
    case "-" => lx.advance(); Un("-", unary(lx))
    case _ => postfix(lx)
  }
  private def postfix(lx: Lexer): Expr = {
    var e = primary(lx)
    var done = false
    while (!done) lx.peek match {
      case "[" =>
        lx.advance(); val idx = ternary(lx); lx.expect("]"); e = Index(e, idx)
      case "." =>
        lx.advance()
        val fld = lx.advance2()
        if (lx.peek == "(") { // method-style call: s.length() etc.
          lx.advance()
          val args = callArgs(lx)
          e = Call("", fld.toLowerCase, e :: args)
        } else e = Call("", "getfield", List(e, Lit(fld)))
      case _ => done = true
    }
    e
  }
  private def callArgs(lx: Lexer): List[Expr] = {
    val args = scala.collection.mutable.ListBuffer.empty[Expr]
    if (lx.peek != ")") {
      args += ternary(lx)
      while (lx.peek == ",") { lx.advance(); args += ternary(lx) }
    }
    lx.expect(")")
    args.toList
  }
  private def primary(lx: Lexer): Expr = {
    val t = lx.peek
    if (t == null) throw new RecipeException("expression: unexpected end")
    if (t == "(") { lx.advance(); val e = ternary(lx); lx.expect(")"); return e }
    lx.advance()
    if (t.startsWith("\u0001")) return Lit(t.substring(1))
    if (t.head.isDigit || (t.head == '.' && t.length > 1)) {
      return if (t.contains('.') || t.contains('e') || t.contains('E'))
        Lit(t.toDouble)
      else Lit(t.toLong)
    }
    t.toLowerCase match {
      case "true"  => return Lit(true)
      case "false" => return Lit(false)
      case "null"  => return Lit(null)
      case _ =>
    }
    // namespace call  ns:fn(…)   |   plain call  fn(…)   |   column ref
    if (lx.peek == ":") {
      lx.advance()
      val fn = lx.advance2()
      lx.expect("(")
      Call(t.toLowerCase, fn, callArgs(lx))
    } else if (lx.peek == "(") {
      lx.advance()
      Call("", t.toLowerCase, callArgs(lx))
    } else Ref(t)
  }

  private implicit final class LexOps(private val lx: Lexer) extends AnyVal {
    def advance2(): String = { val t = lx.peek; lx.advance(); t }
  }
}

/** Compiles the JEXL-dialect AST to a native Catalyst [[Column]] tree, so
  * conditions and computed columns stay inside whole-stage codegen and
  * predicate pushdown (the reference interprets JEXL per-row —
  * reference: wrangler-core expression/EL.java:58-66; we compile once).
  */
object ExprCompiler {
  import Expr._

  def compile(src: String): Column = toColumn(ExprParser.parse(src))

  /** Anchored regex match — reference conditions use `String.matches`
    * semantics (full-string). */
  private def anchored(re: Column): Column = concat(lit("^(?:"), re, lit(")$"))

  def toColumn(e: Expr): Column = e match {
    case Lit(null) => lit(null)
    case Lit(v)    => lit(v)
    case Ref(n)    => col(n)
    case Un("!", x) => !toColumn(x)
    case Un("-", x) => -toColumn(x)
    case Un(op, _)  => throw new RecipeException(s"unknown unary op $op")
    case Bin(op, l, r) =>
      val (lc, rc) = (toColumn(l), toColumn(r))
      op match {
        case "||" => lc || rc
        case "&&" => lc && rc
        case "==" => lc === rc
        case "!=" => lc =!= rc
        case "<"  => lc < rc
        case "<=" => lc <= rc
        case ">"  => lc > rc
        case ">=" => lc >= rc
        case "+"  => lc + rc
        case "-"  => lc - rc
        case "*"  => lc * rc
        case "/"  => lc / rc
        case "%"  => lc % rc
        case "=~" => regexp_like(lc, anchored(rc))
        case "!~" => !regexp_like(lc, anchored(rc))
        case "=^" => lc.startsWith(rc)
        case "!^" => !lc.startsWith(rc)
        case "=$" => lc.endsWith(rc)
        case "!$" => !lc.endsWith(rc)
        case o    => throw new RecipeException(s"unknown operator $o")
      }
    case Cond(c, t, f) => when(toColumn(c), toColumn(t)).otherwise(toColumn(f))
    case Index(a, i)   => element_at(toColumn(a), toColumn(i) + lit(1))
    case Call(ns, fn, args) => Functions.dispatch(ns, fn.toLowerCase, args)
  }
}
