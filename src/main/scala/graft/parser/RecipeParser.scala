package graft.parser

import graft.api._
import scala.collection.mutable.ArrayBuffer

/** Hand-rolled recursive-descent tokenizer for the directive DSL.
  *
  * Accepts both v1 (bare-word args, newline-separated) and v2
  * (`:col`, quoted strings, `exp:{…}`, trailing `;`) recipe spellings
  * in one grammar, mirroring what the reference achieves with
  * MigrateToV2 + ANTLR (reference: wrangler-core parser/MigrateToV2.java:76-830,
  * Directives.g4:44-108) but without a migration pre-pass: the token
  * shapes are compatible, so one lexer handles both.
  *
  * Directive separators: `;` and newline (newlines inside `{…}` blocks
  * and quotes do not split). `//` line comments and `#pragma` lines are
  * skipped.
  */
object RecipeParser {

  def parse(recipe: String): Vector[DirectiveSpec] =
    splitStatements(recipe).flatMap(parseStatement)

  /** Parse with `$name$` macro substitution (reference: Directives.g4
    * macro rule + the properties the executor injects). Substitution is
    * textual and happens before statement splitting, like the reference;
    * an unresolved `$name$` fails fast rather than reaching a directive
    * as a malformed token.
    */
  def parse(recipe: String, macros: Map[String, String]): Vector[DirectiveSpec] =
    parse(substituteMacros(recipe, macros))

  private val MacroRe = "\\$([A-Za-z_][A-Za-z0-9_]*)\\$".r

  private[parser] def substituteMacros(recipe: String,
      macros: Map[String, String]): String =
    if (macros.isEmpty) recipe
    else MacroRe.replaceAllIn(recipe, m =>
      java.util.regex.Matcher.quoteReplacement(
        macros.getOrElse(m.group(1), throw new RecipeException(
          s"undefined macro '$$${m.group(1)}$$' (have: " +
            s"${macros.keys.toSeq.sorted.mkString(", ")})"))))

  /** Split into statements on ';' / newline, respecting quotes+braces. */
  private[parser] def splitStatements(recipe: String): Vector[String] = {
    val out = ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    var quote: Char = 0
    var i = 0
    val n = recipe.length
    while (i < n) {
      val c = recipe.charAt(i)
      if (quote != 0) {
        cur.append(c)
        if (c == '\\' && i + 1 < n) { cur.append(recipe.charAt(i + 1)); i += 1 }
        else if (c == quote) quote = 0
      } else c match {
        case '\'' | '"' => quote = c; cur.append(c)
        case '{' => depth += 1; cur.append(c)
        case '}' => depth -= 1; cur.append(c)
        case '/' if i + 1 < n && recipe.charAt(i + 1) == '/' =>
          // line comment: skip to newline
          while (i < n && recipe.charAt(i) != '\n') i += 1
          i -= 1
        case ';' | '\n' if depth == 0 =>
          val s = cur.toString.trim
          if (s.nonEmpty) out += s
          cur.clear()
        case _ => cur.append(c)
      }
      i += 1
    }
    val s = cur.toString.trim
    if (s.nonEmpty) out += s
    out.toVector
  }

  private def parseStatement(stmt: String): Option[DirectiveSpec] = {
    if (stmt.startsWith("#pragma") || stmt.startsWith("#")) return None
    val toks = tokenize(stmt)
    if (toks.isEmpty) return None
    val name = toks.head match {
      case TIdent(nm) => nm.stripPrefix("!") // `!udd` invocation syntax
      case t => throw new RecipeException(s"bad directive name: ${t.text}")
    }
    val raw = stmt.drop(stmt.indexOf(name) + name.length).trim
    Some(DirectiveSpec(name.toLowerCase, groupCommas(toks.tail), raw))
  }

  /** Merge `tok , tok , tok` runs into TList. The tokenizer emits a
    * bare TIdent(",") for separator commas between tokens.
    */
  private def groupCommas(toks: Vector[Token]): Vector[Token] = {
    val out = ArrayBuffer.empty[Token]
    var i = 0
    while (i < toks.size) {
      toks(i) match {
        case TIdent(",") => // stray comma — attach next to previous as list
          if (out.nonEmpty && i + 1 < toks.size) {
            val items = out.remove(out.size - 1) match {
              case TList(xs) => xs
              case t         => Vector(t)
            }
            out += TList(items :+ toks(i + 1))
            i += 1
          }
        case t => out += t
      }
      i += 1
    }
    out.toVector
  }

  private[parser] def tokenize(stmt: String): Vector[Token] = {
    val out = ArrayBuffer.empty[Token]
    var i = 0
    val n = stmt.length
    def peek(k: Int): Char = if (i + k < n) stmt.charAt(i + k) else 0

    while (i < n) {
      val c = stmt.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == ',') { out += TIdent(","); i += 1 }
      else if (c == '\'' || c == '"') {
        val sb = new StringBuilder
        i += 1
        while (i < n && stmt.charAt(i) != c) {
          if (stmt.charAt(i) == '\\' && i + 1 < n) {
            // \\uXXXX unicode escape (reference: quoted directive args
            // like merge's unicode newline separator)
            if (stmt.charAt(i + 1) == 'u' && i + 5 < n &&
                stmt.substring(i + 2, i + 6).forall(ch =>
                  Character.digit(ch, 16) >= 0)) {
              sb.append(Integer.parseInt(stmt.substring(i + 2, i + 6), 16).toChar)
              i += 6
            } else { sb.append(unescape(stmt.charAt(i + 1))); i += 2 }
          } else { sb.append(stmt.charAt(i)); i += 1 }
        }
        i += 1 // closing quote
        out += TStr(sb.toString)
        // backslash escapes inside quotes preserve unknown sequences
        // (e.g. \d stays \d so regex args survive intact)
      } else if (c == ':' && (peek(1).isLetter || peek(1) == '_')) {
        // :column — name chars per reference Directives.g4 Column rule
        val sb = new StringBuilder
        i += 1
        while (i < n && (stmt.charAt(i).isLetterOrDigit ||
          "_-".contains(stmt.charAt(i)))) { sb.append(stmt.charAt(i)); i += 1 }
        out += TCol(sb.toString)
      } else if ((c == 'e' || c == 'p') && isBlockStart(stmt, i)) {
        // exp:{…} / prop:{…} — balanced-brace capture
        val kind = if (c == 'e') "exp" else "prop"
        val open = stmt.indexOf('{', i)
        var depth = 1
        var j = open + 1
        var quote: Char = 0
        while (j < n && depth > 0) {
          val cj = stmt.charAt(j)
          if (quote != 0) { if (cj == quote) quote = 0 }
          else if (cj == '\'' || cj == '"') quote = cj
          else if (cj == '{') depth += 1
          else if (cj == '}') depth -= 1
          j += 1
        }
        val body = stmt.substring(open + 1, j - 1).trim
        i = j
        if (kind == "exp") out += TExpr(body)
        else out += TProps(parseProps(body))
      } else if (c.isDigit || (c == '-' && peek(1).isDigit)) {
        val sb = new StringBuilder
        sb.append(c); i += 1
        while (i < n && (stmt.charAt(i).isDigit || stmt.charAt(i) == '.')) {
          sb.append(stmt.charAt(i)); i += 1
        }
        // `0:10=low` range-ish or `12:34` — not a plain number; fall back
        if (i < n && !stmt.charAt(i).isWhitespace && stmt.charAt(i) != ',') {
          while (i < n && !stmt.charAt(i).isWhitespace && stmt.charAt(i) != ',') {
            sb.append(stmt.charAt(i)); i += 1
          }
          out += TIdent(sb.toString)
        } else out += TNum(BigDecimal(sb.toString))
      } else {
        // bare word: read to whitespace/comma
        val sb = new StringBuilder
        while (i < n && !stmt.charAt(i).isWhitespace && stmt.charAt(i) != ',') {
          sb.append(stmt.charAt(i)); i += 1
        }
        val w = sb.toString
        out += (w.toLowerCase match {
          case "true"  => TBool(true)
          case "false" => TBool(false)
          case _       => TIdent(w)
        })
      }
    }
    out.toVector
  }

  private def isBlockStart(s: String, i: Int): Boolean =
    (s.startsWith("exp:{", i) || s.startsWith("exp:", i) && s.lift(i + 4).contains('{')) ||
      s.startsWith("prop:{", i)

  private def parseProps(body: String): Map[String, String] =
    body.split(",").iterator.map(_.trim).filter(_.nonEmpty).map { kv =>
      val eq = kv.indexOf('=')
      if (eq < 0) kv -> "true"
      else kv.take(eq).trim -> stripQuotes(kv.drop(eq + 1).trim)
    }.toMap

  private def stripQuotes(s: String): String =
    if (s.length >= 2 && (s.head == '\'' || s.head == '"') && s.last == s.head)
      s.substring(1, s.length - 1)
    else s

  private def unescape(c: Char): String = c match {
    case 'n' => "\n"; case 't' => "\t"; case 'r' => "\r"
    case '\'' => "'"; case '"' => "\""; case '\\' => "\\"
    case other => "\\" + other // keep regex escapes like \d intact
  }
}
