package graft.api

/** Typed tokens of the directive DSL.
  *
  * Token lexicon follows the reference grammar
  * (reference: wrangler-core Directives.g4:202-313 — Column `:name`,
  * String, Number, Bool, Identifier, `prop:{k=v,…}`, ranges
  * `lo:hi=value`, `exp:{…}` code blocks), re-expressed as a small
  * Scala ADT. Both v1 (bare-word) and v2 (`:col`, quoted) spellings
  * produce the same tokens — v1 bare words arrive as [[TIdent]] and
  * are coerced by the directive binders in [[graft.Wrangle]].
  */
sealed trait Token {
  /** Loose string rendering used by v1-style binders. */
  def text: String
}
final case class TCol(name: String) extends Token { def text = name }
final case class TStr(value: String) extends Token { def text = value }
final case class TNum(value: BigDecimal) extends Token {
  def text = value.toString
}
final case class TBool(value: Boolean) extends Token { def text = value.toString }
final case class TIdent(value: String) extends Token { def text = value }
/** `exp:{ … }` code block (JEXL-dialect expression). */
final case class TExpr(code: String) extends Token { def text = code }
/** `prop:{k=v,…}` property bag. */
final case class TProps(props: Map[String, String]) extends Token {
  def text = props.map { case (k, v) => s"$k=$v" }.mkString(",")
}
/** Comma-joined list (`:a,:b,:c` or `a,b,c`). */
final case class TList(items: Vector[Token]) extends Token {
  def text = items.map(_.text).mkString(",")
}

/** One parsed directive: name + positional tokens + the raw arg text
  * (kept for directives with exotic sub-syntax, e.g. quantize ranges,
  * sed expressions, cut-character ranges).
  */
final case class DirectiveSpec(name: String, tokens: Vector[Token], raw: String) {
  def arity: Int = tokens.size

  private def tok(i: Int): Token =
    if (i < tokens.size) tokens(i)
    else throw new RecipeException(
      s"$name: missing argument ${i + 1} (got: $raw)")

  /** Column-name argument: accepts `:col`, bare word, or quoted. */
  def col(i: Int): String = tok(i) match {
    case TCol(n)   => n
    case TIdent(n) => n
    case TStr(s)   => s
    case t => throw new RecipeException(s"$name: arg ${i + 1} is not a column: $t")
  }
  /** Column-list argument: single column or comma list. */
  def cols(i: Int): Seq[String] = tok(i) match {
    case TList(items) => items.map {
      case TCol(n) => n; case TIdent(n) => n; case TStr(s) => s
      case t => throw new RecipeException(s"$name: bad column in list: $t")
    }
    case _ => Seq(col(i))
  }
  def str(i: Int): String = tok(i) match {
    case TStr(s)   => s
    case TIdent(s) => s
    case TCol(s)   => s
    case TNum(n)   => n.toString
    case TBool(b)  => b.toString
    case TExpr(c)  => c
    case TList(xs) => xs.map(_.text).mkString(",") // e.g. cut ranges `1-3,7-8`
    case t => throw new RecipeException(s"$name: arg ${i + 1} is not text: $t")
  }
  def num(i: Int): BigDecimal = tok(i) match {
    case TNum(n) => n
    case TStr(s) => BigDecimal(s)
    case TIdent(s) => BigDecimal(s)
    case t => throw new RecipeException(s"$name: arg ${i + 1} is not numeric: $t")
  }
  def int(i: Int): Int = num(i).toInt
  def bool(i: Int): Boolean = tok(i) match {
    case TBool(b)  => b
    case TStr(s)   => s.equalsIgnoreCase("true")
    case TIdent(s) => s.equalsIgnoreCase("true")
    case t => throw new RecipeException(s"$name: arg ${i + 1} is not a bool: $t")
  }
  /** JEXL expression argument: `exp:{…}` or a bare/quoted string. */
  def expr(i: Int): String = tok(i) match {
    case TExpr(c) => c
    case TStr(s)  => s
    case _        => rawFrom(i)
  }
  /** Raw arg text from token i to end of line (v1 expressions). */
  def rawFrom(i: Int): String =
    tokens.drop(i).map(_.text).mkString(" ")

  def optCol(i: Int): Option[String] =
    if (i < tokens.size) Some(col(i)) else None
  def optStr(i: Int): Option[String] =
    if (i < tokens.size) Some(str(i)) else None
  def optBool(i: Int, default: Boolean): Boolean =
    if (i < tokens.size) bool(i) else default
  def optInt(i: Int, default: Int): Int =
    if (i < tokens.size) int(i) else default
}

class RecipeException(msg: String) extends RuntimeException(msg)
