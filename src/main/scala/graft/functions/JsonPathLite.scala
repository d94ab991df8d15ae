package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ArrayNode

/** JsonPath subset beyond Spark's `get_json_object`: recursive descent
  * (`$..name`), wildcards (`[*]`, `.*`), negative indexing (`[-1]`),
  * Python-style slices (`[1:3]`, `[::2]`, `[::-1]`), index/field unions
  * (`[1,3]`, `['a','b']`), and predicates on dotted @-paths with a
  * literal or another @-path on the right (`[?(@.a.b > 3)]`,
  * `[?(@.a > @.b)]`, bare existence `[?(@.a)]`), composable with
  * `&&`/`||` (`&&` binds tighter, as in Jayway) — the Jayway features
  * recipes actually use (reference: wrangler-core
  * directives/parser/JsPath.java:90 + functions/JsonFunctions).
  * Simple dotted paths keep using the codegen'd `get_json_object`;
  * this interpreter only runs when the path needs it
  * (see ParserOps "json-path").
  *
  * Result rendering matches get_json_object: scalar → raw text,
  * object/array → JSON text, no match → null; multiple matches render
  * as a JSON array.
  */
object JsonPathLite {

  sealed trait Seg
  private case class Field(name: String) extends Seg
  private case class Index(i: Int) extends Seg
  private case object Wildcard extends Seg
  private case class RecurseField(name: String) extends Seg
  /** One comparison atom: `lhs` is the dotted @-path; `rhs` is
    * Left(@-path) or Right(literal); op "" = bare existence `@.a`. */
  private case class Atom(lhs: List[String], op: String,
      rhs: Either[List[String], String])
  /** A filter `[?(...)]` in disjunctive normal form: OR of ANDs
    * (`&&` binds tighter than `||`, as in Jayway). */
  private case class Pred(ors: List[List[Atom]]) extends Seg
  private case class Slice(start: Option[Int], end: Option[Int],
      step: Int) extends Seg
  private case class IndexUnion(is: Seq[Int]) extends Seg
  private case class FieldUnion(names: Seq[String]) extends Seg

  /** True when the path needs the interpreter (get_json_object can't).
    * `.*` anywhere — interior object wildcards like `$.*.a` return
    * silent nulls from get_json_object.
    */
  def needsLite(path: String): Boolean =
    path.contains("..") || path.contains("[*]") || path.contains("[?") ||
      path.contains(".*") ||
      // a colon only signals a SLICE inside brackets — a bare colon in
      // a dotted name (namespaced keys like $.soap:Envelope) stays on
      // get_json_object, which handles it natively
      raw"\[\s*-?\d*\s*:".r.findFirstIn(path).isDefined ||
      raw"\[\s*-?\d+\s*,".r.findFirstIn(path).isDefined ||
      raw"\[\s*'[^']*'\s*,".r.findFirstIn(path).isDefined ||
      raw"\[\s*-\d+\s*\]".r.findFirstIn(path).isDefined

  private val AtomRe =
    ("""\s*@\.([A-Za-z0-9_]+(?:\.[A-Za-z0-9_]+)*)""" +
      """(?:\s*(==|!=|<=|>=|<|>)\s*""" +
      """(@\.[A-Za-z0-9_]+(?:\.[A-Za-z0-9_]+)*|'[^']*'|"[^"]*"|[^)\s&|]+))?\s*""").r

  private def parseAtom(s: String): Atom = AtomRe.findPrefixMatchOf(s) match {
    case Some(m) if m.matched.length == s.length =>
      if (m.group(2) == null) Atom(m.group(1).split('.').toList, "", Right(""))
      else {
        val rv = m.group(3)
        val rhs =
          if (rv.startsWith("@.")) Left(rv.drop(2).split('.').toList)
          else Right(rv.stripPrefix("'").stripSuffix("'")
            .stripPrefix("\"").stripSuffix("\""))
        Atom(m.group(1).split('.').toList, m.group(2), rhs)
      }
    case _ => throw new IllegalArgumentException(s"bad filter atom '$s'")
  }

  /** Split on a two-char separator outside single/double quotes. */
  private def splitTop(s: String, sep: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    val cur = new java.lang.StringBuilder
    var i = 0
    var quote: Char = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) { cur.append(c); if (c == quote) quote = 0; i += 1 }
      else if (c == '\'' || c == '"') { quote = c; cur.append(c); i += 1 }
      else if (s.startsWith(sep, i)) { out += cur.toString; cur.setLength(0); i += sep.length }
      else { cur.append(c); i += 1 }
    }
    out += cur.toString
    out.toList
  }

  /** Find the index just past the `)]` that closes `[?(`, honoring
    * quoted literals. Returns -1 when unterminated. */
  private def filterEnd(p: String): Int = {
    var i = 2 // past "[?"
    var depth = 0
    var quote: Char = 0
    while (i < p.length) {
      val c = p.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '\'' || c == '"') quote = c
      else if (c == '(') depth += 1
      else if (c == ')') {
        depth -= 1
        if (depth == 0)
          return if (p.startsWith(")]", i)) i + 2 else -1
      }
      i += 1
    }
    -1
  }
  private val SliceRe = raw"\[\s*(-?\d*)\s*:\s*(-?\d*)\s*(?::\s*(-?\d+)\s*)?\]".r

  private[functions] def parsePath(p0: String): List[Seg] = {
    var p = p0.trim.stripPrefix("$")
    val out = scala.collection.mutable.ListBuffer.empty[Seg]
    while (p.nonEmpty) {
      // dotted names accept ':' and '-' too (namespaced/kebab keys),
      // matching get_json_object's lenient named-field grammar
      def nameChar(c: Char) =
        c.isLetterOrDigit || c == '_' || c == ':' || c == '-'
      if (p.startsWith("..")) {
        val rest = p.drop(2)
        val name = rest.takeWhile(nameChar)
        require(name.nonEmpty, s"bad recursive descent in $p0")
        out += RecurseField(name)
        p = rest.drop(name.length)
      } else if (p.startsWith(".*")) { out += Wildcard; p = p.drop(2) }
      else if (p.startsWith(".")) {
        val rest = p.drop(1)
        val name = rest.takeWhile(nameChar)
        require(name.nonEmpty, s"bad field in $p0")
        out += Field(name)
        p = rest.drop(name.length)
      } else if (p.startsWith("[*]")) { out += Wildcard; p = p.drop(3) }
      else if (p.startsWith("[?")) {
        val end = filterEnd(p)
        require(end > 0, s"bad filter in $p0")
        val inner = p.substring(3, end - 2) // strip "[?(" and ")]"
        out += Pred(splitTop(inner, "||").map(or =>
          splitTop(or, "&&").map(parseAtom)))
        p = p.drop(end)
      } else if (SliceRe.findPrefixMatchOf(p).isDefined) {
        val m = SliceRe.findPrefixMatchOf(p).get
        def opt(s: String) = if (s.isEmpty) None else Some(s.toInt)
        val st = Option(m.group(3)).map(_.toInt).getOrElse(1)
        require(st != 0, s"zero slice step in $p0")
        out += Slice(opt(m.group(1)), opt(m.group(2)), st)
        p = p.drop(m.matched.length)
      } else if (p.startsWith("['")) {
        // quote-aware closing-bracket scan and comma split, so quoted
        // names may contain ',' or ']' ("$['a,b']" is ONE field)
        var i = 1
        var quote: Char = 0
        var end = -1
        while (i < p.length && end < 0) {
          val ch = p.charAt(i)
          if (quote != 0) { if (ch == quote) quote = 0 }
          else if (ch == '\'') quote = ch
          else if (ch == ']') end = i
          i += 1
        }
        require(end > 0, s"bad bracket field in $p0")
        val names = splitTop(p.substring(1, end), ",").map(_.trim)
        require(names.forall(n =>
          n.length >= 2 && n.head == '\'' && n.last == '\''),
          s"bad bracket field in $p0")
        val fs = names.map(n => n.substring(1, n.length - 1))
        out += (if (fs.length == 1) Field(fs.head) else FieldUnion(fs))
        p = p.drop(end + 1)
      } else if (p.startsWith("[")) {
        val end = p.indexOf("]")
        require(end > 0, s"bad index in $p0")
        val parts = p.substring(1, end).split(",").map(_.trim.toInt).toSeq
        out += (if (parts.length == 1) Index(parts.head) else IndexUnion(parts))
        p = p.drop(end + 1)
      } else throw new IllegalArgumentException(s"bad path segment at '$p' in $p0")
    }
    out.toList
  }

  private def descendants(n: JsonNode,
      acc: scala.collection.mutable.ListBuffer[JsonNode]): Unit = {
    acc += n
    val it = n.elements()
    while (it.hasNext) descendants(it.next(), acc)
  }

  /** Walk a dotted @-path from `n`; null when any hop is missing. */
  private def resolve(n: JsonNode, path: List[String]): JsonNode =
    path.foldLeft(n) { (cur, name) =>
      if (cur == null) null
      else { val next = cur.get(name); if (next == null || next.isNull) null else next }
    }

  private def matchAtom(n: JsonNode, a: Atom): Boolean = {
    val f = resolve(n, a.lhs)
    if (f == null) return false
    if (a.op.isEmpty) return true // bare existence filter [?(@.a)]
    val (value, rhsNumeric) = a.rhs match {
      case Left(rp) =>
        val r = resolve(n, rp)
        if (r == null) return false
        (r.asText(), r.isNumber)
      case Right(lit) => (lit, scala.util.Try(lit.toDouble).isSuccess)
    }
    val numericCmp = f.isNumber && rhsNumeric
    def cmp: Int =
      if (numericCmp) java.lang.Double.compare(f.asDouble(), value.toDouble)
      else f.asText().compareTo(value)
    a.op match {
      case "==" => if (numericCmp) cmp == 0 else f.asText() == value
      case "!=" => if (numericCmp) cmp != 0 else f.asText() != value
      case "<"  => cmp < 0
      case "<=" => cmp <= 0
      case ">"  => cmp > 0
      case ">=" => cmp >= 0
      case _    => false
    }
  }

  private def matches(n: JsonNode, pr: Pred): Boolean =
    pr.ors.exists(_.forall(matchAtom(n, _)))

  private def step(nodes: Seq[JsonNode], seg: Seg): Seq[JsonNode] = seg match {
    case Field(name) =>
      nodes.flatMap(n => Option(n.get(name)).filterNot(_.isNull))
    case Index(i) =>
      // negative = from the end, Jayway/Python style
      nodes.flatMap(n => Option(n.get(if (i < 0) n.size + i else i)))
    case Slice(s0, e0, st) =>
      nodes.flatMap { n =>
        if (!n.isArray) Nil
        else {
          val len = n.size
          def norm(i: Int, dflt: Int) = {
            val v = if (i < 0) len + i else i
            math.max(0, math.min(len, v))
          }
          if (st > 0) {
            val s = s0.map(norm(_, 0)).getOrElse(0)
            val e = e0.map(norm(_, len)).getOrElse(len)
            (s until e by st).map(n.get)
          } else {
            // negative step walks backwards; open start = last element
            val s = s0.map(i => math.min(len - 1, if (i < 0) len + i else i))
              .getOrElse(len - 1)
            val e = e0.map(i => math.max(-1, if (i < 0) len + i else i))
              .getOrElse(-1)
            (s until e by st).filter(i => i >= 0 && i < len).map(n.get)
          }
        }
      }
    case IndexUnion(is) =>
      nodes.flatMap(n =>
        is.flatMap(i => Option(n.get(if (i < 0) n.size + i else i))))
    case FieldUnion(names) =>
      nodes.flatMap(n =>
        names.flatMap(f => Option(n.get(f)).filterNot(_.isNull)))
    case Wildcard =>
      nodes.flatMap { n =>
        val out = scala.collection.mutable.ListBuffer.empty[JsonNode]
        val it = n.elements()
        while (it.hasNext) out += it.next()
        out
      }
    case RecurseField(name) =>
      nodes.flatMap { n =>
        val all = scala.collection.mutable.ListBuffer.empty[JsonNode]
        descendants(n, all)
        all.flatMap(d => Option(d.get(name)).filterNot(_.isNull))
      }
    case p: Pred =>
      nodes.flatMap { n =>
        if (n.isArray) {
          val out = scala.collection.mutable.ListBuffer.empty[JsonNode]
          val it = n.elements()
          while (it.hasNext) { val e = it.next(); if (matches(e, p)) out += e }
          out
        } else if (matches(n, p)) Seq(n) else Nil
      }
  }

  private val mapper = new ObjectMapper()

  private def render(results: Seq[JsonNode]): String = results match {
    case Seq() => null
    case Seq(one) =>
      if (one.isValueNode) one.asText() else mapper.writeValueAsString(one)
    case many =>
      val arr = mapper.createArrayNode()
      many.foreach(arr.add)
      mapper.writeValueAsString(arr)
  }

  def eval(json: String, path: String): String = {
    if (json == null) return null
    try {
      val root = mapper.readTree(json)
      if (root == null) return null
      render(parsePath(path).foldLeft(Seq(root))(step))
    } catch { case _: Exception => null }
  }

  val evalUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf(eval _)
}
