package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ArrayNode

/** JsonPath subset beyond Spark's `get_json_object`: recursive descent
  * (`$..name`), wildcards (`[*]`, `.*`), array slices by index, and
  * simple predicates (`[?(@.field op value)]`) — the Jayway features
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
  private case class Pred(field: String, op: String, value: String) extends Seg

  /** True when the path needs the interpreter (get_json_object can't).
    * `.*` anywhere — interior object wildcards like `$.*.a` return
    * silent nulls from get_json_object.
    */
  def needsLite(path: String): Boolean =
    path.contains("..") || path.contains("[*]") || path.contains("[?") ||
      path.contains(".*") || path.contains(":") ||
      raw"\[\s*\d+\s*,".r.findFirstIn(path).isDefined

  private val FilterRe =
    """\[\?\(@\.([A-Za-z0-9_]+)\s*(==|!=|<=|>=|<|>)\s*('[^']*'|"[^"]*"|[^)\s]+)\)\]""".r

  private[functions] def parsePath(p0: String): List[Seg] = {
    var p = p0.trim.stripPrefix("$")
    val out = scala.collection.mutable.ListBuffer.empty[Seg]
    while (p.nonEmpty) {
      if (p.startsWith("..")) {
        val rest = p.drop(2)
        val name = rest.takeWhile(c => c.isLetterOrDigit || c == '_')
        require(name.nonEmpty, s"bad recursive descent in $p0")
        out += RecurseField(name)
        p = rest.drop(name.length)
      } else if (p.startsWith(".*")) { out += Wildcard; p = p.drop(2) }
      else if (p.startsWith(".")) {
        val rest = p.drop(1)
        val name = rest.takeWhile(c => c.isLetterOrDigit || c == '_')
        require(name.nonEmpty, s"bad field in $p0")
        out += Field(name)
        p = rest.drop(name.length)
      } else if (p.startsWith("[*]")) { out += Wildcard; p = p.drop(3) }
      else if (p.startsWith("[?")) {
        FilterRe.findPrefixMatchOf(p) match {
          case Some(m) =>
            out += Pred(m.group(1), m.group(2),
              m.group(3).stripPrefix("'").stripSuffix("'")
                .stripPrefix("\"").stripSuffix("\""))
            p = p.drop(m.matched.length)
          case None => throw new IllegalArgumentException(s"bad filter in $p0")
        }
      } else if (p.startsWith("['")) {
        val end = p.indexOf("']")
        require(end > 0, s"bad bracket field in $p0")
        out += Field(p.substring(2, end))
        p = p.drop(end + 2)
      } else if (p.startsWith("[")) {
        val end = p.indexOf("]")
        require(end > 0, s"bad index in $p0")
        out += Index(p.substring(1, end).trim.toInt)
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

  private def matches(n: JsonNode, pr: Pred): Boolean = {
    val f = n.get(pr.field)
    if (f == null || f.isNull) return false
    val numericCmp = f.isNumber &&
      scala.util.Try(pr.value.toDouble).isSuccess
    def cmp: Int =
      if (numericCmp) java.lang.Double.compare(f.asDouble(), pr.value.toDouble)
      else f.asText().compareTo(pr.value)
    pr.op match {
      case "==" => if (numericCmp) cmp == 0 else f.asText() == pr.value
      case "!=" => if (numericCmp) cmp != 0 else f.asText() != pr.value
      case "<"  => cmp < 0
      case "<=" => cmp <= 0
      case ">"  => cmp > 0
      case ">=" => cmp >= 0
      case _    => false
    }
  }

  private def step(nodes: Seq[JsonNode], seg: Seg): Seq[JsonNode] = seg match {
    case Field(name) =>
      nodes.flatMap(n => Option(n.get(name)).filterNot(_.isNull))
    case Index(i) =>
      nodes.flatMap(n => Option(n.get(i)))
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
