/* Native Catalyst expressions for graft.
 *
 * Lives under org.apache.spark.sql so it can use the private[sql]
 * Column<->Expression bridge (classic.ExpressionUtils) — the supported
 * route for libraries shipping custom expressions on Spark 4.
 */
package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen._
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** mask-number as a whole-stage-codegen'd expression: '#' keeps the
  * digit, 'x' masks, literal chars pass through (consume-if-equal)
  * (reference semantics: wrangler-core
  * directives/transformation/MaskNumber.java:121-146).
  *
  * The scalar kernel is shared with the UDF fallback
  * ([[graft.functions.Udfs.maskNumber]]); this form stays inside
  * codegen so a masking-heavy recipe doesn't break the generated
  * pipeline into interpreted islands.
  */
case class MaskNumberExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = StringType

  override protected def nullSafeEval(value: Any, pattern: Any): Any =
    UTF8String.fromString(graft.functions.Udfs.maskNumber(
      value.asInstanceOf[UTF8String].toString,
      pattern.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, p) =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.functions.Udfs.maskNumber($v.toString(), $p.toString()));
         |""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MaskNumberExpr =
    copy(left = newLeft, right = newRight)
}

/** FNV-1a 64-bit hash of a string — codegen'd kernel shared with the
  * dedup pipeline's shingle hashing, exposed as an expression for
  * recipes that need a stable cheap hash column.
  */
case class Fnv64Expr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType

  override protected def nullSafeEval(value: Any): Any = {
    val s = value.asInstanceOf[UTF8String].toString
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i); h *= 0x100000001b3L; i += 1 }
    java.lang.Long.valueOf(h)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"""String s = $v.toString();
         |long h = 0xcbf29ce484222325L;
         |for (int i = 0; i < s.length(); i++) {
         |  h ^= s.charAt(i); h *= 0x100000001b3L;
         |}
         |${ev.value} = h;
         |""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Fnv64Expr =
    copy(child = newChild)
}

/** All seven split-url parts from ONE `java.net.URI` parse per row,
  * as a struct — replaces 8 independent `parse_url` calls (each of
  * which re-parses the URL) in the split-url directive. Field
  * semantics match Spark's `ParseUrl` (URI accessors, null on
  * syntax error); codegen CSE computes the struct once and the seven
  * `GetStructField` reads stay inside whole-stage codegen.
  */
case class UrlPartsExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = UrlPartsExpr.schema
  // Returns null on URISyntaxException even for a non-null child, so
  // nullability must not follow the child (same reason Spark's ParseUrl
  // hard-codes nullable = true): with a non-nullable child the codegen
  // below would assign into a FalseLiteral isNull and fail to compile.
  override def nullable: Boolean = true

  override protected def nullSafeEval(value: Any): Any =
    UrlPartsExpr.parts(value.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val r = ctx.freshName("urlParts")
      s"""org.apache.spark.sql.catalyst.InternalRow $r =
         |  org.apache.spark.sql.graftx.UrlPartsExpr.parts($v);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): UrlPartsExpr =
    copy(child = newChild)
}

object UrlPartsExpr {
  val schema: StructType = StructType(Seq(
    StructField("protocol", StringType),
    StructField("authority", StringType),
    StructField("host", StringType),
    StructField("port", IntegerType),
    StructField("path", StringType),
    StructField("file", StringType),
    StructField("query", StringType)))

  private def u8(s: String): UTF8String =
    if (s == null) null else UTF8String.fromString(s)

  /** One URI parse -> all parts; null on unparseable input (matching
    * parse_url, which nulls every part for a bad URL).
    */
  def parts(url: UTF8String): org.apache.spark.sql.catalyst.InternalRow =
    try {
      val uri = new java.net.URI(url.toString)
      val rawPath = uri.getRawPath
      val rawQuery = uri.getRawQuery
      val file =
        if (rawPath == null) null
        else if (rawQuery == null) rawPath
        else rawPath + "?" + rawQuery
      val port: Any =
        if (uri.getPort == -1) null else java.lang.Integer.valueOf(uri.getPort)
      val scheme = uri.getScheme
      new GenericInternalRow(Array[Any](
        u8(if (scheme == null) null
           else scheme.toLowerCase(java.util.Locale.ROOT)),
        u8(uri.getRawAuthority), u8(uri.getHost), port,
        u8(rawPath), u8(file), u8(rawQuery)))
    } catch { case _: java.net.URISyntaxException => null }
}

/** ALL capture groups of a regex in ONE match execution per row, as
  * array<string> — replaces N independent `regexp_extract` calls (one
  * per group), each of which re-runs the whole regex. Per-group
  * semantics mirror `regexp_extract`: empty string when the regex
  * doesn't match or the group didn't participate. Codegen CSE
  * computes the array once; the element reads are free.
  */
case class RegexGroupsAllExpr(child: Expression, regex: String)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val pattern = java.util.regex.Pattern.compile(regex)
  @transient private lazy val nGroups = pattern.matcher("").groupCount()

  def extractAll(v: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val out = new Array[AnyRef](nGroups)
    val m = pattern.matcher(v.toString)
    if (m.find()) {
      var i = 0
      while (i < nGroups) {
        val g = m.group(i + 1)
        out(i) =
          if (g == null) UTF8String.EMPTY_UTF8 else UTF8String.fromString(g)
        i += 1
      }
    } else java.util.Arrays.fill(out, UTF8String.EMPTY_UTF8)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def nullSafeEval(value: Any): Any =
    extractAll(value.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("regexGroupsAll", this,
      classOf[RegexGroupsAllExpr].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.extractAll($v);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): RegexGroupsAllExpr = copy(child = newChild)
}

/** Column-level API for the native expressions. */
object functions {
  def mask_number(col: Column, pattern: Column): Column =
    ExpressionUtils.column(MaskNumberExpr(
      ExpressionUtils.expression(col), ExpressionUtils.expression(pattern)))

  def fnv64(col: Column): Column =
    ExpressionUtils.column(Fnv64Expr(ExpressionUtils.expression(col)))

  def url_parts(col: Column): Column =
    ExpressionUtils.column(UrlPartsExpr(ExpressionUtils.expression(col)))

  def regex_groups_all(col: Column, regex: String): Column =
    ExpressionUtils.column(
      RegexGroupsAllExpr(ExpressionUtils.expression(col), regex))
}
