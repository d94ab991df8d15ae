package graft.ops

import graft.api._
import graft.expr.ExprCompiler
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Projection / column-shape directives (SURVEY §2.3).
  *
  * All native Catalyst projections: Catalyst collapses consecutive
  * projects, so a recipe of N column ops compiles into one generated
  * projection over the scan — the scan only reads the pruned columns.
  */
object ColumnOps {

  def build(spec: DirectiveSpec): Option[PipeOp] = Option(spec.name match {
    case "drop" => simple(spec) { df => df.drop(spec.cols(0): _*) }

    case "keep" => simple(spec) { df =>
      val keep = spec.cols(0).map(_.toLowerCase).toSet
      val cols = df.columns.filter(c =>
        keep(c.toLowerCase) || c.startsWith(PipeState.HiddenPrefix))
      df.select(cols.map(col).toSeq: _*)
    }

    // errors if target exists under a different name, case-insensitively
    // (reference: wrangler-core utils/ColumnConverter.java:33-45)
    case "rename" => simple(spec) { df =>
      val (src, dst) = (spec.col(0), spec.col(1))
      val clash = df.columns.exists(c =>
        c.equalsIgnoreCase(dst) && !c.equalsIgnoreCase(src))
      if (clash) throw new RecipeException(
        s"rename: target column '$dst' already exists")
      df.withColumnRenamed(src, dst)
    }

    // positional rename of user-visible columns
    // (reference: wrangler-core directives/column/SetHeader.java:72)
    case "set-headers" => simple(spec) { df =>
      val names  = spec.cols(0)
      val user   = PipeState.userCols(df)
      val hidden = PipeState.hiddenCols(df)
      val renamed = user.zipWithIndex.map { case (c, i) =>
        if (i < names.size) col(c).as(names(i)) else col(c)
      }
      df.select((renamed ++ hidden.map(col)).toSeq: _*)
    }

    // bulk rename via sed s/…/…/ on column names
    // (reference: wrangler-core directives/column/ColumnsReplace.java:71)
    case "columns-replace" => simple(spec) { df =>
      val sed = parseSed(spec.str(0))
      renameAll(df, n => sed(n))
    }

    // trim, lowercase, non-[A-Za-z0-9_] → _
    // (reference: wrangler-core directives/column/CleanseColumnNames.java:72)
    case "cleanse-column-names" => simple(spec) { df =>
      renameAll(df, _.trim.toLowerCase.replaceAll("[^a-zA-Z0-9_]", "_"))
    }

    case "change-column-case" => simple(spec) { df =>
      val toUpper = spec.optStr(0).forall(_.toLowerCase.startsWith("upper"))
      renameAll(df, n => if (toUpper) n.toUpperCase else n.toLowerCase)
    }

    case "copy" => simple(spec) { df =>
      val (src, dst) = (spec.col(0), spec.col(1))
      val force = spec.optBool(2, default = false)
      if (!force && df.columns.exists(_.equalsIgnoreCase(dst)))
        throw new RecipeException(s"copy: column '$dst' exists (use force)")
      df.withColumn(dst, col(src))
    }

    case "merge" => simple(spec) { df =>
      df.withColumn(spec.col(2),
        concat_ws(spec.str(3), col(spec.col(0)), col(spec.col(1))))
    }

    case "swap" => simple(spec) { df =>
      val (l, r) = (spec.col(0), spec.col(1))
      renameAll(df, n =>
        if (n.equalsIgnoreCase(l)) r else if (n.equalsIgnoreCase(r)) l else n)
    }

    case "set-type" => simple(spec) { df =>
      val c = spec.col(0)
      val scale = spec.tokens.drop(2).collectFirst { case TNum(n) => n.toInt }
      // optional decimal rounding mode (reference: wrangler-core
      // utils/ColumnConverter.java:212-233 honors a RoundingMode arg);
      // HALF_EVEN maps to bround, HALF_UP to round, FLOOR/CEILING to
      // floor/ceil at the target scale; default = plain cast (HALF_UP)
      val rounding = spec.tokens.drop(2).collectFirst {
        case TIdent(m) if m.exists(_.isLetter) => m.toUpperCase
      }
      val casted = (spec.str(1).toUpperCase, scale, rounding) match {
        case ("DECIMAL", Some(s), Some(mode)) =>
          val pre = mode match {
            case "HALF_EVEN" => bround(col(c).cast(DoubleType), s)
            case "HALF_UP"   => round(col(c).cast(DoubleType), s)
            case "FLOOR" | "DOWN" =>
              (floor(col(c).cast(DoubleType) * math.pow(10, s)) / math.pow(10, s))
            case "CEILING" | "UP" =>
              (ceil(col(c).cast(DoubleType) * math.pow(10, s)) / math.pow(10, s))
            case _ => col(c)
          }
          pre.cast(DecimalType(38, s))
        case _ => castTo(col(c), spec.str(1), scale)
      }
      df.withColumn(c, casted)
    }

    // regex-split into appended col_1..col_n; arity resolved by a
    // bounded sample probe, mirroring the reference service deriving
    // schema from sampled rows (reference: wrangler-service
    // service/directive/DirectivesHandler.java:683-687)
    case "split-to-columns" => simple(spec) { df =>
      val (c, re) = (spec.col(0), spec.str(1))
      val parts = split(col(c), re)
      val n = probeArity(df, parts)
      // alias the split array ONCE (CollapseProject keeps a multi-
      // referenced non-cheap alias un-inlined): inlining `parts` into
      // every output column made the collapsed projection re-run the
      // regex split n times per row
      val tmp = freshName(df, "__graft_split_parts")
      (1 to n).foldLeft(df.withColumn(tmp, parts)) { (d, i) =>
        d.withColumn(s"${c}_$i", element_at(col(tmp), i))
      }.drop(tmp)
    }

    // metadata-driven rename+retype toward a target data-model field
    // (reference: wrangler-core directives/datamodel/DataModelMapColumn.java:152
    //  — resolves the target field from an Avro schema glossary; here the
    //  target name/type arrive via prop:{field=…,type=…} or positionally)
    case "data-model-map-column" => simple(spec) { df =>
      val props = spec.tokens.collectFirst { case TProps(p) => p }.getOrElse(Map.empty)
      val src = spec.col(spec.arity - 1)
      val target = props.getOrElse("field",
        if (spec.arity >= 2) spec.col(spec.arity - 2) else src)
      val typed = props.get("type") match {
        case Some(t) => castTo(col(src), t, None)
        case None    => col(src)
      }
      df.withColumn(src, typed).withColumnRenamed(src, target)
    }

    // v1 `set columns a,b,c` = positional header rename (reference:
    // wrangler-core parser/MigrateToV2.java:100-121 maps `set columns`
    // → set-headers and `set column` → set-column)
    case "set" if spec.str(0).toLowerCase == "columns" =>
      simple(spec) { df =>
        val names = spec.cols(1)
        val user = PipeState.userCols(df)
        val hidden = PipeState.hiddenCols(df)
        val renamed = user.zipWithIndex.map { case (c, i) =>
          if (i < names.size) col(c).as(names(i)) else col(c)
        }
        df.select((renamed ++ hidden.map(col)).toSeq: _*)
      }

    case "set-column" | "set" => // v1: `set column <col> <expr>`
      val (target, exprSrc) = if (spec.name == "set") {
        // v1 spelling: `set column dest expr…`
        if (spec.str(0).toLowerCase == "column") (spec.col(1), spec.rawFrom(2))
        else (spec.col(0), spec.rawFrom(1))
      } else (spec.col(0), spec.expr(1))
      simple(spec) { df => df.withColumn(target, ExprCompiler.compile(exprSrc)) }

    case _ => null
  })

  // -- shared helpers --------------------------------------------------

  def simple(spec: DirectiveSpec)(f: DataFrame => DataFrame): PipeOp =
    new PipeOp {
      def name = spec.name
      def apply(st: PipeState, ctx: WrangleContext): PipeState = st.mapDf(f)
    }

  def renameAll(df: DataFrame, f: String => String): DataFrame = {
    val cols = df.columns.map { c =>
      if (c.startsWith(PipeState.HiddenPrefix)) col(c) else col(c).as(f(c))
    }
    df.select(cols.toSeq: _*)
  }

  /** sed `s/pat/rep/flags` → String=>String (for column names). */
  def parseSed(sedExp: String): String => String = {
    val (pat, rep, flags) = splitSed(sedExp)
    val p = java.util.regex.Pattern.compile(
      if (flags.contains('i')) "(?i)" + pat else pat)
    val global = flags.contains('g')
    (s: String) => {
      val m = p.matcher(s)
      if (global) m.replaceAll(rep) else m.replaceFirst(rep)
    }
  }

  /** Split `s/pat/rep/flags` honoring escaped delimiters. */
  def splitSed(sedExp: String): (String, String, String) = {
    val e = sedExp.trim
    if (e.length < 4 || e.charAt(0) != 's')
      throw new RecipeException(s"bad sed expression: $sedExp")
    val d = e.charAt(1)
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var i = 2
    while (i < e.length) {
      val c = e.charAt(i)
      if (c == '\\' && i + 1 < e.length && e.charAt(i + 1) == d) {
        cur.append(d); i += 2
      } else if (c == d) { parts += cur.toString; cur.clear(); i += 1 }
      else { cur.append(c); i += 1 }
    }
    parts += cur.toString
    val pat = if (parts.nonEmpty) parts(0) else ""
    val rep = if (parts.size > 1) parts(1) else ""
    val flags = if (parts.size > 2) parts(2) else ""
    (pat, rep, flags)
  }

  /** A temp-column name guaranteed absent from `df` — a fixed
    * `__graft_*` literal silently REPLACES a same-named user column
    * via withColumn and the final drop then deletes the user's data
    * (ADVICE r17). */
  def freshName(df: DataFrame, base: String): String = {
    var n = base
    var i = 0
    while (df.columns.contains(n)) { i += 1; n = s"${base}_$i" }
    n
  }

  /** Max split arity over a bounded sample (driver-side probe; the scan
    * is limited so this stays cheap at any data scale).
    */
  def probeArity(df: DataFrame, parts: Column): Int = {
    val r = df.limit(1000).select(max(size(parts))).head()
    if (r.isNullAt(0)) 1 else math.max(1, r.getInt(0))
  }

  /** `set-type` cast semantics
    * (reference: wrangler-core utils/ColumnConverter.java:89-256).
    */
  def castTo(c: Column, typeName: String, scale: Option[Int]): Column =
    typeName.toUpperCase match {
      case "INT" | "INTEGER" | "I32"    => c.cast(IntegerType)
      case "I64" | "LONG"               => c.cast(LongType)
      case "SHORT"                      => c.cast(ShortType)
      case "FLOAT"                      => c.cast(FloatType)
      case "DOUBLE"                     => c.cast(DoubleType)
      case "DECIMAL" =>
        c.cast(DecimalType(38, scale.getOrElse(6)))
      case "BOOL" | "BOOLEAN"           => c.cast(BooleanType)
      case "STRING"                     => c.cast(StringType)
      case "BYTES"                      => c.cast(BinaryType)
      case "TIMESTAMP"                  => c.cast(TimestampType)
      case "DATE"                       => c.cast(DateType)
      case other => throw new RecipeException(s"set-type: unknown type $other")
    }
}
