package graft.expr

import graft.api.RecipeException
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar function namespaces of the expression dialect, compiled to
  * native Catalyst columns.
  *
  * Namespace inventory mirrors the reference JEXL bindings
  * (reference: wrangler-core expression/EL.java:141-158 — global,
  * datetime:, date:, json:, math:, string:/strings:, escape:, bytes:,
  * arrays:, dq:, geo:, number:, logical:, decimal:, arithmetic:, types:).
  * Every function here is a deterministic scalar, so everything stays
  * inside whole-stage codegen — no UDFs on this path.
  */
object Functions {

  /** User-registered expression functions — the engine's counterpart of
    * the reference registering whole Java classes into the EL
    * (EL.java:141-158). Keys are lowercase "ns:fn" (or bare "fn");
    * user registrations win over the built-in table, so a deployment
    * can also override a built-in.
    */
  @volatile private var userFns: Map[String, List[Column] => Column] = Map.empty

  def register(name: String, fn: List[Column] => Column): Unit =
    synchronized { userFns += name.toLowerCase -> fn }

  def unregister(name: String): Unit =
    synchronized { userFns -= name.toLowerCase }

  def dispatch(ns: String, fn: String, argEs: List[Expr]): Column = {
    val key = if (ns.isEmpty) fn else s"$ns:$fn"
    val args: List[Column] = argEs.map(ExprCompiler.toColumn)
    def a(i: Int) = args(i)
    // literal-string argument (needed where Spark's API takes a String)
    def litStr(i: Int): String = argEs(i) match {
      case Expr.Lit(s: String) => s
      case other => throw new RecipeException(
        s"$key: argument ${i + 1} must be a string literal, got $other")
    }

    val user = userFns.get(key)
    if (user.isDefined) return user.get(args)

    key match {
      // ---- global namespace (reference: io.cdap.functions.Global) ----
      case "coalesce"            => coalesce(args: _*)
      case "concat"              => concat(args: _*)
      case "format"              => format_string(litStr(0), args.tail: _*)
      case "lower" | "lowercase" => lower(a(0))
      case "upper" | "uppercase" => upper(a(0))
      case "titlecase"           => initcap(a(0))
      case "trim"                => trim(a(0))
      case "ltrim"               => ltrim(a(0))
      case "rtrim"               => rtrim(a(0))
      case "length" | "strlen"   => length(a(0))
      case "substring"           =>
        if (args.size == 2) a(0).substr(a(1) + lit(1), length(a(0)))
        else a(0).substr(a(1) + lit(1), a(2) - a(1))
      case "indexof"             => instr(a(0), a(1)) - lit(1) // 0-based like Java
      case "contains"            => a(0).contains(a(1))
      case "startswith"          => a(0).startsWith(a(1))
      case "endswith"            => a(0).endsWith(a(1))
      case "replace"             => regexp_replace(a(0), a(1), a(2))
      case "reverse"             => reverse(a(0))
      case "split"               => split(a(0), a(1))
      case "repeat"              => repeat(a(0), a(1).cast(IntegerType))
      case "padatstart"          => lpad(a(0), a(1).cast(IntegerType), lit(" "))
      case "padatend"            => rpad(a(0), a(1).cast(IntegerType), lit(" "))
      case "unquote"             => regexp_replace(a(0), "^[\"']|[\"']$", "")
      case "tointeger" | "tolong" => a(0).cast(LongType)
      case "tofloat"             => a(0).cast(FloatType)
      case "todouble"            => a(0).cast(DoubleType)
      case "tostring"            => a(0).cast(StringType)
      case "tobytes"             => a(0).cast(BinaryType)
      case "nulltoempty"         => coalesce(a(0), lit(""))
      case "nulltozero"          => coalesce(a(0), lit(0))
      case "nulltovalue"         => coalesce(a(0), a(1))
      case "isnull"              => a(0).isNull
      case "isnotnull"           => a(0).isNotNull
      case "getfield"            => a(0).getField(litStr(1))
      // method-style shims (postfix `.length()` etc.)
      case "charat"              => a(0).substr(a(1) + lit(1), lit(1))
      case "equalsignorecase"    => lower(a(0)) === lower(a(1))

      // ---- math: (java.lang.Math statics) ----
      case "math:abs"    => abs(a(0))
      case "math:ceil"   => ceil(a(0))
      case "math:floor"  => floor(a(0))
      case "math:exp"    => exp(a(0))
      case "math:log"    => log(a(0))
      case "math:log10"  => log10(a(0))
      case "math:log2"   => log2(a(0))
      case "math:pow"    => pow(a(0), a(1))
      case "math:sqrt"   => sqrt(a(0))
      case "math:cbrt"   => cbrt(a(0))
      case "math:sin"    => sin(a(0))
      case "math:cos"    => cos(a(0))
      case "math:tan"    => tan(a(0))
      case "math:signum" => signum(a(0))
      case "math:hypot"  => hypot(a(0), a(1))
      case "math:min"    => least(args: _*)
      case "math:max"    => greatest(args: _*)
      case "math:round"  => round(a(0))
      case "math:rint"   => round(a(0)).cast(DoubleType)
      case "math:random" => rand()
      case "math:floordiv" => floor(a(0) / a(1)).cast(LongType)
      case "math:toradians" => radians(a(0))
      case "math:todegrees" => degrees(a(0))

      // ---- string:/strings: (commons-lang StringUtils surface) ----
      case s if s.startsWith("string:") || s.startsWith("strings:") =>
        stringNs(s.substring(s.indexOf(':') + 1), args)

      // ---- dq: data-quality predicates (reference: functions/DataQuality.java) ----
      case s if s.startsWith("dq:") => dqNs(s.substring(3), args)

      // ---- date:/datetime: ----
      case s if s.startsWith("date:") => dateNs(s.substring(5), args)
      case s if s.startsWith("datetime:") => dateNs(s.substring(9), args)

      // ---- number: ----
      case "number:asinteger" => a(0).cast(IntegerType)
      case "number:asfloat"   => a(0).cast(FloatType)
      case "number:asdouble"  => a(0).cast(DoubleType)
      case "number:mantissa"  => a(0).cast(DoubleType) % lit(1.0)

      // ---- logical: bitwise ----
      case "logical:bitand" => a(0).bitwiseAND(a(1))
      case "logical:bitor"  => a(0).bitwiseOR(a(1))
      case "logical:bitxor" => a(0).bitwiseXOR(a(1))
      case "logical:not"    => when(a(0) === 0, 1).otherwise(0)
      case "logical:setbit" =>
        // reference SetBit(value, position, bit): set (bit=1) or clear
        // (bit=0) the bit at the given position
        val value = a(0).cast(LongType)
        val mask  = call_function("shiftleft", lit(1L), a(1).cast(IntegerType))
        if (args.size >= 3)
          when(a(2).cast(IntegerType) === 1, value.bitwiseOR(mask))
            .otherwise(value.bitwiseAND(bitwise_not(mask)))
        else value.bitwiseOR(mask)

      // ---- json: ----
      case "json:select"      =>
        // reference JsonFunctions.Select takes 1+ paths: first match
        // wins; Jayway-only path features route to the interpreter
        def one(i: Int): Column = {
          val p = litStr(i)
          val path = if (p.startsWith("$")) p else "$." + p
          if (graft.functions.JsonPathLite.needsLite(path))
            graft.functions.JsonPathLite.evalUdf(a(0).cast(StringType), lit(path))
          else get_json_object(a(0), path)
        }
        coalesce((1 until args.size).map(one): _*)
      case "json:stringify"   => to_json(a(0))
      case "json:arraylength" => json_array_length(a(0))
      case "json:isvalid"     => try_parse_json_ok(a(0))
      case "json:parse"       => a(0) // parsed lazily by downstream json fns
      case "json:isarray"     =>
        try_parse_json_ok(a(0)) && ltrim(a(0).cast(StringType)).startsWith("[")
      case "json:isobject"    =>
        try_parse_json_ok(a(0)) && ltrim(a(0).cast(StringType)).startsWith("{")
      case "json:isnull"      =>
        a(0).isNull || trim(a(0).cast(StringType)) === "null"
      case "json:keys"        => json_object_keys(a(0))

      // ---- arithmetic:/decimal: null-safe arithmetic ----
      case "arithmetic:add" | "decimal:add"           => a(0) + a(1)
      case "arithmetic:minus" | "decimal:subtract"    => a(0) - a(1)
      case "arithmetic:multiply" | "decimal:multiply" => a(0) * a(1)
      case "arithmetic:divideq" | "decimal:divide"    => a(0) / a(1)
      case "arithmetic:divider"                       => a(0) % a(1)
      case "arithmetic:equal"                         => a(0) === a(1)
      case "arithmetic:max"                           => greatest(args: _*)
      case "arithmetic:min"                           => least(args: _*)
      case "decimal:precision" => length(regexp_replace(a(0).cast(StringType), "[-.]", ""))
      case "decimal:scale" =>
        length(substring_index(a(0).cast(StringType), ".", -1)) *
          when(a(0).cast(StringType).contains("."), 1).otherwise(0)
      case "decimal:unscaled" =>
        regexp_replace(a(0).cast(StringType), "[.]", "").cast(LongType)
      case "decimal:decimal_add"                      => a(0) + a(1)

      // ---- bytes: ----
      case "bytes:tostring"     => a(0).cast(StringType)
      case "bytes:tostringutf8" => decode(a(0), "UTF-8")
      case "bytes:toint" | "bytes:tolong" => a(0).cast(LongType)
      case "bytes:tohexstring"  => lower(hex(a(0)))

      // ---- arrays: ----
      case "arrays:length" => array_size(a(0))
      case "arrays:join"   =>
        array_join(a(0), if (argEs.size > 1) litStr(1) else ",")

      // ---- escape: (reference: commons StringEscapeUtils via EL.java:141-158) ----
      case "escape:escapehtml" | "escape:escapehtml4" =>
        translateSeq(a(0), Seq("&" -> "&amp;", "<" -> "&lt;", ">" -> "&gt;",
          "\"" -> "&quot;"))
      case "escape:unescapehtml" | "escape:unescapehtml4" =>
        translateSeq(a(0), Seq("&amp;" -> "&", "&lt;" -> "<", "&gt;" -> ">",
          "&quot;" -> "\"", "&#39;" -> "'"))
      case "escape:escapexml" | "escape:escapexml11" =>
        translateSeq(a(0), Seq("&" -> "&amp;", "<" -> "&lt;", ">" -> "&gt;",
          "\"" -> "&quot;", "'" -> "&apos;"))
      case "escape:unescapexml" =>
        translateSeq(a(0), Seq("&amp;" -> "&", "&lt;" -> "<", "&gt;" -> ">",
          "&quot;" -> "\"", "&apos;" -> "'"))
      case "escape:escapejson" =>
        translateSeq(a(0), Seq("\\" -> "\\\\", "\"" -> "\\\"", "\n" -> "\\n",
          "\r" -> "\\r", "\t" -> "\\t"))
      case "escape:unescapejson" =>
        translateSeq(a(0), Seq("\\\"" -> "\"", "\\n" -> "\n", "\\r" -> "\r",
          "\\t" -> "\t", "\\\\" -> "\\"))
      case "escape:escapecsv" =>
        when(a(0).contains(",") || a(0).contains("\"") || a(0).contains("\n"),
          concat(lit("\""), regexp_replace(a(0), "\"", "\"\""), lit("\"")))
          .otherwise(a(0))

      // ---- geo: point-in-polygon (reference: io.cdap.functions.GeoFences) ----
      case "geo:infence" => graft.functions.Geo.inFenceUdf(
        a(0).cast(DoubleType), a(1).cast(DoubleType), a(2))

      // ---- ddl: schema ops (reference: io.cdap.functions.DDL) ----
      // schemas are recipe literals; evaluated at compile time on the
      // driver, exactly like the reference's driver-side DDL helpers
      case "ddl:parse" =>
        lit(StructType.fromDDL(litStr(0)).json)
      case "ddl:hasfield" =>
        lit(StructType.fromDDL(litStr(0)).fieldNames.exists(_.equalsIgnoreCase(litStr(1))))
      case "ddl:select" =>
        val keep = litStr(1).split(",").map(_.trim.toLowerCase).toSet
        lit(StructType(StructType.fromDDL(litStr(0))
          .fields.filter(f => keep(f.name.toLowerCase))).toDDL)
      case "ddl:drop" =>
        val rm = litStr(1).split(",").map(_.trim.toLowerCase).toSet
        lit(StructType(StructType.fromDDL(litStr(0))
          .fields.filterNot(f => rm(f.name.toLowerCase))).toDDL)
      case "ddl:tojson" =>
        lit(StructType.fromDDL(litStr(0)).json)

      // ---- types: (reference: functions/Types.java) ----
      case "types:isinteger" => try_to_number_ok(a(0), LongType)
      case "types:isdouble"  => try_to_number_ok(a(0), DoubleType)
      case "types:isnumber"  => try_to_number_ok(a(0), DoubleType)
      case "types:isboolean" => lower(a(0)).isin("true", "false")
      case "types:isempty"   => a(0).isNull || length(a(0)) === 0
      case "types:isdate"    => try_cast_ok(a(0), DateType)

      case other => unknown(other)
    }
  }

  // -- helpers ---------------------------------------------------------

  /** Sequential literal replacements (escape tables). */
  private def translateSeq(c: Column, pairs: Seq[(String, String)]): Column =
    pairs.foldLeft(c) { case (acc, (from, to)) =>
      regexp_replace(acc, java.util.regex.Pattern.quote(from),
        java.util.regex.Matcher.quoteReplacement(to))
    }

  private def try_cast_ok(c: Column, t: DataType): Column =
    c.try_cast(t).isNotNull

  private def try_to_number_ok(c: Column, t: DataType): Column =
    c.try_cast(t).isNotNull

  private def try_parse_json_ok(c: Column): Column =
    try_parse_json(c).isNotNull

  // ---- string: namespace -------------------------------------------
  private def stringNs(fn: String, args: List[Column]): Column = {
    def a(i: Int) = args(i)
    fn.toLowerCase match {
      case "uppercase" | "upper"   => upper(a(0))
      case "lowercase" | "lower"   => lower(a(0))
      case "capitalize"            => initcap(a(0))
      case "swapcase" =>
        // no native; approximate via translate of ASCII cases
        translate(a(0),
          "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ",
          "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz")
      case "trim"                  => trim(a(0))
      case "strip"                 => trim(a(0))
      case "isblank"               => a(0).isNull || length(trim(a(0))) === 0
      case "isempty"               => a(0).isNull || length(a(0)) === 0
      case "isnotblank"            => a(0).isNotNull && length(trim(a(0))) > 0
      case "isalpha"               => regexp_like(a(0), lit("^[A-Za-z]+$"))
      case "isnumeric"             => regexp_like(a(0), lit("^[0-9]+$"))
      case "isalphanumeric"        => regexp_like(a(0), lit("^[A-Za-z0-9]+$"))
      case "length"                => length(a(0))
      case "reverse"               => reverse(a(0))
      case "contains"              => a(0).contains(a(1))
      case "containsignorecase"    => lower(a(0)).contains(lower(a(1)))
      case "startswith"            => a(0).startsWith(a(1))
      case "endswith"              => a(0).endsWith(a(1))
      case "indexof"               => instr(a(0), a(1)) - lit(1)
      case "lastindexof"           =>
        when(instr(a(0), a(1)) === 0, lit(-1)).otherwise(
          length(a(0)) - instr(reverse(a(0)), reverse(a(1))) -
            length(a(1)) + lit(1))
      case "removeend"             =>
        when(a(0).endsWith(a(1)),
          a(0).substr(lit(1), length(a(0)) - length(a(1)))).otherwise(a(0))
      case "removestart"           =>
        when(a(0).startsWith(a(1)), a(0).substr(length(a(1)) + 1, length(a(0))))
          .otherwise(a(0))
      case "abbreviate"            =>
        when(length(a(0)) <= a(1), a(0))
          .otherwise(concat(a(0).substr(lit(1), a(1).cast(IntegerType) - 3), lit("...")))
      case "center"                => a(0) // no-op approximation
      case "leftpad"               => lpad(a(0), a(1).cast(IntegerType), lit(" "))
      case "rightpad"              => rpad(a(0), a(1).cast(IntegerType), lit(" "))
      case "join"                  => concat_ws("", args: _*)
      case "chop"                  => a(0).substr(lit(1), length(a(0)) - 1)
      case "defaultifempty"        =>
        when(a(0).isNull || length(a(0)) === 0, a(1)).otherwise(a(0))
      case "substringbefore"       =>
        when(a(0).contains(a(1)),
          a(0).substr(lit(1), instr(a(0), a(1)) - 1)).otherwise(a(0))
      case "substringafter"        =>
        when(a(0).contains(a(1)),
          a(0).substr(instr(a(0), a(1)) + length(a(1)), length(a(0))))
          .otherwise(lit(""))
      case "countmatches"          =>
        ((length(a(0)) - length(replace(a(0), a(1), lit("")))) / length(a(1)))
          .cast(IntegerType)
      case "repeat"                => repeat(a(0), a(1).cast(IntegerType))
      case "deletewhitespace"      => regexp_replace(a(0), "\\s+", "")
      case "normalizespace"        => trim(regexp_replace(a(0), "\\s+", " "))
      case other =>
        unknown(s"string:$other")
    }
  }

  // ---- dq: namespace -----------------------------------------------
  // Regex classifiers match the reference's semantics
  // (reference: wrangler-core functions/DataQuality.java).
  private def dqNs(fn: String, args: List[Column]): Column = {
    def a(i: Int) = args(i)
    fn.toLowerCase match {
      case "isnumber"  => a(0).try_cast(DoubleType).isNotNull
      case "isinteger" => a(0).try_cast(LongType).isNotNull
      case "isempty"   => a(0).isNull || length(a(0)) === 0
      case "isnull"    => a(0).isNull
      case "isnotnull" => a(0).isNotNull
      case "strlen"    => length(a(0))
      case "inrange"   => a(0) >= a(1) && a(0) <= a(2)
      case "isdate"    => a(0).try_cast(DateType).isNotNull
      case "istime"    => regexp_like(a(0), lit("^\\d{1,2}:\\d{2}(:\\d{2})?$"))
      case "isip" =>
        dqNs("isipv4", args) || dqNs("isipv6", args)
      case "isipv4" =>
        regexp_like(a(0), lit("^((25[0-5]|2[0-4]\\d|[01]?\\d?\\d)\\.){3}(25[0-5]|2[0-4]\\d|[01]?\\d?\\d)$"))
      case "isipv6" =>
        regexp_like(a(0), lit("^([0-9a-fA-F]{1,4}:){7}[0-9a-fA-F]{1,4}$"))
      case "isemail" =>
        regexp_like(a(0), lit("^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}$"))
      case "isurl" =>
        regexp_like(a(0), lit("^(https?|ftp)://[^\\s/$.?#].[^\\s]*$"))
      case "isdomainname" =>
        regexp_like(a(0), lit("^([A-Za-z0-9-]+\\.)+[A-Za-z]{2,}$"))
      case "isdomaintld" =>
        regexp_like(a(0), lit("^[A-Za-z]{2,}$"))
      case "iscreditcard" =>
        regexp_like(regexp_replace(a(0), "[ -]", ""), lit("^\\d{13,19}$"))
      case "isvisa"   => regexp_like(regexp_replace(a(0), "[ -]", ""), lit("^4\\d{12}(\\d{3})?$"))
      case "ismaster" => regexp_like(regexp_replace(a(0), "[ -]", ""), lit("^5[1-5]\\d{14}$"))
      case "isamex"   => regexp_like(regexp_replace(a(0), "[ -]", ""), lit("^3[47]\\d{13}$"))
      case "isisbn" =>
        regexp_like(regexp_replace(a(0), "[- ]", ""), lit("^(\\d{9}[\\dXx]|\\d{13})$"))
      case "isisbn10" =>
        regexp_like(regexp_replace(a(0), "[- ]", ""), lit("^\\d{9}[\\dXx]$"))
      case "isisbn13" =>
        regexp_like(regexp_replace(a(0), "[- ]", ""), lit("^\\d{13}$"))
      case "isphone" =>
        regexp_like(a(0), lit("^\\+?[0-9. ()-]{7,15}$"))
      case "iszipcode" =>
        regexp_like(a(0), lit("^\\d{5}(-\\d{4})?$"))
      case other => unknown(s"dq:$other")
    }
  }

  // ---- date:/datetime: namespace -----------------------------------
  // Reference: io.cdap.functions.{Dates, DateAndTime} — mapped to native
  // Catalyst datetime functions.
  private def dateNs(fn: String, args: List[Column]): Column = {
    def a(i: Int) = args(i)
    fn.toLowerCase match {
      case "year"                  => year(a(0))
      case "month"                 => month(a(0))
      case "day" | "dayofmonth" | "daysfrommonth" => dayofmonth(a(0))
      case "day_of_week" | "dayofweek" | "weekdayfromdate" => dayofweek(a(0))
      case "day_of_year" | "dayofyear" | "yeardayfromdate" => dayofyear(a(0))
      case "hour" | "hoursfromtime"     => hour(a(0))
      case "minute" | "minutesfromtime" => minute(a(0))
      case "second" | "secondsfromtime" => second(a(0))
      case "week" | "weekofyear"   => weekofyear(a(0))
      case "quarter"               => quarter(a(0))
      case "currentdate"           => current_date()
      case "currenttime" | "currenttimems" | "now" => current_timestamp()
      case "currenttimestamp"      => current_timestamp()
      case "days_between" | "daysbetween" | "datediff" => datediff(a(0), a(1))
      case "months_between" | "monthsbetween" => months_between(a(0), a(1))
      case "datefromdayssince"     => date_add(a(1), a(0).cast(IntegerType))
      case "dateoffsetbycomponents" =>
        add_months(date_add(a(0), a(3).cast(IntegerType)), a(2).cast(IntegerType) + a(1).cast(IntegerType) * 12)
      case "dayssincefromdate"     => datediff(a(1), a(0))
      case "monthsfromdate"        => month(a(0))
      case "yearfromdate"          => year(a(0))
      case "epochfromtimestamp" | "unixtimestamp_seconds" => unix_timestamp(a(0))
      case "unixtimestamp_millis"  => unix_millis(a(0).cast(TimestampType))
      case "seconds_to_days"       => (a(0) / lit(86400)).cast(LongType)
      case "seconds_to_hours"      => (a(0) / lit(3600)).cast(LongType)
      case "seconds_to_minutes"    => (a(0) / lit(60)).cast(LongType)
      case "seconds_to_weeks"      => (a(0) / lit(604800)).cast(LongType)
      case "month_short" | "monthshort" => date_format(a(0), "MMM")
      case "month_long" | "monthlong"   => date_format(a(0), "MMMM")
      case "datefromcomponents"    => make_date(a(0), a(1), a(2))
      case "timestampfromcomponents" =>
        make_timestamp(a(0), a(1), a(2), a(3), a(4), a(5))
      case "lastdayofmonth"        => last_day(a(0))
      case "nextweekdayfromdate"   =>
        if (args.size >= 2) next_day(a(0), a(1)) else next_day(a(0), "monday")
      case "datefromjulianday" =>
        // Julian day number → date: JDN 2440588 = 1970-01-01
        date_add(to_date(lit("1970-01-01")), (a(0) - lit(2440588)).cast(IntegerType))
      case "juliandayfromdate" =>
        (datediff(a(0), to_date(lit("1970-01-01"))) + lit(2440588)).cast(LongType)
      case "isdate"                => a(0).try_cast(DateType).isNotNull
      case "istime"                => a(0).try_cast(TimestampType).isNotNull
      // remaining DateAndTime surface (reference: io.cdap.functions.DateAndTime)
      case "yearweekfromdate"      =>
        year(a(0)) * lit(100) + weekofyear(a(0))
      case "yeardayfromdate2" | "yearday" =>
        year(a(0)) * lit(1000) + dayofyear(a(0))
      case "timefromcomponents"    =>
        make_timestamp(lit(1970), lit(1), lit(1), a(0), a(1), a(2))
      case "datefromcomponents2"   => make_date(a(0), a(1), a(2))
      case "secondssincefromtimestamp" | "secondssince" =>
        unix_timestamp(a(1)) - unix_timestamp(a(0))
      case "timestampfromdatetime" => to_timestamp(a(0))
      case "timestampfromepoch"    => timestamp_seconds(a(0))
      case "datefromtimestamp" | "datefrom" => to_date(a(0))
      case "timestampfromtime2"    => a(0).cast(TimestampType)
      case "previousweekdayfromdate" =>
        // most recent such weekday strictly before the source date:
        // next_day(d-1, w) lands on d when d is already w, so -7 stays strict
        val wd = if (args.size >= 2) a(1) else lit("monday")
        date_sub(next_day(date_sub(a(0), 1), wd), 7)
      case "midnightsecondsfromtime" =>
        hour(a(0)) * lit(3600) + minute(a(0)) * lit(60) + second(a(0))
      case "hoursfromtimestamp"    => hour(a(0))
      case "minutesfromtimestamp"  => minute(a(0))
      case "secondsfromtimestamp"  => second(a(0))
      case "weekofyearfromdate"    => weekofyear(a(0))
      case "quarterfromdate"       => quarter(a(0))
      case "addmonthstodate" | "addmonths" => add_months(a(0), a(1).cast(IntegerType))
      case "adddaystodate" | "adddays" => date_add(a(0), a(1).cast(IntegerType))
      case other => unknown(s"date:$other")
    }
  }

  /** Supported-function inventory per namespace — drives the precise
    * unknown-function error below (the reference registers whole Java
    * classes per namespace, EL.java:141-158; here the surface is
    * enumerated so a typo fails with the actual menu).
    */
  val supported: Map[String, Seq[String]] = {
    val string = Seq("abbreviate", "capitalize", "center", "chop", "contains",
      "containsignorecase", "countmatches", "defaultifempty",
      "deletewhitespace", "endswith", "indexof", "isalpha", "isalphanumeric",
      "isblank", "isempty", "isnotblank", "isnumeric", "join", "lastindexof",
      "leftpad", "length", "lower", "lowercase", "normalizespace",
      "removeend", "removestart", "repeat", "reverse", "rightpad",
      "startswith", "strip", "substringafter", "substringbefore", "swapcase",
      "trim", "upper", "uppercase")
    val date = Seq("adddays", "adddaystodate", "addmonths", "addmonthstodate",
      "currentdate", "currenttime", "currenttimems", "currenttimestamp",
      "datediff", "datefrom", "datefromcomponents", "datefromcomponents2",
      "datefromdayssince", "datefromjulianday", "datefromtimestamp",
      "dateoffsetbycomponents", "day", "day_of_week", "day_of_year",
      "dayofmonth", "dayofweek", "dayofyear", "days_between", "daysbetween",
      "daysfrommonth", "dayssincefromdate", "epochfromtimestamp", "hour",
      "hoursfromtime", "hoursfromtimestamp", "isdate", "istime",
      "juliandayfromdate", "lastdayofmonth", "midnightsecondsfromtime",
      "minute", "minutesfromtime", "minutesfromtimestamp", "month",
      "month_long", "month_short", "monthlong", "months_between",
      "monthsbetween", "monthsfromdate", "monthshort", "nextweekdayfromdate",
      "now", "previousweekdayfromdate", "quarter", "quarterfromdate",
      "second", "seconds_to_days", "seconds_to_hours", "seconds_to_minutes",
      "seconds_to_weeks", "secondsfromtime", "secondsfromtimestamp",
      "secondssince", "secondssincefromtimestamp", "timefromcomponents",
      "timestampfromcomponents", "timestampfromdatetime",
      "timestampfromepoch", "timestampfromtime2", "unixtimestamp_millis",
      "unixtimestamp_seconds", "week", "weekdayfromdate", "weekofyear",
      "weekofyearfromdate", "year", "yearday", "yeardayfromdate",
      "yeardayfromdate2", "yearfromdate", "yearweekfromdate")
    Map(
      "" -> Seq("charat", "coalesce", "concat", "contains", "endswith",
        "equalsignorecase", "format", "getfield", "indexof", "isnotnull",
        "isnull", "length", "lower", "lowercase", "ltrim", "nulltoempty",
        "nulltovalue", "nulltozero", "padatend", "padatstart", "repeat",
        "replace", "reverse", "rtrim", "split", "startswith", "strlen",
        "substring", "titlecase", "tobytes", "todouble", "tofloat",
        "tointeger", "tolong", "tostring", "trim", "unquote", "upper",
        "uppercase"),
      "string" -> string, "strings" -> string,
      "dq" -> Seq("inrange", "isamex", "iscreditcard", "isdate",
        "isdomainname", "isdomaintld", "isemail", "isempty", "isinteger",
        "isip", "isipv4", "isipv6", "isisbn", "isisbn10", "isisbn13",
        "ismaster", "isnotnull", "isnull", "isnumber", "isphone", "istime",
        "isurl", "isvisa", "iszipcode", "strlen"),
      "date" -> date, "datetime" -> date,
      "math" -> Seq("abs", "cbrt", "ceil", "cos", "exp", "floor", "floordiv",
        "hypot", "log", "log10", "log2", "max", "min", "pow", "random",
        "rint", "round", "signum", "sin", "sqrt", "tan", "todegrees",
        "toradians"),
      "number" -> Seq("asdouble", "asfloat", "asinteger", "mantissa"),
      "logical" -> Seq("bitand", "bitor", "bitxor", "not", "setbit"),
      "json" -> Seq("arraylength", "isarray", "isnull", "isobject",
        "isvalid", "keys", "parse", "select", "stringify"),
      "arithmetic" -> Seq("add", "divideq", "divider", "equal", "max",
        "min", "minus", "multiply"),
      "decimal" -> Seq("add", "decimal_add", "divide", "multiply",
        "precision", "scale", "subtract", "unscaled"),
      "bytes" -> Seq("tohexstring", "toint", "tolong", "tostring",
        "tostringutf8"),
      "arrays" -> Seq("join", "length"),
      "escape" -> Seq("escapecsv", "escapehtml", "escapehtml4",
        "escapejson", "escapexml", "escapexml11", "unescapehtml",
        "unescapehtml4", "unescapejson", "unescapexml"),
      "geo" -> Seq("infence"),
      "ddl" -> Seq("drop", "hasfield", "parse", "select", "tojson"),
      "types" -> Seq("isboolean", "isdate", "isdouble", "isempty",
        "isinteger", "isnumber"))
  }

  /** Fail-fast with the menu for the namespace (or the namespace list). */
  private def unknown(key: String): Nothing = {
    val ns = if (key.contains(':')) key.takeWhile(_ != ':') else ""
    val msg = supported.get(ns) match {
      case Some(fns) =>
        val label = if (ns.isEmpty) "the global namespace" else s"$ns:"
        s"unknown function '$key' — $label supports: ${fns.mkString(", ")}"
      case None =>
        s"unknown function '$key' — unknown namespace '$ns:'; namespaces: " +
          supported.keys.filter(_.nonEmpty).toSeq.sorted.mkString(", ")
    }
    throw new RecipeException(msg)
  }
}
