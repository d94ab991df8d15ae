package graft.ops

import graft.api._
import graft.functions.Udfs
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Date / datetime / timestamp / currency directives (SURVEY §2.6 + the
  * date-ish parsers of §2.1). All native Catalyst datetime functions.
  */
object DateOps {

  /** Java SimpleDateFormat → JDK DateTimeFormatter dialect translation
    * for the symbols Spark's formatter treats differently.
    */
  def translatePattern(sdf: String): String =
    // SimpleDateFormat 'u'(day-of-week-number) and DateTimeFormatter
    // differences are rare in recipes; translate the common clash: SDF
    // uses unquoted 'T' freely, and 'YYYY' (week-year) almost always
    // means 'yyyy' in user recipes.
    sdf.replace("YYYY", "yyyy").replace("DD", "dd")

  /** Common formats tried by the natural-ish date parser (stands in for
    * the reference's Natty natural-language parse —
    * reference: wrangler-core directives/parser/ParseDate.java:91).
    */
  private val CommonFormats = Seq(
    "yyyy-MM-dd'T'HH:mm:ss", "yyyy-MM-dd HH:mm:ss", "yyyy-MM-dd",
    "MM/dd/yyyy HH:mm:ss", "MM/dd/yyyy", "dd/MM/yyyy", "yyyy/MM/dd",
    "MMM d, yyyy", "MMMM d, yyyy", "dd-MMM-yyyy", "yyyyMMdd",
    "MMMM d yyyy", "MMM d yyyy", "d MMMM yyyy", "d MMM yyyy")

  /** Permissive shape regex for a datetime pattern — the cheap guard
    * that lets parse-as-date SKIP a format without the cost of a
    * thrown-and-caught parse exception per row per format (the
    * dominant cost of a 15-format coalesce chain, measured ~3× the
    * whole query). Digit counts are permissive (\d{1,n}) so
    * try_to_timestamp still arbitrates anything ambiguous — the guard
    * only rejects separator/token-kind mismatches, never decides a
    * parse.
    */
  private[ops] def shapeRegex(fmt: String): String = {
    val sb = new StringBuilder("^\\s*")
    var i = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '\'') {
        val close = fmt.indexOf('\'', i + 1)
        val lit = fmt.substring(i + 1, if (close < 0) fmt.length else close)
        if (lit.isEmpty) sb.append("'") // '' = literal quote
        else sb.append(java.util.regex.Pattern.quote(lit))
        i = if (close < 0) fmt.length else close + 1
      } else if (c.isLetter) {
        var j = i
        while (j < fmt.length && fmt.charAt(j) == c) j += 1
        val run = j - i
        c match {
          case 'y' => sb.append("\\d{1,4}")
          case 'M' =>
            sb.append(if (run >= 4) "[A-Za-z]+"
            else if (run == 3) "[A-Za-z]{3}" else "\\d{1,2}")
          case 'd' | 'H' | 'h' | 'm' | 's' => sb.append("\\d{1,2}")
          case _ => sb.append("\\S+") // unmodeled token: permissive
        }
        i = j
      } else {
        if ("\\^$.|?*+()[]{}".indexOf(c.toInt) >= 0) sb.append('\\')
        sb.append(c)
        i += 1
      }
    }
    sb.append("\\s*$").toString
  }

  def build(spec: DirectiveSpec): Option[PipeOp] = Option(spec.name match {

    // (reference: wrangler-core directives/parser/ParseSimpleDate.java:80)
    case "parse-as-simple-date" => ColumnOps.simple(spec) { df =>
      val c = spec.col(0)
      df.withColumn(c,
        to_timestamp(col(c).cast(StringType), translatePattern(spec.str(1))))
    }

    // best-effort multi-format parse + natural-language relative phrases
    // ("yesterday", "3 days ago", "next tuesday" — the Natty subset,
    // reference: ParseDate.java:91). Relative phrases resolve against a
    // deterministic anchor date: prop:{anchor=yyyy-MM-dd} (or a bare
    // yyyy-MM-dd argument), defaulting to the current UTC date.
    case "parse-as-date" => ColumnOps.simple(spec) { df =>
      val c = spec.col(0)
      val anchor = spec.tokens.collectFirst {
        case TProps(p) if p.contains("anchor") => p("anchor")
      }.orElse(spec.optStr(1).filter(_.matches("\\d{4}-\\d{2}-\\d{2}")))
        .getOrElse(java.time.LocalDate.now(java.time.ZoneOffset.UTC).toString)
      val s = col(c).cast(StringType)
      val candidates = CommonFormats.map(f =>
        when(s.rlike(shapeRegex(f)), try_to_timestamp(s, lit(f)))) :+
        NlDate.parseUdf(s, lit(anchor))
      df.withColumn(c, coalesce(candidates: _*))
    }

    // LocalDateTime (no zone) (reference: ParseDateTime.java:77)
    case "parse-as-datetime" => ColumnOps.simple(spec) { df =>
      val c = spec.col(0)
      df.withColumn(c,
        to_timestamp_ntz(col(c).cast(StringType), lit(translatePattern(spec.str(1)))))
    }

    // numeric epoch s/ms/µs (reference: wrangler-core
    // directives/parser/ParseTimestamp.java:56-57)
    case "parse-timestamp" => ColumnOps.simple(spec) { df =>
      val c = spec.col(0)
      val src = col(c).cast(LongType)
      val out = spec.optStr(1).getOrElse("milliseconds").toLowerCase match {
        case "seconds"      => timestamp_seconds(src)
        case "milliseconds" => timestamp_millis(src)
        case "microseconds" => timestamp_micros(src)
        case other => throw new RecipeException(s"parse-timestamp: unit $other")
      }
      df.withColumn(c, out)
    }

    // (reference: wrangler-core directives/date/FormatDate.java:78)
    case "format-date" => ColumnOps.simple(spec) { df =>
      val c = spec.col(0)
      df.withColumn(c, date_format(col(c), translatePattern(spec.str(1))))
    }

    // difference in MILLISECONDS; literal column name `now` = current time
    // (reference: wrangler-core directives/date/DiffDate.java:47,92-95)
    case "diff-date" => ColumnOps.simple(spec) { df =>
      def operand(n: String) =
        if (n.equalsIgnoreCase("now")) current_timestamp() else col(n)
      df.withColumn(spec.col(2),
        unix_millis(operand(spec.col(0)).cast(TimestampType)) -
          unix_millis(operand(spec.col(1)).cast(TimestampType)))
    }

    // orphaned-but-documented v1 op (reference: wrangler-core
    // parser/MigrateToV2.java:299-303 — no v2 class; implemented here)
    case "format-unix-timestamp" => ColumnOps.simple(spec) { df =>
      val c = spec.col(0)
      df.withColumn(c,
        from_unixtime(col(c).cast(LongType), translatePattern(spec.str(1))))
    }

    // (reference: wrangler-core directives/datetime/CurrentDateTime.java:82)
    case "current-datetime" => ColumnOps.simple(spec) { df =>
      val zone = spec.optStr(1).getOrElse("UTC")
      df.withColumn(spec.col(0),
        convert_timezone(lit("UTC"), lit(zone), current_timestamp()))
    }

    // LocalDateTime + zone → instant (reference: DateTimeToTimeStamp.java:82)
    case "datetime-to-timestamp" => ColumnOps.simple(spec) { df =>
      val c = spec.col(0)
      val zone = spec.optStr(1).getOrElse("UTC")
      df.withColumn(c, to_utc_timestamp(col(c), zone))
    }

    // (reference: wrangler-core directives/datetime/FormatDateTime.java:77)
    case "format-datetime" => ColumnOps.simple(spec) { df =>
      val c = spec.col(0)
      df.withColumn(c, date_format(col(c), translatePattern(spec.str(1))))
    }

    // instant → LocalDateTime in zone (reference: TimestampToDateTime.java:63)
    case "timestamp-to-datetime" => ColumnOps.simple(spec) { df =>
      val c = spec.col(0)
      val zone = spec.optStr(1).getOrElse("UTC")
      df.withColumn(c, from_utc_timestamp(col(c), zone))
    }

    // locale-aware currency string → double (reference: wrangler-core
    // directives/currency/ParseAsCurrency.java:92)
    case "parse-as-currency" => ColumnOps.simple(spec) { df =>
      df.withColumn(spec.col(1),
        Udfs.parseCurrencyUdf(col(spec.col(0)).cast(StringType),
          lit(spec.optStr(2).getOrElse("en-US"))))
    }

    // (reference: wrangler-core directives/currency/FormatAsCurrency.java:88)
    case "format-as-currency" => ColumnOps.simple(spec) { df =>
      df.withColumn(spec.col(1),
        Udfs.formatCurrencyUdf(col(spec.col(0)).cast(DoubleType),
          lit(spec.optStr(2).getOrElse("en-US"))))
    }

    case _ => null
  })
}

/** Deterministic natural-language date subset (the phrases the
  * reference handles via Natty — ParseDate.java:91): relative day
  * words, "N <unit>s ago" / "in N <unit>s" / "N <unit>s from now",
  * compositional "N <unit>s before|after <phrase>" (the tail re-parses
  * recursively: "3 days before yesterday", "a week after next monday"),
  * "next/last <weekday>|week|month|year", bare weekdays ("friday" =
  * next occurrence counting today), "beginning|start|end of [the]
  * month|year", "first|last day of <month> [year]", weekday-of-month
  * ("third thursday of june [2024]", "last friday in december"), and
  * month-name-only ("june", "march 2025" — unspecified fields keep the
  * anchor's value, Natty-style: day = anchor's day clamped to the
  * month's length), and date+time-of-day composites ("tomorrow 3pm",
  * "monday at 14:30", "3pm tomorrow", bare "noon" — Natty returns a
  * full timestamp, so a clock time resolves the phrase to that time of
  * day instead of midnight). Resolves against an explicit anchor date
  * so results are reproducible and testable.
  */
object NlDate {
  import java.time.LocalDate

  private val weekdays: Map[String, java.time.DayOfWeek] =
    java.time.DayOfWeek.values().flatMap { d =>
      val full = d.name.toLowerCase
      Seq(full -> d, full.take(3) -> d)
    }.toMap

  private val months: Map[String, Int] = (1 to 12).flatMap { m =>
    val full = java.time.Month.of(m).name.toLowerCase
    Seq(full -> m, full.take(3) -> m)
  }.toMap

  private val ordinals = Map(
    "first" -> 1, "1st" -> 1, "second" -> 2, "2nd" -> 2, "third" -> 3,
    "3rd" -> 3, "fourth" -> 4, "4th" -> 4, "fifth" -> 5, "5th" -> 5)

  private val numberWords = Map(
    "a" -> 1L, "an" -> 1L, "one" -> 1L, "two" -> 2L, "three" -> 3L,
    "four" -> 4L, "five" -> 5L, "six" -> 6L, "seven" -> 7L, "eight" -> 8L,
    "nine" -> 9L, "ten" -> 10L)

  private def num(s: String): Option[Long] =
    numberWords.get(s).orElse(
      if (s.forall(_.isDigit) && s.nonEmpty)
        // best-effort contract: a 20+ digit token must yield null, not
        // a NumberFormatException; |n| is bounded so LocalDate.plus*
        // can't overflow into DateTimeException either
        s.toLongOption.filter(v => v >= 0 && v <= 1000000L)
      else None)

  private def shift(anchor: LocalDate, n: Long, unit: String): Option[LocalDate] =
    scala.util.Try(unit match {
      case "day"   => Some(anchor.plusDays(n))
      case "week"  => Some(anchor.plusWeeks(n))
      case "month" => Some(anchor.plusMonths(n))
      case "year"  => Some(anchor.plusYears(n))
      case _       => None
    }).toOption.flatten

  private val Ago     = "^(\\S+) (day|week|month|year)s? ago$".r
  private val In      = "^in (\\S+) (day|week|month|year)s?$".r
  private val FromNow = "^(\\S+) (day|week|month|year)s? from (?:now|today)$".r
  // compositional: "3 days before yesterday", "2 weeks after next monday"
  private val BeforeAfter =
    "^(\\S+) (day|week|month|year)s? (before|after) (.+)$".r
  private val BeginEnd =
    "^(beginning|start|end) of (?:the )?(month|year)$".r
  private val DayOfMonth = "^(first|last) day of (\\S+?)(?: (\\d{4}))?$".r
  private val Next    = "^next (\\S+)$".r
  private val Last    = "^last (\\S+)$".r
  private val WdOfMonth = "^(\\S+) (\\S+) (?:of|in) (\\S+?)(?: (\\d{4}))?$".r
  private val MonthOnly = "^(\\S+?)(?: (\\d{4}))?$".r

  def parse(raw: String, anchor: LocalDate): LocalDate =
    parse(raw, anchor, depth = 0)

  // best-effort contract: adversarial nesting ("1 day after 1 day
  // after ... today") must yield null, not a StackOverflowError — the
  // compositional BeforeAfter case recurses at most maxNesting deep
  private val maxNesting = 16

  private def parse(raw: String, anchor: LocalDate, depth: Int): LocalDate = {
    if (raw == null || depth > maxNesting) return null
    val s = raw.trim.toLowerCase.replaceAll("\\s+", " ")
    val r: Option[LocalDate] = s match {
      case "now" | "today"        => Some(anchor)
      case "yesterday"            => Some(anchor.minusDays(1))
      case "tomorrow"             => Some(anchor.plusDays(1))
      case "day before yesterday" => Some(anchor.minusDays(2))
      case "day after tomorrow"   => Some(anchor.plusDays(2))
      case Ago(n, u)     => num(n).flatMap(v => shift(anchor, -v, u))
      case In(n, u)      => num(n).flatMap(v => shift(anchor, v, u))
      case FromNow(n, u) => num(n).flatMap(v => shift(anchor, v, u))
      // shift relative to another PHRASE — the tail re-parses with the
      // same anchor ("3 days before yesterday", "a week after next monday")
      case BeforeAfter(n, u, dir, rest) =>
        Option(parse(rest, anchor, depth + 1)).flatMap(base =>
          num(n).flatMap(v =>
            shift(base, if (dir == "before") -v else v, u)))
      case BeginEnd(which, unit) => Some((which, unit) match {
        case ("end", "month") => anchor.withDayOfMonth(anchor.lengthOfMonth)
        case (_, "month")     => anchor.withDayOfMonth(1)
        case ("end", "year")  => LocalDate.of(anchor.getYear, 12, 31)
        case (_, "year")      => LocalDate.of(anchor.getYear, 1, 1)
      })
      case DayOfMonth(which, mon, yr) if months.contains(mon) =>
        scala.util.Try {
          val y = Option(yr).map(_.toInt).getOrElse(anchor.getYear)
          val ym = java.time.YearMonth.of(y, months(mon))
          if (which == "last") ym.atEndOfMonth else ym.atDay(1)
        }.toOption
      case Next(w) => weekdays.get(w) match {
        // strictly after the anchor, like Natty's "next <weekday>"
        case Some(d) => Some(anchor.`with`(
          java.time.temporal.TemporalAdjusters.next(d)))
        case None => shift(anchor, 1, w)
      }
      // "third thursday of june [2024]" / "last friday in december" —
      // checked before Last so "last friday in december" isn't eaten
      case WdOfMonth(ord, wd, mon, yr)
          if (ordinals.contains(ord) || ord == "last") &&
            weekdays.contains(wd) && months.contains(mon) =>
        val y = Option(yr).map(_.toInt).getOrElse(anchor.getYear)
        val adj =
          if (ord == "last")
            java.time.temporal.TemporalAdjusters.lastInMonth(weekdays(wd))
          else java.time.temporal.TemporalAdjusters
            .dayOfWeekInMonth(ordinals(ord), weekdays(wd))
        // dayOfWeekInMonth(5, …) rolls into the next month when the
        // occurrence doesn't exist — that's a non-date, not a date
        scala.util.Try(LocalDate.of(y, months(mon), 1).`with`(adj))
          .toOption.filter(_.getMonthValue == months(mon))
      case Last(w) => weekdays.get(w) match {
        // most recent strictly before the anchor
        case Some(d) => Some(anchor.`with`(
          java.time.temporal.TemporalAdjusters.previous(d)))
        case None => shift(anchor, -1, w)
      }
      // bare weekday ("friday"): the next occurrence counting today —
      // the resolution Natty applies to an unqualified weekday
      case w if weekdays.contains(w) =>
        Some(anchor.`with`(
          java.time.temporal.TemporalAdjusters.nextOrSame(weekdays(w))))
      // "june" / "march 2025": unspecified fields keep anchor values
      case MonthOnly(mon, yr) if months.contains(mon) =>
        Option(yr).map(_.toInt).orElse(Some(anchor.getYear)).flatMap { y =>
          scala.util.Try {
            val ym = java.time.YearMonth.of(y, months(mon))
            ym.atDay(math.min(anchor.getDayOfMonth, ym.lengthOfMonth))
          }.toOption
        }
      case _ => None
    }
    r.orNull
  }

  // ---- time-of-day composites ("tomorrow 3pm", "monday at 14:30") ----
  // Natty returns a full java.util.Date (ParseDate.java:91), so phrases
  // carrying a clock time must resolve to a LocalDateTime, not midnight.

  private val timeWords = Map(
    "noon" -> java.time.LocalTime.NOON, "midday" -> java.time.LocalTime.NOON,
    "midnight" -> java.time.LocalTime.MIDNIGHT)

  // "14:30", "2:15:30 pm", "3pm", "3 pm" — a bare hour REQUIRES am/pm
  // (an unsuffixed number stays a number: "june 2025" must not read
  // 2025 as a clock)
  private val ClockRe = "^(\\d{1,2}):(\\d{2})(?::(\\d{2}))?\\s*(am|pm)?$".r
  private val HourAmPm = "^(\\d{1,2})\\s*(am|pm)$".r

  private def parseTime(s: String): Option[java.time.LocalTime] = {
    def mk(h: Int, m: Int, sec: Int, ap: String) = {
      val hh = ap match {
        case null => if (h <= 23) h else -1
        case "am" => if (h >= 1 && h <= 12) h % 12 else -1
        case _    => if (h >= 1 && h <= 12) h % 12 + 12 else -1 // "pm"
      }
      if (hh >= 0 && m <= 59 && sec <= 59)
        Some(java.time.LocalTime.of(hh, m, sec)) else None
    }
    timeWords.get(s).orElse(s match {
      case ClockRe(h, m, sec, ap) =>
        mk(h.toInt, m.toInt, Option(sec).map(_.toInt).getOrElse(0), ap)
      case HourAmPm(h, ap) => mk(h.toInt, 0, 0, ap)
      case _ => None
    })
  }

  /** Full NL resolution: date phrase with an optional time-of-day in
    * any of Natty's surface positions — "<date> at <time>",
    * "<date> <time>", "<time> [on] <date>", or a bare time (anchor
    * day). Date-only phrases resolve to midnight, preserving the
    * pre-composite behavior.
    */
  def parseDateTime(raw: String, anchor: LocalDate): java.time.LocalDateTime = {
    if (raw == null) return null
    val s = raw.trim.toLowerCase.replaceAll("\\s+", " ")
    def dateAt(d: String, t: String): Option[java.time.LocalDateTime] =
      parseTime(t).flatMap(tt => Option(parse(d, anchor)).map(_.atTime(tt)))
    // "<date> at <time>" — lastIndexOf so a compositional date part
    // ("2 days after today at 3pm") keeps its own tail intact
    val atIdx = s.lastIndexOf(" at ")
    if (atIdx > 0) {
      val hit = dateAt(s.substring(0, atIdx), s.substring(atIdx + 4))
      if (hit.isDefined) return hit.get
    }
    val toks = s.split(' ')
    // longer time tail first so "next monday 2:15 pm" binds "2:15 pm"
    for (k <- 2 to 1 by -1 if toks.length > k) {
      val trail = dateAt(toks.dropRight(k).mkString(" "),
        toks.takeRight(k).mkString(" "))
      if (trail.isDefined) return trail.get
      val dPart0 = toks.drop(k).mkString(" ")
      val dPart = if (dPart0.startsWith("on ")) dPart0.substring(3) else dPart0
      val lead = dateAt(dPart, toks.take(k).mkString(" "))
      if (lead.isDefined) return lead.get
    }
    Option(parse(s, anchor)).map(_.atStartOfDay)
      // a bare clock ("noon", "3pm", "14:30") resolves on the anchor day
      .orElse(parseTime(s).map(anchor.atTime(_)))
      .orNull
  }

  val parseUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf { (v: String, anchor: String) =>
      Option(parseDateTime(v, LocalDate.parse(anchor)))
        .map(java.sql.Timestamp.valueOf).orNull
    }
}
