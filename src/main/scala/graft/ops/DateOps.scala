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
    "MMM d, yyyy", "MMMM d, yyyy", "dd-MMM-yyyy", "yyyyMMdd")

  def build(spec: DirectiveSpec): Option[PipeOp] = Option(spec.name match {

    // (reference: wrangler-core directives/parser/ParseSimpleDate.java:80)
    case "parse-as-simple-date" => ColumnOps.simple(spec) { df =>
      val c = spec.col(0)
      df.withColumn(c,
        to_timestamp(col(c).cast(StringType), translatePattern(spec.str(1))))
    }

    // best-effort multi-format parse (reference: ParseDate.java:91 — Natty)
    case "parse-as-date" => ColumnOps.simple(spec) { df =>
      val c = spec.col(0)
      val candidates = CommonFormats.map(f =>
        try_to_timestamp(col(c).cast(StringType), lit(f)))
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
