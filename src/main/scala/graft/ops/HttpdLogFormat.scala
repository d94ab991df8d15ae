package graft.ops

/** Apache httpd `LogFormat` %-directive strings → one anchored regex
  * with a capture group per emitting directive.
  *
  * The reference feeds the format verbatim to the public nl.basjes
  * httpdlog dissector (reference: wrangler-core
  * directives/parser/ParseLog.java:67); here the same format compiles
  * once on the driver into a single regex, and every field is a
  * codegen'd `regexp_extract` over that regex — no per-row dissector
  * object, whole-stage-codegen friendly, embarrassingly parallel.
  *
  * Naming mirrors the reference's key cleanup (lowercase, non-alnum →
  * '_', ParseLog.java:131-137). Cookie directives (%{..}C) are matched
  * but not emitted, mirroring the reference dropping cookie keys
  * (ParseLog.java:133).
  */
object HttpdLogFormat {

  private def norm(s: String): String =
    s.toLowerCase.replaceAll("[^a-z0-9_]", "_")

  /** Compile a LogFormat string → (anchored regex, field names in
    * capture-group order). Literal characters match themselves; a
    * directive immediately inside double quotes (`"%r"`) matches
    * quote-delimited content instead of a whitespace-delimited token.
    */
  def compile(format: String): (String, Seq[String]) = {
    val sb = new StringBuilder("^")
    val fields = scala.collection.mutable.ArrayBuffer.empty[String]
    val n = format.length
    var i = 0
    while (i < n) {
      val ch = format.charAt(i)
      if (ch == '%' && i + 1 < n) {
        val inQuotes = i > 0 && format.charAt(i - 1) == '"'
        var j = i + 1
        // condition modifiers: %>s, %<s, %400,501{...} status lists,
        // and the '!' negation (%!400,501{Referer}i)
        while (j < n && (format.charAt(j) == '<' || format.charAt(j) == '>' ||
          format.charAt(j) == ',' || format.charAt(j) == '!' ||
          format.charAt(j).isDigit)) j += 1
        if (j < n && format.charAt(j) == '{') {
          val close = format.indexOf('}', j)
          require(close > 0 && close + 1 < n,
            s"unterminated %{...} in log format: $format")
          val name = format.substring(j + 1, close)
          val letter = format.charAt(close + 1)
          val pat = if (inQuotes) "([^\"]*)" else "(\\S+)"
          letter match {
            case 'i' => fields += norm(s"request_header_$name"); sb.append(pat)
            case 'o' => fields += norm(s"response_header_$name"); sb.append(pat)
            case 'C' | 'c' => // cookies: consume, don't emit
              sb.append(if (inQuotes) "[^\"]*" else "\\S+")
            case 't' =>
              // strftime output contains a space exactly where the fmt
              // has a literal one (conversions themselves are
              // space-free, %c/%+ locale forms aside) — so match as
              // many space-separated words as the fmt declares instead
              // of a single \S+ that would misalign on '%{%d/%b/%Y:%T %z}t'
              fields += "time"
              val words = name.count(_ == ' ')
              sb.append(if (inQuotes) "([^\"]*)"
                else s"(\\S+(?: \\S+){$words})")
            case 'e' => fields += norm(s"env_$name"); sb.append(pat)
            case other => fields += norm(s"${name}_$other"); sb.append(pat)
          }
          i = close + 2
        } else if (j < n) {
          val (pat, fieldOpt) = simple(format.charAt(j), inQuotes)
          fieldOpt.foreach(fields += _)
          sb.append(pat)
          i = j + 1
        } else i = n
      } else {
        if ("\\^$.|?*+()[]{}".indexOf(ch.toInt) >= 0) sb.append('\\')
        sb.append(ch)
        i += 1
      }
    }
    sb.append("\\s*$")
    // a repeated directive (two %t forms, the same header twice) must
    // not collapse into one output column — the later withColumn would
    // silently overwrite the earlier capture. Suffix repeats: time_2, …
    val seen = scala.collection.mutable.Map.empty[String, Int]
    val unique = fields.toSeq.map { f =>
      val k = seen.getOrElse(f, 0)
      seen(f) = k + 1
      if (k == 0) f else s"${f}_${k + 1}"
    }
    (sb.toString, unique)
  }

  /** One-letter directives. `%U`/`%q` split path from query string the
    * way Apache does (the path group stops at '?').
    */
  private def simple(letter: Char, inQuotes: Boolean): (String, Option[String]) = {
    val q = if (inQuotes) "([^\"]*)" else "(\\S+)"
    letter match {
      case 'h' => ("(\\S+)", Some("remote_host"))
      case 'a' => ("(\\S+)", Some("remote_ip"))
      case 'A' => ("(\\S+)", Some("local_ip"))
      case 'l' => ("(\\S+)", Some("ident"))
      case 'u' => ("(\\S+)", Some("auth"))
      case 't' => ("\\[([^\\]]+)\\]", Some("time"))
      case 'r' => (q, Some("request"))
      case 'm' => ("(\\S+)", Some("method"))
      case 'U' => ("([^?\"\\s]*)", Some("url_path"))
      case 'q' => ("((?:\\?[^\"\\s]*)?)", Some("query"))
      case 'H' => (q, Some("protocol"))
      case 's' => ("(\\d{3})", Some("status"))
      case 'b' | 'B' => ("(\\S+)", Some("bytes"))
      case 'D' => ("(\\S+)", Some("response_time_micros"))
      case 'T' => ("(\\S+)", Some("response_time_secs"))
      case 'v' => ("(\\S+)", Some("server_name"))
      case 'V' => ("(\\S+)", Some("canonical_server_name"))
      case 'p' => ("(\\S+)", Some("port"))
      case 'P' => ("(\\S+)", Some("pid"))
      case 'f' => (q, Some("filename"))
      case 'k' => ("(\\S+)", Some("keepalive"))
      case 'X' => ("(\\S)", Some("connection_status"))
      case 'I' => ("(\\S+)", Some("bytes_received"))
      case 'O' => ("(\\S+)", Some("bytes_sent"))
      case '%' => ("%", None)
      case other => ("(\\S+)", Some(norm(s"field_$other")))
    }
  }
}
