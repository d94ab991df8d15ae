package graft.sources

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** RTF text extraction — the legacy word-processing format enterprise
  * document dumps are full of. Group-aware control-word walk (no
  * external parser): destination groups that carry NO document text
  * (font/color tables, stylesheets, pictures, embedded objects,
  * headers, and every `{\*` unknown destination) are skipped
  * wholesale; `\par`/`\line` become line breaks, `\tab` a TAB,
  * `\'hh` hex escapes decode through windows-1252 (RTF's default
  * ANSI codepage), and `\uN` unicode escapes honor the `\ucN`
  * fallback-skip count per group. Total on arbitrary input.
  */
object Rtf {

  private val SkipDestinations = Set(
    "fonttbl", "colortbl", "stylesheet", "info", "pict", "object",
    "header", "footer", "headerl", "headerr", "headerf",
    "footerl", "footerr", "footerf", "ftnsep", "ftnsepc",
    "generator", "themedata", "colorschememapping", "datastore",
    "latentstyles", "listtable", "listoverridetable", "revtbl",
    "xmlnstbl", "wgrffmtfilter")

  /** Plain text of an RTF document (empty for non-RTF input — the
    * `{\rtf` magic is required so binary noise never "extracts").
    */
  def extract(s: String): String = {
    if (s == null || !s.startsWith("{\\rtf")) return ""
    val sb = new java.lang.StringBuilder
    // per-group state: (skipping, ucSkip)
    var stack = List((false, 1))
    def cur = stack.head
    var i = 0
    var pendingUcSkip = 0
    while (i < s.length) {
      val c = s.charAt(i)
      // a control WORD ends the fallback run (the spec's fallback is
      // plain chars and escapes): without this, \uN followed by \tab would both
      // render the tab AND still eat the next REAL character as the
      // "fallback"
      if (pendingUcSkip > 0 && c == '\\' && i + 1 < s.length &&
        s.charAt(i + 1).isLetter) pendingUcSkip = 0
      if (pendingUcSkip > 0 && c != '{' && c != '}' && c != '\\') {
        pendingUcSkip -= 1; i += 1 // \uN fallback chars
      } else if (pendingUcSkip > 0 && c == '\\' && i + 1 < s.length &&
        s.charAt(i + 1) == '\'') {
        // Word writes the fallback as an escape, e.g. \u8212\'97: the
        // whole \'hh is ONE fallback character — rendering it would
        // duplicate every non-ASCII char in Word-authored RTF
        pendingUcSkip -= 1
        i += (if (i + 3 < s.length) 4 else s.length - i)
      } else if (pendingUcSkip > 0 && c == '\\' && i + 1 < s.length &&
        !s.charAt(i + 1).isLetter && s.charAt(i + 1) != '*') {
        // control-symbol fallback (\~ \\ \{ \}): one fallback unit
        pendingUcSkip -= 1
        i += 2
      } else c match {
        case '{' =>
          stack = cur :: stack
          i += 1
          // {\* — unknown starred destination: skip the whole group
          if (i + 1 < s.length && s.charAt(i) == '\\' &&
            s.charAt(i + 1) == '*') {
            stack = (true, cur._2) :: stack.tail
            i += 2
          }
        case '}' =>
          if (stack.tail.nonEmpty) stack = stack.tail
          i += 1
        case '\\' =>
          i += 1
          if (i >= s.length) ()
          else {
            val e = s.charAt(i)
            if (e == '\'') { // \'hh — codepage byte
              if (i + 2 < s.length) {
                val h = Character.digit(s.charAt(i + 1), 16)
                val l = Character.digit(s.charAt(i + 2), 16)
                if (h >= 0 && l >= 0 && !cur._1) {
                  sb.append(new String(
                    Array(((h << 4) | l).toByte), "windows-1252"))
                }
                i += 3
              } else i = s.length
            } else if (!e.isLetter) { // escaped delimiter / symbol
              if (!cur._1) e match {
                case '~' => sb.append(' ') // non-breaking space
                case '-' | '_' => () // optional/nb hyphen markers
                case '\r' | '\n' => sb.append('\n') // \<EOL> = \par
                case other => sb.append(other) // \\ \{ \} \% … literal
              }
              i += 1
            } else { // control word
              val start = i
              while (i < s.length && s.charAt(i).isLetter) i += 1
              val word = s.substring(start, i)
              val numStart = i
              if (i < s.length && (s.charAt(i) == '-' ||
                s.charAt(i).isDigit)) {
                i += 1
                while (i < s.length && s.charAt(i).isDigit) i += 1
              }
              val num = if (i > numStart)
                scala.util.Try(s.substring(numStart, i).toInt).getOrElse(0)
              else Int.MinValue
              if (i < s.length && s.charAt(i) == ' ') i += 1 // delimiter
              word match {
                case _ if cur._1 && word != "uc" => () // inside a skip
                case d if SkipDestinations(d) =>
                  stack = (true, cur._2) :: stack.tail
                case "par" | "line" | "sect" | "page" => sb.append('\n')
                case "tab" => sb.append('\t')
                case "emdash" => sb.append('—')
                case "endash" => sb.append('–')
                case "lquote" => sb.append('‘')
                case "rquote" => sb.append('’')
                case "ldblquote" => sb.append('“')
                case "rdblquote" => sb.append('”')
                case "bullet" => sb.append('•')
                case "uc" =>
                  if (num != Int.MinValue)
                    stack = (cur._1, math.max(0, num)) :: stack.tail
                case "u" =>
                  if (num != Int.MinValue) {
                    // negative values are codepoint-65536 (RTF signed
                    // 16-bit convention)
                    val cp = if (num < 0) num + 65536 else num
                    if (Character.isValidCodePoint(cp) && !cur._1)
                      sb.appendCodePoint(cp)
                    pendingUcSkip = cur._2
                  }
                case "bin" => // raw binary run: skip declared bytes
                  if (num > 0) i = math.min(s.length.toLong,
                    i.toLong + num).toInt
                case _ => () // formatting word: no text effect
              }
            }
          }
        case '\r' | '\n' => i += 1 // raw EOLs are NOT text in RTF
        case ch =>
          if (!cur._1) sb.append(ch)
          i += 1
      }
    }
    // collapse the trailing newline RTF writers leave before `}`
    var end = sb.length
    while (end > 0 && sb.charAt(end - 1) == '\n') end -= 1
    sb.substring(0, end)
  }

  val extractUdf: UserDefinedFunction = udf(extract _)
}
