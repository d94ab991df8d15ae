package graft.sources

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** SRT / WebVTT / ASS-SSA subtitle decode — the text half of
  * video-text training pairs (captioned video corpora ship these
  * three formats; fansub archives are overwhelmingly ASS). SRT/VTT
  * parse as `start --> end` blocks; a document with an `[Events]`
  * section parses as ASS: the `Format:` line names the field order,
  * `Dialogue:` lines yield cues with override tags (`{\i1}`) and
  * `\N` hard breaks normalized away. All forms yield time-aligned
  * cues for transcript assembly, frame-caption pairing (join on
  * `start_ms` against sampled frame offsets), or plain text mining.
  * Total on arbitrary input: malformed blocks/lines are skipped,
  * garbage yields zero cues.
  */
object Subtitles {

  /** One cue: 0-based ordinal (format-independent — SRT's own
    * numbering is display metadata and routinely wrong in the wild),
    * start/end in milliseconds, text with markup tags stripped and
    * lines joined by '\n'.
    */
  case class Cue(index: Int, start_ms: Long, end_ms: Long, text: String)

  // HH:MM:SS,mmm (SRT) / HH:MM:SS.mmm (VTT) / MM:SS.mmm (VTT short)
  private val Ts = java.util.regex.Pattern.compile(
    "(?:(\\d{1,2}):)?(\\d{1,2}):(\\d{1,2})[.,](\\d{1,3})")

  private def parseTs(s: String): Long = {
    val m = Ts.matcher(s.trim)
    if (!m.matches()) return -1L
    val h = Option(m.group(1)).map(_.toLong).getOrElse(0L)
    val frac = m.group(4)
    val ms = frac.padTo(3, '0').toLong
    ((h * 60 + m.group(2).toLong) * 60 + m.group(3).toLong) * 1000 + ms
  }

  private val Arrow = java.util.regex.Pattern.compile(
    "\\s*(\\S+)\\s+-->\\s+(\\S+).*")

  /** Strip `<i>`, `<c.class>`, `{\\an8}`-style markup from cue text. */
  private def stripMarkup(s: String): String =
    s.replaceAll("<[^>]*>", "").replaceAll("\\{\\\\[^}]*\\}", "").trim

  /** Parse an SRT or WebVTT document to cues. Blocks without a valid
    * `start --> end` line (SRT indices, VTT NOTE/STYLE/REGION blocks,
    * cue ids) are skipped; a cue whose end precedes its start is
    * dropped as malformed.
    */
  // ASS dispatch requires a REAL `[Events]` section header — the
  // literal at line start — AND a `Dialogue:` line after it; an
  // SRT/VTT file whose cue text merely mentions "[Events]" must not
  // be re-parsed as ASS (it would yield zero cues and drop every
  // valid SRT cue)
  private val AssEventsHeader = java.util.regex.Pattern.compile(
    "(?m)^\\s*\\[Events\\]\\s*$")
  private val AssDialogueLine = java.util.regex.Pattern.compile(
    "(?m)^\\s*Dialogue\\s*:")

  private def looksAss(raw: String): Boolean = {
    val m = AssEventsHeader.matcher(raw)
    if (!m.find()) return false
    val d = AssDialogueLine.matcher(raw)
    d.find(m.end())
  }

  def parse(raw: String): Seq[Cue] = {
    if (raw == null || raw.isEmpty) return Seq.empty
    if (looksAss(raw)) return parseAss(raw)
    val out = Seq.newBuilder[Cue]
    var idx = 0
    // BOM + WEBVTT header line (with optional trailing metadata) is
    // just another non-cue line to the block walk below
    val lines = raw.replace("\uFEFF", "").split("\r\n|\n", -1)
    var i = 0
    while (i < lines.length) {
      val m = Arrow.matcher(lines(i))
      if (m.matches()) {
        val start = parseTs(m.group(1))
        val end = parseTs(m.group(2))
        val text = new StringBuilder
        i += 1
        while (i < lines.length && lines(i).trim.nonEmpty) {
          val t = stripMarkup(lines(i))
          if (t.nonEmpty) {
            if (text.nonEmpty) text.append('\n')
            text.append(t)
          }
          i += 1
        }
        if (start >= 0 && end >= start) {
          out += Cue(idx, start, end, text.toString)
          idx += 1
        }
      } else i += 1
    }
    out.result()
  }

  /** ASS/SSA: the `Format:` line in `[Events]` names the field order
    * (defaults to the v4+ standard when absent); each `Dialogue:`
    * line's Start/End/Text fields become a cue. Text is everything
    * from the text field on (commas inside dialogue survive — the
    * split is bounded by the field count); `{\tags}` drop, `\N`/`\n`
    * become newlines, `\h` a space. ASS timestamps are
    * H:MM:SS.cc centiseconds — parseTs's right-pad-to-millis handles
    * them (50cs -> 500ms).
    */
  private def parseAss(raw: String): Seq[Cue] = {
    val out = Seq.newBuilder[Cue]
    var idx = 0
    // v4+ default order
    var fields: Array[String] = Array("layer", "start", "end", "style",
      "name", "marginl", "marginr", "marginv", "effect", "text")
    var inEvents = false
    raw.replace("﻿", "").split("\r\n|\n", -1).foreach { line =>
      val t = line.trim
      if (t.startsWith("[")) inEvents = t.equalsIgnoreCase("[Events]")
      else if (inEvents && t.regionMatches(true, 0, "Format:", 0, 7)) {
        fields = t.substring(7).split(",")
          .map(_.trim.toLowerCase(java.util.Locale.ROOT))
      } else if (inEvents && t.regionMatches(true, 0, "Dialogue:", 0, 9)) {
        val parts = t.substring(9).split(",", fields.length)
        def fld(n: String): String = {
          val i = fields.indexOf(n)
          if (i >= 0 && i < parts.length) parts(i).trim else null
        }
        val start = Option(fld("start")).map(parseTs).getOrElse(-1L)
        val end = Option(fld("end")).map(parseTs).getOrElse(-1L)
        val body = fld("text")
        if (start >= 0 && end >= start && body != null) {
          val text = body.replaceAll("\\{\\\\[^}]*\\}", "")
            .replace("\\N", "\n").replace("\\n", "\n")
            .replace("\\h", " ").trim
          out += Cue(idx, start, end, text)
          idx += 1
        }
      }
    }
    out.result()
  }

  val parseUdf: UserDefinedFunction = udf((s: String) =>
    parse(s).map(c => (c.index, c.start_ms, c.end_ms, c.text)))
}
