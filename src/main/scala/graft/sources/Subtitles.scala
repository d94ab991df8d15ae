package graft.sources

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** SRT / WebVTT subtitle decode — the text half of video-text
  * training pairs (every captioned video corpus ships one of these
  * two formats). Autodetects by the `WEBVTT` magic; both forms yield
  * time-aligned cues for transcript assembly, frame-caption pairing
  * (join on `start_ms` against sampled frame offsets), or plain text
  * mining. Total on arbitrary input: malformed blocks are skipped,
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
  def parse(raw: String): Seq[Cue] = {
    if (raw == null || raw.isEmpty) return Seq.empty
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

  val parseUdf: UserDefinedFunction = udf((s: String) =>
    parse(s).map(c => (c.index, c.start_ms, c.end_ms, c.text)))
}
