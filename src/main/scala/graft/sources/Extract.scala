package graft.sources

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** The document-ingestion front door: sniff a binary payload's format
  * and route it to the right text extractor — the one directive a
  * mixed-corpus pipeline (a crawl's application/octet-stream bucket,
  * an email attachment column, a WebDataset of scraped files) applies
  * before any format-specific stage. Detection is by MAGIC BYTES and
  * container members, never by filename:
  *
  *  - `%PDF`                  → [[Pdf.extract]] (pages joined by \n\n)
  *  - `PK` zip with `word/document.xml`       → docx
  *  -            with `ppt/slides/`           → pptx
  *  -            with `META-INF/container.xml`→ epub
  *  -            anything else                → zip (NOT extracted —
  *    member routing is parse-as-zip's job; a blind concat of members
  *    would interleave unrelated texts)
  *  - `<html` / `<!doctype html` / `<?xml…<html` → html
  *  - EBML `1A 45 DF A3` (Matroska/WebM)       → mkv: the S_TEXT
  *    subtitle track IS the video's text (cues joined by \n) — the
  *    video-to-training-text route; no text track → (mkv, null)
  *  - valid UTF-8 with a printable majority   → text (identity)
  *  - everything else → (null, null): unknown binary is a routing
  *    decision for the caller, not silently-empty text
  *
  * Total on arbitrary bytes (every delegate already is).
  */
object Extract {

  private def isZip(b: Array[Byte]): Boolean =
    b.length >= 4 && b(0) == 'P' && b(1) == 'K' &&
      (b(2) == 3 || b(2) == 5 || b(2) == 7)

  private def looksHtml(s: String): Boolean = {
    val head = s.take(1024).toLowerCase(java.util.Locale.ROOT)
    head.contains("<html") || head.contains("<!doctype html")
  }

  /** (format, text); (null, null) when unroutable. */
  def extractAny(b: Array[Byte]): (String, String) =
    extractAny(b, depth = 0)

  private def extractAny(b: Array[Byte], depth: Int): (String, String) = {
    try {
      if (b == null || b.length == 0) return (null, null)
      // gzip wrapper (crawls store .gz documents): inflate through
      // the bomb-budgeted kernel and route the payload — ONE level,
      // reported as gz+<inner> so the caller sees the wire form
      if (depth == 0 && b.length >= 3 && (b(0) & 0xff) == 0x1f &&
        (b(1) & 0xff) == 0x8b) {
        val inner = graft.functions.Udfs.decompress(b, "gzip")
        if (inner == null) return (null, null)
        val (fmt, text) = extractAny(inner, depth + 1)
        return (if (fmt == null) null else s"gz+$fmt", text)
      }
      // zstd (the modern crawl-dump compression) and bzip2 wrappers:
      // same one-level inflate through the budgeted kernel. The sniff
      // accepts BOTH frame kinds — a payload that leads with a
      // skippable frame (the warc-zstd dictionary layout) routes here
      // too; the kernel consumes it and honors its dictionary slot.
      if (depth == 0 && b.length >= 4 && ZstdFrames.isZstdMagic(
        b(0) & 0xff, b(1) & 0xff, b(2) & 0xff, b(3) & 0xff)) {
        val inner = graft.functions.Udfs.decompress(b, "zstd")
        if (inner == null) return (null, null)
        val (fmt, text) = extractAny(inner, depth + 1)
        return (if (fmt == null) null else s"zst+$fmt", text)
      }
      if (depth == 0 && b.length >= 4 && b(0) == 'B' && b(1) == 'Z' &&
        b(2) == 'h') {
        val inner = graft.functions.Udfs.decompress(b, "bzip2")
        if (inner == null) return (null, null)
        val (fmt, text) = extractAny(inner, depth + 1)
        return (if (fmt == null) null else s"bz2+$fmt", text)
      }
      // xz (arXiv/HF dump shards): one-level inflate like gz/zst/bz2
      // — the tukaani decoder ships in Spark's own jars. An xz
      // payload that won't decode (or holds an unroutable inner)
      // stays NAMED-but-textless, so callers can still segregate it.
      if (b.length >= 6 && (b(0) & 0xff) == 0xfd && b(1) == '7' &&
        b(2) == 'z' && b(3) == 'X' && b(4) == 'Z') {
        if (depth == 0) {
          val inner = graft.functions.Udfs.decompress(b, "xz")
          if (inner != null) {
            val (fmt, text) = extractAny(inner, depth + 1)
            if (fmt != null) return (s"xz+$fmt", text)
          }
        }
        return ("xz", null)
      }
      // 7z: NAMED — member routing is parse-as-7z's job (the zip
      // contract); rar has no shipped pure-JVM decoder, NAMED only
      if (b.length >= 6 && b(0) == '7' && b(1) == 'z' &&
        (b(2) & 0xff) == 0xbc && (b(3) & 0xff) == 0xaf) return ("7z", null)
      if (b.length >= 5 && b(0) == 'R' && b(1) == 'a' && b(2) == 'r' &&
        b(3) == '!') return ("rar", null)
      if (b.length >= 4 &&
        b(0) == '%' && b(1) == 'P' && b(2) == 'D' && b(3) == 'F') {
        val pages = Pdf.extract(b)
        return ("pdf", pages.map(_.text).mkString("\n\n"))
      }
      if (isZip(b)) {
        val names = Zip.entries(b).map(_._1)
        if (names.contains("word/document.xml"))
          return ("docx", Docx.extractDocx(b).mkString("\n"))
        if (names.exists(_.startsWith("ppt/slides/slide")))
          return ("pptx", Docx.extractPptx(b).map(_._2).mkString("\n"))
        if (names.contains("META-INF/container.xml") ||
          names.exists(_.endsWith(".opf")))
          return ("epub", Epub.extract(b).map(_.text).mkString("\n\n"))
        if (names.contains("content.xml"))
          return ("odt", Docx.extractOdt(b).mkString("\n"))
        return ("zip", null) // member routing is parse-as-zip's job
      }
      if (b.length >= 4 && (b(0) & 0xff) == 0x1a && (b(1) & 0xff) == 0x45 &&
        (b(2) & 0xff) == 0xdf && (b(3) & 0xff) == 0xa3) {
        // Matroska/WebM: the muxed subtitle track is the container's
        // text; a caption-less video routes as (mkv, null) so the
        // caller can still count/segregate video payloads
        val cues = graft.llm.MediaHeaders.webmSubtitles(b)
        return ("mkv",
          if (cues.isEmpty) null else cues.map(_.text).mkString("\n"))
      }
      // MP4/ISO-BMFF: the tx3g/text timed-text track is the video's
      // text (parity with the MKV leg); caption-less video routes as
      // (mp4, null). HEIF-family STILL images share the container —
      // the ftyp major brand segregates them first (textless)
      if (b.length >= 12 && b(4) == 'f' && b(5) == 't' && b(6) == 'y' &&
        b(7) == 'p') {
        val brand = new String(b, 8, 4, "US-ASCII")
        if (brand == "heic" || brand == "heix" || brand == "mif1")
          return ("heic", null)
        if (brand == "avif" || brand == "avis") return ("avif", null)
      }
      if (b.length >= 12 && b(4) == 'f' && b(5) == 't' && b(6) == 'y' &&
        b(7) == 'p') {
        val cues = graft.llm.MediaHeaders.mp4Subtitles(b)
        return ("mp4",
          if (cues.isEmpty) null else cues.map(_.text).mkString("\n"))
      }
      // WARC envelope (a .zst/.gz-wrapped crawl shard routed through
      // the wrapper legs above lands here): NAMED — record routing is
      // parse-as-warc's job, same contract as the zip leg; the
      // wrapper prefix makes the wire form visible (`zst+warc`)
      if (b.length >= 5 && b(0) == 'W' && b(1) == 'A' && b(2) == 'R' &&
        b(3) == 'C' && b(4) == '/') return ("warc", null)
      // audio containers: NAMED, textless (the audio probes/tag
      // readers are their decoders) — a crawl's media bucket routes
      // to segregation instead of binary noise
      if (b.length >= 8 && b(0) == 'f' && b(1) == 'L' && b(2) == 'a' &&
        b(3) == 'C') return ("flac", null)
      if (b.length >= 28 && b(0) == 'O' && b(1) == 'g' && b(2) == 'g' &&
        b(3) == 'S') return ("ogg", null)
      if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3')
        return ("mp3", null)
      if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' &&
        b(11) == 'E') return ("wav", null)
      if (b.length >= 12 && b(0) == 'F' && b(1) == 'O' && b(2) == 'R' &&
        b(3) == 'M' && b(8) == 'A' && b(9) == 'I' && b(10) == 'F' &&
        (b(11) == 'F' || b(11) == 'C')) return ("aiff", null)
      // text-family: decode strictly — binary noise must not pass
      val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      val s =
        try dec.decode(java.nio.ByteBuffer.wrap(b)).toString
        catch { case _: java.nio.charset.CharacterCodingException =>
          return (null, null) }
      // subtitle documents (SRT/VTT/ASS): the cue text IS the text.
      // The hint alone does NOT claim the document — only documents
      // that yield at least one real cue take this branch, so crawled
      // HTML containing `<!-- x --> ` or the literal `[Events]` still
      // falls through to the html/plain-text chain below
      val subtitleHint = s.startsWith("WEBVTT") ||
        s.contains("[Events]") || s.take(400).contains(" --> ")
      val cues =
        if (subtitleHint) Subtitles.parse(s) else Seq.empty[Subtitles.Cue]
      if (s.startsWith("{\\rtf")) ("rtf", Rtf.extract(s))
      else if (cues.nonEmpty) ("subtitles", cues.map(_.text).mkString("\n"))
      else if (looksHtml(s)) {
        val (_, text) = graft.llm.HtmlText.extract(s)
        ("html", text)
      } else {
        val printable = s.count(c => !Character.isISOControl(c) ||
          c == '\n' || c == '\r' || c == '\t')
        if (printable * 10 >= s.length * 9) ("text", s)
        else (null, null)
      }
    } catch { case scala.util.control.NonFatal(_) => (null, null) }
  }

  val extractAnyUdf: UserDefinedFunction =
    udf((b: Array[Byte]) => extractAny(b))
}
