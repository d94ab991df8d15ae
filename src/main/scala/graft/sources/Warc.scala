package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC / WET ingestion — the Common Crawl container format (public
  * spec: ISO 28500 / IIPC WARC 1.1). Pure-JVM record splitter: version
  * line, CRLF header block, Content-Length-delimited payload, two-CRLF
  * record separator; multi-member gzip transparently unwrapped
  * (`.warc.gz` files are per-record gzip members — GZIPInputStream
  * concatenation handles them natively).
  *
  * Scale shape: Common Crawl publishes ~1 GB .warc.gz shards; one
  * shard = one task via `binaryFile` (the same unit cc-pyspark uses).
  * Records inside a shard stream through [[Warc.parseAll]] without
  * materializing more than one payload at a time beyond the emitted
  * row array.
  */
object Warc {

  /** One WARC record, HTTP envelope already unwrapped for response
    * records: `payload` is the logical content (HTTP body for
    * `application/http` payloads, raw payload text otherwise).
    */
  case class WarcRecord(
      warc_type: String,
      target_uri: String,
      date: String,
      record_id: String,
      content_type: String,
      content_length: Long,
      http_status: Integer,
      http_content_type: String,
      payload: String)

  private def isGzip(b: Array[Byte]): Boolean =
    b.length >= 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b

  private def gunzipAll(b: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(b))
    val out = new java.io.ByteArrayOutputStream(b.length * 4)
    val buf = new Array[Byte](65536)
    var n = in.read(buf)
    while (n >= 0) {
      if (n > 0) out.write(buf, 0, n)
      n = in.read(buf)
    }
    in.close()
    out.toByteArray
  }

  private def indexOfCrlfCrlf(b: Array[Byte]): Int = {
    var i = 0
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' &&
        b(i + 3) == '\n') return i
      i += 1
    }
    -1
  }

  /** Undo HTTP/1.1 chunked transfer framing (RFC 9112 Sec. 7.1):
    * hex-size line, chunk bytes, CRLF, repeated until a 0-size chunk.
    * Malformed framing returns the bytes as-is (ingestion keeps going).
    */
  private def dechunk(b: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(b.length)
    var p = 0
    while (p < b.length) {
      // read the size line up to CRLF; ignore chunk extensions after ';'
      var e = p
      while (e + 1 < b.length && !(b(e) == '\r' && b(e + 1) == '\n')) e += 1
      if (e + 1 >= b.length) return b
      val sizeLine = new String(b, p, e - p, "ISO-8859-1")
      val hexPart = sizeLine.split(";")(0).trim
      val size = try Integer.parseInt(hexPart, 16)
        catch { case _: NumberFormatException => return b }
      if (size == 0) return out.toByteArray // terminal chunk (trailers ignored)
      val dataStart = e + 2
      if (dataStart + size > b.length) return b
      out.write(b, dataStart, size)
      p = dataStart + size + 2 // skip trailing CRLF
    }
    out.toByteArray
  }

  /** All records in a WARC byte blob (one file, one record, or any
    * concatenation; gzipped or plain). Malformed input returns the
    * records parsed before the defect — ingestion keeps going on a
    * truncated shard rather than failing the partition.
    */
  def parseAll(bytes0: Array[Byte]): Seq[WarcRecord] = {
    if (bytes0 == null || bytes0.length == 0) return Seq.empty
    val b = if (isGzip(bytes0)) gunzipAll(bytes0) else bytes0
    val out = Vector.newBuilder[WarcRecord]
    var p = 0
    def lineEnd(from: Int): Int = {
      var i = from
      while (i < b.length && b(i) != '\n') i += 1
      i
    }
    def lineAt(from: Int): (String, Int) = {
      val e = lineEnd(from)
      val raw = new String(b, from, e - from, "UTF-8")
      (raw.stripSuffix("\r"), math.min(e + 1, b.length))
    }
    while (p < b.length) {
      // skip inter-record blank lines
      while (p < b.length && (b(p) == '\r' || b(p) == '\n')) p += 1
      if (p >= b.length) return out.result()
      val (version, afterVersion) = lineAt(p)
      if (!version.startsWith("WARC/")) return out.result()
      // header block until the first empty line
      var q = afterVersion
      val headers = scala.collection.mutable.Map.empty[String, String]
      var done = false
      while (!done && q < b.length) {
        val (line, next) = lineAt(q)
        q = next
        if (line.isEmpty) done = true
        else {
          val c = line.indexOf(':')
          if (c > 0)
            headers(line.substring(0, c).trim.toLowerCase) =
              line.substring(c + 1).trim
        }
      }
      val len = headers.get("content-length").flatMap(s =>
        scala.util.Try(s.toLong).toOption).getOrElse(-1L)
      if (len < 0 || q + len > b.length) return out.result() // truncated
      val payloadBytes = java.util.Arrays.copyOfRange(b, q, (q + len).toInt)
      p = (q + len).toInt
      val contentType = headers.getOrElse("content-type", "")
      // HTTP envelope: response/request records carry the HTTP message;
      // split the status line + headers off and surface the body
      var httpStatus: Integer = null
      var httpCt: String = null
      var payloadText: String = null
      if (contentType.toLowerCase.startsWith("application/http")) {
        // BYTE-level envelope split: archived bodies can be binary
        // (gzip Content-Encoding) — a String round-trip would corrupt
        // them before decoding
        val sep = indexOfCrlfCrlf(payloadBytes)
        if (sep >= 0) {
          val head = new String(payloadBytes, 0, sep, "ISO-8859-1")
          val lines = head.split("\r\n")
          if (lines.nonEmpty && lines(0).startsWith("HTTP/")) {
            val parts = lines(0).split(" ")
            if (parts.length >= 2)
              httpStatus = scala.util.Try(
                Integer.valueOf(parts(1))).getOrElse(null)
          }
          var chunked = false
          var gzipped = false
          lines.drop(1).foreach { hl =>
            val c = hl.indexOf(':')
            if (c > 0) {
              val k = hl.substring(0, c).trim.toLowerCase
              val v = hl.substring(c + 1).trim
              if (k == "content-type") httpCt = v
              // real crawl archives store the wire form: chunked
              // framing and gzip bodies must be undone to reach text
              if (k == "transfer-encoding" &&
                v.toLowerCase.contains("chunked")) chunked = true
              if (k == "content-encoding" &&
                v.toLowerCase.contains("gzip")) gzipped = true
            }
          }
          var body = java.util.Arrays.copyOfRange(
            payloadBytes, sep + 4, payloadBytes.length)
          if (chunked) body = dechunk(body)
          if (gzipped && isGzip(body))
            body = scala.util.Try(gunzipAll(body)).getOrElse(body)
          payloadText = new String(body, "UTF-8")
        }
      }
      if (payloadText == null) payloadText = new String(payloadBytes, "UTF-8")
      out += WarcRecord(
        headers.getOrElse("warc-type", ""),
        headers.getOrElse("warc-target-uri", null),
        headers.getOrElse("warc-date", null),
        headers.getOrElse("warc-record-id", null),
        contentType,
        len,
        httpStatus,
        httpCt,
        payloadText)
    }
    out.result()
  }

  val parseAllUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf(parseAll _)

  /** One sitemap entry (sitemaps.org XML protocol). `is_index` marks
    * <sitemapindex> children (nested sitemap references to fetch),
    * false for <urlset> page entries.
    */
  case class SitemapEntry(loc: String, lastmod: String,
      changefreq: String, priority: java.lang.Double, is_index: Boolean)

  /** Parse a sitemap XML document (urlset or sitemapindex) — the
    * crawl-frontier companion to robots.txt. Malformed XML -> empty.
    */
  def parseSitemap(xml: String): Seq[SitemapEntry] = {
    if (xml == null || xml.isEmpty) return Seq.empty
    val root =
      try scala.xml.XML.loadString(xml)
      catch { case _: Exception => return Seq.empty }
    def entries(tag: String, isIndex: Boolean): Seq[SitemapEntry] =
      (root \ tag).flatMap { n =>
        val loc = (n \ "loc").text.trim
        if (loc.isEmpty) None
        else Some(SitemapEntry(
          loc,
          Option((n \ "lastmod").text.trim).filter(_.nonEmpty).orNull,
          Option((n \ "changefreq").text.trim).filter(_.nonEmpty).orNull,
          Option((n \ "priority").text.trim).filter(_.nonEmpty)
            .flatMap(v => scala.util.Try(
              java.lang.Double.valueOf(v)).toOption).orNull,
          isIndex))
      }
    root.label match {
      case "urlset"       => entries("url", isIndex = false)
      case "sitemapindex" => entries("sitemap", isIndex = true)
      case _              => Seq.empty
    }
  }

  val parseSitemapUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf(parseSitemap _)

  /** Read WARC/WET shards from a path glob: one task per shard (the
    * Common Crawl unit of work), records exploded to rows with the
    * source path retained for provenance.
    */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.format("binaryFile").load(path)
      .select(col("path"), explode(parseAllUdf(col("content"))).as("__r"))
      .select(col("path"), col("__r.*"))
}
