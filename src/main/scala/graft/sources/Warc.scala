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
  * shard = one task (the same unit cc-pyspark uses). [[Warc.read]]
  * opens a Hadoop `FSDataInputStream` per shard and decodes through
  * [[Warc.parseStream]], an InputStream-based splitter that holds ONE
  * record payload at a time — neither the compressed shard nor its
  * ~4-5 GB decompressed form is ever materialized as a byte[].
  * Per-task memory = one record payload (+ its envelope copies), not
  * the shard. [[Warc.parseAll]] (and the UDF over binary columns) is
  * the convenience wrapper for ALREADY-IN-MEMORY blobs — per-record
  * blobs or test fixtures, not whole shards.
  */
object Warc {

  /** One WARC record, HTTP envelope already unwrapped for response
    * records: `payload` is the logical content (HTTP body for
    * `application/http` payloads, raw payload text otherwise) as
    * text; `payload_bytes` is the SAME logical content byte-exact —
    * crawls carry binary bodies (PDF, images, archives) that a UTF-8
    * decode would corrupt, so binary-consuming stages (parse-as-pdf,
    * dedup-images, parse-as-zip) chain on the bytes column.
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
      payload: String,
      payload_bytes: Array[Byte])

  private def isGzip(b: Array[Byte]): Boolean =
    b.length >= 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b

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
      // parseInt accepts "-5": a hostile negative size would pass the
      // `dataStart + size > b.length` bound below and make write()
      // throw IndexOutOfBoundsException — treat it as malformed framing
      if (size < 0) return b
      if (size == 0) return out.toByteArray // terminal chunk (trailers ignored)
      val dataStart = e + 2
      // Long arithmetic: dataStart + 0x7fffffff wraps negative in Int
      // and would slip past this bound into an out-of-range write
      if (dataStart.toLong + size > b.length) return b
      out.write(b, dataStart, size)
      p = dataStart + size + 2 // skip trailing CRLF
    }
    out.toByteArray
  }

  /** Build one record from its parsed header map + payload bytes —
    * HTTP envelope (status line, headers, chunked framing, gzip body)
    * unwrapped here so both the streaming and in-memory paths share
    * identical semantics.
    */
  private def mkRecord(headers: collection.Map[String, String],
      payloadBytes: Array[Byte], len: Long): WarcRecord = {
    val contentType = headers.getOrElse("content-type", "")
    // HTTP envelope: response/request records carry the HTTP message;
    // split the status line + headers off and surface the body
    var httpStatus: Integer = null
    var httpCt: String = null
    var payloadText: String = null
    var bodyBytes: Array[Byte] = null
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
        if (gzipped && isGzip(body)) {
          // budgeted + total (1 << 28 cap): a gzip-bomb body returns
          // null instead of inflating ~1032:1 into an OOM Error that
          // no Try at this site could catch — keep the wire bytes then
          val inflated = graft.functions.Udfs.decompress(body, "gzip")
          if (inflated != null) body = inflated
        }
        payloadText = new String(body, "UTF-8")
        bodyBytes = body
      }
    }
    if (payloadText == null) {
      payloadText = new String(payloadBytes, "UTF-8")
      bodyBytes = payloadBytes
    }
    WarcRecord(
      headers.getOrElse("warc-type", ""),
      headers.getOrElse("warc-target-uri", null),
      headers.getOrElse("warc-date", null),
      headers.getOrElse("warc-record-id", null),
      contentType,
      len,
      httpStatus,
      httpCt,
      payloadText,
      bodyBytes)
  }

  /** Streaming record splitter: one record in memory at a time, gzip
    * (single- or multi-member, i.e. `.warc.gz`) transparently
    * unwrapped off the stream. Malformed input ends the iterator at
    * the last whole record — ingestion keeps going on a truncated
    * shard rather than failing the partition. The input stream is
    * closed when the iterator is exhausted.
    */
  def parseStream(in0: java.io.InputStream,
      maxRecordBytes: Long = 1L << 28): Iterator[WarcRecord] = {
    val pb = new java.io.PushbackInputStream(
      new java.io.BufferedInputStream(in0, 1 << 16), 4)
    val head = new Array[Int](4)
    var hn = 0
    while (hn < 4 && { head(hn) = pb.read(); head(hn) >= 0 }) hn += 1
    var k = hn - 1
    while (k >= 0) { pb.unread(head(k)); k -= 1 }
    val in: java.io.InputStream =
      if (head(0) == 0x1f && head(1) == 0x8b) {
        // GZIPInputStream validates the full 10-byte member header at
        // construction time, so bytes like `1f 8b 00` (gzip magic, bad
        // compression method) throw ZipException HERE — outside
        // advance()'s guard. Same totality policy as advance(): a
        // stream whose gzip header doesn't parse holds zero whole
        // records, so close it and hand back the empty iterator
        // instead of letting one corrupt shard fail the task.
        try new java.util.zip.GZIPInputStream(pb, 1 << 16)
        catch {
          case _: java.io.IOException =>
            try pb.close() catch { case _: java.io.IOException => () }
            return Iterator.empty
        }
      } else if (hn == 4 &&
        ZstdFrames.isZstdMagic(head(0), head(1), head(2), head(3))) {
        // .warc.zst — the compression Common Crawl is migrating to;
        // continuous mode reads across concatenated frames the same
        // way GZIPInputStream concatenates gzip members. The Common
        // Crawl dictionary layout LEADS with a skippable frame
        // (0x184D2A5x) carrying the decode dictionary — ZstdFrames
        // consumes it and installs the dictionary before streaming,
        // so both plain and dictionary shards parse.
        try ZstdFrames.open(pb)
        catch {
          case scala.util.control.NonFatal(_) =>
            try pb.close() catch { case _: java.io.IOException => () }
            return Iterator.empty
        }
      } else pb

    new Iterator[WarcRecord] {
      private var nextRec: WarcRecord = _
      private var finished = false

      // bytes until '\n' (excluded, trailing '\r' stripped); null at EOF
      // or when a "line" exceeds 64 KB — real WARC header lines are
      // tiny, so an endless line means a mis-globbed binary input, and
      // buffering it unbounded would break the one-record memory
      // contract before the WARC/ version check could reject it
      private def readLine(): String = {
        var c = in.read()
        if (c < 0) return null
        val buf = new java.io.ByteArrayOutputStream(128)
        while (c >= 0 && c != '\n') {
          buf.write(c)
          if (buf.size > 65536) return null
          c = in.read()
        }
        new String(buf.toByteArray, "UTF-8").stripSuffix("\r")
      }

      // Chunked payload read: allocation grows with bytes ACTUALLY
      // read, never with the untrusted Content-Length header — a
      // corrupt "Content-Length: 2000000000" on a truncated stream
      // ends the iterator gracefully instead of eagerly allocating
      // 2 GB per task (the in-memory parser's old `q + len > b.length`
      // invariant, restored for streams).
      private def readFully(len: Long): Array[Byte] = {
        if (len > Int.MaxValue - 16) return null // absurd length = malformed
        val out = new java.io.ByteArrayOutputStream(
          math.min(len, 1L << 16).toInt)
        val buf = new Array[Byte](1 << 16)
        var remaining = len
        while (remaining > 0) {
          val n = in.read(buf, 0, math.min(remaining, buf.length.toLong).toInt)
          if (n < 0) return null // truncated payload
          out.write(buf, 0, n)
          remaining -= n
        }
        out.toByteArray
      }

      private def finish(): Unit = {
        finished = true
        nextRec = null
        try in.close() catch { case _: java.io.IOException => () }
      }

      // stream past an over-budget payload in 64 KiB chunks (never
      // buffered) — the Tar.parseStream drop-and-continue contract.
      // Returns false on EOF mid-skip (truncated stream).
      private def skipFully(len: Long): Boolean = {
        val buf = new Array[Byte](1 << 16)
        var remaining = len
        while (remaining > 0) {
          val n = in.read(buf, 0, math.min(remaining, buf.length.toLong).toInt)
          if (n < 0) return false
          remaining -= n
        }
        true
      }

      private def advance(): Unit = {
        if (finished) return
        nextRec = null
        // loops only when an over-budget record is dropped: skip its
        // payload and continue with the next record instead of either
        // buffering maxRecordBytes+ per task or ending the shard
        while (!finished && nextRec == null) {
          var dropped = false
          val rec = try {
            // skip inter-record blank lines to the next version line
            var version = readLine()
            while (version != null && version.isEmpty) version = readLine()
            if (version == null || !version.startsWith("WARC/")) null
            else {
              // header block until the first empty line
              val headers = scala.collection.mutable.Map.empty[String, String]
              var line = readLine()
              while (line != null && line.nonEmpty) {
                val c = line.indexOf(':')
                if (c > 0)
                  headers(line.substring(0, c).trim.toLowerCase) =
                    line.substring(c + 1).trim
                line = readLine()
              }
              if (line == null) null // EOF inside the header block
              else {
                val len = headers.get("content-length").flatMap(s =>
                  scala.util.Try(s.toLong).toOption).getOrElse(-1L)
                if (len < 0) null
                else if (len > maxRecordBytes) {
                  dropped = skipFully(len)
                  null
                } else {
                  val payloadBytes = readFully(len)
                  if (payloadBytes == null) null
                  else mkRecord(headers, payloadBytes, len)
                }
              }
            }
          } catch {
            // corrupt gzip stream, hostile envelope bytes (a runtime
            // exception out of the HTTP unwrap must not escape the
            // task) — keep the records so far
            case scala.util.control.NonFatal(_) => null
          }
          if (rec != null) nextRec = rec
          else if (!dropped) finish()
        }
      }

      advance()
      override def hasNext: Boolean = nextRec != null
      override def next(): WarcRecord = {
        if (nextRec == null) throw new NoSuchElementException("WARC iterator")
        val r = nextRec
        advance()
        r
      }
    }
  }

  /** All records in an in-memory WARC blob (gzipped or plain) — the
    * bounded-input convenience over [[parseStream]] for per-record
    * binary columns and fixtures. For whole shards use [[read]],
    * which never materializes the blob.
    */
  def parseAll(bytes0: Array[Byte]): Seq[WarcRecord] = {
    if (bytes0 == null || bytes0.length == 0) return Seq.empty
    parseStream(new java.io.ByteArrayInputStream(bytes0)).toVector
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

  /** One syndication-feed item, normalized across RSS 2.0 / RSS 1.0
    * (RDF) / Atom — the third leg of the crawl-frontier triple
    * (robots.txt gate, sitemap, feed): feeds surface NEW urls faster
    * than sitemaps on news/blog sites. `published` is the item's own
    * date string verbatim (pubDate / dc:date / published / updated —
    * normalization is a downstream parse-as-datetime concern).
    */
  case class FeedEntry(feed_type: String, feed_title: String,
      title: String, link: String, published: String, id: String,
      summary: String)

  /** Parse an RSS 2.0 (`<rss><channel><item>`), RSS 1.0
    * (`<rdf:RDF><item>`), or Atom (`<feed><entry>`) document to one
    * row per item. Tag matching is by local name, so namespace
    * prefixes (dc:, atom:, content:) bind without schema knowledge.
    * Malformed XML or an unknown root -> empty.
    */
  def parseFeed(xml: String): Seq[FeedEntry] = {
    if (xml == null || xml.isEmpty) return Seq.empty
    val root =
      try scala.xml.XML.loadString(xml)
      catch { case scala.util.control.NonFatal(_) => return Seq.empty }
    def txt(n: scala.xml.NodeSeq): String =
      Option(n.headOption.map(_.text.trim).getOrElse(""))
        .filter(_.nonEmpty).orNull
    root.label match {
      case "rss" =>
        val ch = root \ "channel"
        val ft = txt(ch \ "title")
        (ch \ "item").map { it =>
          FeedEntry("rss", ft,
            txt(it \ "title"), txt(it \ "link"),
            Option(txt(it \ "pubDate")).getOrElse(txt(it \ "date")),
            txt(it \ "guid"), txt(it \ "description"))
        }
      case "RDF" => // RSS 1.0: items are SIBLINGS of channel
        val ft = txt(root \ "channel" \ "title")
        (root \ "item").map { it =>
          FeedEntry("rss1", ft,
            txt(it \ "title"), txt(it \ "link"),
            txt(it \ "date"), // dc:date
            it.attributes.asAttrMap.collectFirst {
              case (k, v) if k.endsWith("about") => v }.orNull,
            txt(it \ "description"))
        }
      case "feed" => // Atom (RFC 4287)
        val ft = txt(root \ "title")
        (root \ "entry").map { e =>
          val links = e \ "link"
          val link = links.find(l =>
              (l \@ "rel").isEmpty || (l \@ "rel") == "alternate")
            .orElse(links.headOption)
            .map(l => (l \@ "href").trim).filter(_.nonEmpty).orNull
          FeedEntry("atom", ft,
            txt(e \ "title"), link,
            Option(txt(e \ "published")).getOrElse(txt(e \ "updated")),
            txt(e \ "id"),
            Option(txt(e \ "summary")).getOrElse(txt(e \ "content")))
        }
      case _ => Seq.empty
    }
  }

  val parseFeedUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf(parseFeed _)

  /** Read WARC/WET shards from a path glob: one task per shard (the
    * Common Crawl unit of work), records exploded to rows with the
    * source path retained for provenance. binaryFile supplies ONLY
    * the file listing (column pruning keeps `content` unread); each
    * task re-opens its shard as a Hadoop stream and decodes it
    * record-at-a-time through [[parseStream]] — peak task memory is
    * one record, not a ~1 GB compressed (or ~4-5 GB decompressed)
    * shard byte[].
    */
  def read(spark: SparkSession, path: String,
      maxRecordBytes: Long = 1L << 28): DataFrame = {
    import spark.implicits._
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val paths = spark.read.format("binaryFile").load(path)
      .select(col("path")).as[String]
    paths
      .flatMap { p =>
        // binaryFile's path column is URI-shaped for normal names, but
        // decoded characters (spaces, '%', '#') make the URI parse
        // throw — fall back to the raw-string Path constructor then
        val hp =
          try new org.apache.hadoop.fs.Path(new java.net.URI(p))
          catch { case _: Exception => new org.apache.hadoop.fs.Path(p) }
        val fs = hp.getFileSystem(conf.value)
        val in = fs.open(hp)
        // parseStream closes `in` at EOF, but a limit/take or task
        // failure abandons the iterator mid-stream — close on task
        // completion too so no S3/HDFS connection outlives its task
        // (double-close is a no-op)
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null) tc.addTaskCompletionListener[Unit](_ =>
          try in.close() catch { case _: java.io.IOException => () })
        parseStream(in, maxRecordBytes).map(r => (p, r))
      }
      .toDF("path", "__r")
      .select(col("path"), col("__r.*"))
  }
}
